package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed Lloyd's k-means over INTEGER-QUANTIZED coordinates —
 * deterministic and bit-exact at any partitioning, unlike float-mean
 * k-means whose aggregation order can flip centroids. Coordinates
 * quantize to micro units before any arithmetic (float → double is a
 * widening cast and ×10⁶+floor is one IEEE-identical double op),
 * squared distances and centroid sums stay BIGINT, and the recenter is
 * sum div count. Per round: one broadcast join against the k-row
 * centroid table + one keyed argmin window + one aggregate — the k-row
 * table broadcasts at any corpus size, the argmin window is keyed by
 * point. Seeds are the k smallest ids; ties break toward the smaller
 * centroid id. The q222 oracle replays both rounds term-for-term.
 */
object Lloyd {

  /** Micro-quantized coordinate projection: (id, x1..xD) BIGINTs from
    * the first `dims` elements of an array column. Rows with a null or
    * short array are excluded. */
  def quantize(df: DataFrame, arrCol: String, idCol: String,
               dims: Int): DataFrame =
    df.filter(col(arrCol).isNotNull && size(col(arrCol)) >= dims)
      .select(col(idCol).as("id") +: (1 to dims).map(i =>
        expr(s"CAST(floor(CAST(element_at($arrCol, $i) AS DOUBLE) * 1000000) AS BIGINT)")
          .as(s"x$i")): _*)

  /** `rounds` (≥ 1) synchronous Lloyd iterations from the
    * k-smallest-id seeds over a [[quantize]]d table. Returns the final
    * centroid table (cid, n, c1..cD). A cluster that captures no
    * points in some iteration disappears from the centroid table — the
    * result can carry FEWER than k rows (standard Lloyd empty-cluster
    * semantics; no re-seeding is attempted). */
  def iterate(pts: DataFrame, k: Int, rounds: Int, dims: Int): DataFrame = {
    require(rounds >= 1, s"Lloyd.iterate requires rounds >= 1 (got $rounds)")
    val ds = 1 to dims
    val p = pts.localCheckpoint() // seeds + every assignment round read it
    val distExpr = expr(ds.map(i => s"(x$i-c$i)*(x$i-c$i)").mkString(" + "))
    val w = Window.partitionBy("id").orderBy(col("dst"), col("cid"))
    def assign(cent: DataFrame) =
      p.crossJoin(broadcast(cent))
        .withColumn("dst", distExpr)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("id") +: col("cid") +: ds.map(i => col(s"x$i")): _*)
    def recenter(a: DataFrame) = {
      val aggs = count(lit(1)).as("n") +:
        ds.map(i => expr(s"sum(x$i) div count(1)").as(s"c$i"))
      a.groupBy("cid").agg(aggs.head, aggs.tail: _*)
    }
    var cent = p.orderBy("id").limit(k)
      .select(col("id").as("cid") +: ds.map(i => col(s"x$i").as(s"c$i")): _*)
    var last: DataFrame = null
    for (_ <- 1 to rounds) {
      last = recenter(assign(cent))
      cent = last.drop("n")
    }
    last.select(col("cid") +: col("n") +: ds.map(i => col(s"c$i")): _*)
  }

  /** Simplified silhouette (Hruschka et al. 2004 — centroid distances
    * instead of all-pairs member distances, the only silhouette that
    * scales: all-pairs is O(n²), this is one broadcast cross join
    * against the k-row centroid table) per final cluster. Per point:
    * `a` = squared distance to its own (nearest) centroid, `b` = the
    * smallest squared distance to any OTHER centroid, score
    * `(b − a)·10⁶ div max(a, b, 1)` — b ≥ a by construction so the
    * score is a non-negative BIGINT and truncating div == floor div.
    * Returns (cid, n, mean_sil_ppm) with the mean as sum div count.
    * Everything stays integer-exact; no float whose aggregation order
    * could flip a bit.
    *
    * Magnitude bound (same convention as Stats.acf): the ppm step
    * computes (b − a)·10⁶ on BIGINT squared distances, so it requires
    * dims · span² · 10⁶ < 2⁶³ where span is the per-dimension
    * micro-unit coordinate spread — i.e. span ≲ 1.5·10⁶ (raw values in
    * roughly [−1.5, 1.5]) at dims = 4. Pre-scale wider inputs before
    * [[quantize]]. */
  def simplifiedSilhouette(pts: DataFrame, cent: DataFrame,
                           dims: Int): DataFrame = {
    val ds = 1 to dims
    val distExpr = expr(ds.map(i => s"(x$i-c$i)*(x$i-c$i)").mkString(" + "))
    val w = Window.partitionBy("id").orderBy(col("dst"), col("cid"))
    pts.crossJoin(broadcast(cent))
      .withColumn("dst", distExpr)
      .withColumn("rn", row_number().over(w))
      .groupBy("id")
      .agg(max(when(col("rn") === 1, col("cid"))).as("cl"),
        max(when(col("rn") === 1, col("dst"))).as("a"),
        min(when(col("rn") > 1, col("dst"))).as("b"))
      .select(col("cl").as("cid"),
        expr("(b - a) * 1000000 div greatest(a, b, 1)").as("s"))
      .groupBy("cid")
      .agg(count(lit(1)).as("n"),
        expr("sum(s) div count(1)").as("mean_sil_ppm"))
  }
}
