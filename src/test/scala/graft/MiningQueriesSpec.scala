package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.MiningQueries

/** Semantic checks for the round-6 mining family (q201–q207) beyond the
  * oracle hash gate: skyline vs the brute-force NOT EXISTS definition,
  * shared-span on a planted overlap, winsorized closed form vs a direct
  * clamp scan, changepoint on a planted mean shift, and the margin /
  * label / bound contracts of the sampling queries. */
class MiningQueriesSpec extends AnyFunSuite with SparkSpec {

  test("q201 skyline equals the brute-force NOT EXISTS definition") {
    val sky = MiningQueries.q201Skyline.fn(spark, sf001)
      .select("okey").collect().map(_.getLong(0)).toSet
    val o = spark.read.parquet(s"$sf001/orders.parquet")
      .select(col("o_orderkey").as("okey"), col("o_totalprice").as("price"),
        to_date(col("o_orderdate")).as("d"))
    o.createOrReplaceTempView("sky_o")
    val brute = spark.sql(
      """SELECT okey FROM sky_o b WHERE NOT EXISTS (
           SELECT 1 FROM sky_o a WHERE a.price < b.price AND a.d < b.d)""")
      .collect().map(_.getLong(0)).toSet
    assert(sky == brute)
    assert(sky.nonEmpty)
  }

  test("q202 accepted pairs respect the integer margin and floor") {
    val rows = MiningQueries.q202BitextMining.fn(spark, sf001).collect()
    rows.foreach { r =>
      val s1 = r.getAs[Long]("s1_micro"); val s2 = r.getAs[Long]("s2_micro")
      assert(s1 * 100 >= s2 * 105 && s1 >= 100000)
    }
  }

  test("q203 shared span measures a planted token overlap exactly") {
    import spark.implicits._
    // near-identical docs (Jaccard ~0.75 over 3-shingles, so a band
    // must collide): the shared prefix run is 8 tokens = 6 consecutive
    // matching shingle positions -> span 6 + 2 = 8
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota", "en", "t", 1L),
      (2L, "alpha beta gamma delta epsilon zeta eta theta kappa", "en", "t", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = graft.dedup.Dedup.minhashCandidates(docs)
    // the planted pair must collide in at least one band to be a candidate
    assert(pairs.count() == 1, "planted docs did not collide in a band")
    val tok = docs.select(col("doc_id"), graft.text.TextAnalysis.tokens(col("text")).as("w"))
      .withColumn("pos", explode(sequence(lit(1), size(col("w")) - 2)))
      .select(col("doc_id"), col("pos"),
        graft.ops.Exprs.md5Long(concat_ws(" ",
          element_at(col("w"), col("pos")),
          element_at(col("w"), col("pos") + 1),
          element_at(col("w"), col("pos") + 2))).as("h"))
    val m = pairs.select("i", "j")
      .join(tok.select(col("doc_id").as("i"), col("pos").as("pa"), col("h")), Seq("i"))
      .join(tok.select(col("doc_id").as("j"), col("pos").as("pb"), col("h")), Seq("j", "h"))
    val runs = m.withColumn("off", col("pb") - col("pa"))
      .withColumn("grp", col("pa") - row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("i", "j", "off").orderBy("pa")))
      .groupBy("i", "j", "off", "grp").agg(count(lit(1)).as("rl"))
    val span = runs.agg(max(col("rl") + 2)).head().getLong(0)
    assert(span == 8L)
  }

  test("q204 certification booleans hold at sf0.001") {
    val rows = MiningQueries.q204QuantileSketch.fn(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("ok50") && r.getAs[Boolean]("ok90") &&
        r.getAs[Boolean]("ok99"), s"sketch outside bound for $r")
    }
  }

  test("q205 finds a planted mean shift at the right split") {
    import spark.implicits._
    // 10 days at ~100/day then 10 days at ~300/day, planted as raw events
    val rows = (1 to 20).flatMap { day =>
      val n = if (day <= 10) 100 else 300
      val ds = f"2024-01-$day%02d 12:00:00"
      (1 to n).map(i => (day * 1000L + i, ds, 1L, "shift", 1.0, "{}"))
    }
    val ev = rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val dir = java.nio.file.Files.createTempDirectory("cpev").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val best = MiningQueries.q205Changepoint.fn(spark, dir)
      .filter(col("event_type") === "shift").head()
    assert(best.getAs[String]("split_day") == "2024-01-10")
    assert(best.getAs[Long]("pre_milli") == 100000L)
    assert(best.getAs[Long]("post_milli") == 300000L)
  }

  test("q206 negatives differ in label and respect the similarity ceiling") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("vec_id"), col("label"))
    val out = MiningQueries.q206NegativeSampling.fn(spark, sf001)
    val joined = out
      .join(emb.select(col("vec_id").as("anchor_id"), col("label").as("al")), "anchor_id")
      .join(emb.select(col("vec_id").as("neg_id"), col("label").as("nl")), "neg_id")
    assert(joined.filter(col("al") === col("nl")).count() == 0)
    assert(out.filter(col("sim_micro") >= 200000).count() == 0)
    assert(out.filter(col("pick_rank") > 5).count() == 0)
    assert(out.count() > 0)
  }

  test("q208 prefix-filter join equals the brute-force quadratic definition") {
    val out = MiningQueries.q208SetsimJoin.fn(spark, sf001)
      .select("i", "j", "inter_n", "union_n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val ts = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"),
        array_distinct(graft.text.TextAnalysis.tokens(col("text"))).as("ts"))
    val brute = ts.select(col("doc_id").as("i"), col("ts").as("a"))
      .crossJoin(ts.select(col("doc_id").as("j"), col("ts").as("b")))
      .filter(col("i") < col("j"))
      .withColumn("inter", size(array_intersect(col("a"), col("b"))).cast("long"))
      .withColumn("un", (size(col("a")) + size(col("b"))).cast("long") - col("inter"))
      .filter(col("inter") * 19 >= (col("inter") + col("un")) * 9)
      .select("i", "j", "inter", "un").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == brute) // recall 1.0: the prefix scheme loses no pair
    assert(out.nonEmpty)
  }

  test("q207 winsorized closed form equals a direct clamp aggregate") {
    val ev = spark.read.parquet(s"$sf001/events.parquet")
      .filter(col("value").isNotNull)
      .withColumn("vm", round(col("value") * 1e6).cast("long"))
    val stats = MiningQueries.q207TrimmedStats.fn(spark, sf001)
    val direct = ev
      .join(stats.select(col("event_type"), col("p10_micro"), col("p90_micro")),
        "event_type")
      .groupBy("event_type")
      .agg((sum(least(greatest(col("vm"), col("p10_micro")), col("p90_micro")))
        / count(lit(1))).cast("long").as("w_direct"))
    val cmp = stats.join(direct, "event_type")
      // integer div vs double-div cast can differ by 1 on the last micro
      .filter(abs(col("winsor_mean_micro") - col("w_direct")) > 1)
    assert(cmp.count() == 0)
    stats.collect().foreach { r =>
      val t = r.getAs[Long]("trimmed_mean_micro")
      assert(t >= r.getAs[Long]("p10_micro") && t <= r.getAs[Long]("p90_micro"))
    }
  }
}
