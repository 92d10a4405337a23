package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed graph primitives beyond the near-dup pipeline's connected
 * components / PageRank / triangles ([[graft.dedup.Dedup]]): building an
 * item co-occurrence graph from a bipartite relation, and bounded-round
 * k-core decomposition by synchronous peeling.
 *
 * Scale shape: the bipartite projection is the classic quadratic
 * hot-spot — one group with 10^5 members emits 10^10 pairs — so the
 * projection REQUIRES a per-group cap and drops hub groups explicitly
 * (the standard recipe; a hub group's pairs carry almost no signal and
 * would dominate the shuffle). The peel is a fixed number of synchronous
 * rounds, each one degree-aggregate + two semi-joins, all partitioned by
 * vertex — no driver-side graph state, lineage cut per round.
 */
object GraphOps {

  /** All ordered pairs (a < b by array position) from a SORTED array
    * column, as an array of structs — the map-side pair generator both
    * the co-occurrence projection and basket mining (q148) share. The
    * caller guarantees the array is sorted so position order is value
    * order. */
  def pairsFromSortedArray(arrCol: String, aName: String,
                           bName: String): org.apache.spark.sql.Column =
    expr(s"""flatten(transform($arrCol, (x, i) ->
               transform(slice($arrCol, i + 2, size($arrCol)),
                         y -> struct(x AS $aName, y AS $bName))))""")

  /**
   * Undirected co-occurrence edges (i < j) between items sharing a
   * group, from groups with at most `maxGroupSize` distinct items.
   * Pairs per group are bounded by C(maxGroupSize, 2); the final
   * distinct collapses repeated co-occurrence into one edge.
   */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
                        maxGroupSize: Int): DataFrame = {
    // collect_set dedups the group's items in the SAME shuffle that
    // groups them, the hub cap drops oversize groups BEFORE any pair
    // exists, and pairs come map-side from the sorted array (i < j for
    // free) — no size pre-count join, no within-group self-join.
    // A null group key is NOT a group: without the filter its rows
    // would fabricate co-occurrence edges between unrelated items.
    df.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("g"), col(itemCol).as("it"))
      .groupBy("g").agg(sort_array(collect_set(col("it"))).as("items"))
      .filter(size(col("items")) <= maxGroupSize)
      .select(explode(pairsFromSortedArray("items", "i", "j")).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"))
      .distinct()
  }

  /**
   * k-core by `rounds` synchronous peels: each round drops vertices with
   * degree < k and the edges touching them; survivors of round r are the
   * (r-peel) approximation of the k-core, exact once a round removes
   * nothing. Returns surviving vertices with their residual degree.
   * Each round's edge set is localCheckpoint'ed — the next round's two
   * semi-joins and the degree aggregate would otherwise re-run the whole
   * peel history.
   */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    def degrees(e: DataFrame): DataFrame =
      e.select(col("i").as("v"))
        .unionAll(e.select(col("j").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
    var e = edges.localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("deg") >= k).select("v")
      e = e
        .join(keep.withColumnRenamed("v", "i"), Seq("i"), "left_semi")
        .join(keep.withColumnRenamed("v", "j"), Seq("j"), "left_semi")
        .select("i", "j")
        .localCheckpoint()
    }
    degrees(e).filter(col("deg") >= k)
  }

  /**
   * Bounded-hop BFS from one source vertex: `rounds` synchronous
   * relaxations, each one neighbor expansion + a min-dist aggregate —
   * the frontier table is (vertex, dist), partitioned by vertex, no
   * driver state beyond the source id. Exact distances for every vertex
   * within `rounds` hops (the bounded-traversal recipe that replaces an
   * unbounded recursive join at scale). Returns (v, dist).
   */
  def bfsHops(edges: DataFrame, source: Long, rounds: Int): DataFrame = {
    val e = edges.select(col("i"), col("j"))
      .unionAll(edges.select(col("j").as("i"), col("i").as("j")))
      .localCheckpoint()
    var dist = e.sparkSession.range(1)
      .select(lit(source).as("v"), lit(0L).as("dist"))
    for (_ <- 1 to rounds) {
      dist = dist
        .unionAll(dist.join(e, dist("v") === e("i"))
          .select(e("j").as("v"), (dist("dist") + 1).as("dist")))
        .groupBy("v").agg(min("dist").as("dist"))
        .localCheckpoint()
    }
    dist
  }

  /** DuckDB replay of [[bfsHops]] as unrolled CTEs: `ed0` (i, j,
    * undirected as stored) and `src` (single row `v`) must be bound by
    * the caller; emits `e` (both directions), `b0..b{rounds}`; the
    * final `b{rounds}` is (v, dist). */
  def bfsOracleCtes(rounds: Int): String = {
    val steps = (0 until rounds).map { r =>
      s"""b${r + 1} AS (SELECT v, min(dist) AS dist FROM (
            SELECT v, dist FROM b$r
            UNION ALL
            SELECT e.j AS v, b$r.dist + 1 AS dist
            FROM b$r JOIN e ON b$r.v = e.i) GROUP BY v)"""
    }
    (Seq(
      "e AS (SELECT i, j FROM ed0 UNION ALL SELECT j AS i, i AS j FROM ed0)",
      "b0 AS (SELECT v, 0 AS dist FROM src)") ++ steps).mkString(",\n")
  }

  /** DuckDB replay of [[kCorePeel]] as unrolled CTEs: `ed0` must be
    * bound by the caller; emits `d0, v1, ed1, …, ed{rounds}` and a final
    * `kcore` CTE (v, deg). */
  def kCoreOracleCtes(k: Int, rounds: Int): String = {
    val b = new StringBuilder
    for (r <- 0 until rounds) {
      b ++= s"""d$r AS (SELECT v, count(*) AS deg FROM (
                SELECT i AS v FROM ed$r UNION ALL SELECT j AS v FROM ed$r)
                GROUP BY v),
             v${r + 1} AS (SELECT v FROM d$r WHERE deg >= $k),
             ed${r + 1} AS (SELECT i, j FROM ed$r
                WHERE i IN (SELECT v FROM v${r + 1})
                  AND j IN (SELECT v FROM v${r + 1})),
             """
    }
    b ++= s"""kcore AS (SELECT v, count(*) AS deg FROM (
              SELECT i AS v FROM ed$rounds UNION ALL SELECT j AS v FROM ed$rounds)
              GROUP BY v HAVING count(*) >= $k)"""
    b.toString
  }
}
