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
   * Item-item co-occurrence recommendations from a bipartite
   * (group, item) relation: for every item the `topK` items most often
   * co-grouped with it, ranked by squared-cosine of the co-occurrence
   * counts — co²·10⁶ div (cnt_a·cnt_b), MONOTONE in cosine but needing
   * no sqrt, so the whole ranking is exact BIGINT arithmetic. Pairs
   * come map-side from per-group sorted item arrays (hub groups over
   * `maxGroupSize` dropped before any pair exists); singleton pairs
   * below `minCo` are pruned before the score join (noise a recommender
   * drops, and the bulk of the pair table); item marginals aggregate
   * the bipartite table once and are checkpointed because both sides
   * of the score join read them. The per-item top-K is a keyed rank
   * window — never global. Returns (item, rec, co, score_ppm, rn).
   */
  /** Hub-capped co-occurrence pair counts from baskets: distinct
    * (group, item), baskets wider than `maxGroupSize` dropped, pairs
    * generated map-side from the sorted basket array, aggregated to
    * (i, j, co) with co ≥ `minCo`. The shareable front half of
    * [[itemRecs]] (also the q230 association-rule pair table). */
  def basketPairCounts(df: DataFrame, groupCol: String, itemCol: String,
                       maxGroupSize: Int, minCo: Long): DataFrame =
    df.filter(col(groupCol).isNotNull && col(itemCol).isNotNull)
      .select(col(groupCol).as("g"), col(itemCol).as("it"))
      .groupBy("g")
      .agg(sort_array(collect_set(col("it"))).as("items"))
      .filter(size(col("items")) <= maxGroupSize)
      .select(explode(pairsFromSortedArray("items", "i", "j")).as("p"))
      .groupBy(col("p.i").as("i"), col("p.j").as("j"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)

  /** Per-item distinct-basket counts (it, c) — the marginals both the
    * recommender and the rule miner normalize by. */
  def itemCounts(df: DataFrame, groupCol: String, itemCol: String): DataFrame =
    df.filter(col(groupCol).isNotNull && col(itemCol).isNotNull)
      .select(col(groupCol).as("g"), col(itemCol).as("it"))
      .groupBy("it").agg(count_distinct(col("g")).as("c"))

  /** Rank the pair table into per-item top-K recommendations by
    * squared-cosine score (co²·10⁶ div (c_a·c_b)). */
  def rankRecs(pr: DataFrame, cnt: DataFrame, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bd = pr.select(col("i").as("item"), col("j").as("rec"), col("co"))
      .unionAll(pr.select(col("j").as("item"), col("i").as("rec"), col("co")))
    val sc = bd
      .join(cnt.select(col("it").as("item"), col("c").as("ca")), Seq("item"))
      .join(cnt.select(col("it").as("rec"), col("c").as("cb")), Seq("rec"))
      .withColumn("score_ppm", expr("co * co * 1000000 div (ca * cb)"))
    val w = Window.partitionBy("item").orderBy(col("score_ppm").desc, col("rec"))
    sc.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= topK)
      .select(col("item"), col("rec"), col("co"), col("score_ppm"), col("rn"))
  }

  def itemRecs(df: DataFrame, groupCol: String, itemCol: String,
               maxGroupSize: Int, minCo: Long, topK: Int): DataFrame =
    rankRecs(
      basketPairCounts(df, groupCol, itemCol, maxGroupSize, minCo),
      itemCounts(df, groupCol, itemCol).localCheckpoint(), topK)

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
   * k-truss by `rounds` synchronous support peels: each round counts
   * per-edge triangle support via the degree-oriented enumeration
   * ([[graft.dedup.Dedup.triangles]] — no celebrity vertex goes
   * quadratic) and drops edges in fewer than k−2 triangles; the edges
   * that survive all rounds form the (r-peel) approximation of the
   * k-truss, exact once a round removes nothing. The truss is the
   * EDGE-support analog of the k-core's vertex degrees — it keeps the
   * triangle-dense community backbone a degree peel can't isolate.
   * Lineage cut per round. Returns surviving edges with their final
   * support (i, j, support).
   */
  def kTrussPeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    // k ≤ 2 would have to return ALL edges (every edge is trivially in a
    // 2-truss), but the support semi-join below keeps only edges in ≥1
    // triangle — wrong at that boundary, so reject it outright
    require(k >= 3, s"kTrussPeel requires k >= 3 (got $k)")
    def support(e: DataFrame): DataFrame =
      graft.dedup.Dedup.triangles(e)
        .select(explode(array(
          struct(col("a").as("i"), col("b").as("j")),
          struct(col("a").as("i"), col("c").as("j")),
          struct(col("b").as("i"), col("c").as("j")))).as("e"))
        .groupBy(col("e.i").as("i"), col("e.j").as("j"))
        .agg(count(lit(1)).as("support"))
    var e = edges.select(
        least(col("i").cast("long"), col("j").cast("long")).as("i"),
        greatest(col("i").cast("long"), col("j").cast("long")).as("j"))
      .filter(col("i") =!= col("j")).distinct()
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = support(e).filter(col("support") >= k - 2).select("i", "j")
      e = e.join(keep, Seq("i", "j"), "left_semi").localCheckpoint()
    }
    e.join(support(e), Seq("i", "j"), "left")
      .select(col("i"), col("j"),
        coalesce(col("support"), lit(0L)).as("support"))
  }

  /** DuckDB replay of [[kTrussPeel]]: `ed0` (i < j distinct) must be
    * bound by the caller; emits per round `tr{r}`, `sp{r}`,
    * `ed{r+1}`, plus a final `spf` over `ed{rounds}` — the result is
    * ed{rounds} left-joined to spf. */
  def kTrussOracleCtes(k: Int, rounds: Int): String = {
    require(k >= 3, s"kTrussOracleCtes requires k >= 3 (got $k)") // same boundary as kTrussPeel
    def triSp(r: String, src: String) =
      s"""tr$r AS MATERIALIZED (SELECT e1.i AS x, e1.j AS y, e2.j AS z
             FROM $src e1 JOIN $src e2 ON e2.i = e1.j
                          JOIN $src e3 ON e3.i = e1.i AND e3.j = e2.j),
         sp$r AS MATERIALIZED (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM (
             SELECT x AS a, y AS b FROM tr$r
             UNION ALL SELECT x, z FROM tr$r
             UNION ALL SELECT y, z FROM tr$r) GROUP BY 1, 2)"""
    val steps = (0 until rounds).map { r =>
      s"""${triSp(r.toString, s"ed$r")},
         ed${r + 1} AS MATERIALIZED (SELECT i, j FROM ed$r
             JOIN sp$r ON a = i AND b = j WHERE c >= ${k - 2})"""
    }
    (steps :+ triSp("f", s"ed$rounds")).mkString(",\n")
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
    * undirected as stored) and `{prefix}src` (single row `v`) must be
    * bound by the caller; emits `{prefix}e` (both directions),
    * `{prefix}b0..b{rounds}`; the final `{prefix}b{rounds}` is
    * (v, dist). A non-empty `prefix` lets one query unroll several
    * independent traversals (q220's landmarks) in a single WITH. */
  def bfsOracleCtes(rounds: Int, prefix: String = ""): String = {
    val steps = (0 until rounds).map { r =>
      s"""${prefix}b${r + 1} AS MATERIALIZED (SELECT v, min(dist) AS dist FROM (
            SELECT v, dist FROM ${prefix}b$r
            UNION ALL
            SELECT ${prefix}e.j AS v, ${prefix}b$r.dist + 1 AS dist
            FROM ${prefix}b$r JOIN ${prefix}e ON ${prefix}b$r.v = ${prefix}e.i) GROUP BY v)"""
    }
    (Seq(
      s"${prefix}e AS MATERIALIZED (SELECT i, j FROM ed0 UNION ALL SELECT j AS i, i AS j FROM ed0)",
      s"${prefix}b0 AS MATERIALIZED (SELECT v, 0 AS dist FROM ${prefix}src)") ++ steps).mkString(",\n")
  }

  /**
   * HyperBall-style neighborhood function (Boldi & Vigna, "In-Core
   * Computation of Geometric Centralities with HyperBall", 2013; the
   * ANF lineage of Palmer/Gibbons/Faloutsos 2002): per-vertex
   * distinct-counting sketches of the r-ball, grown by one
   * sketch-union along edges per round. N(r) = Σ_v |ball_r(v)| is the
   * curve effective diameter and average distance fall out of —
   * computed WITHOUT all-pairs BFS, which is the only way the
   * statistic exists at 10^9 vertices.
   *
   * The sketch here is bottom-k over the engine's canonical 60-bit
   * md5 hash ([[graft.ops.Exprs.md5Long]]): union-merge =
   * sort-distinct-slice(k), associative and commutative, so the merge
   * order Spark's partial aggregation picks cannot change the result.
   * While a ball holds < k hashes the sketch IS the exact reachable
   * set (the regime the oracle pins with k ≫ |V|); past k it degrades
   * to the KMV estimate (k−1)·2^60/h_(k) — shrink k for the 100 TB
   * run, the merge stays O(k) per vertex per round. Per round: one
   * equi-join (sketches → neighbors) + one grouped merge, lineage cut;
   * no driver state.
   *
   * Returns one row per radius r ∈ [0, rounds]: (r, n_pairs,
   * frac_of_max_ppm) where n_pairs = Σ_v size(sketch_r(v)).
   */
  def neighborhoodFunction(edges: DataFrame, rounds: Int, k: Int): DataFrame = {
    require(rounds >= 1, s"neighborhoodFunction needs rounds >= 1; got $rounds")
    require(k >= 2, s"bottom-k sketch needs k >= 2; got $k")
    val e = edges.select(col("i"), col("j"))
      .unionAll(edges.select(col("j").as("i"), col("i").as("j")))
      .localCheckpoint()
    var sk = e.select(col("i").as("v")).distinct()
      .select(col("v"), array(graft.ops.Exprs.md5Long(col("v"))).as("sk"))
      .localCheckpoint()
    def countRow(r: Int, s: DataFrame) =
      s.agg(sum(size(col("sk"))).cast("long").as("n_pairs"))
        .select(lit(r).as("r"), col("n_pairs"))
    var counts = Seq(countRow(0, sk))
    for (r <- 1 to rounds) {
      sk = sk.join(e, sk("v") === e("i"))
        .select(e("j").as("v"), col("sk"))
        .unionAll(sk)
        .groupBy("v")
        .agg(slice(array_sort(array_distinct(flatten(collect_list(col("sk"))))),
          1, k).as("sk"))
        .localCheckpoint()
      counts = counts :+ countRow(r, sk)
    }
    val perRound = counts.reduce(_ unionAll _).localCheckpoint() // rounds+1 rows
    val mx = perRound.filter(col("r") === rounds)
      .select(col("n_pairs").as("np_max"))
    broadcast(perRound).crossJoin(broadcast(mx))
      .select(col("r"), col("n_pairs"),
        expr("n_pairs * 1000000 div np_max").as("frac_of_max_ppm"))
  }

  /**
   * Bounded-round single-source shortest paths over WEIGHTED undirected
   * edges (i, j, w) — Bellman–Ford by synchronous relaxation: each
   * round expands the frontier through every edge and keeps the min
   * distance per vertex. Exact for every vertex whose shortest path
   * uses ≤ `rounds` edges; the distributed SSSP recipe (one join + one
   * min-aggregate per round, lineage cut, no driver state). Integer
   * weights so distances are exact BIGINTs. Returns (v, dist).
   */
  def sssp(wEdges: DataFrame, source: Long, rounds: Int): DataFrame = {
    val e = wEdges.select(col("i"), col("j"), col("w"))
      .unionAll(wEdges.select(col("j").as("i"), col("i").as("j"), col("w")))
      .localCheckpoint()
    var dist = e.sparkSession.range(1)
      .select(lit(source).as("v"), lit(0L).as("dist"))
    for (_ <- 1 to rounds) {
      dist = dist
        .unionAll(dist.join(e, dist("v") === e("i"))
          .select(e("j").as("v"), (dist("dist") + e("w")).as("dist")))
        .groupBy("v").agg(min("dist").as("dist"))
        .localCheckpoint()
    }
    dist
  }

  /** DuckDB replay of [[sssp]]: `ed0` (i, j, w) and `src` (single row
    * `v`) must be bound by the caller; emits `e`, `s0..s{rounds}`. */
  def ssspOracleCtes(rounds: Int): String = {
    val steps = (0 until rounds).map { r =>
      s"""s${r + 1} AS MATERIALIZED (SELECT v, min(dist) AS dist FROM (
            SELECT v, dist FROM s$r
            UNION ALL
            SELECT e.j AS v, s$r.dist + e.w AS dist
            FROM s$r JOIN e ON s$r.v = e.i) GROUP BY v)"""
    }
    (Seq(
      "e AS MATERIALIZED (SELECT i, j, w FROM ed0 UNION ALL SELECT j AS i, i AS j, w FROM ed0)",
      "s0 AS MATERIALIZED (SELECT v, CAST(0 AS BIGINT) AS dist FROM src)") ++ steps).mkString(",\n")
  }

  /**
   * Luby's maximal-independent-set algorithm with DETERMINISTIC
   * md5-hash priorities, `rounds` synchronous rounds: an undecided
   * vertex enters the set when its priority is strictly below every
   * undecided neighbor's; its undecided neighbors are then excluded.
   * Adjacent vertices can never enter in the same round (strict
   * comparison is antisymmetric), so the result is independent by
   * construction and maximal over the decided region; each round
   * decides a constant fraction in expectation, so a handful of rounds
   * suffices at any graph size. Per round: one undecided⋈undecided
   * edge restriction, one min-priority aggregate, two anti joins — all
   * vertex-partitioned. Returns (v, status ∈ in|out|undecided).
   */
  def lubyMis(edges: DataFrame, rounds: Int): DataFrame = {
    import graft.ops.Exprs
    val e = edges.select(col("i"), col("j"))
      .unionAll(edges.select(col("j").as("i"), col("i").as("j")))
      .localCheckpoint()
    var und = e.select(col("i").as("v")).distinct()
      .withColumn("p", Exprs.md5Long(col("v")))
      .localCheckpoint()
    var decidedIn = und.sparkSession.range(0).select(col("id").as("v"))
    var decidedOut = decidedIn
    for (_ <- 1 to rounds) {
      val eu = e
        .join(und.select(col("v").as("i")), Seq("i"), "left_semi")
        .join(und.select(col("v").as("j"), col("p").as("pj")), Seq("j"))
      val nmin = eu.groupBy(col("i").as("v")).agg(min("pj").as("mn"))
      val cand = und.join(nmin, Seq("v"), "left")
        .filter(col("mn").isNull || col("p") < col("mn"))
        .select("v").localCheckpoint()
      val excl = e.join(cand.withColumnRenamed("v", "i"), Seq("i"), "left_semi")
        .join(und.select(col("v").as("j")), Seq("j"), "left_semi")
        .select(col("j").as("v")).distinct().localCheckpoint()
      decidedIn = decidedIn.unionAll(cand)
      decidedOut = decidedOut.unionAll(excl)
      und = und
        .join(cand, Seq("v"), "left_anti")
        .join(excl, Seq("v"), "left_anti")
        .localCheckpoint()
    }
    decidedIn.select(col("v"), lit("in").as("status"))
      .unionAll(decidedOut.select(col("v"), lit("out").as("status")))
      .unionAll(und.select(col("v"), lit("undecided").as("status")))
  }

  /** DuckDB replay of [[lubyMis]]: `ed0` must be bound by the caller;
    * emits `e`, `u0`, and per round `c{r}` (entered), `x{r}`
    * (excluded), `u{r}` (still undecided); the final statuses are the
    * union of every c/x plus `u{rounds}`. */
  def lubyMisOracleCtes(rounds: Int): String = {
    val steps = (0 until rounds).map { r =>
      s"""c${r + 1} AS MATERIALIZED (SELECT u.v FROM u$r u LEFT JOIN (
             SELECT e.i AS v, min(u2.p) AS mn
             FROM e JOIN u$r u1 ON e.i = u1.v JOIN u$r u2 ON e.j = u2.v
             GROUP BY e.i) nm ON nm.v = u.v
           WHERE nm.mn IS NULL OR u.p < nm.mn),
         x${r + 1} AS MATERIALIZED (SELECT DISTINCT e.j AS v
           FROM e JOIN c${r + 1} c ON e.i = c.v JOIN u$r u ON e.j = u.v),
         u${r + 1} AS MATERIALIZED (SELECT v, p FROM u$r
           WHERE v NOT IN (SELECT v FROM c${r + 1})
             AND v NOT IN (SELECT v FROM x${r + 1}))"""
    }
    (Seq(
      "e AS MATERIALIZED (SELECT i, j FROM ed0 UNION ALL SELECT j AS i, i AS j FROM ed0)",
      """u0 AS MATERIALIZED (SELECT v, ('0x'||substr(md5(CAST(v AS VARCHAR)),1,15))::BIGINT AS p
           FROM (SELECT DISTINCT i AS v FROM (
                 SELECT i FROM ed0 UNION ALL SELECT j FROM ed0)))""") ++
      steps).mkString(",\n")
  }

  /**
   * Synchronous label propagation (community detection) for `rounds`
   * rounds: every vertex starts labeled with its own id; each round it
   * adopts the most frequent label among its NEIGHBORS, ties broken by
   * the smallest label — fully deterministic, so the whole iteration
   * replays as unrolled SQL CTEs. Per round: one edge⋈label join, one
   * (vertex, label) count, one keyed row_number pick — all partitioned
   * by vertex, lineage cut per round. Unlike connected components this
   * converges to DENSE communities (a bridge edge does not merge two
   * cliques). Input `edges` is undirected (i, j); both orientations are
   * expanded here. Returns (v, lab).
   */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(col("i"), col("j"))
      .unionAll(edges.select(col("j").as("i"), col("i").as("j")))
      .localCheckpoint()
    var lab = e.select(col("i").as("v")).distinct()
      .select(col("v"), col("v").as("lab"))
    val w = Window.partitionBy("v").orderBy(col("c").desc, col("lab").asc)
    for (_ <- 1 to rounds) {
      lab = e.join(lab.withColumnRenamed("v", "j"), Seq("j"))
        .groupBy(col("i").as("v"), col("lab"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("v", "lab")
        .localCheckpoint()
    }
    lab
  }

  /** DuckDB replay of [[labelPropagation]] as unrolled CTEs: `ed0`
    * (i, j) must be bound by the caller; emits `e`, `l0..l{rounds}`;
    * the final `l{rounds}` is (v, lab). */
  def labelPropOracleCtes(rounds: Int): String = {
    val steps = (0 until rounds).map { r =>
      s"""l${r + 1} AS MATERIALIZED (SELECT v, lab FROM (
            SELECT e.i AS v, l$r.lab, count(*) AS c,
                   row_number() OVER (PARTITION BY e.i
                     ORDER BY count(*) DESC, l$r.lab) AS rn
            FROM e JOIN l$r ON e.j = l$r.v
            GROUP BY e.i, l$r.lab) WHERE rn = 1)"""
    }
    (Seq(
      "e AS MATERIALIZED (SELECT i, j FROM ed0 UNION ALL SELECT j AS i, i AS j FROM ed0)",
      "l0 AS MATERIALIZED (SELECT v, v AS lab FROM (SELECT DISTINCT i AS v FROM e))") ++
      steps).mkString(",\n")
  }

  /**
   * Personalized PageRank (integer micro-units, damping 0.85) from the
   * seed set `{v : v % seedMod == 0}`: restart mass lands ONLY on seeds,
   * so ranks measure proximity to the seed set rather than global
   * centrality — the "related items" walk. Same arithmetic shape as
   * [[graft.dedup.Dedup.pageRankMicro]] (per-edge contributions
   * `round(0.85·r/d)` quantized to micro before the sum) so every
   * iteration replays in SQL. Returns (v, r) for vertices with r > 0.
   */
  def personalizedPageRankMicro(edges: DataFrame, seedMod: Int,
                                iters: Int): DataFrame = {
    val e = edges.select(col("i").as("src"), col("j").as("dst"))
      .unionAll(edges.select(col("j").as("src"), col("i").as("dst")))
      .localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    val withDeg = e.join(deg, "src").localCheckpoint()
    val seedR = when(col("v") % seedMod === 0, lit(1000000L)).otherwise(lit(0L))
    var ranks = deg.select(col("src").as("v")).withColumn("r", seedR)
    val restart = when(col("dst") % seedMod === 0, lit(150000L)).otherwise(lit(0L))
    (1 to iters).foreach { _ =>
      ranks = withDeg.join(ranks, col("src") === col("v"))
        .select(col("dst"),
          round(lit(0.85) * col("r") / col("d"), 0).cast("long").as("c"))
        .groupBy("dst")
        .agg((restart + sum("c")).as("r"))
        .select(col("dst").as("v"), col("r"))
        .localCheckpoint()
    }
    ranks.filter(col("r") > 0)
  }

  /** DuckDB replay of [[personalizedPageRankMicro]]: `ed0` must be bound
    * by the caller; emits `e`, `deg`, `r0..r{iters}`; the final
    * `r{iters}` is (v, r) including r = 0 rows (the operator filters
    * r > 0 — mirror that in the SELECT). */
  def pprOracleCtes(seedMod: Int, iters: Int): String = {
    val steps = (0 until iters).map { r =>
      s"""r${r + 1} AS MATERIALIZED (SELECT e.dst AS v,
             CAST(CASE WHEN e.dst % $seedMod = 0 THEN 150000 ELSE 0 END
                  + sum(CAST(round(0.85 * r$r.r / deg.d) AS BIGINT)) AS BIGINT) AS r
           FROM e JOIN r$r ON e.src = r$r.v JOIN deg ON e.src = deg.src
           GROUP BY e.dst)"""
    }
    (Seq(
      "e AS MATERIALIZED (SELECT i AS src, j AS dst FROM ed0 UNION ALL SELECT j AS src, i AS dst FROM ed0)",
      "deg AS MATERIALIZED (SELECT src, count(*) AS d FROM e GROUP BY src)",
      s"""r0 AS MATERIALIZED (SELECT src AS v,
             CAST(CASE WHEN src % $seedMod = 0 THEN 1000000 ELSE 0 END AS BIGINT) AS r
           FROM deg)""") ++ steps).mkString(",\n")
  }

  /**
   * HITS (hubs & authorities, Kleinberg) over a DIRECTED bipartite edge
   * set `(c, s)` — integer-exact: hub scores start uniform at 10^6
   * micro; each round computes raw authority a(s) = Σ_{c→s} h(c),
   * L∞-normalizes to micro units (`a·10^6 div max(a)` — a deterministic
   * integer variant of the usual L2 normalization; the RANKING it
   * induces is identical, only the scale differs), then hub
   * h(c) = Σ_{c→s} a(s) with the same normalization. Each half-step is
   * one keyed equi-join + one keyed aggregate + one 1-row scalar-max
   * broadcast — the standard distributed power-iteration shape (edge
   * list deduped and checkpointed once; score tables checkpointed per
   * round to keep lineage flat). All arithmetic stays in int64: scores
   * are ≤ 10^6, so a raw sum is ≤ 10^6·max-degree, and the ×10^6
   * normalization numerator is ≤ 10^12·max-degree — safe to ~10^6
   * in-degree even at the 100 TB design point. Returns the authority
   * table (s, a) after `rounds`.
   */
  def hitsAuthority(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"hitsAuthority requires rounds >= 1 (got $rounds)")
    val e = edges.select(col("c").cast("long").as("c"),
        col("s").cast("long").as("s"))
      .distinct().localCheckpoint()
    var hub = e.select(col("c")).distinct()
      .withColumn("h", lit(1000000L))
    var auth: DataFrame = null
    (1 to rounds).foreach { _ =>
      val araw = e.join(hub, "c").groupBy("s").agg(sum("h").as("ar"))
      auth = araw.crossJoin(broadcast(araw.agg(max("ar").as("amax"))))
        .select(col("s"), expr("ar * 1000000 div amax").as("a"))
        .localCheckpoint()
      val hraw = e.join(auth, "s").groupBy("c").agg(sum("a").as("hr"))
      hub = hraw.crossJoin(broadcast(hraw.agg(max("hr").as("hmax"))))
        .select(col("c"), expr("hr * 1000000 div hmax").as("h"))
        .localCheckpoint()
    }
    auth
  }

  /** DuckDB replay of [[hitsAuthority]]: `be0(c, s)` (already DISTINCT)
    * must be bound by the caller; emits `h0, ar1, a1, hr1, h1, …` — the
    * final `a{rounds}` is the authority table (s, a). */
  def hitsOracleCtes(rounds: Int): String = {
    val steps = (0 until rounds).map { r =>
      s"""ar${r + 1} AS MATERIALIZED (SELECT s, CAST(sum(h) AS BIGINT) AS ar
            FROM be0 JOIN h$r USING (c) GROUP BY s),
         a${r + 1} AS MATERIALIZED (SELECT s,
              ar * 1000000 // (SELECT max(ar) FROM ar${r + 1}) AS a
            FROM ar${r + 1}),
         hr${r + 1} AS MATERIALIZED (SELECT c, CAST(sum(a) AS BIGINT) AS hr
            FROM be0 JOIN a${r + 1} USING (s) GROUP BY c),
         h${r + 1} AS MATERIALIZED (SELECT c,
              hr * 1000000 // (SELECT max(hr) FROM hr${r + 1}) AS h
            FROM hr${r + 1})"""
    }
    (Seq("""h0 AS MATERIALIZED (SELECT DISTINCT c,
              CAST(1000000 AS BIGINT) AS h FROM be0)""") ++ steps)
      .mkString(",\n")
  }

  /**
   * Weighted PageRank in integer micro-units over an UNDIRECTED weighted
   * pair table (`aCol` < `bCol`, positive BIGINT weight `wCol`) — the
   * TextRank recurrence (Mihalcea & Tarau 2004): per iteration each
   * vertex sends `round(0.85 · r(u) · w(u,v) / wdeg(u))` along every
   * incident edge and collects `150000 +` the sum. The contrib is PURE
   * INTEGER arithmetic — `(34·r·c + 20·wd) div (40·wd)` is round-half-up
   * of `17·r·c / (20·wd)` for positive operands, so there is no double
   * step at all and DuckDB replays it bit-for-bit (the earlier
   * `round(0.85·r·c/wd)` double formulation could disagree with DuckDB's
   * DECIMAL-typed `0.85*r*c` at a round() half boundary once r·c
   * approached 2^53). Exactness bound: requires `34·r·c < 2^63`, i.e.
   * r·c < 2.7e17 — vs 9e15 for the double path — and rank mass is
   * conserved-ish per round (Σr ≈ n·1e6), so token graphs stay far
   * below it. The weighted sibling of
   * [[graft.dedup.Dedup.pageRankMicro]].
   *
   * Scale shape: each iteration is one equi-join of the edge table with
   * the k-row-per-vertex rank table plus one keyed aggregate, lineage
   * cut per round — no driver-side graph state. Callers aggregate the
   * pair input first (weights collapse repeated co-occurrence), so the
   * edge table is vocabulary²-bounded for token graphs, never
   * corpus-sized.
   */
  def weightedPageRankMicro(weightedPairs: DataFrame, iters: Int,
                            aCol: String = "a", bCol: String = "b",
                            wCol: String = "c"): DataFrame = {
    require(iters >= 1, s"weightedPageRankMicro requires iters >= 1 (got $iters)")
    val und = weightedPairs.select(col(aCol).as("a"), col(bCol).as("b"),
      col(wCol).cast("long").as("c"))
    val edges = und.select(col("a").as("src"), col("b").as("dst"), col("c"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst"), col("c")))
      .localCheckpoint()
    val wdeg = edges.groupBy("src").agg(sum("c").as("wd"))
    val withDeg = edges.join(wdeg, "src").localCheckpoint()
    var ranks = wdeg.select(col("src").as("v"), lit(1000000L).as("r"))
    (1 to iters).foreach { _ =>
      ranks = withDeg.join(ranks, col("src") === col("v"))
        .select(col("dst"),
          expr("(34 * r * c + 20 * wd) div (40 * wd)").as("contrib"))
        .groupBy("dst")
        .agg((lit(150000L) + sum("contrib")).as("r"))
        .select(col("dst").as("v"), col("r"))
        .localCheckpoint()
    }
    ranks
  }

  /** DuckDB replay of [[kCorePeel]] as unrolled CTEs: `ed0` must be
    * bound by the caller; emits `d0, v1, ed1, …, ed{rounds}` and a final
    * `kcore` CTE (v, deg). */
  def kCoreOracleCtes(k: Int, rounds: Int): String = {
    val b = new StringBuilder
    for (r <- 0 until rounds) {
      b ++= s"""d$r AS MATERIALIZED (SELECT v, count(*) AS deg FROM (
                SELECT i AS v FROM ed$r UNION ALL SELECT j AS v FROM ed$r)
                GROUP BY v),
             v${r + 1} AS MATERIALIZED (SELECT v FROM d$r WHERE deg >= $k),
             ed${r + 1} AS MATERIALIZED (SELECT i, j FROM ed$r
                WHERE i IN (SELECT v FROM v${r + 1})
                  AND j IN (SELECT v FROM v${r + 1})),
             """
    }
    b ++= s"""kcore AS MATERIALIZED (SELECT v, count(*) AS deg FROM (
              SELECT i AS v FROM ed$rounds UNION ALL SELECT j AS v FROM ed$rounds)
              GROUP BY v HAVING count(*) >= $k)"""
    b.toString
  }
}
