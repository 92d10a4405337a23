package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Sources.table
import graft.sketch.Sketches
import graft.graph.GraphOps

/**
 * Round-6 approximate-query + graph operators: mergeable sketches (KMV
 * distinct / set ops, count-min, Bloom pre-filter), distribution
 * concentration profiling, bipartite co-occurrence + k-core peeling,
 * Markov transition matrices, and an integer FIR smoother. Every sketch
 * estimate is integer arithmetic over the replayable md5 hash, so the
 * oracle re-derives the ESTIMATES exactly — accuracy vs the exact
 * answer is part of the checked output, not a hand-waved claim.
 */
object SketchQueries {

  private val md5sql = graft.ops.Exprs.md5LongSql

  // ----------------------------------------------------- KMV distinct

  /** KMV (bottom-64) distinct customers per order priority next to the
   * exact distinct and the realized error in ppm. The sketch shuffles
   * only distinct (group, hash) pairs and keeps 64 longs per group —
   * at 100 TB the exact column is the expensive one; per-day KMV
   * sketches union by re-ranking 2×64 hashes. */
  val q159KmvDistinct: Q = Q("q159_kmv_distinct",
    s"""WITH h AS (SELECT DISTINCT o_orderpriority AS priority,
             ${md5sql.format("o_custkey")} AS h FROM orders
           WHERE o_custkey IS NOT NULL),
       r AS (SELECT priority, h,
               row_number() OVER (PARTITION BY priority ORDER BY h) AS rk
             FROM h),
       s AS (SELECT priority, count(*) AS n_kept, max(h) AS theta
             FROM r WHERE rk <= 64 GROUP BY 1),
       ex AS (SELECT o_orderpriority AS priority,
                count(DISTINCT o_custkey) AS n_exact FROM orders GROUP BY 1),
       e AS (SELECT priority, n_kept, theta,
               CASE WHEN n_kept < 64 THEN n_kept
                    ELSE (${Sketches.HashSpace} // theta) * 63 END AS est_distinct,
               n_exact
             FROM s JOIN ex USING (priority))
       SELECT priority, n_kept, theta, est_distinct, n_exact,
              abs(est_distinct - n_exact) * 1000000 // n_exact AS err_ppm
       FROM e ORDER BY priority""") { (s, d) =>
    val orders = table(s, d, "orders")
    val exact = orders.groupBy(col("o_orderpriority").as("priority"))
      .agg(count_distinct(col("o_custkey")).as("n_exact"))
    Sketches.kmvDistinct(orders, col("o_custkey"),
        Seq("o_orderpriority"), k = 64)
      .withColumnRenamed("o_orderpriority", "priority")
      .join(exact, "priority")
      .withColumn("err_ppm",
        expr("abs(est_distinct - n_exact) * 1000000 div n_exact"))
      .orderBy("priority")
  }

  // ----------------------------------------------------- KMV set ops

  /** Audience overlap WITHOUT exact distinct: the bottom-128 sketch of
   * the click ∪ purchase user sets estimates union size, intersection
   * size, and Jaccard (members of both inside the uniform bottom-k
   * sample), next to the exact answers for realized accuracy. The
   * classic "overlap of two 10^10-key sets" shape: exact needs a
   * full-key shuffle, the sketch needs 128 longs per side. */
  val q160KmvSetOps: Q = Q("q160_kmv_setops",
    s"""WITH e AS (SELECT ${md5sql.format("user_id")} AS h,
             event_type = 'click' AS a, event_type = 'purchase' AS b
           FROM events
           WHERE event_type IN ('click', 'purchase')
             AND user_id IS NOT NULL),
       g AS (SELECT h, max(a) AS a, max(b) AS b FROM e GROUP BY h),
       r AS (SELECT *, row_number() OVER (ORDER BY h) AS rk FROM g),
       s AS (SELECT count(*) AS n_kept, max(h) AS theta,
               count(*) FILTER (WHERE a) AS n_a,
               count(*) FILTER (WHERE b) AS n_b,
               count(*) FILTER (WHERE a AND b) AS n_both
             FROM r WHERE rk <= 128),
       est AS (SELECT *,
               CASE WHEN n_kept < 128 THEN n_kept
                    ELSE (${Sketches.HashSpace} // theta) * 127 END AS est_union
             FROM s),
       ex AS (SELECT
               count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS exact_a,
               count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS exact_b,
               count(DISTINCT user_id) AS exact_union
             FROM events WHERE event_type IN ('click', 'purchase'))
       SELECT n_kept, theta, n_a, n_b, n_both, est_union,
              est_union * n_both // n_kept AS est_intersection,
              n_both * 1000000 // n_kept AS jaccard_ppm,
              exact_a, exact_b, exact_union,
              (exact_a + exact_b - exact_union) * 1000000 // exact_union
                AS exact_jaccard_ppm
       FROM est CROSS JOIN ex""") { (s, d) =>
    val e = table(s, d, "events")
      .filter(col("event_type").isin("click", "purchase"))
    val exact = e.agg(
      count_distinct(when(col("event_type") === "click", col("user_id")))
        .as("exact_a"),
      count_distinct(when(col("event_type") === "purchase", col("user_id")))
        .as("exact_b"),
      count_distinct(col("user_id")).as("exact_union"))
    Sketches.kmvSetOps(e, col("user_id"),
        col("event_type") === "click", col("event_type") === "purchase",
        k = 128)
      .crossJoin(broadcast(exact))
      .withColumn("exact_jaccard_ppm",
        expr("(exact_a + exact_b - exact_union) * 1000000 div exact_union"))
  }

  // ------------------------------------------------------- count-min

  /** Count-min heavy-hitter estimates: a 3×1024-cell sketch of per-user
   * event counts probed at the 10 exact top users; `est >= exact`
   * always (collisions only add), and the overcount column is the
   * realized bias. The sketch aggregate ships ≤3072 cells whatever the
   * stream volume; daily sketches merge cell-wise. */
  val q161CountMin: Q = Q("q161_count_min",
    """WITH cells AS (SELECT dd.d,
             ('0x'||substr(md5(CAST(user_id AS VARCHAR)||'#'||dd.d),1,15))::BIGINT
               % 1024 AS pos
           FROM events CROSS JOIN (VALUES (0), (1), (2)) dd(d)),
       sk AS (SELECT d, pos, count(*) AS c FROM cells GROUP BY 1, 2),
       ex AS (SELECT user_id, count(*) AS exact FROM events GROUP BY 1),
       top AS (SELECT * FROM ex ORDER BY exact DESC, user_id LIMIT 10),
       est AS (SELECT t.user_id, t.exact, min(sk.c) AS est
               FROM top t JOIN sk
                 ON sk.pos = ('0x'||substr(md5(CAST(t.user_id AS VARCHAR)
                              ||'#'||sk.d),1,15))::BIGINT % 1024
               GROUP BY 1, 2)
       SELECT user_id, exact, est, est - exact AS overcount
       FROM est ORDER BY exact DESC, user_id""") { (s, d) =>
    val ev = table(s, d, "events")
    // the sketch feeds three broadcast probes — checkpoint its 3072
    // cells or each probe join replans the full build scan
    val sketch = Sketches.countMinBuild(ev, col("user_id"),
      depth = 3, width = 1024).localCheckpoint()
    val top = ev.groupBy("user_id").agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("user_id")).limit(10)
    Sketches.countMinQuery(sketch, top, col("user_id"),
        depth = 3, width = 1024)
      .withColumn("overcount", col("est") - col("exact"))
      .select("user_id", "exact", "est", "overcount")
      .orderBy(col("exact").desc, col("user_id"))
  }

  // ---------------------------------------------------- Bloom pre-filter

  /** Bloom-filter pre-filter audit: the BUILDING-segment custkeys packed
   * into a 16384-bit / 3-hash filter (256 long words), probed by every
   * order entirely map-side via broadcast word joins; per priority the
   * exact member count, the Bloom pass count, and the realized false
   * positives. The explicit form of the "cheap bitmap before the
   * expensive join" shape — at 100 TB the filter drops most of the
   * fact table before any shuffle. */
  val q162BloomFilter: Q = Q("q162_bloom_filter",
    """WITH bk AS (SELECT c_custkey AS k FROM customer
                   WHERE c_mktsegment = 'BUILDING'),
       bits AS (SELECT DISTINCT
             ('0x'||substr(md5(CAST(k AS VARCHAR)||'#'||jj.j),1,15))::BIGINT
               % 16384 AS pos
           FROM bk CROSS JOIN (VALUES (0), (1), (2)) jj(j)),
       p AS (SELECT o_orderpriority AS priority,
               o_custkey IN (SELECT k FROM bk) AS ex,
               (('0x'||substr(md5(CAST(o_custkey AS VARCHAR)||'#0'),1,15))::BIGINT
                  % 16384) IN (SELECT pos FROM bits)
               AND (('0x'||substr(md5(CAST(o_custkey AS VARCHAR)||'#1'),1,15))::BIGINT
                  % 16384) IN (SELECT pos FROM bits)
               AND (('0x'||substr(md5(CAST(o_custkey AS VARCHAR)||'#2'),1,15))::BIGINT
                  % 16384) IN (SELECT pos FROM bits) AS pass
             FROM orders)
       SELECT priority, count(*) AS n_orders,
              count(*) FILTER (WHERE ex) AS n_exact,
              count(*) FILTER (WHERE pass) AS n_pass,
              count(*) FILTER (WHERE pass AND NOT ex) AS n_false_pos
       FROM p GROUP BY priority ORDER BY priority""") { (s, d) =>
    val bk = table(s, d, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k"))
    // 256 words feed three probe joins — checkpoint, don't re-scan
    val words = Sketches.bloomBuild(bk, col("k"), numHashes = 3, m = 16384)
      .localCheckpoint()
    Sketches.bloomProbe(words, table(s, d, "orders"), col("o_custkey"),
        numHashes = 3, m = 16384, passCol = "pass")
      .join(broadcast(bk.withColumnRenamed("k", "o_custkey")
        .withColumn("__in", lit(true))), Seq("o_custkey"), "left")
      .withColumn("ex", coalesce(col("__in"), lit(false)))
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_orders"),
        count(when(col("ex"), 1)).as("n_exact"),
        count(when(col("pass"), 1)).as("n_pass"),
        count(when(col("pass") && !col("ex"), 1)).as("n_false_pos"))
      .orderBy("priority")
  }

  // -------------------------------------------- distribution profile

  /** Temporal concentration per event type: Shannon entropy (integer
   * micro-nats, per-term quantized so the sum is order-proof) and Gini
   * impurity (pure integer arithmetic) of each type's hour-of-day
   * histogram — the "is this traffic bursty or uniform" profiling
   * primitive; state is one 24-bucket histogram per group. */
  val q163EntropyProfile: Q = Q("q163_entropy_profile",
    """WITH h AS (SELECT event_type, hour(ts) AS hr, count(*) AS c
                  FROM events GROUP BY 1, 2),
       w AS (SELECT event_type, c,
               CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
             FROM h),
       t AS (SELECT event_type, n, c,
               CAST(round(c * ln(CAST(n AS DOUBLE) / c) / n * 1e6) AS BIGINT) AS ent
             FROM w)
       SELECT event_type, max(n) AS n, count(*) AS n_values,
              CAST(sum(ent) AS BIGINT) AS entropy_micro,
              1000000 - CAST(sum(c * c) AS BIGINT) * 1000000
                // (max(n) * max(n)) AS gini_micro
       FROM t GROUP BY event_type ORDER BY event_type""") { (s, d) =>
    Sketches.distributionProfile(table(s, d, "events"),
        Seq("event_type"), hour(col("ts")).cast("long"))
      .select("event_type", "n", "n_values", "entropy_micro", "gini_micro")
      .orderBy("event_type")
  }

  // ------------------------------------------------------------ k-core

  /** k-core of the supplier co-supply graph (suppliers sharing a part,
   * from parts with ≤15 suppliers — the per-group cap that keeps a
   * bipartite projection from going quadratic on hub groups): 3
   * synchronous peel rounds at k=8, survivors with residual degree.
   * The oracle unrolls the identical peels as nested CTEs. */
  val q164KCore: Q = Q("q164_kcore",
    s"""WITH gi AS (SELECT DISTINCT l_partkey AS g, l_suppkey AS it
                    FROM lineitem),
       ok AS (SELECT g FROM gi GROUP BY g HAVING count(*) <= 15),
       ed0 AS (SELECT DISTINCT a.it AS i, b.it AS j
               FROM gi a JOIN gi b ON a.g = b.g AND a.it < b.it
               WHERE a.g IN (SELECT g FROM ok)),
       ${GraphOps.kCoreOracleCtes(k = 8, rounds = 3)}
       SELECT v AS supplier, CAST(deg AS BIGINT) AS deg
       FROM kcore ORDER BY supplier""") { (s, d) =>
    val edges = LinkQueries.coSupplyEdges(s, d) // shared persisted graph
    GraphOps.kCorePeel(edges, k = 8, rounds = 3)
      .select(col("v").as("supplier"), col("deg"))
      .orderBy("supplier")
  }

  // ------------------------------------------------------ bounded BFS

  /** Bounded-hop BFS over the q164 co-supply graph from its smallest
   * vertex: exact shortest-path distances for everything within 3 hops
   * — per round one neighbor expansion + one min-dist aggregate on a
   * (vertex, dist) frontier, the bounded-traversal recipe that
   * replaces an unbounded recursive join. Oracle unrolls the identical
   * relaxations. */
  val q181BfsHops: Q = Q("q181_bfs_hops",
    s"""WITH gi AS (SELECT DISTINCT l_partkey AS g, l_suppkey AS it
                    FROM lineitem),
       ok AS (SELECT g FROM gi GROUP BY g HAVING count(*) <= 15),
       ed0 AS (SELECT DISTINCT a.it AS i, b.it AS j
               FROM gi a JOIN gi b ON a.g = b.g AND a.it < b.it
               WHERE a.g IN (SELECT g FROM ok)),
       src AS (SELECT min(i) AS v FROM ed0),
       ${GraphOps.bfsOracleCtes(rounds = 3)}
       SELECT v AS supplier, CAST(dist AS BIGINT) AS dist
       FROM b3 ORDER BY supplier""") { (s, d) =>
    val edges = LinkQueries.coSupplyEdges(s, d).localCheckpoint()
    val src = edges.agg(min("i")).head().getLong(0) // scalar source id
    GraphOps.bfsHops(edges, src, rounds = 3)
      .select(col("v").as("supplier"), col("dist"))
      .orderBy("supplier")
  }

  // ------------------------------------------------ Markov transitions

  /** First-order Markov transition matrix over per-user event-type
   * sequences (ties broken by event_id): transition counts and row-
   * normalized probabilities in integer ppm. One user-keyed window
   * shuffle + one tiny (types²) aggregate — the behavioral-model
   * fitting step at any scale. */
  val q165MarkovTransitions: Q = Q("q165_markov_transitions",
    """WITH s AS (SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
           FROM events),
       t AS (SELECT event_type AS from_type, to_type, count(*) AS n
             FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2),
       tot AS (SELECT from_type, sum(n) AS tn FROM t GROUP BY 1)
       SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
              CAST(n * 1000000 // tn AS BIGINT) AS p_ppm
       FROM t JOIN tot USING (from_type)
       ORDER BY from_type, to_type""") { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    table(s, d, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("to_type", lead("event_type", 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("tn", sum("n").over(Window.partitionBy("from_type")))
      .withColumn("p_ppm", expr("n * 1000000 div tn"))
      .drop("tn")
      .orderBy("from_type", "to_type")
  }

  // ------------------------------------------------- integer FIR smoother

  /** Exponential-shaped FIR smoother over daily order counts per
   * priority: binary weights 64,32,…,1 over the 7 trailing observed
   * days (zero-padded at series start), normalized to millionths by
   * integer division — a bit-reproducible EWMA stand-in (true EWMA's
   * float recursion is order-fragile; binary-weight FIR is exact).
   * One date-keyed aggregate + one priority-keyed window. */
  val q166FirSmoother: Q = Q("q166_fir_smoother",
    """WITH dly AS (SELECT o_orderpriority AS priority,
             strftime(o_orderdate, '%Y-%m-%d') AS day, count(*) AS c
           FROM orders GROUP BY 1, 2),
       l AS (SELECT priority, day, c,
               coalesce(lag(c, 1) OVER w, 0) AS c1,
               coalesce(lag(c, 2) OVER w, 0) AS c2,
               coalesce(lag(c, 3) OVER w, 0) AS c3,
               coalesce(lag(c, 4) OVER w, 0) AS c4,
               coalesce(lag(c, 5) OVER w, 0) AS c5,
               coalesce(lag(c, 6) OVER w, 0) AS c6
             FROM dly WINDOW w AS (PARTITION BY priority ORDER BY day))
       SELECT priority, day, CAST(c AS BIGINT) AS c,
              CAST(c*64 + c1*32 + c2*16 + c3*8 + c4*4 + c5*2 + c6
                AS BIGINT) AS wsum,
              CAST((c*64 + c1*32 + c2*16 + c3*8 + c4*4 + c5*2 + c6)
                * 1000000 // 127 AS BIGINT) AS ewma_micro
       FROM l ORDER BY priority, day""") { (s, d) =>
    val w = Window.partitionBy("priority").orderBy("day")
    val lagged = (1 to 6).foldLeft(
      table(s, d, "orders")
        .groupBy(col("o_orderpriority").as("priority"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("c"))) { (acc, i) =>
      acc.withColumn(s"c$i", coalesce(lag("c", i).over(w), lit(0L)))
    }
    lagged
      .withColumn("wsum", expr(
        "c*64 + c1*32 + c2*16 + c3*8 + c4*4 + c5*2 + c6"))
      .withColumn("ewma_micro", expr("wsum * 1000000 div 127"))
      .select("priority", "day", "c", "wsum", "ewma_micro")
      .orderBy("priority", "day")
  }

  // ------------------------------------------------- streaming KMV merge

  /** Streaming KMV distinct merge (the KMV twin of q187's count-min):
   * per-micro-batch bottom-64 hash sets fold by union→distinct→bottom-k
   * in foreachBatch, and the oracle replays the ONE-SHOT batch build —
   * unlike count-min this merge is EXACT set algebra (min-k of a union
   * = min-k of per-part min-k's), so stream ≡ batch holds
   * hash-identically at any batch boundary, not just error-bounded.
   * Output: the saturated sketch next to the exact distinct count and
   * realized error in ppm. */
  val q198StreamKmv: Q = Q("q198_stream_kmv",
    s"""WITH h AS (SELECT DISTINCT ${md5sql.format("user_id")} AS h FROM events),
       r AS (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM h),
       s AS (SELECT count(*) AS n_kept, max(h) AS theta FROM r WHERE rk <= 64),
       ex AS (SELECT count(DISTINCT user_id) AS n_exact FROM events)
       SELECT n_kept, theta,
              CASE WHEN n_kept < 64 THEN n_kept
                   ELSE (${Sketches.HashSpace} // theta) * 63 END AS est_distinct,
              n_exact,
              abs(CASE WHEN n_kept < 64 THEN n_kept
                       ELSE (${Sketches.HashSpace} // theta) * 63 END - n_exact)
                * 1000000 // n_exact AS err_ppm
       FROM s CROSS JOIN ex""") { (s, d) =>
    val sk = graft.streaming.StreamingSketch.runKmvToBatch(s, d, k = 64)
    val exact = table(s, d, "events")
      .agg(count_distinct(col("user_id")).as("n_exact"))
    sk.agg(count(lit(1)).as("n_kept"), max("h").as("theta"))
      .withColumn("est_distinct",
        when(col("n_kept") < 64, col("n_kept"))
          .otherwise(expr(s"(${Sketches.HashSpace} div theta) * 63")))
      .crossJoin(broadcast(exact))
      .withColumn("err_ppm",
        expr("abs(est_distinct - n_exact) * 1000000 div n_exact"))
  }

  // ------------------------------------------- persisted quantile sketch

  private val QK = 1024

  /** Per-day mergeable bottom-k quantile sketches over events.value,
    * built ONCE per (session, sf) by the native
    * [[graft.functions.BottomKSketchAgg]] aggregate and persisted to
    * scratch parquet (day, n, sk: array<struct<h,v>>) — the q130/q133
    * build-once table the probe queries read. */
  private def quantileSketchTable(s: org.apache.spark.sql.SparkSession,
                                  d: String): org.apache.spark.sql.DataFrame =
    graft.io.Scratch.table(s, d, "bottomk_quantile_sketches")(
      table(s, d, "events")
        .filter(col("value").isNotNull && col("ts").isNotNull)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"),
          Sketches.bottomKSketch(
            graft.ops.Exprs.md5Long(col("event_id")), col("value"), QK)
            .as("sk")))

  /** Per-day quantiles from the PERSISTED bottom-k sketch
   * ([[Sketches.bottomKSketch]]) with an oracle-checked certification:
   * each day's p50/p90/p99 estimate is the picked rank of the day's
   * deterministic hash sample (bottom-1024 by (md5, value) — a day
   * smaller than k is sampled whole, so its estimate is EXACT), and
   * the verdict booleans assert the estimate's TRUE rank lies within
   * ±8%·n of q·n (DKW at k=1024: failure odds ~4·10⁻⁶ per day, and the
   * draw is deterministic, so a green verdict is stable). The exact
   * picked quantiles ride along, hash-checked — at 100 TB only the
   * one-pass bounded aggregate runs; this query IS its certification. */
  val q257QuantileSketchDaily: Q = Q("q257_qsketch_daily",
    s"""WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_id, value,
             ${md5sql.format("event_id")} AS h
           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
       kp AS (SELECT day, h, value AS v,
               row_number() OVER (PARTITION BY day ORDER BY h, value) AS kr,
               count(*) OVER (PARTITION BY day) AS n
             FROM e),
       smp AS (SELECT day, v, n,
               row_number() OVER (PARTITION BY day ORDER BY v, h) AS vr,
               count(*) OVER (PARTITION BY day) AS m
             FROM kp WHERE kr <= $QK),
       est AS (SELECT day, max(n) AS n, max(m) AS m,
               max(CASE WHEN vr = CAST(floor(0.5*(m-1)) AS BIGINT)+1 THEN v END) AS est50,
               max(CASE WHEN vr = CAST(floor(0.9*(m-1)) AS BIGINT)+1 THEN v END) AS est90,
               max(CASE WHEN vr = CAST(floor(0.99*(m-1)) AS BIGINT)+1 THEN v END) AS est99
             FROM smp GROUP BY day),
       exr AS (SELECT day, value,
               row_number() OVER (PARTITION BY day ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY day) AS nn
             FROM e),
       exq AS (SELECT day,
               max(CASE WHEN rn = CAST(floor(0.5*(nn-1)) AS BIGINT)+1 THEN value END) AS exact50,
               max(CASE WHEN rn = CAST(floor(0.9*(nn-1)) AS BIGINT)+1 THEN value END) AS exact90,
               max(CASE WHEN rn = CAST(floor(0.99*(nn-1)) AS BIGINT)+1 THEN value END) AS exact99
             FROM exr GROUP BY day),
       cnt AS (SELECT e.day,
               count(CASE WHEN e.value < est50 THEN 1 END) AS lt50,
               count(CASE WHEN e.value <= est50 THEN 1 END) AS le50,
               count(CASE WHEN e.value < est90 THEN 1 END) AS lt90,
               count(CASE WHEN e.value <= est90 THEN 1 END) AS le90,
               count(CASE WHEN e.value < est99 THEN 1 END) AS lt99,
               count(CASE WHEN e.value <= est99 THEN 1 END) AS le99
             FROM e JOIN est ON est.day = e.day GROUP BY e.day)
       SELECT est.day, est.n, est.m, est50, est90, est99,
              exact50, exact90, exact99,
              CAST(lt50 AS DOUBLE) <= 0.58 * est.n AND CAST(le50 AS DOUBLE) >= 0.42 * est.n AS ok50,
              CAST(lt90 AS DOUBLE) <= 0.98 * est.n AND CAST(le90 AS DOUBLE) >= 0.82 * est.n AS ok90,
              CAST(lt99 AS DOUBLE) <= 1.07 * est.n AND CAST(le99 AS DOUBLE) >= 0.91 * est.n AS ok99
       FROM est JOIN exq ON exq.day = est.day
                JOIN cnt ON cnt.day = est.day
       ORDER BY est.day""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val skt = quantileSketchTable(s, d)
    val wD = Window.partitionBy("day")
    val smp = skt.select(col("day"), col("n"), explode(col("sk")).as("e"))
      .select(col("day"), col("n"), col("e.h").as("h"), col("e.v").as("v"))
      .withColumn("vr", row_number().over(wD.orderBy(col("v"), col("h"))))
      .withColumn("m", count(lit(1)).over(wD))
    def pick(q: Double, as: String) =
      max(when(col("vr") === (floor(lit(q) * (col("m") - 1)) + 1), col("v")))
        .as(as)
    val est = smp.groupBy("day").agg(max("n").as("n"), max("m").as("m"),
      pick(0.5, "est50"), pick(0.9, "est90"), pick(0.99, "est99"))
      .localCheckpoint() // counts join + final join read it (30 rows)
    val e = table(s, d, "events")
      .filter(col("value").isNotNull && col("ts").isNotNull)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_id"), col("value"))
      .localCheckpoint() // exact ranks + envelope counts read it
    val ranked = e
      .withColumn("rn", row_number().over(wD.orderBy(col("value"), col("event_id"))))
      .withColumn("nn", count(lit(1)).over(wD))
    def pickEx(q: Double, as: String) =
      max(when(col("rn") === (floor(lit(q) * (col("nn") - 1)) + 1),
        col("value"))).as(as)
    val exq = ranked.groupBy("day").agg(
      pickEx(0.5, "exact50"), pickEx(0.9, "exact90"), pickEx(0.99, "exact99"))
    val cnt = e.join(broadcast(est), Seq("day"))
      .groupBy("day").agg(
        count(when(col("value") < col("est50"), 1)).as("lt50"),
        count(when(col("value") <= col("est50"), 1)).as("le50"),
        count(when(col("value") < col("est90"), 1)).as("lt90"),
        count(when(col("value") <= col("est90"), 1)).as("le90"),
        count(when(col("value") < col("est99"), 1)).as("lt99"),
        count(when(col("value") <= col("est99"), 1)).as("le99"))
    est.join(exq, Seq("day")).join(cnt, Seq("day"))
      .select(col("day"), col("n"), col("m"),
        col("est50"), col("est90"), col("est99"),
        col("exact50"), col("exact90"), col("exact99"),
        (col("lt50").cast("double") <= lit(0.58) * col("n") &&
          col("le50").cast("double") >= lit(0.42) * col("n")).as("ok50"),
        (col("lt90").cast("double") <= lit(0.98) * col("n") &&
          col("le90").cast("double") >= lit(0.82) * col("n")).as("ok90"),
        (col("lt99").cast("double") <= lit(1.07) * col("n") &&
          col("le99").cast("double") >= lit(0.91) * col("n")).as("ok99"))
      .orderBy("day")
  }

  /** Corpus-wide quantiles by MERGING the persisted per-day sketches —
   * no re-scan of raw events on the estimate path
   * ([[Sketches.mergeBottomKQuantiles]]: union the bounded sketch rows,
   * keep the global bottom-k by (h, v) — exactly the sketch a single
   * pass over the whole corpus would emit, the KMV merge argument —
   * and read picked ranks off the merged sample; SketchesSpec pins
   * that this path scans ONLY the sketch parquet). The raw-events side
   * here is the certification: true-rank envelopes at ±7%·n (DKW,
   * deterministic draw). */
  val q258QuantileSketchMerge: Q = Q("q258_qsketch_merge",
    s"""WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_id, value,
             ${md5sql.format("event_id")} AS h
           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
       kp AS (SELECT day, h, value AS v,
               row_number() OVER (PARTITION BY day ORDER BY h, value) AS kr
             FROM e),
       g AS (SELECT v, h, row_number() OVER (ORDER BY h, v) AS gr
             FROM kp WHERE kr <= $QK),
       smp AS (SELECT v, row_number() OVER (ORDER BY v, h) AS vr,
                count(*) OVER () AS m
              FROM g WHERE gr <= $QK),
       tot AS (SELECT count(*) AS n FROM e),
       est AS (SELECT max(m) AS m,
               max(CASE WHEN vr = CAST(floor(0.5*(m-1)) AS BIGINT)+1 THEN v END) AS q500,
               max(CASE WHEN vr = CAST(floor(0.9*(m-1)) AS BIGINT)+1 THEN v END) AS q900,
               max(CASE WHEN vr = CAST(floor(0.99*(m-1)) AS BIGINT)+1 THEN v END) AS q990
             FROM smp),
       cnt AS (SELECT
               count(CASE WHEN value < q500 THEN 1 END) AS lt50,
               count(CASE WHEN value <= q500 THEN 1 END) AS le50,
               count(CASE WHEN value < q900 THEN 1 END) AS lt90,
               count(CASE WHEN value <= q900 THEN 1 END) AS le90,
               count(CASE WHEN value < q990 THEN 1 END) AS lt99,
               count(CASE WHEN value <= q990 THEN 1 END) AS le99
             FROM e, est)
       SELECT n, m, q500, q900, q990,
              CAST(lt50 AS DOUBLE) <= 0.57 * n AND CAST(le50 AS DOUBLE) >= 0.43 * n AS ok50,
              CAST(lt90 AS DOUBLE) <= 0.97 * n AND CAST(le90 AS DOUBLE) >= 0.83 * n AS ok90,
              CAST(lt99 AS DOUBLE) <= 1.06 * n AND CAST(le99 AS DOUBLE) >= 0.92 * n AS ok99
       FROM tot, est, cnt""") { (s, d) =>
    val skt = quantileSketchTable(s, d)
    val est = Sketches.mergeBottomKQuantiles(skt, col("sk"), col("n"), QK,
      Seq(0.5, 0.9, 0.99)).localCheckpoint() // 1 row; counts + output read it
    val e = table(s, d, "events")
      .filter(col("value").isNotNull && col("ts").isNotNull)
      .select(col("value"))
    val cnt = e.crossJoin(broadcast(est))
      .agg(count(when(col("value") < col("q500"), 1)).as("lt50"),
        count(when(col("value") <= col("q500"), 1)).as("le50"),
        count(when(col("value") < col("q900"), 1)).as("lt90"),
        count(when(col("value") <= col("q900"), 1)).as("le90"),
        count(when(col("value") < col("q990"), 1)).as("lt99"),
        count(when(col("value") <= col("q990"), 1)).as("le99"))
    est.crossJoin(broadcast(cnt))
      .select(col("n"), col("m"), col("q500"), col("q900"), col("q990"),
        (col("lt50").cast("double") <= lit(0.57) * col("n") &&
          col("le50").cast("double") >= lit(0.43) * col("n")).as("ok50"),
        (col("lt90").cast("double") <= lit(0.97) * col("n") &&
          col("le90").cast("double") >= lit(0.83) * col("n")).as("ok90"),
        (col("lt99").cast("double") <= lit(1.06) * col("n") &&
          col("le99").cast("double") >= lit(0.92) * col("n")).as("ok99"))
  }

  /** Streaming twin of the bottom-k quantile sample: events stream in
   * one file per micro-batch and each batch's native-aggregate sketch
   * folds into the running sample by union → bottom-k — an EXACT
   * monoid (bottom-k of a union ≡ bottom-k of per-part bottom-ks), so
   * the streamed sample is hash-identical to the one-shot batch build
   * the oracle computes, at any batch boundary or arrival order. */
  val q263StreamQsketch: Q = Q("q263_stream_qsketch",
    s"""WITH e AS (SELECT event_id, value, ${md5sql.format("event_id")} AS h
           FROM events WHERE value IS NOT NULL)
       SELECT h, value AS v FROM e ORDER BY h, v LIMIT 256""") { (s, d) =>
    graft.streaming.StreamingSketch.runBottomKToBatch(s, d, k = 256)
      .orderBy("h", "v")
  }

  /** GROUPED sketch-merge reporting: monthly p50/p90 of events.value
   * from the PERSISTED per-day bottom-k sketches — the reporting-query
   * consumer the daily sketch table exists for. Each month's estimate
   * merges only its days' sketches (bottom-k of a union of bottom-k's
   * IS the bottom-k of the union — the KMV closure property — so the
   * merged sample is a uniform hash sample of the month); the raw
   * events scan appears ONLY on the certification side, exactly like
   * q257/q258. Estimates are hash-checked picked ranks; the verdicts
   * assert each estimate's true rank within ±8%·n (DKW at k=1024,
   * deterministic draw → stable). */
  val q276QsketchMonthly: Q = Q("q276_qsketch_monthly",
    s"""WITH e AS (SELECT strftime(ts, '%Y-%m') AS month,
             strftime(ts, '%Y-%m-%d') AS day, event_id, value,
             ${md5sql.format("event_id")} AS h
           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
       kp AS (SELECT month, h, value AS v,
               row_number() OVER (PARTITION BY day ORDER BY h, value) AS kr
             FROM e),
       g AS (SELECT month, v, h,
               row_number() OVER (PARTITION BY month ORDER BY h, v) AS gr
             FROM kp WHERE kr <= $QK),
       smp AS (SELECT month, v,
                row_number() OVER (PARTITION BY month ORDER BY v, h) AS vr,
                count(*) OVER (PARTITION BY month) AS m
              FROM g WHERE gr <= $QK),
       tot AS (SELECT month, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY month),
       est AS (SELECT month, max(m) AS m,
               max(CASE WHEN vr = CAST(floor(0.5*(m-1)) AS BIGINT)+1 THEN v END) AS est50,
               max(CASE WHEN vr = CAST(floor(0.9*(m-1)) AS BIGINT)+1 THEN v END) AS est90
             FROM smp GROUP BY month),
       cnt AS (SELECT e.month,
               count(CASE WHEN e.value < est50 THEN 1 END) AS lt50,
               count(CASE WHEN e.value <= est50 THEN 1 END) AS le50,
               count(CASE WHEN e.value < est90 THEN 1 END) AS lt90,
               count(CASE WHEN e.value <= est90 THEN 1 END) AS le90
             FROM e JOIN est ON e.month = est.month
             GROUP BY e.month, est50, est90)
       SELECT t.month, n, m, est50, est90,
              CAST(lt50 AS DOUBLE) <= 0.58 * n AND CAST(le50 AS DOUBLE) >= 0.42 * n AS ok50,
              CAST(lt90 AS DOUBLE) <= 0.98 * n AND CAST(le90 AS DOUBLE) >= 0.82 * n AS ok90
       FROM tot t JOIN est ON t.month = est.month JOIN cnt ON t.month = cnt.month
       ORDER BY t.month""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val skt = quantileSketchTable(s, d)
      .withColumn("month", substring(col("day"), 1, 7))
    val nTab = skt.groupBy("month").agg(sum("n").cast("long").as("n"))
    val sm = skt.select(col("month"), explode(col("sk")).as("e"))
      .select(col("month"), col("e.h").as("h"), col("e.v").as("v"))
    val wG = Window.partitionBy("month").orderBy(col("h"), col("v"))
    val wV = Window.partitionBy("month").orderBy(col("v"), col("h"))
    val smp = sm.withColumn("gr", row_number().over(wG))
      .filter(col("gr") <= QK)
      .withColumn("vr", row_number().over(wV))
      .withColumn("m", count(lit(1)).over(Window.partitionBy("month")))
    def pick(q: Double, name: String) =
      max(when(col("vr") ===
        floor(lit(q) * (col("m") - 1)).cast("long") + 1, col("v"))).as(name)
    val est = smp.groupBy("month")
      .agg(max("m").as("m"), pick(0.5, "est50"), pick(0.9, "est90"))
      .join(nTab, "month")
      .localCheckpoint() // merge-only estimate done; the truth scan reads it
    table(s, d, "events")
      .filter(col("value").isNotNull && col("ts").isNotNull)
      .select(date_format(col("ts"), "yyyy-MM").as("month"), col("value"))
      .join(broadcast(est), "month")
      .groupBy("month", "n", "m", "est50", "est90")
      .agg(count(when(col("value") < col("est50"), 1)).as("lt50"),
        count(when(col("value") <= col("est50"), 1)).as("le50"),
        count(when(col("value") < col("est90"), 1)).as("lt90"),
        count(when(col("value") <= col("est90"), 1)).as("le90"))
      .select(col("month"), col("n"), col("m"), col("est50"), col("est90"),
        (col("lt50").cast("double") <= lit(0.58) * col("n") &&
          col("le50").cast("double") >= lit(0.42) * col("n")).as("ok50"),
        (col("lt90").cast("double") <= lit(0.98) * col("n") &&
          col("le90").cast("double") >= lit(0.82) * col("n")).as("ok90"))
      .orderBy("month")
  }

  // ------------------------------------------- sliding-window KMV merge

  /** 7-day sliding distinct users from PER-DAY bottom-64 sketches
   * ([[Sketches.kmvSlidingDistinct]]) — the mergeable-sketch answer to
   * "unique visitors in the trailing week, every day": daily sketches
   * are built once and each window re-ranks ≤ 7·64 sketch hashes,
   * instead of rescanning the window's raw keys per day. Emitted next
   * to the EXACT sliding distinct (computed from the distinct
   * (day, user) table through the same window fan-out — the expensive
   * path the sketch replaces) and the realized error in ppm, so the
   * estimator itself is hash-gated day by day. Leading partial windows
   * are included (n_kept < 64 ⇒ exact by the KMV contract). */
  val q315SlidingKmv: Q = Q("q315_sliding_kmv",
    s"""WITH e AS (SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
             ${md5sql.format("user_id")} AS h, user_id
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
       dh AS (SELECT DISTINCT d, h FROM e),
       daily AS (SELECT d, h FROM (
             SELECT d, h, row_number() OVER (PARTITION BY d ORDER BY h) AS rk
             FROM dh) WHERE rk <= 64),
       days AS (SELECT DISTINCT d AS td FROM dh),
       fan AS (SELECT DISTINCT f.td, f.h FROM (
             SELECT d + off AS td, h
             FROM daily CROSS JOIN (SELECT unnest(range(0, 7)) AS off)) f
             JOIN days ON days.td = f.td),
       r AS (SELECT td, h, row_number() OVER (PARTITION BY td ORDER BY h) AS rk
             FROM fan),
       s AS (SELECT td, CAST(count(*) AS BIGINT) AS n_kept, max(h) AS theta
             FROM r WHERE rk <= 64 GROUP BY td),
       est AS (SELECT td, n_kept, theta,
                 CASE WHEN n_kept < 64 THEN n_kept
                      ELSE (${Sketches.HashSpace} // theta) * 63 END AS est_distinct
               FROM s),
       du AS (SELECT DISTINCT d, user_id FROM e),
       exf AS (SELECT DISTINCT f.td, f.user_id FROM (
             SELECT d + off AS td, user_id
             FROM du CROSS JOIN (SELECT unnest(range(0, 7)) AS off)) f
             JOIN days ON days.td = f.td),
       ex AS (SELECT td, CAST(count(*) AS BIGINT) AS n_exact
              FROM exf GROUP BY td)
       SELECT est.td AS day_idx, n_kept, theta, est_distinct, n_exact,
              abs(est_distinct - n_exact) * 1000000 // n_exact AS err_ppm
       FROM est JOIN ex ON ex.td = est.td ORDER BY day_idx""") { (s, d) =>
    val dcol = datediff(col("ts").cast("date"),
      lit("1970-01-01").cast("date")).cast("long")
    val ev = table(s, d, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    val sk = Sketches.kmvSlidingDistinct(ev, col("user_id"), dcol,
      k = 64, window = 7)
    // exact verdict path: distinct (day, user) through the same fan-out
    val du = ev.select(dcol.as("dd"), col("user_id")).distinct()
      .localCheckpoint() // day list + fan-out both read it
    val days = du.select(col("dd").as("td")).distinct()
    val exact = du
      .select(col("dd"), col("user_id"), explode(expr("sequence(0, 6)")).as("off"))
      .select((col("dd") + col("off")).as("td"), col("user_id"))
      .join(days, "td").distinct()
      .groupBy("td").agg(count(lit(1)).as("n_exact"))
    sk.join(exact, "td")
      .select(col("td").as("day_idx"), col("n_kept"), col("theta"),
        col("est_distinct"), col("n_exact"),
        expr("abs(est_distinct - n_exact) * 1000000 div n_exact")
          .as("err_ppm"))
      .orderBy("day_idx")
  }

  val all: Seq[Q] = Seq(q159KmvDistinct, q160KmvSetOps, q161CountMin,
    q162BloomFilter, q163EntropyProfile, q164KCore, q165MarkovTransitions,
    q166FirSmoother, q181BfsHops, q198StreamKmv,
    q257QuantileSketchDaily, q258QuantileSketchMerge, q263StreamQsketch,
    q276QsketchMonthly, q315SlidingKmv)
}
