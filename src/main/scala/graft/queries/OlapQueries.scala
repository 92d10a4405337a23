package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Sources.table
import graft.dedup.Dedup
import graft.text.TextAnalysis

/**
 * Round-6 OLAP-breadth operators: multi-dimensional CUBE subtotals,
 * degree-oriented triangle enumeration over the near-dup graph,
 * a Deequ-style data-quality constraint audit, incremental materialized
 * aggregate maintenance, and the deep star join (TPC-H Q5 shape). Every
 * oracle replays the full arithmetic so the semantics are hash-checked.
 */
object OlapQueries {

  /** [[CoreQueries.moneySum]] — one copy of the money rule. */
  private def moneySum(c: org.apache.spark.sql.Column) =
    CoreQueries.moneySum(c)

  // ------------------------------------------------------------------ cube

  /** Multi-dimensional CUBE: revenue/count for every subset of
   * (returnflag, linestatus), subtotal rows marked by `grouping_id`
   * (leftmost dim = MSB — same convention as DuckDB's GROUPING). At
   * scale the Expand operator replicates rows 4× BEFORE the aggregate,
   * but partial (map-side) aggregation collapses each grouping set to
   * its group count per task, so the exchange still carries aggregate
   * rows, not the 4× fact table. Complements q17's single-dim rollup. */
  val q137Cube: Q = Q("q137_cube",
    """SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       count(*) AS n
       FROM lineitem
       GROUP BY CUBE (l_returnflag, l_linestatus)
       ORDER BY gid, l_returnflag, l_linestatus""") { (s, d) =>
    table(s, d, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("gid", "l_returnflag", "l_linestatus")
  }

  // ------------------------------------------------------------- triangles

  /** Triangle enumeration in the MinHash near-dup graph (dup-cluster
   * cliques): [[Dedup.triangles]] runs the degree-oriented wedge join —
   * per-node out-degree bounded by O(√m), so one celebrity document
   * cannot make the wedge stage quadratic — while the oracle replays
   * the same pair set (TextQueries.minhashPairCtes) and enumerates with
   * the naive id-ordered 3-way join. Both yield each triangle once as
   * a < b < c, so the skew-safe plan is hash-checked against the
   * textbook definition. */
  val q138Triangles: Q = Q("q138_triangles",
    s"""WITH ${TextQueries.minhashPairCtes},
       e AS (SELECT i AS a, j AS b FROM pairs)
       SELECT CAST(e1.a AS BIGINT) AS a, CAST(e1.b AS BIGINT) AS b,
              CAST(e2.b AS BIGINT) AS c
       FROM e e1 JOIN e e2 ON e2.a = e1.b
                 JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
       ORDER BY a, b, c""") { (s, d) =>
    Dedup.triangles(TextQueries.sharedMinhashPairs(s, d))
      .orderBy("a", "b", "c")
  }

  // ---------------------------------------------------------- quality audit

  /** Data-quality constraint audit (the Deequ/expectations shape a
   * training-data pipeline gates ingests on): completeness, key
   * uniqueness, referential integrity, value ranges and accepted
   * values, each emitted as (check_name, n_ok, n_total, metric,
   * passed). One conditional-aggregate pass per table (plus one
   * anti-join for the foreign key) — the metrics all ride map-side
   * combined counts, never a row-level materialization. The
   * `nonneg_c_acctbal` check legitimately FAILS on this data (negative
   * balances exist), so the gate proves both verdict polarities. The
   * referential check is spelled NOT EXISTS, not NOT IN — NOT IN's
   * three-valued logic diverges from left_anti when either side holds
   * a NULL key (a NULL o_custkey IS an orphan to left_anti but filtered
   * by NOT IN; one NULL c_custkey nullifies NOT IN entirely). */
  val q139QualityAudit: Q = Q("q139_quality_audit",
    """WITH o AS (SELECT count(*) AS n_rows, count(o_custkey) AS n_nonnull,
                         count(DISTINCT o_orderkey) AS n_distinct FROM orders),
       ri AS (SELECT count(*) AS n_orphan FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)),
       l AS (SELECT count(*) AS l_rows,
                    count(*) FILTER (WHERE l_discount >= 0 AND l_discount <= 0.1) AS n_in_range,
                    count(*) FILTER (WHERE l_returnflag IN ('A','N','R')) AS n_accepted
             FROM lineitem),
       c AS (SELECT count(*) AS c_rows,
                    count(*) FILTER (WHERE c_acctbal >= 0) AS n_nonneg FROM customer),
       checks AS (
         SELECT 'completeness_o_custkey' AS check_name, n_nonnull AS n_ok, n_rows AS n_total FROM o
         UNION ALL SELECT 'uniqueness_o_orderkey', n_distinct, n_rows FROM o
         UNION ALL SELECT 'ref_orders_customer', o.n_rows - ri.n_orphan, o.n_rows FROM o, ri
         UNION ALL SELECT 'range_l_discount', n_in_range, l_rows FROM l
         UNION ALL SELECT 'accepted_values_l_returnflag', n_accepted, l_rows FROM l
         UNION ALL SELECT 'nonneg_c_acctbal', n_nonneg, c_rows FROM c)
       SELECT check_name, CAST(n_ok AS BIGINT) AS n_ok,
              CAST(n_total AS BIGINT) AS n_total,
              round(CAST(n_ok AS DOUBLE) / n_total, 6) AS metric,
              n_ok = n_total AS passed
       FROM checks ORDER BY check_name""") { (s, d) =>
    val oAgg = table(s, d, "orders").agg(
      count(lit(1)).as("n_rows"),
      count(col("o_custkey")).as("n_nonnull"),
      count_distinct(col("o_orderkey")).as("n_distinct"))
    val orphans = table(s, d, "orders")
      .join(table(s, d, "customer").select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphan"))
    val lAgg = table(s, d, "lineitem").agg(
      count(lit(1)).as("l_rows"),
      count(when(col("l_discount") >= 0 && col("l_discount") <= 0.1, 1))
        .as("n_in_range"),
      count(when(col("l_returnflag").isin("A", "N", "R"), 1)).as("n_accepted"))
    val cAgg = table(s, d, "customer").agg(
      count(lit(1)).as("c_rows"),
      count(when(col("c_acctbal") >= 0, 1)).as("n_nonneg"))
    oAgg.crossJoin(broadcast(orphans)).crossJoin(broadcast(lAgg))
      .crossJoin(broadcast(cAgg))
      .select(expr("""stack(6,
          'completeness_o_custkey', n_nonnull, n_rows,
          'uniqueness_o_orderkey', n_distinct, n_rows,
          'ref_orders_customer', n_rows - n_orphan, n_rows,
          'range_l_discount', n_in_range, l_rows,
          'accepted_values_l_returnflag', n_accepted, l_rows,
          'nonneg_c_acctbal', n_nonneg, c_rows) AS (check_name, n_ok, n_total)"""))
      .select(col("check_name"), col("n_ok"), col("n_total"),
        round(col("n_ok").cast("double") / col("n_total"), 6).as("metric"),
        (col("n_ok") === col("n_total")).as("passed"))
      .orderBy("check_name")
  }

  // ------------------------------------------------------- incremental agg

  /** Incremental materialized-aggregate maintenance: the daily order
   * rollup for CLOSED months is computed once and persisted; when the
   * current month's data arrives, only that month is re-aggregated and
   * unioned with the stored base — the closed partitions are never
   * re-scanned (at 100 TB the nightly job reads one day, not three
   * years). Day-partitioned groups are disjoint across the cutoff, so
   * base ∪ delta is PROVABLY the full re-aggregation — which is exactly
   * what the oracle computes from raw orders. The cutoff scalar (first
   * day of the max month) is a bounded driver collect (q43 pattern). */
  val q140IncrementalAgg: Q = Q("q140_incremental_agg",
    """SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
       FROM orders GROUP BY 1 ORDER BY 1""") { (s, d) =>
    val orders = table(s, d, "orders")
    // collect the cutoff as a STRING and cast back to the column's own
    // type — immune to the TIMESTAMP vs TIMESTAMP_NTZ external-type
    // split (a typed getTimestamp breaks when parquet maps to NTZ)
    val cutoffStr = orders
      .agg(date_format(date_trunc("MONTH", max(col("o_orderdate"))),
        "yyyy-MM-dd HH:mm:ss").as("c"))
      .head().getString(0)
    val cutoff = lit(cutoffStr).cast(orders.schema("o_orderdate").dataType)
    def dailyAgg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("revenue"))
    val dir = graft.io.Sources.scratchDir("graft_incr")
    dailyAgg(orders.filter(col("o_orderdate") < cutoff))
      .write.mode("overwrite").parquet(s"$dir/base")
    s.read.parquet(s"$dir/base")
      .unionByName(dailyAgg(orders.filter(col("o_orderdate") >= cutoff)))
      .orderBy("day")
  }

  // ------------------------------------------------------------- star join

  /** Deep star join (TPC-H Q5 shape): local-supplier revenue per nation
   * for one region and year — lineitem ⋈ supplier(broadcast) ⋈ orders ⋈
   * customer with the c_nationkey = s_nationkey "local supplier"
   * predicate folded into the customer join, then nation/region
   * broadcast and a nation-sized aggregate. The only big-big exchanges
   * are orders⋈customer (custkey) and lineitem⋈orders (orderkey); the
   * date filter prunes orders BEFORE its shuffle, and every dimension
   * rides a broadcast — the canonical 100 TB star-join plan. */
  val q141StarJoin: Q = Q("q141_star_join",
    """SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
       FROM lineitem, orders, customer, supplier, nation, region
       WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
         AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       GROUP BY n_name ORDER BY n_name""") { (s, d) =>
    val orders = table(s, d, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
    table(s, d, "lineitem")
      .join(broadcast(table(s, d, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(table(s, d, "customer"),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(table(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(table(s, d, "region")
          .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy("n_name")
  }

  // ------------------------------------------------- sliding distinct users

  /** Rolling 7-day distinct users per day — the sliding-window
   * count-distinct a DAU/WAU dashboard needs, which no plain window
   * frame can express (distinct doesn't decompose over frames). Scale
   * shape: events first collapse to the distinct (day, user) table,
   * each row then explodes to the ≤7 window-end days it contributes to
   * (a BOUNDED 7× expansion of the already-aggregated table, never the
   * raw stream), and one count-distinct shuffle keyed by window-end
   * finishes. The oracle replays with the equivalent range self-join. */
  val q142SlidingDistinct: Q = Q("q142_sliding_distinct",
    """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
       days AS (SELECT DISTINCT day FROM du),
       w AS (SELECT d.day, du.user_id FROM days d
             JOIN du ON du.day BETWEEN d.day - 6 AND d.day)
       SELECT strftime(day, '%Y-%m-%d') AS day, count(DISTINCT user_id) AS u7
       FROM w GROUP BY 1 ORDER BY 1""") { (s, d) =>
    // the distinct (day, user) table feeds BOTH the explode side and
    // the day-domain side — checkpoint it so events scan+distinct once
    val du = table(s, d, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .localCheckpoint()
    val days = du.select(col("day").as("wend")).distinct()
    du.select(explode(sequence(col("day"), date_add(col("day"), 6))).as("wend"),
        col("user_id"))
      .join(broadcast(days), Seq("wend"), "left_semi")
      .groupBy("wend")
      .agg(count_distinct(col("user_id")).as("u7"))
      .select(date_format(col("wend"), "yyyy-MM-dd").as("day"), col("u7"))
      .orderBy("day")
  }

  // -------------------------------------------------- correlation matrix

  /** Pairwise Pearson correlation of daily counts between event types,
   * from EXACT integer moments (q136's trick extended with the sqrt
   * denominator): all Σ are BIGINT sums over the zero-filled day×type
   * count table, and the oracle mirrors the final float expression
   * shape exactly — `num / sqrt(d1 · d2)` — so r replays
   * bit-identically. The moment aggregate runs on the day-keyed
   * self-join of a DAYS×TYPES-sized table (bounded, broadcastable),
   * never on raw events. */
  val q143Correlation: Q = Q("q143_correlation",
    """WITH e AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
       d AS (SELECT DISTINCT day FROM e), t AS (SELECT DISTINCT event_type FROM e),
       c AS (SELECT day, event_type, count(*) AS n FROM e GROUP BY 1, 2),
       f AS (SELECT d.day, t.event_type, coalesce(c.n, 0) AS n
             FROM d CROSS JOIN t LEFT JOIN c USING (day, event_type)),
       p AS (SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS n,
                    sum(a.n) AS sx, sum(b.n) AS sy, sum(a.n*a.n) AS sxx,
                    sum(b.n*b.n) AS syy, sum(a.n*b.n) AS sxy,
                    min(a.n) = max(a.n) OR min(b.n) = max(b.n) AS zerovar
             FROM f a JOIN f b USING (day) WHERE a.event_type < b.event_type
             GROUP BY 1, 2)
       SELECT ta, tb,
              CASE WHEN zerovar THEN NULL
                   ELSE round(CAST(n*sxy - sx*sy AS DOUBLE) /
                     sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)),
                     6) END AS r
       FROM p ORDER BY ta, tb""") { (s, d) =>
    // ONE events scan: the (day,type) count table is checkpointed and
    // the day/type domains derive from IT (not from events re-scans) —
    // the zero-fill cross join then runs on bounded broadcast sides
    val c = table(s, d, "events")
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy("day", "event_type").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val f = c.select("day").distinct()
      .crossJoin(broadcast(c.select("event_type").distinct()))
      .join(c, Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
    val a = f.select(col("day"), col("event_type").as("ta"), col("n").as("xn"))
    val b = f.select(col("day"), col("event_type").as("tb"), col("n").as("yn"))
    a.join(b, Seq("day")).filter(col("ta") < col("tb"))
      .groupBy("ta", "tb")
      .agg(count(lit(1)).as("n"),
        sum("xn").as("sx"), sum("yn").as("sy"),
        sum(col("xn") * col("xn")).as("sxx"),
        sum(col("yn") * col("yn")).as("syy"),
        sum(col("xn") * col("yn")).as("sxy"),
        // either series constant (incl. the 1-day degenerate span) →
        // 0/0 — NaN in Spark but NULL in DuckDB, so guard to NULL
        (min("xn") === max("xn") || min("yn") === max("yn")).as("zerovar"))
      .select(col("ta"), col("tb"),
        when(col("zerovar"), lit(null)).otherwise(
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy")).cast("double")),
            6)).as("r"))
      .orderBy("ta", "tb")
  }

  // ---------------------------------------------------- last-touch attribution

  /** Last-touch click attribution: each purchase is credited to the
   * same user's most recent click within a 1-hour horizon (nullable
   * miss rows kept — the attribution-with-misses marketing shape). One
   * user-keyed exchange: a carry-forward `last(_, ignoreNulls)` window
   * drags the latest click (id, time) past every event, then the
   * purchase filter and horizon test are map-side. Timestamps compare
   * as exact epoch micros (no float time arithmetic). */
  val q144Attribution: Q = Q("q144_attribution",
    """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
       w AS (SELECT *,
               last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS c_id,
               last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS c_us
             FROM e)
       SELECT event_id AS purchase_id,
              CASE WHEN us - c_us <= 3600000000 THEN c_id END AS click_id,
              CASE WHEN us - c_us <= 3600000000 THEN us - c_us END AS gap_us
       FROM w WHERE event_type = 'purchase' ORDER BY purchase_id""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val horizon = 3600000000L // 1 hour in micros
    table(s, d, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("c_id",
        last(when(col("event_type") === "click", col("event_id")), true).over(w))
      .withColumn("c_us",
        last(when(col("event_type") === "click", col("us")), true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        when(col("us") - col("c_us") <= horizon, col("c_id")).as("click_id"),
        when(col("us") - col("c_us") <= horizon, col("us") - col("c_us"))
          .as("gap_us"))
      .orderBy("purchase_id")
  }

  // --------------------------------------------------- time-weighted average

  /** Time-weighted average (TWAP) of event values per (day, type): each
   * event's value holds until the next event of the same group (or
   * midnight), so the weight is the exact micros interval — BIGINT ×
   * milli-quantized value keeps the weighted sum exact at any
   * partitioning; only the final Σwv/Σw division is floating point
   * (mirrored in the oracle). One (day,type)-keyed window exchange,
   * reused by the aggregate. */
  val q145Twap: Q = Q("q145_twap",
    """WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, event_id,
                         epoch_us(ts) AS us, CAST(round(value*1000) AS BIGINT) AS v,
                         epoch_us(CAST(date_trunc('day', ts) + INTERVAL 1 DAY AS TIMESTAMP)) AS day_end
                  FROM events),
       w AS (SELECT day, event_type, v,
                    coalesce(lead(us) OVER (PARTITION BY day, event_type
                                            ORDER BY us, event_id), day_end) - us AS wt
             FROM e)
       SELECT day, event_type,
              round(CAST(sum(v*wt) AS DOUBLE) / sum(wt), 4) AS twap_milli
       FROM w GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("day", "event_type")
      .orderBy(col("us"), col("event_id"))
    table(s, d, "events")
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"),
        col("event_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 1000, 0).cast("long").as("v"),
        unix_micros(date_trunc("DAY", col("ts")) + expr("INTERVAL 1 DAY"))
          .as("day_end"))
      .withColumn("wt",
        coalesce(lead(col("us"), 1).over(w), col("day_end")) - col("us"))
      .groupBy("day", "event_type")
      .agg(round(sum(col("v") * col("wt")).cast("double") / sum(col("wt")), 4)
        .as("twap_milli"))
      .orderBy("day", "event_type")
  }

  // ----------------------------------------------------------- A/B test lift

  /** A/B lift with a two-proportion pooled z-score: arms assigned by the
   * engine's deterministic md5 user split (no rand() — reproducible at
   * any scale/partitioning), conversion = any purchase over the value
   * threshold, and the z statistic is computed from EXACT per-arm
   * BIGINT counts with the float expression shape mirrored in the
   * oracle. One user-keyed aggregate then an arm-sized (2-row)
   * reduction — nothing driver-side. */
  val q146AbLift: Q = Q("q146_ab_lift",
    """WITH a AS (SELECT user_id,
                    ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT % 2 AS arm,
                    max(CASE WHEN event_type = 'purchase' AND value > 90 THEN 1 ELSE 0 END) AS conv
                  FROM events GROUP BY 1, 2),
       s AS (SELECT arm, count(*) AS n, sum(conv) AS c FROM a GROUP BY arm),
       p AS (SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
                    max(CASE WHEN arm = 0 THEN c END) AS c0,
                    max(CASE WHEN arm = 1 THEN n END) AS n1,
                    max(CASE WHEN arm = 1 THEN c END) AS c1 FROM s)
       SELECT CAST(n0 AS BIGINT) AS n0, CAST(c0 AS BIGINT) AS c0,
              CAST(n1 AS BIGINT) AS n1, CAST(c1 AS BIGINT) AS c1,
              CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN NULL
                   ELSE round((CAST(c1 AS DOUBLE)/n1 - CAST(c0 AS DOUBLE)/n0) /
                     sqrt((CAST(c0+c1 AS DOUBLE)/(n0+n1)) * (1 - CAST(c0+c1 AS DOUBLE)/(n0+n1))
                          * (1.0/n0 + 1.0/n1)), 6)
              END AS z
       FROM p""") { (s, d) =>
    val arms = table(s, d, "events")
      .groupBy(col("user_id"),
        (graft.curation.Curation.samplingKey(col("user_id")) % 2).as("arm"))
      .agg(max(when(col("event_type") === "purchase" && col("value") > 90, 1)
        .otherwise(0)).as("conv"))
      .groupBy("arm")
      .agg(count(lit(1)).as("n"), sum("conv").as("c"))
    val p = arms.agg(
      max(when(col("arm") === 0, col("n"))).as("n0"),
      max(when(col("arm") === 0, col("c"))).as("c0"),
      max(when(col("arm") === 1, col("n"))).as("n1"),
      max(when(col("arm") === 1, col("c"))).as("c1"))
    val pool = (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1"))
    // pooled rate 0 or 1 (no conversions anywhere, or all converted)
    // zeroes the variance → 0/0: NaN in Spark, NULL in DuckDB — guard
    val degenerate = (col("c0") + col("c1") === 0) ||
      (col("c0") + col("c1") === col("n0") + col("n1"))
    p.select(col("n0"), col("c0"), col("n1"), col("c1"),
      when(degenerate, lit(null)).otherwise(
        round((col("c1").cast("double") / col("n1") -
            col("c0").cast("double") / col("n0")) /
          sqrt(pool * (lit(1) - pool) *
            (lit(1.0) / col("n0") + lit(1.0) / col("n1"))), 6)).as("z"))
  }

  // -------------------------------------------------------- ratio to parent

  /** Hierarchical ratio-to-parent: each nation's order revenue as a
   * share of its region's total. The share window runs over the
   * NATION-SIZED aggregate (≤25 rows), never the fact table — the
   * two-pass agg-then-window shape that keeps pct-of-parent safe at
   * 100 TB. Dimensions broadcast; revenue routes through DECIMAL. */
  val q147RatioToParent: Q = Q("q147_ratio_to_parent",
    """WITH nrev AS (SELECT r_name, n_name,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
         FROM orders, customer, nation, region
         WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
           AND n_regionkey = r_regionkey
         GROUP BY 1, 2)
       SELECT r_name, n_name, revenue,
              round(revenue / sum(revenue) OVER (PARTITION BY r_name), 6) AS share
       FROM nrev ORDER BY r_name, n_name""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val nrev = table(s, d, "orders")
      .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(table(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(table(s, d, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(moneySum(col("o_totalprice")).as("revenue"))
    nrev
      .withColumn("share",
        round(col("revenue") / sum(col("revenue"))
          .over(Window.partitionBy("r_name")), 6))
      .orderBy("r_name", "n_name")
  }

  // ------------------------------------------------------ frequent itemsets

  /** Frequent item PAIRS (market-basket support counting, the A-priori
   * first pass): baskets = distinct parts per order, candidate pairs
   * generated by an order-keyed self-join — the blow-up is bounded by
   * basket size squared (TPC-H baskets are ~4 items), never corpus², and
   * the support aggregate is an ordinary pair-keyed count with map-side
   * combine. The basket table materializes once (localCheckpoint) so
   * both join sides read it without re-scanning lineitem. Top-20 by
   * (support, pair) via TakeOrdered — no global sort. */
  val q148BasketPairs: Q = Q("q148_basket_pairs",
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       pr AS (SELECT a.p AS pa, b2.p AS pb, count(*) AS support
              FROM b a JOIN b b2 ON a.o = b2.o AND a.p < b2.p GROUP BY 1, 2)
       SELECT CAST(pa AS BIGINT) AS pa, CAST(pb AS BIGINT) AS pb, support
       FROM pr ORDER BY support DESC, pa, pb LIMIT 20""") { (s, d) =>
    // basket arrays instead of a self-join: collect_set dedups the
    // order's parts in the SAME shuffle that groups the basket, pairs
    // are generated map-side from the sorted array (i<j for free), and
    // the only other exchange is the pair-support aggregate. Basket
    // width is bounded by order size, so the explode is O(k²) per
    // order, never O(corpus²).
    table(s, d, "lineitem")
      .groupBy(col("l_orderkey").as("o"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(
        graft.graph.GraphOps.pairsFromSortedArray("ps", "pa", "pb")).as("pr"))
      .select(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("pa"), col("pb"))
      .limit(20)
  }

  // -------------------------------------------------------- max concurrency

  /** Maximum concurrency via the sweep-line: each event holds a 5-minute
   * interval, every interval emits a +1/-1 delta point MAP-SIDE (one
   * scan, a 2× bounded explode — no self-join over intervals), and one
   * type-keyed running sum finds the peak. The (t, delta, id) total
   * order puts interval ENDS before coincident starts — exact [s, e)
   * semantics, deterministic at any partitioning. */
  val q149MaxConcurrency: Q = Q("q149_max_concurrency",
    """WITH iv AS (SELECT event_type, event_id, epoch_us(ts) AS s,
                          epoch_us(ts) + 300000000 AS e FROM events),
       pts AS (SELECT event_type, s AS t, 1 AS d, event_id FROM iv
               UNION ALL SELECT event_type, e, -1, event_id FROM iv),
       r AS (SELECT event_type,
                    sum(d) OVER (PARTITION BY event_type ORDER BY t, d, event_id
                                 ROWS UNBOUNDED PRECEDING) AS conc
             FROM pts)
       SELECT event_type, CAST(max(conc) AS BIGINT) AS peak
       FROM r GROUP BY 1 ORDER BY 1""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type")
      .orderBy(col("t"), col("d"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(s, d, "events")
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .select(col("event_type"), col("event_id"),
        explode(array(
          struct(col("us").as("t"), lit(1).as("d")),
          struct((col("us") + 300000000L).as("t"), lit(-1).as("d"))))
          .as("pt"))
      .select(col("event_type"), col("event_id"),
        col("pt.t").as("t"), col("pt.d").as("d"))
      .withColumn("conc", sum(col("d")).over(w))
      .groupBy("event_type")
      .agg(max(col("conc")).as("peak"))
      .orderBy("event_type")
  }

  // ------------------------------------------------------------- OHLC bars

  /** OHLC candle bars per (day, type): open/close are argmin/argmax over
   * the total (time, id) order — `min_by`/`max_by` with a struct key is
   * a single reduction with no window, no sort, map-side combinable
   * (Spark's associative argmin beats a first_value window at scale).
   * The oracle spells the same thing as ordered-set `first`/`last`. */
  val q150Ohlc: Q = Q("q150_ohlc",
    """WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, event_id,
                         epoch_us(ts) AS us, value FROM events)
       SELECT day, event_type,
              first(value ORDER BY us, event_id) AS open,
              max(value) AS high, min(value) AS low,
              last(value ORDER BY us, event_id) AS close,
              count(*) AS volume
       FROM e GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
    table(s, d, "events")
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      .groupBy("day", "event_type")
      .agg(
        min_by(col("value"), struct(col("us"), col("event_id"))).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max_by(col("value"), struct(col("us"), col("event_id"))).as("close"),
        count(lit(1)).as("volume"))
      .orderBy("day", "event_type")
  }

  // ----------------------------------------------------------- snapshot diff

  /** Snapshot diff / reconciliation ([[graft.ops.Relational.snapshotDiff]]):
   * v2 of the orders table derives deterministically from v1 (drop keys
   * ≡0 mod 97, flip status on ≡0 mod 13, insert shifted copies of ≡0 mod
   * 101), then the content-digest full outer join classifies every key;
   * only the non-unchanged rows are emitted. The digest is md5 over
   * STRING columns only — float formatting is engine-specific and would
   * poison a cross-engine hash. The shuffle carries (key, hash), never
   * payloads. */
  val q151SnapshotDiff: Q = Q("q151_snapshot_diff",
    """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                            o_orderpriority AS pr FROM orders),
       v2 AS (SELECT k, CASE WHEN k % 13 = 0 THEN 'X' ELSE st END AS st, pr
              FROM base WHERE k % 97 <> 0
              UNION ALL
              SELECT k + 10000000, 'O', pr FROM base WHERE k % 101 = 0),
       a AS (SELECT k, md5(st || '|' || pr) AS h FROM base),
       b AS (SELECT k, md5(st || '|' || pr) AS h FROM v2),
       d AS (SELECT coalesce(a.k, b.k) AS k,
                    CASE WHEN a.h IS NULL THEN 'added'
                         WHEN b.h IS NULL THEN 'removed'
                         WHEN a.h <> b.h THEN 'changed'
                         ELSE 'unchanged' END AS change_type
             FROM a FULL OUTER JOIN b ON a.k IS NOT DISTINCT FROM b.k)
       SELECT CAST(k AS BIGINT) AS k, change_type FROM d
       WHERE change_type <> 'unchanged' ORDER BY k""") { (s, d) =>
    val base = table(s, d, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        col("o_orderpriority").as("pr"))
      .localCheckpoint() // v1 and the derived v2 both read it — one scan
    val v2 = base.filter(col("k") % 97 =!= 0)
      .select(col("k"),
        when(col("k") % 13 === 0, lit("X")).otherwise(col("st")).as("st"),
        col("pr"))
      .unionByName(base.filter(col("k") % 101 === 0)
        .select((col("k") + 10000000L).as("k"), lit("O").as("st"), col("pr")))
    graft.ops.Relational
      .snapshotDiff(base, v2, "k", md5(concat_ws("|", col("st"), col("pr"))))
      .filter(col("change_type") =!= "unchanged")
      .orderBy("k")
  }

  // ------------------------------------------------------ feature covariance

  /** One-pass EXACT feature-covariance over the embedding corpus: each
   * row expands to its d(d−1)/2 upper-triangle pair products ENTIRELY
   * map-side (array `transform`/`flatten` — no self-join, no per-id
   * shuffle), partial aggregation combines them to 2016 groups per
   * task, and the n²-scaled covariance `n·Σxy − Σx·Σy` is exact BIGINT
   * on milli-quantized values — the top-20 strongest off-diagonal pairs
   * replay bit-for-bit. Headroom: |v|≤~1000 ⇒ n·Σxy ≤ n²·10⁶, BIGINT to
   * n≈3M rows; past that, route the two final products through
   * DECIMAL(38,0) (the shape is unchanged). TakeOrdered, no global
   * sort. The redundant-feature audit an embedding pipeline runs before
   * dimension pruning. */
  val q152FeatureCov: Q = Q("q152_feature_cov",
    """WITH q AS (SELECT list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
                  FROM embeddings),
       n AS (SELECT count(*) AS nn FROM q),
       m AS (SELECT i, sum(v[i+1]) AS s FROM q, range(0,64) t(i) GROUP BY i),
       p AS (SELECT i.i AS i, j.j AS j, sum(v[i.i+1]*v[j.j+1]) AS sxy
             FROM q, range(0,64) i(i), range(0,64) j(j) WHERE i.i < j.j
             GROUP BY 1, 2)
       SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j,
              CAST(n.nn*p.sxy - mi.s*mj.s AS BIGINT) AS cov_q
       FROM p JOIN m mi ON mi.i = p.i JOIN m mj ON mj.i = p.j CROSS JOIN n
       ORDER BY abs(cov_q) DESC, p.i, p.j LIMIT 20""") { (s, d) =>
    val q = table(s, d, "embeddings")
      .select(expr("transform(embedding, x -> cast(round(cast(x as double)*1000, 0) as bigint))")
        .as("v"))
      .localCheckpoint() // marginals, pairs and N all read the quantized table
    val nAgg = q.agg(count(lit(1)).as("nn"))
    val marg = q.select(posexplode(col("v")).as(Seq("i", "vi")))
      .groupBy("i").agg(sum("vi").as("s"))
    // ONE native map-side aggregate ([[graft.functions
    // .UpperTriangleSumAgg]]): the composed nested-transform spelling is
    // CodegenFallback and shuffles rows·d²/2 exploded products; the
    // kernel ships 2016 longs per partition and explodes AFTER the
    // aggregate (parity pinned in FunctionsSpec)
    import org.apache.spark.sql.graft.ColumnBridge
    val pairs = q
      .agg(ColumnBridge.column(graft.functions.UpperTriangleSumAgg(
        ColumnBridge.expression(col("v")), 64).toAggregateExpression())
        .as("ps"))
      .select(explode(col("ps")).as("t"))
      .select(col("t.i").as("i"), col("t.j").as("j"), col("t.sxy").as("sxy"))
    pairs
      .join(broadcast(marg.select(col("i"), col("s").as("si"))), Seq("i"))
      .join(broadcast(marg.select(col("i").as("j"), col("s").as("sj"))), Seq("j"))
      .crossJoin(broadcast(nAgg))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        (col("nn") * col("sxy") - col("si") * col("sj")).as("cov_q"))
      .orderBy(abs(col("cov_q")).desc, col("i"), col("j"))
      .limit(20)
  }

  // ---------------------------------------------------------- streaming OHLC

  /** STREAMING OHLC bars ([[graft.streaming.StreamingOhlc]]): the event
   * stream folds into per-(day,type) candles one micro-batch at a time;
   * every merge component is commutative+associative (struct extrema +
   * sum), so arrival order cannot change the bars — proven by
   * hash-matching q150's one-shot batch aggregate, oracle included. */
  val q153StreamOhlc: Q = Q("q153_stream_ohlc",
    q150Ohlc.oracle.get) { (s, d) =>
    graft.streaming.StreamingOhlc.runOhlcToBatch(s, d)
      .orderBy("day", "event_type")
  }

  // ------------------------------------------------- grouped sketch top-k

  /** PER-GROUP Misra–Gries top-k (q129's global sketch dropped into an
   * ordinary groupBy — the native aggregate is mergeable, so each
   * language gets its own bounded 64-counter sketch with map-side
   * partial combine): sketch candidates → semi-join confirm → exact
   * per-language top-3, with per-group MG guarantees riding as
   * verdicts (est ≤ exact; undercount·(cap+1) ≤ N_g in exact integer
   * arithmetic). The oracle replays the exact all-keys top-3 — valid
   * because the top tokens clear the survival bound by construction. */
  val q154GroupedSketchTopk: Q = Q("q154_grouped_sketch_topk",
    """WITH t AS (SELECT lang, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
                  FROM documents),
       c AS (SELECT lang, token, count(*) AS n_exact FROM t GROUP BY 1, 2),
       r AS (SELECT lang, token, n_exact,
                    row_number() OVER (PARTITION BY lang ORDER BY n_exact DESC, token) AS rank
             FROM c)
       SELECT lang, rank, token, CAST(n_exact AS BIGINT) AS n_exact,
              TRUE AS est_le_exact, TRUE AS bound_ok
       FROM r WHERE rank <= 3 ORDER BY lang, rank""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val toks = table(s, d, "documents")
      .select(col("lang"),
        explode(TextAnalysis.tokens(col("text"))).as("token"))
      .localCheckpoint() // sketch, confirm pass and N_g all read it
    val sk = graft.curation.Curation
      .heavyHittersGrouped(toks, "lang", col("token"), 64)
      .localCheckpoint() // ≤64·langs rows; feeds semi join AND est join
    val ng = toks.groupBy("lang").agg(count(lit(1)).as("n_g"))
    val confirmed = toks
      .join(broadcast(sk.select("lang", "token")), Seq("lang", "token"),
        "left_semi")
      .groupBy("lang", "token").agg(count(lit(1)).as("n_exact"))
    confirmed
      .withColumn("rank", row_number().over(
        Window.partitionBy("lang").orderBy(col("n_exact").desc, col("token")))
        .cast("long"))
      .filter(col("rank") <= 3)
      .join(broadcast(sk), Seq("lang", "token"), "left")
      .join(broadcast(ng), Seq("lang"))
      .select(col("lang"), col("rank"), col("token"), col("n_exact"),
        (col("est") <= col("n_exact")).as("est_le_exact"),
        ((col("n_exact") - col("est")) * 65 <= col("n_g")).as("bound_ok"))
      .orderBy("lang", "rank")
  }

  // ----------------------------------------------------- partition checksums

  /** Anti-entropy partition checksums: per-day row count + XOR-fold of a
   * per-row content digest — XOR is commutative/associative, so the
   * fingerprint is independent of row order, partitioning, and merge
   * sequence (exactly why replica-verification protocols use it). One
   * map-side digest + one day-keyed aggregate; comparing two replicas'
   * checksum tables is then a day-count-sized diff, never a row-level
   * scan. Digest covers STRING-rendered key columns only (engine-stable
   * formatting; the md5-prefix spelling is the engine's standard
   * replayable hash). */
  val q155PartitionChecksum: Q = Q("q155_partition_checksum",
    """WITH h AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
         ('0x'||substr(md5(CAST(event_id AS VARCHAR) || '|' || event_type || '|' ||
                           CAST(user_id AS VARCHAR)),1,15))::BIGINT AS hv
       FROM events)
       SELECT day, count(*) AS n, bit_xor(hv) AS checksum
       FROM h GROUP BY 1 ORDER BY 1""") { (s, d) =>
    table(s, d, "events")
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        graft.ops.Exprs.md5Long(concat_ws("|",
          col("event_id").cast("string"), col("event_type"),
          col("user_id").cast("string"))).as("hv"))
      .groupBy("day")
      .agg(count(lit(1)).as("n"), expr("bit_xor(hv)").as("checksum"))
      .orderBy("day")
  }

  // ------------------------------------------------------- grouping sets

  /** Explicit GROUPING SETS over the time hierarchy — grand total, per
   * year, per month in ONE pass (`Dataset.groupingSets`, the custom-set
   * surface q137's full CUBE can't express: 3 chosen sets, not 2^d).
   * Expand replicates rows 3×, but partial aggregation collapses each
   * set to its group count per task before the exchange. */
  val q156GroupingSets: Q = Q("q156_grouping_sets",
    """SELECT y, ym, CAST(GROUPING(y, ym) AS BIGINT) AS gid, count(*) AS n,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
       FROM (SELECT strftime(o_orderdate, '%Y') AS y,
                    strftime(o_orderdate, '%Y-%m') AS ym, o_totalprice FROM orders)
       GROUP BY GROUPING SETS ((), (y), (y, ym))
       ORDER BY gid, y, ym""") { (s, d) =>
    table(s, d, "orders")
      .select(date_format(col("o_orderdate"), "yyyy").as("y"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        col("o_totalprice"))
      .groupingSets(Seq(Seq.empty, Seq(col("y")), Seq(col("y"), col("ym"))),
        col("y"), col("ym"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        moneySum(col("o_totalprice")).as("revenue"))
      .orderBy("gid", "y", "ym")
  }

  // --------------------------------------------------- equi-depth histogram

  /** Equi-depth (quartile) histogram: exact interpolated percentile
   * boundaries (q85-proven DuckDB parity) broadcast back over one more
   * scan for the bucket counts — the two-pass plan that never sorts the
   * fact table globally (a single-pass NTILE would need exactly that
   * global sort at 100 TB). */
  val q157EquiDepth: Q = Q("q157_equidepth_histogram",
    """WITH b AS (SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY value) AS q1,
                         percentile_cont(0.50) WITHIN GROUP (ORDER BY value) AS q2,
                         percentile_cont(0.75) WITHIN GROUP (ORDER BY value) AS q3
                  FROM events)
       SELECT CASE WHEN value <= q1 THEN 0 WHEN value <= q2 THEN 1
                   WHEN value <= q3 THEN 2 ELSE 3 END AS bucket,
              count(*) AS n, round(min(value), 2) AS lo, round(max(value), 2) AS hi
       FROM events, b GROUP BY 1 ORDER BY 1""") { (s, d) =>
    val bounds = table(s, d, "events").agg(
      expr("percentile(value, 0.25)").as("q1"),
      expr("percentile(value, 0.50)").as("q2"),
      expr("percentile(value, 0.75)").as("q3"))
    table(s, d, "events")
      .crossJoin(broadcast(bounds))
      .select(col("value"),
        when(col("value") <= col("q1"), 0)
          .when(col("value") <= col("q2"), 1)
          .when(col("value") <= col("q3"), 2).otherwise(3).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), round(min(col("value")), 2).as("lo"),
        round(max(col("value")), 2).as("hi"))
      .orderBy("bucket")
  }

  // ------------------------------------------------------- purge cascade

  /** Right-to-erasure purge cascade: a deterministic customer tombstone
   * list cascades through orders to lineitem, and each table reports
   * (purged, kept, survivor checksum) in ONE conditional-aggregate pass
   * — the checksum (q155's XOR fold) is what a post-purge verification
   * compares against the replica. The small tombstone root broadcasts;
   * the order-key cascade is an ordinary semi/left join that AQE may
   * broadcast or shuffle by size — no driver-side key lists. */
  val q158PurgeCascade: Q = Q("q158_purge_cascade",
    """WITH delc AS (SELECT c_custkey FROM customer WHERE c_custkey % 53 = 0),
       delo AS (SELECT o_orderkey FROM orders
                WHERE o_custkey IN (SELECT c_custkey FROM delc)),
       c AS (SELECT 'customer' AS tbl,
               count(*) FILTER (WHERE c_custkey % 53 = 0) AS n_purged,
               count(*) FILTER (WHERE c_custkey % 53 <> 0) AS n_kept,
               bit_xor(CASE WHEN c_custkey % 53 <> 0
                 THEN ('0x'||substr(md5(CAST(c_custkey AS VARCHAR)),1,15))::BIGINT END) AS survivor_checksum
             FROM customer),
       o AS (SELECT 'orders',
               count(*) FILTER (WHERE o_orderkey IN (SELECT * FROM delo)),
               count(*) FILTER (WHERE o_orderkey NOT IN (SELECT * FROM delo)),
               bit_xor(CASE WHEN o_orderkey NOT IN (SELECT * FROM delo)
                 THEN ('0x'||substr(md5(CAST(o_orderkey AS VARCHAR)),1,15))::BIGINT END)
             FROM orders),
       l AS (SELECT 'lineitem',
               count(*) FILTER (WHERE l_orderkey IN (SELECT * FROM delo)),
               count(*) FILTER (WHERE l_orderkey NOT IN (SELECT * FROM delo)),
               bit_xor(CASE WHEN l_orderkey NOT IN (SELECT * FROM delo)
                 THEN ('0x'||substr(md5(CAST(l_orderkey AS VARCHAR)||'|'||CAST(l_linenumber AS VARCHAR)),1,15))::BIGINT END)
             FROM lineitem)
       SELECT * FROM c UNION ALL SELECT * FROM o UNION ALL SELECT * FROM l
       ORDER BY tbl""") { (s, d) =>
    import graft.ops.Exprs.md5Long
    def audit(df: org.apache.spark.sql.DataFrame, tbl: String,
              purged: org.apache.spark.sql.Column,
              keyStr: org.apache.spark.sql.Column) =
      df.withColumn("__p", purged).withColumn("hv", md5Long(keyStr)).agg(
        count(when(col("__p"), 1)).as("n_purged"),
        count(when(!col("__p"), 1)).as("n_kept"),
        expr("bit_xor(CASE WHEN NOT __p THEN hv END)")
          .as("survivor_checksum"))
        .select(lit(tbl).as("tbl"), col("n_purged"), col("n_kept"),
          col("survivor_checksum"))
    // the tombstone root and the cascaded order-key list are SMALL and
    // read by 2 consumers each — checkpoint both so customer/orders are
    // scanned at most twice (once per audit, once to derive the list)
    val delC = table(s, d, "customer")
      .filter(col("c_custkey") % 53 === 0).select(col("c_custkey"))
      .localCheckpoint()
    val ordersFlagged = table(s, d, "orders")
      .join(broadcast(delC), col("o_custkey") === col("c_custkey"), "left")
      .withColumn("__purged", col("c_custkey").isNotNull)
    val delO = ordersFlagged.filter(col("__purged"))
      .select(col("o_orderkey").as("k")).localCheckpoint()
    val liFlagged = table(s, d, "lineitem")
      .join(delO, col("l_orderkey") === col("k"), "left")
      .withColumn("__purged", col("k").isNotNull)
    val custAudit = audit(
      table(s, d, "customer").withColumn("__purged", col("c_custkey") % 53 === 0),
      "customer", col("__purged"), col("c_custkey").cast("string"))
    val ordAudit = audit(ordersFlagged, "orders", col("__purged"),
      col("o_orderkey").cast("string"))
    val liAudit = audit(liFlagged, "lineitem", col("__purged"),
      concat_ws("|", col("l_orderkey").cast("string"),
        col("l_linenumber").cast("string")))
    custAudit.unionByName(ordAudit).unionByName(liAudit).orderBy("tbl")
  }

  /** Functional-dependency profiling — the data-profiling operator the
   * q139 expectation checks don't cover: for each candidate FD A→B,
   * count determinant groups and groups where B takes more than one
   * distinct value (a violation), reporting a violation rate in ppm.
   * One keyed count-distinct aggregate per FD (map-side partial dedup,
   * group count bounded by determinant cardinality — never a self
   * join); c_custkey→c_mktsegment holds by key uniqueness, proving the
   * zero-violation polarity. NULL determinants are excluded; a NULL
   * dependent doesn't count as a distinct value (count DISTINCT
   * semantics, identical in both engines). */
  val q217FdProfile: Q = Q("q217_fd_profile",
    """WITH f1 AS (SELECT count(*) AS n_groups,
             count(*) FILTER (WHERE nd > 1) AS n_viol FROM (
             SELECT p_brand, count(DISTINCT p_type) AS nd FROM part
             WHERE p_brand IS NOT NULL GROUP BY p_brand)),
       f2 AS (SELECT count(*) AS n_groups,
             count(*) FILTER (WHERE nd > 1) AS n_viol FROM (
             SELECT c_nationkey, count(DISTINCT c_mktsegment) AS nd FROM customer
             WHERE c_nationkey IS NOT NULL GROUP BY c_nationkey)),
       f3 AS (SELECT count(*) AS n_groups,
             count(*) FILTER (WHERE nd > 1) AS n_viol FROM (
             SELECT o_custkey, count(DISTINCT o_orderpriority) AS nd FROM orders
             WHERE o_custkey IS NOT NULL GROUP BY o_custkey)),
       f4 AS (SELECT count(*) AS n_groups,
             count(*) FILTER (WHERE nd > 1) AS n_viol FROM (
             SELECT l_orderkey, count(DISTINCT l_returnflag) AS nd FROM lineitem
             WHERE l_orderkey IS NOT NULL GROUP BY l_orderkey)),
       f5 AS (SELECT count(*) AS n_groups,
             count(*) FILTER (WHERE nd > 1) AS n_viol FROM (
             SELECT c_custkey, count(DISTINCT c_mktsegment) AS nd FROM customer
             WHERE c_custkey IS NOT NULL GROUP BY c_custkey)),
       u AS (SELECT 'part:p_brand->p_type' AS fd, * FROM f1
         UNION ALL SELECT 'customer:c_nationkey->c_mktsegment', * FROM f2
         UNION ALL SELECT 'orders:o_custkey->o_orderpriority', * FROM f3
         UNION ALL SELECT 'lineitem:l_orderkey->l_returnflag', * FROM f4
         UNION ALL SELECT 'customer:c_custkey->c_mktsegment', * FROM f5)
       SELECT fd, CAST(n_groups AS BIGINT) AS n_groups,
              CAST(n_viol AS BIGINT) AS n_viol,
              CAST(n_viol * 1000000 // n_groups AS BIGINT) AS viol_ppm
       FROM u ORDER BY fd""") { (s, d) =>
    def fd(tbl: String, det: String, dep: String): org.apache.spark.sql.DataFrame =
      table(s, d, tbl).filter(col(det).isNotNull)
        .groupBy(det).agg(count_distinct(col(dep)).as("nd"))
        .agg(count(lit(1)).as("n_groups"),
          count(when(col("nd") > 1, 1)).as("n_viol"))
        .select(lit(s"$tbl:$det->$dep").as("fd"), col("n_groups"), col("n_viol"))
    fd("part", "p_brand", "p_type")
      .unionAll(fd("customer", "c_nationkey", "c_mktsegment"))
      .unionAll(fd("orders", "o_custkey", "o_orderpriority"))
      .unionAll(fd("lineitem", "l_orderkey", "l_returnflag"))
      .unionAll(fd("customer", "c_custkey", "c_mktsegment"))
      .withColumn("viol_ppm", expr("n_viol * 1000000 div n_groups"))
      .orderBy("fd")
  }

  /** Column-profile sweep — the discovery pass a profiler runs before
   * q139's targeted expectations and q217's FD checks: per (table,
   * column), row count, exact distinct count, null count, and a
   * candidate-key flag (distinct = rows). One count-distinct aggregate
   * per column (map-side partial dedup); at most two profiled columns
   * per table keeps every table within the 2-scan invariant. */
  val q221ColumnProfile: Q = Q("q221_column_profile",
    """WITH p AS (
         SELECT 'customer.c_custkey' AS col_name, count(*) AS n_rows,
                count(DISTINCT c_custkey) AS n_distinct,
                count(*) - count(c_custkey) AS n_null FROM customer
         UNION ALL SELECT 'customer.c_mktsegment', count(*),
                count(DISTINCT c_mktsegment), count(*) - count(c_mktsegment)
                FROM customer
         UNION ALL SELECT 'orders.o_orderstatus', count(*),
                count(DISTINCT o_orderstatus), count(*) - count(o_orderstatus)
                FROM orders
         UNION ALL SELECT 'orders.o_orderpriority', count(*),
                count(DISTINCT o_orderpriority), count(*) - count(o_orderpriority)
                FROM orders
         UNION ALL SELECT 'lineitem.l_returnflag', count(*),
                count(DISTINCT l_returnflag), count(*) - count(l_returnflag)
                FROM lineitem
         UNION ALL SELECT 'lineitem.l_shipdate', count(*),
                count(DISTINCT l_shipdate), count(*) - count(l_shipdate)
                FROM lineitem
         UNION ALL SELECT 'part.p_brand', count(*),
                count(DISTINCT p_brand), count(*) - count(p_brand) FROM part
         UNION ALL SELECT 'part.p_type', count(*),
                count(DISTINCT p_type), count(*) - count(p_type) FROM part
         UNION ALL SELECT 'supplier.s_nationkey', count(*),
                count(DISTINCT s_nationkey), count(*) - count(s_nationkey)
                FROM supplier)
       SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
              CAST(n_distinct AS BIGINT) AS n_distinct,
              CAST(n_null AS BIGINT) AS n_null,
              n_distinct = n_rows AS is_key
       FROM p ORDER BY col_name""") { (s, d) =>
    def prof(tbl: String, c: String): org.apache.spark.sql.DataFrame =
      table(s, d, tbl).agg(
        count(lit(1)).as("n_rows"),
        count_distinct(col(c)).as("n_distinct"),
        (count(lit(1)) - count(col(c))).as("n_null"))
        .select(lit(s"$tbl.$c").as("col_name"), col("n_rows"),
          col("n_distinct"), col("n_null"))
    Seq("customer" -> "c_custkey", "customer" -> "c_mktsegment",
      "orders" -> "o_orderstatus", "orders" -> "o_orderpriority",
      "lineitem" -> "l_returnflag", "lineitem" -> "l_shipdate",
      "part" -> "p_brand", "part" -> "p_type",
      "supplier" -> "s_nationkey")
      .map { case (t, c) => prof(t, c) }
      .reduce(_ unionAll _)
      .withColumn("is_key", col("n_distinct") === col("n_rows"))
      .orderBy("col_name")
  }

  /** RFM customer segmentation with SCALE-CORRECT tercile cutoffs: the
   * classic CRM cube (recency / frequency / monetary, each scored
   * 1..3) — but the quantile cutoffs come from value-range-bounded
   * HISTOGRAMS (smallest bin where 3·cum ≥ n, ≥ 2n), never a global
   * rank over customers, so the only windows run over day/count/spend
   * bins. Money routes through DECIMAL cents (order-independent sums);
   * scores are bucket indexes (1 = lowest value bin band). One
   * customer aggregate feeds all three dims; cutoffs broadcast back.
   * Output: customer counts per RFM cell. */
  val q229Rfm: Q = Q("q229_rfm",
    """WITH cust AS (SELECT o_custkey AS k,
             max(CAST(o_orderdate AS DATE)) AS last_d,
             CAST(count(*) AS BIGINT) AS f,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS m_cents
           FROM orders
           WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
             AND o_totalprice IS NOT NULL
           GROUP BY 1),
       g AS (SELECT max(last_d) AS d1, CAST(count(*) AS BIGINT) AS n FROM cust),
       feat AS (SELECT k,
                  CAST(date_diff('day', last_d, d1) AS BIGINT) AS rb,
                  f AS fb, m_cents // 5000000 AS mb
                FROM cust, g),
       hr AS (SELECT rb AS b, count(*) AS c FROM feat GROUP BY 1),
       cr AS (SELECT b, CAST(sum(c) OVER (ORDER BY b) AS BIGINT) AS cum FROM hr),
       tr AS (SELECT CAST(min(CASE WHEN cum * 3 >= n THEN b END) AS BIGINT) AS c1,
                     CAST(min(CASE WHEN cum * 3 >= 2 * n THEN b END) AS BIGINT) AS c2
              FROM cr, g),
       hf AS (SELECT fb AS b, count(*) AS c FROM feat GROUP BY 1),
       cf AS (SELECT b, CAST(sum(c) OVER (ORDER BY b) AS BIGINT) AS cum FROM hf),
       tf AS (SELECT CAST(min(CASE WHEN cum * 3 >= n THEN b END) AS BIGINT) AS c1,
                     CAST(min(CASE WHEN cum * 3 >= 2 * n THEN b END) AS BIGINT) AS c2
              FROM cf, g),
       hm AS (SELECT mb AS b, count(*) AS c FROM feat GROUP BY 1),
       cm AS (SELECT b, CAST(sum(c) OVER (ORDER BY b) AS BIGINT) AS cum FROM hm),
       tm AS (SELECT CAST(min(CASE WHEN cum * 3 >= n THEN b END) AS BIGINT) AS c1,
                     CAST(min(CASE WHEN cum * 3 >= 2 * n THEN b END) AS BIGINT) AS c2
              FROM cm, g),
       sc AS (SELECT
                CAST(1 + CASE WHEN rb > tr.c1 THEN 1 ELSE 0 END
                       + CASE WHEN rb > tr.c2 THEN 1 ELSE 0 END AS BIGINT) AS r_score,
                CAST(1 + CASE WHEN fb > tf.c1 THEN 1 ELSE 0 END
                       + CASE WHEN fb > tf.c2 THEN 1 ELSE 0 END AS BIGINT) AS f_score,
                CAST(1 + CASE WHEN mb > tm.c1 THEN 1 ELSE 0 END
                       + CASE WHEN mb > tm.c2 THEN 1 ELSE 0 END AS BIGINT) AS m_score
              FROM feat, tr, tf, tm)
       SELECT r_score, f_score, m_score, CAST(count(*) AS BIGINT) AS n_customers
       FROM sc GROUP BY 1, 2, 3 ORDER BY r_score, f_score, m_score""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val cust = table(s, d, "orders")
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull &&
        col("o_totalprice").isNotNull)
      .groupBy(col("o_custkey").as("k"))
      .agg(max(to_date(col("o_orderdate"))).as("last_d"),
        count(lit(1)).as("f"),
        (sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("m_cents"))
      .localCheckpoint() // bounds scalar + three histograms read it
    val g = cust.agg(max("last_d").as("d1"), count(lit(1)).cast("long").as("n"))
    val feat = cust.crossJoin(broadcast(g))
      .select(col("k"), datediff(col("d1"), col("last_d")).cast("long").as("rb"),
        col("f").as("fb"), expr("m_cents div 5000000").as("mb"), col("n"))
      .localCheckpoint() // three histograms + the score pass read it
    def cuts(bCol: String): org.apache.spark.sql.DataFrame = {
      val h = feat.groupBy(col(bCol).as("b")).agg(count(lit(1)).as("c"))
      val w = Window.orderBy("b") // bounded by the dim's VALUE range
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      h.withColumn("cum", sum("c").over(w))
        .crossJoin(broadcast(g.select("n")))
        .agg(min(when(col("cum") * 3 >= col("n"), col("b"))).as("c1"),
          min(when(col("cum") * 3 >= col("n") * 2, col("b"))).as("c2"))
    }
    def score(bCol: String, cu: String): org.apache.spark.sql.Column =
      (lit(1L) + when(col(bCol) > col(s"$cu.c1"), 1L).otherwise(0L)
        + when(col(bCol) > col(s"$cu.c2"), 1L).otherwise(0L)).as(s"${bCol}_s")
    feat
      .crossJoin(broadcast(cuts("rb")).as("tr"))
      .crossJoin(broadcast(cuts("fb")).as("tf"))
      .crossJoin(broadcast(cuts("mb")).as("tm"))
      .select(score("rb", "tr").as("r_score"), score("fb", "tf").as("f_score"),
        score("mb", "tm").as("m_score"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** Association-rule metrics over co-purchased part pairs: support,
   * confidence (both directions via the doubled orientation), and lift
   * — top 20 rules by lift. All integer ppm: lift = co·N·10⁶ div
   * (cnt_a·cnt_b) over the basket universe N, so ranking is exact
   * BIGINT; the top-20 is orderBy+limit (TakeOrdered — per-partition
   * heads, never a global sort materialization). Pairs come from the
   * hub-capped basket arrays (q148/q212 projection). */
  val q230AssocRules: Q = Q("q230_assoc_rules",
    """WITH gi AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS it
                   FROM lineitem
                   WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       ng AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS nb FROM gi),
       ok AS (SELECT g FROM gi GROUP BY g HAVING count(*) <= 15),
       pr AS (SELECT i, j, co FROM (
              SELECT a.it AS i, b.it AS j, CAST(count(*) AS BIGINT) AS co
              FROM gi a JOIN gi b ON a.g = b.g AND a.it < b.it
              WHERE a.g IN (SELECT g FROM ok) GROUP BY 1, 2)
              WHERE co >= 2),
       cnt AS (SELECT it, CAST(count(*) AS BIGINT) AS c FROM gi GROUP BY it),
       bd AS (SELECT i AS ante, j AS cons, co FROM pr
              UNION ALL SELECT j, i, co FROM pr),
       m AS (SELECT b.ante, b.cons, b.co,
               CAST(b.co * 1000000 // ng.nb AS BIGINT) AS support_ppm,
               CAST(b.co * 1000000 // ca.c AS BIGINT) AS conf_ppm,
               CAST((b.co * 1000000 // ca.c) * ng.nb // cb.c AS BIGINT) AS lift_ppm
             FROM bd b JOIN cnt ca ON ca.it = b.ante
                       JOIN cnt cb ON cb.it = b.cons
                       CROSS JOIN ng)
       SELECT CAST(ante AS BIGINT) AS ante, CAST(cons AS BIGINT) AS cons,
              co, support_ppm, conf_ppm, lift_ppm
       FROM m ORDER BY lift_ppm DESC, ante, cons LIMIT 20""") { (s, d) =>
    // pair counts + item marginals come from the persisted shared
    // basket tables (io/Scratch — the same build q212 reads); the one
    // remaining lineitem scan is the basket-count scalar
    val pr = LinkQueries.sharedBasketPairs(s, d)
    val cnt = LinkQueries.sharedItemCounts(s, d)
      .localCheckpoint() // both rule sides read it
    val ng = table(s, d, "lineitem")
      .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
      .agg(count_distinct(col("l_orderkey")).as("nb"))
    val bd = pr.select(col("i").as("ante"), col("j").as("cons"), col("co"))
      .unionAll(pr.select(col("j").as("ante"), col("i").as("cons"), col("co")))
    bd.join(cnt.select(col("it").as("ante"), col("c").as("ca")), Seq("ante"))
      .join(cnt.select(col("it").as("cons"), col("c").as("cb")), Seq("cons"))
      .crossJoin(broadcast(ng))
      .select(col("ante"), col("cons"), col("co"),
        expr("co * 1000000 div nb").as("support_ppm"),
        expr("co * 1000000 div ca").as("conf_ppm"),
        // staged division keeps every intermediate ≤ conf_ppm(≤1e6)·nb —
        // co·nb·1e6 would wrap int64 once co·nb passes ~9.2e12, plausible
        // at the 100 TB design point; both engines stage identically so
        // the ppm values still replay bit-for-bit
        expr("(co * 1000000 div ca) * nb div cb").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("ante"), col("cons"))
      .limit(20)
  }

  /** Pointwise and total mutual information between event type and
   * weekday — the STATISTICAL column-dependence profile that pairs
   * with q217's exact functional dependencies (FD says "determines",
   * MI says "how much does knowing one shrink the other"). Per-cell
   * PMI quantizes to integer micro-nats BEFORE the contribution
   * product (the q104 recipe: double ratio → ln → round — both engines
   * run the identical IEEE expression), so each cell's nab·pmi
   * contribution is exact BIGINT and total MI = Σcontrib/N replays
   * bit-for-bit. One keyed count; marginals aggregate the bounded cell
   * table, never the fact table again. */
  val q231MutualInfo: Q = Q("q231_mutual_info",
    """WITH b AS (SELECT event_type AS a, dayofweek(ts) + 1 AS d FROM events
                  WHERE ts IS NOT NULL AND event_type IS NOT NULL),
       c AS (SELECT a, d, CAST(count(*) AS BIGINT) AS nab FROM b GROUP BY 1, 2),
       ma AS (SELECT a, CAST(sum(nab) AS BIGINT) AS na FROM c GROUP BY a),
       md AS (SELECT d, CAST(sum(nab) AS BIGINT) AS nd FROM c GROUP BY d),
       t AS (SELECT CAST(sum(nab) AS BIGINT) AS nn FROM c)
       SELECT c.a, CAST(c.d AS BIGINT) AS d, c.nab,
              CAST(round(ln(CAST(nab AS DOUBLE) * nn
                / (CAST(na AS DOUBLE) * nd)) * 1000000) AS BIGINT) AS pmi_micro,
              nab * CAST(round(ln(CAST(nab AS DOUBLE) * nn
                / (CAST(na AS DOUBLE) * nd)) * 1000000) AS BIGINT) AS contrib
       FROM c JOIN ma USING (a) JOIN md USING (d) CROSS JOIN t
       ORDER BY a, d""") { (s, d) =>
    val c = table(s, d, "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("event_type").as("a"), dayofweek(col("ts")).cast("long").as("d"))
      .groupBy("a", "d").agg(count(lit(1)).as("nab"))
      .localCheckpoint() // bounded cell table; marginals + totals read it
    val ma = c.groupBy("a").agg(sum("nab").as("na"))
    val md = c.groupBy("d").agg(sum("nab").as("nd"))
    val t = c.agg(sum("nab").as("nn"))
    c.join(broadcast(ma), Seq("a")).join(broadcast(md), Seq("d"))
      .crossJoin(broadcast(t))
      .withColumn("pmi_micro",
        round(log(col("nab").cast("double") * col("nn")
          / (col("na").cast("double") * col("nd"))) * 1000000.0, 0)
          .cast("long"))
      .withColumn("contrib", col("nab") * col("pmi_micro"))
      .select(col("a"), col("d"), col("nab"), col("pmi_micro"), col("contrib"))
      .orderBy("a", "d")
  }

  val all: Seq[Q] = Seq(q137Cube, q138Triangles, q139QualityAudit,
    q140IncrementalAgg, q141StarJoin, q142SlidingDistinct, q143Correlation,
    q144Attribution, q145Twap, q146AbLift, q147RatioToParent, q148BasketPairs,
    q149MaxConcurrency, q150Ohlc, q151SnapshotDiff, q152FeatureCov,
    q153StreamOhlc, q154GroupedSketchTopk, q155PartitionChecksum,
    q156GroupingSets, q157EquiDepth, q158PurgeCascade, q217FdProfile,
    q221ColumnProfile, q229Rfm, q230AssocRules, q231MutualInfo)
}
