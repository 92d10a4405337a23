package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Sources.table
import graft.ops.Stats

/**
 * Round-6 exact order-statistics + data-forensics operators: shuffle-key
 * skew pre-flight, quantile normalization, MAD robust outliers, Benford
 * first-digit audit. Percentiles and medians are PICKED elements at
 * deterministic ranks (never interpolated), so every number replays
 * exactly in the oracle.
 */
object StatsQueries {

  // -------------------------------------------------- shuffle-skew report

  /** Group-size skew report for three prospective shuffle keys — key
   * count, biggest-key share, picked p50/p90/p99 group sizes, and
   * max/mean ratio in ppm. THE pre-flight check before picking a
   * partition key at scale: a 10×-mean max key means salting or AQE
   * skew handling, and this report is one map-combined aggregate plus
   * a window over the (small) key-count table. */
  val q167SkewReport: Q = Q("q167_skew_report",
    """WITH a AS (
         SELECT 'lineitem.l_partkey' AS dim, CAST(l_partkey AS VARCHAR) AS k
         FROM lineitem
         UNION ALL
         SELECT 'lineitem.l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
         UNION ALL
         SELECT 'orders.o_custkey', CAST(o_custkey AS VARCHAR) FROM orders),
       g AS (SELECT dim, k, count(*) AS c FROM a GROUP BY 1, 2),
       r AS (SELECT dim, c,
               row_number() OVER (PARTITION BY dim ORDER BY c, k) AS rn,
               count(*) OVER (PARTITION BY dim) AS nk,
               CAST(sum(c) OVER (PARTITION BY dim) AS BIGINT) AS nr
             FROM g)
       SELECT dim, max(nk) AS n_keys, max(nr) AS n_rows, max(c) AS max_c,
              max(c) * 1000000 // (max(nr) // max(nk)) AS skew_ratio_ppm,
              max(c) * 1000000 // max(nr) AS max_share_ppm,
              max(CASE WHEN rn = (nk + 1) // 2 THEN c END) AS p50_c,
              max(CASE WHEN rn = (9 * nk + 9) // 10 THEN c END) AS p90_c,
              max(CASE WHEN rn = (99 * nk + 99) // 100 THEN c END) AS p99_c
       FROM r GROUP BY dim ORDER BY dim""") { (s, d) =>
    val li = table(s, d, "lineitem")
    Stats.skewReport(li, col("l_partkey"), "lineitem.l_partkey")
      .unionByName(Stats.skewReport(li, col("l_suppkey"),
        "lineitem.l_suppkey"))
      .unionByName(Stats.skewReport(table(s, d, "orders"),
        col("o_custkey"), "orders.o_custkey"))
      .orderBy("dim")
  }

  // ----------------------------------------------- quantile normalization

  /** Quantile normalization of order totals within each priority class:
   * rank → empirical quantile in ppm over the (value, key) total order;
   * ranks computed over the FULL table, output sliced to a stable key
   * range. One window shuffle on the group key. */
  val q168QuantileNorm: Q = Q("q168_quantile_norm",
    """WITH r AS (SELECT o_orderkey, o_orderpriority AS priority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
           FROM orders)
       SELECT o_orderkey, priority, o_totalprice,
              CASE WHEN n = 1 THEN 0
                   ELSE (rn - 1) * 1000000 // (n - 1) END AS q_ppm
       FROM r WHERE o_orderkey <= 500 ORDER BY o_orderkey""") { (s, d) =>
    Stats.quantileNormalize(
        table(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderpriority").as("priority"),
            col("o_totalprice")),
        Seq("priority"), col("o_totalprice"), col("o_orderkey"))
      .filter(col("o_orderkey") <= 500)
      .select("o_orderkey", "priority", "o_totalprice", "q_ppm")
      .orderBy("o_orderkey")
  }

  // --------------------------------------------------- MAD robust outliers

  /** Robust outlier screen per event type: exact lower-median of value,
   * exact lower-median absolute deviation, and the count beyond
   * 3×MAD — the heavy-tail detector that, unlike mean/stddev, a few
   * extreme rows cannot drag. Two windows over the same type key. */
  val q169MadOutliers: Q = Q("q169_mad_outliers",
    """WITH b AS (SELECT event_type, value AS v, event_id AS t FROM events
                  WHERE value IS NOT NULL),
       r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                          ORDER BY v, t) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n FROM b),
       m AS (SELECT event_type, max(n) AS n,
               max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS med
             FROM r GROUP BY 1),
       dv AS (SELECT b.event_type, abs(v - med) AS dd, t, med, n
              FROM b JOIN m USING (event_type)),
       r2 AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                           ORDER BY dd, t) AS rn2 FROM dv),
       m2 AS (SELECT event_type,
                max(CASE WHEN rn2 = (n + 1) // 2 THEN dd END) AS mad
              FROM r2 GROUP BY 1)
       SELECT r2.event_type, max(n) AS n, max(med) AS med, max(m2.mad) AS mad,
              count(*) FILTER (WHERE dd > 3 * m2.mad) AS n_outliers
       FROM r2 JOIN m2 USING (event_type)
       GROUP BY 1 ORDER BY 1""") { (s, d) =>
    Stats.madOutliers(
        table(s, d, "events").filter(col("value").isNotNull),
        Seq("event_type"), col("value"), col("event_id"), k = 3)
      .orderBy("event_type")
  }

  // ------------------------------------------------------- Benford audit

  /** Benford first-significant-digit audit of order totals: observed vs
   * expected `log10(1 + 1/d)` frequency per digit in ppm with absolute
   * deviation — the fabricated-data screen; map-side digit extract,
   * 9-row aggregate. (Synthetic uniform-ish prices will NOT follow
   * Benford — the deviation column is the point.) */
  val q170BenfordAudit: Q = Q("q170_benford_audit",
    """WITH dg AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                     AS VARCHAR), 1, 1) AS BIGINT) AS digit
           FROM orders WHERE o_totalprice > 0),
       g AS (SELECT digit, count(*) AS n FROM dg GROUP BY 1),
       t AS (SELECT *, CAST(sum(n) OVER () AS BIGINT) AS total FROM g)
       SELECT digit, n, n * 1000000 // total AS obs_ppm,
              CAST(round(log10(1 + 1.0 / digit) * 1e6) AS BIGINT) AS benford_ppm,
              abs(n * 1000000 // total
                  - CAST(round(log10(1 + 1.0 / digit) * 1e6) AS BIGINT)) AS dev_ppm
       FROM t ORDER BY digit""") { (s, d) =>
    Stats.benfordAudit(table(s, d, "orders"), col("o_totalprice"))
      .orderBy("digit")
  }

  val all: Seq[Q] = Seq(q167SkewReport, q168QuantileNorm, q169MadOutliers,
    q170BenfordAudit)
}
