package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Sources.table
import graft.ops.Stats
import graft.sketch.Sketches

/**
 * Round-6 exact order-statistics + data-forensics operators: shuffle-key
 * skew pre-flight, quantile normalization, MAD robust outliers, Benford
 * first-digit audit. Percentiles and medians are PICKED elements at
 * deterministic ranks (never interpolated), so every number replays
 * exactly in the oracle.
 */
object StatsQueries {

  private val md5sql = graft.ops.Exprs.md5LongSql

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
              max(c) * 1000000 * max(nk) // max(nr) AS skew_ratio_ppm,
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
           FROM orders WHERE o_totalprice >= 1),
       g AS (SELECT digit, count(*) AS n FROM dg GROUP BY 1),
       spine AS (SELECT unnest(range(1, 10)) AS digit),
       f AS (SELECT s.digit, CAST(coalesce(g.n, 0) AS BIGINT) AS n
             FROM spine s LEFT JOIN g USING (digit)),
       t AS (SELECT *, CAST(sum(n) OVER () AS BIGINT) AS total FROM f)
       SELECT digit, n,
              CASE WHEN total > 0 THEN n * 1000000 // total ELSE 0 END AS obs_ppm,
              CAST(round(log10(1 + 1.0 / digit) * 1e6) AS BIGINT) AS benford_ppm,
              abs(CASE WHEN total > 0 THEN n * 1000000 // total ELSE 0 END
                  - CAST(round(log10(1 + 1.0 / digit) * 1e6) AS BIGINT)) AS dev_ppm
       FROM t ORDER BY digit""") { (s, d) =>
    Stats.benfordAudit(table(s, d, "orders"), col("o_totalprice"))
      .orderBy("digit")
  }

  // ------------------------------------------------ repetition signals

  /** Gopher-style within-document repetition signals for the doc slice:
   * modal-bigram share and the fraction of bigram/trigram occurrences
   * belonging to a repeated n-gram, all in ppm — the "spammy template
   * text" filter signals from the Gopher/MassiveText quality rules
   * (Rae et al. 2021). Per-doc explode → count → per-doc aggregate;
   * entirely data-parallel, no corpus-wide state. */
  val q171RepetitionSignals: Q = Q("q171_repetition_signals",
    """WITH tok AS (SELECT doc_id,
             string_split_regex(trim(lower(text)), '\s+') AS w
           FROM documents WHERE doc_id < 80),
       t AS (SELECT doc_id, w FROM tok WHERE len(w) >= 3),
       bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
                k -> w[k]||' '||w[k+1])) AS g FROM t),
       bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
       bga AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                 max(c) AS max_bg,
                 CAST(coalesce(sum(CASE WHEN c >= 2 THEN c END), 0) AS BIGINT)
                   AS dup_bg
               FROM bgc GROUP BY 1),
       tg AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                k -> w[k]||' '||w[k+1]||' '||w[k+2])) AS g FROM t),
       tgc AS (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2),
       tga AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_trigrams,
                 CAST(coalesce(sum(CASE WHEN c >= 2 THEN c END), 0) AS BIGINT)
                   AS dup_tg
               FROM tgc GROUP BY 1)
       SELECT doc_id, n_bigrams,
              max_bg * 1000000 // n_bigrams AS top_bigram_ppm,
              dup_bg * 1000000 // n_bigrams AS dup_bigram_ppm,
              n_trigrams,
              dup_tg * 1000000 // n_trigrams AS dup_trigram_ppm
       FROM bga JOIN tga USING (doc_id) ORDER BY doc_id""") { (s, d) =>
    import graft.text.TextAnalysis
    import graft.dedup.Dedup
    // tokenized slice feeds BOTH gram sizes — checkpoint or each
    // gramStats re-scans and re-tokenizes the table
    val t = table(s, d, "documents").filter(col("doc_id") < 80)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .localCheckpoint()
    def gramStats(k: Int, nCol: String, dupCol: String, withMax: Boolean) = {
      val counts = t
        .select(col("doc_id"),
          explode(Dedup.shinglesFromTokens(col("w"), k)).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as(nCol), max("c").as("__mx"),
          coalesce(sum(when(col("c") >= 2, col("c"))), lit(0L)).as(dupCol))
      if (withMax) counts else counts.drop("__mx")
    }
    gramStats(2, "n_bigrams", "dup_bg", withMax = true)
      .join(gramStats(3, "n_trigrams", "dup_tg", withMax = false), "doc_id")
      .select(col("doc_id"), col("n_bigrams"),
        expr("__mx * 1000000 div n_bigrams").as("top_bigram_ppm"),
        expr("dup_bg * 1000000 div n_bigrams").as("dup_bigram_ppm"),
        col("n_trigrams"),
        expr("dup_tg * 1000000 div n_trigrams").as("dup_trigram_ppm"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------ embedding health audit

  /** Embedding-column health audit per label: vector count, wrong-width
   * vectors, zero vectors, and min/p50/max squared norm — norms in
   * per-element-quantized integer micros (round(x²·1e6) summed), so the
   * reduction is order-proof and the p50 is a picked element. The
   * pre-flight screen before any ANN/clustering job; map-side per
   * vector, one label-keyed window. */
  val q172EmbeddingHealth: Q = Q("q172_embedding_health",
    """WITH h AS (SELECT label, vec_id, len(embedding) AS dim,
             CAST(list_sum(list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e6)
                    AS BIGINT))) AS BIGINT) AS norm2_micro
           FROM embeddings WHERE embedding IS NOT NULL),
       r AS (SELECT *, row_number() OVER (PARTITION BY label
                         ORDER BY norm2_micro, vec_id) AS rn,
               count(*) OVER (PARTITION BY label) AS n FROM h)
       SELECT label, max(n) AS n_vecs,
              count(*) FILTER (WHERE dim <> 64) AS n_bad_dim,
              count(*) FILTER (WHERE norm2_micro = 0) AS n_zero_norm,
              min(norm2_micro) AS min_norm2_micro,
              max(CASE WHEN rn = (n + 1) // 2 THEN norm2_micro END)
                AS p50_norm2_micro,
              max(norm2_micro) AS max_norm2_micro
       FROM r GROUP BY label ORDER BY label""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // null vectors are excluded on BOTH sides: Spark's size(null) = -1
    // while DuckDB's len(NULL) is NULL — the one place the engines'
    // null conventions would silently diverge
    val h = table(s, d, "embeddings")
      .filter(col("embedding").isNotNull)
      .select(col("label"), col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        aggregate(col("embedding"), lit(0L), (acc, x) =>
          acc + round(x.cast("double") * x.cast("double") * 1e6, 0)
            .cast("long")).as("norm2_micro"))
    h.withColumn("rn", row_number().over(
        Window.partitionBy("label").orderBy("norm2_micro", "vec_id")))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy("label")))
      .groupBy("label")
      .agg(max("n").as("n_vecs"),
        count(when(col("dim") =!= 64, 1)).as("n_bad_dim"),
        count(when(col("norm2_micro") === 0, 1)).as("n_zero_norm"),
        min("norm2_micro").as("min_norm2_micro"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("norm2_micro")))
          .as("p50_norm2_micro"),
        max("norm2_micro").as("max_norm2_micro"))
      .orderBy("label")
  }

  // ------------------------------------------------ bit-shift tree rollup

  /** Hierarchical subtree rollup WITHOUT iteration: in the implicit
   * binary tree where parent(id) = id >> 1 (ids = doc_id + 1), every
   * node's ancestor chain is just the shift sequence id >> 0..20 — so
   * one explode + one aggregate computes every subtree's size and
   * character total, the materialized-path trick that replaces a
   * recursive join. The shift depth must cover log2(max id) (20 ⇒ ids
   * < 2^21; deeper corpora raise the constant, cost grows linearly).
   * Reported for the 15 shallowest nodes. */
  val q173TreeRollup: Q = Q("q173_tree_rollup",
    """WITH n AS (SELECT doc_id + 1 AS id, n_chars FROM documents),
       a AS (SELECT n.id >> k.k AS node, n_chars
             FROM n CROSS JOIN generate_series(0, 20) k(k)
             WHERE n.id >> k.k >= 1)
       SELECT node, count(*) AS n_desc, CAST(sum(n_chars) AS BIGINT) AS sum_chars
       FROM a WHERE node <= 15 GROUP BY node ORDER BY node""") { (s, d) =>
    table(s, d, "documents")
      .select((col("doc_id") + 1).as("id"), col("n_chars"),
        explode(sequence(lit(0), lit(20))).as("k"))
      .withColumn("node", expr("shiftright(id, k)"))
      .filter(col("node") >= 1 && col("node") <= 15)
      .groupBy("node")
      .agg(count(lit(1)).as("n_desc"), sum("n_chars").as("sum_chars"))
      .orderBy("node")
  }

  // ------------------------------------------------ moving exact median

  /** 7-day moving MEDIAN of daily order counts per priority — the
   * spike-robust smoother q166's FIR cannot be (a mean follows
   * outliers; a median ignores them). Exact picked-element median per
   * trailing window: each day contributes itself to its next 7 target
   * days (a bounded 7× map-side explode, no range self-join), then one
   * (priority, day)-keyed rank pick. days are indexed by row position
   * in the observed series, matching lag-style frames. */
  val q174MovingMedian: Q = Q("q174_moving_median",
    """WITH dly AS (SELECT o_orderpriority AS priority,
             strftime(o_orderdate, '%Y-%m-%d') AS day, count(*) AS c
           FROM orders GROUP BY 1, 2),
       ix AS (SELECT priority, day, c,
                row_number() OVER (PARTITION BY priority ORDER BY day) AS i
              FROM dly),
       ct AS (SELECT priority, i + o.o AS ti, c, i AS src
              FROM ix CROSS JOIN generate_series(0, 6) o(o)),
       tgt AS (SELECT ct.priority, ct.ti, ct.c, ct.src,
                 row_number() OVER (PARTITION BY ct.priority, ct.ti
                                    ORDER BY ct.c, ct.src) AS rn,
                 count(*) OVER (PARTITION BY ct.priority, ct.ti) AS n
               FROM ct),
       md AS (SELECT priority, ti,
                max(CASE WHEN rn = (n + 1) // 2 THEN c END) AS med_c
              FROM tgt GROUP BY 1, 2)
       SELECT ix.priority, ix.day, CAST(ix.c AS BIGINT) AS c,
              CAST(md.med_c AS BIGINT) AS med7_c
       FROM ix JOIN md ON ix.priority = md.priority AND ix.i = md.ti
       ORDER BY ix.priority, ix.day""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val dly = table(s, d, "orders")
      .groupBy(col("o_orderpriority").as("priority"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("c"))
    val ix = dly.withColumn("i", row_number().over(
        Window.partitionBy("priority").orderBy("day")))
      .localCheckpoint() // read twice: contribution explode + final join
    val md = ix
      .select(col("priority"), col("c"), col("i").as("src"),
        explode(sequence(lit(0), lit(6))).as("o"))
      .withColumn("ti", col("src") + col("o"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("priority", "ti").orderBy("c", "src")))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy("priority", "ti")))
      .groupBy("priority", "ti")
      .agg(max(when(col("rn") === expr("(n + 1) div 2"), col("c")))
        .as("med7_c"))
      .withColumnRenamed("priority", "mp")
    ix.join(md, col("priority") === col("mp") && col("i") === col("ti"))
      .select(col("priority"), col("day"), col("c"), col("med7_c"))
      .orderBy("priority", "day")
  }

  // ------------------------------------------------ sequential path mining

  /** Top event-type 3-step paths per user stream (lead×2 over the same
   * user-keyed sort q165's Markov matrix uses — this is its 2nd-order
   * sibling): global support counts with rank, ties broken on the
   * path. ONE window shuffle, then a types³-bounded aggregate. */
  val q175PathMining: Q = Q("q175_path_mining",
    """WITH s AS (SELECT event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       p AS (SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS support
             FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL GROUP BY 1),
       r AS (SELECT path, support,
               row_number() OVER (ORDER BY support DESC, path) AS rank
             FROM p)
       SELECT path, support, rank FROM r WHERE rank <= 25 ORDER BY rank""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    table(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("e1"))
      .withColumn("e2", lead("e1", 1).over(w))
      .withColumn("e3", lead("e1", 2).over(w))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .select(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("support"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("support").desc, col("path"))).cast("long"))
      .filter(col("rank") <= 25)
      .orderBy("rank")
  }

  // ------------------------------------------------ corpus drift monitor

  /** Token-distribution drift between the src0 corpus slice and the
   * rest: add-one-smoothed KL both directions + Jensen–Shannon, in
   * per-term-quantized integer micro-nats — the "did today's crawl
   * shift" monitor whose state is O(vocabulary), never O(tokens).
   * Detects what exact-count diffing can't summarize. */
  val q176CorpusDrift: Q = Q("q176_corpus_drift",
    """WITH tok AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS v,
             source = 'src0' AS a
           FROM documents),
       c AS (SELECT v, count(*) FILTER (WHERE a) AS ca,
               count(*) FILTER (WHERE NOT a) AS cb FROM tok GROUP BY v),
       t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
               CAST(sum(cb) AS BIGINT) AS nb, count(*) AS vv FROM c),
       x AS (SELECT na, nb, vv, (ca + 1.0) / (na + vv) AS pa,
               (cb + 1.0) / (nb + vv) AS pb
             FROM c CROSS JOIN t),
       y AS (SELECT na, nb, vv,
               CAST(round(pa * ln(pa / pb) * 1e6) AS BIGINT) AS tab,
               CAST(round(pb * ln(pb / pa) * 1e6) AS BIGINT) AS tba,
               CAST(round((pa * ln(pa / ((pa + pb) / 2))
                    + pb * ln(pb / ((pa + pb) / 2))) / 2 * 1e6) AS BIGINT) AS tjs
             FROM x)
       SELECT max(na) AS n_a, max(nb) AS n_b, max(vv) AS vocab,
              CAST(sum(tab) AS BIGINT) AS kl_ab_micro,
              CAST(sum(tba) AS BIGINT) AS kl_ba_micro,
              CAST(sum(tjs) AS BIGINT) AS jsd_micro
       FROM y""") { (s, d) =>
    import graft.text.TextAnalysis
    Stats.categoricalDrift(
      table(s, d, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("v"),
          (col("source") === "src0").as("a")),
      col("v"), col("a"))
  }

  // ------------------------------------------- chi-square independence

  /** Pearson chi-square of event type × hour-of-day: per-type
   * contribution of `(observed − expected)²/expected` against the
   * independence expectation, in per-cell-quantized micros — the
   * statistical form of q163's entropy question ("is traffic timing
   * type-dependent"), one map-combined aggregate over a types×24
   * table. */
  val q177ChiSquare: Q = Q("q177_chi_square",
    """WITH cells AS (SELECT event_type AS r, hour(ts) AS c, count(*) AS o
                      FROM events GROUP BY 1, 2),
       w AS (SELECT r, o,
               CAST(sum(o) OVER (PARTITION BY r) AS BIGINT) AS rt,
               CAST(sum(o) OVER (PARTITION BY c) AS BIGINT) AS ct,
               CAST(sum(o) OVER () AS BIGINT) AS n FROM cells),
       t AS (SELECT r, rt,
               CAST(round((o - CAST(rt AS DOUBLE) * ct / n)
                    * (o - CAST(rt AS DOUBLE) * ct / n)
                    / (CAST(rt AS DOUBLE) * ct / n) * 1e6) AS BIGINT) AS tt
             FROM w)
       SELECT r AS event_type, max(rt) AS n,
              CAST(sum(tt) AS BIGINT) AS chi2_micro
       FROM t GROUP BY r ORDER BY r""") { (s, d) =>
    Stats.chiSquareByRow(table(s, d, "events"),
        col("event_type"), hour(col("ts")).cast("long"))
      .select(col("__r").as("event_type"), col("n"), col("chi2_micro"))
      .orderBy("event_type")
  }

  // ---------------------------------------------- HLL register mergeability

  /** HyperLogLog-style register table over the distinct-user hash
   * stream, built THREE ways — whole corpus, even-user half, odd-user
   * half — with the bit-max merge of the halves proven equal to the
   * whole-corpus registers per bucket. Registers are pure integers
   * (bucket = h mod 64, rho = trailing zeros of the remaining bits + 1)
   * so unlike the float harmonic-mean estimate the sketch itself
   * replays exactly; mergeability is the property that makes
   * per-partition/per-day sketches compose at 100 TB. */
  val q178HllRegisters: Q = Q("q178_hll_registers",
    s"""WITH h AS (SELECT DISTINCT ${md5sql.format("user_id")} AS h,
             user_id % 2 = 0 AS even
           FROM events),
       x AS (SELECT h % 64 AS bucket, h // 64 AS rest, even FROM h),
       r AS (SELECT bucket, even,
               CASE WHEN rest = 0 THEN 55
                    ELSE bit_count((rest & -rest) - 1) + 1 END AS rho
             FROM x),
       g AS (SELECT bucket, max(rho) AS r_all,
               max(CASE WHEN even THEN rho END) AS ra,
               max(CASE WHEN NOT even THEN rho END) AS rb
             FROM r GROUP BY bucket)
       SELECT bucket, CAST(r_all AS BIGINT) AS r_all,
              CAST(coalesce(ra, 0) AS BIGINT) AS r_a,
              CAST(coalesce(rb, 0) AS BIGINT) AS r_b,
              CAST(greatest(coalesce(ra, 0), coalesce(rb, 0)) AS BIGINT)
                AS r_merged,
              greatest(coalesce(ra, 0), coalesce(rb, 0)) = r_all AS merge_ok
       FROM g ORDER BY bucket""") { (s, d) =>
    import graft.ops.Exprs
    table(s, d, "events")
      .select(Exprs.md5Long(col("user_id")).as("h"),
        (col("user_id") % 2 === 0).as("even"))
      .distinct()
      .withColumn("bucket", expr("h % 64"))
      .withColumn("rest", expr("h div 64"))
      .withColumn("rho", expr(
        "CASE WHEN rest = 0 THEN 55 ELSE bit_count((rest & -rest) - 1) + 1 END")
        .cast("long"))
      .groupBy("bucket")
      .agg(max("rho").as("r_all"),
        coalesce(max(when(col("even"), col("rho"))), lit(0L)).as("r_a"),
        coalesce(max(when(!col("even"), col("rho"))), lit(0L)).as("r_b"))
      .withColumn("r_merged", greatest(col("r_a"), col("r_b")))
      .withColumn("merge_ok", col("r_merged") === col("r_all"))
      .orderBy("bucket")
  }

  // ------------------------------------------------------ inverted index

  /** Inverted-index shard build for the 10 rarest terms: per term the
   * exact document frequency and the FIRST-50-docs posting shard,
   * serialized comma-joined (the engine-neutral form both sides hash
   * identically). The shard cap is the point at scale — a posting list
   * is stored as bounded shards, never one unbounded row; the overflow
   * stays queryable through df. One tokenize pass, one term-keyed
   * aggregate, shard trim inside the aggregate's sorted array. */
  val q179InvertedIndex: Q = Q("q179_inverted_index",
    """WITH tok AS (SELECT DISTINCT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
           FROM documents),
       rn AS (SELECT term, doc_id,
                row_number() OVER (PARTITION BY term ORDER BY doc_id) AS r
              FROM tok),
       g AS (SELECT term, count(*) AS df,
               string_agg(CASE WHEN r <= 50 THEN CAST(doc_id AS VARCHAR) END,
                          ',' ORDER BY doc_id) AS postings_head
             FROM rn GROUP BY term)
       SELECT term, df, postings_head FROM g
       ORDER BY df, term LIMIT 10""") { (s, d) =>
    import graft.text.TextAnalysis
    // (doc_id, term) pairs are already unique — array_distinct dedups
    // within the doc and doc_id is the row key — so no corpus-wide
    // .distinct() shuffle is needed before the term aggregate
    table(s, d, "documents")
      .select(col("doc_id"),
        explode(array_distinct(TextAnalysis.tokens(col("text")))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        array_join(slice(sort_array(collect_set(col("doc_id"))), 1, 50), ",")
          .as("postings_head"))
      .orderBy("df", "term")
      .limit(10)
  }

  // ------------------------------------------- join-size estimation (CM)

  /** Self-join cardinality estimate from a count-min sketch — the
   * planner question ("how big is lineitem ⋈ lineitem on partkey?")
   * answered WITHOUT running the join: per sketch row the inner
   * product of the cell vector with itself, minimized over the 3 rows,
   * against the exact Σc² truth. The estimate reads ≤3×1024 cells; the
   * exact side is one key-count aggregate. est ≥ exact always
   * (collisions only add cross terms) — overcount in ppm is part of
   * the checked output. */
  val q180JoinSizeEstimate: Q = Q("q180_join_size_estimate",
    """WITH cells AS (SELECT dd.d,
             ('0x'||substr(md5(CAST(l_partkey AS VARCHAR)||'#'||dd.d),1,15))::BIGINT
               % 1024 AS pos
           FROM lineitem CROSS JOIN (VALUES (0), (1), (2)) dd(d)),
       sk AS (SELECT d, pos, count(*) AS c FROM cells GROUP BY 1, 2),
       ip AS (SELECT d, CAST(sum(c * c) AS BIGINT) AS est FROM sk GROUP BY d),
       e AS (SELECT min(est) AS est_pairs FROM ip),
       kx AS (SELECT l_partkey, count(*) AS c FROM lineitem GROUP BY 1),
       x AS (SELECT CAST(sum(c * c) AS BIGINT) AS exact_pairs FROM kx)
       SELECT exact_pairs, est_pairs,
              (est_pairs - exact_pairs) * 1000000 // exact_pairs
                AS overcount_ppm
       FROM x CROSS JOIN e""") { (s, d) =>
    val li = table(s, d, "lineitem")
    val est = Sketches.countMinBuild(li, col("l_partkey"),
        depth = 3, width = 1024)
      .groupBy("d").agg(sum(col("c") * col("c")).as("est"))
      .agg(min("est").as("est_pairs"))
    val exact = li.groupBy("l_partkey").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c")).as("exact_pairs"))
    exact.crossJoin(broadcast(est))
      .withColumn("overcount_ppm",
        expr("(est_pairs - exact_pairs) * 1000000 div exact_pairs"))
  }

  // -------------------------------------------- linear gap interpolation

  /** Linear interpolation over PLANTED gaps in the daily series (days
   * with epoch-day ≡ 3 mod 7 treated as unobserved): bracketing
   * neighbors come from frame-bounded max/min over an integer
   * (day·1e6 + value) encoding — monotone in day, so max-preceding /
   * min-following ARE the bracketing observations, no as-of join, one
   * priority-keyed sort. The interpolated estimate (milli-quantized)
   * sits next to the held-out true count, making this a self-checking
   * imputation: the oracle replays both. Complements W3's
   * carry-forward (step-function fill) with the two-sided fill. */
  val q182GapInterpolation: Q = Q("q182_gap_interpolation",
    """WITH dly AS (SELECT o_orderpriority AS priority,
             CAST(epoch(date_trunc('day', o_orderdate)) // 86400 AS BIGINT) AS di,
             count(*) AS y
           FROM orders GROUP BY 1, 2),
       f AS (SELECT priority, di, y, di % 7 <> 3 AS obs FROM dly),
       w AS (SELECT priority, di, y, obs,
               max(CASE WHEN obs THEN di * 1000000 + y END) OVER
                 (PARTITION BY priority ORDER BY di
                  ROWS UNBOUNDED PRECEDING) AS penc,
               min(CASE WHEN obs THEN di * 1000000 + y END) OVER
                 (PARTITION BY priority ORDER BY di
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nenc
             FROM f),
       g AS (SELECT priority, di, y,
               penc // 1000000 AS pdi, penc % 1000000 AS py,
               nenc // 1000000 AS ndi, nenc % 1000000 AS ny
             FROM w WHERE NOT obs AND penc IS NOT NULL AND nenc IS NOT NULL)
       SELECT priority, di, CAST(y AS BIGINT) AS y_true,
              CAST(py AS BIGINT) AS py, CAST(ny AS BIGINT) AS ny,
              CAST(round((py + (ny - py) * CAST(di - pdi AS DOUBLE)
                   / (ndi - pdi)) * 1000) AS BIGINT) AS interp_milli
       FROM g ORDER BY priority, di""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val wPrev = Window.partitionBy("priority").orderBy("di")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("priority").orderBy("di")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    table(s, d, "orders")
      .groupBy(col("o_orderpriority").as("priority"),
        expr("CAST(unix_timestamp(date_trunc('day', o_orderdate)) div 86400 AS BIGINT)")
          .as("di"))
      .agg(count(lit(1)).as("y"))
      .withColumn("obs", col("di") % 7 =!= 3)
      // day·1e6+count encoding: monotone in day (count < 1e6), so the
      // frame extrema decode to the bracketing observed (day, count)
      .withColumn("penc",
        max(when(col("obs"), col("di") * 1000000 + col("y"))).over(wPrev))
      .withColumn("nenc",
        min(when(col("obs"), col("di") * 1000000 + col("y"))).over(wNext))
      .filter(!col("obs") && col("penc").isNotNull && col("nenc").isNotNull)
      .withColumn("pdi", expr("penc div 1000000"))
      .withColumn("py", col("penc") % 1000000)
      .withColumn("ndi", expr("nenc div 1000000"))
      .withColumn("ny", col("nenc") % 1000000)
      .withColumn("interp_milli",
        round((col("py") + (col("ny") - col("py"))
          * (col("di") - col("pdi")).cast("double")
          / (col("ndi") - col("pdi"))) * 1000, 0).cast("long"))
      .select(col("priority"), col("di"), col("y").as("y_true"),
        col("py"), col("ny"), col("interp_milli"))
      .orderBy("priority", "di")
  }

  // ---------------------------------------------- curation pipeline capstone

  /** The composed curation funnel — quality filter (≥0.3) → exact dedup
   * (keep-lowest-id per content fingerprint) → per-lang retention quota
   * (top-60 by quality) — with per-stage surviving document and token
   * counts: the budget sheet a corpus build ships with. Each stage is
   * the library operator the standalone queries already hash-check;
   * this query checks their COMPOSITION (stage order changes the
   * counts). The scored base materializes once; four stage aggregates
   * read it. */
  val q183CurationPipeline: Q = Q("q183_curation_pipeline",
    s"""WITH ${ScaleQueries.qualityCte},
       base AS (SELECT d.doc_id, d.lang,
                  CAST(len(string_split_regex(trim(lower(d.text)), '\\s+'))
                    AS BIGINT) AS toks,
                  md5(regexp_replace(trim(lower(d.text)), '\\s+', ' ', 'g')) AS fp,
                  q.score
                FROM documents d JOIN q USING (doc_id)),
       s2 AS (SELECT * FROM base WHERE score >= 0.3),
       s3 AS (SELECT * FROM (SELECT *, row_number() OVER
                (PARTITION BY fp ORDER BY doc_id) AS rn FROM s2)
              WHERE rn = 1),
       s4 AS (SELECT * FROM (SELECT *, row_number() OVER
                (PARTITION BY lang ORDER BY score DESC, doc_id) AS qr FROM s3)
              WHERE qr <= 60)
       SELECT '1_raw' AS stage, count(*) AS n_docs,
              CAST(sum(toks) AS BIGINT) AS n_tokens FROM base
       UNION ALL SELECT '2_quality', count(*), CAST(sum(toks) AS BIGINT) FROM s2
       UNION ALL SELECT '3_dedup', count(*), CAST(sum(toks) AS BIGINT) FROM s3
       UNION ALL SELECT '4_quota', count(*), CAST(sum(toks) AS BIGINT) FROM s4
       ORDER BY stage""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.text.TextAnalysis
    import graft.dedup.Dedup
    // scored base read by all four stage aggregates — one scan, then RDD
    val base = table(s, d, "documents")
      .select(col("doc_id"), col("lang"), col("text"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("toks"),
        TextAnalysis.qualityScore(col("text")).as("score"))
      .localCheckpoint()
    val s2 = base.filter(col("score") >= 0.3)
    val s3 = Dedup.exactDedup(s2)
    val s4 = s3.withColumn("qr", row_number().over(
        Window.partitionBy("lang").orderBy(col("score").desc, col("doc_id"))))
      .filter(col("qr") <= 60)
    def stage(df: org.apache.spark.sql.DataFrame, name: String) =
      df.agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
        .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))
    stage(base, "1_raw")
      .unionByName(stage(s2, "2_quality"))
      .unionByName(stage(s3, "3_dedup"))
      .unionByName(stage(s4, "4_quota"))
      .orderBy("stage")
  }

  // --------------------------------------------- time-based RANGE frame

  /** Trailing-hour running totals via a TIME-based RANGE frame (every
   * event sees exactly the [t−3600 s, t] window — ROWS frames can't
   * express this when event spacing varies): per-type count and
   * milli-quantized value sum (ints in the frame sum, so aggregation
   * order can't flip a bit). The frame sort rides ONE type-keyed
   * exchange; output sliced to a stable id range after the windows. */
  val q184RangeFrame: Q = Q("q184_range_frame",
    """WITH e AS (SELECT event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(round(value * 1000) AS BIGINT) AS vmilli
           FROM events),
       w AS (SELECT event_id, event_type, sec,
               count(*) OVER (PARTITION BY event_type ORDER BY sec
                              RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
                 AS n_hour,
               CAST(sum(vmilli) OVER (PARTITION BY event_type ORDER BY sec
                              RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS v_hour_milli
             FROM e)
       SELECT event_id, event_type, sec, n_hour, v_hour_milli
       FROM w WHERE event_id < 300 ORDER BY event_id""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("sec")
      .rangeBetween(-3600L, 0L)
    table(s, d, "events")
      .select(col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"),
        round(col("value") * 1000, 0).cast("long").as("vmilli"))
      .withColumn("n_hour", count(lit(1)).over(w))
      .withColumn("v_hour_milli", sum("vmilli").over(w))
      .filter(col("event_id") < 300)
      .select("event_id", "event_type", "sec", "n_hour", "v_hour_milli")
      .orderBy("event_id")
  }

  // ----------------------------------------------- pivot/unpivot round trip

  /** Wide→long inversion: q11's status pivot UNPIVOTed back to
   * (priority, status, n) long form and inner-joined against the
   * direct groupBy truth — count equality per cell proves
   * pivot∘unpivot ≡ identity (zero cells drop on both sides, so the
   * join covers exactly the observed combinations). The missing
   * reshaping direction: pivots existed since q11, the inverse did
   * not. */
  val q185UnpivotRoundtrip: Q = Q("q185_unpivot_roundtrip",
    """WITH p AS (SELECT o_orderpriority,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS f,
             count(*) FILTER (WHERE o_orderstatus = 'O') AS o,
             count(*) FILTER (WHERE o_orderstatus = 'P') AS p
           FROM orders GROUP BY o_orderpriority),
       u AS (SELECT o_orderpriority AS priority, upper(status) AS status, n
             FROM p UNPIVOT (n FOR status IN (f, o, p))
             WHERE n > 0),
       t AS (SELECT o_orderpriority AS priority, o_orderstatus AS status,
               count(*) AS n_direct
             FROM orders GROUP BY 1, 2)
       SELECT u.priority, u.status, u.n, t.n_direct, u.n = t.n_direct AS ok
       FROM u JOIN t USING (priority, status)
       ORDER BY priority, status""") { (s, d) =>
    val pivoted = graft.ops.Relational.pivotCount(
      table(s, d, "orders").withColumnRenamed("o_orderpriority", "priority"),
      "priority", "o_orderstatus", Seq("F", "O", "P"))
    val long = pivoted.selectExpr("priority",
        "stack(3, 'F', F, 'O', O, 'P', P) AS (status, n)")
      .filter(col("n") > 0)
    val truth = table(s, d, "orders")
      .groupBy(col("o_orderpriority").as("priority"),
        col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_direct"))
    long.join(truth, Seq("priority", "status"))
      .withColumn("ok", col("n") === col("n_direct"))
      .orderBy("priority", "status")
  }

  // ------------------------------------------------- point-in-time join

  /** Point-in-time join of the fact stream against its OWN SCD2
   * dimension (q94's version intervals): every order of the tracked
   * customers matched to the version valid at its order date
   * (`from ≤ d < to`, open tail) — the dimensional-correctness join
   * that using `is_current` silently gets wrong for historical facts.
   * Key-equi join + interval filter (versions per key are few — no
   * interval bucketing needed); per customer the order count, distinct
   * versions touched, and how many orders agree with their version's
   * attribute (same-day flip-flops legitimately disagree; the count is
   * deterministic and replayed). */
  val q186PointInTime: Q = Q("q186_point_in_time",
    """WITH ch AS (SELECT o_custkey AS k, CAST(o_orderdate AS DATE) AS d,
                          o_orderkey AS tie, o_orderpriority AS attr
                   FROM orders WHERE o_custkey < 100),
       l AS (SELECT k, d, tie, attr,
                    lag(attr) OVER (PARTITION BY k ORDER BY d, tie) AS prev
             FROM ch),
       f AS (SELECT k, d, tie, attr FROM l WHERE prev IS NULL OR prev <> attr),
       v AS (SELECT k, attr, d AS valid_from,
                    lead(d) OVER w AS valid_to,
                    row_number() OVER w AS version
             FROM f WINDOW w AS (PARTITION BY k ORDER BY d, tie)),
       j AS (SELECT ch.k, v.version, ch.attr = v.attr AS ok
             FROM ch JOIN v ON ch.k = v.k
             WHERE ch.d >= v.valid_from
               AND (v.valid_to IS NULL OR ch.d < v.valid_to))
       SELECT k AS custkey, count(*) AS n_orders,
              count(DISTINCT version) AS n_versions,
              count(*) FILTER (WHERE ok) AS n_attr_match
       FROM j GROUP BY k ORDER BY custkey""") { (s, d) =>
    import graft.ops.Relational
    val log = table(s, d, "orders")
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey").as("k"), to_date(col("o_orderdate")).as("d"),
        col("o_orderkey").as("tie"), col("o_orderpriority").as("attr"))
      .localCheckpoint() // fact probe AND version build read it
    val v = Relational.scd2Versions(log, "k", "d", "tie", "attr")
      .select(col("k").as("vk"), col("attr").as("vattr"),
        col("valid_from"), col("valid_to"), col("version"))
    log.join(v, col("k") === col("vk") &&
        col("d") >= col("valid_from") &&
        (col("valid_to").isNull || col("d") < col("valid_to")))
      .groupBy(col("k").as("custkey"))
      .agg(count(lit(1)).as("n_orders"),
        count_distinct(col("version")).as("n_versions"),
        count(when(col("attr") === col("vattr"), 1)).as("n_attr_match"))
      .orderBy("custkey")
  }

  // ------------------------------------------- streaming count-min merge

  /** q161's heavy-hitter estimates recomputed from a sketch folded
   * ACROSS MICRO-BATCHES (cell-wise addition in foreachBatch): the
   * count-min merge is a monoid, so batch boundaries and arrival order
   * cannot change a cell, and the streamed sketch answers the probes
   * with byte-identical results — the same oracle as q161 gates it. */
  val q187StreamCountMin: Q = Q("q187_stream_count_min",
    SketchQueries.q161CountMin.oracle.get) { (s, d) =>
    val sketch = graft.streaming.StreamingSketch
      .runCountMinToBatch(s, d, depth = 3, width = 1024)
    val top = table(s, d, "events")
      .groupBy("user_id").agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("user_id")).limit(10)
    Sketches.countMinQuery(sketch, top, col("user_id"),
        depth = 3, width = 1024)
      .withColumn("overcount", col("est") - col("exact"))
      .select("user_id", "exact", "est", "overcount")
      .orderBy(col("exact").desc, col("user_id"))
  }

  // --------------------------------------------- distributed k-means

  /** Two synchronous Lloyd's k-means iterations (k = 4) over the first
   * 4 embedding dimensions, INTEGER-EXACT end to end: coordinates
   * quantize to micro units before any arithmetic (float → double is a
   * widening cast and ×10⁶+floor is one IEEE-identical double op, so
   * both engines see the same BIGINTs), squared distances and centroid
   * sums stay BIGINT, and the new centroid is sum div count — no float
   * mean whose aggregation order could flip a bit. Per round: one
   * broadcast cross join against the k-row centroid table + one keyed
   * argmin window + one aggregate — the distributed Lloyd's recipe
   * (the k-row table broadcasts at any corpus size; the argmin window
   * is keyed by point). Seeds are the k smallest vec_ids; assignment
   * ties break toward the smaller centroid id. */
  val q222KmeansLloyd: Q = Q("q222_kmeans_lloyd",
    """WITH pts AS (SELECT vec_id,
             CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT) AS x1,
             CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000000) AS BIGINT) AS x2,
             CAST(floor(CAST(embedding[3] AS DOUBLE) * 1000000) AS BIGINT) AS x3,
             CAST(floor(CAST(embedding[4] AS DOUBLE) * 1000000) AS BIGINT) AS x4
           FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) >= 4),
       c0 AS (SELECT vec_id AS cid, x1 AS c1, x2 AS c2, x3 AS c3, x4 AS c4
              FROM pts ORDER BY vec_id LIMIT 4),
       a1 AS (SELECT vec_id, cid, x1, x2, x3, x4 FROM (
              SELECT p.*, c.cid,
                     row_number() OVER (PARTITION BY p.vec_id ORDER BY
                       (p.x1-c.c1)*(p.x1-c.c1) + (p.x2-c.c2)*(p.x2-c.c2) +
                       (p.x3-c.c3)*(p.x3-c.c3) + (p.x4-c.c4)*(p.x4-c.c4),
                       c.cid) AS rn
              FROM pts p CROSS JOIN c0 c) WHERE rn = 1),
       c1t AS (SELECT cid, CAST(sum(x1) // count(*) AS BIGINT) AS c1,
                    CAST(sum(x2) // count(*) AS BIGINT) AS c2,
                    CAST(sum(x3) // count(*) AS BIGINT) AS c3,
                    CAST(sum(x4) // count(*) AS BIGINT) AS c4
               FROM a1 GROUP BY cid),
       a2 AS (SELECT vec_id, cid, x1, x2, x3, x4 FROM (
              SELECT p.*, c.cid,
                     row_number() OVER (PARTITION BY p.vec_id ORDER BY
                       (p.x1-c.c1)*(p.x1-c.c1) + (p.x2-c.c2)*(p.x2-c.c2) +
                       (p.x3-c.c3)*(p.x3-c.c3) + (p.x4-c.c4)*(p.x4-c.c4),
                       c.cid) AS rn
              FROM pts p CROSS JOIN c1t c) WHERE rn = 1)
       SELECT CAST(cid AS BIGINT) AS cid, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x1) // count(*) AS BIGINT) AS c1,
              CAST(sum(x2) // count(*) AS BIGINT) AS c2,
              CAST(sum(x3) // count(*) AS BIGINT) AS c3,
              CAST(sum(x4) // count(*) AS BIGINT) AS c4
       FROM a2 GROUP BY cid ORDER BY cid""") { (s, d) =>
    import graft.ml.Lloyd
    Lloyd.iterate(
        Lloyd.quantize(table(s, d, "embeddings"), "embedding", "vec_id",
          dims = 4),
        k = 4, rounds = 2, dims = 4)
      .orderBy("cid")
  }

  /** Cluster-quality scoring for q222's k-means: SIMPLIFIED silhouette
   * (centroid distances, not all-pairs member distances — the only
   * silhouette shape that survives scale; all-pairs is O(n²), this is
   * one broadcast cross join against the k-row centroid table) per
   * final cluster, integer-exact end to end: squared BIGINT distances,
   * score = (b−a)·10⁶ div max(a,b,1) where a = own-centroid distance
   * and b = nearest-other-centroid distance (b ≥ a by construction so
   * the score is non-negative and truncating div == floor), cluster
   * mean = sum div count. The oracle replays q222's two Lloyd rounds
   * and then the scoring pass term for term. */
  val q304Silhouette: Q = Q("q304_silhouette",
    """WITH pts AS (SELECT vec_id,
             CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT) AS x1,
             CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000000) AS BIGINT) AS x2,
             CAST(floor(CAST(embedding[3] AS DOUBLE) * 1000000) AS BIGINT) AS x3,
             CAST(floor(CAST(embedding[4] AS DOUBLE) * 1000000) AS BIGINT) AS x4
           FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) >= 4),
       c0 AS (SELECT vec_id AS cid, x1 AS c1, x2 AS c2, x3 AS c3, x4 AS c4
              FROM pts ORDER BY vec_id LIMIT 4),
       a1 AS (SELECT vec_id, cid, x1, x2, x3, x4 FROM (
              SELECT p.*, c.cid,
                     row_number() OVER (PARTITION BY p.vec_id ORDER BY
                       (p.x1-c.c1)*(p.x1-c.c1) + (p.x2-c.c2)*(p.x2-c.c2) +
                       (p.x3-c.c3)*(p.x3-c.c3) + (p.x4-c.c4)*(p.x4-c.c4),
                       c.cid) AS rn
              FROM pts p CROSS JOIN c0 c) WHERE rn = 1),
       c1t AS (SELECT cid, CAST(sum(x1) // count(*) AS BIGINT) AS c1,
                    CAST(sum(x2) // count(*) AS BIGINT) AS c2,
                    CAST(sum(x3) // count(*) AS BIGINT) AS c3,
                    CAST(sum(x4) // count(*) AS BIGINT) AS c4
               FROM a1 GROUP BY cid),
       a2 AS (SELECT vec_id, cid, x1, x2, x3, x4 FROM (
              SELECT p.*, c.cid,
                     row_number() OVER (PARTITION BY p.vec_id ORDER BY
                       (p.x1-c.c1)*(p.x1-c.c1) + (p.x2-c.c2)*(p.x2-c.c2) +
                       (p.x3-c.c3)*(p.x3-c.c3) + (p.x4-c.c4)*(p.x4-c.c4),
                       c.cid) AS rn
              FROM pts p CROSS JOIN c1t c) WHERE rn = 1),
       c2t AS (SELECT cid, CAST(sum(x1) // count(*) AS BIGINT) AS c1,
                    CAST(sum(x2) // count(*) AS BIGINT) AS c2,
                    CAST(sum(x3) // count(*) AS BIGINT) AS c3,
                    CAST(sum(x4) // count(*) AS BIGINT) AS c4
               FROM a2 GROUP BY cid),
       d3 AS (SELECT p.vec_id, c.cid,
                (p.x1-c.c1)*(p.x1-c.c1) + (p.x2-c.c2)*(p.x2-c.c2) +
                (p.x3-c.c3)*(p.x3-c.c3) + (p.x4-c.c4)*(p.x4-c.c4) AS dst,
                row_number() OVER (PARTITION BY p.vec_id ORDER BY
                  (p.x1-c.c1)*(p.x1-c.c1) + (p.x2-c.c2)*(p.x2-c.c2) +
                  (p.x3-c.c3)*(p.x3-c.c3) + (p.x4-c.c4)*(p.x4-c.c4),
                  c.cid) AS rn
              FROM pts p CROSS JOIN c2t c),
       sc AS (SELECT vec_id,
                max(CASE WHEN rn = 1 THEN cid END) AS cid,
                max(CASE WHEN rn = 1 THEN dst END) AS a,
                min(CASE WHEN rn > 1 THEN dst END) AS b
              FROM d3 GROUP BY vec_id),
       s AS (SELECT cid, (b - a) * 1000000 // greatest(a, b, 1) AS s FROM sc)
       SELECT CAST(cid AS BIGINT) AS cid, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(s) // count(*) AS BIGINT) AS mean_sil_ppm
       FROM s GROUP BY cid ORDER BY cid""") { (s, d) =>
    import graft.ml.Lloyd
    val pts = Lloyd.quantize(table(s, d, "embeddings"), "embedding",
      "vec_id", dims = 4)
    val cent = Lloyd.iterate(pts, k = 4, rounds = 2, dims = 4).drop("n")
    Lloyd.simplifiedSilhouette(pts, cent, dims = 4).orderBy("cid")
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic between the price
   * distributions of urgent/high-priority orders and the rest — the
   * distribution-shape test that complements the categorical chi-square
   * (q177) and token-histogram drift (q176). The CDFs are equi-width
   * BINNED (width 1000), so the cumulative window runs over a table
   * bounded by the VALUE RANGE, never the fact table — the q201
   * price-bucket argument — and the statistic is exact for the binned
   * distributions. Each CDF quantizes to micro units independently
   * (cum·10⁶ div n), so the scaled form stays BIGINT-safe at any row
   * count where cum1·n2 would overflow. Reports the statistic and the
   * bin where the gap peaks (tie → smallest bin). */
  val q223KsTest: Q = Q("q223_ks_test",
    """WITH o AS (SELECT floor(o_totalprice / 1000) AS binf,
             o_orderpriority IN ('1-URGENT', '2-HIGH') AS g1
           FROM orders
           WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL),
       b AS (SELECT CAST(binf AS BIGINT) AS bin,
               CAST(count(*) FILTER (WHERE g1) AS BIGINT) AS c1,
               CAST(count(*) FILTER (WHERE NOT g1) AS BIGINT) AS c2
             FROM o GROUP BY 1),
       n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                    CAST(sum(c2) AS BIGINT) AS n2 FROM b),
       cdf AS (SELECT bin,
                 CAST(sum(c1) OVER win AS BIGINT) AS cum1,
                 CAST(sum(c2) OVER win AS BIGINT) AS cum2
               FROM b WINDOW win AS (ORDER BY bin)),
       d AS (SELECT bin,
               abs(cum1 * 1000000 // n1 - cum2 * 1000000 // n2) AS d_micro
             FROM cdf, n),
       mx AS (SELECT CAST(max(d_micro) AS BIGINT) AS ks_micro FROM d),
       am AS (SELECT CAST(min(bin) AS BIGINT) AS at_bin
              FROM d JOIN mx ON d.d_micro = mx.ks_micro)
       SELECT n.n1, n.n2, mx.ks_micro, am.at_bin FROM n, mx, am""") { (s, d) =>
    Stats.ksBinned(table(s, d, "orders"), col("o_totalprice"),
      col("o_orderpriority").isin("1-URGENT", "2-HIGH"), binWidth = 1000.0)
  }

  /** Mann–Whitney U / rank-sum location test between the same two
   * price populations as q223, on the same bounded equi-width bins —
   * the rank-based companion to KS (KS sees shape, U sees stochastic
   * dominance). Tie handling is the textbook midrank, kept integer by
   * DOUBLING every rank: midrank×2 of a bin = 2·(count before) +
   * (count within) + 1, so R1×2, U1×2 and the AUC effect size
   * U1/(n1·n2) in ppm are all exact BIGINT arithmetic — no halves, no
   * floats. The rank walk is a window over the value-range-bounded bin
   * table, never the fact table. */
  val q224MannWhitney: Q = Q("q224_mann_whitney",
    """WITH o AS (SELECT floor(o_totalprice / 1000) AS binf,
             o_orderpriority IN ('1-URGENT', '2-HIGH') AS g1
           FROM orders
           WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL),
       b AS (SELECT CAST(binf AS BIGINT) AS bin,
               CAST(count(*) FILTER (WHERE g1) AS BIGINT) AS c1,
               CAST(count(*) FILTER (WHERE NOT g1) AS BIGINT) AS c2
             FROM o GROUP BY 1),
       n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                    CAST(sum(c2) AS BIGINT) AS n2 FROM b),
       r AS (SELECT bin, c1, c2,
               CAST(coalesce(sum(c1 + c2) OVER (ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cb
             FROM b),
       s AS (SELECT CAST(sum(c1 * (2 * cb + c1 + c2 + 1)) AS BIGINT) AS r1_x2
             FROM r)
       SELECT n.n1, n.n2,
              CAST(s.r1_x2 - n.n1 * (n.n1 + 1) AS BIGINT) AS u1_x2,
              CAST((s.r1_x2 - n.n1 * (n.n1 + 1)) * 500000 // (n.n1 * n.n2)
                AS BIGINT) AS auc_ppm
       FROM n, s""") { (s, d) =>
    Stats.mannWhitneyBinned(table(s, d, "orders"), col("o_totalprice"),
      col("o_orderpriority").isin("1-URGENT", "2-HIGH"), binWidth = 1000.0)
  }

  /** Calibration / reliability table: does a higher order price
   * predict urgency? Equi-width price bins as the "score", urgent
   * priority as the label — per bin the observed positive rate vs the
   * base rate and the bin's expected-calibration-error contribution,
   * all integer ppm ([[graft.ops.Stats.calibrationBinned]]). On
   * synthetic data price carries no signal, so rates hug the base
   * rate — the near-zero ECE contributions ARE the finding, exactly
   * what this audit reports for an uninformative score. */
  val q226Calibration: Q = Q("q226_calibration",
    """WITH o AS (SELECT floor(o_totalprice / 50000) AS binf,
             o_orderpriority IN ('1-URGENT', '2-HIGH') AS y
           FROM orders
           WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL),
       b AS (SELECT CAST(binf AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (WHERE y) AS BIGINT) AS pos
             FROM o GROUP BY 1),
       t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                    CAST(sum(pos) AS BIGINT) AS pp FROM b)
       SELECT bin, n, pos,
              CAST(pos * 1000000 // n AS BIGINT) AS rate_ppm,
              CAST(pp * 1000000 // nn AS BIGINT) AS overall_ppm,
              CAST(n * abs(pos * 1000000 // n - pp * 1000000 // nn) // nn
                AS BIGINT) AS ece_contrib_ppm
       FROM b, t ORDER BY bin""") { (s, d) =>
    Stats.calibrationBinned(table(s, d, "orders"), col("o_totalprice"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"), binWidth = 50000.0)
      .orderBy("bin")
  }

  /** STL-lite seasonal decomposition of the daily event series:
   * trend = centered 7-day moving average, weekday seasonal index =
   * mean detrended value per day-of-week, residual = remainder — the
   * classic additive decomposition, kept EXACT by scaling everything
   * ×7 instead of dividing (trend_x7 is the 7-day sum, detrended_x7 =
   * 7x − sum7, seasonal_x7 = integer mean of detrended_x7 per dow), so
   * every column is BIGINT and the oracle replays bit-for-bit. Only
   * days with a full centered window decompose (n_win = 7 guard);
   * the series densifies against the calendar spine first, and every
   * window runs over that bounded dense table. */
  val q233StlDecompose: Q = Q("q233_stl_decompose",
    """WITH dc AS (SELECT CAST(ts AS DATE) AS dd, CAST(count(*) AS BIGINT) AS x
                   FROM events WHERE ts IS NOT NULL GROUP BY 1),
       bounds AS (SELECT min(dd) AS d0, max(dd) AS d1 FROM dc),
       spine AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS dd
                 FROM bounds),
       daily AS (SELECT s.dd, coalesce(dc.x, 0) AS x
                 FROM spine s LEFT JOIN dc USING (dd)),
       w AS (SELECT dd, x, dayofweek(dd) + 1 AS dow,
               CAST(sum(x) OVER win AS BIGINT) AS sum7,
               CAST(count(*) OVER win AS BIGINT) AS n_win
             FROM daily
             WINDOW win AS (ORDER BY dd ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
       f AS (SELECT dd, x, dow, sum7, 7 * x - sum7 AS det_x7
             FROM w WHERE n_win = 7),
       si AS (SELECT dow, CAST(sum(det_x7) // count(*) AS BIGINT) AS seas_x7
              FROM f GROUP BY dow)
       SELECT strftime(f.dd, '%Y-%m-%d') AS day, f.x,
              f.sum7 AS trend_x7, si.seas_x7,
              CAST(f.det_x7 - si.seas_x7 AS BIGINT) AS resid_x7
       FROM f JOIN si ON si.dow = f.dow
       ORDER BY day""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.ops.Relational
    val daily0 = table(s, d, "events").filter(col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("dd")).agg(count(lit(1)).as("x"))
      .localCheckpoint() // bounded by the calendar; bounds + join reuse it
    val b = daily0.agg(date_format(min("dd"), "yyyy-MM-dd").as("lo"),
      date_format(max("dd"), "yyyy-MM-dd").as("hi")).head()
    // empty-input guard: no events → 1-day sentinel spine whose window
    // never reaches n_win = 7 → zero rows, matching the oracle's empty
    // generate_series shape
    val lo = if (b.isNullAt(0)) "9999-01-01" else b.getString(0)
    val hi = if (b.isNullAt(0)) "9999-01-01" else b.getString(1)
    val daily = Relational.spineJoin(
      Relational.dateSpine(s, lo, hi, "dd"),
      daily0, Seq("dd"), Seq("x"))
    val win = Window.orderBy("dd").rowsBetween(-3, 3) // bounded dense calendar
    val f = daily
      .select(col("dd"), col("x"), dayofweek(col("dd")).cast("long").as("dow"),
        sum("x").over(win).as("sum7"), count(lit(1)).over(win).as("n_win"))
      .filter(col("n_win") === 7)
      .withColumn("det_x7", lit(7L) * col("x") - col("sum7"))
      .localCheckpoint() // seasonal index + the final join read it
    val si = f.groupBy("dow")
      .agg(expr("sum(det_x7) div count(1)").as("seas_x7"))
    f.join(broadcast(si), Seq("dow"))
      .select(date_format(col("dd"), "yyyy-MM-dd").as("day"), col("x"),
        col("sum7").as("trend_x7"), col("seas_x7"),
        (col("det_x7") - col("seas_x7")).as("resid_x7"))
      .orderBy("day")
  }

  /** WEIGHTED quantiles of line price, weighted by quantity — "the
   * price below which half the UNITS (not half the rows) ship", the
   * economics-style weighted median family. Histogram recipe: the
   * cumulative walk runs over value-range-bounded price bins carrying
   * BIGINT weight sums (quantities are integral in this schema — the
   * long cast is exact), and each quantile is the smallest bin whose
   * cumulative weight reaches q·total — a picked bin, no
   * interpolation, exact at any row count. */
  val q234WeightedQuantiles: Q = Q("q234_weighted_quantiles",
    """WITH b AS (SELECT CAST(floor(l_extendedprice / 1000) AS BIGINT) AS bin,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
           FROM lineitem
           WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
           GROUP BY 1),
       t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM b),
       c AS (SELECT bin, CAST(sum(w) OVER (ORDER BY bin) AS BIGINT) AS cw
             FROM b)
       SELECT t.tw AS total_weight,
              (SELECT CAST(min(bin) AS BIGINT) FROM c, t
               WHERE cw * 100 >= 50 * tw) AS wp50_bin,
              (SELECT CAST(min(bin) AS BIGINT) FROM c, t
               WHERE cw * 100 >= 90 * tw) AS wp90_bin,
              (SELECT CAST(min(bin) AS BIGINT) FROM c, t
               WHERE cw * 100 >= 99 * tw) AS wp99_bin
       FROM t""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val b = table(s, d, "lineitem")
      .filter(col("l_extendedprice").isNotNull && col("l_quantity").isNotNull)
      .groupBy(floor(col("l_extendedprice") / 1000).cast("long").as("bin"))
      .agg(sum(col("l_quantity").cast("long")).as("w"))
    val t = b.agg(sum("w").as("tw"))
    val win = Window.orderBy("bin") // bounded by the price RANGE
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = b.select(col("bin"), sum("w").over(win).as("cw"))
      .crossJoin(broadcast(t))
      .localCheckpoint() // three picked quantiles read the bounded walk
    def pick(q: Int, name: String) =
      c.filter(col("cw") * 100 >= col("tw") * q)
        .agg(min("bin").as(name))
    t.select(col("tw").as("total_weight"))
      .crossJoin(broadcast(pick(50, "wp50_bin")))
      .crossJoin(broadcast(pick(90, "wp90_bin")))
      .crossJoin(broadcast(pick(99, "wp99_bin")))
  }

  /** Theil–Sen robust trend of the daily event count: the PICKED
   * median of all pairwise slopes (the estimator a single outlier day
   * cannot move, unlike OLS). The series is calendar-bounded (30
   * days → 435 pairs), so the pair join broadcasts one bounded side
   * and the median is a rank pick over a bounded table; slopes are
   * integer milli-units via `div` (floor in both engines, negatives
   * included). Intercept = picked median of (1000·x − slope_med·t). */
  val q266TheilSen: Q = Q("q266_theil_sen",
    """WITH dc AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS t,
              CAST(count(*) AS BIGINT) AS x
            FROM events WHERE ts IS NOT NULL GROUP BY 1),
       pr AS (SELECT ((b.x - a.x) * 1000) // (b.t - a.t) AS s, a.t AS t1, b.t AS t2
              FROM dc a JOIN dc b ON a.t < b.t),
       r AS (SELECT s, row_number() OVER (ORDER BY s, t1, t2) AS rn,
                    count(*) OVER () AS np FROM pr),
       sm AS (SELECT max(np) AS n_pairs,
                     max(CASE WHEN rn = (np + 1) // 2 THEN s END) AS slope_milli
              FROM r),
       ic AS (SELECT dc.x * 1000 - sm.slope_milli * dc.t AS ic0 FROM dc, sm),
       ri AS (SELECT ic0, row_number() OVER (ORDER BY ic0) AS rn,
                     count(*) OVER () AS nd FROM ic)
       SELECT (SELECT CAST(count(*) AS BIGINT) FROM dc) AS n_days,
              sm.n_pairs, sm.slope_milli,
              (SELECT max(CASE WHEN rn = (nd + 1) // 2 THEN ic0 END) FROM ri) AS intercept_milli
       FROM sm""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val dc = table(s, d, "events").filter(col("ts").isNotNull)
      .groupBy((unix_timestamp(col("ts")) / 86400).cast("long").as("t"))
      .agg(count(lit(1)).as("x"))
      .localCheckpoint() // pair join (both sides), intercept, count read it
    val pr = dc.select(col("t").as("t1"), col("x").as("x1"))
      .join(broadcast(dc.select(col("t").as("t2"), col("x").as("x2"))),
        col("t1") < col("t2"))
      .select(expr("((x2 - x1) * 1000) div (t2 - t1)").as("s"),
        col("t1"), col("t2"))
    val r = pr
      .withColumn("rn", row_number().over(Window.orderBy("s", "t1", "t2")))
      .withColumn("np", count(lit(1)).over()) // bounded: ≤ days² pairs
    val sm = r.agg(max("np").cast("long").as("n_pairs"),
      max(when(col("rn") === expr("(np + 1) div 2"), col("s")))
        .as("slope_milli")).localCheckpoint() // intercept + output read it
    val ri = dc.crossJoin(broadcast(sm))
      .select((col("x") * 1000 - col("slope_milli") * col("t")).as("ic0"))
      .withColumn("rn", row_number().over(Window.orderBy("ic0")))
      .withColumn("nd", count(lit(1)).over())
    val ic = ri.agg(max(when(col("rn") === expr("(nd + 1) div 2"),
      col("ic0"))).as("intercept_milli"))
    val nd = dc.agg(count(lit(1)).as("n_days"))
    broadcast(nd).crossJoin(broadcast(sm)).crossJoin(broadcast(ic))
      .select(col("n_days"), col("n_pairs"), col("slope_milli"),
        col("intercept_milli"))
  }

  /** MASE (mean absolute scaled error) of the seasonal-naive forecast
   * x̂_t = x_{t−7} per event type, scaled by the one-step naive error —
   * the standard scale-free forecast-accuracy metric. Entirely
   * integer: both error sums are BIGINT, and the ratio is staged as
   * sum_seas·n_naive·1000 div (n_seas·sum_naive) — exact at any
   * partitioning, windows only over the bounded daily table. */
  val q267Mase: Q = Q("q267_mase",
    """WITH dc AS (SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS t,
              CAST(count(*) AS BIGINT) AS x
            FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
            GROUP BY 1, 2),
       lg AS (SELECT event_type, t, x,
                lag(x, 7) OVER (PARTITION BY event_type ORDER BY t) AS x7,
                lag(x, 1) OVER (PARTITION BY event_type ORDER BY t) AS x1
              FROM dc),
       er AS (SELECT event_type,
                CAST(sum(CASE WHEN x7 IS NOT NULL THEN abs(x - x7) END) AS BIGINT) AS sum_seas,
                CAST(count(x7) AS BIGINT) AS n_seas,
                CAST(sum(CASE WHEN x1 IS NOT NULL THEN abs(x - x1) END) AS BIGINT) AS sum_naive,
                CAST(count(x1) AS BIGINT) AS n_naive
              FROM lg GROUP BY event_type)
       SELECT event_type, sum_seas, n_seas, sum_naive, n_naive,
              (sum_seas * n_naive * 1000) // nullif(n_seas * sum_naive, 0) AS mase_milli
       FROM er ORDER BY event_type""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("t") // bounded daily table
    table(s, d, "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"),
        (unix_timestamp(col("ts")) / 86400).cast("long").as("t"))
      .agg(count(lit(1)).as("x"))
      .withColumn("x7", lag("x", 7).over(w))
      .withColumn("x1", lag("x", 1).over(w))
      .groupBy("event_type")
      .agg(sum(when(col("x7").isNotNull, abs(col("x") - col("x7"))))
          .as("sum_seas"),
        count(col("x7")).as("n_seas"),
        sum(when(col("x1").isNotNull, abs(col("x") - col("x1"))))
          .as("sum_naive"),
        count(col("x1")).as("n_naive"))
      .select(col("event_type"), col("sum_seas"), col("n_seas"),
        col("sum_naive"), col("n_naive"),
        expr("sum_seas * n_naive * 1000 div nullif(n_seas * sum_naive, 0)")
          .as("mase_milli"))
      .orderBy("event_type")
  }

  /** EWMA weights for α = 0.3 over a 10-lag trailing window, scaled
   * ×10^10 to stay integral: w_k = α(1−α)^k·10^10 = 3·7^k·10^(9−k).
   * Shared verbatim by the Spark plan and the oracle so the replay is
   * bit-exact. */
  private val ewmaWeights: Seq[Long] = {
    var p7 = 1L; var p10 = 1000000000L
    (0 until 10).map { _ =>
      val w = 3L * p7 * p10; p7 *= 7; p10 /= 10; w
    }
  }

  /** EWMA anomaly detection on the per-type daily count series:
   * exponentially weighted moving average (α = 0.3) over the 10
   * trailing lags, ENTIRELY integer — weights are α(1−α)^k scaled
   * ×10^10 ([[ewmaWeights]]), the head of each series renormalizes by
   * the sum of PRESENT weights (no warm-up bias), and a day is
   * anomalous when |x − ewma| > 0.25·ewma, staged as
   * |x·den − num|·4 > num so no division ever happens. Windows only
   * over the bounded daily table (days × types), never the fact
   * table; exact at any partitioning. Magnitudes: x ≤ ~10^5 even at
   * 100× harness scale, num ≤ 10·x·3·10^9 ≈ 3·10^15, ×1000 for the
   * milli report ≈ 3·10^18 < 2^63. */
  val q282EwmaAnomaly: Q = Q("q282_ewma_anomaly",
    s"""WITH dc AS (SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS t,
              CAST(count(*) AS BIGINT) AS x
            FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
            GROUP BY 1, 2),
       lg AS (SELECT event_type, t, x,
                ${(1 until 10).map(k =>
                  s"lag(x, $k) OVER (PARTITION BY event_type ORDER BY t) AS x$k")
                  .mkString(",\n                ")}
              FROM dc),
       ew AS (SELECT event_type, t, x,
                (x * ${ewmaWeights.head}${(1 until 10).map(k =>
                  s" + coalesce(x$k * ${ewmaWeights(k)}, 0)").mkString}) AS num,
                (${ewmaWeights.head}${(1 until 10).map(k =>
                  s" + CASE WHEN x$k IS NULL THEN 0 ELSE ${ewmaWeights(k)} END").mkString}) AS den
              FROM lg)
       SELECT event_type, t, x, (num * 1000) // den AS ewma_milli,
              abs(x * den - num) * 4 > num AS anomaly
       FROM ew ORDER BY event_type, t""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("t") // bounded daily table
    val daily = table(s, d, "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"),
        (unix_timestamp(col("ts")) / 86400).cast("long").as("t"))
      .agg(count(lit(1)).as("x"))
    val lags = (0 until 10).map(k =>
      if (k == 0) col("x") else lag("x", k).over(w))
    val num = lags.zip(ewmaWeights).map { case (c, wt) =>
      when(c.isNotNull, c * lit(wt)).otherwise(lit(0L))
    }.reduce(_ + _)
    val den = lags.zip(ewmaWeights).map { case (c, wt) =>
      when(c.isNotNull, lit(wt)).otherwise(lit(0L))
    }.reduce(_ + _)
    daily
      .withColumn("num", num).withColumn("den", den)
      .select(col("event_type"), col("t"), col("x"),
        expr("num * 1000 div den").as("ewma_milli"),
        (abs(col("x") * col("den") - col("num")) * 4 > col("num")).as("anomaly"))
      .orderBy("event_type", "t")
  }

  /** Holt linear-trend (double exponential smoothing) over the per-type
   * daily count series, ENTIRELY integer: level/trend carried in micro
   * units, α = 1/5 and β = 1/10 staged as exact integer operations
   * (α·x·10⁶ = x·200000; (1−α)(l+b) = (l+b)·4 div 5;
   * β(l−l') = Δl div 10; (1−β)b = b·9 div 10 — both engines truncate
   * toward zero, including on a negative trend, verified). Init is the
   * standard l₁ = x₁, b₁ = x₂−x₁; one update per day from day 2. The
   * fold runs as an `aggregate` higher-order function over the sorted
   * per-type day array — the series is the BOUNDED daily table
   * (days × types, same justification as q282/q233), never the fact
   * table, so the collect_list is a few hundred longs per group; the
   * oracle replays the identical recurrence as a recursive CTE.
   * Output: final level/trend and the h = 7 forecast l + 7b, all micro.
   * Magnitudes: l ≤ x·10⁶ ≈ 10¹¹ at 100× harness scale; ×4 staging
   * keeps everything far inside int64. */
  val q293HoltTrend: Q = Q("q293_holt_trend",
    """WITH RECURSIVE dc AS (SELECT event_type,
              CAST(floor(epoch(ts) / 86400) AS BIGINT) AS t,
              CAST(count(*) AS BIGINT) AS x
            FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
            GROUP BY 1, 2),
       s AS (SELECT event_type,
               CAST(row_number() OVER (PARTITION BY event_type ORDER BY t) AS BIGINT) AS rn,
               x FROM dc),
       n AS (SELECT event_type, CAST(max(rn) AS BIGINT) AS n_days
             FROM s GROUP BY 1 HAVING max(rn) >= 2),
       rec AS (
         SELECT a.event_type, CAST(1 AS BIGINT) AS rn,
                a.x * 1000000 AS l, (b2.x - a.x) * 1000000 AS b
         FROM s a JOIN s b2 ON b2.event_type = a.event_type AND b2.rn = 2
         WHERE a.rn = 1
         UNION ALL
         SELECT r.event_type, r.rn + 1,
                nx.x * 200000 + ((r.l + r.b) * 4) // 5 AS l,
                (nx.x * 200000 + ((r.l + r.b) * 4) // 5 - r.l) // 10
                  + (r.b * 9) // 10 AS b
         FROM rec r JOIN s nx ON nx.event_type = r.event_type
                             AND nx.rn = r.rn + 1)
       SELECT r.event_type, n.n_days, r.l AS level_micro, r.b AS trend_micro,
              r.l + 7 * r.b AS forecast7_micro
       FROM rec r JOIN n ON n.event_type = r.event_type AND r.rn = n.n_days
       ORDER BY r.event_type""") { (s, d) =>
    table(s, d, "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"),
        (unix_timestamp(col("ts")) / 86400).cast("long").as("t"))
      .agg(count(lit(1)).as("x"))
      .groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("t"), col("x")))).as("sx"))
      .filter(size(col("sx")) >= 2)
      .withColumn("xs", expr("transform(sx, p -> p.x)"))
      .withColumn("st", expr(
        """aggregate(slice(xs, 2, size(xs) - 1),
             named_struct('l', xs[0] * 1000000L,
                          'b', (xs[1] - xs[0]) * 1000000L),
             (st, x) -> named_struct(
               'l', x * 200000L + ((st.l + st.b) * 4L) div 5L,
               'b', (x * 200000L + ((st.l + st.b) * 4L) div 5L - st.l) div 10L
                      + (st.b * 9L) div 10L))"""))
      .select(col("event_type"),
        size(col("xs")).cast("long").as("n_days"),
        col("st.l").as("level_micro"), col("st.b").as("trend_micro"),
        (col("st.l") + lit(7L) * col("st.b")).as("forecast7_micro"))
      .orderBy("event_type")
  }

  /** Split conformal prediction (90% target coverage, α = 0.1): folds
   * from md5₆₀(event_id) mod 4 — {0,1} fit the per-type OLS (exact
   * BIGINT normal equations, q136's round(·,4) coefficient contract),
   * fold 2 calibrates, fold 3 measures. The nonconformity score is the
   * re-integerized |residual| (milli), the conformal quantile is the
   * ⌈(n_cal+1)(1−α)⌉-th smallest calibration score — staged as
   * k = (9·(n_cal+1)+9) div 10 and picked by a cumulative walk over
   * the per-type (score → count) HISTOGRAM (bounded by distinct
   * residual values, the q167/q234 scale-safe quantile shape — never
   * a per-row rank window over the fact), and the held-out coverage
   * (fraction of fold-3 rows with score ≤ q̂) is reported in ppm:
   * distribution-free interval calibration, measured not assumed.
   * Exchangeability guarantees E[coverage] ≥ 90%; the oracle replays
   * fold assignment, fit, quantile pick, and coverage bit-exactly. */
  val q299Conformal: Q = Q("q299_conformal",
    s"""WITH e AS (SELECT event_type,
              ${graft.ops.Exprs.md5LongSql.format("event_id")} % 4 AS fold,
              CAST(hour(ts) AS BIGINT) AS x,
              CAST(round(value * 1000) AS BIGINT) AS y
            FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
       a AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(x*x) AS sxx,
                    sum(y) AS sy, sum(x*y) AS sxy
             FROM e WHERE fold <= 1 GROUP BY 1),
       cf AS (SELECT event_type,
                round(CAST(n*sxy - sx*sy AS DOUBLE) / (n*sxx - sx*sx), 4) AS slope_q,
                round(CAST(sy*sxx - sx*sxy AS DOUBLE) / (n*sxx - sx*sx), 4) AS intercept_q
              FROM a WHERE n*sxx - sx*sx <> 0),
       r AS (SELECT e.event_type, e.fold,
               abs(y - CAST(round(cf.slope_q * x + cf.intercept_q) AS BIGINT)) AS score
             FROM e JOIN cf ON e.event_type = cf.event_type
             WHERE e.fold >= 2),
       h AS (SELECT event_type, score, CAST(count(*) AS BIGINT) AS c
             FROM r WHERE fold = 2 GROUP BY 1, 2),
       hc AS (SELECT event_type, score,
                sum(c) OVER (PARTITION BY event_type ORDER BY score) AS cum
              FROM h),
       nc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal
              FROM r WHERE fold = 2 GROUP BY 1),
       kk AS (SELECT event_type, n_cal, (9*(n_cal+1)+9) // 10 AS k FROM nc),
       qh AS (SELECT hc.event_type, min(score) AS qhat_milli
              FROM hc JOIN kk ON hc.event_type = kk.event_type
              WHERE cum >= kk.k GROUP BY 1),
       t AS (SELECT r.event_type, CAST(count(*) AS BIGINT) AS n_test,
                    CAST(sum(CASE WHEN score <= qhat_milli THEN 1 ELSE 0 END) AS BIGINT) AS covered
             FROM r JOIN qh ON r.event_type = qh.event_type
             WHERE fold = 3 GROUP BY 1)
       SELECT t.event_type, kk.n_cal, t.n_test, qh.qhat_milli, t.covered,
              t.covered * 1000000 // t.n_test AS coverage_ppm
       FROM t JOIN qh ON t.event_type = qh.event_type
              JOIN kk ON t.event_type = kk.event_type
       ORDER BY t.event_type""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = table(s, d, "events")
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type"),
        (graft.ops.Exprs.md5Long(col("event_id")) % 4).as("fold"),
        hour(col("ts")).cast("long").as("x"),
        round(col("value") * 1000, 0).cast("long").as("y"))
      .localCheckpoint()
    val a = e.filter(col("fold") <= 1).groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"))
    val denom = col("n") * col("sxx") - col("sx") * col("sx")
    val cf = a.filter(denom =!= 0).select(col("event_type"),
      round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
        / denom, 4).as("slope_q"),
      round((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double")
        / denom, 4).as("intercept_q"))
    val r = e.filter(col("fold") >= 2)
      .join(broadcast(cf), "event_type")
      .select(col("event_type"), col("fold"),
        abs(col("y") - round(col("slope_q") * col("x") + col("intercept_q"), 0)
          .cast("long")).as("score"))
      .localCheckpoint()
    val nc = r.filter(col("fold") === 2).groupBy("event_type")
      .agg(count(lit(1)).as("n_cal"))
      .withColumn("k", expr("(9 * (n_cal + 1) + 9) div 10"))
    val hc = r.filter(col("fold") === 2)
      .groupBy("event_type", "score").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(
        Window.partitionBy("event_type").orderBy("score")))
    val qh = hc.join(broadcast(nc), "event_type")
      .filter(col("cum") >= col("k"))
      .groupBy("event_type").agg(min("score").as("qhat_milli"))
    r.filter(col("fold") === 3)
      .join(broadcast(qh), "event_type")
      .groupBy("event_type", "qhat_milli")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("score") <= col("qhat_milli"), 1L).otherwise(0L))
          .as("covered"))
      .join(broadcast(nc.select("event_type", "n_cal")), "event_type")
      .select(col("event_type"), col("n_cal"), col("n_test"),
        col("qhat_milli"), col("covered"),
        expr("covered * 1000000 div n_test").as("coverage_ppm"))
      .orderBy("event_type")
  }

  /** Weight-of-evidence / information-value feature encoding — the
   * credit-scoring categorical encoder: acctbal bucketed to fixed-width
   * bins (floor/1000, value-range-bounded), target = "customer placed
   * ≥ 10 orders", per-bin WOE = ln(smoothed good share / smoothed bad
   * share) in milli-nats (the q103/q104 round(ln·1000) contract;
   * Laplace +1/+16 smoothing keeps empty cells finite) and the IV
   * contribution (pg − pb)·woe staged as exact ppm × mnat integers.
   * One customer-keyed count join + one bin aggregate + one 1-row
   * broadcast total — the bin table is bounded by the value range at
   * any scale. */
  val q301WoeIv: Q = Q("q301_woe_iv",
    """WITH oc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_ord
            FROM orders GROUP BY 1),
       base AS (SELECT CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bucket,
                       (coalesce(oc.n_ord, 0) >= 10) AS good
                FROM customer LEFT JOIN oc ON oc.o_custkey = c_custkey),
       b AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_customers,
                    CAST(sum(CASE WHEN good THEN 1 ELSE 0 END) AS BIGINT) AS gb,
                    CAST(sum(CASE WHEN good THEN 0 ELSE 1 END) AS BIGINT) AS bb
             FROM base GROUP BY 1),
       t AS (SELECT CAST(sum(gb) AS BIGINT) AS gt, CAST(sum(bb) AS BIGINT) AS bt
             FROM b),
       w AS (SELECT bucket, n_customers, gb, bb,
               CAST(round(ln(((gb + 1.0) / (gt + 16)) / ((bb + 1.0) / (bt + 16)))
                          * 1000) AS BIGINT) AS woe_mnat,
               (gb + 1) * 1000000 // (gt + 16)
                 - (bb + 1) * 1000000 // (bt + 16) AS dp_ppm
             FROM b CROSS JOIN t)
       SELECT bucket, n_customers, gb AS n_good, bb AS n_bad, woe_mnat,
              dp_ppm * woe_mnat AS iv_contrib_nano
       FROM w ORDER BY bucket""") { (s, d) =>
    val oc = table(s, d, "orders").groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_ord"))
    val base = table(s, d, "customer")
      .join(oc, col("o_custkey") === col("c_custkey"), "left")
      .select(floor(col("c_acctbal") / 1000.0).cast("long").as("bucket"),
        (coalesce(col("n_ord"), lit(0L)) >= 10).as("good"))
    val b = base.groupBy("bucket")
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("good"), 1L).otherwise(0L)).as("gb"),
        sum(when(col("good"), 0L).otherwise(1L)).as("bb"))
    val t = b.agg(sum("gb").as("gt"), sum("bb").as("bt"))
    b.crossJoin(broadcast(t))
      .select(col("bucket"), col("n_customers"),
        col("gb").as("n_good"), col("bb").as("n_bad"),
        round(log(((col("gb") + 1.0) / (col("gt") + 16)) /
          ((col("bb") + 1.0) / (col("bt") + 16))) * 1000, 0)
          .cast("long").as("woe_mnat"),
        (expr("(gb + 1) * 1000000 div (gt + 16)")
          - expr("(bb + 1) * 1000000 div (bt + 16)")).as("dp_ppm"))
      .select(col("bucket"), col("n_customers"), col("n_good"), col("n_bad"),
        col("woe_mnat"), (col("dp_ppm") * col("woe_mnat")).as("iv_contrib_nano"))
      .orderBy("bucket")
  }

  /** Decision-stump induction — the best single split of q301's
   * scorecard feature by INFORMATION GAIN: candidate splits are the
   * (value-range-bounded) acctbal bucket boundaries, left/right label
   * counts come from one cumulative window over the bucket table
   * (never the fact table — the q167/q223 discipline), and the gain is
   * parent entropy minus size-weighted child entropies, all computed
   * from exact BIGINT counts with ONE sanctioned double step (the
   * `round(ln ·1000)` milli-nat convention q301 established). Top-5
   * splits by gain. This is the root-node computation of every
   * distributed decision-tree trainer (one pass per tree level). */
  val q311DecisionStump: Q = {
    // entropy of a (good g, total n) side in nats, 0 at the degenerate
    // edges — SAME textual formula in both engines so the double
    // arithmetic matches op for op
    def h(g: String, n: String) =
      s"""(CASE WHEN $g = 0 OR $g = $n THEN 0.0
           ELSE -($g*1.0/$n)*ln($g*1.0/$n) - (($n-$g)*1.0/$n)*ln(($n-$g)*1.0/$n) END)"""
    val ig = s"""CAST(round((${h("gt", "nt")}
                 - (nl*1.0/nt) * ${h("gl", "nl")}
                 - (nr*1.0/nt) * ${h("gr", "nr")}) * 1000, 0) AS BIGINT)"""
    Q("q311_decision_stump",
      s"""WITH oc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_ord
              FROM orders GROUP BY 1),
         base AS (SELECT CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bucket,
                         (coalesce(oc.n_ord, 0) >= 10) AS good
                  FROM customer LEFT JOIN oc ON oc.o_custkey = c_custkey),
         b AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(CASE WHEN good THEN 1 ELSE 0 END) AS BIGINT) AS g
               FROM base GROUP BY 1),
         c AS (SELECT bucket, CAST(sum(n) OVER win AS BIGINT) AS nl,
                      CAST(sum(g) OVER win AS BIGINT) AS gl
               FROM b WINDOW win AS (ORDER BY bucket)),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(g) AS BIGINT) AS gt
               FROM b),
         s AS (SELECT bucket AS split_bucket, nl, gl, nt - nl AS nr,
                      gt - gl AS gr, nt, gt
               FROM c CROSS JOIN t WHERE nl > 0 AND nt - nl > 0),
         ig AS (SELECT split_bucket, nl AS n_left, nr AS n_right,
                       gl AS good_left, gr AS good_right, $ig AS ig_mnat
                FROM s)
         SELECT split_bucket, n_left, n_right, good_left, good_right, ig_mnat,
                row_number() OVER (ORDER BY ig_mnat DESC, split_bucket) AS rnk
         FROM ig QUALIFY rnk <= 5 ORDER BY rnk""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val oc = table(s, d, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_ord"))
      val b = table(s, d, "customer")
        .join(oc, col("o_custkey") === col("c_custkey"), "left")
        .select(floor(col("c_acctbal") / 1000.0).cast("long").as("bucket"),
          (coalesce(col("n_ord"), lit(0L)) >= 10).as("good"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          sum(when(col("good"), 1L).otherwise(0L)).as("g"))
      // cumulative + totals over the BUCKET table (value-range bounded)
      val win = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = b.select(col("bucket"),
        sum("n").over(win).as("nl"), sum("g").over(win).as("gl"))
      val t = b.agg(sum("n").as("nt"), sum("g").as("gt"))
      c.crossJoin(broadcast(t))
        .filter(col("nl") > 0 && col("nt") - col("nl") > 0)
        .select(col("bucket").as("split_bucket"), col("nl"), col("gl"),
          (col("nt") - col("nl")).as("nr"), (col("gt") - col("gl")).as("gr"),
          col("nt"), col("gt"))
        .select(col("split_bucket"), col("nl").as("n_left"),
          col("nr").as("n_right"), col("gl").as("good_left"),
          col("gr").as("good_right"), expr(ig).as("ig_mnat"))
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("ig_mnat").desc, col("split_bucket"))).cast("long"))
        .filter(col("rnk") <= 5)
        .orderBy("rnk")
    }
  }

  /** Leakage-safe target encoding — the tabular-ML categorical encoder
   * (mean target per category) made safe for training: each customer's
   * nation is encoded from the OTHER two folds only (fold =
   * md5₆₀(c_custkey) mod 3, q298's reproducible assignment; encoding =
   * totals − own fold, so one aggregate pass serves all folds with no
   * rescans), add-one smoothed and emitted in exact ppm. A row can
   * never see its own label in its feature — the leakage q298-style CV
   * would otherwise silently reward. One customer scan + one orders
   * aggregate; output is category × fold bounded. */
  val q313TargetEncoding: Q = Q("q313_target_encoding",
    s"""WITH oc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_ord
            FROM orders GROUP BY 1),
       base AS (SELECT c_nationkey,
                  ${graft.ops.Exprs.md5LongSql.format("c_custkey")} % 3 AS fold,
                  CASE WHEN coalesce(oc.n_ord, 0) >= 10 THEN 1 ELSE 0 END AS good
                FROM customer LEFT JOIN oc ON oc.o_custkey = c_custkey),
       fm AS (SELECT c_nationkey, fold, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(good) AS BIGINT) AS g
              FROM base GROUP BY 1, 2),
       tm AS (SELECT c_nationkey, CAST(sum(n) AS BIGINT) AS tn,
                     CAST(sum(g) AS BIGINT) AS tg
              FROM fm GROUP BY 1)
       SELECT fm.c_nationkey AS nationkey, fm.fold,
              tn - n AS n_oof, tg - g AS g_oof,
              (tg - g + 1) * 1000000 // (tn - n + 2) AS enc_ppm
       FROM fm JOIN tm ON fm.c_nationkey = tm.c_nationkey
       ORDER BY nationkey, fold""") { (s, d) =>
    val oc = table(s, d, "orders").groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_ord"))
    val fm = table(s, d, "customer")
      .join(oc, col("o_custkey") === col("c_custkey"), "left")
      .select(col("c_nationkey"),
        (graft.ops.Exprs.md5Long(col("c_custkey")) % 3).as("fold"),
        when(coalesce(col("n_ord"), lit(0L)) >= 10, 1L).otherwise(0L)
          .as("good"))
      .groupBy("c_nationkey", "fold")
      .agg(count(lit(1)).as("n"), sum("good").as("g"))
    val tm = fm.groupBy("c_nationkey")
      .agg(sum("n").as("tn"), sum("g").as("tg"))
      .withColumnRenamed("c_nationkey", "nk")
    fm.join(broadcast(tm), col("c_nationkey") === col("nk"))
      .select(col("c_nationkey").as("nationkey"), col("fold"),
        (col("tn") - col("n")).as("n_oof"),
        (col("tg") - col("g")).as("g_oof"),
        expr("(tg - g + 1) * 1000000 div (tn - n + 2)").as("enc_ppm"))
      .orderBy("nationkey", "fold")
  }

  /** Depth-2 decision-tree scorecard with a held-out-fold verdict — the
   * tabular-ML kit composed end-to-end (round-8 verdict task #8): the
   * root split is q311's exact information-gain search over acctbal
   * buckets; each child then gets the OPTIMAL CATEGORICAL split on
   * nation via the Breiman ordering (sort categories by train good
   * rate, scan prefix cuts — optimal for binary targets, and exactly
   * replayable because the rate is integer ppm with nk tie-break);
   * training uses folds ≠ 0 of q298/q313's md5 fold assignment and
   * fold 0 is the held-out verdict (per-leaf test counts + majority-
   * vote correctness). Nations unseen in a child's training data route
   * to its right sub-leaf (the deterministic unseen-category rule).
   * All counts BIGINT; the only doubles are q311's sanctioned
   * round(entropy·1000) milli-nat step, textually identical in both
   * engines. Scale shape: ONE customer scan (the base projection is
   * localCheckpointed and feeds root search, child search, and test
   * eval), one orders aggregate; everything after the two fact
   * aggregates is bucket- or nation-bounded. */
  val q317TreeScorecard: Q = {
    def h(g: String, n: String) =
      s"""(CASE WHEN $g = 0 OR $g = $n THEN 0.0
           ELSE -($g*1.0/$n)*ln($g*1.0/$n) - (($n-$g)*1.0/$n)*ln(($n-$g)*1.0/$n) END)"""
    val ig = s"""CAST(round((${h("gt", "nt")}
                 - (nl*1.0/nt) * ${h("gl", "nl")}
                 - (nr*1.0/nt) * ${h("gr", "nr")}) * 1000, 0) AS BIGINT)"""
    Q("q317_tree_scorecard",
      s"""WITH oc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_ord
              FROM orders GROUP BY 1),
         base AS (SELECT CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bucket,
                    c_nationkey AS nk,
                    ${graft.ops.Exprs.md5LongSql.format("c_custkey")} % 3 AS fold,
                    CASE WHEN coalesce(oc.n_ord, 0) >= 10 THEN 1 ELSE 0 END AS good
                  FROM customer LEFT JOIN oc ON oc.o_custkey = c_custkey),
         tr AS (SELECT * FROM base WHERE fold <> 0),
         b AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(good) AS BIGINT) AS g FROM tr GROUP BY 1),
         c AS (SELECT bucket, CAST(sum(n) OVER win AS BIGINT) AS nl,
                      CAST(sum(g) OVER win AS BIGINT) AS gl
               FROM b WINDOW win AS (ORDER BY bucket)),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(g) AS BIGINT) AS gt
               FROM b),
         root AS (SELECT bucket AS s1,
                    row_number() OVER (ORDER BY $ig DESC, bucket) AS r
                  FROM (SELECT bucket, nl, gl, nt - nl AS nr, gt - gl AS gr, nt, gt
                        FROM c CROSS JOIN t WHERE nl > 0 AND nt - nl > 0)
                  QUALIFY r = 1),
         nbl AS (SELECT CASE WHEN tr.bucket <= root.s1 THEN 'L' ELSE 'R' END AS side,
                        nk, CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(good) AS BIGINT) AS g
                 FROM tr CROSS JOIN root GROUP BY 1, 2),
         nrk AS (SELECT side, nk, n, g,
                   CAST(row_number() OVER (
                     PARTITION BY side ORDER BY g * 1000000 // n, nk) AS BIGINT) AS rk
                 FROM nbl),
         ncum AS (SELECT side, rk, CAST(sum(n) OVER w AS BIGINT) AS nl,
                         CAST(sum(g) OVER w AS BIGINT) AS gl
                  FROM nrk WINDOW w AS (PARTITION BY side ORDER BY rk)),
         st AS (SELECT side, CAST(sum(n) AS BIGINT) AS nt,
                       CAST(sum(g) AS BIGINT) AS gt FROM nbl GROUP BY 1),
         sp2 AS (SELECT side, rk AS cut_rk,
                   row_number() OVER (PARTITION BY side ORDER BY $ig DESC, rk) AS r
                 FROM (SELECT ncum.side, rk, nl, gl, nt - nl AS nr, gt - gl AS gr, nt, gt
                       FROM ncum JOIN st ON ncum.side = st.side
                       WHERE nl > 0 AND nt - nl > 0)
                 QUALIFY r = 1),
         leafdef AS (SELECT nrk.side, nrk.nk,
                       CASE WHEN nrk.rk <= sp2.cut_rk THEN 'L' ELSE 'R' END AS sub
                     FROM nrk JOIN sp2 ON nrk.side = sp2.side),
         trleaf AS (SELECT l.side, l.sub, CAST(sum(nbl.n) AS BIGINT) AS n_train,
                           CAST(sum(nbl.g) AS BIGINT) AS g_train
                    FROM leafdef l JOIN nbl ON nbl.side = l.side AND nbl.nk = l.nk
                    GROUP BY 1, 2),
         teleaf AS (SELECT t.side, coalesce(l.sub, 'R') AS sub,
                           CAST(count(*) AS BIGINT) AS n_test,
                           CAST(sum(t.good) AS BIGINT) AS g_test
                    FROM (SELECT CASE WHEN base.bucket <= root.s1 THEN 'L' ELSE 'R' END AS side,
                                 nk, good
                          FROM base CROSS JOIN root WHERE fold = 0) t
                    LEFT JOIN leafdef l ON l.side = t.side AND l.nk = t.nk
                    GROUP BY 1, 2)
         SELECT tl.side, tl.sub, root.s1 AS root_split_bucket,
                sp2.cut_rk AS nation_cut_rank, tl.n_train, tl.g_train,
                (tl.g_train + 1) * 1000000 // (tl.n_train + 2) AS score_ppm,
                coalesce(te.n_test, 0) AS n_test,
                CASE WHEN 2 * tl.g_train > tl.n_train
                     THEN coalesce(te.g_test, 0)
                     ELSE coalesce(te.n_test, 0) - coalesce(te.g_test, 0)
                END AS n_correct_test
         FROM trleaf tl
         CROSS JOIN root
         JOIN sp2 ON sp2.side = tl.side
         LEFT JOIN teleaf te ON te.side = tl.side AND te.sub = tl.sub
         ORDER BY tl.side, tl.sub""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val oc = table(s, d, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_ord"))
      // ONE customer scan; checkpointed base feeds root search, child
      // search, and the held-out eval (the q298 discipline)
      val base = table(s, d, "customer")
        .join(oc, col("o_custkey") === col("c_custkey"), "left")
        .select(floor(col("c_acctbal") / 1000.0).cast("long").as("bucket"),
          col("c_nationkey").as("nk"),
          (graft.ops.Exprs.md5Long(col("c_custkey")) % 3).as("fold"),
          when(coalesce(col("n_ord"), lit(0L)) >= 10, 1L).otherwise(0L)
            .as("good"))
        .localCheckpoint()
      val tr = base.filter(col("fold") =!= 0)
      val b = tr.groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum("good").as("g"))
      val cumB = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = b.select(col("bucket"),
        sum("n").over(cumB).as("nl"), sum("g").over(cumB).as("gl"))
      val t = b.agg(sum("n").as("nt"), sum("g").as("gt"))
      val root = c.crossJoin(broadcast(t))
        .filter(col("nl") > 0 && col("nt") - col("nl") > 0)
        .select(col("bucket"), col("nl"), col("gl"),
          (col("nt") - col("nl")).as("nr"), (col("gt") - col("gl")).as("gr"),
          col("nt"), col("gt"))
        .withColumn("r", row_number().over(
          Window.orderBy(expr(ig).desc, col("bucket"))))
        .filter(col("r") === 1).select(col("bucket").as("s1"))
      val nbl = tr.crossJoin(broadcast(root))
        .select(when(col("bucket") <= col("s1"), "L").otherwise("R").as("side"),
          col("nk"), col("good"))
        .groupBy("side", "nk")
        .agg(count(lit(1)).as("n"), sum("good").as("g"))
      val nrk = nbl.withColumn("rk", row_number().over(
        Window.partitionBy("side")
          .orderBy(expr("g * 1000000 div n"), col("nk"))).cast("long"))
      val cumS = Window.partitionBy("side").orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ncum = nrk.select(col("side"), col("rk"),
        sum("n").over(cumS).as("nl"), sum("g").over(cumS).as("gl"))
      val st = nbl.groupBy("side").agg(sum("n").as("nt"), sum("g").as("gt"))
      val sp2 = ncum.join(broadcast(st), "side")
        .filter(col("nl") > 0 && col("nt") - col("nl") > 0)
        .select(col("side"), col("rk"), col("nl"), col("gl"),
          (col("nt") - col("nl")).as("nr"), (col("gt") - col("gl")).as("gr"),
          col("nt"), col("gt"))
        .withColumn("r", row_number().over(
          Window.partitionBy("side").orderBy(expr(ig).desc, col("rk"))))
        .filter(col("r") === 1).select(col("side"), col("rk").as("cut_rk"))
      val leafdef = nrk.join(broadcast(sp2), "side")
        .select(col("side"), col("nk"),
          when(col("rk") <= col("cut_rk"), "L").otherwise("R").as("sub"))
      val trleaf = leafdef.join(nbl, Seq("side", "nk"))
        .groupBy("side", "sub")
        .agg(sum("n").as("n_train"), sum("g").as("g_train"))
      val teleaf = base.filter(col("fold") === 0)
        .crossJoin(broadcast(root))
        .select(when(col("bucket") <= col("s1"), "L").otherwise("R").as("side"),
          col("nk"), col("good"))
        .join(broadcast(leafdef), Seq("side", "nk"), "left")
        .select(col("side"), coalesce(col("sub"), lit("R")).as("sub"), col("good"))
        .groupBy("side", "sub")
        .agg(count(lit(1)).as("n_test"), sum("good").as("g_test"))
      trleaf.crossJoin(broadcast(root))
        .join(broadcast(sp2), "side")
        .join(broadcast(teleaf), Seq("side", "sub"), "left")
        .select(col("side"), col("sub"), col("s1").as("root_split_bucket"),
          col("cut_rk").as("nation_cut_rank"), col("n_train"), col("g_train"),
          expr("(g_train + 1) * 1000000 div (n_train + 2)").as("score_ppm"),
          coalesce(col("n_test"), lit(0L)).as("n_test"),
          when(lit(2) * col("g_train") > col("n_train"),
            coalesce(col("g_test"), lit(0L)))
            .otherwise(coalesce(col("n_test"), lit(0L)) -
              coalesce(col("g_test"), lit(0L))).as("n_correct_test"))
        .orderBy("side", "sub")
    }
  }

  val all: Seq[Q] = Seq(q167SkewReport, q168QuantileNorm, q169MadOutliers,
    q266TheilSen, q267Mase, q282EwmaAnomaly, q293HoltTrend, q299Conformal,
    q301WoeIv,
    q170BenfordAudit, q171RepetitionSignals, q172EmbeddingHealth,
    q173TreeRollup, q174MovingMedian, q175PathMining, q176CorpusDrift,
    q177ChiSquare, q178HllRegisters, q179InvertedIndex,
    q180JoinSizeEstimate, q182GapInterpolation, q183CurationPipeline,
    q184RangeFrame, q185UnpivotRoundtrip, q186PointInTime,
    q187StreamCountMin, q222KmeansLloyd, q223KsTest, q224MannWhitney,
    q226Calibration, q233StlDecompose, q234WeightedQuantiles, q304Silhouette,
    q311DecisionStump, q313TargetEncoding, q317TreeScorecard)
}
