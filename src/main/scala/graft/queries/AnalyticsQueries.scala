package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Sources.table
import graft.curation.Curation
import graft.ops.Funnel
import graft.text.{Search, TextAnalysis}

/**
 * Round-5 analytics operators: ordered funnels, cohort retention,
 * weighted sampling without replacement, TF-IDF keyword extraction, PMI
 * collocations, and incremental stream-CDC apply. Oracles replay the
 * full arithmetic (md5 uniforms, integer milli-nat quantization) so the
 * semantics are hash-checked.
 */
object AnalyticsQueries {

  // ----------------------------------------------------------------- funnel

  /** Ordered view→click→purchase funnel: stage k counts users whose
   * earliest stage-k event is at-or-after their stage k-1 entry. The
   * chained min(when) windows all share the user partitioning (one
   * exchange); the oracle replays the same window chain. */
  val q100Funnel: Q = Q("q100_funnel",
    """WITH e AS (SELECT user_id, event_type,
                         CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
       w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN sec END)
                          OVER (PARTITION BY user_id) AS f0 FROM e),
       w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND sec >= f0 THEN sec END)
                          OVER (PARTITION BY user_id) AS f1 FROM w1),
       w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND sec >= f1 THEN sec END)
                          OVER (PARTITION BY user_id) AS f2 FROM w2),
       d AS (SELECT DISTINCT user_id, f0, f1, f2 FROM w3)
       SELECT 'stage1_view' AS stage, count(f0) AS n_users FROM d
       UNION ALL SELECT 'stage2_click', count(f1) FROM d
       UNION ALL SELECT 'stage3_purchase', count(f2) FROM d
       ORDER BY stage""") { (s, d) =>
    val staged = Funnel.stageTimes(
      table(s, d, "events")
        .select(col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("sec")),
      "user_id", "sec", "event_type", Seq("view", "click", "purchase"))
    staged.select("user_id", "f0", "f1", "f2").distinct()
      .agg(count("f0").as("n0"), count("f1").as("n1"), count("f2").as("n2"))
      .selectExpr("""stack(3,
        'stage1_view', n0, 'stage2_click', n1, 'stage3_purchase', n2)
        AS (stage, n_users)""")
      .orderBy("stage")
  }

  // ------------------------------------------------------- cohort retention

  /** Weekly cohort retention matrix (first-event week × week offset,
   * distinct active users) — bounded by weeks², not events. */
  val q101CohortRetention: Q = Q("q101_cohort_retention",
    """WITH e AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
       f AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY user_id),
       a AS (SELECT DISTINCT e.user_id, cohort,
                    CAST((epoch(wk) - epoch(cohort)) // 604800 AS BIGINT) AS week_offset
             FROM e JOIN f USING (user_id))
       SELECT strftime(cohort, '%Y-%m-%d') AS cohort, week_offset,
              count(*) AS n_users
       FROM a WHERE week_offset <= 8 GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
    Funnel.cohortRetention(table(s, d, "events"), "user_id", "ts", maxWeeks = 8)
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        col("week_offset"), col("n_users"))
      .orderBy("cohort", "week_offset")
  }

  // ------------------------------------------------------- weighted sample

  /** Quality-weighted sample without replacement (Efraimidis–Spirakis
   * exponential keys, md5-derived uniforms, integer micro-nat ranking):
   * the 20 docs sampled ∝ (quality + 0.1). The oracle replays the
   * uniform, the weight, and the key arithmetic exactly. */
  val q102WeightedSample: Q = Q("q102_weighted_sample",
    s"""WITH ${ScaleQueries.qualityCte},
       s AS (SELECT doc_id, score,
               CAST(round(-ln(((('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT
                                % 10000) + 0.5) / 10000.0)
                    / (score + 0.1) * 1e6) AS BIGINT) AS wkey
             FROM q)
       SELECT doc_id, score, wkey,
              row_number() OVER (ORDER BY wkey, doc_id) AS rank
       FROM s QUALIFY rank <= 20 ORDER BY rank""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    Curation.weightedSampleTopK(
        table(s, d, "documents")
          .select(col("doc_id"),
            TextAnalysis.qualityScore(col("text")).as("score")),
        "doc_id", weight = col("score") + 0.1, k = 20)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("wkey").asc, col("doc_id").asc))
          .cast("long"))
      .select("doc_id", "score", "wkey", "rank")
      .orderBy("rank")
  }

  // ------------------------------------------------------- TF-IDF keywords

  /** TF-IDF keyword extraction: top-3 terms per doc (idf over the FULL
   * corpus, integer tf × milli-nat idf scores) for the q-slice. */
  val q103TfidfKeywords: Q = Q("q103_tfidf_keywords",
    """WITH tok AS (SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
         FROM documents),
       tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
       df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
       n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
       sc AS (SELECT doc_id, token, tf,
                CAST(round(ln(nd / CAST(df AS DOUBLE)) * 1000) AS BIGINT) AS idf_mnat
              FROM tf JOIN df USING (token) CROSS JOIN n),
       r AS (SELECT doc_id, token, tf, idf_mnat,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tf * idf_mnat DESC, token) AS rank
             FROM sc)
       SELECT doc_id, CAST(rank AS BIGINT) AS rank, token,
              CAST(tf AS BIGINT) AS tf, idf_mnat,
              CAST(tf * idf_mnat AS BIGINT) AS score_m
       FROM r WHERE doc_id < 60 AND rank <= 3 ORDER BY doc_id, rank""") { (s, d) =>
    // shared tokenized view + doc slice pushed into the operator: the
    // rank window sees only the requested docs, never the whole corpus
    Search.tfidfTopTermsFromTokens(graft.text.TokenizedCorpus(s, d), k = 3,
        docFilter = Some(col("doc_id") < 60))
      .select("doc_id", "rank", "token", "tf", "idf_mnat", "score_m")
      .orderBy("doc_id", "rank")
  }

  // ---------------------------------------------------- PMI collocations

  /** Top-30 PMI bigram collocations (marginals over the bigram table,
   * min count 5, integer milli-nat PMI) — the association-mining
   * operator; the oracle rebuilds both marginals and the quantized PMI. */
  val q104Pmi: Q = Q("q104_pmi",
    """WITH tok AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS w
                    FROM documents),
       bg AS (SELECT unnest(list_transform(range(1, len(w)), k -> w[k]||' '||w[k+1])) AS bg
              FROM tok WHERE len(w) >= 2),
       c AS (SELECT bg, count(*) AS c12 FROM bg GROUP BY bg),
       m1 AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c12) AS c1 FROM c GROUP BY 1),
       m2 AS (SELECT split_part(bg, ' ', 2) AS w2, sum(c12) AS c2 FROM c GROUP BY 1),
       n AS (SELECT CAST(sum(c12) AS BIGINT) AS nb FROM c),
       p AS (SELECT bg, c12,
               CAST(round(ln(CAST(c12 AS DOUBLE) * nb / (CAST(c1 AS DOUBLE) * c2)) * 1000) AS BIGINT) AS pmi_mnat
             FROM c JOIN m1 ON split_part(c.bg, ' ', 1) = m1.w1
                    JOIN m2 ON split_part(c.bg, ' ', 2) = m2.w2
                    CROSS JOIN n
             WHERE c12 >= 5)
       SELECT bg AS bigram, CAST(c12 AS BIGINT) AS n, pmi_mnat,
              row_number() OVER (ORDER BY pmi_mnat DESC, bg) AS rank
       FROM p QUALIFY rank <= 30 ORDER BY rank""") { (s, d) =>
    Curation.pmiTopKFromTokens(graft.text.TokenizedCorpus(s, d),
        minCount = 5, k = 30)
      .orderBy("rank")
  }

  // ----------------------------------------------------- stream CDC apply

  /** Incremental latest-wins CDC apply: the event log streamed in 4
   * micro-batches, each folded into the keyed target via the
   * commutative max-merge; the final per-user latest-event table is
   * rolled up by event type and hash-checked against the batch
   * argmax truth. */
  val q105StreamUpsert: Q = Q("q105_stream_upsert",
    """WITH e AS (SELECT user_id, event_id, event_type,
                         CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
       r AS (SELECT user_id, event_type,
                    row_number() OVER (PARTITION BY user_id
                                       ORDER BY sec DESC, event_id DESC) AS rn
             FROM e)
       SELECT event_type, count(*) AS n_users
       FROM r WHERE rn = 1 GROUP BY 1 ORDER BY 1""") { (s, d) =>
    graft.streaming.StreamingUpsert.runLatestWinsToBatch(s, d, nFiles = 4)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("event_type")
  }

  /** Retraction-aware streaming CDC ([[graft.streaming.StreamingUpsert
   * .runCdcDeletesToBatch]]): the change stream carries upserts AND
   * deletions (event_id % 7 = 0 → 'D'), folded per micro-batch by the
   * op-carrying latest-wins max-merge; the materialized view is the
   * keys whose LATEST change is an upsert — a delete retracts its key
   * unless a later upsert re-creates it. The oracle replays the
   * changelog contract as a window argmax over the same derived ops,
   * keeps rn = 1 upserts, and rolls the view up by user decile with an
   * order-proof md5₆₀ key XOR — so both the retraction semantics and
   * the surviving values are hash-checked against batch truth. */
  val q321StreamCdcDelete: Q = Q("q321_stream_cdc_delete",
    s"""WITH c AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                event_id,
                CASE WHEN event_id % 7 = 0 THEN 'D' ELSE 'U' END AS op,
                CAST(round(value * 1000) AS BIGINT) AS v
            FROM events WHERE value IS NOT NULL),
       r AS (SELECT user_id, op, v,
                    row_number() OVER (PARTITION BY user_id
                                       ORDER BY sec DESC, event_id DESC,
                                                op DESC, v DESC) AS rn
             FROM c)
       SELECT user_id % 10 AS decile, CAST(count(*) AS BIGINT) AS n_users,
              CAST(sum(v) AS BIGINT) AS v_sum,
              CAST(bit_xor(${graft.ops.Exprs.md5LongSql.format("user_id")}) AS BIGINT) AS key_xor
       FROM r WHERE rn = 1 AND op = 'U'
       GROUP BY 1 ORDER BY 1""") { (s, d) =>
    graft.streaming.StreamingUpsert.runCdcDeletesToBatch(s, d, nFiles = 4)
      .withColumn("h", graft.ops.Exprs.md5Long(col("user_id")))
      .groupBy((col("user_id") % 10).as("decile"))
      .agg(count(lit(1)).as("n_users"), sum("v").as("v_sum"),
        expr("bit_xor(h)").as("key_xor"))
      .orderBy("decile")
  }

  // ------------------------------------------------- sliding stream windows

  /** Sliding event-time windows (2 h / 30 min slide) over the January
   * slice: every event lands in exactly 4 overlapping windows. The
   * oracle replays the window algebra as integer arithmetic
   * (`((sec // 1800) - k) * 1800`, k ∈ 0..3) over the same slice —
   * the streaming output is hash-checked against window math, not
   * another Spark run. 1706745600 = 2024-02-01 UTC. */
  val q106StreamSliding: Q = Q("q106_stream_sliding",
    """WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec
                  FROM events
                  WHERE CAST(floor(epoch(ts)) AS BIGINT) < 1706745600),
       x AS (SELECT event_type, ((sec // 1800) - k) * 1800 AS window_epoch
             FROM e CROSS JOIN (SELECT unnest(range(0, 4)) AS k))
       SELECT window_epoch, event_type, count(*) AS n
       FROM x GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
    graft.streaming.StreamingDemand.runSlidingToBatch(s, d, maxTs = 1706745600L)
      .orderBy("window_epoch", "event_type")
  }

  /** Watermark late-data drop accounting
   * ([[graft.streaming.StreamingDemand.runLateDropToBatch]]): the
   * events table arrives in two controlled waves (odd event_ids, then
   * even), so the append-mode hourly aggregation actually exercises
   * Spark's late-row drop — windows closed by the wave-1 watermark
   * (end ≤ max(wave-1 ts) − 1 h) reject their wave-2 rows, and only
   * windows closed by the final watermark are emitted at all. The
   * oracle replays that exact arithmetic from the two wave maxima:
   * what the stream DROPPED is pinned by the hash, not just what it
   * kept. */
  val q297StreamLateDrop: Q = Q("q297_stream_late_drop",
    """WITH e AS (SELECT event_id,
              CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS sec,
              event_type
            FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
       wm AS (SELECT (SELECT max(sec) FROM e WHERE event_id % 2 = 1) - 3600 AS wm1,
                     (SELECT max(sec) FROM e) - 3600 AS wm2),
       keep AS (SELECT sec, event_type FROM e, wm
                WHERE event_id % 2 = 1
                   OR (sec // 3600) * 3600 + 3600 > wm1),
       agg AS (SELECT (sec // 3600) * 3600 AS ws_sec, event_type,
                      CAST(count(*) AS BIGINT) AS n
               FROM keep GROUP BY 1, 2)
       SELECT ws_sec, event_type, n FROM agg, wm
       WHERE ws_sec + 3600 <= wm2
       ORDER BY ws_sec, event_type""") { (s, d) =>
    graft.streaming.StreamingDemand.runLateDropToBatch(s, d)
      .orderBy("ws_sec", "event_type")
  }

  // ---------------------------------------------------------- SemDeDup

  /** Embedding semantic dedup (SemDeDup): seeded-k-means cells, greedy
   * keep-lowest-id within-cell drop at cosine ≥ 0.95. Centroids are
   * driver-trained (not SQL-expressible), so the hash gate carries the
   * replayable corpus count plus contract verdicts computed FROM the
   * decision table — partition exactness, keeper validity at the
   * threshold, cell bound; the quantitative semantics (planted
   * near-twins get dropped) are pinned in SimilaritySpec. */
  val q109SemDedup: Q = Q("q109_semdedup",
    """SELECT CAST(count(*) AS BIGINT) AS n_vecs, TRUE AS partition_ok,
              TRUE AS dropped_have_keeper, TRUE AS cells_bounded
       FROM embeddings""") { (s, d) =>
    graft.sim.Similarity.semDedup(table(s, d, "embeddings"),
        nClusters = 16, tauMicro = 950000L)
      .agg(count(lit(1)).as("n"),
        count(when(col("is_kept"), 1)).as("nk"),
        count(when(!col("is_kept"), 1)).as("nd"),
        min(when(!col("is_kept"), col("keeper_sim_micro"))).as("min_ks"),
        max("cluster").as("max_cell"))
      .select(col("n").as("n_vecs"),
        (col("nk") + col("nd") === col("n")).as("partition_ok"),
        coalesce(col("min_ks") >= 950000L, lit(true)).as("dropped_have_keeper"),
        (col("max_cell") < 16 && col("max_cell") >= 0).as("cells_bounded"))
  }

  // ------------------------------------------------- RANGE-frame window

  /** Calendar 7-DAY trailing revenue (RANGE frame on an integer day
   * index) — distinct from q84's ROWS frame: missing days shrink the
   * window instead of reaching further back. Money stays DECIMAL until
   * the integer micro-unit division (q84's determinism rule). */
  val q110RangeWindow: Q = Q("q110_range_window",
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
           FROM orders WHERE o_orderdate >= DATE '1998-01-01' GROUP BY 1),
       i AS (SELECT d, rev, date_diff('day', DATE '1970-01-01', d) AS di FROM daily),
       r AS (SELECT d,
               CAST(round(rev, 2) AS DOUBLE) AS revenue,
               CAST(sum(rev) OVER w * 1000000 AS BIGINT) AS rs_micro,
               count(*) OVER w AS n_days
             FROM i
             WINDOW w AS (ORDER BY di RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
       SELECT strftime(d, '%Y-%m-%d') AS day, revenue,
              CAST(rs_micro // n_days AS DOUBLE) / 1e6 AS avg_7d, n_days
       FROM r ORDER BY day""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("di").rangeBetween(-6, Window.currentRow)
    table(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1998-01-01"))
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("rev"))
      .withColumn("di", datediff(col("d"), to_date(lit("1970-01-01"))))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        round(col("rev"), 2).cast("double").as("revenue"),
        (sum("rev").over(w) * 1000000).cast("long").as("rs_micro"),
        count(lit(1)).over(w).as("n_days"))
      .selectExpr("day", "revenue",
        "CAST(rs_micro div n_days AS DOUBLE) / 1e6 AS avg_7d", "n_days")
      .orderBy("day")
  }

  // --------------------------------------------------- MAD outlier flags

  /** Robust outlier detection per event type: median ± 3×MAD over daily
   * counts (median absolute deviation — outlier-proof where stddev is
   * not). Both medians use the q85-proven interpolated-percentile
   * parity; the flag compares integers scaled by the doubled medians. */
  val q111MadOutliers: Q = Q("q111_mad_outliers",
    """WITH daily AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             count(*) AS n FROM events GROUP BY 1, 2),
       med AS (SELECT event_type, quantile_cont(n, 0.5) AS med
               FROM daily GROUP BY event_type),
       dev AS (SELECT d.event_type, d.n, m.med, abs(d.n - m.med) AS ad
               FROM daily d JOIN med m USING (event_type)),
       mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
               FROM dev GROUP BY event_type)
       SELECT d.event_type,
              CAST(count(*) AS BIGINT) AS n_days,
              round(first(d.med), 2) AS med,
              round(first(ma.mad), 2) AS mad,
              CAST(count(*) FILTER (WHERE abs(d.n - d.med) > 3 * ma.mad) AS BIGINT) AS n_outliers
       FROM dev d JOIN mad ma USING (event_type)
       GROUP BY d.event_type ORDER BY d.event_type""") { (s, d) =>
    // the daily aggregate is bounded (days × types) and feeds FOUR
    // consumers (med, dev, mad, flag) — materialize it once or the plan
    // re-scans events per consumer (caught by PlanQualitySpec's ≤2-scan
    // invariant)
    val daily = table(s, d, "events")
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val med = daily.groupBy("event_type")
      .agg(expr("percentile(n, 0.5)").as("med"))
    val dev = daily.join(med, "event_type")
      .withColumn("ad", abs(col("n") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(ad, 0.5)").as("mad"))
    dev.join(mad, "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        round(first("med"), 2).as("med"),
        round(first("mad"), 2).as("mad"),
        count(when(abs(col("n") - col("med")) > col("mad") * 3, 1))
          .as("n_outliers"))
      .orderBy("event_type")
  }

  // -------------------------------------------------- distribution entropy

  /** Shannon entropy of the source mix within each language (integer
   * milli-nat terms — the mixture-diversity health metric for corpus
   * balancing). */
  val q112Entropy: Q = Q("q112_entropy",
    """WITH c AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
       t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY lang),
       e AS (SELECT c.lang, c.n, t.tot,
               CAST(round(-(c.n / CAST(t.tot AS DOUBLE))
                    * ln(c.n / CAST(t.tot AS DOUBLE)) * 1000) AS BIGINT) AS term_mnat
             FROM c JOIN t USING (lang))
       SELECT lang, CAST(count(*) AS BIGINT) AS n_sources,
              CAST(sum(term_mnat) AS BIGINT) AS entropy_mnat
       FROM e GROUP BY lang ORDER BY lang""") { (s, d) =>
    val c = table(s, d, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
    val t = c.groupBy("lang").agg(sum("n").as("tot"))
    c.join(t, "lang")
      .withColumn("p", col("n") / col("tot").cast("double"))
      .withColumn("term_mnat", round(-col("p") * log(col("p")) * 1000.0, 0).cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sources"), sum("term_mnat").as("entropy_mnat"))
      .orderBy("lang")
  }

  // ---------------------------------------------------- ordered list agg

  /** Ordered array aggregation: each user's first three event types in
   * time order, as a joined string — the collect_list/sort_array
   * surface (pandas' groupby-apply list idiom) made deterministic via
   * the (sec, event_id) total order. */
  val q113OrderedList: Q = Q("q113_ordered_list",
    """WITH e AS (SELECT user_id, event_type, event_id,
                         CAST(floor(epoch(ts)) AS BIGINT) AS sec
                  FROM events WHERE user_id < 200 AND ts IS NOT NULL)
       SELECT user_id,
              array_to_string(
                (list(event_type ORDER BY sec, event_id))[1:3], ',') AS first3
       FROM e GROUP BY user_id ORDER BY user_id""") { (s, d) =>
    // ts IS NOT NULL on both sides: a null-sec struct sorts FIRST in
    // Spark's sort_array but LAST in DuckDB's ORDER BY — it would take
    // slot 1 of first3 in one engine and be excluded in the other
    table(s, d, "events")
      .filter(col("user_id") < 200 && col("ts").isNotNull)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"))
      .groupBy("user_id")
      .agg(array_join(
        transform(
          slice(sort_array(collect_list(struct(col("sec"), col("event_id"),
            col("event_type")))), 1, 3),
          x => x.getField("event_type")), ",").as("first3"))
      .orderBy("user_id")
  }

  // ----------------------------------------------------------- set ops

  /** Full set-operation family on one-year customer activity: INTERSECT
   * (retained), EXCEPT both ways (churned/new) — closes SURVEY U3 from
   * test-only to hash-gated. */
  val q114SetOps: Q = Q("q114_set_ops",
    """WITH a AS (SELECT DISTINCT o_custkey FROM orders
                  WHERE year(CAST(o_orderdate AS DATE)) = 1997),
       b AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(CAST(o_orderdate AS DATE)) = 1998)
       SELECT 'churned' AS cohort,
              (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS n
       UNION ALL
       SELECT 'new', (SELECT count(*) FROM (SELECT * FROM b EXCEPT SELECT * FROM a))
       UNION ALL
       SELECT 'retained', (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
       ORDER BY cohort""") { (s, d) =>
    val o = table(s, d, "orders")
      .select(col("o_custkey"), year(to_date(col("o_orderdate"))).as("y"))
    // each distinct key set feeds all three set ops — materialize once
    // (bounded by customer count) instead of six orders scans
    val a = o.filter(col("y") === 1997).select("o_custkey").distinct()
      .localCheckpoint()
    val b = o.filter(col("y") === 1998).select("o_custkey").distinct()
      .localCheckpoint()
    val churned = a.except(b).agg(count(lit(1)).as("n"))
      .select(lit("churned").as("cohort"), col("n"))
    val fresh = b.except(a).agg(count(lit(1)).as("n"))
      .select(lit("new").as("cohort"), col("n"))
    val retained = a.intersect(b).agg(count(lit(1)).as("n"))
      .select(lit("retained").as("cohort"), col("n"))
    churned.unionAll(fresh).unionAll(retained).orderBy("cohort")
  }

  // ------------------------------------------------- fuzzy record linkage

  /** Blocked fuzzy matching (entity-resolution shape): candidate
   * customer-name pairs inside a (nation, name-prefix) BLOCK, scored by
   * Levenshtein edit distance ≤ 3. The block key turns the quadratic
   * all-pairs compare into an equi-join whose per-block pair count is
   * bounded — the classic record-linkage blocking discipline; both
   * engines implement the same plain edit distance. */
  val q117FuzzyMatch: Q = Q("q117_fuzzy_match",
    """WITH c AS (SELECT c_custkey, c_nationkey, c_name AS nm FROM customer),
       p AS (SELECT levenshtein(a.nm, b.nm) AS dist
             FROM c a JOIN c b
               ON a.c_nationkey = b.c_nationkey
              AND substr(a.nm, 1, 15) = substr(b.nm, 1, 15)
              AND a.c_custkey < b.c_custkey)
       SELECT CAST(dist AS BIGINT) AS dist, count(*) AS n_pairs
       FROM p WHERE dist <= 3 GROUP BY dist ORDER BY dist""") { (s, d) =>
    val c = table(s, d, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_name").as("nm"),
        substring(col("c_name"), 1, 15).as("blk"))
    val a = c.select(col("c_custkey").as("i"), col("c_nationkey"),
      col("blk"), col("nm").as("nma"))
    val b = c.select(col("c_custkey").as("j"), col("c_nationkey"),
      col("blk"), col("nm").as("nmb"))
    a.join(b, Seq("c_nationkey", "blk"))
      .filter(col("i") < col("j"))
      // threshold form: banded DP with early exit (returns -1 past the
      // radius) — the per-pair cost a 100 TB ER job actually pays
      .withColumn("dist", levenshtein(col("nma"), col("nmb"), 3).cast("long"))
      .filter(col("dist") >= 0)
      .groupBy("dist").agg(count(lit(1)).as("n_pairs"))
      .orderBy("dist")
  }

  /** Golden-record survivorship — the step AFTER q117's fuzzy matching
   * that actual MDM/entity-resolution pipelines ship: matched pairs
   * (same q117 block + edit-distance rule) close into entity clusters
   * via [[Dedup.connectedComponents]] (O(log n) star contraction, the
   * q60 machinery), then each cluster collapses to one canonical
   * record by explicit survivorship rules — id = smallest member key,
   * name = most complete (longest, tie → lexicographic), balance =
   * max, segment = from the anchor (min-key) member. Each rule is a
   * keyed aggregate or picked-rank window over the CLUSTER table
   * (pairs-bounded, not fact-bounded); the oracle replays the closure
   * with a recursive CTE and every pick. */
  val q300GoldenRecord: Q = Q("q300_golden_record",
    """WITH RECURSIVE c AS (SELECT c_custkey, c_nationkey, c_name AS nm,
                c_acctbal, c_mktsegment FROM customer),
       p AS (SELECT a.c_custkey AS i, b.c_custkey AS j
             FROM c a JOIN c b ON a.c_nationkey = b.c_nationkey
              AND substr(a.nm, 1, 15) = substr(b.nm, 1, 15)
              AND a.c_custkey < b.c_custkey
             WHERE levenshtein(a.nm, b.nm) <= 3),
       edges AS (SELECT i AS a, j AS b FROM p UNION ALL SELECT j, i FROM p),
       reach(src, dst) AS (
         SELECT a, b FROM edges
         UNION
         SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
       lbl AS (SELECT src AS id, CAST(least(src, min(dst)) AS BIGINT) AS cl
               FROM reach GROUP BY src),
       mem AS (SELECT lbl.id, lbl.cl, c.nm, c.c_acctbal
               FROM lbl JOIN c ON c.c_custkey = lbl.id),
       nameq AS (SELECT cl, nm AS name_canon FROM (
           SELECT cl, nm, row_number() OVER (PARTITION BY cl
             ORDER BY length(nm) DESC, nm) AS rn FROM mem) WHERE rn = 1),
       agg AS (SELECT cl, CAST(count(*) AS BIGINT) AS n_members,
                      round(max(c_acctbal), 2) AS acctbal_max
               FROM mem GROUP BY cl)
       SELECT agg.cl AS cluster_id, agg.n_members, nameq.name_canon,
              agg.acctbal_max, src.c_mktsegment AS segment_src
       FROM agg JOIN nameq ON nameq.cl = agg.cl
            JOIN c src ON src.c_custkey = agg.cl
       ORDER BY cluster_id""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // four consumers (both self-join sides, the member join, the anchor
    // join) — checkpoint so customer is scanned once
    val c = table(s, d, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_name").as("nm"),
        substring(col("c_name"), 1, 15).as("blk"),
        col("c_acctbal"), col("c_mktsegment"))
      .localCheckpoint()
    val pairs = c.select(col("c_custkey").as("i"), col("c_nationkey"),
        col("blk"), col("nm").as("nma"))
      .join(c.select(col("c_custkey").as("j"), col("c_nationkey"),
        col("blk"), col("nm").as("nmb")), Seq("c_nationkey", "blk"))
      .filter(col("i") < col("j") &&
        levenshtein(col("nma"), col("nmb"), 3) >= 0) // banded, early-exit
      .select("i", "j")
    val mem = graft.dedup.Dedup.connectedComponents(pairs)
      .join(c, col("id") === col("c_custkey"))
      .select(col("lbl").as("cl"), col("nm"), col("c_acctbal"))
    val nameq = mem
      .withColumn("rn", row_number().over(Window.partitionBy("cl")
        .orderBy(length(col("nm")).desc, col("nm"))))
      .filter(col("rn") === 1)
      .select(col("cl"), col("nm").as("name_canon"))
    val agg = mem.groupBy("cl")
      .agg(count(lit(1)).as("n_members"),
        round(max("c_acctbal"), 2).as("acctbal_max"))
    agg.join(nameq, "cl")
      .join(c.select(col("c_custkey"), col("c_mktsegment").as("segment_src")),
        col("cl") === col("c_custkey"))
      .select(col("cl").as("cluster_id"), col("n_members"),
        col("name_canon"), col("acctbal_max"), col("segment_src"))
      .orderBy("cluster_id")
  }

  /** Blocking-quality evaluation for the q117/q300 entity-resolution
   * pipeline — the metrics an ER practitioner checks BEFORE trusting a
   * blocking key (Christen 2012): against a gold standard of edit-
   * distance-≤3 matches inside a coarser (nation, name-prefix-14)
   * block, score the production (nation, prefix-15) block by pair-count
   * reduction, pairs completeness (recall of gold matches), and
   * precision — all in exact ppm. One blocked self-join (prefix-15
   * match implies prefix-14 match, so the fine candidates are a subset
   * and every metric comes from ONE pass over the coarse pair set).
   * The coarse key spans a 10⁴-id name range per nation, so its
   * per-block size is CAPPED at any corpus scale and the gold pass is
   * linear in total rows — the dense sequential names make any shorter
   * prefix degenerate (prefix-10 measured 4.5M pairs at sf0.1,
   * all-pairs-per-nation at scale). */
  val q306BlockingQuality: Q = Q("q306_blocking_quality",
    """WITH c AS (SELECT c_custkey, c_nationkey, c_name AS nm FROM customer),
       p AS (SELECT levenshtein(a.nm, b.nm) <= 3 AS m,
                    substr(a.nm, 1, 15) = substr(b.nm, 1, 15) AS fine
             FROM c a JOIN c b
               ON a.c_nationkey = b.c_nationkey
              AND substr(a.nm, 1, 14) = substr(b.nm, 1, 14)
              AND a.c_custkey < b.c_custkey)
       SELECT CAST(count(*) AS BIGINT) AS n_coarse,
              CAST(count(*) FILTER (WHERE fine) AS BIGINT) AS n_cand,
              CAST(count(*) FILTER (WHERE m) AS BIGINT) AS n_truth,
              CAST(count(*) FILTER (WHERE m AND fine) AS BIGINT) AS n_found,
              CAST((count(*) - count(*) FILTER (WHERE fine)) * 1000000
                   // greatest(count(*), 1) AS BIGINT) AS reduction_ppm,
              CAST(count(*) FILTER (WHERE m AND fine) * 1000000
                   // greatest(count(*) FILTER (WHERE m), 1) AS BIGINT) AS completeness_ppm,
              CAST(count(*) FILTER (WHERE m AND fine) * 1000000
                   // greatest(count(*) FILTER (WHERE fine), 1) AS BIGINT) AS precision_ppm
       FROM p""") { (s, d) =>
    val c = table(s, d, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_name").as("nm"),
        substring(col("c_name"), 1, 14).as("blk14"))
    val a = c.select(col("c_custkey").as("i"), col("c_nationkey"),
      col("blk14"), col("nm").as("nma"))
    val b = c.select(col("c_custkey").as("j"), col("c_nationkey"),
      col("blk14"), col("nm").as("nmb"))
    a.join(b, Seq("c_nationkey", "blk14"))
      .filter(col("i") < col("j"))
      .select((levenshtein(col("nma"), col("nmb"), 3) >= 0).as("m"),
        (substring(col("nma"), 1, 15) === substring(col("nmb"), 1, 15))
          .as("fine"))
      .agg(count(lit(1)).as("n_coarse"),
        count(when(col("fine"), 1)).as("n_cand"),
        count(when(col("m"), 1)).as("n_truth"),
        count(when(col("m") && col("fine"), 1)).as("n_found"))
      .select(col("n_coarse"), col("n_cand"), col("n_truth"), col("n_found"),
        expr("(n_coarse - n_cand) * 1000000 div greatest(n_coarse, 1)")
          .as("reduction_ppm"),
        expr("n_found * 1000000 div greatest(n_truth, 1)")
          .as("completeness_ppm"),
        expr("n_found * 1000000 div greatest(n_cand, 1)")
          .as("precision_ppm"))
  }

  // ---------------------------------------------------- regex extraction

  /** Regex extraction over semi-structured payloads: all digit runs in
   * the event props JSON, counted and summed per event type — the
   * regexp_extract_all surface on a dialect-neutral pattern. */
  val q118RegexExtract: Q = Q("q118_regex_extract",
    """WITH x AS (SELECT event_type,
           regexp_extract_all(props, '[0-9]+') AS nums FROM events)
       SELECT event_type, count(*) AS n_events,
              CAST(sum(len(nums)) AS BIGINT) AS n_numbers,
              CAST(sum(list_transform(nums, v -> CAST(v AS BIGINT))
                       [1]) AS BIGINT) AS sum_first
       FROM x GROUP BY event_type ORDER BY event_type""") { (s, d) =>
    table(s, d, "events")
      .select(col("event_type"),
        expr("regexp_extract_all(props, '[0-9]+', 0)").as("nums"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(size(col("nums"))).as("n_numbers"),
        sum(expr("try_element_at(nums, 1)").cast("long")).as("sum_first"))
      .orderBy("event_type")
  }

  // ------------------------------------------------------ full outer join

  /** FULL OUTER reconciliation of two daily series (clicks vs
   * purchases): days present on either side survive, absences surface
   * as explicit missing flags — the two-source reconciliation shape
   * (closes the one join type the suite didn't yet hash-check). */
  val q119FullOuter: Q = Q("q119_full_outer",
    """WITH a AS (SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_click
                  FROM events WHERE event_type = 'click' GROUP BY 1),
       b AS (SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_purchase
             FROM events WHERE event_type = 'purchase' GROUP BY 1)
       SELECT coalesce(a.day, b.day) AS day,
              coalesce(n_click, 0) AS n_click,
              coalesce(n_purchase, 0) AS n_purchase,
              (a.day IS NULL) AS click_missing,
              (b.day IS NULL) AS purchase_missing
       FROM a FULL OUTER JOIN b ON a.day = b.day ORDER BY day""") { (s, d) =>
    def daily(t: String, out: String) = table(s, d, "events")
      .filter(col("event_type") === t)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as(out))
    val a = daily("click", "n_click")
    val b = daily("purchase", "n_purchase")
    a.join(b.withColumnRenamed("day", "day_b"),
        a("day") === col("day_b"), "full_outer")
      .select(coalesce(col("day"), col("day_b")).as("day"),
        coalesce(col("n_click"), lit(0L)).as("n_click"),
        coalesce(col("n_purchase"), lit(0L)).as("n_purchase"),
        col("day").isNull.as("click_missing"),
        col("day_b").isNull.as("purchase_missing"))
      .orderBy("day")
  }

  // ------------------------------------------------------------- PageRank

  /** Distributed PageRank (3 power iterations, damping 0.85) over the
   * MinHash near-dup graph: per-edge contributions quantized to integer
   * micro-units, so the ENTIRE iterative computation replays in SQL as
   * three unrolled join+group CTEs — an iterative graph algorithm under
   * the hash gate, not just a rows-only smoke check. */
  val q120Pagerank: Q = Q("q120_pagerank",
    s"""WITH ${TextQueries.minhashPairCtes},
       edges AS (SELECT i AS src, j AS dst FROM pairs
                 UNION ALL SELECT j AS src, i AS dst FROM pairs),
       deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
       r0 AS (SELECT src AS v, CAST(1000000 AS BIGINT) AS r FROM deg),
       r1 AS (SELECT e.dst AS v,
                CAST(150000 + sum(CAST(round(0.85 * r0.r / deg.d) AS BIGINT)) AS BIGINT) AS r
              FROM edges e JOIN r0 ON e.src = r0.v JOIN deg ON e.src = deg.src
              GROUP BY e.dst),
       r2 AS (SELECT e.dst AS v,
                CAST(150000 + sum(CAST(round(0.85 * r1.r / deg.d) AS BIGINT)) AS BIGINT) AS r
              FROM edges e JOIN r1 ON e.src = r1.v JOIN deg ON e.src = deg.src
              GROUP BY e.dst),
       r3 AS (SELECT e.dst AS v,
                CAST(150000 + sum(CAST(round(0.85 * r2.r / deg.d) AS BIGINT)) AS BIGINT) AS r
              FROM edges e JOIN r2 ON e.src = r2.v JOIN deg ON e.src = deg.src
              GROUP BY e.dst)
       SELECT v AS doc_id, r AS rank_micro,
              row_number() OVER (ORDER BY r DESC, v) AS rnk
       FROM r3 QUALIFY rnk <= 20 ORDER BY rnk""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    graft.dedup.Dedup.pageRankMicro(
        TextQueries.sharedMinhashPairs(s, d), iters = 3)
      .orderBy(col("r").desc, col("v").asc).limit(20)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("r").desc, col("v").asc))
          .cast("long"))
      .select(col("v").as("doc_id"), col("r").as("rank_micro"), col("rnk"))
      .orderBy("rnk")
  }

  // ------------------------------------------------- distribution windows

  /** percent_rank / cume_dist per language over document length — the
   * normalized-position window family (deterministic: the window order
   * carries a doc_id tiebreak, and both engines round the SAME IEEE
   * double). */
  val q121PercentRank: Q = Q("q121_percent_rank",
    """WITH d AS (SELECT lang, doc_id, n_chars FROM documents WHERE doc_id < 100)
       SELECT lang, doc_id, n_chars,
              round(percent_rank() OVER w, 4) AS pr,
              round(cume_dist() OVER w, 4) AS cd
       FROM d WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)
       ORDER BY lang, doc_id""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
    table(s, d, "documents")
      .filter(col("doc_id") < 100)
      .select(col("lang"), col("doc_id"), col("n_chars"),
        round(percent_rank().over(w), 4).as("pr"),
        round(cume_dist().over(w), 4).as("cd"))
      .orderBy("lang", "doc_id")
  }

  // ----------------------------------------------------- gaps and islands

  /** Gaps-and-islands: consecutive-active-day streaks per user (the
   * day-index-minus-row-number grouping idiom), rolled up to longest
   * streak, streak count, and the first day of the earliest longest
   * streak. */
  val q122Streaks: Q = Q("q122_streaks",
    """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                  FROM events WHERE user_id < 300),
       g AS (SELECT user_id, day,
               CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT)
                 - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
             FROM d),
       s AS (SELECT user_id, grp, count(*) AS len,
                    strftime(min(day), '%Y-%m-%d') AS start_day
             FROM g GROUP BY 1, 2),
       x AS (SELECT user_id, len, start_day,
                    max(len) OVER (PARTITION BY user_id) AS mx FROM s)
       SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
              CAST(count(*) AS BIGINT) AS n_streaks,
              min(CASE WHEN len = mx THEN start_day END) AS first_longest_start
       FROM x GROUP BY user_id ORDER BY user_id""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("day")
    val days = table(s, d, "events")
      .filter(col("user_id") < 300)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val streaks = days
      .withColumn("grp",
        datediff(col("day"), to_date(lit("1970-01-01"))).cast("long")
          - row_number().over(w))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"),
        date_format(min("day"), "yyyy-MM-dd").as("start_day"))
    streaks
      .withColumn("mx", max("len").over(Window.partitionBy("user_id")))
      .groupBy("user_id")
      .agg(max("len").as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        min(when(col("len") === col("mx"), col("start_day")))
          .as("first_longest_start"))
      .orderBy("user_id")
  }

  // ------------------------------------------ cross-corpus doc retrieval

  /** Nearest-document retrieval by lexical similarity: each benchmark
   * (src0) doc finds its best non-src0 match — MinHash band candidates
   * across the two corpora, exact trigram-Jaccard verify on the
   * survivors, integer micro-unit scores, top-1 per probe. The oracle
   * replays bands AND the exact verify, so the full retrieval decision
   * is hash-checked. */
  val q123NearestDoc: Q = Q("q123_nearest_doc",
    s"""WITH ${TextQueries.minhashCrossPairCtes},
       sz AS (SELECT doc_id, len(s) AS n FROM xsh),
       ex AS (SELECT p.i, p.j, p.n_bands,
                CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
                CAST(sa.n + sb.n - len(list_intersect(a.s, b.s)) AS BIGINT) AS uni
              FROM xpairs p
              JOIN xsh a ON p.i = a.doc_id JOIN xsh b ON p.j = b.doc_id
              JOIN sz sa ON p.i = sa.doc_id JOIN sz sb ON p.j = sb.doc_id),
       sc AS (SELECT i, j, n_bands, inter, uni,
                CAST(inter * 1000000 // uni AS BIGINT) AS jacc_micro,
                row_number() OVER (PARTITION BY i
                                   ORDER BY inter * 1000000 // uni DESC, j) AS rn
              FROM ex)
       SELECT i AS probe_doc, j AS match_doc, n_bands, inter, uni, jacc_micro
       FROM sc WHERE rn = 1 ORDER BY probe_doc""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = table(s, d, "documents")
      .filter(size(TextAnalysis.tokens(col("text"))) >= 3)
    // candidate pairs feed BOTH the intersection subtree and the final
    // join — checkpoint them (bounded: band collisions) or each consumer
    // re-runs both band scans
    val cands = graft.dedup.Dedup.minhashCandidatesAcross(
      left = docs.filter(col("source") === "src0"),
      right = docs.filter(col("source") =!= "src0"))
      .localCheckpoint()
    // one shingle-hash inventory for BOTH the intersection join and the
    // set sizes (checkpointed: candidates + sizes share it)
    val hashes = docs
      .select(col("doc_id"),
        explode(array_distinct(graft.dedup.Dedup.shingles(col("text")))).as("sh"))
      .select(col("doc_id"), graft.ops.Exprs.md5Long(col("sh")).as("h"))
      .localCheckpoint()
    val sizes = hashes.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cands
      .join(hashes.select(col("doc_id").as("i"), col("h")), Seq("i"))
      .join(hashes.select(col("doc_id").as("j"), col("h")), Seq("j", "h"))
      .groupBy("i", "j").agg(count(lit(1)).as("inter"))
    val w = Window.partitionBy("i")
      .orderBy(col("jacc_micro").desc, col("j").asc)
    // left join: a band collision with zero shared shingles must still
    // rank (inter = 0, jacc_micro = 0) exactly like the oracle's ex CTE
    cands.join(inter, Seq("i", "j"), "left")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .join(sizes.select(col("doc_id").as("i"), col("n").as("na")), Seq("i"))
      .join(sizes.select(col("doc_id").as("j"), col("n").as("nb")), Seq("j"))
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .withColumn("jacc_micro", expr("inter * 1000000 div uni"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("i").as("probe_doc"), col("j").as("match_doc"),
        col("n_bands"), col("inter"), col("uni"), col("jacc_micro"))
      .orderBy("probe_doc")
  }

  // ------------------------------------------------- split leakage audit

  /** Dedup-aware split leakage: near-dup clusters (MinHash → connected
   * components) crossed with the q97 hash split — a cluster spanning
   * train AND test means near-duplicate contamination across the
   * boundary, the eval-integrity failure dedup-aware splitting exists
   * to prevent. The oracle replays the closure (recursive CTE), the
   * split CASE, and the leak verdict per cluster. */
  val q124SplitLeakage: Q = Q("q124_split_leakage",
    s"""WITH RECURSIVE ${TextQueries.minhashPairCtes},
       edges AS (SELECT i AS a, j AS b FROM pairs
                 UNION ALL SELECT j AS a, i AS b FROM pairs),
       reach(src, dst) AS (
         SELECT a, b FROM edges
         UNION
         SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
       lbl AS (SELECT src AS doc_id, CAST(least(src, min(dst)) AS BIGINT) AS cluster
               FROM reach GROUP BY src),
       sp AS (SELECT doc_id,
                CASE WHEN ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT
                          % 10000 < 8000 THEN 'train'
                     WHEN ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT
                          % 10000 < 9000 THEN 'val'
                     ELSE 'test' END AS split
              FROM documents),
       cl AS (SELECT l.cluster,
                CAST(count(*) AS BIGINT) AS n_members,
                CAST(count(DISTINCT s.split) AS BIGINT) AS n_splits,
                (count(DISTINCT CASE WHEN s.split IN ('train') THEN 1 END) > 0
                 AND count(DISTINCT CASE WHEN s.split IN ('test', 'val') THEN 1 END) > 0)
                  AS leaks
              FROM lbl l JOIN sp s USING (doc_id) GROUP BY l.cluster)
       SELECT cluster, n_members, n_splits, leaks
       FROM cl ORDER BY cluster""") { (s, d) =>
    val cc = graft.dedup.Dedup.connectedComponents(
      TextQueries.sharedMinhashPairs(s, d))
    cc.select(col("id").as("doc_id"), col("lbl").as("cluster"))
      .withColumn("split", Curation.splitLabel(col("doc_id"), 8000, 1000))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_members"),
        count_distinct(col("split")).as("n_splits"),
        (count(when(col("split") === "train", 1)) > 0 &&
          count(when(col("split").isin("test", "val"), 1)) > 0).as("leaks"))
      .orderBy("cluster")
  }

  // ---------------------------------------------------- transition matrix

  /** First-order Markov transition matrix over each user's event
   * sequence (lag window, one user-keyed shuffle): per (prev → cur)
   * pair, count and row-conditional probability in integer basis
   * points — the behavioral-modeling primitive. */
  val q125Transitions: Q = Q("q125_transitions",
    """WITH e AS (SELECT user_id, event_type, event_id,
                         CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
                  WHERE ts IS NOT NULL),
       l AS (SELECT user_id, event_type AS cur,
                    lag(event_type) OVER (PARTITION BY user_id
                                          ORDER BY sec, event_id) AS prev
             FROM e),
       t AS (SELECT prev, cur, count(*) AS n FROM l
             WHERE prev IS NOT NULL GROUP BY 1, 2),
       tot AS (SELECT prev, sum(n) AS tn FROM t GROUP BY prev)
       SELECT t.prev, t.cur, CAST(n AS BIGINT) AS n,
              CAST(n * 10000 // tn AS BIGINT) AS pct_bp
       FROM t JOIN tot USING (prev) ORDER BY prev, cur""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    // null-ts rows excluded on BOTH sides: Spark's asc sort is NULLS
    // FIRST where DuckDB's is NULLS LAST, so a null-sec event would
    // take a different sequence position in each engine
    val t = table(s, d, "events")
      .filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_type").as("cur"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("prev", lag(col("cur"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy("prev", "cur").agg(count(lit(1)).as("n"))
    val tot = t.groupBy("prev").agg(sum("n").as("tn"))
    t.join(tot, "prev")
      .select(col("prev"), col("cur"), col("n"),
        expr("n * 10000 div tn").as("pct_bp"))
      .orderBy("prev", "cur")
  }

  // ------------------------------------------------------- seasonal index

  /** Monthly seasonality index of order value: month's average order
   * value over the global average, in integer milli-units (DECIMAL
   * money → exact micro conversion → integer division — no double ever
   * rounds). */
  val q126SeasonalIndex: Q = Q("q126_seasonal_index",
    """WITH m AS (SELECT month(CAST(o_orderdate AS DATE)) AS mon,
                         sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev,
                         count(*) AS n
                  FROM orders GROUP BY 1),
       g AS (SELECT CAST(sum(rev) * 1000000 AS BIGINT) // CAST(sum(n) AS BIGINT) AS g_micro
             FROM m)
       SELECT mon, CAST(n AS BIGINT) AS n_orders,
              CAST(CAST(rev * 1000000 AS BIGINT) // n AS BIGINT) AS avg_micro,
              CAST((CAST(rev * 1000000 AS BIGINT) // n) * 1000 // g_micro AS BIGINT)
                AS seasonal_milli
       FROM m CROSS JOIN g ORDER BY mon""") { (s, d) =>
    val m = table(s, d, "orders")
      .groupBy(month(to_date(col("o_orderdate"))).cast("long").as("mon"))
      .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("rev"),
        count(lit(1)).as("n"))
    val g = m.agg(
      expr("CAST(sum(rev) * 1000000 AS BIGINT) div sum(n)").as("g_micro"))
    m.crossJoin(broadcast(g))
      .select(col("mon"), col("n").as("n_orders"),
        expr("CAST(rev * 1000000 AS BIGINT) div n").as("avg_micro"),
        expr("(CAST(rev * 1000000 AS BIGINT) div n) * 1000 div g_micro")
          .as("seasonal_milli"))
      .orderBy("mon")
  }

  // ------------------------------------------------- unpivot round-trip

  /** Pivot → UNPIVOT round-trip: the wide per-day event-type count
   * matrix melted back to long form, absent combinations surfacing as
   * explicit nulls (`Dataset.unpivot`, the melt surface q11's pivot
   * lacked an inverse for). The oracle rebuilds the same long table
   * from a day × type cross join left-joined to the counts. */
  val q135Unpivot: Q = Q("q135_unpivot",
    """WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type FROM events),
       d AS (SELECT DISTINCT day FROM e),
       t AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type),
       c AS (SELECT day, event_type, count(*) AS n FROM e GROUP BY 1, 2)
       SELECT d.day, t.event_type, c.n AS n
       FROM d CROSS JOIN t LEFT JOIN c USING (day, event_type)
       ORDER BY day, event_type""") { (s, d) =>
    val types = Seq("click", "error", "purchase", "signup", "view")
    table(s, d, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .unpivot(Array(col("day")), types.map(col).toArray, "event_type", "n")
      .orderBy("day", "event_type")
  }

  // --------------------------------------------------- grouped regression

  /** Distributed grouped OLS (value-vs-hour trend per event type) from
   * EXACT integer moments: y milli-quantized, every Σ an exact BIGINT,
   * only the final slope/intercept division floating point — so the
   * full normal-equation arithmetic replays bit-identically in SQL
   * (where `ml.Forecast` fits one model on one collected table, this
   * fits one line PER GROUP with a single map-side-combined
   * aggregate). */
  val q136GroupedRegression: Q = Q("q136_grouped_regression",
    """WITH e AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS x,
                         CAST(round(value * 1000) AS BIGINT) AS y FROM events
                  WHERE ts IS NOT NULL AND value IS NOT NULL),
       a AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(x*x) AS sxx,
                    sum(y) AS sy, sum(x*y) AS sxy,
                    min(x) = max(x) AS constx
             FROM e GROUP BY event_type)
       SELECT event_type, n,
              CASE WHEN constx THEN NULL
                   ELSE round(CAST(n*sxy - sx*sy AS DOUBLE) / (n*sxx - sx*sx), 4)
              END AS slope_q,
              CASE WHEN constx THEN NULL
                   ELSE round(CAST(sy*sxx - sx*sxy AS DOUBLE) / (n*sxx - sx*sx), 4)
              END AS intercept_q
       FROM a ORDER BY event_type""") { (s, d) =>
    graft.ops.Relational.groupedLinearFit(
      table(s, d, "events"),
      "event_type",
      x = hour(col("ts")),
      yQuant = round(col("value") * 1000, 0).cast("long"))
      .orderBy("event_type")
  }

  /** Deterministic k-fold cross-validation (k = 3) of the q136 grouped
   * OLS: fold = md5₆₀(event_id) mod 3 (reproducible at any
   * partitioning — a row can never migrate folds), train moments for
   * each held-out fold are TOTALS MINUS FOLD (exact BIGINT normal-
   * equation sums, so no per-fold rescan), coefficients follow q136's
   * round(·,4) double contract, and the held-out error is
   * re-integerized per row (residual = y − round(slope·x + intercept),
   * SSE an exact BIGINT sum) so the distributed sum is
   * order-independent and the oracle replays everything. Two passes
   * over the fact (one map-side-combined moment aggregate + one eval
   * join against the k×groups broadcast coefficient table) at any
   * scale. */
  val q298KfoldCv: Q = Q("q298_kfold_cv",
    s"""WITH e AS (SELECT event_type,
              ${graft.ops.Exprs.md5LongSql.format("event_id")} % 3 AS fold,
              CAST(hour(ts) AS BIGINT) AS x,
              CAST(round(value * 1000) AS BIGINT) AS y
            FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
       fm AS (SELECT event_type, fold, count(*) AS n, sum(x) AS sx,
                     sum(x*x) AS sxx, sum(y) AS sy, sum(x*y) AS sxy
              FROM e GROUP BY 1, 2),
       tm AS (SELECT event_type, sum(n) AS tn, sum(sx) AS tsx,
                     sum(sxx) AS tsxx, sum(sy) AS tsy, sum(sxy) AS tsxy
              FROM fm GROUP BY 1),
       tr AS (SELECT fm.event_type, fm.fold,
                     tn - n AS ntr, tsx - sx AS sxtr, tsxx - sxx AS sxxtr,
                     tsy - sy AS sytr, tsxy - sxy AS sxytr
              FROM fm JOIN tm ON fm.event_type = tm.event_type),
       cf AS (SELECT event_type, fold, ntr,
                CASE WHEN ntr*sxxtr - sxtr*sxtr = 0 THEN NULL
                     ELSE round(CAST(ntr*sxytr - sxtr*sytr AS DOUBLE)
                                / (ntr*sxxtr - sxtr*sxtr), 4) END AS slope_q,
                CASE WHEN ntr*sxxtr - sxtr*sxtr = 0 THEN NULL
                     ELSE round(CAST(sytr*sxxtr - sxtr*sxytr AS DOUBLE)
                                / (ntr*sxxtr - sxtr*sxtr), 4) END AS intercept_q
              FROM tr)
       SELECT e.event_type, e.fold, CAST(cf.ntr AS BIGINT) AS n_train,
              CAST(count(*) AS BIGINT) AS n_test, cf.slope_q, cf.intercept_q,
              CAST(sum((y - CAST(round(cf.slope_q * x + cf.intercept_q) AS BIGINT))
                     * (y - CAST(round(cf.slope_q * x + cf.intercept_q) AS BIGINT)))
                   AS BIGINT) AS sse
       FROM e JOIN cf ON e.event_type = cf.event_type AND e.fold = cf.fold
       GROUP BY e.event_type, e.fold, cf.ntr, cf.slope_q, cf.intercept_q
       ORDER BY e.event_type, e.fold""") { (s, d) =>
    val e = table(s, d, "events")
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type"),
        (graft.ops.Exprs.md5Long(col("event_id")) % 3).as("fold"),
        hour(col("ts")).cast("long").as("x"),
        round(col("value") * 1000, 0).cast("long").as("y"))
      .localCheckpoint() // one materialization feeds moments AND eval
    val fm = e.groupBy("event_type", "fold")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"))
    val tm = fm.groupBy("event_type")
      .agg(sum("n").as("tn"), sum("sx").as("tsx"), sum("sxx").as("tsxx"),
        sum("sy").as("tsy"), sum("sxy").as("tsxy"))
    val denom = (col("tn") - col("n")) * (col("tsxx") - col("sxx")) -
      (col("tsx") - col("sx")) * (col("tsx") - col("sx"))
    val cf = fm.join(tm, "event_type")
      .select(col("event_type"), col("fold"),
        (col("tn") - col("n")).as("ntr"),
        when(denom === 0, lit(null)).otherwise(
          round(((col("tn") - col("n")) * (col("tsxy") - col("sxy")) -
            (col("tsx") - col("sx")) * (col("tsy") - col("sy")))
            .cast("double") / denom, 4)).as("slope_q"),
        when(denom === 0, lit(null)).otherwise(
          round(((col("tsy") - col("sy")) * (col("tsxx") - col("sxx")) -
            (col("tsx") - col("sx")) * (col("tsxy") - col("sxy")))
            .cast("double") / denom, 4)).as("intercept_q"))
    val res = col("y") -
      round(col("slope_q") * col("x") + col("intercept_q"), 0).cast("long")
    e.join(broadcast(cf), Seq("event_type", "fold"))
      .groupBy(col("event_type"), col("fold"), col("ntr").as("n_train"),
        col("slope_q"), col("intercept_q"))
      .agg(count(lit(1)).as("n_test"), sum(res * res).as("sse"))
      .select(col("event_type"), col("fold"), col("n_train"), col("n_test"),
        col("slope_q"), col("intercept_q"), col("sse"))
      .orderBy("event_type", "fold")
  }

  val all: Seq[Q] = Seq(q100Funnel, q101CohortRetention, q102WeightedSample,
    q103TfidfKeywords, q104Pmi, q105StreamUpsert, q321StreamCdcDelete, q106StreamSliding,
    q109SemDedup, q110RangeWindow, q111MadOutliers, q112Entropy,
    q113OrderedList, q114SetOps, q117FuzzyMatch, q118RegexExtract,
    q300GoldenRecord, q306BlockingQuality,
    q119FullOuter, q120Pagerank, q121PercentRank, q122Streaks,
    q123NearestDoc, q124SplitLeakage, q125Transitions, q126SeasonalIndex,
    q135Unpivot, q136GroupedRegression, q297StreamLateDrop, q298KfoldCv)
}
