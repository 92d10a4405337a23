package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Sources.table
import graft.curation.Curation
import graft.dedup.Dedup
import graft.ops.Temporal
import graft.sim.{Quantize, Similarity}
import graft.text.{Search, TextAnalysis}

/**
 * Round-5 scale operators: temporal joins (as-of, range), lexical search
 * (BM25), cross-document span dedup, retention quotas, unigram-LM
 * surprisal scoring, sequence packing, int8 embedding quantization, and
 * near-dup cluster retention. Every oracle replays the full arithmetic
 * (md5 spellings, integer-quantized scores where a double sum would be
 * order-dependent) so the scale-path semantics are hash-checked.
 */
object ScaleQueries {

  /** Events with epoch-second time — the shared temporal base.
    * Oracle spelling: `CAST(floor(epoch(ts)) AS BIGINT)` (q55's). */
  private def eventsSec(s: org.apache.spark.sql.SparkSession, d: String) =
    table(s, d, "events").withColumn("sec", unix_timestamp(col("ts")))

  // ------------------------------------------------------------ as-of join

  /** As-of join: each click attached to the user's most recent purchase
   * at-or-before it (backward inclusive), then rolled up per user. The
   * right side is pre-deduped per (user, sec) by greatest event_id, so
   * the match is unique and engine-independent. The oracle computes the
   * same match with a correlated max-subquery — ASOF semantics spelled
   * in portable SQL. */
  val q75AsofJoin: Q = Q("q75_asof_join",
    """WITH e AS (SELECT event_id, user_id, event_type, value,
                         CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
       c AS (SELECT event_id, user_id, sec FROM e WHERE event_type = 'click'),
       p AS (SELECT user_id, sec FROM (
               SELECT user_id, sec,
                      row_number() OVER (PARTITION BY user_id, sec
                                         ORDER BY event_id DESC) AS rn
               FROM e WHERE event_type = 'purchase') WHERE rn = 1),
       j AS (SELECT c.user_id, c.sec,
                    (SELECT max(p.sec) FROM p
                     WHERE p.user_id = c.user_id AND p.sec <= c.sec) AS psec
             FROM c)
       SELECT user_id, count(*) AS n_clicks,
              CAST(count(psec) AS BIGINT) AS n_matched,
              coalesce(round(avg(sec - psec), 2), -1.0) AS avg_gap_sec
       FROM j GROUP BY user_id ORDER BY user_id""") { (s, d) =>
    val ev = eventsSec(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "sec")
    val purchases = Temporal.latestPerKeyTime(
      ev.filter(col("event_type") === "purchase")
        .select("user_id", "sec", "event_id", "value"),
      "user_id", "sec", "event_id")
      .select("user_id", "sec", "value")
    Temporal.asofJoin(clicks, purchases, "user_id", "sec", "sec", Seq("value"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_clicks"),
        count(col("asof_time")).as("n_matched"),
        coalesce(round(avg(col("sec") - col("asof_time")), 2), lit(-1.0))
          .as("avg_gap_sec"))
      .orderBy("user_id")
  }

  /** Nearest-value matching (the observational-study shape: each
   * "treated" unit matched to the closest-below control on a numeric
   * covariate) — [[Temporal.asofJoin]] driven through the VALUE domain
   * instead of time: urgent orders match the most expensive
   * low-priority order with price ≤ theirs in the same order month.
   * Controls pre-dedup per (month, cents) by greatest orderkey so the
   * match is unique; price quantizes to exact cents (one
   * floor(×100) double op, identical in both engines) so the
   * per-month matched-gap sums stay BIGINT. Per month: treated count,
   * matched count, total match gap — the covariate-balance table a
   * matching study reports. Same one-window-per-key scale shape as
   * q75. */
  val q312NearestMatch: Q = Q("q312_nearest_match",
    """WITH t AS (SELECT strftime(o_orderdate, '%Y-%m') AS mon,
                  CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders WHERE o_orderpriority = '1-URGENT'),
       c0 AS (SELECT strftime(o_orderdate, '%Y-%m') AS mon,
                     CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
                     o_orderkey
              FROM orders WHERE o_orderpriority = '5-LOW'),
       c AS (SELECT mon, cents FROM (
               SELECT mon, cents, row_number() OVER (PARTITION BY mon, cents
                 ORDER BY o_orderkey DESC) AS rn FROM c0) WHERE rn = 1),
       m AS (SELECT t.mon, t.cents,
               (SELECT max(c.cents) FROM c
                WHERE c.mon = t.mon AND c.cents <= t.cents) AS ctl_cents
             FROM t)
       SELECT mon, CAST(count(*) AS BIGINT) AS n_treat,
              CAST(count(ctl_cents) AS BIGINT) AS n_matched,
              CAST(coalesce(sum(cents - ctl_cents), 0) AS BIGINT) AS gap_cents
       FROM m GROUP BY mon ORDER BY mon""") { (s, d) =>
    val o = table(s, d, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("mon"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey"), col("o_orderpriority"))
    val treat = o.filter(col("o_orderpriority") === "1-URGENT")
      .select("mon", "cents")
    val ctl = Temporal.latestPerKeyTime(
      o.filter(col("o_orderpriority") === "5-LOW")
        .select("mon", "cents", "o_orderkey"),
      "mon", "cents", "o_orderkey")
      .select("mon", "cents", "o_orderkey")
    Temporal.asofJoin(treat, ctl, "mon", "cents", "cents", Seq("o_orderkey"))
      .groupBy("mon")
      .agg(count(lit(1)).as("n_treat"),
        count(col("asof_time")).as("n_matched"),
        coalesce(sum(col("cents") - col("asof_time")), lit(0L))
          .as("gap_cents"))
      .orderBy("mon")
  }

  // ------------------------------------------------------------ range join

  /** Interval-point range join: each user's first-hour window
   * [first event, +3600s] paired with every event inside it, via the
   * bucketized equi-join (shuffle on (user, hour-bucket), exact
   * containment as a residual filter). The oracle uses the plain
   * inequality join — same semantics, the shape Spark must NOT plan. */
  val q76RangeJoin: Q = Q("q76_range_join",
    """WITH e AS (SELECT user_id, event_type,
                         CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
       f AS (SELECT user_id, min(sec) AS lo FROM e GROUP BY user_id),
       w AS (SELECT user_id, lo, lo + 3600 AS hi FROM f)
       SELECT w.user_id, count(*) AS n_events,
              CAST(count(DISTINCT e.event_type) AS BIGINT) AS n_types
       FROM w JOIN e ON w.user_id = e.user_id
                    AND e.sec >= w.lo AND e.sec <= w.hi
       GROUP BY w.user_id ORDER BY w.user_id""") { (s, d) =>
    val ev = eventsSec(s, d).select("user_id", "sec", "event_type")
    val windows = ev.groupBy("user_id").agg(min("sec").as("lo"))
      .withColumn("hi", col("lo") + 3600L)
    Temporal.rangeJoin(windows, ev, "user_id", "lo", "hi", "sec",
        bucketSec = 3600L)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("event_type")).as("n_types"))
      .orderBy("user_id")
  }

  // ------------------------------------------------------------- BM25 search

  private val bm25Terms = Seq("dup", "key", "fast")

  /** BM25 top-20 for a 3-term query ('dup' is the rare high-idf term).
   * Per-term scores quantized to integer micro-units before the per-doc
   * sum (order-proof); constants spelled as the same double literals in
   * both engines. */
  val q77Bm25: Q = Q("q77_bm25",
    s"""WITH base AS (SELECT doc_id,
           string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents),
       d AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM base),
       stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM d),
       tf AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
              FROM (SELECT b.doc_id, d.dl, unnest(b.toks) AS term
                    FROM base b JOIN d USING (doc_id))
              WHERE term IN (${bm25Terms.map(t => s"'$t'").mkString(", ")})
              GROUP BY 1, 2, 3),
       idf AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
       sc AS (SELECT tf.doc_id,
                CAST(round(ln((s.n_docs - i.df + 0.5) / (i.df + 0.5) + 1.0)
                     * (tf.tf * CAST(2.2 AS DOUBLE))
                     / (tf.tf + CAST(1.2 AS DOUBLE)
                        * (CAST(0.25 AS DOUBLE)
                           + CAST(0.75 AS DOUBLE) * tf.dl / s.avgdl))
                     * 1e6) AS BIGINT) AS sm
              FROM tf JOIN idf i USING (term) CROSS JOIN stats s)
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
              CAST(sum(sm) AS BIGINT) AS score_micro,
              CAST(CAST(sum(sm) AS BIGINT) / 1e6 AS DOUBLE) AS score,
              row_number() OVER (ORDER BY sum(sm) DESC, doc_id) AS rank
       FROM sc GROUP BY doc_id QUALIFY rank <= 20 ORDER BY rank""") { (s, d) =>
    Search.bm25TopK(table(s, d, "documents"), bm25Terms, k = 20)
      .select("doc_id", "n_terms_hit", "score_micro", "score", "rank")
      .orderBy("rank")
  }

  // ------------------------------------------------------- span-level dedup

  /** Cross-document 8-token span dedup signal (the line/paragraph-dedup
   * analog): spans occurring in >= 2 distinct docs are common
   * (boilerplate); per-source rollup of the common fraction. Docs are
   * filtered to >= 8 tokens on BOTH sides — below that Spark's concat_ws
   * skips the missing trailing tokens while SQL `||` nullifies, so the
   * parity boundary is made explicit. Heavy docs compare integers
   * (n_common*5 >= n_spans), never rounded doubles. */
  val q78SpanDedup: Q = Q("q78_span_dedup",
    """WITH tok AS (SELECT doc_id, source,
           string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
       sp AS (SELECT doc_id, source,
                unnest(list_distinct(list_transform(range(1, greatest(len(w)-6, 1)),
                  k -> w[k]||' '||w[k+1]||' '||w[k+2]||' '||w[k+3]||' '||
                       w[k+4]||' '||w[k+5]||' '||w[k+6]||' '||w[k+7]))) AS s
              FROM tok WHERE len(w) >= 8),
       h AS (SELECT doc_id, source, ('0x'||substr(md5(s),1,15))::BIGINT AS h FROM sp),
       hot AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd
                              FROM h GROUP BY h) WHERE nd >= 2),
       per AS (SELECT a.doc_id, a.source, count(*) AS n_spans,
                      count(b.h) AS n_common
               FROM h a LEFT JOIN (SELECT h, 1 AS x FROM hot) b ON a.h = b.h
               GROUP BY 1, 2)
       SELECT source, count(*) AS n_docs,
              CAST(sum(n_spans) AS BIGINT) AS sum_spans,
              CAST(sum(n_common) AS BIGINT) AS sum_common,
              round(sum(n_common) / CAST(sum(n_spans) AS DOUBLE), 4) AS common_ratio,
              CAST(count(*) FILTER (WHERE n_common * 5 >= n_spans) AS BIGINT) AS n_docs_heavy
       FROM per GROUP BY source ORDER BY source""") { (s, d) =>
    val docs = table(s, d, "documents")
      .filter(size(TextAnalysis.tokens(col("text"))) >= 8)
    Curation.spanStats(docs, spanTokens = 8, minDocs = 2,
        carryCols = Seq("source"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_spans").as("sum_spans"),
        sum("n_common").as("sum_common"),
        round(sum("n_common") / sum("n_spans").cast("double"), 4)
          .as("common_ratio"),
        count(when(col("n_common") * 5 >= col("n_spans"), 1))
          .as("n_docs_heavy"))
      .orderBy("source")
  }

  // --------------------------------------------------------- domain quotas

  private val stopList = TextAnalysis.stopwords.map(w => s"'$w'").mkString(", ")

  /** Per-doc quality score — q32's exact spelling (hash-proven). */
  private[queries] val qualityCte =
    s"""q AS (SELECT doc_id, source,
         round(least(length(text) / 500.0, 1.0) * 0.5
           + least((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                   / CAST(greatest(length(text), 1) AS DOUBLE) * 20.0, 1.0) * 0.2
           + least(CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                        w -> w IN ($stopList))) AS DOUBLE)
                   / greatest(len(string_split_regex(trim(lower(text)), '\\s+')), 1)
                   * 4.0, 1.0) * 0.3, 4) AS score
       FROM documents)"""

  /** Retention quota: top-5 docs per source by quality (ties → lower
   * doc_id) — the cap-based mixture-balancing primitive. */
  val q79DomainQuota: Q = Q("q79_domain_quota",
    s"""WITH $qualityCte
       SELECT source, doc_id, score,
              row_number() OVER (PARTITION BY source
                                 ORDER BY score DESC, doc_id) AS quota_rank
       FROM q QUALIFY quota_rank <= 5 ORDER BY source, quota_rank""") { (s, d) =>
    Curation.topKPerGroup(
        table(s, d, "documents")
          .withColumn("score", TextAnalysis.qualityScore(col("text"))),
        "source", col("score"), k = 5, idCol = "doc_id")
      .select("source", "doc_id", "score", "quota_rank")
      .orderBy("source", "quota_rank")
  }

  // ----------------------------------------------------- unigram surprisal

  /** Unigram-LM surprisal per doc (cheap perplexity proxy): mean
   * -ln P(token) in integer MILLI-nats — the per-token quantization
   * makes the per-doc sum exact integer arithmetic in both engines. */
  val q80Surprisal: Q = Q("q80_surprisal",
    """WITH tok AS (SELECT doc_id, lang,
           unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
         FROM documents),
       vocab AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
       tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM vocab),
       m AS (SELECT token,
               CAST(round(-ln(c / CAST(total AS DOUBLE)) * 1000.0) AS BIGINT) AS mnat
             FROM vocab CROSS JOIN tot)
       SELECT doc_id, lang, count(*) AS n_tok,
              CAST(sum(mnat) AS BIGINT) AS sum_mnat,
              round(CAST(sum(mnat) AS BIGINT) / CAST(count(*) AS DOUBLE), 2) AS avg_mnat
       FROM tok JOIN m USING (token)
       WHERE doc_id < 120
       GROUP BY doc_id, lang ORDER BY doc_id""") { (s, d) =>
    Curation.surprisalStats(table(s, d, "documents"), carryCols = Seq("lang"))
      .filter(col("doc_id") < 120)
      .select("doc_id", "lang", "n_tok", "sum_mnat", "avg_mnat")
      .orderBy("doc_id")
  }

  // ------------------------------------------------------- sequence packing

  /** GPT-style packing plan (concatenate per source in doc_id order, cut
   * every 256 tokens) as pure window arithmetic — per-source bin count,
   * boundary-split docs, and a self-check that the max end bin agrees
   * with the closed-form bin count. */
  val q81SeqPacking: Q = Q("q81_seq_packing",
    """WITH t AS (SELECT source, doc_id,
           CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tok
         FROM documents),
       c AS (SELECT source, doc_id, n_tok,
               coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
             FROM t),
       b AS (SELECT source, n_tok, cb // 256 AS sb, (cb + n_tok - 1) // 256 AS eb
             FROM c)
       SELECT source, count(*) AS n_docs,
              CAST(sum(n_tok) AS BIGINT) AS total_tokens,
              CAST((CAST(sum(n_tok) AS BIGINT) - 1) // 256 + 1 AS BIGINT) AS n_bins,
              CAST(count(*) FILTER (WHERE eb > sb) AS BIGINT) AS n_split,
              round(count(*) FILTER (WHERE eb > sb) / CAST(count(*) AS DOUBLE), 4) AS pct_split,
              (max(eb) + 1 = (CAST(sum(n_tok) AS BIGINT) - 1) // 256 + 1) AS bins_consistent
       FROM b GROUP BY source ORDER BY source""") { (s, d) =>
    Curation.packSequences(table(s, d, "documents"), "source", budget = 256)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("total_tokens"),
        expr("(sum(n_tok) - 1) div 256 + 1").as("n_bins"),
        count(when(col("is_split"), 1)).as("n_split"),
        round(count(when(col("is_split"), 1)) / count(lit(1)).cast("double"), 4)
          .as("pct_split"),
        (max("end_bin") + 1 === expr("(sum(n_tok) - 1) div 256 + 1"))
          .as("bins_consistent"))
      .orderBy("source")
  }

  // --------------------------------------------------- int8 quantization

  /** int8 embedding quantization quality probe over a bounded slice:
   * quantized-integer cosine vs exact double cosine for all pairs of the
   * first 48 vectors; errors quantized to micro-units so the aggregate is
   * order-proof. The bound verdict (max error < 0.03) is computed from
   * the same arithmetic in both engines. */
  val q82Int8Quant: Q = Q("q82_int8_quant",
    """WITH v AS (SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         FROM embeddings WHERE vec_id < 48),
       nn AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
       u AS (SELECT vec_id, e,
               list_transform(e, x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END) AS u,
               list_aggregate(list_transform(e, x -> abs(x)), 'max') / 127.0 AS scale
             FROM nn),
       q AS (SELECT vec_id, u,
               list_transform(e, x -> CASE WHEN scale = 0 THEN CAST(0 AS BIGINT)
                 ELSE CAST(round(x / scale) AS BIGINT) END) AS qv
             FROM u),
       qq AS (SELECT vec_id, u, qv,
                list_transform(qv, x -> CAST(x AS DOUBLE)) AS qd FROM q),
       pr AS (SELECT a.vec_id AS i, b.vec_id AS j,
                list_dot_product(a.u, b.u) AS ce,
                CASE WHEN list_dot_product(a.qd, a.qd) = 0
                       OR list_dot_product(b.qd, b.qd) = 0 THEN 0.0
                     ELSE list_dot_product(a.qd, b.qd)
                          / (sqrt(list_dot_product(a.qd, a.qd))
                             * sqrt(list_dot_product(b.qd, b.qd))) END AS cq
              FROM qq a JOIN qq b ON a.vec_id < b.vec_id),
       e AS (SELECT CAST(round(abs(cq - ce) * 1e6) AS BIGINT) AS em FROM pr)
       SELECT CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(max(em) AS BIGINT) AS max_err_micro,
              CAST(round(sum(em) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_err_micro,
              (max(em) < 30000) AS bound_ok
       FROM e""") { (s, d) =>
    val sl = table(s, d, "embeddings").filter(col("vec_id") < 48)
    val qv = Quantize.withInt8(sl, "embedding", "e8")
    val u = Similarity.withUnitVec(qv, "embedding", "u")
      .select(col("vec_id"), col("u"), col("e8_q"))
      .localCheckpoint()
    val a = u.select(col("vec_id").as("i"), col("u").as("ua"), col("e8_q").as("qa"))
    val b = u.select(col("vec_id").as("j"), col("u").as("ub"), col("e8_q").as("qb"))
    val err = a.crossJoin(broadcast(b)).filter(col("i") < col("j"))
      .withColumn("ce", Similarity.dot(col("ua"), col("ub")))
      .withColumn("cq", Quantize.cosineQ(col("qa"), col("qb")))
      .withColumn("em", round(abs(col("cq") - col("ce")) * 1e6, 0).cast("long"))
    err.agg(count(lit(1)).as("n_pairs"),
      max("em").as("max_err_micro"),
      round(sum("em") / count(lit(1)).cast("double"), 0).cast("long")
        .as("mean_err_micro"),
      (max("em") < 30000L).as("bound_ok"))
  }

  // ------------------------------------------------- cluster-best retention

  /** Near-dup cluster retention: MinHash pairs → connected components →
   * keep the highest-quality doc per cluster (ties → lower doc_id). The
   * oracle recomputes the closure with a recursive CTE and replays the
   * quality arithmetic — the full curation decision is hash-checked. */
  val q83ClusterKeepBest: Q = Q("q83_cluster_keep_best",
    s"""WITH RECURSIVE ${TextQueries.minhashPairCtes},
       edges AS (SELECT i AS a, j AS b FROM pairs
                 UNION ALL SELECT j AS a, i AS b FROM pairs),
       reach(src, dst) AS (
         SELECT a, b FROM edges
         UNION
         SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
       lbl AS (SELECT src AS doc_id, CAST(least(src, min(dst)) AS BIGINT) AS cluster
               FROM reach GROUP BY src),
       $qualityCte,
       mem AS (SELECT l.doc_id, l.cluster, q.score,
                 row_number() OVER (PARTITION BY l.cluster
                                    ORDER BY q.score DESC, l.doc_id) AS rn
               FROM lbl l JOIN q ON l.doc_id = q.doc_id)
       SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
              CAST(min(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS keep_doc_id,
              min(CASE WHEN rn = 1 THEN score END) AS keep_score
       FROM mem GROUP BY cluster ORDER BY cluster""") { (s, d) =>
    val docs = table(s, d, "documents")
      .filter(size(TextAnalysis.tokens(col("text"))) >= 3)
    val cc = Dedup.connectedComponents(TextQueries.sharedMinhashPairs(s, d))
    val quality = docs.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("score"))
    val w = Window.partitionBy("cluster").orderBy(col("score").desc, col("doc_id").asc)
    cc.select(col("id").as("doc_id"), col("lbl").as("cluster"))
      .join(quality, "doc_id")
      .withColumn("rn", row_number().over(w))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_members"),
        min(when(col("rn") === 1, col("doc_id"))).as("keep_doc_id"),
        min(when(col("rn") === 1, col("score"))).as("keep_score"))
      .orderBy("cluster")
  }

  // --------------------------------------------------------- rolling window

  /** 7-row trailing average of daily order revenue — the moving-average
   * window family. Daily sums route through DECIMAL (order-independent),
   * the rolling sum aggregates the already-exact daily decimals, and the
   * average is integer micro-unit floor division — rounding a double
   * quotient to 2 decimals sits on half-cent boundaries where Spark's
   * BigDecimal HALF_UP and DuckDB's double rounding disagree (seen live
   * at sf0.01: 2116706.41 vs .40), so no double is ever rounded here. */
  val q84RollingAvg: Q = Q("q84_rolling_avg",
    """WITH daily AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
             sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
           FROM orders WHERE o_orderdate >= DATE '1998-01-01' GROUP BY 1),
       r AS (SELECT day,
               CAST(round(rev, 2) AS DOUBLE) AS revenue,
               CAST(sum(rev) OVER w * 1000000 AS BIGINT) AS rs_micro,
               count(*) OVER w AS n_days
             FROM daily
             WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
       SELECT day, revenue,
              CAST(rs_micro // n_days AS DOUBLE) / 1e6 AS avg_7d
       FROM r ORDER BY day""") { (s, d) =>
    val w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    table(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1998-01-01"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("rev"))
      .select(col("day"),
        round(col("rev"), 2).cast("double").as("revenue"),
        (sum("rev").over(w) * 1000000).cast("long").as("rs_micro"),
        count(lit(1)).over(w).as("n_days"))
      .selectExpr("day", "revenue",
        "CAST(rs_micro div n_days AS DOUBLE) / 1e6 AS avg_7d")
      .orderBy("day")
  }

  // ----------------------------------------------------- exact percentiles

  /** Exact interpolated percentiles (p50/p90) of per-day event counts by
   * type — both engines use the same index = p*(n-1) linear
   * interpolation over integer counts, so the doubles agree bit-exactly. */
  val q85Percentiles: Q = Q("q85_percentiles",
    """WITH daily AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             count(*) AS n FROM events GROUP BY 1, 2)
       SELECT event_type,
              CAST(count(*) AS BIGINT) AS n_days,
              round(quantile_cont(n, 0.5), 2) AS p50,
              round(quantile_cont(n, 0.9), 2) AS p90
       FROM daily GROUP BY event_type ORDER BY event_type""") { (s, d) =>
    table(s, d, "events")
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        round(expr("percentile(n, 0.5)"), 2).as("p50"),
        round(expr("percentile(n, 0.9)"), 2).as("p90"))
      .orderBy("event_type")
  }

  // ------------------------------------------------------------------ cube

  /** CUBE over (status, priority): all four grouping sets in one pass —
   * Spark expands the cube BEFORE the shuffle (one exchange for all
   * rollup levels). Null group labels are coalesced to 'ALL' so the
   * label, not engine-specific null ordering, carries the semantics;
   * grouping_id is emitted and checked bit-for-bit. */
  val q86Cube: Q = Q("q86_cube",
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
              coalesce(o_orderpriority, 'ALL') AS priority,
              CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
              count(*) AS n,
              CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
       FROM orders
       GROUP BY CUBE (o_orderstatus, o_orderpriority)
       ORDER BY gid, status, priority""") { (s, d) =>
    table(s, d, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(18,6)")), 2)
          .cast("double").as("revenue"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("n"), col("revenue"))
      .orderBy("gid", "status", "priority")
  }

  // ------------------------------------------------------------ salted join

  /** Skew-safe salted join proven semantics-preserving: lineitem routed
   * by a deterministic md5 salt, orders replicated per salt, joined on
   * (orderkey, salt) — the oracle replays a PLAIN join, so the salting
   * is hash-proven to change the plan, not the result. */
  val q87SaltedJoin: Q = Q("q87_salted_join",
    """SELECT o.o_orderstatus,
              count(*) AS n_items,
              CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       GROUP BY 1 ORDER BY 1""") { (s, d) =>
    graft.ops.Relational.saltedJoin(
        probe = table(s, d, "lineitem")
          .select(col("l_orderkey").as("o_orderkey"),
            col("l_extendedprice"), col("l_linenumber")),
        build = table(s, d, "orders").select("o_orderkey", "o_orderstatus"),
        keys = Seq("o_orderkey"), salts = 8,
        saltSource = concat_ws("#", col("o_orderkey"), col("l_linenumber")))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice").cast("decimal(18,6)")), 2)
          .cast("double").as("revenue"))
      .orderBy("o_orderstatus")
  }

  // --------------------------------------------------- fixed-k group sample

  /** Deterministic fixed-size per-stratum sample: the k docs with the
   * smallest md5 hash per (lang) — uniform-without-replacement by hash
   * order (the distributed equivalent of a per-group reservoir), fully
   * reproducible at any partitioning. */
  val q88GroupSample: Q = Q("q88_group_sample",
    """WITH h AS (SELECT lang, doc_id,
           ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS hk
         FROM documents)
       SELECT lang, doc_id,
              row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS pick
       FROM h QUALIFY pick <= 4 ORDER BY lang, pick""") { (s, d) =>
    val w = Window.partitionBy("lang")
      .orderBy(col("hk").asc, col("doc_id").asc)
    table(s, d, "documents")
      .select(col("lang"), col("doc_id"),
        graft.ops.Exprs.md5Long(col("doc_id")).as("hk"))
      .withColumn("pick", row_number().over(w).cast("long"))
      .filter(col("pick") <= 4)
      .select("lang", "doc_id", "pick")
      .orderBy("lang", "pick")
  }

  // ---------------------------------------------------- stream-static join

  /** Stream-static enrichment: the event stream broadcast-joins the
   * customer dimension per micro-batch and aggregates per segment. The
   * oracle replays the BATCH join+agg in SQL — the streaming output
   * itself is hash-checked against batch truth. */
  val q89StreamEnrich: Q = Q("q89_stream_enrich",
    """SELECT c.c_mktsegment,
              count(*) AS n_events,
              count(CASE WHEN e.event_type = 'purchase' THEN 1 END) AS n_purchases
       FROM events e JOIN customer c ON e.user_id = c.c_custkey
       GROUP BY 1 ORDER BY 1""") { (s, d) =>
    graft.streaming.StreamingDemand.runEnrichedToBatch(s, d,
      dim = table(s, d, "customer").select("c_custkey", "c_mktsegment"),
      dimKey = "c_custkey", dimAttr = "c_mktsegment")
  }

  // -------------------------------------------------------------- histogram

  /** Fixed-width histogram of document length per language — bucket
   * assignment is pure integer arithmetic (`least(n_chars div 100, 9)`),
   * so the distribution is bit-identical in any engine. */
  val q90Histogram: Q = Q("q90_histogram",
    """SELECT lang, least(n_chars // 100, 9) AS bucket, count(*) AS n
       FROM documents GROUP BY 1, 2 ORDER BY lang, bucket""") { (s, d) =>
    table(s, d, "documents")
      .groupBy(col("lang"),
        least(expr("n_chars div 100"), lit(9L)).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "bucket")
  }

  // --------------------------------------------------------- column profile

  /** One-pass per-column data-quality profile of the documents table —
   * null/blank/exact-distinct counts for every column, computed in a
   * single aggregate and unpivoted driver-side (bounded by column count). */
  val q91Profile: Q = Q("q91_profile",
    """WITH s AS (SELECT count(*) AS n_rows,
             count(CASE WHEN doc_id IS NULL THEN 1 END) AS nu_doc_id,
             count(DISTINCT doc_id) AS d_doc_id,
             count(CASE WHEN text IS NULL THEN 1 END) AS nu_text,
             count(CASE WHEN trim(text) = '' THEN 1 END) AS b_text,
             count(DISTINCT text) AS d_text,
             count(CASE WHEN lang IS NULL THEN 1 END) AS nu_lang,
             count(CASE WHEN trim(lang) = '' THEN 1 END) AS b_lang,
             count(DISTINCT lang) AS d_lang,
             count(CASE WHEN source IS NULL THEN 1 END) AS nu_source,
             count(CASE WHEN trim(source) = '' THEN 1 END) AS b_source,
             count(DISTINCT source) AS d_source,
             count(CASE WHEN n_chars IS NULL THEN 1 END) AS nu_n_chars,
             count(DISTINCT n_chars) AS d_n_chars
           FROM documents)
       SELECT t.* FROM s, LATERAL (VALUES
         ('doc_id', nu_doc_id, CAST(0 AS BIGINT), d_doc_id, n_rows),
         ('text', nu_text, b_text, d_text, n_rows),
         ('lang', nu_lang, b_lang, d_lang, n_rows),
         ('source', nu_source, b_source, d_source, n_rows),
         ('n_chars', nu_n_chars, CAST(0 AS BIGINT), d_n_chars, n_rows))
         t("column", n_null, n_blank, n_distinct, n_rows)
       ORDER BY "column"""") { (s, d) =>
    graft.ops.Profile.profile(table(s, d, "documents"))
      .orderBy("column")
  }

  // ---------------------------------------------------------------- upsert

  /** Latest-wins upsert: a delta (every 10th order re-priced +10% and
   * re-prioritized) merged into the base snapshot; delta rows replace,
   * untouched rows survive. Prices are integer CENTS throughout —
   * +10% on 2-decimal money lands on half-cent ties where decimal and
   * double rounding diverge across engines, so the re-price is
   * `cents*110 div 100` (exact floor, any engine). The oracle replays
   * the merge as anti-join + union — same semantics, independently
   * spelled. */
  val q92Upsert: Q = Q("q92_upsert",
    """WITH base AS (SELECT o_orderkey, o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
       delta AS (SELECT o_orderkey, 'X-UPDATED' AS o_orderpriority,
             cents * 110 // 100 AS cents
           FROM base WHERE o_orderkey % 10 = 0),
       merged AS (
         SELECT * FROM base
         WHERE o_orderkey NOT IN (SELECT o_orderkey FROM delta)
         UNION ALL SELECT * FROM delta)
       SELECT o_orderpriority, count(*) AS n,
              CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100 AS total
       FROM merged GROUP BY 1 ORDER BY 1""") { (s, d) =>
    val base = table(s, d, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val delta = base.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"),
        lit("X-UPDATED").as("o_orderpriority"),
        expr("cents * 110 div 100").as("cents"))
    graft.ops.Relational.upsertLatest(base, delta, Seq("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        (sum("cents").cast("double") / 100).as("total"))
      .orderBy("o_orderpriority")
  }

  /** Rendezvous (highest-random-weight) shard assignment + rebalance
   * disruption: shard(key) = argmax over shards of md5(shard:key) —
   * stateless, ring-free consistent placement (Thaler & Ravishankar
   * 1998; the assignment rule behind cache/partition placement in
   * production systems). Adding shard 8 to an 8-shard fleet must move
   * ONLY the keys the new shard now wins — expected 1/9 of them —
   * and every key's assignment is deterministic md5 integer
   * arithmetic, so the oracle replays placements, per-shard counts
   * and the measured moved_ppm exactly. Map-side hash fan-out (keys ×
   * 9 literal shards), one keyed argmax shuffle per fleet size; no
   * coordination state anywhere. */
  val q291Rendezvous: Q = Q("q291_rendezvous",
    """WITH ks AS (SELECT c_custkey AS k, s,
         ('0x'||substr(md5(CAST(s AS VARCHAR)||':'||CAST(c_custkey AS VARCHAR)),1,15))::BIGINT AS h
       FROM customer CROSS JOIN range(9) r(s)),
       a8 AS (SELECT k, s AS shard FROM (
                SELECT k, s, row_number() OVER (PARTITION BY k ORDER BY h DESC, s DESC) AS rn
                FROM ks WHERE s < 8) WHERE rn = 1),
       a9 AS (SELECT k, s AS shard FROM (
                SELECT k, s, row_number() OVER (PARTITION BY k ORDER BY h DESC, s DESC) AS rn
                FROM ks) WHERE rn = 1),
       mv AS (SELECT CAST(count(*) FILTER (WHERE a8.shard <> a9.shard) * 1000000
                       // count(*) AS BIGINT) AS moved_ppm
              FROM a8 JOIN a9 USING (k)),
       c8 AS (SELECT shard, CAST(count(*) AS BIGINT) AS n FROM a8 GROUP BY shard),
       c9 AS (SELECT shard, CAST(count(*) AS BIGINT) AS n FROM a9 GROUP BY shard)
       SELECT CAST(r.s AS BIGINT) AS shard,
              coalesce(c8.n, 0) AS n_keys_8, coalesce(c9.n, 0) AS n_keys_9,
              mv.moved_ppm
       FROM range(9) r(s)
       LEFT JOIN c8 ON c8.shard = r.s LEFT JOIN c9 ON c9.shard = r.s, mv
       ORDER BY shard""") { (s, d) =>
    import graft.ops.Exprs
    val keys = table(s, d, "customer").select(col("c_custkey").as("k"))
      .localCheckpoint() // feeds both fleet sizes
    val ks = keys.select(col("k"),
        explode(array((0 until 9).map(i => lit(i.toLong)): _*)).as("s"))
      .withColumn("h", Exprs.md5Long(
        concat(col("s").cast("string"), lit(":"), col("k").cast("string"))))
    // argmax by (h, s): max of the struct is lexicographic — h first,
    // shard id as the deterministic tiebreak
    def assign(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(max(struct(col("h"), col("s"))).as("m"))
        .select(col("k"), col("m.s").as("shard"))
    val a8 = assign(ks.filter(col("s") < 8)).localCheckpoint()
    val a9 = assign(ks).localCheckpoint()
    val mv = a8.withColumnRenamed("shard", "s8")
      .join(a9.withColumnRenamed("shard", "s9"), "k")
      .agg(sum(when(col("s8") =!= col("s9"), 1L).otherwise(0L)).as("nm"),
        count(lit(1)).as("nt"))
      .select(expr("nm * 1000000 div nt").as("moved_ppm"))
    val shards = s.range(9).select(col("id").as("shard"))
    broadcast(shards)
      .join(broadcast(a8.groupBy("shard").agg(count(lit(1)).as("n_keys_8"))),
        Seq("shard"), "left")
      .join(broadcast(a9.groupBy("shard").agg(count(lit(1)).as("n_keys_9"))),
        Seq("shard"), "left")
      .crossJoin(broadcast(mv))
      .select(col("shard"),
        coalesce(col("n_keys_8"), lit(0L)).as("n_keys_8"),
        coalesce(col("n_keys_9"), lit(0L)).as("n_keys_9"),
        col("moved_ppm"))
      .orderBy("shard")
  }

  val all: Seq[Q] = Seq(q75AsofJoin, q76RangeJoin, q77Bm25, q78SpanDedup,
    q79DomainQuota, q80Surprisal, q81SeqPacking, q82Int8Quant,
    q83ClusterKeepBest, q84RollingAvg, q85Percentiles, q86Cube,
    q87SaltedJoin, q88GroupSample, q89StreamEnrich, q90Histogram,
    q91Profile, q92Upsert, q291Rendezvous, q312NearestMatch)
}
