package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Sources.table
import graft.ops.Exprs
import graft.sim.Similarity
import graft.text.{Search, TextAnalysis}

/**
 * Corpus-preparation operators a pretraining-data pipeline runs after
 * cleaning and before packing: context-window chunking, tokenizer
 * coverage (OOV rate), semantically-stratified sampling, distribution
 * shape (skewness/kurtosis), and hybrid-retrieval rank fusion.
 * Reference analog: the reference has no corpus stage (SURVEY.md §2.1 —
 * it is an Excel-fed reporting app); these extend the engine the same
 * way the dedup/ANN family does, with every arithmetic step replayed by
 * the DuckDB oracle (md5-derived hashes, integer-micro scores, exact
 * BIGINT moment sums).
 */
object CorpusQueries {

  // ------------------------------------------------- context-window chunking

  /** Whole-corpus chunk MANIFEST (size 40, stride 30): one row per chunk
   * with its token count and a 60-bit content hash — the at-scale
   * companion to q73's bounded chunk-text demo (q73 emits the chunk
   * STRINGS for a 50-doc slice; this emits hashes for every doc, the
   * form a chunk-level dedup or audit joins against without shipping
   * text). Fully map-side at any scale: `sequence` +
   * `explode` + `slice` expand each document independently, no shuffle
   * at all before the presentation sort — the 100 TB shape is
   * "read docs, write chunks". Chunk starts step by the stride while
   * `< n_tokens`, so a final short chunk keeps the tail; DuckDB's
   * inclusive `w[a:b]` slice and Spark's `slice(w, start, len)` both
   * clamp at the array end. */
  val q188Chunking: Q = Q("q188_chunking",
    """WITH tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
                    FROM documents),
       st AS (SELECT doc_id, w, unnest(range(0, len(w), 30)) AS st
              FROM tok WHERE len(w) >= 1),
       c AS (SELECT doc_id, st // 30 AS chunk_idx, w[st+1:st+40] AS c FROM st)
       SELECT doc_id, chunk_idx, CAST(len(c) AS BIGINT) AS n_tok,
              ('0x'||substr(md5(array_to_string(c, ' ')),1,15))::BIGINT AS chunk_h
       FROM c ORDER BY doc_id, chunk_idx""") { (s, d) =>
    table(s, d, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 1)
      .withColumn("st", explode(sequence(lit(0), size(col("w")) - 1, lit(30))))
      .select(col("doc_id"), (col("st") / 30).cast("long").as("chunk_idx"),
        slice(col("w"), col("st") + 1, lit(40)).as("c"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("c")).cast("long").as("n_tok"),
        Exprs.md5Long(concat_ws(" ", col("c"))).as("chunk_h"))
      .orderBy("doc_id", "chunk_idx")
  }

  // --------------------------------------------------- tokenizer coverage

  /** Tokenizer-coverage audit: the corpus' top-20 tokens stand in for a
   * fixed tokenizer vocabulary; per source, the fraction of token
   * occurrences falling OUTSIDE it (OOV rate — the go/no-go signal for
   * tokenizer/corpus fit). Vocabulary selection is one word-count
   * shuffle whose result is vocabulary-sized (tiny by nature), so the
   * membership join broadcasts and the corpus streams past it map-side;
   * the per-doc then per-source aggregates both partial map-side. Ties
   * at the vocabulary boundary break on the token string — deterministic
   * at any partitioning. The per-source mean OOV rate is integer ppm:
   * each doc's fraction quantizes to ppm BEFORE the cross-doc sum (a
   * raw double avg would depend on partition addition order), and the
   * mean is one integer division at the end. */
  val q189OovRate: Q = Q("q189_oov_rate",
    """WITH tok AS (SELECT doc_id, source,
           unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
         FROM documents),
       vocab AS (SELECT w FROM (SELECT w, count(*) AS c FROM tok GROUP BY w
                 ORDER BY c DESC, w LIMIT 20)),
       per AS (SELECT t.doc_id, t.source, count(*) AS n_tok,
                      sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS n_oov
               FROM tok t LEFT JOIN vocab v ON t.w = v.w GROUP BY 1, 2),
       ppm AS (SELECT source, n_tok, n_oov,
                 CAST(round(1000000.0 * n_oov / n_tok, 0) AS BIGINT) AS oov_ppm
               FROM per)
       SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tok,
              CAST(sum(n_oov) AS BIGINT) AS sum_oov,
              CAST(sum(oov_ppm) AS BIGINT) // count(*) AS avg_oov_ppm
       FROM ppm GROUP BY source ORDER BY source""") { (s, d) =>
    val tok = table(s, d, "documents")
      .select(col("doc_id"), col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
    val vocab = tok.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(20)
      .select(col("w"), lit(1).as("in_v"))
    tok.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm",
        round(lit(1000000.0) * col("n_oov") / col("n_tok"), 0).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tok"),
        sum("n_oov").as("sum_oov"), sum("oov_ppm").as("sum_ppm"))
      .withColumn("avg_oov_ppm", expr("sum_ppm div n_docs"))
      .drop("sum_ppm")
      .orderBy("source")
  }

  // ---------------------------------------------- LSH-stratified sampling

  /** Semantically-stratified sample: 2 vectors per hyperplane-LSH bucket,
   * picked by md5-hash order within the bucket (cluster-balanced data
   * selection — uniform hash sampling over-represents dense regions;
   * stratifying by locality bucket caps each region's contribution).
   * One scan; the window partitions by stratum, so state per partition
   * is the running top-2, never the bucket contents. At 100 TB the
   * 2^8 strata of [[Similarity.numPlanes]] planes would hot-spot — the
   * knob is more planes (strata grow 2^planes), not a different plan. */
  val q190StratifiedSample: Q = Q("q190_stratified_sample",
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                   FROM embeddings),
       b AS (SELECT vec_id, CAST(${TextQueries.bucketTerms} AS BIGINT) AS stratum FROM v),
       r AS (SELECT stratum, vec_id,
                    row_number() OVER (PARTITION BY stratum
                      ORDER BY ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,15))::BIGINT,
                               vec_id) AS pick
             FROM b)
       SELECT stratum, pick, vec_id FROM r WHERE pick <= 2
       ORDER BY stratum, pick""") { (s, d) =>
    val w = Window.partitionBy("stratum")
      .orderBy(Exprs.md5Long(col("vec_id")).asc, col("vec_id").asc)
    table(s, d, "embeddings")
      .select(col("vec_id"),
        Similarity.lshBucket(col("embedding"), dim = 64).as("stratum"))
      .withColumn("pick", row_number().over(w).cast("long"))
      .filter(col("pick") <= 2)
      .select("stratum", "pick", "vec_id")
      .orderBy("stratum", "pick")
  }

  // ------------------------------------------------- distribution shape

  /** Per-language length-distribution shape: skewness and excess
   * kurtosis of n_chars from exact BIGINT power sums (Σx..Σx⁴) — the
   * one-pass, merge-exact spelling of the corpus-length audit (a
   * long-tail length distribution is a standard pretraining red flag).
   * Every Σ is integer-exact at any partitioning; only the final
   * central-moment arithmetic is floating point, with the expression
   * tree mirrored token-for-token in the oracle (no `pow` — `pow` may
   * differ by an ulp across libm implementations; squares/cubes are
   * spelled as products and the 1.5 power as v*sqrt(v)).
   * A zero-variance group yields NULL for both shape statistics via the
   * overflow-free test min(x) = max(x) — Spark's 0.0/0.0 is NaN but
   * DuckDB's is NULL, so the guard IS the cross-engine contract (a
   * product test like n·Σx² = (Σx)² would itself overflow BIGINT long
   * before the power sums do).
   * Headroom: Σx⁴ at n_chars ≤ 1000 overflows BIGINT past ~9e6
   * rows/group — past that, route the sums through DECIMAL(38,0) (the
   * house pattern for money) at unchanged plan shape. */
  val q191Moments: Q = Q("q191_moments",
    """WITH m AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(n_chars) AS BIGINT) AS s1,
                    CAST(sum(n_chars*n_chars) AS BIGINT) AS s2,
                    CAST(sum(n_chars*n_chars*n_chars) AS BIGINT) AS s3,
                    CAST(sum(n_chars*n_chars*n_chars*n_chars) AS BIGINT) AS s4,
                    min(n_chars) = max(n_chars) AS zerovar
                  FROM documents GROUP BY lang),
       d AS (SELECT lang, n, zerovar,
                    CAST(s1 AS DOUBLE)/n AS m1, CAST(s2 AS DOUBLE)/n AS m2r,
                    CAST(s3 AS DOUBLE)/n AS m3r, CAST(s4 AS DOUBLE)/n AS m4r FROM m),
       c AS (SELECT lang, n, zerovar, m2r - m1*m1 AS v,
                    m3r - 3.0*m1*m2r + 2.0*m1*m1*m1 AS m3,
                    m4r - 4.0*m1*m3r + 6.0*m1*m1*m2r - 3.0*m1*m1*m1*m1 AS m4
             FROM d)
       SELECT lang, n,
              CASE WHEN zerovar THEN NULL
                   ELSE round(m3 / (v * sqrt(v)), 4) END AS skewness,
              CASE WHEN zerovar THEN NULL
                   ELSE round(m4 / (v * v) - 3.0, 4) END AS excess_kurtosis
       FROM c ORDER BY lang""") { (s, d) =>
    momentShape(table(s, d, "documents"), "lang", "n_chars").orderBy("lang")
  }

  /** The engine side of q191's moment arithmetic, shared with the spec's
   * planted-distribution tests so the PRODUCTION expressions (not a
   * copy) are what recovers the planted shapes. Output:
   * (groupCol, n, skewness, excess_kurtosis). */
  private[graft] def momentShape(df: org.apache.spark.sql.DataFrame,
                                 groupCol: String, valueCol: String) = {
    val x = col(valueCol)
    val m = df.groupBy(groupCol).agg(
      count(lit(1)).as("n"), sum(x).as("s1"), sum(x * x).as("s2"),
      sum(x * x * x).as("s3"), sum(x * x * x * x).as("s4"),
      (min(x) === max(x)).as("zerovar"))
    val dd = m.select(col(groupCol), col("n"), col("zerovar"),
      (col("s1").cast("double") / col("n")).as("m1"),
      (col("s2").cast("double") / col("n")).as("m2r"),
      (col("s3").cast("double") / col("n")).as("m3r"),
      (col("s4").cast("double") / col("n")).as("m4r"))
    val c = dd.select(col(groupCol), col("n"), col("zerovar"),
      (col("m2r") - col("m1") * col("m1")).as("v"),
      (col("m3r") - lit(3.0) * col("m1") * col("m2r")
        + lit(2.0) * col("m1") * col("m1") * col("m1")).as("m3"),
      (col("m4r") - lit(4.0) * col("m1") * col("m3r")
        + lit(6.0) * col("m1") * col("m1") * col("m2r")
        - lit(3.0) * col("m1") * col("m1") * col("m1") * col("m1")).as("m4"))
    c.select(col(groupCol), col("n"),
      when(col("zerovar"), lit(null))
        .otherwise(round(col("m3") / (col("v") * sqrt(col("v"))), 4))
        .as("skewness"),
      when(col("zerovar"), lit(null))
        .otherwise(round(col("m4") / (col("v") * col("v")) - lit(3.0), 4))
        .as("excess_kurtosis"))
  }

  // ------------------------------------------------ reciprocal-rank fusion

  private val rrfTermsA = Seq("dup", "key", "fast")
  private val rrfTermsB = Seq("merge", "stream")
  private val rrfK = 60

  /** Oracle CTE chain computing one BM25 top-20 ranking (q77's replay,
   * parameterized by term set and CTE suffix; `base`/`d`/`stats` are
   * shared by both rankings). */
  private def bm25RankCtes(terms: Seq[String], sfx: String): String = {
    val in = terms.map(t => s"'$t'").mkString(", ")
    s"""tf$sfx AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
              FROM (SELECT b.doc_id, d.dl, unnest(b.toks) AS term
                    FROM base b JOIN d USING (doc_id))
              WHERE term IN ($in) GROUP BY 1, 2, 3),
       idf$sfx AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf$sfx GROUP BY term),
       sc$sfx AS (SELECT t.doc_id,
                CAST(round(ln((s.n_docs - i.df + 0.5) / (i.df + 0.5) + 1.0)
                     * (t.tf * CAST(2.2 AS DOUBLE))
                     / (t.tf + CAST(1.2 AS DOUBLE)
                        * (CAST(0.25 AS DOUBLE)
                           + CAST(0.75 AS DOUBLE) * t.dl / s.avgdl))
                     * 1e6) AS BIGINT) AS sm
              FROM tf$sfx t JOIN idf$sfx i USING (term) CROSS JOIN stats s),
       r$sfx AS (SELECT doc_id,
                row_number() OVER (ORDER BY sum(sm) DESC, doc_id) AS rank
              FROM sc$sfx GROUP BY doc_id QUALIFY rank <= 20)"""
  }

  /** Hybrid-retrieval rank fusion: two BM25 top-20 rankings (distinct
   * term sets — the stand-in for the usual lexical + dense pair) fused
   * by reciprocal-rank-fusion score Σ 1/(60+rank), quantized to integer
   * micro-units per list BEFORE the sum so the fused ordering is exact
   * and order-proof. A doc present in only one list contributes only
   * that list's term (the other coalesces to 0) — full-outer fusion,
   * never dropping a single-list hit. Both ranked lists are top-k-sized
   * (bounded), so the fusion join and final window are driver-trivial at
   * any corpus scale; the heavy lifting is the two BM25 passes, each
   * term-filtered before any shuffle (see [[Search.bm25TopK]]). */
  val q192RrfFusion: Q = Q("q192_rrf_fusion",
    s"""WITH base AS (SELECT doc_id,
           string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents),
       d AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM base),
       stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM d),
       ${bm25RankCtes(rrfTermsA, "a")},
       ${bm25RankCtes(rrfTermsB, "b")},
       f AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                    a.rank AS rank_a, b.rank AS rank_b,
                    coalesce(CAST(round(1000000.0/($rrfK + a.rank), 0) AS BIGINT), 0)
                    + coalesce(CAST(round(1000000.0/($rrfK + b.rank), 0) AS BIGINT), 0)
                      AS rrf_micro
             FROM ra a FULL OUTER JOIN rb b ON a.doc_id = b.doc_id)
       SELECT row_number() OVER (ORDER BY rrf_micro DESC, doc_id) AS fused_rank,
              doc_id, rrf_micro, rank_a, rank_b
       FROM f QUALIFY fused_rank <= 10 ORDER BY fused_rank""") { (s, d) =>
    val docs = table(s, d, "documents")
    val Seq(a0, b0) =
      Search.bm25TopKMulti(docs, Seq(rrfTermsA, rrfTermsB), k = 20)
    val a = a0.select(col("doc_id"), col("rank").as("rank_a"))
    val b = b0.select(col("doc_id"), col("rank").as("rank_b"))
    def rrfTerm(rank: org.apache.spark.sql.Column) =
      coalesce(round(lit(1000000.0) / (lit(rrfK) + rank), 0).cast("long"), lit(0L))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("rrf_micro", rrfTerm(col("rank_a")) + rrfTerm(col("rank_b")))
      .withColumn("fused_rank", row_number().over(
        Window.orderBy(col("rrf_micro").desc, col("doc_id").asc)).cast("long"))
      .filter(col("fused_rank") <= 10)
      .select("fused_rank", "doc_id", "rrf_micro", "rank_a", "rank_b")
      .orderBy("fused_rank")
  }

  // ------------------------------------------------- survival analysis

  /** Kaplan–Meier survival over the signup→purchase funnel: per signup
   * user, time-to-first-purchase in whole days (censored at the corpus
   * horizon when no purchase follows), then the classic KM table per
   * event day — n_risk, n_events, and the product-limit survival
   * estimate. Integer skeleton end-to-end: durations, risk counts and
   * death counts are exact at any partitioning; only the final
   * product-limit step is floating point (exp∘Σln over the SORTED
   * ≤horizon-sized day table — deterministic order, so no
   * associativity hazard), mirrored exactly in the oracle. A zero
   * survival factor (d = n_risk) can only occur on the LAST event day
   * (nobody survives past it, so no later row exists); the ln argument
   * is guarded to 1.0 there and the row's survival overridden to 0.0 —
   * DuckDB hard-errors on ln(0) while Spark yields null, so the guard
   * is a cross-engine parity requirement, not a nicety.
   * Scale shape: ONE signup/purchase-filtered pass over events (the
   * user window + aggregate share its shuffle) plus one max-ts scan —
   * the ≤2-scans-per-table pin holds; n_risk is a SUFFIX window sum
   * (Σ n_end over t' ≥ t) so no separate total branch re-derives the
   * pipeline. Everything past the user aggregate is a ≤horizon-day
   * table. */
  val q193Survival: Q = Q("q193_survival",
    """WITH su AS (SELECT user_id, min(ts) AS t0 FROM events
                   WHERE event_type = 'signup' GROUP BY user_id),
       fp AS (SELECT s.user_id, s.t0, min(CASE WHEN e.ts >= s.t0 THEN e.ts END) AS td
              FROM su s LEFT JOIN events e
                ON e.user_id = s.user_id AND e.event_type = 'purchase'
              GROUP BY s.user_id, s.t0),
       mx AS (SELECT max(ts) AS tmax FROM events),
       dur AS (SELECT CASE WHEN td IS NULL
                        THEN date_diff('day', CAST(t0 AS DATE), CAST(m.tmax AS DATE))
                        ELSE date_diff('day', CAST(t0 AS DATE), CAST(td AS DATE)) END AS t,
                      CASE WHEN td IS NULL THEN 0 ELSE 1 END AS ev
               FROM fp CROSS JOIN mx m),
       day AS (SELECT t, count(*) AS n_end, CAST(sum(ev) AS BIGINT) AS d
               FROM dur GROUP BY t),
       risk AS (SELECT t, n_end, d,
                  sum(n_end) OVER (ORDER BY t
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
                FROM day),
       km AS (SELECT t, d, n_risk FROM risk WHERE d > 0)
       SELECT CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk,
              d AS n_events,
              CASE WHEN d = n_risk THEN 0.0
                   ELSE round(exp(sum(ln(CASE WHEN d = n_risk THEN 1.0
                                              ELSE 1.0 - CAST(d AS DOUBLE)/n_risk END))
                       OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 4)
              END AS survival
       FROM km ORDER BY t""") { (s, d) =>
    val ev = table(s, d, "events")
    // one filtered scan: t0 via user window, first-qualifying purchase
    // via the same user-keyed aggregate (the window's shuffle is reused)
    val wUser = Window.partitionBy("user_id")
    val ua = ev.filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t0",
        min(when(col("event_type") === "signup", col("ts"))).over(wUser))
      .filter(col("t0").isNotNull)
      .groupBy("user_id", "t0")
      .agg(min(when(col("event_type") === "purchase" && col("ts") >= col("t0"),
        col("ts"))).as("td"))
    val mx = ev.agg(max("ts").as("tmax"))
    val dur = ua.crossJoin(broadcast(mx)).select(
      when(col("td").isNull, datediff(to_date(col("tmax")), to_date(col("t0"))))
        .otherwise(datediff(to_date(col("td")), to_date(col("t0")))).as("t"),
      when(col("td").isNull, 0).otherwise(1).as("ev"))
    val day = dur.groupBy("t")
      .agg(count(lit(1)).as("n_end"), sum("ev").cast("long").as("d"))
    val wSuffix = Window.orderBy("t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = day.withColumn("n_risk", sum("n_end").over(wSuffix))
    risk.filter(col("d") > 0)
      .select(col("t").cast("long").as("t"),
        col("n_risk").cast("long").as("n_risk"),
        col("d").as("n_events"),
        when(col("d") === col("n_risk"), lit(0.0)).otherwise(
          round(exp(sum(log(when(col("d") === col("n_risk"), lit(1.0))
            .otherwise(lit(1.0) - col("d").cast("double") / col("n_risk"))))
            .over(wCum)), 4)).as("survival"))
      .orderBy("t")
  }

  // --------------------------------------------- rolling-window anomaly

  /** Rolling z-score anomaly flags over daily event volumes: per event
   * type, each CALENDAR day's count against the trailing 7 calendar
   * days' mean and sample stddev. The day axis is densified against a
   * type × day spine (zero-event days enter as n = 0) — without the
   * spine the window is "7 most recent ACTIVE days", an outage day
   * (the classic anomaly) never enters the series, and a sparse series
   * baselines over arbitrarily long ranges. Window statistics derive
   * from exact integer sums (Σn, Σn²) so they are
   * partition-order-proof; the first six days of the spine (incomplete
   * window) are excluded. The anomaly flag compares the ROUNDED z; a
   * zero-variance window yields NULL z via the overflow-free
   * min = max window test (Spark's 0.0/0.0 is NaN, DuckDB's is NULL).
   * Scale shape: ONE keyed day-count aggregate over events,
   * checkpointed (it is bounded by types × days, not data) so the
   * spine bounds and the dense join derive from it without re-scanning
   * events; the window runs over the dense calendar table. */
  val q194RollingZscore: Q = Q("q194_rolling_zscore",
    """WITH dc AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
                   FROM events GROUP BY 1, 2),
       bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM dc),
       days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
                FROM bounds),
       types AS (SELECT DISTINCT event_type FROM dc),
       dense AS (SELECT t.event_type, dd.day, coalesce(c.n, 0) AS n
                 FROM types t CROSS JOIN days dd
                 LEFT JOIN dc c ON c.event_type = t.event_type AND c.day = dd.day),
       w AS (SELECT event_type, day, n,
               CAST(count(*) OVER win AS BIGINT) AS wn,
               CAST(sum(n) OVER win AS BIGINT) AS s1,
               CAST(sum(n*n) OVER win AS BIGINT) AS s2,
               min(n) OVER win = max(n) OVER win AS zerovar
             FROM dense WINDOW win AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
       z AS (SELECT event_type, day, n,
               CASE WHEN zerovar THEN NULL
                    ELSE round((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE)/wn)
                      / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/wn) / (wn - 1)), 4)
               END AS zscore
             FROM w WHERE wn = 7)
       SELECT event_type, day, n, zscore, abs(zscore) > 2.0 AS is_anomaly
       FROM z ORDER BY event_type, day""") { (s, d) =>
    // bounded by types × days — safe to materialize at any corpus scale
    val dc = table(s, d, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val days = dc.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"),
        expr("INTERVAL 1 DAY"))).as("day"))
    val dense = dc.select("event_type").distinct()
      .crossJoin(broadcast(days))
      .join(dc, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("n"))
    val win = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-6, Window.currentRow)
    dense
      .select(col("event_type"), col("day"), col("n"),
        count(lit(1)).over(win).as("wn"),
        sum("n").over(win).as("s1"),
        sum(col("n") * col("n")).over(win).as("s2"),
        (min("n").over(win) === max("n").over(win)).as("zerovar"))
      .filter(col("wn") === 7)
      .withColumn("zscore",
        when(col("zerovar"), lit(null))
          .otherwise(
            round((col("n").cast("double") - col("s1").cast("double") / col("wn"))
              / sqrt((col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("wn"))
                / (col("wn") - 1)), 4)))
      .select(col("event_type"), col("day"), col("n"), col("zscore"),
        (abs(col("zscore")) > 2.0).as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  // ------------------------------------------------ retrieval evaluation

  /** NDCG@5 of the LSH-bucketed ANN against brute-force cosine truth —
   * the retrieval-quality eval an ANN rollout gates on (recall@k is
   * q54's gate; NDCG additionally penalizes ranking the hits low).
   * Binary relevance = membership in the exact top-5; per-rank DCG and
   * ideal-DCG terms are quantized to integer micro-units BEFORE the
   * per-query sum (the BM25 trick), so only the final ndcg division is
   * floating point. Queries whose bucket returns fewer than 5
   * candidates are scored over the returned ranks (ideal shrinks with
   * them); a query with an empty bucket is absent — both engines agree.
   * Scale: both rankings are bucket/broadcast-bounded (q42/q39 plans);
   * the BOUNDED query slice is checkpointed once so the plan reads the
   * corpus file exactly twice — one pass per ranking (the ≤2-scans pin)
   * — and the eval join touches only 50×5 ranked rows. */
  val q195AnnNdcg: Q = Q("q195_ann_ndcg",
    s"""WITH ${TextQueries.unitCte},
       b AS (SELECT vec_id, CAST(${TextQueries.bucketTerms} AS BIGINT) AS bucket FROM v),
       qb AS (SELECT u.vec_id AS qid, u.u AS qu, b.bucket
              FROM u JOIN b ON u.vec_id = b.vec_id WHERE u.vec_id < 50),
       cb AS (SELECT u.vec_id AS nid, u.u AS cu, b.bucket
              FROM u JOIN b ON u.vec_id = b.vec_id),
       sa AS (SELECT qid, nid, round(list_dot_product(qu, cu), 4) AS sim
              FROM qb JOIN cb ON qb.bucket = cb.bucket AND qid <> nid),
       approx AS (SELECT qid, nid,
                    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
                  FROM sa QUALIFY rank <= 5),
       se AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
                     round(list_dot_product(q.u, c.u), 4) AS sim
              FROM u q JOIN u c ON q.vec_id < 50 AND q.vec_id <> c.vec_id),
       exact AS (SELECT qid, nid,
                   row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
                 FROM se QUALIFY rank <= 5),
       rel AS (SELECT a.qid, a.rank,
                      CASE WHEN e.nid IS NOT NULL THEN 1 ELSE 0 END AS rel
               FROM approx a LEFT JOIN exact e ON a.qid = e.qid AND a.nid = e.nid),
       terms AS (SELECT qid, rel,
                   CAST(round(1000000.0 * rel / log2(CAST(rank + 1 AS DOUBLE)), 0) AS BIGINT) AS term_micro,
                   CAST(round(1000000.0 / log2(CAST(rank + 1 AS DOUBLE)), 0) AS BIGINT) AS ideal_micro
                 FROM rel),
       per AS (SELECT qid, CAST(sum(rel) AS BIGINT) AS n_hits,
                      CAST(sum(term_micro) AS BIGINT) AS dcg_micro,
                      CAST(sum(ideal_micro) AS BIGINT) AS idcg_micro
               FROM terms GROUP BY qid)
       SELECT qid, n_hits, dcg_micro, idcg_micro,
              CAST(round(1000.0 * dcg_micro / idcg_micro, 0) AS BIGINT) AS ndcg_milli
       FROM per ORDER BY qid""") { (s, d) =>
    val emb = table(s, d, "embeddings")
    val q = emb.filter(col("vec_id") < 50).localCheckpoint()
    val approx = Similarity.lshTopK(q, emb, k = 5, dim = 64)
      .select(col("qid"), col("nid"), col("rank"))
    val exact = Similarity.bruteForceTopK(q, emb, k = 5)
      .select(col("qid"), col("nid"), lit(1).as("hit"))
    approx.join(exact, Seq("qid", "nid"), "left")
      .withColumn("rel", coalesce(col("hit"), lit(0)))
      .withColumn("term_micro",
        round(lit(1000000.0) * col("rel") / log2(col("rank") + 1), 0).cast("long"))
      .withColumn("ideal_micro",
        round(lit(1000000.0) / log2(col("rank") + 1), 0).cast("long"))
      .groupBy("qid")
      .agg(sum("rel").cast("long").as("n_hits"),
        sum("term_micro").as("dcg_micro"),
        sum("ideal_micro").as("idcg_micro"))
      .withColumn("ndcg_milli",
        round(lit(1000.0) * col("dcg_micro") / col("idcg_micro"), 0).cast("long"))
      .orderBy("qid")
  }

  // ---------------------------------------------------- privacy audit

  /** k-anonymity / l-diversity audit over the customer table:
   * quasi-identifier classes (nation × market segment) with their
   * sizes, the diversity of the sensitive attribute (distinct
   * account-balance k$-buckets), and the k≥5 verdict per class — the
   * release-gate audit a privacy review runs before sharing
   * quasi-identified rows (k-anonymity: Sweeney 2002; l-diversity:
   * Machanavajjhala 2007). One keyed aggregate; the output is bounded
   * by QI-class cardinality, not rows, at any scale. The sensitive
   * bucket uses `floor` (toward −∞) so negative balances land in
   * deterministic buckets in both engines. */
  val q196KAnonymity: Q = Q("q196_k_anonymity",
    """SELECT c_nationkey, c_mktsegment,
              count(*) AS class_size,
              CAST(count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) AS BIGINT)
                AS l_diversity,
              count(*) >= 5 AS is_k_anon
       FROM customer GROUP BY c_nationkey, c_mktsegment
       ORDER BY c_nationkey, c_mktsegment""") { (s, d) =>
    table(s, d, "customer")
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("class_size"),
        count_distinct(floor(col("c_acctbal") / 1000.0).cast("long"))
          .as("l_diversity"))
      .withColumn("is_k_anon", col("class_size") >= 5)
      .orderBy("c_nationkey", "c_mktsegment")
  }

  // ------------------------------------------- correlated-exists shape

  /** TPC-H Q21-shaped "sole late supplier": suppliers whose lineitem
   * shipped late (> 30 days after the order date) on a multi-supplier
   * order where NO OTHER supplier was late — the classic
   * EXISTS + NOT-EXISTS correlated composition. The whole correlation
   * collapses into ONE per-order aggregate: a qualifying order has
   * exactly one late supplier, so `max(CASE WHEN late THEN suppkey)`
   * recovers it in the same pass that counts suppliers and late
   * suppliers — no self semi join, no per-row subquery (the oracle
   * spells the textbook join form; values are identical by
   * construction). At scale: one broadcast of the orders projection
   * into lineitem, two keyed aggregates, and a supplier-sized tail. */
  val q197SoleLateSupplier: Q = Q("q197_sole_late_supplier",
    """WITH l AS (SELECT li.l_orderkey, li.l_suppkey,
                     CASE WHEN li.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
                          THEN 1 ELSE 0 END AS late
                  FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey),
       per AS (SELECT l_orderkey, l_suppkey, max(late) AS late
               FROM l GROUP BY l_orderkey, l_suppkey),
       ord AS (SELECT l_orderkey,
                      count(*) AS n_supp,
                      CAST(sum(late) AS BIGINT) AS n_late
               FROM per GROUP BY l_orderkey),
       hit AS (SELECT p.l_suppkey
               FROM per p JOIN ord o ON p.l_orderkey = o.l_orderkey
               WHERE p.late = 1 AND o.n_supp >= 2 AND o.n_late = 1)
       SELECT s.s_suppkey, s.s_name, count(*) AS numwait
       FROM hit h JOIN supplier s ON h.l_suppkey = s.s_suppkey
       GROUP BY s.s_suppkey, s.s_name
       ORDER BY numwait DESC, s.s_suppkey LIMIT 20""") { (s, d) =>
    val li = table(s, d, "lineitem")
    val ord = table(s, d, "orders")
    val l = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"), 1)
          .otherwise(0).as("late"))
    val per = l.groupBy("l_orderkey", "l_suppkey")
      .agg(max("late").as("late"))
    val hit = per.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"), sum("late").as("n_late"),
        max(when(col("late") === 1, col("l_suppkey"))).as("l_suppkey"))
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
    hit.join(table(s, d, "supplier"),
        hit("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey").asc)
      .limit(20)
  }

  // --------------------------------------------- perplexity-style filter

  /** Perplexity-band filtering (the CCNet move, on the corpus's own
   * bigram LM instead of a trained one): flag documents whose mean
   * bigram surprisal sits ABOVE the p90 picked threshold (gibberish
   * band) or BELOW p10 (boilerplate/loop band), rolled up per source —
   * the keep/drop action on top of q95's per-doc surprisal table.
   * Thresholds are PICKED elements at deterministic ranks
   * (ceil(0.9·N) / ceil(0.1·N) over (avg_mnat, doc_id) order — the
   * house picked-rank pattern), and avg_mnat is already integer-derived
   * and 2-dec rounded, so band membership replays exactly. Flags use
   * strict inequality: docs AT a threshold stay unflagged.
   * Scale: the per-doc surprisal table is checkpointed (doc-level
   * metadata, the natural cut) so ranking/threshold/rollup reuse it
   * without re-deriving the bigram pipeline. */
  val q199PerplexityFilter: Q = Q("q199_perplexity_filter",
    """WITH tok AS (SELECT doc_id, source,
           string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
       bg AS (SELECT doc_id, source,
                unnest(list_transform(range(1, len(w)), k -> w[k]||' '||w[k+1])) AS bg
              FROM tok WHERE len(w) >= 2),
       v AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY bg),
       pre AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c2) AS c1
               FROM v GROUP BY 1),
       m AS (SELECT bg, CAST(round(-ln(c2 / CAST(c1 AS DOUBLE)) * 1000) AS BIGINT) AS mnat
             FROM v JOIN pre ON split_part(v.bg, ' ', 1) = pre.w1),
       per AS (SELECT doc_id, source,
                 round(CAST(sum(mnat) AS BIGINT) / CAST(count(*) AS DOUBLE), 2) AS avg_mnat
               FROM bg JOIN m USING (bg) GROUP BY doc_id, source),
       n AS (SELECT count(*) AS n FROM per),
       rk AS (SELECT doc_id, source, avg_mnat,
                row_number() OVER (ORDER BY avg_mnat, doc_id) AS r FROM per),
       th AS (SELECT max(CASE WHEN r = CAST(ceil(0.9 * n) AS BIGINT)
                              THEN avg_mnat END) AS hi,
                     max(CASE WHEN r = CAST(ceil(0.1 * n) AS BIGINT)
                              THEN avg_mnat END) AS lo
              FROM rk CROSS JOIN n)
       SELECT source, count(*) AS n_docs,
              CAST(count(CASE WHEN avg_mnat > hi THEN 1 END) AS BIGINT) AS n_high,
              CAST(count(CASE WHEN avg_mnat < lo THEN 1 END) AS BIGINT) AS n_low,
              max(hi) AS p90_mnat, max(lo) AS p10_mnat
       FROM rk CROSS JOIN th GROUP BY source ORDER BY source""") { (s, d) =>
    import graft.curation.Curation
    val per = Curation.bigramSurprisalStats(
        table(s, d, "documents")
          .filter(size(TextAnalysis.tokens(col("text"))) >= 2),
        carryCols = Seq("source"))
      .select("doc_id", "source", "avg_mnat")
      .localCheckpoint()
    val n = per.agg(count(lit(1)).as("n"))
    val rk = per.withColumn("r", row_number().over(
      Window.orderBy(col("avg_mnat").asc, col("doc_id").asc)).cast("long"))
    val th = rk.crossJoin(broadcast(n)).agg(
      max(when(col("r") === ceil(lit(0.9) * col("n")).cast("long"),
        col("avg_mnat"))).as("hi"),
      max(when(col("r") === ceil(lit(0.1) * col("n")).cast("long"),
        col("avg_mnat"))).as("lo"))
    rk.crossJoin(broadcast(th))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("avg_mnat") > col("hi"), 1)).as("n_high"),
        count(when(col("avg_mnat") < col("lo"), 1)).as("n_low"),
        max("hi").as("p90_mnat"), max("lo").as("p10_mnat"))
      .orderBy("source")
  }

  // ------------------------------------------------ mixture budget plan

  private val mixWeightsPpm =
    Seq(("src0", 400000L), ("src1", 300000L), ("src2", 200000L),
      ("src3", 100000L))
  private val mixBudgetTok = 10000L

  /** Token-budget mixture planner (the data-mixing step of pretraining
   * prep): given target mixture weights (ppm, an in-code config table —
   * the S10 pattern) and a total token budget, allocate per-source
   * token quotas as min(available, budget·weight), then redistribute
   * the shortfall to sources with headroom proportionally to weight in
   * ONE documented round (integer div floors mean a few residual
   * tokens can stay unallocated — deterministic, never oversubscribed).
   * All arithmetic is BIGINT; the oracle replays it verbatim from a
   * VALUES table. Scale: one token-count aggregate over documents;
   * everything else is config-sized. */
  val q200MixturePlan: Q = Q("q200_mixture_plan",
    s"""WITH cfg(source, w_ppm) AS (VALUES
         ${mixWeightsPpm.map { case (s0, w) => s"('$s0', CAST($w AS BIGINT))" }.mkString(", ")}),
       tok AS (SELECT source,
                 CAST(sum(len(string_split_regex(trim(lower(text)), '\\s+'))) AS BIGINT) AS avail
               FROM documents GROUP BY source),
       j AS (SELECT c.source, c.w_ppm, t.avail,
               CAST($mixBudgetTok AS BIGINT) * c.w_ppm // 1000000 AS want
             FROM cfg c JOIN tok t ON c.source = t.source),
       a1 AS (SELECT source, w_ppm, avail, want, least(avail, want) AS alloc1 FROM j),
       tot AS (SELECT CAST($mixBudgetTok AS BIGINT) - sum(alloc1) AS leftover,
                      sum(CASE WHEN avail > want THEN w_ppm ELSE 0 END) AS w_unc
               FROM a1)
       SELECT source, w_ppm, avail, want,
              CAST(alloc1 + CASE WHEN avail > want AND w_unc > 0
                   THEN least(avail - want, leftover * w_ppm // w_unc)
                   ELSE 0 END AS BIGINT) AS alloc
       FROM a1 CROSS JOIN tot ORDER BY source""") { (s, d) =>
    import s.implicits._
    val cfg = mixWeightsPpm.toDF("source", "w_ppm")
    val tok = table(s, d, "documents")
      .select(col("source"), size(TextAnalysis.tokens(col("text"))).cast("long").as("t"))
      .groupBy("source").agg(sum("t").as("avail"))
    val j = broadcast(cfg).join(tok, "source")
      .withColumn("want", expr(s"CAST($mixBudgetTok AS BIGINT) * w_ppm div 1000000"))
      .withColumn("alloc1", least(col("avail"), col("want")))
    val tot = j.agg((lit(mixBudgetTok) - sum("alloc1")).as("leftover"),
      sum(when(col("avail") > col("want"), col("w_ppm")).otherwise(0L)).as("w_unc"))
    j.crossJoin(broadcast(tot))
      .select(col("source"), col("w_ppm"), col("avail"), col("want"),
        (col("alloc1") + when(col("avail") > col("want") && col("w_unc") > 0,
          least(col("avail") - col("want"),
            expr("leftover * w_ppm div w_unc"))).otherwise(0L)).as("alloc"))
      .orderBy("source")
  }

  // --------------------------------------------- TextRank keyword extraction

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): the corpus
   * token co-occurrence graph (adjacent-token pairs, weights = corpus
   * co-occurrence counts) scored by 3 weighted-PageRank iterations in
   * integer micro-units, top-20 keywords. The graph build is pure
   * map-side (an indexed `transform` over each doc's token array — no
   * window, no self-join) and aggregates to a VOCABULARY²-bounded edge
   * table before any iteration, so the iterative stage never touches
   * corpus-sized data; the oracle replays the tokenization, the edge
   * weights, and all three rank iterations term for term
   * ([[graft.graph.GraphOps.weightedPageRankMicro]]). */
  val q303Textrank: Q = Q("q303_textrank",
    """WITH tok AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS w
                    FROM documents WHERE text IS NOT NULL),
       bg AS (SELECT least(w[i], w[i+1]) AS a, greatest(w[i], w[i+1]) AS b
              FROM tok, unnest(range(1, len(w))) AS t(i)
              WHERE w[i] <> w[i+1]),
       e0 AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2),
       edges AS (SELECT a AS src, b AS dst, c FROM e0
                 UNION ALL SELECT b, a, c FROM e0),
       wd AS (SELECT src, CAST(sum(c) AS BIGINT) AS wd FROM edges GROUP BY src),
       r0 AS (SELECT src AS v, CAST(1000000 AS BIGINT) AS r FROM wd),
       r1 AS (SELECT e.dst AS v,
                CAST(150000 + sum(((34 * r0.r * e.c + 20 * wd.wd) // (40 * wd.wd))) AS BIGINT) AS r
              FROM edges e JOIN r0 ON e.src = r0.v JOIN wd ON e.src = wd.src
              GROUP BY e.dst),
       r2 AS (SELECT e.dst AS v,
                CAST(150000 + sum(((34 * r1.r * e.c + 20 * wd.wd) // (40 * wd.wd))) AS BIGINT) AS r
              FROM edges e JOIN r1 ON e.src = r1.v JOIN wd ON e.src = wd.src
              GROUP BY e.dst),
       r3 AS (SELECT e.dst AS v,
                CAST(150000 + sum(((34 * r2.r * e.c + 20 * wd.wd) // (40 * wd.wd))) AS BIGINT) AS r
              FROM edges e JOIN r2 ON e.src = r2.v JOIN wd ON e.src = wd.src
              GROUP BY e.dst)
       SELECT v AS word, r AS rank_micro,
              row_number() OVER (ORDER BY r DESC, v) AS rnk
       FROM r3 QUALIFY rnk <= 20 ORDER BY rnk""") { (s, d) =>
    val pairs = table(s, d, "documents")
      .filter(col("text").isNotNull)
      .select(split(trim(lower(col("text"))), "\\s+").as("w"))
      .select(explode(expr(
        """transform(slice(w, 1, size(w) - 1),
           (x, i) -> struct(least(x, element_at(w, i + 2)) AS a,
                            greatest(x, element_at(w, i + 2)) AS b))"""))
        .as("p"))
      .select(col("p.a"), col("p.b"))
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    graft.graph.GraphOps.weightedPageRankMicro(pairs, iters = 3)
      .orderBy(col("r").desc, col("v").asc).limit(20)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("r").desc, col("v").asc)).cast("long"))
      .select(col("v").as("word"), col("r").as("rank_micro"), col("rnk"))
      .orderBy("rnk")
  }

  val all: Seq[Q] = Seq(q188Chunking, q189OovRate, q190StratifiedSample,
    q191Moments, q192RrfFusion, q193Survival, q194RollingZscore, q195AnnNdcg,
    q196KAnonymity, q197SoleLateSupplier, q199PerplexityFilter,
    q200MixturePlan, q303Textrank)
}
