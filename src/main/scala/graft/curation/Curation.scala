package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Exprs
import graft.dedup.Dedup
import graft.text.TextAnalysis

/**
 * Corpus-curation operators a large-scale training-data pipeline needs
 * beyond dedup/similarity: deterministic sampling for mixture control,
 * vocabulary statistics, benchmark decontamination, and PII masking.
 * Everything is a declarative Column/DataFrame plan — map-side where
 * possible, one hash shuffle where not — and every hash is the
 * md5-prefix spelling the DuckDB oracle replays exactly.
 */
object Curation {

  // --------------------------------------------------- deterministic sampling

  /** Uniform-in-[0,10000) deterministic sampling key from a row id.
   * Hash-derived (not `rand()`): the decision is reproducible across
   * retries/partitionings, which is what makes sampled corpora auditable.
   * Oracle spelling: `('0x'||substr(md5(CAST(id AS VARCHAR)),1,15))::BIGINT % 10000`. */
  def samplingKey(id: Column): Column = pmod(Exprs.md5Long(id), lit(10000L))

  /**
   * Deterministic stratified sample: keep a row when its hash key falls
   * under the stratum's rate, expressed in BASIS POINTS (integer out of
   * 10000 — `0.4*10000` in double is 4000.0000000000002, so a fractional
   * rate column would make the threshold engine-dependent; integer bp
   * thresholds are exact everywhere). `rateBp` is any Column expression —
   * a CASE over a stratum column, or a value joined in from a rates dim.
   * Entirely map-side: no shuffle, no state, same decision at any scale
   * or partitioning. This is the mixture-control primitive (downsample
   * over-represented sources/languages to hit a target training mix).
   */
  def stratifiedSample(df: DataFrame, idCol: String, rateBp: Column): DataFrame =
    df.filter(samplingKey(col(idCol)) < rateBp.cast("long"))

  // ------------------------------------------------------------- vocabulary

  /**
   * Top-k tokens per group by frequency (deterministic tiebreak on the
   * token). explode → two-phase count (map-side partial agg absorbs the
   * token skew — hot tokens combine before the shuffle) → per-group top-k
   * window over the already-aggregated (group, token) table, which is
   * vocabulary-sized, not corpus-sized.
   */
  def vocabTopK(docs: DataFrame, groupCol: String, k: Int,
                textCol: String = "text"): DataFrame = {
    val counts = docs
      .select(col(groupCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(groupCol, "token").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(groupCol).orderBy(col("n").desc, col("token").asc)
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /**
   * Bounded-memory heavy-hitters over a key column: Misra–Gries sketch
   * ([[graft.functions.MisraGriesAgg]], `capacity` counters per
   * partition buffer) → `(token, est)` rows, estimate-descending.
   *
   * This is [[vocabTopK]]'s 100 TB escape hatch: the exact path shuffles
   * the full (group, token) vocabulary, which for web-scale n-gram
   * vocabularies is itself TB-sized — the sketch ships `capacity`
   * counters per partition and guarantees (for true count c over N
   * rows): est ≤ c, c − est ≤ N/(capacity+1), and every key with
   * c > N/(capacity+1) survives. Survivors then need only an exact
   * confirmation pass over the candidate set. Gate on those bounds, not
   * on raw survivor hashes — tail survivors depend on merge order.
   */
  def heavyHitters(df: DataFrame, key: Column, capacity: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val sketch = ColumnBridge.column(
      graft.functions.MisraGriesAgg(ColumnBridge.expression(key), capacity)
        .toAggregateExpression())
    df.agg(sketch.as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token").as("token"), col("e.est").as("est"))
  }

  /** GROUPED Misra–Gries: one bounded sketch PER GROUP (the native
    * `TypedImperativeAggregate` is mergeable, so it drops into an
    * ordinary groupBy — map-side partial sketches combine before the
    * exchange). Per-group guarantees are the global ones with the
    * group's own N: est ≤ exact, undercount ≤ N_g/(capacity+1). */
  def heavyHittersGrouped(df: DataFrame, group: String, key: Column,
                          capacity: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val sketch = ColumnBridge.column(
      graft.functions.MisraGriesAgg(ColumnBridge.expression(key), capacity)
        .toAggregateExpression())
    df.groupBy(group).agg(sketch.as("hh"))
      .select(col(group), explode(col("hh")).as("e"))
      .select(col(group), col("e.token").as("token"), col("e.est").as("est"))
  }

  /**
   * Sketch-then-confirm exact top-k: [[heavyHitters]] bounds the
   * candidate set (≤ `capacity` keys), a broadcast semi join restricts
   * the corpus to those keys, and only THEN does an exact count+top-k
   * run — so the exact aggregate shuffles at most `capacity` distinct
   * keys instead of the full key universe. Output (token, n_exact) is
   * fully deterministic (exact counts, (count desc, token) order) and
   * provably equals the all-keys exact top-k whenever the k-th true
   * count clears the sketch's N/(capacity+1) survival bound — the
   * two-pass "sketch candidates, confirm exactly" shape a 100 TB top-k
   * actually runs.
   */
  def heavyHittersConfirmed(df: DataFrame, key: Column, capacity: Int,
                            k: Int): DataFrame = {
    val cands = heavyHitters(df, key, capacity).select("token")
    df.select(key.as("token"))
      .join(broadcast(cands), Seq("token"), "left_semi")
      .groupBy("token").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("token").asc)
      .limit(k)
  }

  // -------------------------------------------------------- decontamination

  /**
   * Benchmark decontamination: flag corpus docs sharing >= `minShingles`
   * distinct k-shingles with ANY benchmark doc. The join key is the
   * 60-bit shingle hash, so the benchmark side collapses to a distinct
   * hash set — small by nature (it's an eval set), so AQE converts the
   * semi join to a broadcast at runtime when it fits, and the 100 TB
   * corpus side then streams past it MAP-SIDE with no pre-join shuffle.
   * The semi join runs BEFORE any corpus-side dedup: only the (rare)
   * shared shingles survive to the counting aggregate, whose
   * count(DISTINCT h) plans a map-side partial dedup — one bounded
   * shuffle where a corpus-wide (id, h) distinct would be a full one.
   * Returns (idCol, carryCols*, n_shared) for contaminated docs;
   * `carryCols` are id-functional passthrough columns (e.g. source) that
   * ride the aggregate so callers don't re-join the corpus to recover
   * them.
   */
  def contaminated(corpus: DataFrame, benchmark: DataFrame, minShingles: Int,
                   textCol: String = "text", idCol: String = "doc_id",
                   carryCols: Seq[String] = Nil): DataFrame = {
    def shingleHashes(df: DataFrame, keep: Seq[String]) = df
      .select(keep.map(col) :+ explode(Dedup.shingles(col(textCol))).as("s"): _*)
      .select(keep.map(col) :+ Exprs.md5Long(col("s")).as("h"): _*)
    val benchHashes = shingleHashes(benchmark, Nil).distinct()
    shingleHashes(corpus, idCol +: carryCols)
      .join(benchHashes, Seq("h"), "left_semi")
      .groupBy(idCol, carryCols: _*)
      .agg(count_distinct(col("h")).as("n_shared"))
      .filter(col("n_shared") >= minShingles)
  }

  // ------------------------------------------------------- repetition signal

  /**
   * Gopher-style repetition signal per document: the fraction of all
   * 3-shingles taken by the single most repeated one (near 1.0 = the
   * document is one phrase looping — a standard pretraining-quality
   * filter axis alongside [[graft.text.TextAnalysis.qualityScore]]).
   * Two-phase aggregation on (doc, shingle) then doc — map-side partial
   * counts absorb the repetition itself, so a pathological looping
   * document contributes ONE hot row per distinct shingle, not one per
   * occurrence.
   */
  def repetitionStats(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), explode(Dedup.shingles(col(textCol))).as("g"))
      .groupBy(idCol, "g").agg(count(lit(1)).as("c"))
      .groupBy(idCol)
      .agg(sum("c").as("n_trigrams"), max("c").as("max_rep"))
      .withColumn("rep_ratio",
        round(col("max_rep") / col("n_trigrams").cast("double"), 4))

  // ------------------------------------------------------- cross-doc spans

  /**
   * Cross-document span (passage) dedup signal — the line/paragraph-dedup
   * analog (RefinedWeb/CCNet style) for corpora without line structure:
   * a k-token span occurring in >= `minDocs` DISTINCT documents is
   * "common" (boilerplate, templates, licensing headers), and each doc is
   * scored by the fraction of its distinct spans that are common.
   *
   * Two corpus scans (span inventory + per-doc scoring), both pure
   * map-side explodes into ONE hash shuffle each; the hot-span set is
   * rare by construction (it's the cross-doc overlap), so AQE broadcasts
   * it and the scoring join is map-side. Spans are distinct WITHIN a doc
   * first (array_distinct before the explode) so in-doc repetition —
   * q74's separate axis — can't promote a span to "common".
   *
   * Returns per-doc (idCol, carryCols*, n_spans, n_common, common_ratio).
   */
  def spanStats(docs: DataFrame, spanTokens: Int, minDocs: Int,
                textCol: String = "text", idCol: String = "doc_id",
                carryCols: Seq[String] = Nil): DataFrame = {
    def spans(keep: Seq[String]) = docs
      .select(keep.map(col) :+
        explode(array_distinct(Dedup.shingles(col(textCol), spanTokens))).as("s"): _*)
      .select(keep.map(col) :+ Exprs.md5Long(col("s")).as("h"): _*)
    val common = spans(Seq(idCol))
      .groupBy("h").agg(count_distinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("h"), lit(1L).as("_hot"))
    spans(idCol +: carryCols)
      .join(common, Seq("h"), "left")
      .groupBy(idCol, carryCols: _*)
      .agg(count(lit(1)).as("n_spans"), count(col("_hot")).as("n_common"))
      .withColumn("common_ratio",
        round(col("n_common") / col("n_spans").cast("double"), 4))
  }

  // ---------------------------------------------------------- group quotas

  /**
   * Per-group retention quota: keep the top `k` rows of each group by
   * `scoreCol` (desc; ties break on `idCol` asc — deterministic at any
   * partitioning). THE mixture-balancing primitive when a cap, not a
   * rate, is the target ("at most N docs per domain"): one shuffle on
   * the group key, rank window, filter — the filter prunes before
   * anything downstream, so over-represented domains never reach the
   * training sink.
   */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: Column,
                   k: Int, idCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(scoreCol.desc, col(idCol).asc)
    df.withColumn("_rank", row_number().over(w))
      .filter(col("_rank") <= k)
      .withColumn("quota_rank", col("_rank").cast("long"))
      .drop("_rank")
  }

  // ------------------------------------------------------ unigram surprisal

  /**
   * Unigram-LM surprisal score per document: mean `-ln P(token)` under
   * the corpus's own unigram distribution — the cheap perplexity proxy
   * that flags gibberish (high surprisal) and boilerplate (low) without
   * a trained model. Two passes: a vocabulary aggregate (bounded by
   * distinct-token count, NOT corpus size — natural-language vocabularies
   * plateau in the millions, broadcastable), then a map-side-joined
   * per-doc aggregate.
   *
   * Cross-engine determinism: per-token surprisal is quantized to
   * integer MILLI-nats (`round(-ln(c/total)*1000)` → BIGINT) before the
   * per-doc sum — integer arithmetic is associativity-proof where a
   * double sum would hash-differ on addition order.
   *
   * Returns per-doc (idCol, carryCols*, n_tok, sum_mnat, avg_mnat).
   */
  def surprisalStats(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id",
                     carryCols: Seq[String] = Nil): DataFrame = {
    val tok = docs.select(
      (col(idCol) +: carryCols.map(col)) :+
        explode(TextAnalysis.tokens(col(textCol))).as("token"): _*)
    // vocabulary is bounded by distinct-token count, not corpus size —
    // materialize it once (localCheckpoint): both consumers (the total
    // aggregate and the mnat table) would otherwise re-scan the corpus
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val total = vocab.agg(sum("c").as("total"))
    val mnats = vocab.crossJoin(broadcast(total))
      .withColumn("mnat",
        round(-log(col("c") / col("total").cast("double")) * 1000.0, 0).cast("long"))
      .select("token", "mnat")
    tok.join(mnats, "token")
      .groupBy(idCol, carryCols: _*)
      .agg(count(lit(1)).as("n_tok"), sum("mnat").as("sum_mnat"))
      .withColumn("avg_mnat",
        round(col("sum_mnat") / col("n_tok").cast("double"), 2))
  }

  // ------------------------------------------------------ bigram surprisal

  /**
   * Bigram-LM surprisal per document: mean `-ln P(w2 | w1)` under the
   * corpus's own bigram distribution, where
   * `P(w2|w1) = c(w1 w2) / c(w1 ·)` and `c(w1 ·)` sums the bigram counts
   * sharing the prefix — the next step up from [[surprisalStats]]'s
   * unigram model, sensitive to word ORDER (shuffled text scores high
   * even when its unigrams are ordinary). Same scale shape: the bigram
   * vocabulary aggregate is bounded by distinct-bigram count (not corpus
   * size) and materialized once; the per-doc pass joins it map-side.
   * Documents under 2 tokens have no bigrams and drop out naturally.
   *
   * Per-bigram surprisal is quantized to integer MILLI-nats before the
   * per-doc sum (associativity-proof — same rationale as
   * [[surprisalStats]]).
   *
   * Returns per-doc (idCol, carryCols*, n_bigrams, sum_mnat, avg_mnat).
   */
  def bigramSurprisalStats(docs0: DataFrame, textCol: String = "text",
                           idCol: String = "doc_id",
                           carryCols: Seq[String] = Nil): DataFrame = {
    // Dedup.shingles(_, 2) never returns empty (a 1-token doc yields its
    // lone word) — filter sub-bigram docs HERE so they can't pollute the
    // model, whatever the caller passes
    val docs = docs0.filter(size(TextAnalysis.tokens(col(textCol))) >= 2)
    val big = docs.select(
      (col(idCol) +: carryCols.map(col)) :+
        explode(Dedup.shingles(col(textCol), 2)).as("bg"): _*)
    // bigram vocabulary: one corpus pass, bounded by distinct bigrams;
    // localCheckpoint — the prefix rollup and the mnat join both read it
    val vocab = big.groupBy("bg").agg(count(lit(1)).as("c2"))
      .localCheckpoint()
    val prefixTotals = vocab
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum("c2").as("c1"))
    val mnats = vocab
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(prefixTotals, "w1")
      .withColumn("mnat",
        round(-log(col("c2") / col("c1").cast("double")) * 1000.0, 0).cast("long"))
      .select("bg", "mnat")
    big.join(mnats, "bg")
      .groupBy(idCol, carryCols: _*)
      .agg(count(lit(1)).as("n_bigrams"), sum("mnat").as("sum_mnat"))
      .withColumn("avg_mnat",
        round(col("sum_mnat") / col("n_bigrams").cast("double"), 2))
  }

  // ------------------------------------------- importance weights (DSIR)

  /**
   * Hashed-n-gram importance weights (the DSIR recipe, Xie et al. 2023):
   * score how target-like each document is as the sum of per-token
   * log-ratios `ln(p_target(b) / p_raw(b))` over hashed feature buckets
   * `b = md5(token) mod buckets`, with add-one smoothing on both
   * distributions. Positive = the doc's vocabulary leans toward the
   * target slice; the weights drive importance RESAMPLING of a raw corpus
   * toward a target domain without training a classifier.
   *
   * Scale shape: the bucket table is FIXED-SIZE (`buckets` rows — build
   * it once per corpus snapshot and broadcast), both corpus passes are
   * map-side explode → two-phase count, and the per-doc score join is an
   * equi-join on the bucket id. Per-token log-ratios are quantized to
   * integer MILLI-nats before the per-doc sum (order-proof).
   *
   * Returns per-doc (idCol, carryCols*, n_tok, sum_mnat, avg_mnat).
   */
  def dsirStats(docs: DataFrame, isTarget: Column, buckets: Int,
                textCol: String = "text", idCol: String = "doc_id",
                carryCols: Seq[String] = Nil): DataFrame = {
    val tok = docs.select(
      (col(idCol) +: carryCols.map(col)) :+ isTarget.as("_t") :+
        explode(TextAnalysis.tokens(col(textCol))).as("token"): _*)
      .withColumn("b", pmod(Exprs.md5Long(col("token")), lit(buckets.toLong)))
    // bucketed counts: bounded at `buckets` rows regardless of corpus size
    val counts = tok.groupBy("b")
      .agg(count(lit(1)).as("cr"), count(when(col("_t"), 1)).as("ct"))
      .localCheckpoint()
    val totals = counts.agg(sum("cr").as("tr"), sum("ct").as("tt"))
    val lam = counts.crossJoin(broadcast(totals))
      .withColumn("mnat",
        round((log((col("ct") + 1).cast("double") / (col("tt") + buckets))
          - log((col("cr") + 1).cast("double") / (col("tr") + buckets)))
          * 1000.0, 0).cast("long"))
      .select("b", "mnat")
    tok.join(broadcast(lam), "b")
      .groupBy(idCol, carryCols: _*)
      .agg(count(lit(1)).as("n_tok"), sum("mnat").as("sum_mnat"))
      .withColumn("avg_mnat",
        round(col("sum_mnat") / col("n_tok").cast("double"), 2))
  }

  // ------------------------------------------- weighted sampling (A-ES)

  /**
   * Deterministic weighted sampling WITHOUT replacement (the
   * Efraimidis–Spirakis exponential-keys scheme): each row draws a
   * reproducible uniform `u` from its id hash and is ranked by
   * `-ln(u) / w` ascending — the k smallest keys are a weight-
   * proportional sample. Keys are quantized to integer micro-nats
   * before ranking (ties then break on the id), so the selection is
   * bit-reproducible in any engine at any partitioning. The top-k is a
   * TakeOrdered (per-partition heads + driver merge of k) — no global
   * sort materializes at scale. This is the quality-weighted
   * mixture-sampling primitive ("sample 10M docs ∝ quality score").
   *
   * Precondition: `weight` must be strictly positive. `w = 0` makes
   * the key Infinity (an ANSI cast error), `w < 0` inverts the
   * ranking; rows violating it are dropped here rather than letting
   * either corruption through silently.
   */
  def weightedSampleTopK(df: DataFrame, idCol: String, weight: Column,
                         k: Int): DataFrame = {
    val u = (samplingKey(col(idCol)).cast("double") + 0.5) / 10000.0
    df.filter(weight > 0)
      .withColumn("wkey", round(-log(u) / weight * 1e6, 0).cast("long"))
      .orderBy(col("wkey").asc, col(idCol).asc)
      .limit(k)
  }

  // ------------------------------------------------ PMI collocations

  /**
   * Top pointwise-mutual-information bigram collocations over the
   * corpus: `PMI(w1,w2) = ln( c12 * N / (c1 * c2) )` with marginals
   * taken over the bigram table, restricted to bigrams seen at least
   * `minCount` times. Everything after the bigram count is
   * vocabulary-sized; PMI is quantized to integer milli-nats.
   */
  def pmiTopK(docs: DataFrame, minCount: Int, k: Int,
              textCol: String = "text"): DataFrame =
    pmiTopKFromTokens(
      docs.select(TextAnalysis.tokens(col(textCol)).as("toks")),
      minCount, k)

  /** [[pmiTopK]] over an already-tokenized `toks` table (e.g. the
   * shared [[graft.text.TokenizedCorpus]] view — the corpus then pays
   * tokenization once per session across all token pipelines). */
  def pmiTopKFromTokens(toks: DataFrame, minCount: Int, k: Int): DataFrame = {
    // same sub-bigram guard as [[bigramSurprisalStats]]
    val c12 = toks
      .filter(size(col("toks")) >= 2)
      .select(explode(Dedup.shinglesFromTokens(col("toks"), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val m1 = c12.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum("c12").as("c1"))
    val m2 = c12.groupBy(substring_index(col("bg"), " ", -1).as("w2"))
      .agg(sum("c12").as("c2"))
    val n = c12.agg(sum("c12").as("nb"))
    val scored = c12.filter(col("c12") >= minCount)
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(m1, "w1").join(m2, "w2").crossJoin(broadcast(n))
      .withColumn("pmi_mnat",
        // cast BEFORE multiplying: c1*c2 in long arithmetic overflows at
        // ~5e9-count marginals (stopword bigrams at corpus scale) —
        // doubles are exact for these products far beyond that
        round(log(col("c12").cast("double") * col("nb")
          / (col("c1").cast("double") * col("c2")))
          * 1000.0, 0).cast("long"))
      .select(col("bg").as("bigram"), col("c12").as("n"), col("pmi_mnat"))
    // top-k first (TakeOrdered — per-partition heads, driver merge of k),
    // THEN rank the k survivors: a global row_number window here would
    // drag the whole qualifying vocabulary through one partition
    scored.orderBy(col("pmi_mnat").desc, col("bigram").asc).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("pmi_mnat").desc, col("bigram").asc))
          .cast("long"))
  }

  // ------------------------------------------------------ train/val split

  /**
   * Deterministic train/val/test split label from a row id: md5
   * basis-point key under `trainBp` → train, under `trainBp + valBp` →
   * val, else test. Pure map-side, reproducible at any partitioning or
   * retry — and because the key is the SAME [[samplingKey]] family, a
   * doc keeps its split across pipeline re-runs (no train/test leakage
   * from reshuffles, the property `rand()` splits lose).
   */
  def splitLabel(id: Column, trainBp: Int, valBp: Int): Column = {
    val k = samplingKey(id)
    when(k < trainBp, "train")
      .when(k < trainBp + valBp, "val")
      .otherwise("test")
  }

  // ------------------------------------------------------- sequence packing

  /**
   * GPT-style sequence packing plan: concatenate each group's documents
   * in `idCol` order and cut every `budget` tokens. Computed as pure
   * window arithmetic — the running token offset places every document at
   * [cum_before, cum_before + n_tok), from which its start/end bin and
   * boundary-split flag follow in closed form. One shuffle on the group
   * key; no sequential state, so the plan scales to any corpus (contrast
   * greedy first-fit, which is inherently serial per group).
   *
   * Returns one row per doc: (groupCol, idCol, n_tok, cum_before,
   * start_bin, end_bin, is_split).
   */
  def packSequences(docs: DataFrame, groupCol: String, budget: Int,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(groupCol), col(idCol),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tok"))
      .withColumn("cum_before", coalesce(sum("n_tok").over(w), lit(0L)))
      .withColumn("start_bin", floor(col("cum_before") / budget).cast("long"))
      .withColumn("end_bin",
        floor((col("cum_before") + col("n_tok") - 1) / budget).cast("long"))
      .withColumn("is_split", col("end_bin") > col("start_bin"))
  }

  // ------------------------------------------------------------ PII masking

  /** Digit masking: every digit → 'X' (ids, phones, account numbers). */
  def maskDigits(c: Column): Column = regexp_replace(c, "[0-9]", "X")

  /** Count of digits a `maskDigits` pass redacts (audit trail column). */
  def digitsRedacted(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[0-9]", ""))).cast("long")

  /** Consistent pseudonymization: identical identities map to the same
   * token (`u_` + 12 hex of md5), so joins/group-bys still line up after
   * scrubbing — the property plain masking destroys. */
  def pseudonym(c: Column): Column = concat(lit("u_"), substring(md5(c), 1, 12))

  /** k-anonymity-style numeric generalization: bucket to a fixed width. */
  def bucketize(c: Column, width: Double): Column =
    (floor(c / width) * width).cast("double")

  // ------------------------------------------------------- URL profiling

  /** Two-part public suffixes the registrable-domain rule recognizes — a
   * deliberately SMALL, documented subset of the public suffix list
   * (the full PSL is a data file a production build ships as a
   * broadcast lookup; the rule shape — longest matching suffix, then
   * one more label — is what matters here). */
  val twoPartSuffixes: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "co.jp", "com.au", "gov.co")

  /** Registrable domain (eTLD+1) of a host: the last THREE labels when
   * the last two form a recognized two-part suffix ([[twoPartSuffixes]]),
   * else the last two — `cdn.img.site.co.uk` → `site.co.uk`,
   * `www.site.org` → `site.org`. Pure column arithmetic, map-side. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    when(n >= 3 && lastTwo.isin(twoPartSuffixes: _*),
      concat_ws(".", element_at(labels, -3), lastTwo))
      .when(n >= 2, lastTwo)
      .otherwise(host)
  }

  /** URL profile for crawl curation: host, registrable domain, path
   * depth, query presence — the columns per-domain quotas (q79) and
   * dedup keys actually want, extracted from the raw URL string with
   * Spark's native `try_parse_url` (no UDF; the non-try variant THROWS
   * on malformed input, and a 100 TB crawl always contains junk —
   * junk rows get null host/registrable_domain, depth 0, no query).
   * Everything is derived from `urlCol` alone. */
  def urlProfile(df: DataFrame, urlCol: Column): DataFrame = {
    val host = try_parse_url(urlCol, lit("HOST"))
    val path = try_parse_url(urlCol, lit("PATH"))
    val query = try_parse_url(urlCol, lit("QUERY"))
    df.withColumn("host", host)
      .withColumn("registrable_domain", registrableDomain(col("host")))
      .withColumn("path_depth",
        size(filter(split(coalesce(path, lit("")), "/"), s => length(s) > 0))
          .cast("long"))
      .withColumn("has_query", query.isNotNull)
  }
}
