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
}
