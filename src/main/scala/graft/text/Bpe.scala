package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding tokenizer training (Sennrich et al., "Neural
 * Machine Translation of Rare Words with Subword Units", ACL 2016) as a
 * distributed, vocab-bounded iteration — the "train a tokenizer on the
 * corpus" step of an LLM data pipeline.
 *
 * Scale shape: the corpus is touched ONCE (word-frequency aggregate,
 * map-side combined). Every merge round then runs over the WORD TABLE
 * (vocab-sized, not corpus-sized): adjacent symbol pairs weighted by
 * word frequency → the most frequent pair (deterministic tie-break:
 * count desc, pair asc) → one `replace` pass over the padded symbol
 * sequences. Per round the driver pulls exactly ONE row (the winning
 * pair) — the same bounded-scalar contract as the IVF centroids. At
 * 100 TB the vocabulary is millions of rows where the corpus is
 * trillions, so rounds cost vocabulary scans only.
 *
 * Determinism/parity: symbol sequences are built by the same regex in
 * both engines (`(.)` → `$1 `/`\1 `), pair counting is exact integer
 * frequency sums, and the merge is a literal (non-regex) left-to-right
 * non-overlapping `replace` — Java and DuckDB implement the identical
 * scan-from-end-of-match semantics, which is also exactly greedy BPE.
 */
object Bpe {

  /** Padded symbol sequence for a word: "the" → " t h e ". The pad
    * spaces let a pair merge be a plain `' a b '` → `' ab '` replace
    * with no boundary special-casing. */
  def symbolSeq(word: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit(" "), trim(regexp_replace(word, "(.)", "$1 ")), lit(" "))

  /** Adjacent symbol pairs of the `seq` column, each as "a b"
    * (vocab-bounded table — the interpreted lambda is off the corpus
    * path). */
  private def adjacentPairs: org.apache.spark.sql.Column =
    // the < 2 guard matters: Spark's sequence(1, 0) steps DOWNWARD
    // ([1, 0]), it is not empty like DuckDB's range(1, 1)
    expr("""CASE WHEN size(split(trim(seq), ' ')) < 2 THEN array()
            ELSE transform(sequence(1, size(split(trim(seq), ' ')) - 1),
              k -> concat(element_at(split(trim(seq), ' '), k), ' ',
                          element_at(split(trim(seq), ' '), k + 1))) END""")

  /** One learned merge: the winning pair, its weighted count, and the
    * corpus-wide symbol total AFTER applying it (proves the merge was
    * applied, not just chosen). */
  final case class Merge(round: Int, pair: String, cnt: Long,
                         symbolsAfter: Long)

  /**
   * Run `rounds` BPE merges over a (word, freq) table. Returns the
   * merge table (the trained tokenizer artifact) and the final merged
   * symbol-sequence table (word, seq, freq).
   */
  def train(wordFreq: DataFrame, rounds: Int): (Seq[Merge], DataFrame) = {
    var seqs = wordFreq
      .select(col("word"), symbolSeq(col("word")).as("seq"), col("freq"))
      .localCheckpoint() // each round rewrites it; cut lineage per round
    val merges = Seq.newBuilder[Merge]
    for (r <- 1 to rounds) {
      val top = seqs
        .select(explode(adjacentPairs).as("pair"), col("freq"))
        .groupBy("pair").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1)
        .collect() // ONE row — the winning pair (bounded scalar)
      if (top.nonEmpty) {
        val pair = top(0).getString(0)
        // escape backslashes BEFORE quotes: both survive the SQL-literal
        // parse inside expr() (callers feeding arbitrary symbols — the
        // engine queries restrict to ^[a-z]+$ — still merge correctly)
        def esc(x: String) = x.replace("\\", "\\\\").replace("'", "''")
        val lit1 = esc(pair)
        val lit2 = esc(pair.replace(" ", ""))
        seqs = seqs
          .withColumn("seq", expr(s"replace(seq, ' $lit1 ', ' $lit2 ')"))
          .localCheckpoint()
        val symbolsAfter = seqs
          .agg(sum(col("freq") * size(split(trim(col("seq")), " "))).as("t"))
          .head().getLong(0) // 1-row scalar over the vocab table
        merges += Merge(r, pair, top(0).getLong(1), symbolsAfter)
      }
    }
    (merges.result(), seqs)
  }

  /** DuckDB replay of [[train]] as a CTE chain: `wf(word, freq)` must
    * be bound by the caller; emits s0..s`rounds` (MATERIALIZED — each
    * is referenced by its pair count AND the next merge) and t1..t`rounds`
    * (the per-round winning pair), ending with a UNION ALL of the merge
    * table. */
  def oracleCtes(rounds: Int): String = {
    val s0 =
      """s0 AS MATERIALIZED (
           SELECT word, ' ' || trim(regexp_replace(word, '(.)', '\1 ', 'g')) || ' ' AS seq, freq
           FROM wf)"""
    val per = (1 to rounds).map { r =>
      s"""p$r AS (
           SELECT pr AS pair, CAST(sum(freq) AS BIGINT) AS cnt
           FROM (SELECT unnest(list_transform(range(1, len(string_split(trim(seq), ' '))),
                        k -> string_split(trim(seq), ' ')[k] || ' ' ||
                             string_split(trim(seq), ' ')[k+1])) AS pr, freq
                 FROM s${r - 1})
           GROUP BY pr),
         t$r AS (SELECT pair, cnt FROM p$r ORDER BY cnt DESC, pair ASC LIMIT 1),
         s$r AS MATERIALIZED (
           SELECT word,
                  replace(seq, ' ' || (SELECT pair FROM t$r) || ' ',
                          ' ' || replace((SELECT pair FROM t$r), ' ', '') || ' ') AS seq,
                  freq
           FROM s${r - 1})"""
    }.mkString(",\n       ")
    val union = (1 to rounds).map(r =>
      s"""SELECT CAST($r AS BIGINT) AS round, pair, cnt,
           (SELECT CAST(sum(freq * len(string_split(trim(seq), ' '))) AS BIGINT)
            FROM s$r) AS symbols_after FROM t$r""").mkString("\n       UNION ALL ")
    s"$s0,\n       $per,\n       merges AS ($union)"
  }
}
