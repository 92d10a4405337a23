package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.CorpusQueries

/** Semantic invariants for the corpus-preparation family (q188–q192);
  * value-level oracle parity is the driver's DuckDB compare. */
class CorpusQueriesSpec extends AnyFunSuite with SparkSpec {

  test("q188: chunks cover every doc with stride-30 starts, 1..40 tokens each") {
    val chunks = CorpusQueries.q188Chunking.fn(spark, sf001).cache()
    val docs = graft.io.Sources.table(spark, sf001, "documents")
      .select(col("doc_id"),
        size(graft.text.TextAnalysis.tokens(col("text"))).as("n"))
    val perDoc = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum("n_tok").as("sum_tok"),
        max("chunk_idx").as("max_idx"))
      .join(docs, "doc_id")
    val bad = perDoc.filter(
      col("n_chunks") =!= ceil(col("n") / lit(30.0)).cast("long") ||
        col("max_idx") =!= col("n_chunks") - 1)
    assert(bad.count() == 0, "chunk count != ceil(n_tokens/30) for some doc")
    assert(chunks.filter(col("n_tok") < 1 || col("n_tok") > 40).count() == 0)
    // overlap accounting: stride 30 over n tokens re-reads each
    // overlapped token once -> sum over chunks >= n
    assert(perDoc.filter(col("sum_tok") < col("n")).count() == 0)
    chunks.unpersist()
  }

  test("q189: OOV counts are bounded by token counts and ppm by [0, 1e6]") {
    val r = CorpusQueries.q189OovRate.fn(spark, sf001).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (tok, oov) = (row.getAs[Long]("sum_tok"), row.getAs[Long]("sum_oov"))
      assert(oov >= 0 && oov <= tok)
      val ppm = row.getAs[Long]("avg_oov_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
    }
  }

  test("q190: at most 2 picks per stratum, picks are 1-based and dense") {
    val r = CorpusQueries.q190StratifiedSample.fn(spark, sf001)
    val per = r.groupBy("stratum").agg(count(lit(1)).as("k"),
      min("pick").as("lo"), max("pick").as("hi")).collect()
    assert(per.nonEmpty)
    per.foreach { row =>
      val k = row.getAs[Long]("k")
      assert(k >= 1 && k <= 2)
      assert(row.getAs[Long]("lo") == 1L && row.getAs[Long]("hi") == k)
    }
  }

  test("q191: the PRODUCTION moment arithmetic recovers planted shapes") {
    import spark.implicits._
    assert(CorpusQueries.q191Moments.fn(spark, sf001).columns.toSeq ==
      Seq("lang", "n", "skewness", "excess_kurtosis"))
    // symmetric two-point {-a,+a} around 100 (skew 0, excess kurtosis -2)
    // and a constant series (must trip the zero-variance NULL guard),
    // both through the exact expressions the query runs (momentShape)
    val planted = (1 to 200).map(i =>
      ("sym", 100L + (if (i % 2 == 0) 10L else -10L))) ++
      (1 to 50).map(_ => ("const", 42L))
    val out = CorpusQueries
      .momentShape(planted.toDF("lang", "n_chars"), "lang", "n_chars")
      .collect().map(r => r.getString(0) -> r).toMap
    val sym = out("sym")
    assert(sym.getAs[Double]("skewness") == 0.0)
    assert(sym.getAs[Double]("excess_kurtosis") == -2.0)
    val const = out("const")
    assert(const.isNullAt(const.fieldIndex("skewness")),
      "constant series must trip the zero-variance guard")
    assert(const.isNullAt(const.fieldIndex("excess_kurtosis")))
  }

  test("q192: fused ranking is dense, deterministic, and respects both lists") {
    val r = CorpusQueries.q192RrfFusion.fn(spark, sf001).collect()
    assert(r.length == 10)
    assert(r.map(_.getAs[Long]("fused_rank")).toSeq == (1L to 10L))
    val micros = r.map(_.getAs[Long]("rrf_micro")).toSeq
    assert(micros == micros.sorted.reverse, "rrf_micro not non-increasing")
    r.foreach { row =>
      val (ra, rb) = (Option(row.getAs[java.lang.Long]("rank_a")),
        Option(row.getAs[java.lang.Long]("rank_b")))
      assert(ra.nonEmpty || rb.nonEmpty)
      val expect = ra.map(v => math.round(1e6 / (60 + v.toLong))).getOrElse(0L) +
        rb.map(v => math.round(1e6 / (60 + v.toLong))).getOrElse(0L)
      assert(row.getAs[Long]("rrf_micro") == expect)
    }
  }

  test("q193: KM table is monotone (risk set and survival both non-increasing)") {
    val r = CorpusQueries.q193Survival.fn(spark, sf001).collect()
    assert(r.nonEmpty)
    val risk = r.map(_.getAs[Long]("n_risk")).toSeq
    assert(risk == risk.sorted.reverse, "n_risk must not increase over time")
    val surv = r.map(_.getAs[Double]("survival")).toSeq
    assert(surv == surv.sorted.reverse, "survival must not increase over time")
    assert(surv.forall(s => s >= 0.0 && s <= 1.0))
    r.foreach(row =>
      assert(row.getAs[Long]("n_events") <= row.getAs[Long]("n_risk")))
  }

  test("q194: full trailing windows only, flag agrees with rounded z") {
    val r = CorpusQueries.q194RollingZscore.fn(spark, sf001).collect()
    assert(r.nonEmpty)
    // per event type, days 1..6 of the series are excluded (wn < 7)
    val perType = r.groupBy(_.getAs[String]("event_type")).values
    perType.foreach(rows => assert(rows.length >= 1))
    r.foreach { row =>
      val z = row.getAs[Double]("zscore")
      assert(row.getAs[Boolean]("is_anomaly") == (math.abs(z) > 2.0))
    }
  }

  test("q195: NDCG bounded by 1000 and exact when all approx hits are relevant") {
    val r = CorpusQueries.q195AnnNdcg.fn(spark, sf001).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (hits, ndcg) = (row.getAs[Long]("n_hits"), row.getAs[Long]("ndcg_milli"))
      assert(hits >= 0 && hits <= 5)
      assert(ndcg >= 0 && ndcg <= 1000)
      assert(row.getAs[Long]("dcg_micro") <= row.getAs[Long]("idcg_micro"))
      // binary relevance: a full house of hits means DCG == IDCG exactly
      val nRanks = 5 // lshTopK returned ranks for this qid ≤ 5; full-hit ⇒ all
      if (hits == nRanks) assert(ndcg == 1000)
    }
  }

  // ------------------------------------------------------------ plan pins

  private def plan(q: graft.queries.Q): SparkPlan =
    q.fn(spark, sf001).queryExecution.sparkPlan

  test("q188 chunking plans no shuffle before the presentation sort") {
    val p = plan(CorpusQueries.q188Chunking)
    // the only exchange allowed is the range partitioning of the final sort
    val shuffles = p.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 1,
      s"chunking should be map-side + one sort exchange:\n$p")
  }

  test("q189 vocabulary membership join is broadcast") {
    val p = plan(CorpusQueries.q189OovRate)
    assert(p.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"vocab join did not broadcast:\n$p")
  }
}
