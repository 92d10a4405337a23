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

  test("q189: OOV counts are bounded by token counts and fractions by [0,1]") {
    val r = CorpusQueries.q189OovRate.fn(spark, sf001).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (tok, oov) = (row.getAs[Long]("sum_tok"), row.getAs[Long]("sum_oov"))
      assert(oov >= 0 && oov <= tok)
      val f = row.getAs[Double]("avg_oov_frac")
      assert(f >= 0.0 && f <= 1.0)
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

  test("q191: moment arithmetic recovers a planted distribution's shape") {
    import spark.implicits._
    // symmetric two-point {-a,+a} around 100: skew 0, excess kurtosis -2
    val sym = (1 to 200).map(i => ("x", 100L + (if (i % 2 == 0) 10L else -10L)))
      .toDF("lang", "n_chars")
    val m = CorpusQueries.q191Moments.fn(spark, sf001) // schema probe only
    assert(m.columns.toSeq ==
      Seq("lang", "n", "skewness", "excess_kurtosis"))
    // run the same arithmetic over the planted frame via the public shape
    val x = col("n_chars")
    val s = sym.groupBy("lang").agg(count(lit(1)).as("n"), sum(x).as("s1"),
      sum(x * x).as("s2"), sum(x * x * x).as("s3"), sum(x * x * x * x).as("s4"))
      .select(col("lang"), col("n"),
        (col("s1").cast("double") / col("n")).as("m1"),
        (col("s2").cast("double") / col("n")).as("m2r"),
        (col("s3").cast("double") / col("n")).as("m3r"),
        (col("s4").cast("double") / col("n")).as("m4r"))
      .select(col("n"),
        (col("m2r") - col("m1") * col("m1")).as("v"),
        (col("m3r") - lit(3.0) * col("m1") * col("m2r")
          + lit(2.0) * col("m1") * col("m1") * col("m1")).as("m3"),
        (col("m4r") - lit(4.0) * col("m1") * col("m3r")
          + lit(6.0) * col("m1") * col("m1") * col("m2r")
          - lit(3.0) * col("m1") * col("m1") * col("m1") * col("m1")).as("m4"))
      .select(round(col("m3") / (col("v") * sqrt(col("v"))), 4).as("sk"),
        round(col("m4") / (col("v") * col("v")) - lit(3.0), 4).as("ku"))
      .head()
    assert(s.getDouble(0) == 0.0)
    assert(s.getDouble(1) == -2.0)
    // zero-variance guard: constant series must yield NULL shape stats
    // (the integer-exact n*s2 == s1*s1 test), never NaN
    val const = (1 to 50).map(_ => ("y", 42L)).toDF("lang", "n_chars")
    val g = const.groupBy("lang").agg(count(lit(1)).as("n"),
      sum(x).as("s1"), sum(x * x).as("s2"))
      .select(when(col("n") * col("s2") === col("s1") * col("s1"), lit(null))
        .otherwise(lit(1.0)).as("guarded"))
      .head()
    assert(g.isNullAt(0), "constant series must trip the zero-variance guard")
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
