package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.curation.Curation
import graft.ops.Funnel
import graft.text.Search

/** Round-5 analytics operators: funnels, cohorts, weighted sampling,
  * TF-IDF, PMI, and the streaming CDC apply. */
class AnalyticsOpsSpec extends AnyFunSuite with SparkSpec {

  test("stageTimes: later stages gated by earlier entry times") {
    import spark.implicits._
    // user 1: view@10, click@20, purchase@30  -> full funnel
    // user 2: click@5, view@10 (click BEFORE view) -> no stage-2 entry
    // user 3: view@10, purchase@20 (no click)      -> stage 1 only
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 5L, "click"), (2L, 10L, "view"),
      (3L, 10L, "view"), (3L, 20L, "purchase"))
      .toDF("user_id", "sec", "event_type")
    val staged = Funnel.stageTimes(ev, "user_id", "sec", "event_type",
        Seq("view", "click", "purchase"))
      .select("user_id", "f0", "f1", "f2").distinct()
      .orderBy("user_id").collect()
    assert(staged.map(r => (r.getLong(0),
      Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toSeq == Seq(
      (1L, Some(10L), Some(20L), Some(30L)),
      (2L, Some(10L), None, None),
      (3L, Some(10L), None, None)))
  }

  test("cohortRetention: offsets counted from the first-event week") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-08 10:00:00"), // w0, w1
      (2L, "2024-01-01 12:00:00"),                              // w0 only
      (3L, "2024-01-08 09:00:00"))                              // cohort w1
      .toDF("user_id", "tss")
      .withColumn("ts", to_timestamp(col("tss")))
    val m = Funnel.cohortRetention(ev, "user_id", "ts", maxWeeks = 4)
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("c"),
        col("week_offset"), col("n_users"))
      .orderBy("c", "week_offset").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(m == Seq(("2024-01-01", 0L, 2L), ("2024-01-01", 1L, 1L),
      ("2024-01-08", 0L, 1L)))
  }

  test("weightedSampleTopK: heavier weights sampled more often") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
      .withColumn("w", when(col("id") < 1000L, 10.0).otherwise(0.1))
    val picked = Curation.weightedSampleTopK(df, "id", col("w"), k = 100)
      .collect().map(_.getLong(0))
    assert(picked.length == 100)
    val heavy = picked.count(_ < 1000L)
    assert(heavy > 90, s"heavy group underrepresented: $heavy/100")
    // deterministic across invocations
    val again = Curation.weightedSampleTopK(df, "id", col("w"), k = 100)
      .collect().map(_.getLong(0))
    assert(picked.toSeq == again.toSeq)
  }

  test("tfidfTopTerms: corpus-wide terms rank below distinctive ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common zebra zebra"), (2L, "common yak"), (3L, "common wolf"))
      .toDF("doc_id", "text")
    val top = Search.tfidfTopTerms(docs, k = 1)
      .orderBy("doc_id").collect().map(_.getString(2)).toSeq
    // 'common' has idf=ln(1)=0 -> distinctive term wins every doc
    assert(top == Seq("zebra", "yak", "wolf"))
  }

  test("pmiTopK: collocated pair beats independent pair") {
    import spark.implicits._
    // "tick tock" always together (5x); "red" pairs with varied words
    val docs = Seq(
      (1L, "tick tock tick tock tick tock tick tock tick tock"),
      (2L, "red car red boat red tree red lamp red door"))
      .toDF("doc_id", "text")
    val rows = Curation.pmiTopK(docs, minCount = 5, k = 10)
      .orderBy("rank").collect()
    assert(rows.nonEmpty)
    assert(rows.head.getString(0) == "tick tock")
  }

  test("semDedup: parallel classes collapse to their lowest id; twins dropped") {
    import spark.implicits._
    // 40 well-separated base vectors (axis-aligned, distinct axes) plus
    // identical twins of the first 10 at ids 100..109: a twin always
    // lands in its base's cell (same nearest centroid) at cosine 1.0
    val dim = 8
    def axisVec(i: Int): Array[Float] = {
      val v = new Array[Float](dim)
      v(i % dim) = 1.0f + (i / dim) * 0.1f // same direction per residue class
      v
    }
    val base = (0 until 40).map(i => (i.toLong, axisVec(i)))
    val twins = (0 until 10).map(i => (100L + i, axisVec(i)))
    val df = (base ++ twins).toDF("vec_id", "embedding")
    val dec = graft.sim.Similarity
      .semDedup(df, nClusters = 8, tauMicro = 999000L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    (100L until 110L).foreach { id =>
      assert(!dec(id), s"twin $id should be dropped")
    }
    // every base vector whose direction is unique among ids < 40 with a
    // distinct scale is NOT a near-dup at tau=0.999 unless exactly
    // parallel; ids 0..7 are each parallel to 8..15 etc. — so kept set
    // must at least contain the lowest id of each parallel class
    (0L until 8L).foreach { id =>
      assert(dec(id), s"class representative $id should be kept")
    }
    val kept = dec.count(_._2)
    assert(kept + dec.count(!_._2) == 50)
  }

  test("semDedup: keeper_sim_micro belongs to keeper_id's pair") {
    import spark.implicits._
    // j=5 has lower-id neighbors 1 (sim ~0.985) and 3 (sim 1.0): keeper
    // is min id 1, and the reported sim must be sim(1,5), not max sim
    val base = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val tilt = Array(0.985f, 0.1723f, 0.0f, 0.0f) // cos vs base ~0.985
    val df = Seq((1L, base), (3L, tilt), (5L, tilt))
      .toDF("vec_id", "embedding")
    val row = graft.sim.Similarity
      .semDedup(df, nClusters = 1, tauMicro = 950000L)
      .filter(col("id") === 5L)
      .select("keeper_id", "keeper_sim_micro").collect().head
    assert(row.getLong(0) == 1L)
    val simTo1 = row.getLong(1)
    assert(simTo1 < 1000000L, s"keeper sim must be the ~0.985 pair, got $simTo1")
    assert(simTo1 > 950000L)
  }

  test("pageRankMicro: star hub outranks leaves; mass conserved per round shape") {
    import spark.implicits._
    // star graph: node 0 connected to 1..5 -> hub must outrank any leaf
    val pairs = (1L to 5L).map(j => (0L, j)).toDF("i", "j")
    val r = graft.dedup.Dedup.pageRankMicro(pairs, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.size == 6)
    val hub = r(0L)
    (1L to 5L).foreach(j => assert(hub > r(j), s"hub $hub <= leaf ${r(j)}"))
    // leaves are symmetric -> identical ranks
    assert((1L to 5L).map(r).toSet.size == 1)
  }

  test("weightedPageRankMicro: weight pull beats degree symmetry; " +
    "unit weights equal pageRankMicro") {
    import spark.implicits._
    // path graph a-b-c with a heavy a-b edge: b and the heavy edge pull
    // a above c even though a and c have identical degree
    val pairs = Seq(("a", "b", 9L), ("b", "c", 1L)).toDF("a", "b", "c")
    val r = graft.graph.GraphOps.weightedPageRankMicro(pairs, iters = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.size == 3)
    assert(r("b") > r("a") && r("b") > r("c"), s"center must dominate: $r")
    assert(r("a") > r("c"), s"heavy-edge endpoint must outrank light: $r")
    // with unit weights the recurrence degenerates to pageRankMicro
    val star = (1L to 5L).map(j => (0L, j, 1L)).toDF("a", "b", "c")
    val wr = graft.graph.GraphOps.weightedPageRankMicro(star, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val ur = graft.dedup.Dedup.pageRankMicro(
      (1L to 5L).map(j => (0L, j)).toDF("i", "j"), iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(wr == ur, s"unit-weight ranks must equal unweighted: $wr vs $ur")
  }

  test("runLatestWinsToBatch equals batch argmax truth") {
    val out = graft.streaming.StreamingUpsert
      .runLatestWinsToBatch(spark, sf001, nFiles = 3)
    val truth = graft.io.Sources.table(spark, sf001, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"),
        col("event_id"), col("event_type"))
      .groupBy("user_id")
      .agg(max(struct(col("sec"), col("event_id"), col("event_type"))).as("m"))
      .select(col("user_id"), col("m.sec"), col("m.event_id"), col("m.event_type"))
    assert(out.count() == truth.count())
    assert(out.exceptAll(truth).isEmpty && truth.exceptAll(out).isEmpty)
  }
}
