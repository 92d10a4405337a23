package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sim.Similarity

class SimilaritySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),   // orthogonal to 0
    (2L, Array(2.0f, 0.0f, 0.0f, 0.0f)),   // same direction as 0
    (3L, Array(0.9f, 0.1f, 0.0f, 0.0f)),   // close to 0
    (4L, Array(0.0f, 0.0f, 0.0f, 0.0f))    // zero vector
  ).toDF("vec_id", "embedding")

  test("cosine: identical direction 1, orthogonal 0, zero-norm guarded") {
    val df = vecs.as("a").crossJoin(vecs.as("b"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        round(Similarity.cosine(col("a.embedding"), col("b.embedding")), 4).as("c"))
    val m = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m((0L, 2L)) == 1.0)
    assert(m((0L, 1L)) == 0.0)
    assert(m((0L, 4L)) == 0.0) // zero vector => 0, not NaN
    assert(m((0L, 3L)) > 0.99)
  }

  test("bruteForceTopK ranks by similarity with deterministic tiebreak") {
    val got = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs, k = 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == Seq(2L, 3L, 1L)) // same-dir, close, orthogonal
    assert(got.map(_._2).toSeq == Seq(1L, 2L, 3L))
  }

  test("cosineNearDupPairs thresholds correctly") {
    val pairs = Similarity.cosineNearDupPairs(vecs, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 2L), (0L, 3L), (2L, 3L)))
  }

  test("lshBucket: identical vectors share a bucket; topK finds the twin") {
    val twins = Seq(
      (10L, Array.fill(64)(0.5f)),
      (11L, Array.fill(64)(0.5f)),
      (12L, Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f))
    ).toDF("vec_id", "embedding")
    val buckets = twins.select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), 64).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buckets(10L) == buckets(11L))
    val top = Similarity.lshTopK(twins.filter($"vec_id" === 10), twins, k = 1, dim = 64)
      .collect()
    assert(top.length == 1 && top(0).getAs[Long]("nid") == 11L &&
      top(0).getAs[Double]("sim") == 1.0)
  }

  test("cosineNearDupPairsBanded: subset of exact pairs, finds twins") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val exact = Similarity.cosineNearDupPairs(emb, threshold = 0.4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val banded = Similarity.cosineNearDupPairsBanded(emb, threshold = 0.4, dim = 64)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    // candidate dedup means no pair appears twice
    assert(banded.map(_._1).distinct.length == banded.length)
    // every banded pair is an exact pair with the identical sim (banding
    // only prunes candidates, never changes the verification)
    banded.foreach { case (k, sim) => assert(exact.get(k).contains(sim)) }
    // the sf0.001 pairs sit at sim 0.40-0.48 where per-pair banded recall
    // is ~0.5 (1-(1-p^4)^4, p = 1-arccos(s)/pi); the hyperplanes are
    // deterministic, so the realized recall is a fixed property of the
    // data — assert a conservative floor well above "bucketing broken"
    assert(exact.nonEmpty)
    val recall = banded.length.toDouble / exact.size
    assert(recall >= 0.25, s"banded recall $recall (${banded.length}/${exact.size})")
  }

  test("lsh bucketed results are consistent with brute force where bucket matches") {
    // every (qid,nid) pair lshTopK returns must carry the same sim that
    // brute force computed for that pair
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 10)
    val brute = Similarity.bruteForceTopK(q, emb, k = 200)
      .select("qid", "nid", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshTopK(q, emb, k = 5, dim = 64)
      .select("qid", "nid", "sim").collect()
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(b => assert(b == r.getDouble(2)))
    }
  }

  test("IVF probeIndex: plan reads ONLY the persisted index, and matches a fresh build") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val emb = graft.io.Sources.table(spark, sf001, "embeddings").localCheckpoint()
    val q = emb.filter($"vec_id" < 10)
    val dir = graft.sim.Ivf.persistedIndex(spark, sf001, nClusters = 16)
    val probe = graft.sim.Ivf.probeIndex(q, dir, k = 3, nProbe = 2)
    // index-reuse pin: every file scan in the probe plan is under the
    // index dir — zero embeddings scans, zero k-means/training jobs
    val paths = probe.queryExecution.sparkPlan
      .collect { case s: FileSourceScanExec => s }
      .flatMap(_.relation.location.rootPaths.map(_.toString))
    assert(paths.nonEmpty, "probe plan has no index scans at all")
    paths.foreach(p => assert(p.contains(dir), s"probe scans non-index file: $p"))
    // deterministic training ⇒ probing the persisted index reproduces an
    // in-query build exactly
    val fresh = graft.sim.Ivf.ivfTopK(q, emb, k = 3, nClusters = 16, nProbe = 2)
    assert(probe.except(fresh).isEmpty && fresh.except(probe).isEmpty,
      "probe-only results diverge from a fresh build")
  }

  test("IVF-PQ probeIndex: plan reads ONLY the persisted composed index") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val emb = graft.io.Sources.table(spark, sf001, "embeddings").localCheckpoint()
    val q = emb.filter($"vec_id" < 10)
    val dir = graft.sim.IvfPq.persistedIndex(spark, sf001,
      nClusters = 16, m = 16, ksub = 16)
    val probe = graft.sim.IvfPq.probeIndex(q, dir, k = 3, nProbe = 4,
      shortlist = 20)
    // index-reuse pin: every file scan in the probe plan is under the
    // index dir — zero embeddings scans, zero training jobs at probe time
    val paths = probe.queryExecution.sparkPlan
      .collect { case s: FileSourceScanExec => s }
      .flatMap(_.relation.location.rootPaths.map(_.toString))
    assert(paths.nonEmpty, "probe plan has no index scans at all")
    paths.foreach(p => assert(p.contains(dir), s"probe scans non-index file: $p"))
    // result-shape + exactness: k rows per query, sims equal recomputed
    // cosine (the shortlist re-rank is EXACT math, ADC only prunes)
    val rows = probe.collect()
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 3))
    val unit = Similarity.withUnitVec(emb, "embedding", "u")
      .select($"vec_id", $"u").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    rows.foreach { r =>
      val (qid, nid, sim) = (r.getLong(0), r.getLong(1), r.getDouble(3))
      val exact = math.rint(unit(qid).zip(unit(nid)).map { case (a, b) => a * b }.sum * 1e4) / 1e4
      assert(sim == exact, s"sim for ($qid,$nid) not exact: $sim vs $exact")
    }
  }

  test("q284 matryoshka curve: full-dim row is perfect recall, curve plausible") {
    val out = graft.queries.TextQueries.q284Matryoshka
      .fn(spark, sf001).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out.keySet == Set(8, 16, 32, 64))
    assert(out(64) == 1000000L) // the identity slice must recall everything
    out.values.foreach(v => assert(v >= 0 && v <= 1000000L))
    // no monotonicity ASSERT below 64: random projections of random
    // vectors can cross; the oracle pins the exact numbers instead
  }

  test("mmrSelect trades relevance for diversity exactly as 7·rel − 3·maxsim says") {
    // candidates: A(rel 100) and B(rel 99) nearly identical (psim 95),
    // C(rel 80) distinct (psim 10). Pick 1 = A (pure argmax). Pick 2:
    // B scores 7·99−3·95 = 408, C scores 7·80−3·10 = 530 → MMR must
    // pick C, where a pure-relevance ranker would pick B.
    val sh = Seq((1L, 10L, 100L), (1L, 11L, 99L), (1L, 12L, 80L))
      .toDF("qid", "nid", "simi")
    val ps = Seq(
      (1L, 10L, 11L, 95L), (1L, 11L, 10L, 95L),
      (1L, 10L, 12L, 10L), (1L, 12L, 10L, 10L),
      (1L, 11L, 12L, 10L), (1L, 12L, 11L, 10L))
      .toDF("qid", "i", "j", "psim")
    val out = graft.sim.Similarity.mmrSelect(sh, ps, k = 3)
      .collect().map(r => r.getLong(4) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((10L, 100L, 0L)))
    assert(out(2L) == ((12L, 80L, 10L)))  // diversity beats redundancy
    // pick 3 = B, maxsim vs {A, C} = max(95, 10) = 95
    assert(out(3L) == ((11L, 99L, 95L)))
  }
}
