package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextAnalysis

class DedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // long enough that a single changed token keeps 3-shingle Jaccard ~0.97
  // (the LSH band design detects >=0.9 reliably; see q36 corpus analysis)
  private val base = "the quick brown fox jumps over the lazy dog near the old river bank " +
    "while birds sing in tall green trees above quiet water meadows today " +
    "farmers walk along narrow dirt paths carrying baskets of ripe apples " +
    "children play beside wooden fences as clouds drift across the pale sky " +
    "fishermen cast long lines into the slow current hoping for silver trout"
  private val nearDup = base.replace("quiet", "silent") // one token changed
  private val distinct1 = "completely different content about database engines " +
    "columnar storage vectorized execution and query optimizers running fast"
  private val distinct2 = "yet another unrelated text mentioning mountains valleys " +
    "glaciers snow peaks hikers trails maps compasses and weather forecasts"

  private def docs = Seq(
    (0L, base), (1L, nearDup), (2L, distinct1), (3L, distinct2),
    (4L, base) // exact duplicate of 0
  ).toDF("doc_id", "text")

  test("exactDedup keeps lowest doc_id per fingerprint") {
    val kept = Dedup.exactDedup(docs).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(0L, 1L, 2L, 3L)) // 4 (dup of 0) dropped
  }

  test("fingerprint is whitespace/case-insensitive") {
    val a = Seq(("A  b\tC"), ("a b c")).toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("f"))
      .collect().map(_.getString(0))
    assert(a(0) == a(1))
  }

  test("minhash LSH finds exact and near dup, not unrelated (recall/precision)") {
    val pairs = Dedup.minhashCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 4L))) // exact dup: all bands collide
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 4L))) // near dup
    assert(!pairs.contains((2L, 3L))) // unrelated never pairs
  }

  test("minhash signature of identical texts is identical") {
    val sig = Dedup.minhashSignature(docs).filter($"doc_id".isin(0L, 4L))
      .drop("doc_id").collect()
    assert(sig(0).toSeq == sig(1).toSeq)
  }

  test("ngram jaccard: exact=1.0, near-dup high, blocked unrelated absent") {
    val got = Dedup.ngramJaccardBlocked(docs, substring(col("text"), 1, 20),
      threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got((0L, 4L)) == 1.0)
    assert(got((0L, 1L)) > 0.7 && got((0L, 1L)) < 1.0)
    assert(!got.contains((2L, 3L)))
  }

  test("simhash: identical => distance 0; near-dup close; unrelated far") {
    val fp = Dedup.withSimhash(docs).select("doc_id", "fp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(fp(a) ^ fp(b))
    assert(dist(0L, 4L) == 0)
    assert(dist(0L, 1L) < dist(0L, 2L))
    assert(dist(0L, 1L) <= 12)
  }

  test("simhashCandidates: pigeonhole blocking finds exact dup") {
    val pairs = Dedup.simhashCandidates(docs, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 4L)))
  }

  test("simhashCandidates rejects radii beyond the pigeonhole guarantee") {
    // 4 chunks guarantee a shared chunk only for distance <= 3; a larger
    // radius would silently drop pairs, so it must fail fast
    intercept[IllegalArgumentException] {
      Dedup.simhashCandidates(docs, maxDist = 4)
    }
  }

  test("connectedComponents: distributed loop ≡ driver union-find on random graphs") {
    // the scale path (distributed min-label propagation) is only taken
    // for >2^20-edge graphs in production, which no test corpus reaches —
    // force it with driverMaxEdges = 0 and check the two paths label
    // identical clusters on seeded random graphs (isolated-free, mixed
    // component shapes: chains, triangles, singleton pairs)
    for (seed <- Seq(7, 42)) {
      val rng = new scala.util.Random(seed)
      val nNodes = 30 + rng.nextInt(20)
      val nEdges = 40 + rng.nextInt(40)
      val pairs = Seq.fill(nEdges)(
          (rng.nextInt(nNodes).toLong, rng.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }
        .toDF("i", "j")
      val viaDriver = Dedup.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaDistributed = Dedup.connectedComponents(pairs, driverMaxEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaDistributed == viaDriver, s"seed=$seed")
    }
  }

  test("connectedComponents: star contraction resolves a 200-deep chain in <= 20 rounds") {
    // a path graph is the adversarial case for min-label propagation
    // (O(diameter) rounds — 200 here, past any sane cap); two-phase star
    // contraction halves the depth per round, so ~8 rounds suffice
    val chain = (0L until 199L).map(k => (k, k + 1)).toDF("i", "j")
    val labels = Dedup.connectedComponents(chain, driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 200)
    assert(labels.values.forall(_ == 0L))
  }

  test("connectedComponents: distributed loop fails loudly when capped below convergence") {
    // a 32-node path needs ~6 star rounds (depth halves per round);
    // maxIters=2 must throw, not return partial labels
    val chain = (0L until 31L).map(k => (k, k + 1)).toDF("i", "j")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIters = 2, driverMaxEdges = 0L)
    }
  }

  test("triangles: degree-oriented enumeration matches brute force on a known graph") {
    // K4 on {0,1,2,3} (4 triangles) + a pendant edge + a hub star that
    // closes exactly one extra triangle (100-101-102); duplicate and
    // reversed input pairs must not double-count
    val star = (103L to 120L).map(k => (100L, k))
    val edges = (Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 4L), (100L, 101L), (101L, 102L), (102L, 100L),
      (1L, 0L), (0L, 1L)) ++ star).toDF("i", "j")
    val got = Dedup.triangles(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = Set((0L, 1L, 2L), (0L, 1L, 3L), (0L, 2L, 3L), (1L, 2L, 3L),
      (100L, 101L, 102L))
    assert(got == expected)
  }

  test("property: triangles matches driver brute force on random graphs") {
    val rnd = new scala.util.Random(42)
    (0 until 5).foreach { _ =>
      val n = 12 + rnd.nextInt(20)
      val edges = (0 until 3 * n).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val norm = edges.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.toSet
      val expected = (for {
        (a, b) <- norm; (b2, c) <- norm if b2 == b && norm((a, c))
      } yield (a, b, c)).toSet
      val got = Dedup.triangles(edges.toDF("i", "j"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"n=$n edges=$norm")
    }
  }

  test("dHash56: off-grid edit invariant, on-grid edits move few bits, " +
    "chunk join matches brute force") {
    import graft.multimodal.Multimodal
    val rng = new scala.util.Random(7)
    val blobs = (0L until 40L).map { i =>
      i -> Array.fill(200 + rng.nextInt(100))((rng.nextInt(256) - 128).toByte)
    }
    // twin: flip byte 1 — never a sampled offset for n >= 126
    val twins = blobs.map { case (i, b) =>
      val t = b.clone(); t(1) = (t(1) ^ 0x55).toByte; (i + 1000L, t)
    }
    blobs.zip(twins).foreach { case ((_, b), (_, t)) =>
      assert(Multimodal.dHash56(b) == Multimodal.dHash56(t),
        "off-grid edit changed the fingerprint")
    }
    // brute truth vs chunk join on the union
    val all = (blobs ++ twins).toDF("media_id", "blob")
    val hashed = Multimodal.withDhash(all).localCheckpoint()
    val got = Multimodal.phashCandidates(hashed, maxDist = 3)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hs = hashed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for {
      a <- hs.keys; b <- hs.keys if a < b
      if java.lang.Long.bitCount(hs(a) ^ hs(b)) <= 3
    } yield (a, b)).toSet
    assert(got == want, s"chunk join diverges from brute force: " +
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.size >= 40, "planted twins must all pair")
    // null blobs keep flowing as null fingerprints, never pair
    val withNull = Seq((9999L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "blob")
    val nh = Multimodal.withDhash(withNull).collect()
    assert(nh.length == 1 && nh(0).isNullAt(1))
  }

  test("shingles: distinct 3-gram count") {
    val n = spark.range(1).select(size(Dedup.shingles(lit("a b c d e"))).as("n"))
      .collect()(0).getInt(0)
    assert(n == 3) // "a b c","b c d","c d e"
  }

  test("containmentPairs: planted quotation found, Jaccard-low pair still flagged") {
    import spark.implicits._
    // doc 2 quotes ALL of doc 1 inside much longer unrelated text:
    // containment(1 in 2) = 1.0 while Jaccard is far below 0.3
    val quote = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, quote),
      (2L, s"$filler $quote ${(41 to 80).map(i => s"w$i").mkString(" ")}"),
      (3L, "totally different words here nothing shared at all")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, dfCap = 50, thresholdPpm = 900000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    assert(got.head._3 >= 900000L) // >= 90% of doc 1's shingles contained
    // the quoted span plus its two boundary-crossing shingles
    val inter = Dedup.containmentPairs(docs, 50, 0L)
      .filter($"i" === 1 && $"j" === 2).head().getLong(2)
    assert(inter == 4) // all 4 of doc 1's shingles appear in doc 2
  }
}
