package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.curation.Curation
import graft.dedup.Dedup

class CurationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("connectedComponents: transitive closure labels with min id") {
    // 1-2, 2-3 chain + 5-6 island + 10-11-12 star
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (10L, 11L), (10L, 12L))
      .toDF("i", "j")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("connectedComponents: long chain converges within maxIters") {
    // a path graph is the worst case for plain min propagation (diameter
    // = n-1); 12 nodes needs 11 rounds — inside the default bound
    val chain = (0L until 11L).map(k => (k, k + 1)).toDF("i", "j")
    // driverMaxEdges=0 forces the distributed loop — the path maxIters governs
    val got = Dedup.connectedComponents(chain, driverMaxEdges = 0L).collect()
    assert(got.length == 12 && got.forall(_.getLong(1) == 0L))
  }

  test("property: connectedComponents matches union-find on random graphs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gens = for {
      n <- Gen.choose(4, 40)
      m <- Gen.choose(0, 2 * n)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    (0 until 6).foreach { k =>
      gens.apply(Gen.Parameters.default, Seed(7L + k)).foreach { edges =>
        // driver-side union-find oracle, min-id labels
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
          .map(v => v -> find(v)).toMap
        if (expected.nonEmpty) {
          // exercise BOTH the driver fast path and the distributed loop
          Seq(1L << 20, 0L).foreach { thresh =>
            val got = Dedup.connectedComponents(edges.toDF("i", "j"),
                maxIters = 50, driverMaxEdges = thresh)
              .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
            assert(got == expected, s"case $k (driverMaxEdges=$thresh): ${edges.take(20)}")
          }
        }
      }
    }
  }

  test("stratifiedSample: deterministic, rate-proportional, repartition-invariant") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val n = docs.count()
    val half = Curation.stratifiedSample(docs, "doc_id", lit(5000))
    val k1 = half.select("doc_id").collect().map(_.getLong(0)).toSet
    val k2 = Curation.stratifiedSample(docs.repartition(7), "doc_id", lit(5000))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(k1 == k2, "sampling decision must not depend on partitioning")
    assert(math.abs(k1.size.toDouble / n - 0.5) < 0.1, s"got ${k1.size}/$n")
    // rate 0 and 10000 are the empty and identity samples
    assert(Curation.stratifiedSample(docs, "doc_id", lit(0)).isEmpty)
    assert(Curation.stratifiedSample(docs, "doc_id", lit(10000)).count() == n)
  }

  test("vocabTopK: ranks by count desc with token tiebreak") {
    val docs = Seq(("a", "x x x y y z"), ("a", "y w w"), ("b", "q q r"))
      .toDF("lang", "text")
    val got = Curation.vocabTopK(docs, "lang", 2, "text")
      .orderBy("lang", "rank")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", "x", 3L, 1L), ("a", "y", 3L, 2L),
      ("b", "q", 2L, 1L), ("b", "r", 1L, 2L)))
  }

  test("contaminated: flags overlap above threshold only") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"), // shares 4 3-shingles
      (2L, "alpha beta gamma nope nope nope"),         // shares 1
      (3L, "totally unrelated words here now then")    // shares 0
    ).toDF("doc_id", "text")
    val hits = Curation.contaminated(corpus, bench, minShingles = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 4L))
    val loose = Curation.contaminated(corpus, bench, minShingles = 1)
      .collect().map(_.getLong(0)).toSet
    assert(loose == Set(1L, 2L))
  }

  test("pii masking: digits masked and counted, pseudonym consistent") {
    val df = Seq(("Customer#000000042", 1234.56), ("Customer#000000042", 999.99),
      ("NoDigits", -250.0)).toDF("name", "bal")
      .select(Curation.maskDigits($"name").as("m"),
        Curation.digitsRedacted($"name").as("k"),
        Curation.pseudonym($"name").as("p"),
        Curation.bucketize($"bal", 1000.0).as("b"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "Customer#XXXXXXXXX" && rows(0).getLong(1) == 9)
    assert(rows(2).getString(0) == "NoDigits" && rows(2).getLong(1) == 0)
    // same identity -> same pseudonym; different -> different
    assert(rows(0).getString(2) == rows(1).getString(2))
    assert(rows(0).getString(2) != rows(2).getString(2))
    assert(rows(0).getString(2).startsWith("u_") && rows(0).getString(2).length == 14)
    // bucketize: floor semantics incl. negatives
    assert(rows(0).getDouble(3) == 1000.0 && rows(2).getDouble(3) == -1000.0)
  }

  test("heavyHitters: exact when capacity exceeds the distinct-key count") {
    val keys = (0 until 1000).map(i => s"k${i % 7}")
    val df = keys.toDF("k").repartition(8) // force cross-partition merges
    val got = Curation.heavyHitters(df, $"k", capacity = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == exact)
  }

  test("heavyHitters: MG bounds hold under genuine eviction") {
    // 3 hot keys × 200 + 400 unique cold keys; capacity 16 << 403 distinct
    val keys = (0 until 600).map(i => s"hot${i % 3}") ++
      (0 until 400).map(i => s"cold$i")
    val n = keys.size.toLong // 1000
    val m = 16
    val bound = n.toDouble / (m + 1) // ≈ 58.8
    val df = keys.toDF("k").repartition(8)
    val est = Curation.heavyHitters(df, $"k", capacity = m)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size <= m, s"sketch kept ${est.size} > $m counters")
    // every key with c > N/(m+1) must survive, with est in [c - bound, c]
    Seq("hot0", "hot1", "hot2").foreach { k =>
      assert(est.contains(k), s"$k (count 200 > $bound) was evicted")
      assert(est(k) <= 200L && 200L - est(k) <= bound,
        s"$k estimate ${est(k)} outside [${200 - bound}, 200]")
    }
    // never overestimates: cold keys are singletons
    est.foreach { case (k, e) =>
      val c = if (k.startsWith("hot")) 200L else 1L
      assert(e <= c, s"$k overestimated: $e > $c")
    }
  }

  test("heavyHittersGrouped: per-group sketches are isolated and exact under capacity") {
    // each group's sketch sees only its own keys: g1's hot key must not
    // appear in g2's sketch, and with capacity >= distinct keys the
    // per-group estimates are exact counts
    val rows = (0 until 90).map(i => ("g1", s"hot")) ++
      (0 until 10).map(i => ("g1", s"cold$i")) ++
      (0 until 50).map(i => ("g2", s"other"))
    val df = rows.toDF("g", "k").repartition(8)
    val got = Curation.heavyHittersGrouped(df, "g", $"k", capacity = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("g1", "hot")) == 90L)
    assert(got(("g2", "other")) == 50L)
    assert(!got.contains(("g2", "hot")))
  }

  test("heavyHittersConfirmed: sketch-then-confirm equals the all-keys exact top-k") {
    // same eviction fixture: hot keys clear the survival bound, so the
    // candidate-bounded exact pass must reproduce the full exact top-k
    val keys = (0 until 600).map(i => s"hot${i % 3}") ++
      (0 until 400).map(i => s"cold$i")
    val df = keys.toDF("k").repartition(8)
    val got = Curation.heavyHittersConfirmed(df, $"k", capacity = 16, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(got == List(("hot0", 200L), ("hot1", 200L), ("hot2", 200L)))
  }

  test("registrableDomain + urlProfile truth table") {
    val hosts = Seq("cdn.img.site.co.uk", "www.site.org", "site.com",
      "a.b.c.d.ac.uk", "localhost", "site.co.jp").toDF("h")
    val got = hosts.select($"h", Curation.registrableDomain($"h").as("rd"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("cdn.img.site.co.uk") == "site.co.uk") // two-part suffix
    assert(got("www.site.org") == "site.org")
    assert(got("site.com") == "site.com")
    assert(got("a.b.c.d.ac.uk") == "d.ac.uk")
    assert(got("localhost") == "localhost") // single label: itself
    assert(got("site.co.jp") == "site.co.jp") // bare eTLD+1, n==3 path
    // urlProfile: port stripped from host, missing path/query handled
    val urls = Seq(
      (1L, "https://www.site.co.uk:8080/a/b?q=1"),
      (2L, "https://site.io"),
      (3L, "not a url at all")).toDF("doc_id", "url")
    val p = Curation.urlProfile(urls, $"url").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(p(1L).getAs[String]("host") == "www.site.co.uk")
    assert(p(1L).getAs[String]("registrable_domain") == "site.co.uk")
    assert(p(1L).getAs[Long]("path_depth") == 2L &&
      p(1L).getAs[Boolean]("has_query"))
    assert(p(2L).getAs[Long]("path_depth") == 0L &&
      !p(2L).getAs[Boolean]("has_query"))
    // garbage: null host, never a throw (crawl junk must not fail the stage)
    assert(p(3L).isNullAt(p(3L).fieldIndex("host")))
  }

  test("dpLadder matches the closed-form truncated two-sided geometric (alpha = 1/2)") {
    // independent recomputation — the ladder constants are shared by
    // the q294 plan AND its oracle, so a bug there would pass the hash
    // gate; this spec is the outside check. P(k) ∝ (1/2)^|k| with the
    // tail beyond ±8 folded into the clamp; denominator 768 = 3·2^8.
    val ladder = graft.queries.CurationQueries.dpLadder
    def mass(k: Long): Long =
      if (math.abs(k) == 8) 2L // (1/3)(1/2)^7 · 768, tail folded in
      else (256.0 / math.pow(2.0, math.abs(k).toDouble)).round
    val ks = (-8L to 8L)
    assert(ladder.map(_._2) == ks, "support must be -8..8 in order")
    assert(ks.map(mass).sum == 768L, "total mass must be exactly 1")
    val expectedCum = ks.scanLeft(0L)((c, k) => c + mass(k)).tail
    assert(ladder.map(_._1) == expectedCum)
    // symmetry of the mechanism: P(k) = P(-k)
    ks.filter(_ > 0).foreach(k => assert(mass(k) == mass(-k)))
  }
}
