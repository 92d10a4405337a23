package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.curation.Curation
import graft.sim.Quantize
import graft.text.Search

/** Round-5 operator semantics on hand-computable fixtures: BM25 ranking,
  * span dedup, surprisal quantization, sequence packing arithmetic, and
  * int8 quantization error bounds. */
class ScaleOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("bm25TopK: tf monotonicity and rare-term dominance") {
    val docs = Seq(
      (1L, "cat cat cat dog"),           // tf(cat)=3
      (2L, "cat dog dog dog"),           // tf(cat)=1
      (3L, "zebra dog dog dog"),         // rare term
      (4L, "dog dog dog dog"),
      (5L, "bird bird bird bird"))
      .toDF("doc_id", "text")
    val catRank = Search.bm25TopK(docs, Seq("cat"), k = 5)
      .select("doc_id", "rank").as[(Long, Long)].collect().toMap
    assert(catRank(1L) < catRank(2L)) // higher tf ranks first (same dl)
    assert(!catRank.contains(5L))     // no hit, no row
    // zebra (df=1) outscores dog (df=4) for the doc containing both
    val both = Search.bm25TopK(docs, Seq("zebra", "dog"), k = 5)
      .filter(col("doc_id") === 3L)
      .select("score_micro").as[Long].head()
    val dogOnly = Search.bm25TopK(docs, Seq("dog"), k = 5)
      .filter(col("doc_id") === 4L)
      .select("score_micro").as[Long].head()
    assert(both > dogOnly)
  }

  test("spanStats: shared span counted, unique spans not") {
    val shared = "a b c d e f g h" // exactly one 8-token span
    val docs = Seq(
      (1L, shared), (2L, shared),
      (3L, "p q r s t u v w"))
      .toDF("doc_id", "text")
    val out = Curation.spanStats(docs, spanTokens = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (1L, 1L) && out(2L) == (1L, 1L)) // common span
    assert(out(3L) == (1L, 0L))                        // unique span
  }

  test("surprisalStats: uniform corpus gives every doc the same mnat") {
    // 4 tokens, each appearing twice → P = 1/4 for all, -ln(1/4)*1000 ≈ 1386
    val docs = Seq((1L, "a b"), (2L, "c d"), (3L, "a b"), (4L, "c d"))
      .toDF("doc_id", "text")
    val out = Curation.surprisalStats(docs)
      .select("doc_id", "sum_mnat", "n_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = math.round(-math.log(0.25) * 1000.0)
    assert(out.forall { case (_, s, n) => n == 2 && s == 2 * expected })
  }

  test("packSequences: closed-form bins match a sequential simulation") {
    val rnd = new scala.util.Random(7)
    val docs = (1 to 200).map(i => (s"s${i % 3}", i.toLong,
      Seq.fill(1 + rnd.nextInt(40))("w").mkString(" ")))
      .toDF("source", "doc_id", "text")
    val out = Curation.packSequences(docs, "source", budget = 64)
      .select("source", "doc_id", "n_tok", "cum_before", "start_bin", "end_bin", "is_split")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .groupBy(_._1)
    out.foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._2).foreach { case (_, _, n, cb, sb, eb, split) =>
        assert(cb == cum, "running offset")
        assert(sb == cum / 64 && eb == (cum + n - 1) / 64)
        assert(split == (eb > sb))
        cum += n
      }
    }
  }

  test("int8 quantization: round-trip error bounded, zero vector safe") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.75f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(100f, -50f, 25f, 12.5f)))
      .toDF("vec_id", "embedding")
    val q = Quantize.withInt8(vecs, "embedding", "e8")
      .select("vec_id", "e8_scale", "e8_q")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Long](2))).toList
    val m = q.map(t => t._1 -> (t._2, t._3)).toMap
    // max element always maps to ±127
    assert(m(1L)._2.map(math.abs).max == 127L)
    assert(m(3L)._2.map(math.abs).max == 127L)
    // zero vector → zero scale, zero codes (no division blowup)
    assert(m(2L)._1 == 0.0 && m(2L)._2.forall(_ == 0L))
    // dequantized values within scale/2 of the original
    val (s1, q1) = m(1L)
    val orig = Seq(0.5, -1.0, 0.25, 0.75)
    q1.zip(orig).foreach { case (qi, x) =>
      assert(math.abs(qi * s1 - x) <= s1 / 2 + 1e-12)
    }
  }

  test("ShinglesK kernel matches the interpreted transform spelling (k=8)") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(200)
    val w = graft.text.TextAnalysis.tokens(col("text"))
    val interpreted = transform(
      sequence(lit(1), greatest(size(w) - 7, lit(1))),
      i => concat_ws(" ", (0 until 8).map(o => element_at(w, (i + o).cast("int"))): _*))
    val both = docs.select(
      graft.dedup.Dedup.shingles(col("text"), 8).as("native"),
      interpreted.as("ref"))
    assert(both.filter(col("native") =!= col("ref")).isEmpty)
  }

  test("saltedJoin: identical rows to the plain join on skewed keys") {
    // 90% of probe rows share one hot key
    val probe = spark.range(2000).select(
      when(col("id") % 10 === 0, col("id") % 7).otherwise(0L).as("k"),
      col("id").as("pid"))
    val build = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "tag")
    val salted = graft.ops.Relational.saltedJoin(
      probe, build, Seq("k"), salts = 4, saltSource = col("pid"))
    val plain = probe.join(build, "k")
    assert(salted.count() == plain.count())
    assert(salted.select("k", "pid", "tag").except(plain.select("k", "pid", "tag")).isEmpty)
    assert(plain.select("k", "pid", "tag").except(salted.select("k", "pid", "tag")).isEmpty)
  }

  test("topKPerGroup: cap respected, deterministic tiebreak") {
    val df = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.9), ("a", 3L, 0.5), ("a", 4L, 0.1),
      ("b", 5L, 0.3))
      .toDF("g", "id", "s")
    val out = Curation.topKPerGroup(df, "g", col("s"), k = 2, idCol = "id")
      .select("g", "id", "quota_rank").as[(String, Long, Long)]
      .collect().toSet
    assert(out == Set(("a", 1L, 1L), ("a", 2L, 2L), ("b", 5L, 1L)))
  }

  test("q291 rendezvous: minimal-disruption identity and conservation") {
    val rows = graft.queries.ScaleQueries.q291Rendezvous
      .fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val total8 = rows.values.map(_._1).sum
    val total9 = rows.values.map(_._2).sum
    assert(total8 == total9 && total8 > 0) // every key stays assigned
    assert(rows(8L)._1 == 0L) // shard 8 didn't exist in the 8-fleet
    // THE rendezvous theorem: adding a shard moves EXACTLY the keys the
    // new shard now wins — moved_ppm must equal shard 8's share
    val movedPpm = rows.values.head._3
    assert(movedPpm == rows(8L)._2 * 1000000L / total9,
      s"moved $movedPpm != new-shard share ${rows(8L)._2 * 1000000L / total9}")
    // and it is in the ballpark of the expected 1/9
    assert(movedPpm > 40000 && movedPpm < 250000)
  }
}
