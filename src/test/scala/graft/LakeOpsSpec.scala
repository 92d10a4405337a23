package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.curation.Curation
import graft.ops.{Layout, Relational}

/** Round-5 lake/LM operators: SCD2, bigram surprisal, DSIR weights,
  * hash splits, and the range-sorted file layout. */
class LakeOpsSpec extends AnyFunSuite with SparkSpec {

  test("scd2Versions: change-only versions, closed with next change, one current") {
    import spark.implicits._
    // key 1: A A B A  (dates 1..4) -> versions A[1,3) B[3,4) A[4,open)
    // key 2: C        -> single open version
    val log = Seq(
      (1L, "2020-01-01", 10L, "A"), (1L, "2020-01-02", 11L, "A"),
      (1L, "2020-01-03", 12L, "B"), (1L, "2020-01-04", 13L, "A"),
      (2L, "2020-02-01", 20L, "C"))
      .toDF("k", "ds", "tie", "attr")
      .withColumn("d", to_date(col("ds"))).drop("ds")
    val v = Relational.scd2Versions(log, "k", "d", "tie", "attr")
      .orderBy("k", "version")
      .select("k", "version", "attr", "valid_from", "valid_to", "is_current")
      .collect()
    assert(v.length == 4)
    val k1 = v.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getString(2)).toSeq == Seq("A", "B", "A"))
    assert(k1.map(r => Option(r.getDate(4)).map(_.toString).getOrElse("open")).toSeq ==
      Seq("2020-01-03", "2020-01-04", "open"))
    assert(v.count(_.getBoolean(5)) == 2) // one current version per key
  }

  test("scd2Versions: null attribute values are real versions, not skipped changes") {
    import spark.implicits._
    // A -> null -> A must produce THREE versions; a naive lag-null filter
    // drops the null version and merges the As
    val log = Seq(
      (1L, "2020-01-01", 10L, Some("A")),
      (1L, "2020-01-02", 11L, None),
      (1L, "2020-01-03", 12L, Some("A")))
      .toDF("k", "ds", "tie", "attr")
      .withColumn("d", to_date(col("ds"))).drop("ds")
    val v = Relational.scd2Versions(log, "k", "d", "tie", "attr")
      .select("version", "attr", "valid_to")
      .orderBy("version").collect()
    assert(v.length == 3, s"expected 3 versions, got ${v.length}")
    assert(v.map(r => Option(r.get(1)).map(_.toString)).toSeq ==
      Seq(Some("A"), None, Some("A")))
    assert(Option(v(0).getDate(2)).map(_.toString).contains("2020-01-02"))
    assert(Option(v(1).getDate(2)).map(_.toString).contains("2020-01-03"))
  }

  test("bigramSurprisal: sub-bigram docs are excluded inside the operator") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "solo"), (4L, ""))
      .toDF("doc_id", "text")
    val out = Curation.bigramSurprisalStats(docs).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L),
      "1-token/empty docs must not reach the bigram model")
  }

  test("bigramSurprisal: deterministic-text bigrams score zero, rare ones positive") {
    import spark.implicits._
    // corpus: "a b" x3 and "a c" x1 -> P(b|a)=3/4, P(c|a)=1/4
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"))
      .toDF("doc_id", "text")
    val out = Curation.bigramSurprisalStats(docs).orderBy("doc_id").collect()
    assert(out.length == 4)
    val mnatAB = out.head.getLong(2)  // sum_mnat of doc 1 (one bigram "a b")
    val mnatAC = out.last.getLong(2)
    assert(mnatAB == math.round(-math.log(3.0 / 4.0) * 1000))
    assert(mnatAC == math.round(-math.log(1.0 / 4.0) * 1000))
  }

  test("dsirStats: target-typical tokens weigh positive, off-target negative") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "hello world hello world"),
      (2L, "en", "hello world"),
      (3L, "es", "hola mundo hola mundo"))
      .toDF("doc_id", "lang", "text")
    val out = Curation.dsirStats(docs, isTarget = col("lang") === "en",
        buckets = 64, carryCols = Seq("lang"))
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    // english docs lean positive (their buckets dominate the target dist),
    // the spanish doc negative
    assert(out(0).getLong(3) > 0, "en doc should score positive")
    assert(out(2).getLong(3) < 0, "es doc should score negative")
  }

  test("splitLabel: deterministic, total cover, ~80/10/10") {
    import spark.implicits._
    val ids = (0L until 10000L).toDF("id")
    val counts = ids
      .groupBy(Curation.splitLabel(col("id"), 8000, 1000).as("split"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000)
    assert(math.abs(counts("train") - 8000L) < 200)
    assert(math.abs(counts("val") - 1000L) < 120)
    assert(math.abs(counts("test") - 1000L) < 120)
    // determinism across invocations
    val again = ids
      .groupBy(Curation.splitLabel(col("id"), 8000, 1000).as("split"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)
  }

  test("rangeSortedWrite: content preserved, per-file intervals disjoint") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_layout_spec").toString
    val src = (0L until 1000L).map(i => (i, i % 97)).toDF("id", "key")
    val reread = Layout.rangeSortedWrite(src, "key", "id", 4, dir)
    assert(reread.count() == 1000)
    val iv = Layout.fileIntervals(reread, "key")
      .select("lo", "hi", "n").orderBy("lo", "hi").collect()
    assert(iv.map(_.getLong(2)).sum == 1000)
    iv.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(1) < b.getLong(0),
        s"overlap: ${a.getLong(1)} vs ${b.getLong(0)}")
      case _ => ()
    }
  }

  test("hilbertIndex: exhaustive bijection + unit adjacency; Morton jumps") {
    import spark.implicits._
    // all 256 cells of the 16x16 grid (bits = 4)
    val cells = (for (x <- 0 until 16; y <- 0 until 16) yield (x, y))
      .toDF("x", "y")
    val got = Layout.hilbertIndex(cells, col("x"), col("y"), bits = 4,
        out = "d")
      .withColumn("z", Layout.zValue(col("x"), col("y"), 4))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // bijection onto [0, 256)
    assert(got.map(_._3).sorted.toSeq == (0L until 256L))
    // THE Hilbert property: consecutive d are grid-adjacent (unit
    // Manhattan step) — this is what makes a run of consecutive keys a
    // compact 2-D region
    val byD = got.map(t => t._3 -> (t._1, t._2)).toMap
    (0L until 255L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"Hilbert jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
    // Morton does NOT have it: its max consecutive-key jump crosses the
    // grid (the power-of-two seam) — the measured reason to prefer Hilbert
    val byZ = got.map(t => t._4 -> (t._1, t._2)).toMap
    val maxZJump = (0L until 255L).map { z =>
      val (x1, y1) = byZ(z); val (x2, y2) = byZ(z + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    assert(maxZJump > 1, s"expected Morton to jump, max step was $maxZJump")
  }
}
