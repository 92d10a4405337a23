package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Temporal

/** As-of join and bucketized range join semantics on hand-computable
  * fixtures: backward-inclusive matching, tie handling, null when no
  * right row precedes, and range-join equivalence to the naive
  * inequality join. */
class TemporalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("asofJoin: backward inclusive match, null when nothing precedes") {
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (1L, 5L, "c"), (2L, 50L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 20L, 200.0), (3L, 1L, 999.0))
      .toDF("k", "rt", "v")
    val out = Temporal.asofJoin(left, right, "k", "t", "rt", Seq("v"))
      .select("tag", "asof_time", "asof_v")
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
         Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(out("a") == (Some(10L), Some(100.0)))   // exact-tie: inclusive
    assert(out("b") == (Some(20L), Some(200.0)))   // latest preceding wins
    assert(out("c") == (None, None))               // nothing at/before t=5
    assert(out("d") == (None, None))               // key has no right rows
  }

  test("asofJoin: left row count and columns preserved") {
    val left = Seq((1L, 10L), (1L, 11L), (1L, 12L)).toDF("k", "t")
    val right = Seq((1L, 10L, 1.0)).toDF("k", "rt", "v")
    val out = Temporal.asofJoin(left, right, "k", "t", "rt", Seq("v"))
    assert(out.count() == 3)
    assert(out.columns.contains("t") && out.columns.contains("asof_v"))
  }

  test("latestPerKeyTime keeps exactly the greatest-tiebreak row") {
    val df = Seq((1L, 10L, 1L, "lo"), (1L, 10L, 9L, "hi"), (1L, 11L, 2L, "x"))
      .toDF("k", "t", "tb", "tag")
    val out = Temporal.latestPerKeyTime(df, "k", "t", "tb")
      .select("tag").as[String].collect().toSet
    assert(out == Set("hi", "x"))
  }

  test("rangeJoin matches the naive inequality join (incl. multi-bucket spans)") {
    val rnd = new scala.util.Random(42)
    val left = (1 to 40).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (i.toLong % 5, lo, lo + rnd.nextInt(400).toLong, i.toLong)
    }.toDF("k", "lo", "hi", "lid")
    val right = (1 to 300).map { i =>
      (i.toLong % 5, rnd.nextInt(1600).toLong, i.toLong)
    }.toDF("k", "t", "rid")
    val fast = Temporal.rangeJoin(left, right, "k", "lo", "hi", "t",
        bucketSec = 128L)
      .select("lid", "rid")
    val naive = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("r.t") >= col("l.lo") &&
          col("r.t") <= col("l.hi"))
      .select("lid", "rid")
    assert(fast.count() == naive.count())
    assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty)
  }

  test("rangeJoin emits no duplicate matches when an interval spans buckets") {
    val left = Seq((1L, 0L, 1000L, 1L)).toDF("k", "lo", "hi", "lid")
    val right = Seq((1L, 500L, 1L)).toDF("k", "t", "rid")
    // interval covers 11 buckets at width 100; the one matching row must
    // appear exactly once
    assert(Temporal.rangeJoin(left, right, "k", "lo", "hi", "t", 100L).count() == 1)
  }

  test("asofJoin: a matched right row with a NULL payload stays null (no carry from older rows)") {
    import spark.implicits._
    // right: (t=5, v=42), (t=10, v=null); left at t=12 matches t=10 —
    // the attached value must be the t=10 row's null, NOT 42
    val left = Seq((1L, 12L)).toDF("k", "lt")
    val right = Seq((1L, 5L, Some(42.0)), (1L, 10L, None))
      .toDF("k", "rt", "v")
    val out = Temporal.asofJoin(left, right, "k", "lt", "rt", Seq("v"))
      .select("asof_time", "asof_v").collect().head
    assert(out.getLong(0) == 10L)
    assert(out.isNullAt(1), s"expected null payload from the matched row, got ${out.get(1)}")
  }

  test("asofJoin: null-key/null-time right rows match nothing (SQL ASOF semantics)") {
    import spark.implicits._
    // dirty right rows: null time (would otherwise sort first and become
    // a universal fallback) and null key (would otherwise match null-key
    // left rows through the window partition)
    val left = Seq((Some(1L), 10L, "a"), (None, 10L, "b"))
      .toDF("k", "lt", "tag")
    val right = Seq((Some(1L), Option.empty[Long], 99.0),
      (Option.empty[Long], Some(5L), 77.0))
      .toDF("k", "rt", "v")
    val out = Temporal.asofJoin(left, right, "k", "lt", "rt", Seq("v"))
      .select("tag", "asof_time", "asof_v").collect()
      .map(r => r.getString(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(out("a") == ((true, true)), "null-time right row leaked a payload")
    assert(out("b") == ((true, true)), "null keys matched each other")
  }

  test("rangeJoin: a corrupt hi < lo interval is dropped, not exploded") {
    import spark.implicits._
    val left = Seq((1L, 1700000000L, 0L, 1L), (1L, 0L, 200L, 2L))
      .toDF("k", "lo", "hi", "lid")
    val right = Seq((1L, 100L, 1L)).toDF("k", "t", "rid")
    val got = Temporal.rangeJoin(left, right, "k", "lo", "hi", "t", 100L)
      .select("lid").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L), "only the valid interval may match")
  }
}
