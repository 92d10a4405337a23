package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.ops.{Relational, Windows}

class RelationalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Deterministic property sweep: sample `n` cases from a Gen with a
    * fixed seed (no scalatest-scalacheck bridge in the offline cache). */
  private def sweep[A](g: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  test("saltedAggregate equals plain aggregate on a skewed key") {
    // 90% of rows on one hot key
    val df = spark.range(10000).select(
      when(col("id") % 10 < 9, "HOT").otherwise(concat(lit("k"), col("id") % 7))
        .as("k"),
      col("id").as("v"))
    val salted = Relational.saltedAggregate(df, Seq("k"), salts = 8,
      partialAggs = Seq(sum("v").as("s"), count(lit(1)).as("c")),
      finalAggs = Seq(sum("s").as("total"), sum("c").as("n")))
    val plain = df.groupBy("k")
      .agg(sum("v").as("total"), count(lit(1)).as("n"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("pareto buckets top-N plus OTROS and cum_pct reaches 100") {
    val df = spark.range(1000)
      .select(concat(lit("k"), (col("id") % 30)).as("k"))
    val p = Relational.pareto(df, "k", topN = 5).collect()
    assert(p.length == 6) // 5 + OTROS
    assert(p.map(_.getAs[Long]("cnt")).sum == 1000)
    val maxCum = p.map(_.getAs[Double]("cum_pct")).max
    assert(math.abs(maxCum - 100.0) < 0.01)
  }

  test("property: seeded ntile is balanced and covering for any (n, seed, groups)") {
    val gens = for {
      n <- Gen.choose(2, 8)
      seed <- Gen.choose(1L, 1000L)
      nGroups <- Gen.choose(1, 5)
      rows <- Gen.choose(50, 300)
    } yield (n, seed, nGroups, rows)
    sweep(gens, 5) { case (n, seed, nGroups, rows) =>
      val df = spark.range(rows).select(
        (col("id") % nGroups).cast("string").as("g"), col("id").as("pid"))
      val p = Windows.seededNtile(df, Seq("g"), "pid", n, seed)
      val stats = p.groupBy("g", "partition_id").count()
        .groupBy("g").agg((max("count") - min("count")).as("spread"),
          count(lit(1)).as("nparts")).collect()
      stats.foreach { r =>
        assert(r.getAs[Long]("spread") <= 1)
        assert(r.getAs[Long]("nparts") <= n)
      }
      assert(p.count() == rows)
      assert(p.select("pid").distinct().count() == rows)
    }
  }

  test("pivotCountTopN caps width and folds the tail into OTROS") {
    val df = spark.range(1000).select(
      (col("id") % 3).cast("string").as("r"),
      concat(lit("c"), col("id") % 50).as("c")) // 50 distinct col values
    val p = Relational.pivotCountTopN(df, "r", "c", topN = 5)
    assert(p.columns.length == 7) // r + 5 + OTROS
    val totals = p.collect().map(r => (1 until 7).map(r.getLong).sum).sum
    assert(totals == 1000)
  }

  test("sketch aggregates stay within error bounds of exact") {
    // q56 emits verdict booleans (the oracle asserts them TRUE); the spec
    // checks the same verdicts hold at sf0.001 where the oracle never runs
    val got = graft.queries.ExtraQueries.q56Sketches.fn(spark, sf001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("exact_distinct") > 0)
      assert(r.getAs[Boolean]("hll_within_rsd"), s"HLL out of bounds: $r")
      assert(r.getAs[Boolean]("median_within_band"), s"median out of band: $r")
    }
  }

  test("withTotalsRow appends a grand-total via rollup") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "v")
    val got = Relational.withTotalsRow(df, "k", Seq(sum("v").as("s")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 3L, "TOTAL" -> 6L))
  }

  test("argmax returns the max with attribution") {
    val df = Seq(("x", 10.0, 1), ("y", 30.0, 2), ("z", 20.0, 3))
      .toDF("name", "v", "i")
    val r = Relational.argmax(df, col("v"), col("name"), col("i")).collect()(0)
    assert(r.getDouble(0) == 30.0 && r.getString(1) == "y" && r.getInt(2) == 2)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val v2 = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("k", "v")
    val got = Relational.snapshotDiff(v1, v2, "k", md5(col("v")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("groupedLinearFit recovers an exact line per group") {
    // y = 3x + 2 (milli-quantized) for g=a; y = -x + 10 for g=b
    val rows = (0 to 10).flatMap(x =>
      Seq(("a", x, 3000L * x + 2000L), ("b", x, -1000L * x + 10000L)))
    val df = rows.toDF("g", "x", "y")
    val got = Relational.groupedLinearFit(df, "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(got("a") == ((3000.0, 2000.0)))
    assert(got("b") == ((-1000.0, 10000.0)))
  }

  test("groupedLinearFit nulls slope/intercept for constant-x groups") {
    // one multi-row constant-x group and one single-row group: the
    // normal-equation denominator is zero, so the line is undefined —
    // NULL (never NaN, which would diverge from the DuckDB oracle)
    val rows = Seq(("c", 5, 100L), ("c", 5, 200L), ("s", 7, 300L))
    val got = Relational.groupedLinearFit(
      rows.toDF("g", "x", "y"), "g", col("x"), col("y")).collect()
    got.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("slope_q")), s"${r.getString(0)} slope")
      assert(r.isNullAt(r.fieldIndex("intercept_q")))
    }
  }
}
