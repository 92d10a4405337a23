package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Windows

/** D1/D2 partitioner invariants — the reference's own equivalence check
  * (`comparar_particiones`, app.py:183-209) as properties. */
class WindowsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def synthetic(n: Int) =
    spark.range(n).select(
      (col("id") % 7).cast("string").as("grupo"),
      col("id").as("pid"))

  test("seededNtile: balance, coverage, determinism (app.py:183-209)") {
    val df = synthetic(1000)
    val p1 = Windows.seededNtile(df, Seq("grupo"), "pid", 4).cache()
    // coverage: every row kept, ids unchanged
    assert(p1.count() == 1000)
    assert(p1.select("pid").distinct().count() == 1000)
    // partitions in 1..4
    val parts = p1.select("partition_id").distinct().collect().map(_.getInt(0)).sorted
    assert(parts.toSeq == Seq(1, 2, 3, 4))
    // balance within each group: sizes differ by <= 1
    val sizes = p1.groupBy("grupo", "partition_id").count()
      .groupBy("grupo").agg((max("count") - min("count")).as("spread"))
      .collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 1))
    // determinism under the same seed
    val p2 = Windows.seededNtile(df, Seq("grupo"), "pid", 4)
    assert(p1.except(p2).isEmpty && p2.except(p1).isEmpty)
    // different seed shuffles differently
    val p3 = Windows.seededNtile(df, Seq("grupo"), "pid", 4, seed = 7L)
    assert(p1.except(p3).count() > 0)
    p1.unpersist()
  }

  test("seededNtileConfigured pins groups to allowed partitions (app.py:91-145)") {
    val df = synthetic(700)
    val allowed = Map("0" -> Seq(1, 2), "1" -> Seq(3))
    val p = Windows.seededNtileConfigured(df, "grupo", "pid", 4, allowed).cache()
    val g0 = p.filter($"grupo" === "0").select("partition_id").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(g0.subsetOf(Set(1, 2)))
    val g1 = p.filter($"grupo" === "1").select("partition_id").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(g1 == Set(3))
    // unconfigured groups still use all 4
    val g2 = p.filter($"grupo" === "2").select("partition_id").distinct().count()
    assert(g2 == 4)
    p.unpersist()
  }

  test("seededNtileConfigured deals evenly when |allowed| does not divide n") {
    // n=4 with |allowed|=3 and |allowed|=2: the reference's even split
    // (app.py:129-143) demands within-group spread <= 1 regardless of
    // divisibility — a round-robin remap of the 4-way slot would give the
    // first allowed partition ~2x the share.
    val df = synthetic(701)
    val allowed = Map("0" -> Seq(1, 3, 4), "1" -> Seq(2, 4))
    val p = Windows.seededNtileConfigured(df, "grupo", "pid", 4, allowed).cache()
    for ((g, parts) <- allowed) {
      val counts = p.filter($"grupo" === g).groupBy("partition_id").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(counts.keySet == parts.toSet, s"group $g used ${counts.keySet}")
      assert(counts.values.max - counts.values.min <= 1,
        s"group $g uneven: $counts")
    }
    // unconfigured groups remain 4-way balanced
    val spread2 = p.filter($"grupo" === "2").groupBy("partition_id").count()
      .agg((max("count") - min("count")).as("s")).collect()(0).getLong(0)
    assert(spread2 <= 1)
    // coverage: no rows lost or duplicated by the re-deal
    assert(p.count() == 701 && p.select("pid").distinct().count() == 701)
    p.unpersist()
  }

  test("firstPerKey keeps exactly the min-ordered row (W1)") {
    val df = Seq(
      ("a", 3, "x3"), ("a", 1, "x1"), ("a", 2, "x2"),
      ("b", 9, "y9"), ("b", 7, "y7")).toDF("k", "ord", "v")
    val got = Windows.firstPerKey(df, Seq("k"), Seq(col("ord").asc))
      .orderBy("k").collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq == Seq(("a", 1, "x1"), ("b", 7, "y7")))
  }

  test("lagGapMinutes: carry-forward over excluded/null rows (W3, §7.4-2)") {
    // user u: arrivals at 10:00(fin 10:10), 10:20(fin null), 10:30(fin 10:40),
    // next day 09:00 — the 10:30 row's wait must use 10:10 (carry-forward
    // past the null), the next-day row must emit null (same-day guard).
    val df = Seq(
      ("u", "2024-01-01 10:00:00", "2024-01-01 10:10:00"),
      ("u", "2024-01-01 10:20:00", null),
      ("u", "2024-01-01 10:30:00", "2024-01-01 10:40:00"),
      ("u", "2024-01-02 09:00:00", "2024-01-02 09:05:00"))
      .toDF("user", "arr_s", "fin_s")
      .select(col("user"), to_timestamp(col("arr_s")).as("arr"),
        to_timestamp(col("fin_s")).as("fin"))
    val got = Windows.lagGapMinutes(df, Seq(col("user")), col("arr"),
      col("arr"), col("fin"))
      .orderBy("arr").select("espera_min").collect().map(r => Option(r.get(0)))
    assert(got.toSeq == Seq(None, Some(10L), Some(20L), None))
  }

  test("lagGapMinutes: same-day guard keys off the carried finalization's date") {
    // day1 10:00 (fin 10:10) → day2 00:30 (fin null) → day2 09:00:
    // the third row's carried finalization is from DAY1, so its stale
    // ~23h cross-day wait must be suppressed even though the previous
    // ARRIVAL is same-day
    val df = Seq(
      ("u", "2024-01-01 10:00:00", "2024-01-01 10:10:00"),
      ("u", "2024-01-02 00:30:00", null),
      ("u", "2024-01-02 09:00:00", "2024-01-02 09:05:00"))
      .toDF("user", "arr_s", "fin_s")
      .select(col("user"), to_timestamp(col("arr_s")).as("arr"),
        to_timestamp(col("fin_s")).as("fin"))
    val got = Windows.lagGapMinutes(df, Seq(col("user")), col("arr"),
      col("arr"), col("fin"))
      .orderBy("arr").select("espera_min").collect().map(r => Option(r.get(0)))
    assert(got.toSeq == Seq(None, None, None),
      "stale cross-day carry must not emit a wait")
  }

  test("writePartitioned: one dir per partition + summary (EP1 sink shape)") {
    val df = Windows.seededNtile(synthetic(200), Seq("grupo"), "pid", 3)
    val out = java.nio.file.Files.createTempDirectory("graft_ep1").toString
    val summary = Windows.writePartitioned(df, out, "grupo", "pid")
    val dirs = new java.io.File(s"$out/partitions").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("partition_id=1", "partition_id=2", "partition_id=3"))
    val back = spark.read.parquet(s"$out/partitions")
    assert(back.count() == 200)
    assert(summary.collect().map(_.getAs[Long]("n_rows")).sum == 200)
  }

  test("partitionStats counts ids and rows") {
    val df = Seq((1, "g", 100), (1, "g", 100), (1, "h", 101), (2, "g", 102))
      .toDF("partition_id", "grupo", "pid")
    val got = Windows.partitionStats(df, "partition_id", "grupo", "pid")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "g", 1L, 2L), (1, "h", 1L, 1L), (2, "g", 1L, 1L)))
  }
}
