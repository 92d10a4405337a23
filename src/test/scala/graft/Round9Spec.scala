package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 additions: real-footer zone maps (q316), the depth-2 tree
  * scorecard (q317), the dhash funnel tier (q287), and eager scratch
  * cleanup. The DuckDB oracles are the primary gate; these pin the
  * invariants a hash can't express (conservation laws, file-system
  * effects, bounded driver work). */
class Round9Spec extends AnyFunSuite with SparkSpec {

  test("removeScratchDir deletes nested content eagerly and is idempotent") {
    val d = graft.io.Sources.scratchDir("graft_rm_test")
    val sub = new java.io.File(d, "a/b")
    assert(sub.mkdirs())
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(d, "a", "b", "f.txt"), "x")
    graft.io.Sources.removeScratchDir(d)
    assert(!new java.io.File(d).exists(), "scratch dir must be gone")
    graft.io.Sources.removeScratchDir(d) // second call must not throw
  }

  test("q316: footer-derived zone map conserves rows and selectivity") {
    val out = graft.queries.LakeQueries.q316FooterZonemap.fn(spark, sf001)
      .collect()
    assert(out.length == 1)
    val r = out.head
    val total = graft.io.Sources.table(spark, sf001, "lineitem")
      .filter(col("l_shipdate").isNotNull).count()
    val filesTotal = r.getAs[Long]("files_total")
    val filesRead = r.getAs[Long]("files_read")
    val rowsScanned = r.getAs[Long]("rows_scanned")
    val rowsSelected = r.getAs[Long]("rows_selected")
    // zone map can't scan more rows than exist, nor select more than
    // it scans; the range layout must actually SKIP zones for a
    // 3-month predicate over a multi-year table
    assert(rowsScanned <= total && rowsSelected <= rowsScanned)
    assert(filesRead < filesTotal,
      s"range layout skipped nothing: $filesRead of $filesTotal")
    assert(rowsSelected > 0, "predicate must select rows at sf0.001")
  }

  test("q317: leaves partition training AND test rows; scores bounded") {
    val rows = graft.queries.StatsQueries.q317TreeScorecard.fn(spark, sf001)
      .collect()
    assert(rows.length == 4, s"expected 4 leaves, got ${rows.length}")
    val nCust = graft.io.Sources.table(spark, sf001, "customer").count()
    val nTrain = rows.map(_.getAs[Long]("n_train")).sum
    val nTest = rows.map(_.getAs[Long]("n_test")).sum
    assert(nTrain + nTest == nCust,
      s"leaves must partition customers: $nTrain + $nTest != $nCust")
    rows.foreach { r =>
      val s = r.getAs[Long]("score_ppm")
      assert(s >= 0 && s <= 1000000, s"score_ppm out of range: $s")
      assert(r.getAs[Long]("n_correct_test") <= r.getAs[Long]("n_test"))
    }
    // root split is a single constant across leaves
    assert(rows.map(_.getAs[Long]("root_split_bucket")).distinct.length == 1)
  }

  test("integer TextRank contrib == BigInt round-half-up of 0.85*r*c/wd " +
    "(through the Spark expression)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // bounds inside the documented 34*r*c < 2^63 exactness window
    val g = for {
      r <- Gen.choose(1L, 3000000L)
      c <- Gen.choose(1L, 100000L)
      wd <- Gen.choose(1L, 10000000L)
    } yield (r, c, wd)
    val cases = (0 until 300).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(11L + i)))
    import spark.implicits._
    val got = cases.toDF("r", "c", "wd")
      .select(col("r"), col("c"), col("wd"),
        expr("(34 * r * c + 20 * wd) div (40 * wd)").as("contrib"))
      .collect()
    got.foreach { row =>
      val (r, c, wd) = (row.getLong(0), row.getLong(1), row.getLong(2))
      // round-half-up(17rc/20wd) = floor((2*17rc + 20wd) / (2*20wd)), exact
      val expected = ((BigInt(34) * r * c + BigInt(20) * wd) /
        (BigInt(40) * wd)).toLong
      assert(row.getLong(3) == expected, s"($r,$c,$wd)")
    }
  }

  test("q319: adding a ring node only moves keys ONTO the new node") {
    val rows = graft.queries.ExtraQueries.q319HashRing.fn(spark, sf001)
      .filter(col("scheme") === "ring").collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val (node, movedIn) = (r.getAs[Long]("node"), r.getAs[Long]("n_moved_in"))
      if (node < 8) assert(movedIn == 0,
        s"consistent hashing must not move keys between old nodes: " +
          s"node $node gained $movedIn")
      else assert(movedIn == r.getAs[Long]("n_keys"),
        "every key on the new node must be newly moved")
    }
  }

  test("q287: dhash tier counts twins against the media universe") {
    val rows = graft.queries.CurationQueries.q287DedupFunnel.fn(spark, sf001)
      .collect().map(r => r.getAs[String]("tier") ->
        (r.getAs[Long]("n_items"), r.getAs[Long]("n_removed"))).toMap
    assert(rows.keySet == Set("exact", "minhash", "simhash", "dhash"))
    val (nMedia, removed) = rows("dhash")
    // every eligible doc plants a twin at Hamming 0, so the dhash tier
    // removes at least one member per planted pair: removed >= media/2
    assert(nMedia % 2 == 0, "twin construction doubles the corpus")
    assert(removed >= nMedia / 2,
      s"planted twins must be caught: $removed < ${nMedia / 2}")
    // text tiers still report against the documents universe
    val nDocs = graft.io.Sources.table(spark, sf001, "documents").count()
    assert(rows("exact")._1 == nDocs && rows("minhash")._1 == nDocs)
  }
}
