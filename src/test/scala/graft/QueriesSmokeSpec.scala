package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query executes at sf0.001; row-producing queries
  * return rows (pair-finding queries may legitimately return 0 at the
  * smallest SF). Entry must return >0 rows (the driver's t1 smoke). */
class QueriesSmokeSpec extends AnyFunSuite with SparkSpec {

  private val mayBeEmpty = Set(
    "q37_ngram_jaccard", "q38_simhash_pairs", "q40_cosine_neardup",
    "q36_minhash_pairs", "q06_anti_join")

  test("entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys, entries are nonempty") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
    SparkEntry.oracleSql.values.foreach(sql => assert(sql.trim.nonEmpty))
    assert(qk.size == SparkEntry.registry.size, "duplicate query names")
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} executes at sf0.001") {
      val n = q.fn(spark, sf001).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }
}
