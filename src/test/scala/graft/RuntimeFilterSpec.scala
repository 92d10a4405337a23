package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning: when a shuffle join's build side
  * carries a selective predicate, Spark can inject a bloom-filter
  * subquery that pre-filters the probe side BEFORE its shuffle — at
  * 100 TB this is the difference between shuffling the whole fact table
  * and shuffling the ~1% that can possibly match. The rule has size
  * thresholds tuned for clusters, so this pins (a) that the injection
  * actually fires on this session's configs once thresholds are scaled
  * to test data, and (b) that the filtered join's result is unchanged. */
class RuntimeFilterSpec extends AnyFunSuite with SparkSpec {

  test("bloom-filter runtime filter fires on a selective shuffle join and preserves results") {
    val keep = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // production default is 10 GB of application-side scan — scale to fixture
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      val lineitem = graft.io.Sources.table(spark, sf001, "lineitem")
        .select("l_orderkey", "l_quantity")
      val hotOrders = graft.io.Sources.table(spark, sf001, "orders")
        .filter(col("o_orderpriority") === "1-URGENT") // selective build side
        .select("o_orderkey", "o_orderdate")
      val joined = lineitem.join(hotOrders,
        col("l_orderkey") === col("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom-filter runtime filter injected:\n$optimized")
      // semantics unchanged vs the un-filtered plan
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plainCount = lineitem.join(hotOrders,
        col("l_orderkey") === col("o_orderkey")).count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      assert(joined.count() == plainCount,
        "bloom-filtered join changed the result")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
