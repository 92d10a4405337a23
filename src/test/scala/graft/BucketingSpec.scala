package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Co-located join via bucketing (the brief's scale checklist): two
  * tables bucketed on the join key join WITHOUT a shuffle on the fact
  * side — the physical plan has no ShuffleExchange above the scans. */
class BucketingSpec extends AnyFunSuite with SparkSpec {

  test("bucketed tables join without shuffle exchanges") {
    // default warehouse dir (static conf): ./spark-warehouse, gitignored
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bkt")
    spark.sql("DROP TABLE IF EXISTS graft_bkt.li_b")
    spark.sql("DROP TABLE IF EXISTS graft_bkt.ord_b")

    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val o = spark.read.parquet(s"$sf001/orders.parquet")
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable("graft_bkt.li_b")
    o.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable("graft_bkt.ord_b")

    // force SMJ path (broadcast would hide the bucketing win at this SF)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bkt.li_b")
        .join(spark.table("graft_bkt.ord_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      joined.collect() // execute so AQE finalizes the plan
      def countShuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = {
        val self = p match {
          case _: ShuffleExchangeExec => 1
          case a: AdaptiveSparkPlanExec => return countShuffles(a.executedPlan)
          case _ => 0
        }
        self + p.children.map(countShuffles).sum
      }
      val joinShuffles = countShuffles(joined.queryExecution.executedPlan)
      // only the final single-column aggregate may shuffle; the join must not
      assert(joinShuffles <= 1, s"expected bucketed join without exchange, got $joinShuffles")
      // sanity: same result as the unbucketed join
      val expect = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      assert(joined.except(expect).isEmpty && expect.except(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bkt.li_b")
      spark.sql("DROP TABLE IF EXISTS graft_bkt.ord_b")
    }
  }
}
