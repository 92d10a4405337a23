package graft

import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Evidence that AQE's runtime skew-join split actually FIRES on this
  * session's config — [[graft.ops.Relational.saltedJoin]] proves the
  * manual-salting path; this pins the automatic one. A join keyed ~85%
  * onto one hot key is executed with thresholds scaled to test data, and
  * the FINAL adaptive plan must contain a skew=true sort-merge join whose
  * shuffle read splits the oversized partition (the runtime re-plan that
  * rescues unsalted hot keys at 100 TB). */
class AqeSkewSpec extends AnyFunSuite with SparkSpec {

  test("AQE splits the hot-key partition of a genuinely skewed join") {
    val s = spark
    import s.implicits._
    val keep = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // scale the 256 MB production threshold down to fixture size
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // 85% of the fact rows share key 0; the rest spread over 63 keys
      val fact = spark.range(0, 60000)
        .select(when($"id" < 51000, 0L).otherwise($"id" % 63 + 1).as("k"),
          concat(lit("payload_payload_payload_"), $"id").as("pay"))
      val dim = spark.range(0, 64)
        .select($"id".as("k"), concat(lit("attr_"), $"id").as("attr"))
      val joined = fact.join(dim, "k")
      // execute THIS queryExecution (a .count() would plan and run a
      // separate one, leaving this AQE plan without runtime stats)
      val n = joined.collect().length
      assert(n == 60000, s"join row count wrong: $n")

      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // query stages are leaf nodes — recurse into their plans explicitly
      def flatten(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val kids = p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
          case _ => p.children
        }
        p +: kids.flatMap(flatten)
      }
      val nodes = flatten(finalPlan)
      val skewJoins = nodes.collect {
        case j: SortMergeJoinExec if j.isSkewJoin => j
      }
      assert(skewJoins.nonEmpty,
        s"AQE did not mark the join skew=true:\n$finalPlan")
      val skewReads = nodes.collect {
        case r: AQEShuffleReadExec if r.hasSkewedPartition => r
      }
      assert(skewReads.nonEmpty,
        s"no shuffle read with a split skewed partition:\n$finalPlan")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
