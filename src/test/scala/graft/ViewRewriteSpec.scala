package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for [[graft.plans.ViewRewrite]]: the rewrite is semantics- and
  * ExprId-preserving, fires only on exactly the precomputed shape, and
  * the registration is scoped (withRule restores the optimizer). */
class ViewRewriteSpec extends AnyFunSuite with SparkSpec {

  import graft.plans.{MatView, ViewRewrite}

  private def base = graft.io.Sources.table(spark, sf001, "events")
    .select("event_type", "event_id")

  private def userAgg = base.groupBy("event_type")
    .agg(count(lit(1)).as("n"), sum("event_id").as("id_sum"))

  private def withMv[T](body: MatView => T): T = {
    val root = graft.io.Sources.scratchDir("graft_mv_spec")
    try {
      userAgg.write.parquet(s"$root/view")
      body(MatView(basePath = s"$sf001/events.parquet",
        viewPath = s"$root/view", keyCol = "event_type",
        countCol = Some("n"), sumCols = Map("event_id" -> "id_sum")))
    } finally graft.io.Sources.removeScratchDir(root)
  }

  test("rewrite answers from the view, result row-identical to the base aggregate") {
    withMv { mv =>
      val truth = userAgg.localCheckpoint()
      ViewRewrite.withRule(spark, mv) {
        val q = userAgg
        val paths = ViewRewrite.scannedPaths(q)
        assert(paths.exists(_.contains(mv.viewPath)) &&
          !paths.exists(_.contains("events.parquet")), s"no rewrite: $paths")
        assert(q.exceptAll(truth).isEmpty && truth.exceptAll(q).isEmpty)
        // ExprId stability: joins/filters above the rewritten aggregate
        // still resolve
        val joined = userAgg.filter(col("n") > 0)
          .join(truth.select(col("event_type"), col("n").as("tn")),
            Seq("event_type"))
          .filter(col("n") =!= col("tn"))
        assert(joined.isEmpty)
      }
    }
  }

  test("only the exact precomputed shape rewrites; registration is scoped") {
    withMv { mv =>
      val before = spark.experimental.extraOptimizations
      ViewRewrite.withRule(spark, mv) {
        def scansBase(df: org.apache.spark.sql.DataFrame) =
          ViewRewrite.scannedPaths(df).exists(_.contains("events.parquet"))
        // distinct aggregate: not precomputed
        assert(scansBase(base.groupBy("event_type")
          .agg(countDistinct(col("event_id")).as("n"))))
        // filter below the aggregate: different input set
        assert(scansBase(base.filter(col("event_id") % 2 === 0)
          .groupBy("event_type").agg(count(lit(1)).as("n"))))
        // different grouping key: not precomputed
        assert(scansBase(base.groupBy("event_id")
          .agg(count(lit(1)).as("n"))))
        // sum of an unregistered column (the key itself is not summable
        // here, so group by type and sum an expression)
        assert(scansBase(base.withColumn("e2", col("event_id") * 2)
          .groupBy("event_type").agg(sum("e2").as("s"))))
        // avg: not a registered aggregate
        assert(scansBase(base.groupBy("event_type")
          .agg(avg(col("event_id")).as("a"))))
      }
      assert(spark.experimental.extraOptimizations == before,
        "withRule leaked its optimizer registration")
    }
  }
}
