package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r14 plan-evidence dump: prints the formatted physical plans behind
  * this round's optimization claims, for plans/r14/.
  *
  *   - gate pattern: the OLD two-action `exceptAll().isEmpty` pair vs
  *     the NEW single signed-weight aggregation
  *     ([[graft.queries.Checks.multisetEqual]]) on the same fixture;
  *   - scan pushdown: a filtered base-table scan read with an
  *     inferred schema vs the (path, mtime)-cached schema
  *     ([[graft.io.Sources.cachedParquet]]) — PushedFilters/ReadSchema
  *     must be identical.
  */
object PlansR14 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val b = Seq((2L, "y"), (1L, "x")).toDF("k", "v")

    println("========== gate_pattern BEFORE: a.exceptAll(b) (ran twice, once per direction, each .isEmpty its own job) ==========")
    a.exceptAll(b).explain("formatted")
    println("========== gate_pattern AFTER: one signed-weight aggregation (Checks.multisetEqual inner plan) ==========")
    val cols = a.columns.toSeq
    def tagged(df: org.apache.spark.sql.DataFrame, w: Long) =
      df.select(cols.map(col): _*)
        .withColumn("_t", lit(0)).withColumn("_w", lit(w))
    tagged(a, 1L).unionByName(tagged(b, -1L))
      .groupBy((col("_t") +: cols.map(col)): _*)
      .agg(sum("_w").as("_s"))
      .filter(col("_s") =!= 0L)
      .explain("formatted")

    println("========== scan_pushdown BEFORE: inferred schema ==========")
    spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_custkey") < 100)
      .select("c_custkey", "c_mktsegment")
      .explain("formatted")
    println("========== scan_pushdown AFTER: cached schema (Sources.cachedParquet) ==========")
    graft.io.Sources.cachedParquet(spark, s"$sfDir/customer.parquet") // warm
    graft.io.Sources.cachedParquet(spark, s"$sfDir/customer.parquet")
      .filter(col("c_custkey") < 100)
      .select("c_custkey", "c_mktsegment")
      .explain("formatted")
    spark.stop()
  }
}
