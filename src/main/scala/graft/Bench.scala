package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Per-query numbers are made attributable by (a)
  * iterating REGISTRY DECLARATION ORDER — a Map's hash order shifted
  * first-touch costs onto different queries between rounds — and (b)
  * pre-touching every table and the kernel-bearing pipelines before the
  * timed section, so scan/file-index/janino warmup lands outside it. */
object Bench {
  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup outside the timed section: touch every table (file-index +
    // footer reads + scan codegen), then the kernel-bearing pipelines
    // (janino compilation + JIT, ~5s measured on the minhash pipeline)
    tables.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    try {
      val docsW = spark.read.parquet(s"$sfDir/documents.parquet").limit(256)
      graft.dedup.Dedup.minhashCandidates(docsW).count()
      graft.dedup.Dedup.simhashCandidates(docsW).count()
      spark.read.parquet(s"$sfDir/embeddings.parquet").limit(64).count()
    } catch { case _: Throwable => () }
    // optional subset for local profiling: SPARK_GRAFT_ONLY=q37,q40
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.registry.filter(q => only.forall(_.contains(q.name)))
    val results = selected.map { q =>
      val t0 = System.nanoTime()
      try { q.fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    // Short keys ("q63" not "q63_contamination") and ms precision keep the
    // whole line under ~1.5 KB so it survives a bounded log-tail capture;
    // full names live in SparkEntry.registry in the same order.
    val qs = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + f"$v%.3f"
    }.mkString("{", ",", "}")
    val total = f"${results.map(_._2).sum}%.3f"
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
