package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * BENCH-ONLY scale-up generator: derives an `R`-times-larger dataset
 * from an existing harness scale factor so the bench can measure a
 * SCALING SLOPE (does each query family grow ~linearly in the data?)
 * without a driver-side sf1 drop. No correctness claim attaches to the
 * derived data — oracles run on the pristine testdata only.
 *
 * Replication preserves the properties the slope measurement needs:
 *   - referential integrity: every foreign key (orders→customer,
 *     lineitem→orders/part/supplier, events→customer) gets the same
 *     per-replica offset `r·K`, so join fan-outs scale ×R, not ×R²;
 *   - text similarity structure: replica r ≠ 0 suffixes every token
 *     with `~r` — a bijective vocabulary rename, so INTRA-replica
 *     shingle/MinHash/Jaccard relationships are exactly the original
 *     corpus's, while replicas share no tokens (naive duplication
 *     would plant R-cliques of exact dups and inflate every candidate
 *     join superlinearly — an artifact, not a measurement);
 *   - embedding geometry: replica r rotates each vector by r·7
 *     positions — an orthogonal transform, so INTRA-replica cosines
 *     are bit-preserved while cross-replica similarity decorrelates;
 *   - dimension tables (region, nation) stay fixed, as at a real
 *     larger SF.
 *
 * Each table lands as a SINGLE parquet file named `<table>.parquet`
 * (matching the testdata layout — the streaming file source's
 * pathGlobFilter matches leaf file names, so a directory per table
 * would stream zero rows). Parquet stays splittable by row group, so
 * single files do not serialize the scan.
 *
 * Usage: runMain graft.ScaleData <srcDir> <outDir> <replicas>
 */
object ScaleData {
  private val K = 10000000L

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/scale/x10"
    val reps = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(t: String)(tx: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$t.parquet")
      val big = (0 until reps).map(r => tx(base, r)).reduce(_ unionAll _)
      writeSingle(big, s"$out/$t.parquet")
      println(s"[scale] $t -> ${reps}x")
    }
    def off(c: String, r: Int) = (col(c) + lit(r * K)).as(c)

    Seq("region", "nation").foreach { t =>
      writeSingle(spark.read.parquet(s"$src/$t.parquet"), s"$out/$t.parquet")
    }
    // c_name feeds the blocked fuzzy match (q117): verbatim replicas
    // would plant 10-cliques of edit-distance-0 names, inflating every
    // block quadratically (measured ×89 before this fix). Replica r > 0
    // swaps the first 4 chars for 4 copies of a replica letter — edit
    // distance ≥ 4 across replicas (outside the query's ≤3 radius),
    // length and digit structure untouched within a replica.
    replicate("customer") { (df, r) =>
      val nm = if (r == 0) col("c_name")
        else concat(lit(('A' + r).toChar.toString * 4),
          substring(col("c_name"), 5, Int.MaxValue))
      df.select(off("c_custkey", r), nm.as("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
    }
    replicate("supplier")((df, r) => df.select(off("s_suppkey", r),
      col("s_name"), col("s_nationkey"), col("s_acctbal")))
    replicate("part")((df, r) => df.select(off("p_partkey", r),
      col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
      col("p_retailprice")))
    replicate("orders")((df, r) => df.select(off("o_orderkey", r),
      off("o_custkey", r), col("o_orderstatus"), col("o_totalprice"),
      col("o_orderdate"), col("o_orderpriority")))
    replicate("lineitem")((df, r) => df.select(off("l_orderkey", r),
      off("l_partkey", r), off("l_suppkey", r), col("l_linenumber"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      col("l_tax"), col("l_returnflag"), col("l_linestatus"),
      col("l_shipdate")))
    replicate("events")((df, r) => df.select(off("event_id", r),
      col("ts"), off("user_id", r), col("event_type"), col("value"),
      col("props")))
    replicate("documents") { (df, r) =>
      val txt = if (r == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", s"$$1~$r")
      df.select(off("doc_id", r), txt.as("text"), col("lang"),
        col("source"), length(txt).cast("long").as("n_chars"))
    }
    replicate("embeddings") { (df, r) =>
      val shift = (r * 7) % 64
      val emb = if (shift == 0) col("embedding")
        else concat(slice(col("embedding"), shift + 1, 64 - shift),
          slice(col("embedding"), 1, shift))
      df.select(off("vec_id", r), emb.as("embedding"), col("label"))
    }
    spark.stop()
  }

  /** Write `df` as exactly one parquet FILE at `path` (tmp dir + move). */
  private def writeSingle(df: DataFrame, path: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = path + "_tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
      .find(p => p.endsWith(".parquet") && p.contains("part-"))
      .getOrElse(sys.error(s"no part file under $tmp"))
    Files.createDirectories(Paths.get(path).getParent)
    Files.move(Paths.get(part), Paths.get(path),
      StandardCopyOption.REPLACE_EXISTING)
    // clean the tmp dir
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { Files.deleteIfExists(p); () })
  }
}
