package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Exprs

class FunctionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("Md5PrefixLong is bit-identical to conv(substring(md5))16,10") {
    val df = Seq("", "a", "hello world", "ünïcode ñ 中文", "x" * 500)
      .toDF("s")
      .withColumn("native", Exprs.md5Long(col("s")))
      .withColumn("builtin",
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long"))
    assert(df.filter(col("native") =!= col("builtin")).count() == 0)
    // nulls propagate
    val n = Seq[Option[String]](None).toDF("s")
      .select(Exprs.md5Long(col("s")).as("v")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("Md5PrefixLong survives whole-stage codegen over a real scan") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val both = docs.select(
      Exprs.md5Long(col("text")).as("native"),
      conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() == 0)
    assert(both.filter(col("native") < 0).count() == 0) // 60 bits: non-negative
  }

  test("IVF topK: k rows per query, sims agree with brute force") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 5)
    val ivf = graft.sim.Ivf.ivfTopK(q, emb, k = 3).collect()
    assert(ivf.length == 5 * 3)
    val brute = graft.sim.Similarity.bruteForceTopK(q, emb, k = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute(key) == r.getDouble(3)) // same exact re-ranking metric
    }
  }
}
