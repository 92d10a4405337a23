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

  test("GraftExtensions registers every kernel for SQL use") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sf001/documents.parquet").limit(20)
      .createOrReplaceTempView("ext_docs")
    val got = spark.sql(
      """SELECT doc_id,
                md5_prefix_long(text) AS h,
                shingles3(split(trim(lower(text)), '\\s+')) AS sh,
                simhash60(transform(split(trim(lower(text)), '\\s+'),
                                    t -> md5_prefix_long(t))) AS fp,
                minhash_bands(split(trim(lower(text)), '\\s+')) AS bands,
                double_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot
         FROM ext_docs""")
    // SQL spelling == Column-API spelling, row for row
    val joined = got.alias("a").join(
      graft.dedup.Dedup.withSimhash(spark.table("ext_docs"))
        .select(col("doc_id"), col("fp").as("fp2")), Seq("doc_id"))
      .join(spark.table("ext_docs")
        .select(col("doc_id"), Exprs.md5Long(col("text")).as("h2")), Seq("doc_id"))
    assert(joined.filter(col("fp") =!= col("fp2") || col("h") =!= col("h2")).isEmpty)
    assert(got.filter(col("dot") =!= 11.0).isEmpty)
    assert(got.filter(size(col("sh")) === 0 || size(col("bands")) === 0).isEmpty)
  }

  test("Md5PrefixLong survives whole-stage codegen over a real scan") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val both = docs.select(
      Exprs.md5Long(col("text")).as("native"),
      conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() == 0)
    assert(both.filter(col("native") < 0).count() == 0) // 60 bits: non-negative
  }

  test("SimHash60 kernel matches the 60-aggregate expression spelling") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(50)
      .withColumn("_ht", transform(
        graft.text.TextAnalysis.tokens(col("text")), t => Exprs.md5Long(t)))
    val slow = (0 until 60).map { j =>
      val bitSum = aggregate(col("_ht"), lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val both = docs.select(
      graft.dedup.Dedup.simhashFromHashes(col("_ht")).as("native"),
      slow.as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() == 0)
  }

  test("DoubleDotProduct matches aggregate(zip_with) spelling on real embeddings") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet").limit(100)
      .withColumn("e2", reverse(col("embedding")))
    val slow = aggregate(
      zip_with(col("embedding"), col("e2"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val both = emb.select(
      graft.sim.Similarity.dot(col("embedding"), col("e2")).as("native"),
      slow.as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() == 0)
  }

  test("LangId kernel matches the folded filter/argmax expression spelling") {
    import graft.text.TextAnalysis
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val both = docs.select(
      TextAnalysis.predictLang(col("text")).as("native"),
      TextAnalysis.predictLangExpr(col("text")).as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() == 0)
    // tie-break + und cases pinned explicitly
    import spark.implicits._
    val edge = Seq(
      "the de xx",        // en=1 es=1 tie -> earlier entry (en) wins
      "zzz qqq",          // no markers -> und
      "de la y the and is the") // en=4 beats es=3
      .toDF("text")
      .select(TextAnalysis.predictLang(col("text")).as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(edge == Seq("en", "und", "en"))
  }

  test("UnitVec kernel matches the norm+transform spelling on real embeddings") {
    import graft.sim.Similarity
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    import org.apache.spark.sql.graft.ColumnBridge
    val native = ColumnBridge.column(graft.functions.UnitVec(
      ColumnBridge.expression(col("embedding"))))
    val both = emb.select(native.as("native"),
      Similarity.unitVecExpr(col("embedding")).as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() == 0)
    // zero vector maps to zero vector
    import spark.implicits._
    val z = Seq(Array(0.0f, 0.0f)).toDF("embedding")
    val u = Similarity.withUnitVec(z, "embedding", "u")
      .select("u").collect()(0).getSeq[Double](0)
    assert(u == Seq(0.0, 0.0))
  }

  test("Md5LongArray kernel matches transform(md5Long) per element") {
    import graft.text.TextAnalysis
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val toks = TextAnalysis.tokens(col("text"))
    import org.apache.spark.sql.graft.ColumnBridge
    val native = ColumnBridge.column(graft.functions.Md5LongArray(
      ColumnBridge.expression(toks)))
    val builtin = transform(toks, t => Exprs.md5Long(t))
    val both = docs.select(native.as("native"), builtin.as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() == 0)
  }

  test("LongWordExtraUnits kernel matches the aggregate BPE spelling") {
    import graft.text.TextAnalysis
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val both = docs.select(
      TextAnalysis.approxBpeTokenCount(col("text")).as("native"),
      TextAnalysis.approxBpeTokenCountExpr(col("text")).as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() == 0)
  }

  test("WordSetCount kernel matches the size(filter) stopword spelling") {
    import graft.text.TextAnalysis
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val both = docs.select(
      TextAnalysis.stopwordRatio(col("text")).as("native"),
      TextAnalysis.stopwordRatioExpr(col("text")).as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() == 0)
  }

  test("PhraseCount kernel matches the filter-lambda position spelling") {
    import org.apache.spark.sql.graft.ColumnBridge
    import graft.text.TextAnalysis
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
    val both = docs.select(
      ColumnBridge.column(graft.functions.PhraseCount(
        ColumnBridge.expression(col("w")), Seq("value", "table"))).as("native"),
      expr("""CAST(size(filter(sequence(1, size(w) - 1),
                k -> element_at(w, k) = 'value'
                 AND element_at(w, k + 1) = 'table')) AS BIGINT)""").as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() == 0)
    assert(both.agg(sum("native")).head().getLong(0) > 0) // phrase occurs
    // overlap + boundary semantics on handmade rows
    val hand = Seq(Seq("value", "table", "value", "table"),
      Seq("value"), Seq("table", "value"), Seq()).toDF("w")
    val got = hand.select(ColumnBridge.column(graft.functions.PhraseCount(
      ColumnBridge.expression(col("w")), Seq("value", "table"))).as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 0L, 0L, 0L))
  }

  test("MinHashBands kernel matches the composed signature+band spelling") {
    import graft.dedup.Dedup
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    // composed spelling: explode-based signature -> band keys -> pairs
    val banded = Dedup.withBandKeys(Dedup.minhashSignature(docs))
    val long = banded.select(col("doc_id"), posexplode(
      array((0 until Dedup.numBands).map(b => col(s"band$b")): _*)).as(Seq("bi", "bk")))
    val a = long.select(col("doc_id").as("i"), col("bi"), col("bk"))
    val b = long.select(col("doc_id").as("j"), col("bi"), col("bk"))
    val composed = a.join(b, Seq("bi", "bk")).filter(col("i") < col("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("n_bands"))
    val native = Dedup.minhashCandidates(docs)
    assert(native.except(composed).isEmpty && composed.except(native).isEmpty)
  }

  test("SortedLongIntersectCount matches size(array_intersect) on sorted hash sets") {
    import org.apache.spark.sql.graft.ColumnBridge
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val hs = docs.select(col("doc_id"), array_sort(array_distinct(
        ColumnBridge.column(graft.functions.Md5LongArray(ColumnBridge.expression(
          graft.text.TextAnalysis.tokens(col("text"))))))).as("hs"))
    val pairs = hs.select(col("doc_id").as("i"), col("hs").as("ha"))
      .crossJoin(broadcast(hs.filter(col("doc_id") < 10)
        .select(col("doc_id").as("j"), col("hs").as("hb"))))
    val both = pairs.select(
      ColumnBridge.column(graft.functions.SortedLongIntersectCount(
        ColumnBridge.expression(col("ha")), ColumnBridge.expression(col("hb"))))
        .as("native"),
      size(array_intersect(col("ha"), col("hb"))).as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() == 0)
    // SQL registration round-trips
    GraftExtensions.register(spark)
    val sqlGot = spark.sql(
      "SELECT sorted_long_intersect_count(array(1L,3L,7L), array(3L,5L,7L,9L)) AS c")
      .head().getInt(0)
    assert(sqlGot == 2)
  }

  test("UpperTriangleSumAgg equals the composed transform/explode spelling at any partitioning") {
    import org.apache.spark.sql.graft.ColumnBridge
    val df = (1 to 500)
      .map(i => Seq.tabulate(8)(j => ((i * 31 + j * 7) % 100 - 50).toLong))
      .toDF("v")
    def composed(parts: Int) = df.repartition(parts)
      .select(explode(expr(
        """flatten(transform(sequence(0, 6), i ->
             transform(sequence(i + 1, 7), j ->
               named_struct('i', i, 'j', j, 'p', v[i] * v[j]))))""")).as("t"))
      .groupBy(col("t.i"), col("t.j")).agg(sum(col("t.p")).as("sxy"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    def native(parts: Int) = df.repartition(parts)
      .agg(ColumnBridge.column(graft.functions.UpperTriangleSumAgg(
        ColumnBridge.expression(col("v")), 8).toAggregateExpression()).as("ps"))
      .select(explode(col("ps")).as("t"))
      .collect().map(r => {
        val t = r.getStruct(0); (t.getInt(0), t.getInt(1)) -> t.getLong(2)
      }).toMap
    val truth = composed(1)
    assert(native(1) == truth, "single-partition kernel != composed sums")
    assert(native(7) == truth, "multi-partition merge != composed sums")
    assert(truth.size == 8 * 7 / 2)
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
