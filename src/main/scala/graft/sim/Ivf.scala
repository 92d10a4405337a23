package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * IVF (inverted-file) ANN: k-means-partition the corpus once, probe only
 * the `nProbe` nearest cells per query. The training/centroid set is tiny
 * (nClusters × dim) and broadcast; the corpus keeps its cell assignment
 * as a column, so the candidate join is an equi-join on `cluster` —
 * per-query candidate count ≈ corpus × nProbe / nClusters. At 100 TB the
 * assignment is a map-side model.transform pass; only candidates shuffle.
 *
 * Complements [[Similarity.lshTopK]]: IVF adapts to the data distribution
 * (learned centroids) where LSH hyperplanes are data-oblivious.
 */
object Ivf {

  final case class IvfIndex(assigned: DataFrame, centroids: DataFrame)

  /** Build the index: assign every corpus vector to its nearest of
   * `nClusters` learned centroids (seed fixed — deterministic). */
  def buildIndex(corpus: DataFrame, nClusters: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    val prepared = corpus.withColumn("_fv", array_to_vector(col(vecCol).cast("array<double>")))
    val model = new KMeans().setK(nClusters).setSeed(42)
      .setFeaturesCol("_fv").setPredictionCol("cluster").fit(prepared)
    val assigned = model.transform(prepared).drop("_fv")
    val spark = corpus.sparkSession
    val rows = model.clusterCenters.zipWithIndex.map { case (v, i) =>
      Row(i, v.toArray.toSeq)
    }
    val schema = StructType(Seq(
      StructField("cluster", IntegerType, nullable = false),
      StructField("centroid", ArrayType(DoubleType), nullable = false)))
    val centroids = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
    IvfIndex(assigned, centroids)
  }

  /** Squared euclidean distance between two double-array columns. */
  private def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /**
   * ANN top-k through the index: each query probes its `nProbe` nearest
   * cells, exact cosine re-ranking within the candidate set.
   */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nClusters: Int = 16, nProbe: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val index = buildIndex(corpus, nClusters, idCol, vecCol)
    val q = Similarity.withUnitVec(queries, vecCol, "qu")
      .select(col(idCol).as("qid"), col("qu"),
        col(vecCol).cast("array<double>").as("qv"))
    // probe cells: rank centroids per query by distance, keep nProbe
    val probeW = Window.partitionBy("qid").orderBy(col("dist").asc, col("cluster").asc)
    val probes = q.crossJoin(broadcast(index.centroids))
      .withColumn("dist", sqDist(col("qv"), col("centroid")))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select(col("qid"), col("qu"), col("cluster"))
    val c = Similarity.withUnitVec(index.assigned, vecCol, "cu")
      .select(col(idCol).as("nid"), col("cu"), col("cluster"))
    val scored = c.join(broadcast(probes), Seq("cluster"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", round(Similarity.dot(col("qu"), col("cu")), 4))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"), col("sim"))
  }
}
