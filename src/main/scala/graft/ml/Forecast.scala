package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{GBTRegressor, LinearRegression}
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Exprs

/**
 * Demand-forecasting surface (SURVEY.md §2.10, M1-M7,
 * app_calculo_necesidad_recepción_call_center.py:596-713): features
 * (dow, hour, month, day, week-of-month) → label = count per
 * (date, hour) → LinearRegression + GBTRegressor → best-by-R² →
 * 24h×7d prediction grid clamped at 0.
 *
 * Deliberate deviation from the reference (SURVEY.md §7.3): the MLP
 * regressor has no spark.ml equivalent (MultilayerPerceptron* is
 * classification-only), so the model menu is LR + GBT.
 */
object Forecast {

  final case class Fitted(model: org.apache.spark.ml.Model[_] with
    org.apache.spark.ml.param.shared.HasPredictionCol,
                          name: String, r2: Double, mae: Double, mse: Double)

  /** M1 — feature extraction: hourly demand counts with calendar features. */
  def features(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("fecha"), hour(col("ts")).as("hora"))
      .agg(count(lit(1)).cast("double").as("label"))
      .withColumn("dow", dayofweek(col("fecha")).cast("double"))
      .withColumn("hour_d", col("hora").cast("double"))
      .withColumn("month_d", month(col("fecha")).cast("double"))
      .withColumn("day_d", dayofmonth(col("fecha")).cast("double"))
      .withColumn("wom", Exprs.weekOfMonth(col("fecha")).cast("double"))

  private val featCols = Array("dow", "hour_d", "month_d", "day_d", "wom")

  def assemble(df: DataFrame): DataFrame =
    new VectorAssembler().setInputCols(featCols).setOutputCol("features")
      .transform(df)

  /** M2-M6 — 70/30 split (seed 42), train LR (normal-equation solver:
   * deterministic) + GBT (seed 42), evaluate, pick best by R². */
  def trainBest(feats: DataFrame): Fitted = {
    // the feature table is inherently small (dates × hours) — a single
    // partition makes each of the ~50 GBT iterations one task instead of
    // a multi-task stage (measured: scheduling dominated training time)
    val Array(train, test) =
      assemble(feats).coalesce(1).randomSplit(Array(0.7, 0.3), seed = 42)
    train.cache()
    val lr = new LinearRegression().setSolver("normal").setLabelCol("label")
    val gbt = new GBTRegressor().setMaxIter(50).setMaxDepth(3).setSeed(42)
      .setLabelCol("label")
    val evalR2 = new RegressionEvaluator().setMetricName("r2").setLabelCol("label")
    val evalMae = new RegressionEvaluator().setMetricName("mae").setLabelCol("label")
    val evalMse = new RegressionEvaluator().setMetricName("mse").setLabelCol("label")
    val fitted = Seq(
      ("linear_regression", lr.fit(train): org.apache.spark.ml.Model[_]
        with org.apache.spark.ml.param.shared.HasPredictionCol),
      ("gbt", gbt.fit(train)))
      .map { case (name, m) =>
        val pred = m.asInstanceOf[org.apache.spark.ml.Transformer].transform(test)
        Fitted(m, name, evalR2.evaluate(pred), evalMae.evaluate(pred),
          evalMse.evaluate(pred))
      }
    train.unpersist()
    fitted.maxBy(_.r2)
  }

  /** M7 — 24h × 7-dow prediction grid for a fixed (month, day, wom)
   * context, predictions clamped at 0. */
  def predictionGrid(spark: SparkSession, fitted: Fitted,
                     monthCtx: Int, dayCtx: Int): DataFrame = {
    val grid = spark.range(24).selectExpr("CAST(id AS DOUBLE) AS hour_d")
      .crossJoin(broadcast(spark.range(1, 8).selectExpr("CAST(id AS DOUBLE) AS dow")))
      .withColumn("month_d", lit(monthCtx.toDouble))
      .withColumn("day_d", lit(dayCtx.toDouble))
      .withColumn("wom", lit(((dayCtx - 1) / 7 + 1).toDouble))
    val assembled = assemble(grid)
    fitted.model.asInstanceOf[org.apache.spark.ml.Transformer]
      .transform(assembled)
      .withColumn("pred", round(Exprs.clampNonNeg(col("prediction")), 4))
      .select(col("dow").cast("long").as("dia"),
        col("hour_d").cast("long").as("hora"), col("pred"))
      .orderBy("dia", "hora")
  }

  /** End-to-end: events → features → best model → grid, with model
   * metadata columns attached. */
  def forecastGrid(spark: SparkSession, events: DataFrame): DataFrame = {
    val fitted = trainBest(features(events))
    predictionGrid(spark, fitted, monthCtx = 6, dayCtx = 15)
      .withColumn("model", lit(fitted.name))
      .withColumn("r2", round(lit(fitted.r2), 4))
  }
}
