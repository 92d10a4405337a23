package graft.ml

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Exprs

/**
 * Demand-forecasting surface (SURVEY.md §2.10, M1-M7,
 * app_calculo_necesidad_recepción_call_center.py:596-713): features
 * (dow, hour, month, day, week-of-month) → label = count per
 * (date, hour) → LinearRegression + GradientBoostedTrees → best-by-R² →
 * 24h×7d prediction grid clamped at 0.
 *
 * Deliberate deviation from the reference (SURVEY.md §7.3): the MLP
 * regressor has no spark.ml equivalent (MultilayerPerceptron* is
 * classification-only), so the model menu is LR + GBT.
 *
 * Architecture: the feature extraction (a groupBy over the full event
 * stream) is distributed Spark; the TRAINING is driver-side. The training
 * table's cardinality is |dates| × 24 — bounded by the calendar span, not
 * by data volume, so it is a few-thousand-row array even when the event
 * table is 100 TB. spark.ml's GBT launches ~4 scheduler rounds per
 * iteration (200+ jobs for 50 trees — measured 10.8s on 530 rows, pure
 * scheduling), which is the wrong tool for a bounded-small table; the
 * reference itself trains single-node (sklearn GradientBoostingRegressor).
 * Driver-side exact-greedy boosting is deterministic and runs in
 * milliseconds at any event-table scale.
 */
object Forecast {

  /** A fitted model: a pure scoring function plus holdout metrics. */
  final case class Fitted(predict: Array[Double] => Double,
                          name: String, r2: Double, mae: Double, mse: Double)

  /** M1 — feature extraction: hourly demand counts with calendar features.
   * This is the part that scales with the data — it stays distributed. */
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

  // ------------------------------------------------ driver-side training

  /** Ordinary least squares with intercept via normal equations
   * (Gaussian elimination with partial pivoting) — the exact analogue of
   * spark.ml LinearRegression's "normal" solver. */
  private[graft] def fitOls(xs: Array[Array[Double]], y: Array[Double]): Array[Double] = {
    val k = xs(0).length + 1 // + intercept
    val a = Array.ofDim[Double](k, k)
    val b = new Array[Double](k)
    var r = 0
    while (r < xs.length) {
      val row = xs(r)
      var i = 0
      while (i < k) {
        val xi = if (i == 0) 1.0 else row(i - 1)
        b(i) += xi * y(r)
        var j = 0
        while (j < k) {
          val xj = if (j == 0) 1.0 else row(j - 1)
          a(i)(j) += xi * xj
          j += 1
        }
        i += 1
      }
      r += 1
    }
    // solve a * beta = b in place
    var col0 = 0
    while (col0 < k) {
      var piv = col0
      var m = col0
      while (m < k) { if (math.abs(a(m)(col0)) > math.abs(a(piv)(col0))) piv = m; m += 1 }
      val tmp = a(col0); a(col0) = a(piv); a(piv) = tmp
      val tb = b(col0); b(col0) = b(piv); b(piv) = tb
      val d = a(col0)(col0)
      if (math.abs(d) > 1e-12) {
        var m2 = 0
        while (m2 < k) {
          if (m2 != col0) {
            val f = a(m2)(col0) / d
            var j = col0
            while (j < k) { a(m2)(j) -= f * a(col0)(j); j += 1 }
            b(m2) -= f * b(col0)
          }
          m2 += 1
        }
      }
      col0 += 1
    }
    Array.tabulate(k)(i => if (math.abs(a(i)(i)) > 1e-12) b(i) / a(i)(i) else 0.0)
  }

  /** Depth-bounded exact-greedy regression tree fit to `target`, stored as
   * parallel arrays (feature, threshold, left/right child, leaf value). */
  private final class Tree(maxDepth: Int) {
    private val feat = scala.collection.mutable.ArrayBuffer.empty[Int]
    private val thr = scala.collection.mutable.ArrayBuffer.empty[Double]
    private val left = scala.collection.mutable.ArrayBuffer.empty[Int]
    private val right = scala.collection.mutable.ArrayBuffer.empty[Int]
    private val value = scala.collection.mutable.ArrayBuffer.empty[Double]

    def fit(xs: Array[Array[Double]], target: Array[Double], idx: Array[Int]): Int =
      grow(xs, target, idx, 0)

    /** variance-reduction split search; returns node id */
    private def grow(xs: Array[Array[Double]], t: Array[Double],
                     idx: Array[Int], depth: Int): Int = {
      val n = idx.length
      var sum = 0.0; var i = 0
      while (i < n) { sum += t(idx(i)); i += 1 }
      val mean = sum / n
      def leaf(): Int = {
        feat += -1; thr += 0.0; left += -1; right += -1; value += mean
        feat.length - 1
      }
      if (depth >= maxDepth || n < 2) return leaf()
      // best split across features: maximize sumL²/nL + sumR²/nR
      var bestGain = 0.0; var bestF = -1; var bestT = 0.0
      val baseScore = sum * sum / n
      var f = 0
      while (f < xs(0).length) {
        val sorted = idx.sortBy(r => xs(r)(f))
        var sumL = 0.0
        var j = 0
        while (j < n - 1) {
          sumL += t(sorted(j))
          val vj = xs(sorted(j))(f); val vn = xs(sorted(j + 1))(f)
          if (vj != vn) {
            val nL = j + 1; val nR = n - nL
            val sumR = sum - sumL
            val gain = sumL * sumL / nL + sumR * sumR / nR - baseScore
            if (gain > bestGain + 1e-12) { bestGain = gain; bestF = f; bestT = (vj + vn) / 2 }
          }
          j += 1
        }
        f += 1
      }
      if (bestF < 0) return leaf()
      val (li, ri) = idx.partition(r => xs(r)(bestF) <= bestT)
      val id = feat.length
      feat += bestF; thr += bestT; left += -1; right += -1; value += mean
      val l = grow(xs, t, li, depth + 1)
      val r = grow(xs, t, ri, depth + 1)
      left(id) = l; right(id) = r
      id
    }

    def predict(root: Int, x: Array[Double]): Double = {
      var node = root
      while (feat(node) >= 0)
        node = if (x(feat(node)) <= thr(node)) left(node) else right(node)
      value(node)
    }
  }

  /** Least-squares gradient boosting: F0 = mean, then `numTrees` depth-
   * bounded trees on residuals, shrunk by `learningRate` (spark.ml /
   * sklearn default 0.1). Exact greedy splits, fully deterministic. */
  private[graft] def fitGbt(xs: Array[Array[Double]], y: Array[Double],
                         numTrees: Int = 50, maxDepth: Int = 3,
                         learningRate: Double = 0.1): Array[Double] => Double = {
    val n = xs.length
    val f0 = y.sum / n
    val pred = Array.fill(n)(f0)
    val resid = new Array[Double](n)
    val all = Array.range(0, n)
    val trees = new Array[(Tree, Int)](numTrees)
    var m = 0
    while (m < numTrees) {
      var i = 0
      while (i < n) { resid(i) = y(i) - pred(i); i += 1 }
      val tree = new Tree(maxDepth)
      val root = tree.fit(xs, resid, all)
      trees(m) = (tree, root)
      i = 0
      while (i < n) { pred(i) += learningRate * tree.predict(root, xs(i)); i += 1 }
      m += 1
    }
    x => f0 + trees.iterator.map { case (t, r) => learningRate * t.predict(r, x) }.sum
  }

  /** M2-M6 — deterministic 70/30 split (seed 42), train OLS + GBT(50×d3),
   * evaluate on the holdout, pick best by R². Collects only the bounded
   * (dates×hours) feature table to the driver. */
  def trainBest(feats: DataFrame): Fitted = {
    val rows: Array[(Array[Double], Double)] = feats
      .orderBy("fecha", "hora") // stable collect order → stable split
      .select(featCols.map(col) :+ col("label"): _*)
      .collect()
      .map(r => (featCols.indices.map(r.getDouble).toArray,
        r.getDouble(featCols.length)))
    val rng = new scala.util.Random(42)
    val mask = rows.map(_ => rng.nextDouble() < 0.7)
    val (train, test0) = rows.zip(mask).partition(_._2)
    val test = if (test0.nonEmpty) test0 else train // degenerate tiny input
    val (trX, trY) = (train.map(_._1._1), train.map(_._1._2))
    val (teX, teY) = (test.map(_._1._1), test.map(_._1._2))

    val beta = fitOls(trX, trY)
    val lrPredict: Array[Double] => Double =
      x => beta(0) + x.indices.map(i => beta(i + 1) * x(i)).sum
    val gbtPredict = fitGbt(trX, trY)

    def metrics(p: Array[Double] => Double): (Double, Double, Double) = {
      val preds = teX.map(p)
      val errs = preds.zip(teY).map { case (a, b) => a - b }
      val mse = errs.map(e => e * e).sum / errs.length
      val mae = errs.map(math.abs).sum / errs.length
      val meanY = teY.sum / teY.length
      val ssTot = teY.map(v => (v - meanY) * (v - meanY)).sum
      val r2 = if (ssTot > 0) 1.0 - errs.map(e => e * e).sum / ssTot else 0.0
      (r2, mae, mse)
    }
    Seq(("linear_regression", lrPredict), ("gbt", gbtPredict))
      .map { case (name, p) =>
        val (r2, mae, mse) = metrics(p)
        Fitted(p, name, r2, mae, mse)
      }
      .maxBy(_.r2)
  }

  /** M7 — 24h × 7-dow prediction grid for a fixed (month, day, wom)
   * context, predictions clamped at 0. 168 rows, built driver-side. */
  def predictionGrid(spark: SparkSession, fitted: Fitted,
                     monthCtx: Int, dayCtx: Int): DataFrame = {
    import spark.implicits._
    val wom = ((dayCtx - 1) / 7 + 1).toDouble
    val rows = for (dow <- 1L to 7L; hour <- 0L until 24L) yield {
      val x = Array(dow.toDouble, hour.toDouble, monthCtx.toDouble,
        dayCtx.toDouble, wom)
      val p = math.max(0.0, fitted.predict(x))
      (dow, hour, math.rint(p * 10000) / 10000)
    }
    rows.toDF("dia", "hora", "pred").orderBy("dia", "hora")
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
