package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/**
 * Learned quality filter for corpus curation: a logistic regression over
 * the existing heuristic text features — the small learned classifier
 * real LLM-data pipelines run BESIDE the hand-tuned heuristics
 * (fastText-style quality models; here the features are the engine's own
 * SQL-replayable columns, so scoring stays map-side codegen arithmetic).
 *
 * The split of labor is the [[Forecast.fitMlp]] / [[graft.sim.Ivf]]
 * contract: training runs on the DRIVER over a bounded, deterministic,
 * id-ordered sample (full-batch gradient descent, no RNG anywhere — two
 * fits on the same sample are bit-identical), and the fitted weights
 * come back as LITERALS in a Column expression, so corpus-scale scoring
 * is a pure map-side pass that never ships a model object.
 */
object QualityLr {

  /** The feature columns (each ~[0,1]-ranged, so unscaled full-batch GD
    * conditions fine). Must stay SQL-expressible: the q274 verdicts
    * recompute scores from these exact definitions. */
  def features(text: Column): Seq[Column] = Seq(
    least(length(text) / 500.0, lit(1.0)),
    TextAnalysis.punctRatio(text),
    TextAnalysis.stopwordRatio(text),
    least(length(text).cast("double") /
      (TextAnalysis.tokenCount(text).cast("double") * 10.0 + 1.0), lit(1.0)))

  final case class Model(bias: Double, w: Array[Double]) {
    /** Map-side score: sigmoid(b + w·x) with the weights as literals —
      * codegen'd arithmetic, no UDF, no model broadcast. */
    def scoreCol(text: Column): Column = {
      val z = features(text).zip(w.toIndexedSeq)
        .map { case (f, wj) => f * lit(wj) }
        .foldLeft(lit(bias): Column)(_ + _)
      lit(1.0) / (lit(1.0) + exp(-z))
    }
    /** Driver-side twin of [[scoreCol]] for the formula-exactness gate. */
    def score(x: Array[Double]): Double = {
      var z = bias; var j = 0
      while (j < w.length) { z += w(j) * x(j); j += 1 }
      1.0 / (1.0 + math.exp(-z))
    }
  }

  /**
   * Deterministic full-batch logistic regression: fixed iteration count,
   * fixed learning rate, zero init, no shuffling, no RNG — the gradient
   * is a fixed-order sum over the (id-ordered) sample, so refitting the
   * same sample reproduces every weight bit for bit.
   */
  def fit(xs: Array[Array[Double]], y: Array[Double],
          iters: Int = 400, lr: Double = 1.0, l2: Double = 1e-4): Model = {
    require(xs.nonEmpty && xs.length == y.length, "labeled sample required")
    val n = xs.length
    val d = xs(0).length
    val w = new Array[Double](d)
    var b = 0.0
    var it = 0
    while (it < iters) {
      val gw = new Array[Double](d)
      var gb = 0.0
      var i = 0
      while (i < n) {
        var z = b; var j = 0
        while (j < d) { z += w(j) * xs(i)(j); j += 1 }
        val err = 1.0 / (1.0 + math.exp(-z)) - y(i)
        j = 0
        while (j < d) { gw(j) += err * xs(i)(j); j += 1 }
        gb += err
        i += 1
      }
      var j = 0
      while (j < d) { w(j) -= lr * (gw(j) / n + l2 * w(j)); j += 1 }
      b -= lr * gb / n
      it += 1
    }
    Model(b, w)
  }

  /** Exact AUC by midrank (handles score ties): the probability a random
    * positive outranks a random negative. Driver-side over the bounded
    * training sample — the metric, like the training, never touches the
    * full corpus. */
  def auc(scores: Array[Double], labels: Array[Double]): Double = {
    val n = scores.length
    val order = scores.indices.sortBy(scores(_))
    val rank = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && scores(order(j + 1)) == scores(order(i))) j += 1
      val mid = (i + j + 2) / 2.0 // 1-based midrank of the tie block
      var t = i
      while (t <= j) { rank(order(t)) = mid; t += 1 }
      i = j + 1
    }
    val nPos = labels.count(_ == 1.0).toDouble
    val nNeg = n - nPos
    require(nPos > 0 && nNeg > 0, "AUC needs both classes")
    val posRankSum = labels.indices.collect {
      case k if labels(k) == 1.0 => rank(k)
    }.sum
    (posRankSum - nPos * (nPos + 1) / 2.0) / (nPos * nNeg)
  }
}
