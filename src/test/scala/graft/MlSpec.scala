package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Forecast

/** Driver-side trainer unit tests (no SparkSession needed). */
class MlSpec extends AnyFunSuite {

  test("fitOls recovers exact coefficients of a noiseless linear function") {
    val rng = new scala.util.Random(1)
    val xs = Array.fill(200)(Array.fill(3)(rng.nextDouble() * 10))
    val y = xs.map(x => 4.0 + 2.5 * x(0) - 1.5 * x(1) + 0.25 * x(2))
    val beta = Forecast.fitOls(xs, y)
    val expected = Array(4.0, 2.5, -1.5, 0.25)
    beta.zip(expected).foreach { case (b, e) =>
      assert(math.abs(b - e) < 1e-8, s"got ${beta.mkString(",")}")
    }
  }

  test("fitGbt drives training error toward zero on a separable step function") {
    val xs = (0 until 100).map(i => Array(i.toDouble)).toArray
    val y = xs.map(x => if (x(0) < 50) 1.0 else 9.0)
    val predict = Forecast.fitGbt(xs, y, numTrees = 50, maxDepth = 3)
    val mse = xs.zip(y).map { case (x, t) =>
      val e = predict(x) - t; e * e
    }.sum / xs.length
    assert(mse < 0.01, s"mse=$mse")
  }

  test("fitGbt is deterministic") {
    val rng = new scala.util.Random(7)
    val xs = Array.fill(150)(Array.fill(4)(rng.nextDouble()))
    val y = xs.map(x => math.sin(x(0) * 6) + x(1) * x(2))
    val p1 = Forecast.fitGbt(xs, y)
    val p2 = Forecast.fitGbt(xs, y)
    val probe = Array.fill(20)(Array.fill(4)(rng.nextDouble()))
    probe.foreach(x => assert(p1(x) == p2(x)))
  }

  test("fitMlp converges on a smooth nonlinear function") {
    val rng = new scala.util.Random(3)
    val xs = Array.fill(400)(Array.fill(3)(rng.nextDouble() * 10))
    val y = xs.map(x => 5.0 + 2.0 * x(0) + math.sin(x(1)) * 3.0 - 0.5 * x(2))
    val predict = Forecast.fitMlp(xs, y)
    val mse = xs.zip(y).map { case (x, t) => val e = predict(x) - t; e * e }
      .sum / xs.length
    val varY = { val m = y.sum / y.length; y.map(v => (v - m) * (v - m)).sum / y.length }
    assert(mse < 0.2 * varY, s"train mse=$mse vs var=$varY — did not learn")
  }

  test("fitMlp is deterministic (seeded init, split, and shuffles)") {
    val rng = new scala.util.Random(11)
    val xs = Array.fill(250)(Array.fill(4)(rng.nextDouble() * 5))
    val y = xs.map(x => x(0) * x(1) + 2.0 * x(2))
    val p1 = Forecast.fitMlp(xs, y)
    val p2 = Forecast.fitMlp(xs, y)
    val probe = Array.fill(20)(Array.fill(4)(rng.nextDouble() * 5))
    probe.foreach(x => assert(p1(x) == p2(x)))
  }

  test("fitMlp early-stops well before the epoch cap on trivial data") {
    // constant target: epoch 1 is already optimal, patience should cut
    // training to ~11 epochs — this asserts via wall-clock sanity only
    val xs = Array.fill(200)(Array(1.0, 2.0))
    val y = Array.fill(200)(7.0)
    val predict = Forecast.fitMlp(xs, y)
    assert(math.abs(predict(Array(1.0, 2.0)) - 7.0) < 1.0)
  }

  test("QualityLr: deterministic fit, separable toy AUC 1.0, midrank ties") {
    import graft.ml.QualityLr
    // linearly separable on feature 0
    val xs = (0 until 40).map(i =>
      Array(if (i < 20) 0.9 else 0.1, 0.5)).toArray
    val y = (0 until 40).map(i => if (i < 20) 1.0 else 0.0).toArray
    val m1 = QualityLr.fit(xs, y)
    val m2 = QualityLr.fit(xs, y)
    assert(m1.bias == m2.bias && m1.w.sameElements(m2.w))
    assert(QualityLr.auc(xs.map(m1.score), y) == 1.0)
    assert(m1.score(Array(0.9, 0.5)) > m1.score(Array(0.1, 0.5)))
    // all-tied scores: midrank AUC must be exactly 0.5, not 0 or 1
    assert(QualityLr.auc(Array(0.5, 0.5, 0.5, 0.5),
      Array(1.0, 0.0, 1.0, 0.0)) == 0.5)
  }

  test("fitGbt interpolates between train extremes (shrinkage sanity)") {
    val xs = (0 until 60).map(i => Array(i.toDouble, (i % 7).toDouble)).toArray
    val y = xs.map(x => 3.0 * x(1) + 2.0)
    val predict = Forecast.fitGbt(xs, y)
    val (lo, hi) = (y.min, y.max)
    xs.foreach { x =>
      val p = predict(x)
      assert(p >= lo - 1.0 && p <= hi + 1.0)
    }
  }
}
