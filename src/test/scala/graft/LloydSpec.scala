package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.Lloyd

/** Distributed integer-exact Lloyd's k-means (behind q222). */
class LloydSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def q(v: Float): Long =
    math.floor(v.toDouble * 1e6).toLong // the operator's quantization

  test("iterate recovers planted clusters with integer-exact centroids") {
    // two tight clusters; seed ids 1 and 2 land one in each
    val a = Seq(1L -> Array(0.00f, 0.01f), 3L -> Array(0.02f, 0.00f),
      5L -> Array(0.01f, 0.03f), 7L -> Array(0.03f, 0.02f))
    val b = Seq(2L -> Array(0.50f, 0.52f), 4L -> Array(0.51f, 0.50f),
      6L -> Array(0.53f, 0.51f), 8L -> Array(0.52f, 0.53f))
    val df = (a ++ b).toDF("vec_id", "embedding")
    val pts = Lloyd.quantize(df, "embedding", "vec_id", dims = 2)
    val out = Lloyd.iterate(pts, k = 2, rounds = 2, dims = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // expected: integer mean (sum div n, truncating) of each cluster
    def mean(c: Seq[(Long, Array[Float])], d: Int): Long =
      c.map(p => q(p._2(d))).sum / c.size
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((4L, mean(a, 0), mean(a, 1))))
    assert(out(2L) == ((4L, mean(b, 0), mean(b, 1))))
  }

  test("quantize drops null and short vectors") {
    val df = Seq(
      (1L, Some(Array(0.1f, 0.2f))),
      (2L, Some(Array(0.1f))), // too short for dims = 2
      (3L, None: Option[Array[Float]])
    ).toDF("vec_id", "embedding")
    val ids = Lloyd.quantize(df, "embedding", "vec_id", dims = 2)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L))
  }
}
