package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Session-concurrency invariants: operators must not communicate
  * through session-global state. [[graft.dedup.Dedup.connectedComponents]]
  * used to flip `spark.sql.shuffle.partitions` around its star loop —
  * correct serially, a data race for any other query running in the same
  * session. The width is now set structurally (repartition inside the
  * phases), so two concurrent closures over different graphs must produce
  * exactly the labels each produces alone, with the session conf
  * untouched throughout. */
class ConcurrencySpec extends AnyFunSuite with SparkSpec {
  import graft.dedup.Dedup.connectedComponents

  // chain 0-1-2-...-9 plus a disjoint triangle, shifted per-graph so the
  // two concurrent runs can't share partial results by accident
  private def graph(shift: Long) = {
    import spark.implicits._
    val chain = (0L until 9L).map(i => (shift + i, shift + i + 1))
    val tri = Seq((shift + 100L, shift + 101L), (shift + 101L, shift + 102L),
      (shift + 102L, shift + 100L))
    (chain ++ tri).toDF("i", "j")
  }

  private def labels(shift: Long): Map[Long, Long] =
    // driverMaxEdges = 0 forces the distributed star loop — the path
    // that used to mutate the session conf
    connectedComponents(graph(shift), driverMaxEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two concurrent connectedComponents runs don't interfere (no session-conf race)") {
    val confBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val serialA = labels(0L)
    val serialB = labels(1000L)

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val (concA, concB) = Await.result(
      Future(labels(0L)).zip(Future(labels(1000L))), 120.seconds)

    assert(concA == serialA, "concurrent run A diverged from its serial labels")
    assert(concB == serialB, "concurrent run B diverged from its serial labels")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == confBefore,
      "connectedComponents mutated session-global shuffle partitions")
    // sanity on the expected clustering: one 10-node chain + one triangle
    assert(serialA.values.toSet == Set(0L, 100L))
    assert(serialB.values.toSet == Set(1000L, 1100L))
  }
}
