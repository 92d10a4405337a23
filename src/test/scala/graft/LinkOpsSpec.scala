package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.GraphOps

/** Semantics of the linkage/graph-mining operators behind q209–q216. */
class LinkOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("labelPropagation keeps bridge-joined cliques as separate communities") {
    // two triangles {1,2,3} and {4,5,6} joined by the single bridge 3-4:
    // connected components would merge everything; LPA must not.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("i", "j")
    val lab = GraphOps.labelPropagation(edges, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-run of the deterministic (most-frequent, tie → min) rounds
    assert(lab == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
    assert(lab.values.toSet.size == 2)
  }

  test("personalizedPageRankMicro concentrates mass near the seed set") {
    // path 10-1-2 with seed 10 (v % 10 == 0); component {7,8} has no
    // seed so its rank is identically 0 and must be filtered out.
    val edges = Seq((10L, 1L), (1L, 2L), (7L, 8L)).toDF("i", "j")
    val r = GraphOps.personalizedPageRankMicro(edges, seedMod = 10, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // hand-run of the quantized iterations (round = HALF_UP):
    // r1: 10→150000, 1→850000;  r2: 10→511250, 1→127500, 2→361250
    // r3: 10→204188, 1→741626, 2→54188
    assert(r == Map(10L -> 204188L, 1L -> 741626L, 2L -> 54188L))
  }

  test("oracle CTE generators unroll the requested rounds") {
    val lp = GraphOps.labelPropOracleCtes(rounds = 3)
    assert(lp.contains("l3 AS") && !lp.contains("l4 AS"))
    val ppr = GraphOps.pprOracleCtes(seedMod = 10, iters = 3)
    assert(ppr.contains("r3 AS") && !ppr.contains("r4 AS"))
    assert(ppr.contains("% 10 = 0"))
  }
}
