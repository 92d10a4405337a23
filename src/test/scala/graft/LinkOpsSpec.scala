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

  test("sssp: cheap detour beats heavy direct edge within the round budget") {
    // 1-2 weight 10 direct, but 1-3 (1) + 3-2 (1) = 2 via the detour
    val e = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 1L)).toDF("i", "j", "w")
    val d2 = GraphOps.sssp(e, source = 1L, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d2 == Map(1L -> 0L, 2L -> 2L, 3L -> 1L))
    // rounds=1 can only take the direct edges
    val d1 = GraphOps.sssp(e, source = 1L, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d1 == Map(1L -> 0L, 2L -> 10L, 3L -> 1L))
  }

  test("lubyMis: independence and out-coverage hold on the co-supply graph") {
    val edges = graft.graph.GraphOps.coOccurrenceEdges(
      spark.read.parquet(s"$sf001/lineitem.parquet"),
      "l_partkey", "l_suppkey", maxGroupSize = 15)
      .localCheckpoint()
    val st = GraphOps.lubyMis(edges, rounds = 2)
    val inSet = st.filter($"status" === "in").select($"v").collect()
      .map(_.getLong(0)).toSet
    val outSet = st.filter($"status" === "out").select($"v").collect()
      .map(_.getLong(0)).toSet
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    // independence: no edge has both endpoints in the set
    assert(!es.exists { case (a, b) => inSet(a) && inSet(b) })
    // every excluded vertex is adjacent to an in-vertex
    val outNbr = es.flatMap { case (a, b) =>
      Seq(a -> b, b -> a) }.filter(p => outSet(p._1)).groupBy(_._1)
    assert(outSet.forall(v => outNbr(v).exists(p => inSet(p._2))))
    // statuses partition the vertex set
    assert(st.groupBy("v").count().filter($"count" > 1).isEmpty)
  }

  test("oracle CTE generators unroll the requested rounds") {
    val lp = GraphOps.labelPropOracleCtes(rounds = 3)
    assert(lp.contains("l3 AS") && !lp.contains("l4 AS"))
    val ppr = GraphOps.pprOracleCtes(seedMod = 10, iters = 3)
    assert(ppr.contains("r3 AS") && !ppr.contains("r4 AS"))
    assert(ppr.contains("% 10 = 0"))
  }
}
