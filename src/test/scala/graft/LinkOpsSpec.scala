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

  test("hitsAuthority: hand-computed two-round scores on a planted bipartite graph") {
    // customers {1,2,3} → suppliers {10,20}: supplier 10 endorsed by all
    // three customers, 20 only by customer 3.
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L), (3L, 20L)).toDF("c", "s")
    val r1 = GraphOps.hitsAuthority(e, rounds = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // round 1: araw(10)=3e6, araw(20)=1e6 → a(10)=1e6, a(20)=333333
    assert(r1 == Map(10L -> 1000000L, 20L -> 333333L))
    val r2 = GraphOps.hitsAuthority(e, rounds = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // hubs after round 1: h(1)=h(2)=1e6*1e6 div 1333333=750000, h(3)=1e6
    // round 2: araw(10)=2.5e6, araw(20)=1e6 → a(10)=1e6, a(20)=400000
    assert(r2 == Map(10L -> 1000000L, 20L -> 400000L))
    // duplicate endorsements must not double-count
    val dup = e.union(e)
    val r2d = GraphOps.hitsAuthority(dup, rounds = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r2d == r2)
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

  test("property: labelPropagation matches a driver simulation on random graphs") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 8 + rng.nextInt(8)
      val edges = (for {
        i <- 0L until n; j <- (i + 1) until n
        if rng.nextDouble() < 0.3
      } yield (i, j)).toSeq
      if (edges.nonEmpty) {
        val rounds = 3
        // driver simulation of the same deterministic rule
        val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2) }
        var lab: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
        for (_ <- 1 to rounds) {
          lab = adj.map { case (v, nbrs) =>
            val counts = nbrs.map(lab).groupBy(identity)
              .map { case (l, xs) => (l, xs.size) }
            v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
          }
        }
        val got = GraphOps.labelPropagation(edges.toDF("i", "j"), rounds)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == lab, s"trial $trial edges $edges")
      }
    }
  }

  test("property: sssp matches driver Bellman-Ford on random weighted graphs") {
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val n = 6 + rng.nextInt(6)
      val edges = (for {
        i <- 0L until n; j <- (i + 1) until n
        if rng.nextDouble() < 0.4
      } yield (i, j, 1L + rng.nextInt(9))).toSeq
      if (edges.nonEmpty) {
        val rounds = 3
        val und = edges.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
        val src = edges.map(_._1).min
        // driver: exactly `rounds` synchronous relaxations
        var dist = Map(src -> 0L)
        for (_ <- 1 to rounds) {
          val relaxed = und.flatMap { case (a, b, w) =>
            dist.get(a).map(da => b -> (da + w)) }
          dist = (dist.toSeq ++ relaxed).groupBy(_._1)
            .map { case (v, xs) => v -> xs.map(_._2).min }
        }
        val got = GraphOps.sssp(edges.toDF("i", "j", "w"), src, rounds)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == dist, s"trial $trial edges $edges")
      }
    }
  }

  test("property: lubyMis matches a driver simulation on random graphs") {
    def prio(v: Long): Long = { // Md5PrefixLong semantics
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(v.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val rng = new scala.util.Random(13)
    for (trial <- 1 to 5) {
      val n = 8 + rng.nextInt(8)
      val edges = (for {
        i <- 0L until n; j <- (i + 1) until n
        if rng.nextDouble() < 0.3
      } yield (i, j)).toSeq
      if (edges.nonEmpty) {
        val rounds = 2
        val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
        var und = adj.keySet
        var inS = Set.empty[Long]; var outS = Set.empty[Long]
        for (_ <- 1 to rounds) {
          val cand = und.filter { v =>
            val nbrs = adj(v) & und
            nbrs.isEmpty || prio(v) < nbrs.map(prio).min
          }
          val excl = cand.flatMap(adj) & und -- cand
          inS ++= cand; outS ++= excl; und = und -- cand -- excl
        }
        val got = GraphOps.lubyMis(edges.toDF("i", "j"), rounds)
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        val want = (inS.map(_ -> "in") ++ outS.map(_ -> "out") ++
          und.map(_ -> "undecided")).toMap
        assert(got == want, s"trial $trial edges $edges")
      }
    }
  }

  test("labelPropagation and sssp run concurrently without interference") {
    // the iterative graph ops mutate no session-global config — two
    // running in parallel threads must yield the same results as alone
    val e1 = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L)).toDF("i", "j")
    val e2 = Seq((1L, 2L, 3L), (2L, 3L, 4L), (1L, 3L, 10L)).toDF("i", "j", "w")
    val aloneLp = GraphOps.labelPropagation(e1, 3).collect().toSet
    val aloneSp = GraphOps.sssp(e2, 1L, 3).collect().toSet
    import scala.concurrent._
    import scala.concurrent.duration._
    import ExecutionContext.Implicits.global
    val fLp = Future(GraphOps.labelPropagation(e1, 3).collect().toSet)
    val fSp = Future(GraphOps.sssp(e2, 1L, 3).collect().toSet)
    assert(Await.result(fLp, 120.seconds) == aloneLp)
    assert(Await.result(fSp, 120.seconds) == aloneSp)
  }

  test("neighborhoodFunction: exact ball counts at large k, caps at small k") {
    // path 1-2-3-4-5: balls are intervals, N(r) hand-computable:
    // N(0)=5, N(1)=5+2*4=13, N(2)=13+2*3=19, N(3)=19+2*2=23, N(4)=25
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("i", "j")
    val nf = GraphOps.neighborhoodFunction(path, rounds = 4, k = 64)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(nf == Map(0 -> 5L, 1 -> 13L, 2 -> 19L, 3 -> 23L, 4 -> 25L))
    // the 100 TB knob: k = 2 truncates every sketch at 2 — the count
    // saturates at 2|V| instead of growing, and never exceeds k per node
    val nf2 = GraphOps.neighborhoodFunction(path, rounds = 4, k = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(nf2(0) == 5L && nf2(4) == 10L)
    assert((0 to 4).forall(r => nf2(r) <= 10L))
    // frac_of_max_ppm is monotone and ends at exactly 10^6
    val frac = GraphOps.neighborhoodFunction(path, rounds = 4, k = 64)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(frac(4) == 1000000L && (0 until 4).forall(r => frac(r) <= frac(r + 1)))
  }

  test("kTrussPeel: K4 survives a 4-truss peel, pendant triangle peels away") {
    // K4 on 1..4 (each edge in 2 triangles) plus a pendant triangle
    // 4-5-6 (each edge in 1 triangle): the 4-truss is exactly the K4
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val edges = (k4 ++ Seq((4L, 5L), (4L, 6L), (5L, 6L))).toDF("i", "j")
    val truss = GraphOps.kTrussPeel(edges, k = 4, rounds = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(truss.keySet == k4.toSet)
    assert(truss.values.forall(_ == 2L))
  }

  test("oracle CTE generators unroll the requested rounds") {
    val lp = GraphOps.labelPropOracleCtes(rounds = 3)
    assert(lp.contains("l3 AS") && !lp.contains("l4 AS"))
    val ppr = GraphOps.pprOracleCtes(seedMod = 10, iters = 3)
    assert(ppr.contains("r3 AS") && !ppr.contains("r4 AS"))
    assert(ppr.contains("% 10 = 0"))
  }
}
