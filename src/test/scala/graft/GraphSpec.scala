package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.GraphOps

/** Pins the fixed-point PageRank: driver and distributed paths
  * bit-equal, rank mass conserved, and the classic structural
  * properties (star center wins, cycles uniform, dangling mass
  * redistributed).
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], threshold: Long) =
    GraphOps.pageRankFixedPoint(edges.toDF("s", "d"), "s", "d",
        iters = 10, collectThreshold = threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)

  test("driver fast path == distributed loop, bit-for-bit") {
    val edges = (1L to 400L).flatMap(i =>
      Seq((i, i % 97 + 1), (i, (i * 7) % 211 + 1)))
    val fast = ranksOf(edges, threshold = 1000000L)
    val dist = ranksOf(edges, threshold = 0L)
    assert(fast.toSeq == dist.toSeq)
  }

  test("rank mass conserved and structure honored") {
    // directed 5-cycle: perfectly uniform
    val cyc = ranksOf((0L to 4L).map(i => (i, (i + 1) % 5)), 1000000L)
    assert(cyc.map(_._2).distinct.length == 1, cyc.mkString(","))
    assert(math.abs(cyc.map(_._3).sum - 1.0) < 1e-6)
    // star: every spoke points at the center, center points back at
    // spoke 1 — the center must dominate
    val star = ranksOf((2L to 20L).map(i => (i, 1L)) :+ (1L, 2L), 1000000L)
    val byNode = star.map(s => s._1 -> s._3).toMap
    assert(byNode(1L) > byNode(3L) * 5, byNode)
    assert(math.abs(star.map(_._3).sum - 1.0) < 1e-6)
    // dangling sink: mass redistributes instead of draining
    val dang = ranksOf(Seq((1L, 2L), (2L, 3L)), 1000000L) // 3 is dangling
    assert(math.abs(dang.map(_._3).sum - 1.0) < 1e-6, dang.mkString(","))
  }

  test("kCore: cascading peel, empty core, full-graph core") {
    import TestSpark.spark.implicits._
    def core(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
      graft.ops.GraphOps.kCore(edges.toDF("src", "dst"), "src", "dst", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4 {1..4} plus a pendant chain 4-5-6: 3-core = the K4 exactly,
    // and removing 6 (deg 1) must CASCADE into removing 5
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    assert(core(g, 3) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k above max degree: empty core
    assert(core(g, 5).isEmpty)
    // k=1: every non-isolated node survives with its full degree
    val c1 = core(g, 1)
    assert(c1.keySet == (1L to 6L).toSet && c1(4L) == 4L && c1(6L) == 1L)
    // a cycle is exactly its own 2-core
    val cyc = (0L to 5L).map(i => (i, (i + 1) % 6))
    assert(core(cyc, 2).values.toSet == Set(2L) && core(cyc, 2).size == 6)
  }

  test("kCore above the broadcast gate: no forced broadcast, bit-parity") {
    import TestSpark.spark.implicits._
    val g = ((1L to 40L).flatMap(i => Seq((i, i % 13 + 1), (i, (i * 3) % 29 + 1)))
      ++ Seq((1L, 2L), (2L, 3L), (3L, 1L))).filter(e => e._1 != e._2)
    def run(threshold: Long) =
      graft.ops.GraphOps.kCore(g.toDF("src", "dst"), "src", "dst", k = 2,
        broadcastThreshold = threshold)
    // above the gate (threshold 0 → node set always "too big"): the
    // node-side joins carry NO broadcast hint — the optimizer is free
    // to pick shuffle joins from measured sizes
    val big = run(0L)
    assert(!big.queryExecution.optimizedPlan.toString
      .contains("strategy=broadcast"), "forced broadcast above the gate")
    // below the gate: the hint is present (the small-survivor fast path)
    val small = run(1000000L)
    assert(small.queryExecution.optimizedPlan.toString
      .contains("strategy=broadcast"), "missing broadcast hint below gate")
    // both paths produce the identical core
    val a = big.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = small.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b && a.nonEmpty)
  }

  test("kCore throws when maxRounds exhausts before the fixpoint") {
    import TestSpark.spark.implicits._
    // a 12-node path peels one layer per round at k=2 → needs ~6 rounds
    val path = (0L until 11L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException] {
      graft.ops.GraphOps.kCore(path.toDF("src", "dst"), "src", "dst",
        k = 2, maxRounds = 2).collect()
    }
    assert(ex.getMessage.contains("no fixpoint"))
  }

  test("triangleCounts: hand-checked graphs, direction/dup/loop collapse") {
    import TestSpark.spark.implicits._
    def count(edges: Seq[(Long, Long)]): Map[Long, Long] =
      graft.ops.GraphOps.triangleCounts(
          edges.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4 minus edge (3,4): triangles {1,2,3} and {1,2,4}
    val diamond = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
    assert(count(diamond) == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
    // same graph with reversed duplicates, self-loops, and a pendant
    // vertex: identical census; the pendant (no triangle) is absent
    val noisy = diamond ++ diamond.map(_.swap) ++
      Seq((1L, 1L), (5L, 1L))
    assert(count(noisy) == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
    // triangle-free: empty result
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    // K5: C(4,2)=6 per node
    val k5 = for { a <- 1L to 5L; b <- (a + 1) to 5L } yield (a, b)
    assert(count(k5) == (1L to 5L).map(_ -> 6L).toMap)
  }

  test("triangleCounts: string node ids keep their type (no cast loss)") {
    import TestSpark.spark.implicits._
    // string-keyed K4 (the domain-graph shape): 3 triangles per node;
    // a long cast would null every id and silently return empty
    val doms = Seq("a.com", "b.org", "c.net", "d.io")
    val k4 = for { a <- doms; b <- doms if a < b } yield (a, b)
    val out = graft.ops.GraphOps.triangleCounts(
        k4.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == doms.map(_ -> 3L).toMap)
  }
}
