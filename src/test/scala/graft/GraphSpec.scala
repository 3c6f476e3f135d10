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
}
