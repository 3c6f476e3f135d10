package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.TopKOps

/** The TopKPerKey whole-operator: result parity with the window
  * spelling, partitioning invariance, and the plan shape that is its
  * reason to exist (no Sort/Window; partial heap before the
  * exchange).
  */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf001 = "/root/testdata/sf0.001"

  private def ordersFrame = spark.read.parquet(s"$sf001/orders.parquet")
    .select(col("o_orderkey").cast("long").as("id"),
      col("o_orderpriority").as("grp"),
      floor(col("o_totalprice")).cast("long").as("v"))

  private def windowForm(k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("v").desc, col("id"))
    ordersFrame.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k).drop("rn")
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("topKPerKey == row_number window spelling on real data") {
    for (k <- Seq(1, 5, 1000000)) { // incl. k > every group size
      val got = asSet(TopKOps.topKPerKey(
        ordersFrame, Seq("grp"), Seq("v" -> false, "id" -> true), k))
      assert(got == asSet(windowForm(k)), s"k=$k")
    }
  }

  test("topKPerKey is partitioning-invariant (total order via tiebreak)") {
    val base = asSet(TopKOps.topKPerKey(
      ordersFrame, Seq("grp"), Seq("v" -> false, "id" -> true), 7))
    for (parts <- Seq(1, 3, 17)) {
      val got = asSet(TopKOps.topKPerKey(
        ordersFrame.repartition(parts), Seq("grp"),
        Seq("v" -> false, "id" -> true), 7))
      assert(got == base, s"parts=$parts")
    }
  }

  test("plan: partial heap before ONE exchange, no Sort/Window operator") {
    val df = TopKOps.topKPerKey(
      ordersFrame.repartition(4), Seq("grp"), Seq("v" -> false, "id" -> true), 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPerKeyPartial"), plan)
    assert(plan.contains("GraftTopKPerKeyFinal"), plan)
    assert(!plan.contains("Window"), s"window leaked into:\n$plan")
    assert(!plan.contains("Sort"), s"sort leaked into:\n$plan")
    // partial sits BELOW the exchange: the pruned rows are what shuffles
    val lines = plan.linesIterator.toVector
    val exIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    val partIdx = lines.indexWhere(_.contains("GraftTopKPerKeyPartial"))
    val finIdx = lines.indexWhere(_.contains("GraftTopKPerKeyFinal"))
    assert(finIdx < exIdx && exIdx < partIdx,
      s"expected Final above Exchange above Partial in:\n$plan")
  }

  test("ascending order and multi-key grouping") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10L, 1L), ("a", 1L, 5L, 2L), ("a", 1L, 5L, 3L),
      ("a", 2L, 7L, 4L), ("b", 1L, 1L, 5L))
      .toDF("g1", "g2", "v", "id")
    val got = TopKOps.topKPerKey(df, Seq("g1", "g2"),
        Seq("v" -> true, "id" -> true), 2)
      .collect().map(_.getLong(3)).toSet
    // (a,1): ascending v keeps 5(id2),5(id3); (a,2): 4; (b,1): 5
    assert(got == Set(2L, 3L, 4L, 5L))
  }
}
