package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.SketchOps

/** Pins the HLL sketch family: register layout vs a scalar JVM
  * reference, the lossless-merge law, repartition determinism, and the
  * 3-sigma accuracy envelope the estimator is sold on.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Scalar JVM reference for (bucket, rho) given the hash value.
    * Pins the LAYOUT math (shift/mask/leading-zero rank) against
    * `Long.numberOfLeadingZeros`; the hash itself is pinned to the
    * XXH64 reference vectors by the dedup-oracle suite.
    */
  private def layoutOf(h: Long, p: Int): (Int, Int) = {
    val wbits = 64 - p
    val bucket = (h >>> wbits).toInt
    val w = h & ((1L << wbits) - 1L)
    val rho = if (w == 0L) wbits + 1
      else wbits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    (bucket, rho)
  }

  test("register layout matches the scalar bit-twiddling reference") {
    val keys = Seq("a", "bb", "ccc", "", "the quick brown fox", "é世界")
    val df = keys.toDF("k").withColumn("g", lit("g"))
    val regs = SketchOps.hllRegisters(df, Seq("g"), "k", p = 12)
      .collect().map(r => (r.getInt(1), r.getInt(2))).toSet
    val hashes = df.select(xxhash64(col("k"))).collect().map(_.getLong(0))
    val expected = hashes.map(layoutOf(_, 12))
      .groupBy(_._1).map { case (b, rs) => (b, rs.map(_._2).max) }.toSet
    assert(regs == expected)
  }

  test("merge law: registers(A union B) == merge(registers(A), registers(B))") {
    val a = (1 to 5000).map(i => ("g", s"key-$i")).toDF("g", "k")
    val b = (3000 to 9000).map(i => ("g", s"key-$i")).toDF("g", "k")
    val direct = SketchOps.hllRegisters(a.unionAll(b), Seq("g"), "k", p = 10)
    val merged = SketchOps.hllMerge(
      SketchOps.hllRegisters(a, Seq("g"), "k", p = 10),
      SketchOps.hllRegisters(b, Seq("g"), "k", p = 10), Seq("g"))
    assert(direct.exceptAll(merged).isEmpty && merged.exceptAll(direct).isEmpty)
  }

  test("registers and estimate are invariant under repartition") {
    val df = (1 to 20000).map(i => (s"g${i % 3}", s"k-${i % 7001}")).toDF("g", "k")
    val e1 = SketchOps.hllDistinct(df.repartition(13), Seq("g"), "k", p = 12)
    val e2 = SketchOps.hllDistinct(df.coalesce(1), Seq("g"), "k", p = 12)
    assert(e1.exceptAll(e2).isEmpty && e2.exceptAll(e1).isEmpty)
  }

  test("estimate lands inside 3-sigma of exact at p=12 (rse ~1.6%)") {
    // spans both estimator branches: 2k (linear counting) and 100k (raw)
    for (n <- Seq(2000, 100000)) {
      val df = (1 to n).map(i => ("g", s"item-$i-of-$n")).toDF("g", "k")
      val est = SketchOps.hllDistinct(df, Seq("g"), "k", p = 12)
        .select("est_distinct").head().getDouble(0)
      val rse = 1.04 / math.sqrt(1 << 12)
      assert(math.abs(est - n) <= 3 * rse * n,
        s"n=$n est=$est outside 3-sigma (${3 * rse * n})")
    }
  }

  test("estimate uses linear counting only when raw <= 2.5m with zero registers") {
    // 100k distinct into m=4096: no zero registers w.h.p. -> raw branch
    val big = (1 to 100000).map(i => ("g", s"x$i")).toDF("g", "k")
    val row = SketchOps.hllDistinct(big, Seq("g"), "k", p = 12).head()
    assert(row.getLong(1) == 4096L, "expected all buckets used at n=100k")
  }
}
