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

  /** Scalar reference for the HDR index: top b+1 significant bits. */
  private def hdrIdx(v: Long, b: Int): Int = {
    val base = 1 << b
    if (v < base) v.toInt
    else {
      val l = 64 - java.lang.Long.numberOfLeadingZeros(v)
      ((l - b) * base + (v >> (l - b - 1)) - base).toInt
    }
  }

  test("HDR index matches the scalar reference and bounds relative error") {
    val vals = Seq(0L, 1L, 63L, 64L, 65L, 127L, 128L, 1000L, 65535L,
      65536L, (1L << 40) + 12345L, Long.MaxValue / 3)
    val df = vals.map(("g", _)).toDF("g", "v")
    val regs = SketchOps.hdrRegisters(df, Seq("g"), "v", b = 6)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    val expect = vals.groupBy(hdrIdx(_, 6)).map { case (i, vs) => i -> vs.size.toLong }
    assert(regs == expect)
    // lower bound ≤ v < lower bound · (1 + 2^-b) for every value
    vals.filter(_ > 0).foreach { v =>
      val i = hdrIdx(v, 6)
      val lo = if (i < 64) i.toLong else (64L + i % 64) << (i / 64 - 1)
      assert(lo <= v && (v - lo).toDouble / lo.max(1L) <= 1.0 / 64 + 1e-12,
        s"v=$v idx=$i lo=$lo")
    }
  }

  test("HDR quantiles: within one bucket of exact, merge law, invariance") {
    val vals = (1 to 5000).map(i => ("g", ((i.toLong * 2654435761L) % 100000L) + 1))
    val df = vals.toDF("g", "v")
    val qs = Seq(0.5, 0.9, 0.99)
    val est = SketchOps.hdrQuantilesOf(df, Seq("g"), "v", b = 6, qs)
      .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    val sorted = vals.map(_._2).sorted
    qs.foreach { q =>
      val exact = sorted(math.ceil(q * sorted.size).toInt - 1)
      val lo = est(q)
      assert(lo <= exact && exact < math.ceil(lo * (1.0 + 1.0 / 64)).toLong + 1,
        s"q=$q est=$lo exact=$exact")
    }
    // merge law: shard registers + count-sum == direct registers
    val (a, bb) = vals.splitAt(2000)
    val merged = SketchOps.hdrMerge(
      SketchOps.hdrRegisters(a.toDF("g", "v"), Seq("g"), "v", 6),
      SketchOps.hdrRegisters(bb.toDF("g", "v"), Seq("g"), "v", 6), Seq("g"))
    val direct = SketchOps.hdrRegisters(df, Seq("g"), "v", 6)
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
    // repartition invariance
    val rep = SketchOps.hdrQuantilesOf(df.toDF("g", "v").repartition(9),
      Seq("g"), "v", 6, qs).collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    assert(rep == est)
    // negative values fail fast instead of silently skewing
    val err = intercept[Exception] {
      SketchOps.hdrRegisters(Seq(("g", -1L)).toDF("g", "v"), Seq("g"), "v", 6)
        .collect()
    }
    assert(err.getMessage.contains("negative") ||
      err.getCause != null && err.getCause.getMessage.contains("negative"))
  }

  test("CMS: never underestimates, bounded overestimate, merge law, invariance") {
    // zipf-ish: key j occurs ~40000/j times over 1000 distinct keys
    val occs = (1 to 1000).flatMap(j =>
      Seq.fill(40000 / (j * j) max 1)(("g", s"key-$j")))
    val df = occs.toDF("g", "k")
    val n = occs.size
    val regs = SketchOps.cmsRegisters(df, Seq("g"), "k", d = 4, p = 10)
    val exact = occs.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val probe = exact.keys.toSeq.map(("g", _)).toDF("g", "k")
    val est = SketchOps.cmsLookup(regs, Seq("g"), probe, "k", d = 4, p = 10)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"$k underestimated: ${est(k)} < $c")
      // classic bound: err ≤ 2N/w with prob 1-2^-d per key; allow 4N/w
      assert(est(k) - c <= 4L * n / 1024,
        s"$k overestimate ${est(k) - c} > ${4L * n / 1024}")
    }
    // merge law: shard registers + count-sum == direct
    val (a, b) = occs.splitAt(n / 2)
    val merged = SketchOps.cmsMerge(
      SketchOps.cmsRegisters(a.toDF("g", "k"), Seq("g"), "k"),
      SketchOps.cmsRegisters(b.toDF("g", "k"), Seq("g"), "k"), Seq("g"))
    val direct = SketchOps.cmsRegisters(df, Seq("g"), "k")
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
    // repartition invariance
    val rep = SketchOps.cmsLookup(
      SketchOps.cmsRegisters(df.repartition(11), Seq("g"), "k"),
      Seq("g"), probe, "k")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(rep == est)
    // an unseen key reads 0 unless every row collides (it must never
    // read negative or null)
    val miss = SketchOps.cmsLookup(regs, Seq("g"),
      Seq(("g", "never-seen-key-xyz")).toDF("g", "k"), "k")
      .head().getLong(2)
    assert(miss >= 0L && miss <= 4L * n / 1024)
  }

  test("KMV: trim matches serial k-smallest, estimates land, merge law holds") {
    val keys = (1 to 30000).map(i => ("g", s"elem-$i"))
    val df = keys.toDF("g", "k")
    val k = 512
    val regs = SketchOps.kmvRegisters(df, Seq("g"), "k", k)
    val got = regs.collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    // serial reference: the k smallest distinct signed hashes
    val hashes = df.select(xxhash64(col("k"))).collect()
      .map(_.getLong(0)).distinct.sorted.take(k)
    assert(got.map(_._2).toSeq == hashes.toSeq)
    assert(got.map(_._1).toSeq == (1 to k).toSeq)
    // distinct estimate within 3/sqrt(k) (~13%)
    val est = SketchOps.kmvDistinct(regs, Seq("g"), k)
      .select("est_distinct").head().getDouble(0)
    assert(math.abs(est - 30000) < 3.0 / math.sqrt(k) * 30000, s"est=$est")
    // under-k group is exact with theta 1
    val tiny = (1 to 100).map(i => ("t", s"x$i")).toDF("g", "k")
    val trow = SketchOps.kmvDistinct(
      SketchOps.kmvRegisters(tiny, Seq("g"), "k", k), Seq("g"), k).head()
    assert(trow.getLong(1) == 100L && trow.getDouble(3) == 100.0)
    // merge law
    val (a, b) = keys.splitAt(11000)
    val merged = SketchOps.kmvMerge(
      SketchOps.kmvRegisters(a.toDF("g", "k"), Seq("g"), "k", k),
      SketchOps.kmvRegisters(b.toDF("g", "k"), Seq("g"), "k", k), Seq("g"), k)
    assert(merged.exceptAll(regs).isEmpty && regs.exceptAll(merged).isEmpty)
    // repartition invariance
    val rep = SketchOps.kmvRegisters(df.repartition(13), Seq("g"), "k", k)
    assert(rep.exceptAll(regs).isEmpty && regs.exceptAll(rep).isEmpty)
  }

  test("KMV overlap estimates a known intersection") {
    // A = 1..20000, B = 15001..35000 → |A ∩ B| = 5000 of 20000 each
    val occ = ((1 to 20000).map(i => ("A", s"e$i")) ++
      (15001 to 35000).map(i => ("B", s"e$i"))).toDF("scope", "k")
    val k = 1024
    val regs = SketchOps.kmvRegisters(occ, Seq("scope"), "k", k)
    val row = SketchOps.kmvOverlap(regs, "scope", k).head()
    val est = row.getDouble(3)
    // n_common ≈ k·|A∩B|/|A∪B| ≈ 146; rse ~ 1/√146 ≈ 8% — allow 4σ
    assert(math.abs(est - 5000) < 0.35 * 5000, s"est_inter=$est")
    // disjoint scopes estimate 0
    val disj = ((1 to 5000).map(i => ("A", s"a$i")) ++
      (1 to 5000).map(i => ("B", s"b$i"))).toDF("scope", "k")
    val d = SketchOps.kmvOverlap(
      SketchOps.kmvRegisters(disj, Seq("scope"), "k", k), "scope", k).head()
    assert(d.getLong(2) == 0L && d.getDouble(3) == 0.0)
  }

  test("streaming HLL registers converge to the batch registers") {
    // the register op is a plain groupBy/max, so the SAME code runs on
    // a stream in complete mode — cardinality telemetry over a firehose
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = (1 to 9000).map(i => (s"g${i % 2}", s"key-${i % 3301}"))
    val stream = MemoryStream[(String, String)]
    val name = s"hll_stream_${System.nanoTime()}"
    val q = SketchOps.hllRegisters(
        stream.toDF().toDF("g", "k"), Seq("g"), "k", p = 10)
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    data.grouped(3000).foreach { c => stream.addData(c.toSeq); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table(name)
    val batch = SketchOps.hllRegisters(data.toDF("g", "k"), Seq("g"), "k", p = 10)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("HllSketchAgg == register-table formulation, bit-for-bit, any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val data = (1 to 5000).map(i => (s"g${i % 3}", s"key${i % 1234}")) ++
      Seq(("g0", null))
    val df = data.toDF("g", "k")
    val table = SketchOps.hllDistinct(df, Seq("g"), "k", p = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    for (parts <- Seq(1, 7)) {
      // repartition forces the partial-update + merge + serialize path
      val agg = df.repartition(parts).groupBy("g")
        .agg(SketchOps.hllAggCol(col("k"), p = 10).as("h"))
        .select(col("g"), col("h.buckets_used"), col("h.est_distinct"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(agg == table, s"parts=$parts")
    }
    // empty group behavior: no rows -> no group (same as the table form)
    assert(df.where(lit(false)).groupBy("g")
      .agg(SketchOps.hllAggCol(col("k"), 10)).count() == 0)
    // SQL-function registration path (GraftExtensions)
    df.createOrReplaceTempView("hll_agg_in")
    val viaSql = spark.sql(
      "SELECT g, graft_hll(k).est_distinct AS e FROM hll_agg_in GROUP BY g")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaSql == table.map { case (g, (_, e)) => g -> e })
  }
}
