package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{IndexOps, PackingOps, QuantileOps}

/** Serving-side corpus ops added in r8: positional inverted index /
  * phrase search, exact radix-selection quantiles, and the
  * deterministic epoch shuffle.  Each family pins (a) crafted-input
  * exactness, (b) the scan-vs-index (or distributed-vs-serial)
  * equivalence its design claims, and (c) the plan property that
  * makes it scale (bucket pruning for the index probe).
  */
class IndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf001 = "/root/testdata/sf0.001"
  import org.apache.spark.sql.DataFrame

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ---------------- inverted index + phrase search ----------------

  test("inverted index: crafted postings are exact (tf, sorted 1-based positions)") {
    val docs = docsDf(Seq(
      (1L, "a b a  c a"), // double space: tokenizer drops empties
      (2L, "b c"),
      (3L, "")))
    val got = IndexOps.invertedIndex(docs, "doc_id", "text")
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getSeq[Int](3).toList)))
      .toMap
    assert(got == Map(
      ("a", 1L) -> ((3L, List(1, 3, 5))),
      ("b", 1L) -> ((1L, List(2))),
      ("c", 1L) -> ((1L, List(4))),
      ("b", 2L) -> ((1L, List(1))),
      ("c", 2L) -> ((1L, List(2)))))
  }

  test("phrase scan: overlapping matches, doc-start/end matches, short docs") {
    val docs = docsDf(Seq(
      (1L, "a a a"),       // phrase "a a" overlaps: starts 1 and 2
      (2L, "x a a"),       // match at end
      (3L, "a a x"),       // match at start
      (4L, "a"),           // shorter than the phrase
      (5L, "a x a")))      // no adjacency
    val got = IndexOps.phraseScan(docs, "doc_id", "text", Seq("a", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq == Seq((1L, 2L, 1L), (2L, 1L, 2L), (3L, 1L, 1L)))
  }

  test("phrase probe == phrase scan on the corpus; repeated-term phrases agree") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val idx = "/tmp/graft-test-postings-spec"
    IndexOps.writePostingsIndex(docs, "doc_id", "text", idx, 8)
    for (phrase <- Seq(Seq("table", "part"), Seq("a", "a"),
        Seq("fast", "table", "part"))) {
      val scan = IndexOps.phraseScan(docs, "doc_id", "text", phrase)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      val probe = IndexOps.phraseProbe(spark, idx, phrase, 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(probe == scan, s"phrase $phrase: probe != scan")
      assert(scan.nonEmpty, s"phrase $phrase matched nothing — weak fixture")
    }
    // a term absent from the corpus: empty result, no error
    assert(IndexOps.phraseProbe(spark, idx,
      Seq("table", "zzzznotaword"), 8).count() == 0L)
  }

  test("phrase probe: the term-bucket filter partition-prunes the index scan") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val idx = "/tmp/graft-test-postings-prune"
    IndexOps.writePostingsIndex(docs, "doc_id", "text", idx, 8)
    val probe = IndexOps.phraseProbe(spark, idx, Seq("table", "part"), 8)
    val plan = probe.queryExecution.executedPlan.toString
    // the tb IN (...) predicate must land in PartitionFilters (planning
    // -time directory pruning), NOT in the row-level data filters
    assert("PartitionFilters: \\[[^\\]]*tb".r.findFirstIn(plan).isDefined,
      s"tb filter not in PartitionFilters:\n$plan")
    // and the scan must actually read fewer partitions than exist: the
    // two probe terms hash to at most 2 of the 8 directories
    // executedPlan is the AdaptiveSparkPlanExec wrapper — collect the
    // scan from the pre-adaptive physical plan
    val scans = probe.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.selectedPartitions.partitionCount <= 2,
      s"expected <=2 pruned directories, read ${scans.head.selectedPartitions.partitionCount}")
  }

  // ---------------- exact quantiles (radix selection) ----------------

  test("radix rank selection == sorted order statistics (negatives, extremes, dups)") {
    import spark.implicits._
    val vals: Seq[Long] = Seq(
      Long.MinValue, Long.MinValue, -7L, -7L, -1L, 0L, 0L, 0L, 3L, 3L,
      42L, 1L << 33, (1L << 33) + 1, Long.MaxValue - 1, Long.MaxValue,
      -(1L << 50), 999999999999L, -999999999999L, 5L, -5L)
    val df = vals.toDF("v").repartition(7)
    val sorted = vals.sorted
    val ranks = Seq(0L, 1L, 2L, 5L, 9L, 10L, 18L, 19L)
    val (n, got) = QuantileOps.exactRankValues(df, "v", _ => ranks)
    assert(n == vals.size.toLong)
    ranks.foreach { r =>
      assert(got(r) == sorted(r.toInt), s"rank $r: ${got(r)} != ${sorted(r.toInt)}")
    }
  }

  test("exact quantiles: disc/cont match a serial computation; nulls excluded") {
    import spark.implicits._
    // deterministic pseudo-random longs + nulls
    val vals = (0 until 997).map(i => ((i * 2654435761L) % 10007) - 5003)
    val df = vals.map(v => Some(v)).toDF("v")
      .union(Seq[Option[Long]](None, None).toDF("v"))
      .repartition(5)
    val ps = Seq(0.0, 0.01, 0.5, 0.77, 1.0)
    val got = QuantileOps.exactQuantilesLong(df, "v", ps)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    val sorted = vals.sorted
    val n = sorted.size
    got.zip(ps.sorted).foreach { case ((p, gn, disc, cont), ep) =>
      assert(p == ep && gn == n.toLong)
      val discExp = sorted(math.max(0, math.ceil(ep * n).toInt - 1))
      assert(disc == discExp, s"p=$ep disc $disc != $discExp")
      val rn = (n - 1) * ep
      val lo = sorted(math.floor(rn).toInt); val hi = sorted(math.ceil(rn).toInt)
      val contExp = lo + (hi - lo) * (rn - math.floor(rn))
      assert(cont == contExp, s"p=$ep cont $cont != $contExp")
    }
  }

  test("exact quantiles: degenerate one-value column costs the same bounded walk") {
    import spark.implicits._
    val df = Seq.fill(1000)(7L).toDF("v").repartition(3)
    val got = QuantileOps.exactQuantilesLong(df, "v", Seq(0.1, 0.5, 0.9))
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(got.forall(_ == ((7L, 7.0))))
  }

  test("groupedMedian: odd/even groups, duplicate values, singleton") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L), ("a", 3L), ("a", 9L),           // odd: disc=cont=3
      ("b", 1L), ("b", 2L), ("b", 10L), ("b", 11L), // even: disc=2, cont=6
      ("c", 5L), ("c", 5L), ("c", 5L), ("c", 7L),   // dups: disc=5, cont=5
      ("d", 42L))                                 // singleton
      .toDF("g", "v").repartition(3)
    val got = QuantileOps.groupedMedian(df, "g", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == Map(
      "a" -> (3L, 3L, 3.0), "b" -> (4L, 2L, 6.0),
      "c" -> (4L, 5L, 5.0), "d" -> (1L, 42L, 42.0)))
  }

  test("madOutliers: serial median/MAD replica; mean-rule victim survives") {
    import spark.implicits._
    // 1..99 plus one huge outlier: the mean rule would let the
    // outlier drag the threshold; median/MAD must flag exactly it
    // plus the serial rule's tail
    val vals = (1L to 99L) :+ 100000L
    val df = vals.map(v => (v, v)).toDF("id", "v").repartition(4)
    val got = QuantileOps.madOutliers(df, "id", "v", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // serial replica
    val sorted = vals.sorted; val n = sorted.size
    val med = sorted(math.ceil(0.5 * n).toInt - 1)
    val devs = vals.map(v => math.abs(v - med)).sorted
    val mad = devs(math.ceil(0.5 * n).toInt - 1)
    val expIds = vals.filter(v => math.abs(v - med) > 2 * mad).sorted
    assert(got.map(_._1).toSeq == expIds)
    assert(got.forall(r => r._4 == med && r._5 == mad))
    assert(got.map(_._1).contains(100000L))
  }

  test("winsorize: crafted clip at exact percentile cuts; nulls pass through") {
    import spark.implicits._
    // 1..100: p05 disc = 5, p95 disc = 95 (rank ceil(p*100)-1)
    val df = (1 to 100).map(i => (i.toLong, Some(i.toLong))).toDF("id", "x")
      .union(Seq((101L, Option.empty[Long])).toDF("id", "x"))
    val got = QuantileOps.winsorize(df, "id", "x", 0.05, 0.95)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getBoolean(3)))).toSeq
      .sortBy(_._1)
    got.foreach {
      case (id, clipped, flag) if id <= 100 =>
        val exp = math.max(5L, math.min(95L, id))
        assert(clipped.contains(exp), s"id $id clipped $clipped != $exp")
        assert(flag.contains(id < 5 || id > 95))
      case (_, clipped, flag) => // the null row
        assert(clipped.isEmpty && flag.isEmpty)
    }
  }

  // ---------------- deterministic epoch shuffle ----------------

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("epoch shuffle: positions are the exact md5 rank; shards balanced ±1") {
    import spark.implicits._
    val n = 501
    val ids = (0 until n).map(_.toLong)
    val df = ids.toDF("doc_id").repartition(7)
    val got = PackingOps.epochShuffle(df, "doc_id", epoch = 2, nShards = 8,
        numPartitions = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // serial truth: rank of md5("id:2")
    val expOrder = ids.sortBy(id => (md5Hex(s"$id:2"), id))
    val expPos = expOrder.zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(got.length == n)
    got.foreach { case (id, pos, shard) =>
      assert(pos == expPos(id), s"id $id pos $pos != ${expPos(id)}")
      assert(shard == pos % 8)
    }
    val sizes = got.groupBy(_._3).view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"shard imbalance: $sizes")
  }

  test("epoch shuffle: epochs decorrelate; partitioning never changes the order") {
    import spark.implicits._
    val df = (0 until 300).map(_.toLong).toDF("doc_id")
    def order(d: org.apache.spark.sql.DataFrame, e: Int) =
      PackingOps.epochShuffle(d, "doc_id", epoch = e, nShards = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e1 = order(df, 1)
    val e2 = order(df, 2)
    assert(e1 != e2, "two epochs produced the same permutation")
    assert(order(df.repartition(11), 1) == e1, "partitioning changed the order")
  }
}
