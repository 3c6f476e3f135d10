package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Seeded-RNG property tests for the r10 kernels: each new primitive
  * checked against an independent brute-force or closed-form replica
  * over randomized inputs (the KernelSpec discipline — the
  * scalatest/scalacheck bridge artifact is not in the offline cache,
  * so properties run on a fixed-seed generator).
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AhoCorasick == brute-force substring counting (random texts)") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 100) {
      val alphabet = "abc"
      def randStr(max: Int) =
        (0 until (1 + rnd.nextInt(max))).map(_ =>
          alphabet(rnd.nextInt(alphabet.length))).mkString
      val patterns = (0 until (1 + rnd.nextInt(6))).map(_ => randStr(4)).distinct
      val text = randStr(200)
      val ac = graft.functions.AhoCorasick.build(patterns)
      val got = ac.countAll(text)
      patterns.zipWithIndex.foreach { case (p, i) =>
        val brute = (0 to text.length - p.length)
          .count(j => text.regionMatches(j, p, 0, p.length))
        assert(got(i) == brute.toLong,
          s"pattern '$p' in '${text.take(40)}…': ${got(i)} vs $brute")
      }
    }
  }

  test("CdcBoundaries rolling == positional closed form (random texts)") {
    val rnd = new scala.util.Random(13)
    def gear(c: Char): Long = (c.toLong * 2654435761L) % 1048573L
    for (_ <- 1 to 100) {
      val n = rnd.nextInt(400)
      val text = (0 until n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
      val w = 1 + rnd.nextInt(12)
      val d = 1 << (1 + rnd.nextInt(7))
      val got = graft.functions.CdcBoundaries.boundaries(text, w, d).toSeq
      val expected = (w to n).filter { i =>
        val h = (0 until w).map(j => gear(text.charAt(i - 1 - j)) << j).sum
        h % d == 0
      }
      assert(got == expected, s"w=$w d=$d n=$n")
    }
  }

  test("zValue interleave is invertible (random dims)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val dims = (0 until 200).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val df = dims.toDF("x", "y")
      .withColumn("z", graft.ops.StorageOps.zValue(Seq(col("x"), col("y"))))
    df.collect().foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var (rx, ry) = (0L, 0L)
      for (b <- 0 until 16) {
        rx |= ((z >> (2 * b)) & 1L) << b
        ry |= ((z >> (2 * b + 1)) & 1L) << b
      }
      assert(rx == x && ry == y, s"z=$z decoded ($rx,$ry) != ($x,$y)")
    }
  }

  test("topKPerKey == window spelling on random frames") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    for (trial <- 1 to 5) {
      val rows = (0 until 500).map { i =>
        (s"g${rnd.nextInt(7)}", rnd.nextInt(40).toLong, i.toLong)
      }
      val df = rows.toDF("g", "v", "id").repartition(1 + rnd.nextInt(6))
      val k = 1 + rnd.nextInt(8)
      val got = graft.ops.TopKOps.topKPerKey(df, Seq("g"),
          Seq("v" -> false, "id" -> true), k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val expected = rows.groupBy(_._1).flatMap { case (_, g) =>
        g.sortBy(t => (-t._2, t._3)).take(k)
      }.toSet
      assert(got == expected, s"trial=$trial k=$k")
    }
  }

  test("groupedMedian == sorted serial medians on random groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (0 until 800).map(_ =>
      (s"g${rnd.nextInt(9)}", rnd.nextInt(1000).toLong - 500))
    val got = graft.ops.QuantileOps.groupedMedian(
        rows.toDF("g", "v").repartition(5), "g", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val sorted = rs.map(_._2).sorted
      val n = sorted.size
      val disc = sorted((n + 1) / 2 - 1)
      val lo = sorted((n + 1) / 2 - 1)
      val hi = sorted((n + 1) / 2 - 1 + (1 - n % 2))
      val cont = (lo + hi) / 2.0
      assert(got(g) == ((disc, cont)), s"group $g")
    }
  }

  test("saltedBandPairs == plain bucket self-join on random buckets") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    for (round <- 1 to 8) {
      // random bucket layout: a few buckets of wildly different sizes,
      // random non-contiguous ids (the cell hash must not depend on
      // density), random salt threshold
      val rows = (0 until (2 + rnd.nextInt(5))).flatMap { b =>
        val n = 1 + rnd.nextInt(40)
        val hash = rnd.nextLong()
        (0 until n).map(_ => (b % 3, hash, rnd.nextLong() & 0xffffffL))
      }.distinct
      val banded = rows.toDF("band", "band_hash", "id")
      val threshold = 1 + rnd.nextInt(10)
      val got = graft.ops.DedupOps.saltedBandPairs(banded, threshold)
        .select("id_a", "id_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = rows.groupBy(r => (r._1, r._2)).values.flatMap { bucket =>
        val ids = bucket.map(_._3).distinct
        for (a <- ids; b <- ids if a < b) yield (a, b)
      }.toSet
      assert(got == expect,
        s"round $round threshold $threshold: ${got.size} vs ${expect.size}")
      graft.ops.DedupOps.unpersistAll()
    }
  }

  test("NearestCells == serial argmin scan on random geometry") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 5) {
      val dim = 2 + rnd.nextInt(10)
      val nCells = 2 + rnd.nextInt(30)
      val cents = Array.fill(nCells)(Array.fill(dim)(rnd.nextInt(21) - 10.0))
      val n = 1 + rnd.nextInt(4).min(nCells)
      val vecs = (0 until 100).map(i =>
        (i.toLong, Array.fill(dim)((rnd.nextInt(41) - 20).toFloat)))
      val got = vecs.toDF("id", "v")
        .select(col("id"),
          graft.ops.SimilarityOps.nearestCellsExpr(col("v"), cents, n))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      vecs.foreach { case (id, v) =>
        val scored = cents.zipWithIndex.map { case (c, i) =>
          val ss = c.foldLeft(0.0)((a, x) => a + x * x)
          val dot = v.zip(c).foldLeft(0.0)((a, p) => a + p._1.toDouble * p._2)
          (ss - 2.0 * dot, i)
        }
        val expect = scored.sortBy(identity).take(n).map(_._2).toSeq
        assert(got(id) == expect, s"id $id dim=$dim cells=$nCells n=$n")
      }
    }
  }

  test("token-path fusions == composed forms on random unicode soup") {
    // the r12 codegen'd byte scans (TokensArray / WordNgramArray /
    // MinhashSignature via the public entry points) against the
    // composed HOF/regex references, over strings that mix multi-byte
    // UTF-8, every ASCII whitespace byte, empties, and long runs —
    // exactly the byte patterns a zero-copy scanner can get wrong
    val rnd = new scala.util.Random(12)
    val pool: IndexedSeq[String] = IndexedSeq(
      " ", "\t", "\n", "", "\f", "\r", "a", "Zz", "é", "中",
      "👍", "café", "0", "—", ".", "x" * 37, " " * 5, "ß", " ")
    def soup(): String =
      (0 until rnd.nextInt(30)).map(_ => pool(rnd.nextInt(pool.length))).mkString
    val rows = (1L to 200L).map(i => (i, soup()))
    val spark2 = spark
    import spark2.implicits._
    val df = rows.toDF("id", "text")
    import graft.ops.TextOps
    val tokDiff = df.select(
        TextOps.tokens(col("text")).as("a"),
        TextOps.tokensRegex(col("text")).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(tokDiff == 0, s"$tokDiff token rows diverge")
    val gramDiff = df.select(TextOps.tokens(col("text")).as("t"))
      .select(TextOps.wordNgramsOf(col("t"), 3).as("a"),
        TextOps.wordNgramsOfHof(col("t"), 3).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(gramDiff == 0, s"$gramDiff ngram rows diverge")
    import graft.ops.DedupOps
    val md5Diff = df.select(
        DedupOps.md5Hash60(col("text")).as("a"),
        DedupOps.md5Hash60Composed(col("text")).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(md5Diff == 0, s"$md5Diff md5-60 rows diverge")
    val based = df
      .withColumn("sh", DedupOps.shingles(col("text"), 3))
      .withColumn("base",
        transform(col("sh"), s => pmod(xxhash64(s), lit((1L << 31) - 1))))
    val sigDiff = based.select(
        DedupOps.minhashSignatureFromBase(col("base"), 16).as("a"),
        DedupOps.minhashSignatureFromBaseHof(col("base"), 16).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(sigDiff == 0, s"$sigDiff minhash rows diverge")
    // fused per-row simhash vs the explode+agg reference on the soup
    val viaScalar = df.select(col("id"),
        DedupOps.simhashOfText(col("text")).as("simhash"))
      .where(col("simhash").isNotNull)
    val viaExplode = DedupOps.simhashByExplode(df, "text", "id")
    assert(viaScalar.exceptAll(viaExplode).isEmpty &&
      viaExplode.exceptAll(viaScalar).isEmpty, "simhash soup divergence")
    // fused gram-array minhash vs its explode reference on the soup
    val sh = df.select(col("id"),
      DedupOps.shinglesOf(graft.ops.TextOps.tokens(col("text")), 3).as("sh"))
    val fusedSig = sh.select(col("id"),
        DedupOps.minhashFromGrams(col("sh"), 8, portable = false).as("sig"))
      .where(col("sig").isNotNull)
    val P = (1L << 31) - 1
    val expSig = {
      val exploded = sh.select(col("id"), explode(col("sh")).as("s"))
        .select(col("id"), pmod(xxhash64(col("s")), lit(P)).as("h"))
      val minCols = DedupOps.hashParams(8).zipWithIndex.map { case ((a, b), i) =>
        min(pmod(col("h") * lit(a) + lit(b), lit(P))).as(s"m$i")
      }
      exploded.groupBy("id").agg(minCols.head, minCols.tail: _*)
        .select(col("id"), array((0 until 8).map(i => col(s"m$i")): _*).as("sig"))
    }
    assert(fusedSig.exceptAll(expSig).isEmpty &&
      expSig.exceptAll(fusedSig).isEmpty, "minhash-grams soup divergence")
  }

  test("tokenJaccardPairs: prefix-filtered == nested-loop == brute force " +
    "on random corpora and thresholds") {
    // the r12 default flip (prefixFilter = true) changes candidate
    // generation for every downstream dedup caller — the fixed-fixture
    // identity pin is narrow, so sweep random corpora × thresholds ×
    // hot-token demotion counts and require the full (id_a, id_b,
    // jaccard) result identical between both engine paths AND an
    // in-memory brute force over the same distinct token sets.
    import spark.implicits._
    val rnd = new scala.util.Random(1213)
    val vocab = Array.tabulate(60)(i => s"w$i")
    for (round <- 1 to 10) {
      val nDocs = 40 + rnd.nextInt(40)
      val docs = (0 until nDocs).map { i =>
        val blk = rnd.nextInt(3)
        // half the docs are mutations of a shared template per block,
        // so true near-dups exist at every threshold
        val base = (0 until 6 + rnd.nextInt(10))
          .map(j => vocab((blk * 17 + j * (1 + i % 4)) % vocab.length))
        val noise = (0 until rnd.nextInt(4)).map(_ => vocab(rnd.nextInt(vocab.length)))
        (i.toLong, blk.toString, (base ++ noise).mkString(" "))
      }
      val df = docs.toDF("id", "blk", "text")
      val threshold = 0.25 + rnd.nextInt(13) * 0.05
      val demote = Seq(0, 2, 1024)(rnd.nextInt(3))
      def run(prefix: Boolean) = graft.ops.DedupOps.tokenJaccardPairs(
          df, "text", "id", "blk", threshold = threshold,
          prefixFilter = prefix, demoteHotTokens = demote)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val fast = run(prefix = true)
      val slow = run(prefix = false)
      val toks = docs.map { case (id, blk, t) => (id, blk, t.split(" ").toSet) }
      val brute = (for {
        (a, ba, ta) <- toks; (b, bb, tb) <- toks
        if a < b && ba == bb && (ta.size + tb.size) > 0
        j = (ta & tb).size.toDouble / (ta.size + tb.size - (ta & tb).size)
        if j >= threshold
      } yield (a, b, j)).toSet
      assert(fast == slow,
        s"round $round t=$threshold demote=$demote: prefix != nested-loop")
      assert(fast == brute,
        s"round $round t=$threshold demote=$demote: engine != brute force")
      graft.ops.DedupOps.unpersistAll()
    }
  }

  test("minhashPairs: hot-band salting == unsalted join on random corpora " +
    "and LSH shapes") {
    // the other r12 default flip (saltHotBands = 2^13).  Tiny random
    // corpora never reach 2^13-row band buckets, so the sweep forces
    // the salt path with saltHotBands in 1..4 — every bucket splits —
    // and requires the full (id_a, id_b, jaccard) output identical to
    // the unsalted plain band self-join across random corpus shapes,
    // LSH geometries, shingle sizes and thresholds.
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val vocab = Array.tabulate(24)(i => s"t$i")
    for (round <- 1 to 8) {
      val nDocs = 30 + rnd.nextInt(30)
      val docs = (0 until nDocs).map { i =>
        // clusters of mutated copies → plenty of shared band buckets
        val k = i % (3 + rnd.nextInt(4))
        val words = (0 until 6 + rnd.nextInt(12))
          .map(j => vocab((k * 7 + j + (if (rnd.nextInt(5) == 0) 1 else 0)) % vocab.length))
        (i.toLong, words.mkString(" "))
      }
      val df = docs.toDF("id", "text")
      val (numHashes, bands) = Seq((32, 8), (16, 4), (24, 6))(rnd.nextInt(3))
      val shingle = 2 + rnd.nextInt(2)
      val threshold = 0.2 + rnd.nextInt(7) * 0.1
      def run(salt: Int) = graft.ops.DedupOps.minhashPairs(
          df, "text", "id", numHashes = numHashes, bands = bands,
          shingleSize = shingle, jaccardThreshold = threshold,
          saltHotBands = salt)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val salted = run(1 + rnd.nextInt(4))
      val plain = run(0)
      assert(salted == plain,
        s"round $round nh=$numHashes b=$bands sh=$shingle t=$threshold: " +
          s"${salted.size} vs ${plain.size}")
      graft.ops.DedupOps.unpersistAll()
    }
  }
}
