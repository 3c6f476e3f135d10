package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a
  * hyperplane-LSH-bucketed variant as the scale path (candidates only
  * join within matching buckets; multi-probe widens recall).
  *
  * Dot products are `aggregate(zip_with(...))` — a sequential
  * codegen'd fold, deterministic and UDF-free.
  */
object SimilarityOps {

  /** Σ aᵢ·bᵢ with double accumulation (elements cast up from float).
    * Backed by the codegen'd [[graft.functions.DotProduct]] Catalyst
    * expression — the higher-order `aggregate(zip_with(...))` twin
    * ([[dotHof]]) is interpreted per element and measurably slower on
    * the pair-heavy LSH/IVF paths; both produce bit-identical results
    * (same IEEE operation order; parity pinned in OpsSpec).
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** The original higher-order-function formulation, kept as the
    * parity reference for the custom expression.
    */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sequential Σ aᵢ·bᵢ over already-double arrays — the driver/executor
    * Scala twin of `dot` (same left-fold order, so results are
    * bit-identical to the SQL expression and to DuckDB's
    * list_dot_product).
    */
  private def dotSeq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Total order on id values of the common Spark key types, matching
    * the `corpus_id` ASC tie-break of the rank window.
    */
  private def cmpId(x: Any, y: Any): Int = (x, y) match {
    case (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compare(a, b)
    case (a: java.lang.Integer, b: java.lang.Integer) => Integer.compare(a, b)
    case (a: String, b: String) => a.compareTo(b)
    case (a: java.lang.Number, b: java.lang.Number) =>
      java.lang.Double.compare(a.doubleValue, b.doubleValue)
    case _ => x.toString.compareTo(y.toString)
  }

  /** Exact brute-force top-k: the query set is collected + broadcast
    * (same small-side assumption the broadcast join made), and each
    * corpus partition reduces itself to ≤ k candidates per query with a
    * bounded heap (the `takeOrdered` pattern) BEFORE anything shuffles.
    * The global rank window then sees only partitions × queries × k
    * rows — at a 100 TB corpus the full candidate set never moves,
    * unlike a bare `row_number().over(partitionBy(query_id))`, which
    * funnels the whole corpus through one reducer per query.
    *
    * Cosines are bit-identical to the previous expression form: the
    * per-element double casts, the sequential dot-product fold, and the
    * `dot/(cn*qn)` division are evaluated in the same IEEE order.
    */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int = 10): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}
    val spark = corpus.sparkSession
    // zero-norm vectors (padding rows, failed encodes) have no
    // direction and are dropped — under Spark 4's default ANSI mode the
    // division would otherwise kill the whole job
    val qData: Array[(Any, Array[Double], Double)] = queries
      .select(col(queryId).as("query_id"), col(queryVec).as("qv"))
      .filter(col("qv").isNotNull)
      .collect()
      .map { r =>
        val v = r.getSeq[Any](1).iterator
          .map(x => if (x == null) Double.NaN else x.asInstanceOf[Number].doubleValue)
          .toArray
        (r.get(0), v, math.sqrt(dotSeq(v, v)))
      }
      .filter(q => q._3 > 0) // also drops NaN norms (null elements)
    val qb = spark.sparkContext.broadcast(qData)
    val outSchema = StructType(Seq(
      StructField("query_id", queries.schema(queryId).dataType),
      StructField("corpus_id", corpus.schema(corpusId).dataType),
      StructField("cosine", DoubleType)))
    val kk = k
    val cand = corpus
      .select(col(corpusId).as("corpus_id"), col(corpusVec).as("cv"))
      .filter(col("cv").isNotNull)
      .mapPartitions { it =>
        val qs = qb.value
        // max-heap whose head is the WORST kept candidate
        val worstFirst = new Ordering[(Double, Any)] {
          def compare(a: (Double, Any), b: (Double, Any)): Int = {
            val c = java.lang.Double.compare(b._1, a._1) // lower cosine = worse
            if (c != 0) c else cmpId(a._2, b._2) // larger id = worse
          }
        }
        val heaps = Array.fill(qs.length)(
          scala.collection.mutable.PriorityQueue.empty[(Double, Any)](worstFirst))
        it.foreach { r =>
          val cid = r.get(0)
          val cv = r.getSeq[Any](1).iterator
            .map(x => if (x == null) Double.NaN else x.asInstanceOf[Number].doubleValue)
            .toArray
          val cn = math.sqrt(dotSeq(cv, cv))
          if (cn > 0) {
            var qi = 0
            while (qi < qs.length) {
              val (_, qv, qn) = qs(qi)
              val cos = dotSeq(cv, qv) / (cn * qn)
              val h = heaps(qi)
              if (h.size < kk) h.enqueue((cos, cid))
              else {
                val (wc, wid) = h.head
                if (cos > wc || (cos == wc && cmpId(cid, wid) < 0)) {
                  h.dequeue(); h.enqueue((cos, cid))
                }
              }
              qi += 1
            }
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (cos, cid) => Row(qs(qi)._1, cid, cos) }
        }
      }(Encoders.row(outSchema))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** Deterministic pseudo-random hyperplanes (LCG; values in
    * [-1, 1)), shipped as literals — no RNG at execution time.
    */
  private[graft] def hyperplanes(bits: Int, dim: Int): Seq[Seq[Double]] = {
    var state = 20240613L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 20) % 2000001L).toDouble / 1000000.0 - 1.0
    }
    Seq.fill(bits)(Seq.fill(dim)(next()))
  }

  /** Sign-LSH bucket id of a vector: one bit per hyperplane. */
  def lshBucket(vec: Column, bits: Int, dim: Int): Column =
    hyperplanes(bits, dim).zipWithIndex.map { case (h, i) =>
      when(dot(vec, lit(h.toArray)) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed near-neighbor pairs: vectors whose bucket collides,
    * verified by exact cosine ≥ threshold.  One shuffle on the bucket
    * id; bucket population is ~n/2^bits so the join is local and
    * skew-resistant (AQE handles hot buckets).
    */
  def lshCosinePairs(
      df: DataFrame, idCol: String, vecCol: String,
      bits: Int = 8, dim: Int = 64,
      threshold: Double = 0.9): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(vecCol).as("v"),
        norm(col(vecCol)).as("nrm"),
        lshBucket(col(vecCol), bits, dim).as("bucket"))
      .filter(col("nrm") > 0) // zero-norm: no direction; ANSI-safe
    val l = b.as("l")
    val r = b.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        (dot(col("l.v"), col("r.v")) / (col("l.nrm") * col("r.nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Exact all-pairs cosine ≥ threshold within a blocking key (used as
    * the oracle-checkable flavor; the LSH variant is the scale path).
    */
  def blockedCosinePairs(
      df: DataFrame, idCol: String, vecCol: String, blockCol: String,
      threshold: Double): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(vecCol).as("v"), col(blockCol).as("blk"),
        norm(col(vecCol)).as("nrm"))
      .filter(col("nrm") > 0) // zero-norm: no direction; ANSI-safe
    val l = b.as("l")
    val r = b.as("r")
    l.join(r, col("l.blk") === col("r.blk") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        (dot(col("l.v"), col("r.v")) / (col("l.nrm") * col("r.nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): embeddings are clustered by nearest-centroid
    * assignment and a vector is a DUPLICATE when some LOWER-id member
    * of its cluster sits at cosine ≥ `cosThreshold` (keep-first-id —
    * the deterministic stand-in for SemDeDup's keep-one-per-group).
    * Returns one row per dropped vector:
    * `(vec_id, cell, n_near, max_cosine)`.
    *
    * Scale shape: assignment is a pure projection against centroid
    * LITERALS ([[deterministicCentroids]] — so the whole pass is
    * engine-replayable); the quadratic cosine check is confined to
    * cells (n²/nCells at uniform fill, `nCells ~ √n`), the self-join
    * shuffles on the cell id only, and `maxCell` drops degenerate
    * cells outright (the simhash `maxBucket` convention — a cell that
    * big means the clustering, not the join, needs fixing).  The
    * assigned table is persisted: three references (hot-cell agg +
    * both join sides) would otherwise recompute the 16-dot assignment
    * projection per reference.
    */
  def semanticDupDrops(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], cosThreshold: Double,
      maxCell: Int = 100000): DataFrame = {
    val cellScores = centroids.zipWithIndex.map { case (cent, i) =>
      struct(
        (lit(sumSquares(cent)) - lit(2.0) * dot(col("v"), lit(cent))).as("score"),
        lit(i).as("cell"))
    }
    val assigned = DedupOps.registerPersist(
      corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
          norm(col(vecCol)).as("nrm"))
        .filter(col("v").isNotNull && col("nrm") > 0)
        // array_min, not sort: O(nCells) per corpus row (same
        // lexicographic (score, cell) minimum — see assignCells)
        .withColumn("cell",
          array_min(array(cellScores: _*)).getField("cell")))
    val hot = assigned.groupBy("cell").agg(count(lit(1)).as("pop"))
      .filter(col("pop") > maxCell).select("cell")
    val cold = assigned.join(broadcast(hot), Seq("cell"), "left_anti")
    val l = cold.as("l")
    val r = cold.as("r")
    l.join(r, col("l.cell") === col("r.cell") && col("l.id") < col("r.id"))
      .select(col("l.cell").as("cell"), col("r.id").as("dup_id"),
        (dot(col("l.v"), col("r.v")) / (col("l.nrm") * col("r.nrm"))).as("cosine"))
      .filter(col("cosine") >= cosThreshold)
      .groupBy(col("dup_id").as("vec_id"), col("cell"))
      .agg(count(lit(1)).as("n_near"), max(col("cosine")).as("max_cosine"))
  }

  /** Symmetric int8 quantization of an embedding column — the 4×–8×
    * storage lever for a 100 TB ANN corpus.  Per-vector
    * `scale = max|vᵢ|/127`, `qᵢ = floor(vᵢ/scale + 0.5)` (explicit
    * half-up: `round()`'s tie mode differs across engines, `floor(x
    * + 0.5)` doesn't).  `scale` is an exact max (no accumulation), so
    * any engine reproduces the quantized values bit-for-bit.
    * Zero-norm vectors quantize to all-zeros with scale 0 (the
    * division is guarded — ANSI mode).
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val scale = aggregate(v, lit(0.0), (m, x) => greatest(m, abs(x))) / lit(127.0)
    df.select(col(idCol).as("id"), v.as("v"), scale.as("scale"))
      .withColumn("qv",
        when(col("scale") > 0,
          transform(col("v"), x => floor(x / col("scale") + lit(0.5))))
        .otherwise(transform(col("v"), _ => lit(0.0))))
  }

  /** Reconstruct (dequantize) — `qᵢ · scale` per element. */
  def dequantizeInt8(qv: Column, scale: Column): Column =
    transform(qv, x => x * scale)

  /** IVF (inverted-file) top-k: a KMeans coarse quantizer learned on a
    * corpus sample assigns every corpus vector to one of `nCells`
    * cells (one `model.transform` projection); each query probes its
    * `nProbe` nearest cells and ranks only those candidates by exact
    * cosine.  The cell-selection is pure expression code — the
    * centroids are shipped as literals and the nearest cells fall out
    * of `sort_array` over (||c||² − 2·q·c, cell) structs, so the whole
    * plan stays codegen'd; no UDF, no driver loop over queries.
    *
    * At 100 TB: train on `trainFraction` of the corpus (KMeans cost is
    * per-sample), size `nCells` ~ √n so cells stay executor-local, and
    * the probe join broadcasts only the (small) query side — the
    * corpus shuffles once at assignment and never again.
    */
  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      nCells: Int = 16, nProbe: Int = 4, k: Int = 10,
      trainFraction: Double = 1.0, seed: Long = 42): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val c = corpus.select(col(corpusId).as("corpus_id"),
        col(corpusVec).as("cv"), norm(col(corpusVec)).as("cn"))
      .filter(col("cn") > 0)
    val vecs = c.select(array_to_vector(col("cv")).as("features"))
    val train = if (trainFraction < 1.0) vecs.sample(trainFraction, seed) else vecs
    val model = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("features")
      .fit(train)
    val centroids = model.clusterCenters.map(_.toArray)
    // corpus → cell via the model's own assignment (consistent with
    // training's distance metric)
    val assigned = model.transform(
        c.withColumn("features", array_to_vector(col("cv"))))
      .select(col("corpus_id"), col("cv"), col("cn"), col("prediction").as("cell"))
    // query → nProbe nearest cells by squared L2: ||q−c||² ranks as
    // ||c||² − 2·q·c (the ||q||² term is constant per query)
    val cellScores = centroids.zipWithIndex.map { case (cent, i) =>
      val c2 = cent.map(x => x * x).sum
      struct((lit(c2) - lit(2.0) * dot(col("qv"), lit(cent))).as("score"),
        lit(i).as("cell"))
    }
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"),
        norm(col(queryVec)).as("qn"))
      .filter(col("qn") > 0)
      .select(col("query_id"), col("qv"), col("qn"),
        explode(transform(slice(sort_array(array(cellScores: _*)), 1, nProbe),
          s => s.getField("cell"))).as("cell"))
    val cand = assigned.join(broadcast(q), "cell")
      .select(col("query_id"), col("corpus_id"),
        (dot(col("cv"), col("qv")) / (col("cn") * col("qn"))).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** Σ aᵢ² — sequential, shared with the oracle-SQL builder so the
    * `||c||²` literals in both engines come from the same fold.
    */
  private[graft] def sumSquares(a: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * a(i); i += 1 }
    s
  }

  /** Deterministic sequential Lloyd over a driver-side sample: fixed
    * iteration count, first-`nCells` init, ties to the lower cell,
    * means accumulated in sample order — the same bits on every run,
    * so the learned centroids can ship as LITERALS into both the
    * Spark plan and a DuckDB oracle (the [[hyperplanes]] pattern, but
    * learned from data).  Cells that lose all members keep their
    * previous centroid.
    */
  private[graft] def lloydCentroids(
      samples: Array[Array[Double]], nCells: Int, iters: Int): Array[Array[Double]] = {
    require(samples.length >= nCells,
      s"lloydCentroids: need >= $nCells samples, got ${samples.length}")
    val dim = samples.head.length
    var cents = Array.tabulate(nCells)(i => samples(i).clone())
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var it = 0
    while (it < iters) {
      val sums = Array.fill(nCells)(new Array[Double](dim))
      val counts = new Array[Long](nCells)
      samples.foreach { s =>
        var best = 0
        var bestD = d2(s, cents(0))
        var c = 1
        while (c < nCells) {
          val dd = d2(s, cents(c))
          if (dd < bestD) { best = c; bestD = dd }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += s(j); j += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(nCells) { c =>
        if (counts(c) == 0) cents(c)
        else {
          val m = new Array[Double](dim)
          var j = 0
          while (j < dim) { m(j) = sums(c)(j) / counts(c); j += 1 }
          m
        }
      }
      it += 1
    }
    cents
  }

  /** Session cache for trained quantizers (centroids / PQ codebooks),
    * keyed by analyzed-plan equality + the training parameters — the
    * [[graft.spark.WoeBinningModel]] fitMedians mechanism applied to
    * ANN training: the result is a pure deterministic function of
    * (data, params), so re-invoking the same training on the same
    * plan (ANN query families share one quantizer; benches and
    * notebooks re-run cells) must not re-pay the sample collect +
    * Lloyd.  CONTRACT (same as fitMedians): plan equality stands in
    * for data equality — if the files behind the plan are overwritten,
    * re-read the DataFrame (a fresh read has a different plan) or the
    * cached quantizer describes the OLD data.  Bounded FIFO so held
    * analyzed plans can't grow without bound.
    */
  private val trainCacheMax = 64
  private val trainCache =
    new scala.collection.mutable.ArrayBuffer[
      (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, AnyRef)]
  private def trainCached[T <: AnyRef](
      df: DataFrame, params: String)(compute: => T): T = {
    val plan = df.queryExecution.analyzed
    trainCache.synchronized {
      trainCache.find(e => e._2 == params && e._1.sameResult(plan))
    } match {
      case Some(e) => e._3.asInstanceOf[T]
      case None =>
        val v = compute
        trainCache.synchronized {
          if (trainCache.size >= trainCacheMax) trainCache.remove(0)
          trainCache += ((plan, params, v))
        }
        v
    }
  }

  /** Drop every cached quantizer (test hook / explicit refresh). */
  def clearTrainingCache(): Unit =
    trainCache.synchronized { trainCache.clear() }

  /** IVF coarse-quantizer centroids from a DETERMINISTIC corpus
    * sample: the `sampleN` smallest ids (total order on the unique id
    * column — a bounded takeOrdered, not a scan-order-dependent RNG
    * sample) + sequential Lloyd.  Unlike MLlib KMeans, whose centroids
    * depend on partition-parallel float summation order, this is
    * bit-reproducible across runs, partition layouts, and engines —
    * which is what lets the IVF query be oracle-checked end-to-end.
    * At 100 TB the sample collect is O(sampleN), not O(corpus).
    * Results are memoized per (plan, params) — see [[trainCached]].
    */
  def deterministicCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, sampleN: Int = 256, iters: Int = 10): Array[Array[Double]] =
    trainCached(corpus, s"cents|$idCol|$vecCol|$nCells|$sampleN|$iters") {
      val rows = corpus
        .select(col(idCol).as("id"), col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
        .filter(col("v").isNotNull && col("nrm") > 0)
        .orderBy("id")
        .limit(sampleN)
        .collect()
      val samples = rows.map(_.getSeq[Any](1).iterator
        .map(_.asInstanceOf[Number].doubleValue).toArray)
      lloydCentroids(samples, nCells, iters)
    }

  /** FULL-CORPUS deterministic Lloyd — the scale path when a
    * `sampleN`-vector sample no longer represents the data (billions
    * of embeddings, many fine cells).  Each iteration assigns every
    * vector to its nearest centroid with the same `array_min`
    * projection the IVF query uses, then recomputes means
    * DISTRIBUTED: per-(cell, dim) sums of `round(v · 2²⁰)` as LONGS.
    * Integer addition is associative-commutative, so the shuffle's
    * combine order — the thing that makes MLlib KMeans centroids
    * drift between runs — cannot change a bit of the result; the mean
    * is one double division of two exact integers on the driver.
    * Quantization to 2⁻²⁰ shifts each mean by < 5e-7 relative to the
    * float-sum mean but identically so on every run, partition
    * layout, and cluster size.
    *
    * Per iteration: one job, one shuffle of at most
    * `partitions × nCells × dim` partial-agg rows (map-side combine),
    * one `nCells × dim`-row collect.  The projected corpus is
    * persisted across iterations and released before returning.
    * Seeds are the `nCells` smallest-id vectors (same total-order
    * determinism as [[deterministicCentroids]]).
    */
  def distributedCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, iters: Int = 10,
      quantScale: Double = 1048576.0): Array[Array[Double]] =
    trainCached(corpus, s"dist|$idCol|$vecCol|$nCells|$iters|$quantScale") {
      distributedCentroidsUncached(corpus, idCol, vecCol, nCells, iters, quantScale)
    }

  private def distributedCentroidsUncached(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, iters: Int,
      quantScale: Double): Array[Array[Double]] = {
    val base = corpus
      .select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"),
        norm(col(vecCol)).as("nrm"))
      .filter(col("v").isNotNull && col("nrm") > 0)
      .select("id", "v")
      .persist()
    try {
      val seedRows = base.orderBy("id").limit(nCells).collect()
      require(seedRows.length >= nCells,
        s"distributedCentroids: need >= $nCells non-null vectors, got ${seedRows.length}")
      var cents = seedRows.map(_.getSeq[Any](1).iterator
        .map(_.asInstanceOf[Number].doubleValue).toArray)
      val dim = cents.head.length
      // ragged vectors (length != dim) drop out like zero-norm rows do
      // — they'd otherwise index qsums out of bounds on the driver or
      // leave per-dim counts unequal (silently skewed means)
      val conform = base.filter(size(col("v")) === dim)
      var it = 0
      while (it < iters) {
        val stats = conform
          .withColumn("cell",
            element_at(nearestCellsExpr(col("v"), cents, 1), 1))
          .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy("cell", "dim")
          .agg(sum(round(col("x") * quantScale).cast("long")).as("qsum"),
            count(lit(1)).as("n"))
          .collect()
        val qsums = Array.fill(nCells)(new Array[Long](dim))
        val counts = new Array[Long](nCells)
        stats.foreach { r =>
          val c = r.getInt(0)
          qsums(c)(r.getInt(1)) = r.getLong(2)
          counts(c) = r.getLong(3)
        }
        cents = Array.tabulate(nCells) { c =>
          if (counts(c) == 0) cents(c)
          else Array.tabulate(dim)(j =>
            qsums(c)(j).toDouble / counts(c).toDouble / quantScale)
        }
        it += 1
      }
      cents
    } finally { base.unpersist(); () }
  }

  /** IVF top-k with caller-supplied centroid LITERALS: corpus vectors
    * are assigned to their nearest cell by an `array_min` over
    * (score, cell) structs (`||c||² − 2·v·c` ranks like squared L2;
    * the `||v||²` term is constant per vector — and the struct min is
    * O(nCells) per row where a full sort would be O(nCells·log nCells)
    * on every corpus row), each query probes its `nProbe`
    * nearest cells, and only those candidates are ranked by exact
    * cosine.  The whole plan is codegen'd expressions + one broadcast
    * probe join — no UDF, no driver loop — and, with
    * [[deterministicCentroids]], replayable bit-for-bit in DuckDB.
    *
    * At 100 TB: the corpus shuffles zero times (assignment is a
    * projection; the probe join broadcasts the small query side), and
    * `nCells` ~ √n keeps candidate sets per probe bounded.
    */
  // retained as the expression-tree parity REFERENCE for
  // NearestCellsParity in OpsSpec (the hot paths use nearestCellsExpr)
  private[graft] def cellScoresFor(centroids: Array[Array[Double]])(vec: Column) =
    centroids.zipWithIndex.map { case (cent, i) =>
      struct(
        (lit(sumSquares(cent)) - lit(2.0) * dot(vec, lit(cent))).as("score"),
        lit(i).as("cell"))
    }

  /** `n` nearest cells as a codegen'd expression over the constant
    * centroid matrix (`graft.functions.NearestCells`) — replaces the
    * per-centroid `sort_array(array(struct…))` fan-out of
    * [[cellScoresFor]] on the assign/probe hot paths: with `autoCells`
    * geometry (√n centroids) the fan-out's C inlined loops exceeded
    * Janino's 64 KB method limit and silently degraded the whole ANN
    * stage to interpreted evaluation.  Bit-identical scores and
    * (score ASC, cell ASC) ordering; OpsSpec pins parity against the
    * struct form, and every q_ann_* oracle re-proves it end-to-end.
    */
  private[graft] def nearestCellsExpr(
      vec: Column, centroids: Array[Array[Double]], n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.NearestCells(
      ColumnBridge.expression(vec), centroids, n))
  }

  /** `(corpus_id, cv, cn, cell)` — the nearest-centroid assignment
    * shared by the in-memory and persisted IVF paths (pure projection,
    * zero shuffle).
    */
  private def assignCells(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      centroids: Array[Array[Double]]): DataFrame =
    corpus.select(col(corpusId).as("corpus_id"),
        col(corpusVec).as("cv"), norm(col(corpusVec)).as("cn"))
      .filter(col("cn") > 0)
      .withColumn("cell",
        element_at(nearestCellsExpr(col("cv"), centroids, 1), 1))

  /** `(query_id, qv, qn, cell)` with one row per probed cell. */
  private def probeCells(
      queries: DataFrame, queryId: String, queryVec: String,
      centroids: Array[Array[Double]], nProbe: Int): DataFrame =
    queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"),
        norm(col(queryVec)).as("qn"))
      .filter(col("qn") > 0)
      .select(col("query_id"), col("qv"), col("qn"),
        explode(nearestCellsExpr(col("qv"), centroids, nProbe)).as("cell"))

  private def rankTopK(cand: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  def ivfTopKWithCentroids(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      centroids: Array[Array[Double]], nProbe: Int = 4, k: Int = 10): DataFrame = {
    val assigned = assignCells(corpus, corpusId, corpusVec, centroids)
    val q = probeCells(queries, queryId, queryVec, centroids, nProbe)
    val cand = assigned.join(broadcast(q), "cell")
      .select(col("query_id"), col("corpus_id"),
        (dot(col("cv"), col("qv")) / (col("cn") * col("qn"))).as("cosine"))
    rankTopK(cand, k)
  }

  /** Deterministic ±1/√outDim sign matrix for random projection
    * (Achlioptas, "Database-friendly random projections", JPDC 2003:
    * sign entries preserve pairwise distances like Gaussians do).
    * Each sign is the PARITY OF AN MD5 BYTE of `"salt:i:j"` — no RNG
    * state, so the matrix is a pure function of (dim, outDim, salt)
    * and any engine rebuilds it bit-for-bit.
    */
  def signProjectionMatrix(
      dim: Int, outDim: Int, salt: String): Array[Array[Double]] = {
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    Array.tabulate(outDim) { j =>
      Array.tabulate(dim) { i =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$salt:$i:$j".getBytes("UTF-8"))
        if ((md(0) & 1) == 0) scale else -scale
      }
    }
  }

  /** Project vectors onto the rows of a literal matrix (typically
    * [[signProjectionMatrix]]) — dimensionality reduction as a PURE
    * PROJECTION: each output coordinate is one sequential dot fold
    * against a shipped literal row, so there is no shuffle, no
    * training pass, and the result replays bit-for-bit externally.
    * At 100 TB this is the storage/bandwidth lever BEFORE any ANN
    * structure: 64→16 dims cuts every downstream scan 4× while
    * approximately preserving cosine geometry (JL lemma), and the
    * projected column feeds the LSH/IVF machinery unchanged.
    */
  def randomProject(
      df: DataFrame, idCol: String, vecCol: String,
      matrix: Array[Array[Double]]): DataFrame =
    df.select(col(idCol).as("id"),
      array(matrix.map(row => dot(col(vecCol), lit(row))): _*).as("proj"))

  /** DATA-AWARE dimensionality reduction: top-`k` principal axes of a
    * deterministic corpus sample — the [[deterministicCentroids]]
    * sample discipline applied to PCA.  The `sampleN` smallest-id
    * vectors are collected, mean-centered, and their covariance
    * eigen-decomposed on the driver (commons-math3, symmetric
    * Jacobi-class solver — deterministic for a fixed matrix); axes are
    * ordered by (eigenvalue DESC, index) and sign-canonicalized (the
    * largest-|component| entry made positive), so the basis is UNIQUE
    * and bit-reproducible across runs and JVMs — fixture/oracle
    * material like the IVF centroids.  At 100 TB the collect is
    * O(sampleN·dim), the eigensolve O(dim³) driver work, and the
    * projection a pure expression over the corpus.  Memoized per
    * (plan, params) like the other trained quantizers.
    *
    * Returns (mean, basis rows k×dim).
    */
  def pcaBasis(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, sampleN: Int = 256): (Array[Double], Array[Array[Double]]) =
    trainCached(df, s"pca|$idCol|$vecCol|$k|$sampleN") {
      val rows = df
        .select(col(idCol).as("id"), col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
        .filter(col("v").isNotNull && col("nrm") > 0)
        .orderBy("id")
        .limit(sampleN)
        .collect()
      val samples = rows.map(_.getSeq[Any](1).iterator
        .map(_.asInstanceOf[Number].doubleValue).toArray)
      require(samples.length >= 2, s"pcaBasis: need >= 2 vectors, got ${samples.length}")
      val dim = samples.head.length
      require(k >= 1 && k <= dim, s"pcaBasis: k=$k not in [1, $dim]")
      val n = samples.length
      val mean = new Array[Double](dim)
      samples.foreach { s => var i = 0; while (i < dim) { mean(i) += s(i); i += 1 } }
      locally { var i = 0; while (i < dim) { mean(i) /= n; i += 1 } }
      // sequential accumulation in sample (id) order — deterministic
      val cov = Array.ofDim[Double](dim, dim)
      samples.foreach { s =>
        var i = 0
        while (i < dim) {
          val di = s(i) - mean(i)
          var j = i
          while (j < dim) { cov(i)(j) += di * (s(j) - mean(j)); j += 1 }
          i += 1
        }
      }
      var i = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          cov(i)(j) /= (n - 1); cov(j)(i) = cov(i)(j); j += 1
        }
        i += 1
      }
      val eig = new org.apache.commons.math3.linear.EigenDecomposition(
        new org.apache.commons.math3.linear.Array2DRowRealMatrix(cov, false))
      val order = (0 until dim)
        .sortBy(j => (-eig.getRealEigenvalue(j), j))
      val basis = order.take(k).map { j =>
        val v = eig.getEigenvector(j).toArray
        // unique sign: the largest-|component| entry (first on ties)
        // points positive
        var best = 0
        var bi = 1
        while (bi < v.length) {
          if (math.abs(v(bi)) > math.abs(v(best))) best = bi
          bi += 1
        }
        if (v(best) < 0) v.map(x => -x) else v
      }.toArray
      (mean, basis)
    }

  /** Project onto a [[pcaBasis]]: output coordinate j is
    * `v·bⱼ − mean·bⱼ`, with `mean·bⱼ` folded to ONE literal per axis
    * on the driver — so the per-row work is the same literal dot fold
    * as [[randomProject]] (no shuffle, no training pass in the plan)
    * and the whole projection replays bit-for-bit in an external
    * engine given the basis literals.
    */
  def pcaProject(
      df: DataFrame, idCol: String, vecCol: String,
      mean: Array[Double], basis: Array[Array[Double]]): DataFrame = {
    val offsets = pcaOffsets(mean, basis)
    df.select(col(idCol).as("id"),
      array(basis.zip(offsets).map { case (b, o) =>
        dot(col(vecCol), lit(b)) - lit(o)
      }: _*).as("proj"))
  }

  /** The per-axis `mean·bⱼ` offsets [[pcaProject]] subtracts — ONE
    * ascending-index fold shared with the oracle builder, because the
    * replay contract is bit-identity: a second implementation whose
    * accumulation order drifted would fail only at verify time as a
    * confusing float mismatch.
    */
  def pcaOffsets(
      mean: Array[Double], basis: Array[Array[Double]]): Array[Double] =
    basis.map { b =>
      var s = 0.0; var i = 0
      while (i < b.length) { s += mean(i) * b(i); i += 1 }
      s
    }

  /** Persist the IVF-assigned corpus as a CELL-PARTITIONED parquet
    * index: one directory per Voronoi cell, vectors + precomputed
    * norms inside.  Build once, probe forever — the index write is the
    * only pass over the corpus, and every later query batch touches
    * only its probed cells ([[ivfTopKFromIndex]]).
    */
  def saveIvfIndex(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      centroids: Array[Array[Double]], path: String): Unit =
    assignCells(corpus, corpusId, corpusVec, centroids)
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Append a NEW batch of vectors to an existing [[saveIvfIndex]]
    * index — daily-ingest maintenance without re-scanning the corpus.
    * The batch is assigned with the SAME centroid literals the index
    * was built with, so appended rows land in the correct cell
    * directories and every later [[ivfTopKFromIndex]] probe sees the
    * union exactly as if the whole corpus had been indexed at once
    * (the spec pins base+delta == full-build row-for-row).  Centroids
    * staying fixed is the standard IVF maintenance contract: re-learn
    * and rebuild only when assignment drift warrants it — and
    * [[distributedCentroids]] re-learned bit-deterministically tells
    * you exactly when that is (compare the arrays).
    */
  def appendIvfIndex(
      batch: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], path: String): Unit =
    assignCells(batch, idCol, vecCol, centroids)
      .write.mode("append").partitionBy("cell").parquet(path)

  /** STREAMING index maintenance: every micro-batch of arriving
    * vectors is assigned with the fixed centroid literals and written to the
    * cell-partitioned index — the embedding firehose lands straight
    * into the probe-ready layout, no batch re-index job.  Each batch
    * OVERWRITES its own `batch=<id>` subdirectory, so a micro-batch
    * replayed after a crash (foreachBatch's at-least-once contract)
    * lands on the same path instead of appending duplicates —
    * idempotent per batch id, hence exactly-once index content
    * (spec-pinned equal to the batch build).  Readers see `batch` as
    * one more partition column; cell pruning is unaffected.
    * Returns the started query; callers own its lifecycle.
    */
  def streamIntoIvfIndex(
      stream: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], path: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        assignCells(batch, idCol, vecCol, centroids)
          .write.mode("overwrite").partitionBy("cell")
          .parquet(s"$path/batch=$batchId")
      }
      .start()

  /** ANN top-k against a [[saveIvfIndex]] index WITHOUT touching the
    * unprobed corpus: the probed cell set (≤ |queries|·nProbe ids,
    * small by the same contract that broadcasts the query side) turns
    * into a static `cell IN (...)` predicate on the partition column,
    * so the scan PRUNES to the probed directories at planning time —
    * at 100 TB with √n cells, a query batch reads ~nProbe/√n of the
    * index from disk instead of all of it (OpsSpec pins the
    * PartitionFilters plan property and result equality with the
    * in-memory path).
    */
  def ivfTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, queryId: String, queryVec: String,
      centroids: Array[Array[Double]], nProbe: Int = 4, k: Int = 10): DataFrame = {
    val q = probeCells(queries, queryId, queryVec, centroids, nProbe)
    val cells = q.select("cell").distinct().collect().map(_.getInt(0))
    val assigned = spark.read.parquet(path)
      .where(col("cell").isInCollection(cells.map(Int.box)))
    val cand = assigned.join(broadcast(q), "cell")
      .select(col("query_id"), col("corpus_id"),
        (dot(col("cv"), col("qv")) / (col("cn") * col("qn"))).as("cosine"))
    rankTopK(cand, k)
  }

  // ------------------------------------------------ product quantization

  /** Per-subspace deterministic codebooks for product quantization
    * (Jégou et al., "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011): the [[deterministicCentroids]] sample
    * discipline — `sampleN` smallest ids, sequential Lloyd — applied
    * independently to each of the `m` vector subspaces.  Returns
    * `[m][ksub][dim/m]`, shipped as LITERALS like the IVF centroids,
    * so encode/score plans are pure projections and the whole path
    * replays bit-for-bit in an external engine.
    */
  def pqCodebooks(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, ksub: Int = 16, sampleN: Int = 256,
      iters: Int = 10): Array[Array[Array[Double]]] =
    trainCached(corpus, s"pq|$idCol|$vecCol|$m|$ksub|$sampleN|$iters") {
      val rows = corpus
        .select(col(idCol).as("id"), col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
        .filter(col("v").isNotNull && col("nrm") > 0)
        .orderBy("id")
        .limit(sampleN)
        .collect()
      val samples = rows.map(_.getSeq[Any](1).iterator
        .map(_.asInstanceOf[Number].doubleValue).toArray)
      val dim = samples.head.length
      require(dim % m == 0, s"pqCodebooks: dim=$dim not divisible by m=$m")
      val sub = dim / m
      Array.tabulate(m)(s =>
        lloydCentroids(samples.map(_.slice(s * sub, (s + 1) * sub)), ksub, iters))
    }

  /** `(id, codes)` — each vector compressed to its per-subspace
    * nearest-codeword indices (`array<int>` of length m: 4·dim bytes
    * → m small ints, 32× at dim=64/m=8).  Pure projection — the
    * argmin per subspace is the same `array_min`-over-(score, code)
    * structs as the IVF assignment, O(ksub) per subspace per row.
    * Null/zero-norm vectors are dropped (nothing to quantize).
    */
  /** `array<int>` of per-subspace nearest-codeword indices for `vec`
    * — the PQ code word as a pure expression (shared by the encode,
    * ADC, and IVF-PQ paths).
    */
  private def pqCodesOf(
      vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.PqCodes(
      ColumnBridge.expression(vec), codebooks))
  }

  /** The original per-codeword expression-tree encode, retained as the
    * parity REFERENCE for PqCodes (OpsSpec): m × ksub struct+dot terms
    * grow generated code linearly in the codebook and cross Janino's
    * 64 KB method limit at production ksub — the hot path uses the
    * constant-codebook expression above.
    */
  private[graft] def pqCodesExprTree(
      vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val sub = codebooks.head.head.length
    def codeFor(s: Int): Column = {
      val vs = slice(vec, s * sub + 1, sub)
      array_min(array(codebooks(s).zipWithIndex.map { case (cw, j) =>
        struct(
          (lit(sumSquares(cw)) - lit(2.0) * dot(vs, lit(cw))).as("score"),
          lit(j).as("code"))
      }: _*)).getField("code")
    }
    array(codebooks.indices.map(codeFor): _*)
  }

  /** Per-subspace ADC terms against a `codes` column, with the query
    * subvector as a COLUMN expression — `||q_s||² − 2·q_s·cw +
    * ||cw||²` accumulated left-to-right (every piece a literal lookup
    * or a sequential dot fold, so external engines replay the bits).
    */
  private def adcExpr(
      qVec: Column, codes: Column,
      codebooks: Array[Array[Array[Double]]]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.PqAdc(
      ColumnBridge.expression(qVec), ColumnBridge.expression(codes), codebooks))
  }

  /** The original ADC expression tree, retained as the parity
    * REFERENCE for PqAdc (OpsSpec); see [[pqCodesExprTree]].
    */
  private[graft] def adcExprTree(
      qVec: Column, codes: Column,
      codebooks: Array[Array[Array[Double]]]): Column = {
    val sub = codebooks.head.head.length
    codebooks.indices.map { s =>
      val qs = slice(qVec, s * sub + 1, sub)
      val codeIdx = element_at(codes, s + 1) + 1
      val recon = element_at(array(codebooks(s).map(cw => lit(cw)): _*), codeIdx)
      dot(qs, qs) - lit(2.0) * dot(qs, recon) +
        element_at(lit(codebooks(s).map(sumSquares)), codeIdx)
    }.reduceLeft(_ + _)
  }

  def pqEncode(
      corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    corpus
      .select(col(idCol).as("id"), col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
      .filter(col("v").isNotNull && col("nrm") > 0)
      .select(col("id"), pqCodesOf(col("v"), codebooks).as("codes"))

  /** Exhaustive ADC (asymmetric distance computation) top-k over PQ
    * codes: every corpus vector participates as its m-code row; each
    * query scores a row by looking up the reconstructed codeword per
    * subspace and accumulating `||q_s||² − 2·q_s·cw + ||cw||²` in a
    * FIXED left-to-right subspace order (each piece a literal or a
    * sequential dot fold — so an external engine replays the same
    * float bits).  ONE scan of the encoded corpus produces every
    * query's scores via an inline per-row struct explode, then the
    * usual WindowGroupLimit rank shape selects k.
    *
    * At 100 TB this is the memory-bandwidth play: the scan reads m
    * codes per vector instead of 4·dim bytes of floats (32× at
    * dim=64/m=8), which is what makes exhaustive scanning of a
    * compressed corpus feasible; compose with the IVF cell filter for
    * IVF-PQ when even the compressed scan is too much.  Queries are
    * collected driver-side (small by the ANN contract, like
    * [[bruteForceTopK]]).
    */
  def pqTopKADC(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      codebooks: Array[Array[Array[Double]]], k: Int = 10): DataFrame = {
    val encoded = pqEncode(corpus, corpusId, corpusVec, codebooks)
    val qData = queries
      .select(col(queryId).as("qid"), col(queryVec).as("qv"),
        norm(col(queryVec)).as("qn"))
      .filter(col("qv").isNotNull && col("qn") > 0)
      .orderBy("qid")
      .collect()
      .map(r => (r.get(0), r.getSeq[Any](1).iterator
        .map(_.asInstanceOf[Number].doubleValue).toArray))
    // the query vector is a LITERAL here (driver-collected), so the
    // whole per-query ADC is one PqAdc call — bit-equal to the old
    // inline form (its lit(sumSquares(qs)) pre-accumulation is the
    // same left-to-right fold PqAdc's dotQQ performs)
    def adcFor(qv: Array[Double]): Column =
      adcExpr(lit(qv), col("codes"), codebooks)
    val perQuery = qData.map { case (qid, qv) =>
      struct(lit(qid).as("query_id"), adcFor(qv).as("adc"))
    }
    val cand = encoded
      .select(col("id").as("corpus_id"), explode(array(perQuery: _*)).as("q"))
      .select(col("q.query_id"), col("corpus_id"), col("q.adc"))
    rankByAdc(cand, k)
  }

  /** IVF-PQ — the production ANN composition: the IVF coarse
    * quantizer prunes the corpus to each query's `nProbe` probed
    * cells, then PQ codes stand in for the pruned vectors under the
    * ADC score.  One corpus projection computes BOTH the cell
    * assignment and the code word; the probe join broadcasts the
    * query side (ivfTopKWithCentroids' shape); the ADC runs with the
    * query vector as a column, so nothing is collected beyond the
    * centroid/codebook literals.  At 100 TB the scan touches
    * ~nProbe/nCells of the corpus AND reads codes instead of floats —
    * the two levers multiply.  Fully deterministic given
    * [[deterministicCentroids]] + [[pqCodebooks]], hence
    * oracle-replayable end-to-end.
    *
    * `refine > 0` adds the standard IVF-PQ refinement step: the ADC
    * ranking keeps a `k·refine` shortlist per query, whose EXACT
    * cosine is then recomputed from the float vectors and re-ranked
    * to the final k (output columns become `cosine`/`rank`, matching
    * the exact flavors).  ADC quantization error stops costing recall
    * — RecallSpec measures the lift — while the exact math touches
    * only shortlist rows: the shortlist broadcasts and the corpus is
    * semi-join-filtered by it, so no corpus shuffle and no second
    * probe.  Default 0 keeps the pure-ADC ranking (the oracled
    * bit-replayable flavor).
    */
  def ivfPqTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      nProbe: Int = 4, k: Int = 10, refine: Int = 0): DataFrame = {
    val assigned = assignCells(corpus, corpusId, corpusVec, centroids)
      .select(col("corpus_id"), col("cell"),
        pqCodesOf(col("cv"), codebooks).as("codes"))
    val q = probeCells(queries, queryId, queryVec, centroids, nProbe)
    val cand = assigned.join(broadcast(q), "cell")
      .select(col("query_id"), col("corpus_id"),
        adcExpr(col("qv"), col("codes"), codebooks).as("adc"))
    if (refine <= 0) rankByAdc(cand, k)
    else {
      val c = corpus.select(col(corpusId).as("corpus_id"),
          col(corpusVec).as("cv"), norm(col(corpusVec)).as("cn"))
        .filter(col("cn") > 0)
      exactReRank(c, rankByAdc(cand, k * refine),
        queries, queryId, queryVec, k)
    }
  }

  /** Exact-cosine re-rank of an ADC shortlist: the float rows are
    * semi-join-filtered by the BROADCAST shortlist (so the float
    * source is never shuffled), one cosine per surviving row, final
    * (cosine DESC, corpus_id) window cut to k.  ONE implementation
    * shared by the in-memory and hybrid-index refine paths — their
    * row-for-row equality is a spec-pinned invariant that must not
    * drift through divergent copies.
    */
  private def exactReRank(
      floats: DataFrame, shortlist: DataFrame,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val qv = queries.select(col(queryId).as("query_id"),
        col(queryVec).as("qv"), norm(col(queryVec)).as("qn"))
      .filter(col("qn") > 0)
    val exact = floats
      .join(broadcast(shortlist.select("query_id", "corpus_id")), "corpus_id")
      .join(broadcast(qv), "query_id")
      .select(col("query_id"), col("corpus_id"),
        (dot(col("cv"), col("qv")) / (col("cn") * col("qn"))).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** Rank candidates by ascending ADC distance (ties on corpus id). */
  private def rankByAdc(cand: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("corpus_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "adc", "rank")
  }

  /** Persist the IVF-PQ index: cell-partitioned parquet holding ONLY
    * `(corpus_id, codes)` — the on-disk ANN shape for 100 TB corpora.
    * Compared to [[saveIvfIndex]] the stored rows shrink ~32×
    * (m small ints instead of dim floats + norm), so the same probed
    * cells cost ~1/32 the disk read on every later query batch; the
    * float corpus is only ever scanned ONCE, at build time.
    */
  def saveIvfPqIndex(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], path: String): Unit =
    assignCells(corpus, corpusId, corpusVec, centroids)
      .select(col("corpus_id"), col("cell"),
        pqCodesOf(col("cv"), codebooks).as("codes"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** ADC top-k against a [[saveIvfPqIndex]] index: the probed cell
    * set becomes a static partition-pruning predicate (the
    * [[ivfTopKFromIndex]] mechanism), and the pruned scan reads codes,
    * not vectors — the two levers multiply ON DISK exactly as
    * [[ivfPqTopK]] multiplies them in memory.  Scores are identical
    * to the in-memory path (same adcExpr over the same codes).
    *
    * `refine > 0` is the production HYBRID-INDEX shape: the code index
    * drives the cheap ADC scan, then the `k·refine` shortlist fetches
    * its float vectors from a [[saveIvfIndex]] float index at
    * `floatIndexPath` (required) for the exact cosine re-rank.  The
    * float fetch is pruned to the SAME probed cells (shortlist members
    * live there by construction) and semi-join-filtered by the
    * broadcast shortlist — so per query batch the disk reads are
    * probed-cell codes + probed-cell floats-for-shortlist, never the
    * corpus.  Output columns switch to `cosine`/`rank`, matching the
    * in-memory refine flavor.
    */
  def ivfPqTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, queryId: String, queryVec: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      nProbe: Int = 4, k: Int = 10, refine: Int = 0,
      floatIndexPath: Option[String] = None): DataFrame = {
    val q = probeCells(queries, queryId, queryVec, centroids, nProbe)
    val cells = q.select("cell").distinct().collect().map(_.getInt(0))
    val assigned = spark.read.parquet(path)
      .where(col("cell").isInCollection(cells.map(Int.box)))
    val cand = assigned.join(broadcast(q), "cell")
      .select(col("query_id"), col("corpus_id"),
        adcExpr(col("qv"), col("codes"), codebooks).as("adc"))
    if (refine <= 0) rankByAdc(cand, k)
    else {
      val fip = floatIndexPath.getOrElse(sys.error(
        "ivfPqTopKFromIndex: refine > 0 needs floatIndexPath (a saveIvfIndex dir)"))
      val floats = spark.read.parquet(fip)
        .where(col("cell").isInCollection(cells.map(Int.box)))
        .select(col("corpus_id"), col("cv"), col("cn"))
      exactReRank(floats, rankByAdc(cand, k * refine),
        queries, queryId, queryVec, k)
    }
  }

  /** Mean-pooled per-group centroids in the EXACT-INTEGER domain: each
    * element quantizes to `round(v * scale)` (scale a power of two, so
    * the scaling itself is exact double math), the per-(group, dim)
    * sums are exact BIGINTs, and the centroid is one deterministic
    * division — no float-summation order anywhere, so the result is
    * identical on any partitioning and replayable by any engine.
    * (A float `avg` over array elements would be partition-order
    * dependent — unusable as a hash-gated surface and irreproducible
    * across runs at scale.)
    *
    * Scale shape: posexplode → groups×dims keyed aggregate with
    * map-side partial aggregation — the shuffle carries
    * |groups|·dim rows per map partition, not the corpus.  The usual
    * consumers (IVF coarse quantizers, per-language balance stats)
    * have |groups| ≪ corpus.
    */
  def groupCentroids(
      df: DataFrame, groupCol: String, vecCol: String,
      scale: Int = 64): DataFrame = {
    require(scale > 0 && (scale & (scale - 1)) == 0,
      s"scale must be a positive power of two for exact quantization: $scale")
    df.select(col(groupCol).as("grp"),
        posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("grp"), col("dim"),
        round(col("v").cast("double") * lit(scale)).cast("long").as("q"))
      .groupBy("grp", "dim")
      .agg(sum("q").as("sum_q"), count(lit(1)).as("n"))
      .select(col("grp"), col("dim").cast("long").as("dim"),
        col("sum_q"), col("n"),
        (col("sum_q").cast("double") / (col("n") * lit(scale))).as("centroid"))
  }

  /** `bits` for a target expected bucket population: 2^bits sign-LSH
    * buckets hold ~n/2^bits vectors each, so bits ≈
    * log₂(n/targetBucket).  A FIXED bits is a recall/cost knob that
    * silently degrades as the corpus grows — at 10⁹ vectors, bits=8
    * makes every probe scan ~n/256 candidates × (bits+1) probes ≈ 3.5%
    * of the corpus per query.  Capped at `maxBits` (probe count grows
    * with bits; 2^24 buckets is past any realistic executor count).
    */
  def autoBits(corpusCount: Long, targetBucket: Long = 1024L, maxBits: Int = 24): Int = {
    require(targetBucket > 0, s"targetBucket must be positive: $targetBucket")
    var bits = 1
    while (bits < maxBits && (corpusCount >> bits) > targetBucket) bits += 1
    bits
  }

  /** IVF cell count for a corpus size — the deployment knob the sf10
    * bench identified (BENCH_sf10.json: q_ann_topk_ivfpq tracks corpus
    * growth because probe cost ∝ corpus/nCells at FIXED geometry; a
    * real deployment re-trains with more cells as the corpus grows).
    * The classic sizing is cells ≈ √n (per-cell population √n too, so
    * probe work per query grows as √n instead of n), clamped to
    * [minCells, maxCells] — the cap keeps the coarse-quantizer scan
    * (queries × cells distance evaluations, and the Lloyd training
    * sample ≥ 4·cells) bounded.  RecallSpec pins that recall HOLDS
    * across this knob (nCells ∈ {16, 64, 256} at constant probe
    * fraction), so resizing is a pure cost move.
    */
  def autoCells(
      corpusCount: Long, minCells: Int = 16, maxCells: Int = 65536): Int = {
    require(minCells > 0 && maxCells >= minCells,
      s"bad cell bounds: [$minCells, $maxCells]")
    val root = math.sqrt(math.max(0L, corpusCount).toDouble).toLong
    math.min(maxCells.toLong, math.max(minCells.toLong, root)).toInt
  }

  /** IVF-flavored top-k: assign corpus vectors to the nearest of
    * `nCells` LSH-bucket centroids is overkill without kmeans; the
    * pragmatic scale path re-uses sign-LSH — probe the query's bucket
    * plus single-bit-flip neighbors (multi-probe) and rank only those
    * candidates.
    *
    * `bits <= 0` (the default) auto-sizes from a corpus count
    * ([[autoBits]]; one extra count job — cheap against the scan the
    * probe join does anyway) so bucket population tracks
    * `targetBucket` at any scale.  An explicit `bits` is honored
    * as-is with NO count job (a 100 TB corpus should not pay a full
    * scan for a log line) — top-k recall is bits-dependent, so
    * silently re-sizing an explicit value would change results;
    * callers pinning `bits` own the sizing, and [[autoBits]] is the
    * one-liner to derive it from a known corpus size.
    *
    * @note BEHAVIORAL CHANGE vs pre-r4 releases: the default was a
    *       fixed `bits = 8`; it is now `bits = 0` (auto).  Callers who
    *       relied on the old default get auto-sized recall plus one
    *       corpus `count()` job per call — pass `bits = 8` explicitly
    *       to restore the old behavior exactly.
    */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      bits: Int = 0, dim: Int = 64, k: Int = 10,
      targetBucket: Long = 1024L): DataFrame = {
    val b = if (bits <= 0) autoBits(corpus.count(), targetBucket) else bits
    lshTopKImpl(corpus, corpusId, corpusVec, queries, queryId, queryVec, b, dim, k)
  }

  private def lshTopKImpl(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      bits: Int, dim: Int, k: Int): DataFrame = {
    val c = corpus.select(col(corpusId).as("corpus_id"), col(corpusVec).as("cv"),
        norm(col(corpusVec)).as("cn"),
        lshBucket(col(corpusVec), bits, dim).as("bucket"))
      .filter(col("cn") > 0) // zero-norm: no direction; ANSI-safe
    // multi-probe: own bucket + all 1-bit flips
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"),
        norm(col(queryVec)).as("qn"),
        lshBucket(col(queryVec), bits, dim).as("qbucket"))
      .filter(col("qn") > 0)
      .select(col("query_id"), col("qv"), col("qn"),
        explode(array((0 to bits).map { i =>
          if (i == 0) col("qbucket")
          else col("qbucket").bitwiseXOR(shiftleft(lit(1L), i - 1))
        }: _*)).as("bucket"))
    val cand = c.join(broadcast(q), "bucket")
      .select(col("query_id"), col("corpus_id"),
        (dot(col("cv"), col("qv")) / (col("cn") * col("qn"))).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** Contrastive training-pair mining: for each anchor vector, the
    * `kPos` most-similar SAME-label neighbors (the positives, self
    * excluded) and the `kNeg` most-similar DIFFERENT-label neighbors
    * (the HARD negatives — similar yet wrong, the examples that
    * actually move an embedding model / reranker; random negatives are
    * trivially separable and teach nothing).
    *
    * Same execution shape as [[bruteForceTopK]]: anchors (id, vector,
    * norm, label) are collected + broadcast, each corpus partition
    * reduces itself to ≤ kPos+kNeg candidates per anchor with bounded
    * heaps — one pos heap, one neg heap — before anything shuffles, so
    * the rank window sees partitions × anchors × (kPos+kNeg) rows and
    * the corpus itself never moves.  For anchor sets too big to
    * broadcast, mine from an over-fetched IVF shortlist
    * ([[ivfPqTopK]] with k ≫ kPos+kNeg) and filter by label — the
    * shortlist must over-fetch because a label filter AFTER an exact-k
    * cut can starve one relation.
    *
    * Output: (anchor_id, pair_id, relation 'pos'|'neg', cosine, rank)
    * with rank windowed per (anchor, relation).
    */
  def minePairs(
      corpus: DataFrame, idCol: String, vecCol: String, labelCol: String,
      anchors: DataFrame, kPos: Int = 5, kNeg: Int = 5): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}
    val spark = corpus.sparkSession
    val aData: Array[(Any, Array[Double], Double, Any)] = anchors
      .select(col(idCol).as("aid"), col(vecCol).as("av"), col(labelCol).as("al"))
      .filter(col("av").isNotNull)
      .collect()
      .map { r =>
        val v = r.getSeq[Any](1).iterator
          .map(x => if (x == null) Double.NaN else x.asInstanceOf[Number].doubleValue)
          .toArray
        (r.get(0), v, math.sqrt(dotSeq(v, v)), r.get(2))
      }
      .filter(_._3 > 0)
    val ab = spark.sparkContext.broadcast(aData)
    val outSchema = StructType(Seq(
      StructField("anchor_id", anchors.schema(idCol).dataType),
      StructField("pair_id", corpus.schema(idCol).dataType),
      StructField("relation", StringType),
      StructField("cosine", DoubleType)))
    val (kp, kn) = (kPos, kNeg)
    val cand = corpus
      .select(col(idCol).as("cid"), col(vecCol).as("cv"), col(labelCol).as("cl"))
      .filter(col("cv").isNotNull)
      .mapPartitions { it =>
        val as = ab.value
        val worstFirst = new Ordering[(Double, Any)] {
          def compare(a: (Double, Any), b: (Double, Any)): Int = {
            val c = java.lang.Double.compare(b._1, a._1)
            if (c != 0) c else cmpId(a._2, b._2)
          }
        }
        def newHeaps() = Array.fill(as.length)(
          scala.collection.mutable.PriorityQueue.empty[(Double, Any)](worstFirst))
        val pos = newHeaps()
        val neg = newHeaps()
        it.foreach { r =>
          val cid = r.get(0)
          val cv = r.getSeq[Any](1).iterator
            .map(x => if (x == null) Double.NaN else x.asInstanceOf[Number].doubleValue)
            .toArray
          val cl = r.get(2)
          val cn = math.sqrt(dotSeq(cv, cv))
          if (cn > 0) {
            var ai = 0
            while (ai < as.length) {
              val (aid, av, an, al) = as(ai)
              val samePair = cmpId(cid, aid) == 0
              val (heap, cap) =
                if (cl == al) (pos(ai), kp) else (neg(ai), kn)
              if (!samePair && cap > 0) {
                val cos = dotSeq(cv, av) / (cn * an)
                if (heap.size < cap) heap.enqueue((cos, cid))
                else {
                  val (wc, wid) = heap.head
                  if (cos > wc || (cos == wc && cmpId(cid, wid) < 0)) {
                    heap.dequeue(); heap.enqueue((cos, cid))
                  }
                }
              }
              ai += 1
            }
          }
        }
        (pos.iterator.zipWithIndex.map { case (h, ai) => (h, ai, "pos") } ++
          neg.iterator.zipWithIndex.map { case (h, ai) => (h, ai, "neg") })
          .flatMap { case (h, ai, rel) =>
            h.iterator.map { case (cos, cid) => Row(as(ai)._1, cid, rel, cos) }
          }
      }(Encoders.row(outSchema))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("anchor_id"), col("relation"))
      .orderBy(col("cosine").desc, col("pair_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter((col("relation") === "pos" && col("rank") <= kPos) ||
        (col("relation") === "neg" && col("rank") <= kNeg))
      .select("anchor_id", "pair_id", "relation", "cosine", "rank")
  }

  /** ColBERT-style LATE-INTERACTION retrieval (MaxSim): documents and
    * queries are BAGS of vectors (one per token/segment), and
    * `score(Q, D) = Σ_{q∈Q} max_{d∈D} cos(q, d)` — each query facet
    * matches its best-supporting doc vector independently, which is
    * what single-vector cosine (one pooled embedding per doc) cannot
    * express.
    *
    * Shape: query vectors are the broadcast side; the per-(query-doc,
    * query-vec, doc) max and the per-(query-doc, doc) sum are ordinary
    * aggregations with map-side combine.  The facet sum folds in
    * EXPLICIT query-vector order (`sort_array` + `aggregate`) — an
    * order-free float `sum()` would break the bit-replay discipline
    * the oracle queries rely on.
    *
    * Returns `(query_group, doc_group, maxsim, rank)`, top-k doc
    * groups per query group.
    */
  def maxSimTopK(
      docVecs: DataFrame, docGroupCol: String, vecCol: String,
      queryVecs: DataFrame, queryGroupCol: String, queryVecIdCol: String,
      k: Int = 5): DataFrame = {
    def prep(df: DataFrame, cols: Seq[(String, String)]) = {
      val v = transform(col(vecCol), x => x.cast("double"))
      df.select(cols.map { case (c, a) => col(c).as(a) } :+ v.as("__v"): _*)
        .withColumn("__n", sqrt(dot(col("__v"), col("__v"))))
        .where(col("__n") > 0)
    }
    val c = prep(docVecs, Seq(docGroupCol -> "dg"))
    val q = prep(queryVecs, Seq(queryGroupCol -> "qg", queryVecIdCol -> "qv"))
      .withColumnRenamed("__v", "__qvv").withColumnRenamed("__n", "__qn")
    val best = c.crossJoin(broadcast(q))
      .select(col("qg"), col("qv"), col("dg"),
        (dot(col("__v"), col("__qvv")) / (col("__n") * col("__qn"))).as("cos"))
      .groupBy("qg", "qv", "dg")
      .agg(max("cos").as("mc"))
    val scored = best
      .groupBy("qg", "dg")
      .agg(sort_array(collect_list(struct(col("qv"), col("mc")))).as("__l"))
      .withColumn("maxsim",
        expr("aggregate(__l, cast(0.0 as double), (a, x) -> a + x.mc)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qg")).orderBy(col("maxsim").desc, col("dg").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qg").as("query_group"), col("dg").as("doc_group"),
        col("maxsim"), col("rank"))
  }

  /** Per-label mean-pooled centroids (class prototypes) in QUANTIZED
    * integer space — the embedding-pooling op behind prototype
    * classifiers, semantic-dedup cluster centers, and class-balanced
    * mixture design.  A float mean over millions of rows depends on
    * addition order; quantizing each component to `floor(x·scale)`
    * first makes the per-(label, dim) sum an exact integer (order-free
    * under any partitioning — the engine's determinism bar) and the
    * mean one terminal division.  With scale 10⁶ the quantization
    * error (≤1e-6 per component) is far below float32 embedding noise.
    *
    * Long shape — one row per (label, dim) from a posexplode — so one
    * hash-aggregate handles any dimensionality without a 2·d-column
    * schema; map-side partial aggregation collapses each partition to
    * O(labels × dims) rows before the shuffle.
    */
  def quantizedLabelCentroids(
      df: DataFrame, labelCol: String, vecCol: String,
      scale: Long = 1000000L): DataFrame = {
    require(scale > 0, s"quantizedLabelCentroids: scale=$scale")
    df.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("label"), col("dim").cast("long").as("dim"),
        floor(col("x").cast("double") * scale).cast("long").as("qx"))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"), sum("qx").as("q_sum"))
      .withColumn("q_mean", col("q_sum").cast("double") / col("n"))
  }
}
