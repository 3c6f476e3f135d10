package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training pipelines.
  *
  * The assignment is a pure function of (id, salt): stable across
  * runs, engines, repartitions, and incremental re-ingestion — the
  * property `rand()`-based sampling lacks (a re-run reshuffles every
  * row's fate, silently leaking val docs into train).  Pure per-row
  * projection: no shuffle, no state, embarrassingly parallel.
  */
object SampleOps {

  val DefaultBuckets = 10000

  /** Portable bucket in [0, buckets): md5-derived 60-bit hash of
    * "id:salt", mod buckets — the same arithmetic any engine (or the
    * DuckDB oracle) reproduces exactly.  The salt decorrelates splits
    * drawn for different purposes from the same ids.
    */
  def hashBucket(id: Column, salt: String, buckets: Int = DefaultBuckets): Column =
    pmod(DedupOps.md5Hash60(concat(id.cast("string"), lit(":" + salt))),
      lit(buckets.toLong))

  /** [[hashBucket]] that FAILS on a null id instead of propagating
    * null — a null bucket would silently fall through every split
    * threshold into the last split (or silently vanish from a
    * sample), which is exactly the kind of quiet skew a deterministic
    * splitter exists to prevent.
    */
  private def checkedBucket(id: Column, salt: String): Column =
    coalesce(hashBucket(id, salt),
      raise_error(lit("hashSplit/deterministicSample: null id")).cast("long"))

  /** Adds `bucket` and `split` columns assigning each row to a named
    * split by cumulative weight over the hash bucket.  Weights must
    * sum to 1.
    */
  def hashSplit(
      df: DataFrame, idCol: String, salt: String,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"hashSplit: weights must sum to 1, got ${splits.map(_._2).sum}")
    val b = checkedBucket(col(idCol), salt)
    // cumulative integer thresholds; the last split absorbs rounding
    val thresholds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.round(c * DefaultBuckets))
    val assign = splits.map(_._1).zip(thresholds).init
      .foldRight(lit(splits.last._1): Column) {
        case ((name, th), acc) => when(b < th, lit(name)).otherwise(acc)
      }
    df.withColumn("bucket", b).withColumn("split", assign)
  }

  /** Deterministic `fraction`-sample: keeps rows whose bucket falls
    * below the cutoff.  Unlike `df.sample`, membership is a function
    * of the id alone — adding rows later never flips earlier rows.
    */
  def deterministicSample(
      df: DataFrame, idCol: String, fraction: Double, salt: String): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"bad fraction $fraction")
    df.where(checkedBucket(col(idCol), salt) <
      lit(math.round(fraction * DefaultBuckets)))
  }

  /** Per-stratum deterministic sampling — corpus rebalancing (the
    * downsample-the-dominant-language step) with the same stability
    * contract as [[deterministicSample]].  Strata not named in
    * `fractions` keep `defaultFraction` (1.0 = pass through).  Still a
    * pure projection + filter: the per-stratum cutoff is a `when`
    * chain, so no shuffle and no stratum-size pre-pass.
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], salt: String,
      defaultFraction: Double = 1.0): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0 && f <= 1, s"bad fraction $f"))
    val cutoff = fractions.toSeq.sortBy(_._1).foldLeft(
      lit(math.round(defaultFraction * DefaultBuckets)): Column) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum,
          lit(math.round(f * DefaultBuckets))).otherwise(acc)
    }
    df.where(checkedBucket(col(idCol), salt) < cutoff)
  }

  /** Floor integer square root, exact for any non-negative Long —
    * `math.sqrt` alone can land an ulp off near perfect squares.
    * Both correction loops are overflow-safe: the initial guess is
    * capped at floor(√Long.MaxValue) so `x*x` never wraps, and the
    * upward step compares via division instead of squaring `x+1`.
    */
  private[graft] def isqrt(n: Long): Long = {
    require(n >= 0, s"isqrt($n)")
    val maxRoot = 3037000499L // floor(sqrt(Long.MaxValue))
    var x = math.min(math.sqrt(n.toDouble).toLong, maxRoot)
    while (x > 0 && x * x > n) x -= 1
    while (x < maxRoot && (x + 1) <= n / (x + 1)) x += 1
    x
  }

  /** Temperature-based (α = 0.5) source rebalancing — the standard
    * data-mixing step for multi-source / multilingual corpora (XLM-R
    * style): strata are re-weighted ∝ √count so dominant sources are
    * downsampled toward (not onto) uniform, and per-row membership is
    * the same deterministic (id, salt) hash as every sampler here.
    *
    * Exactness contract: the per-stratum keep cutoff is
    * `min(B, B·targetRows·√cₛ / (Σ√cₜ · cₛ))` computed ENTIRELY in
    * integer arithmetic (integer sqrt, BigInt floor division) — no
    * float pow, no float normalization sum — so an external engine
    * replays the cutoffs bit-exactly from the same counts (the reason
    * α is fixed at 0.5: integer sqrt exists; arbitrary-α pow does
    * not).
    *
    * Scale shape: the only driver-side state is one (stratum, count)
    * row per stratum — strata are languages/sources, small by
    * contract (`maxStrata` guards the contract); the per-stratum
    * cutoff rides back in as a BROADCAST-joined (stratum, cutoff)
    * table rather than a folded `when` chain — thousands of
    * data-derived strata would otherwise build an expression tree
    * deep enough to break codegen/JVM method limits.  A NULL stratum
    * is a real stratum (null-safe join key): it was counted like any
    * other, so it samples at its own cutoff instead of silently
    * vanishing.
    */
  def temperatureSample(
      df: DataFrame, idCol: String, strataCol: String,
      targetRows: Long, salt: String, maxStrata: Int = 10000): DataFrame = {
    require(targetRows > 0, s"temperatureSample: targetRows=$targetRows")
    val counts = df.groupBy(strataCol).count()
      .collect().map(r => r.get(0) -> r.getLong(1))
    require(counts.length <= maxStrata,
      s"temperatureSample: ${counts.length} strata exceed maxStrata=$maxStrata — " +
        "a high-cardinality stratum column would put unbounded state on the driver")
    val sumW = counts.map { case (_, c) => BigInt(isqrt(c)) }.sum
    val b = BigInt(DefaultBuckets)
    val cutoffs: Seq[(Any, Long)] = counts.toSeq.map { case (k, c) =>
      val cut = (b * BigInt(targetRows) * BigInt(isqrt(c)) / (sumW * BigInt(c)))
        .min(b)
      k -> cut.toLong
    }
    val spark = df.sparkSession
    val cutSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "__stratum", df.schema(strataCol).dataType, nullable = true),
      org.apache.spark.sql.types.StructField(
        "__cut", org.apache.spark.sql.types.LongType, nullable = false)))
    val cutDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        cutoffs.map { case (k, cut) => org.apache.spark.sql.Row(k, cut) }, 1),
      cutSchema)
    // every stratum in df appears in cutDf (it came from df's own
    // groupBy), so the inner null-safe join loses no rows
    df.join(broadcast(cutDf), col(strataCol) <=> col("__stratum"))
      .where(checkedBucket(col(idCol), salt) < col("__cut"))
      .drop("__stratum", "__cut")
  }

  /** EXACTLY `n` rows per stratum (vs the fraction-based
    * [[stratifiedSample]]): the n rows with the smallest deterministic
    * hash, so membership is again a pure function of (id, salt) —
    * re-runs and engine swaps pick the identical rows, and `n` per
    * stratum is exact, which fraction sampling can't promise
    * (val/test set construction usually wants "500 docs per
    * language", not "≈0.1%").
    *
    * Scale shape — the naive single window
    * `row_number() over (partition by stratum)` funnels EVERY row of
    * a stratum through one task; with 3 languages over 100 TB that is
    * three tasks doing all the work.  Instead, phase 1 takes the n
    * smallest hashes per (stratum, pre-bucket) — `preBuckets`-way
    * parallel, each window sees ~1/preBuckets of the stratum — and
    * phase 2 ranks only the ≤ preBuckets·n survivors per stratum.
    * Identical result (the global top-n is inside the union of
    * per-bucket top-ns: any row outside every bucket top-n has ≥ n
    * smaller hashes in its own bucket alone), bounded task input.
    */
  def stratifiedFixedN(
      df: DataFrame, idCol: String, strataCol: String, n: Int,
      salt: String, preBuckets: Int = 64): DataFrame = {
    require(n > 0 && preBuckets > 0, s"stratifiedFixedN: n=$n preBuckets=$preBuckets")
    val ord = coalesce(
      DedupOps.md5Hash60(concat(col(idCol).cast("string"), lit(":" + salt))),
      raise_error(lit("stratifiedFixedN: null id")).cast("long"))
    val staged = df
      .withColumn("__ord", ord)
      .withColumn("__pb", pmod(col("__ord"), lit(preBuckets.toLong)))
    val local = staged
      .withColumn("__r1", row_number().over(
        Window.partitionBy(col(strataCol), col("__pb"))
          .orderBy(col("__ord"), col(idCol))))
      .where(col("__r1") <= n)
    local
      .withColumn("sample_rank", row_number().over(
        Window.partitionBy(col(strataCol))
          .orderBy(col("__ord"), col(idCol))).cast("long"))
      .where(col("sample_rank") <= n)
      .drop("__ord", "__pb", "__r1")
  }

  /** Deterministic WEIGHTED sampling by the systematic (stratified-
    * grid) scheme: lay every row's integer weight end-to-end in
    * ascending-id order (total `W`), drop `k` evenly-spaced picks at
    * positions `(2i+1)·W/(2k)`, and emit each row with the number of
    * picks that landed inside its span — rows are drawn proportional
    * to weight, heavy rows may repeat (`n_copies` > 1), and the whole
    * draw is a pure function of the data (zero RNG state, replayable
    * by any engine in integer arithmetic — no `pow(u, 1/w)` float
    * keys whose cross-engine ulp could flip a rank).
    *
    * This is the epoch-mixing primitive "sample documents proportional
    * to quality/length for this epoch's budget of k": unlike
    * A-ES/exponential-key sampling it is integer-exact, and unlike
    * independent draws its copy counts never drift from k.
    *
    * Scale shape: the global offsets come from [[PackingOps]]' two-pass
    * prefix scan (driver holds one row per partition), and pick counts
    * are a CLOSED-FORM projection on the offset frame — no positions
    * join, no per-row × per-pick work:
    * `n_copies = c(before + w) − c(before)` where `c(x)` counts picks
    * below `x` (#odd o ≤ (2kx−1) div W, capped at k).
    *
    * Output: `(idCol, weight, cum_before, n_copies)` for rows with
    * `n_copies > 0`, ordered by id.  Rows with weight ≤ 0 are
    * excluded (a zero-width span can't contain a pick).
    */
  def weightedSystematicSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      numPartitions: Int = 0): DataFrame = {
    require(k > 0, s"weightedSystematicSample: k=$k")
    val offsets = PackingOps.withGlobalOffset(
      df.where(col(weightCol).cast("long") > 0), idCol, weightCol,
      numPartitions)
    val w = offsets.agg(sum("tok")).head().getLong(0)
    require(w > 0, "weightedSystematicSample: total weight is 0")
    require(w <= Long.MaxValue / (2L * k),
      s"weightedSystematicSample: 2k·W overflows 63 bits (W=$w, k=$k) — " +
        "rescale weights to coarser units (e.g. KB instead of chars)")
    // c(x) = #picks at positions < x = #odd o ≤ (2kx−1) div W, capped
    // at k; all operands nonnegative, so DIV (truncating) == floor and
    // matches any engine's integer division
    def picksBelow(x: String): String =
      s"(CASE WHEN $x = 0 THEN 0L ELSE " +
        s"least(CAST($k AS BIGINT), (($x * ${2L * k}L - 1L) DIV ${w}L + 1L) DIV 2L) END)"
    offsets
      .withColumn("xhi", col("before") + col("tok"))
      .select(
        col("id").as(idCol), col("tok").as("weight"),
        col("before").as("cum_before"),
        expr(s"${picksBelow("xhi")} - ${picksBelow("before")}").as("n_copies"))
      .where(col("n_copies") > 0)
      .orderBy(idCol)
  }
}
