package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mergeable HyperLogLog cardinality sketches with a bit-deterministic
  * register layout — the corpus-profiling primitive ("how many distinct
  * shingles / urls / keys per source?") that exact `count(distinct)`
  * can't afford at 100 TB.
  *
  * `approx_count_distinct` already ships with Spark, but its HLL++
  * binary state is opaque: it can't be persisted per shard as a small
  * table, merged across ingestion days, or replayed by another engine
  * for a parity gate.  This family makes the sketch state a plain
  * DataFrame instead:
  *
  *  - [[hllRegisters]] — `(group…, bucket, rho)`: bucket = top `p`
  *    bits of `xxhash64(key)` (Spark's seed-42 XXH64 — the same hash
  *    the dedup oracles replay in DuckDB SQL), rho = leading-zero rank
  *    of the remaining `64-p` bits.  One `groupBy(group, bucket)
  *    .max(rho)` — map-side partial max means the shuffle carries at
  *    most `m = 2^p` rows per group per partition, independent of data
  *    size.  Deterministic: no RNG, no order dependence (max is
  *    commutative), stable under repartition.
  *  - [[hllMerge]] — union + `max(rho)`: registers from different
  *    shards / days / engines combine losslessly (HLL's defining
  *    property), so a 100 TB corpus profiles as: per-shard register
  *    tables (`m` rows each, ~32 KB at p=12) persisted at ingest, any
  *    slice's cardinality answered later by merging a handful of tiny
  *    tables — zero re-scans of the corpus.
  *  - [[hllEstimate]] — the Flajolet et al. estimator with the
  *    standard linear-counting small-range correction.  The arithmetic
  *    is staged so a foreign engine replays it bit-for-bit: the
  *    harmonic sum is kept EXACT (each `2^-rho` scaled by `2^(64-p+1)`
  *    and summed as `decimal(38,0)` — order-independent, no float
  *    accumulation), and only the final estimate divides in doubles.
  *
  * Error: the usual `1.04/sqrt(m)` relative standard error (~1.6% at
  * p=12); SketchSpec pins a 3-sigma accuracy bound plus the merge law
  * `registers(A ∪ B) == merge(registers(A), registers(B))`.
  *
  * Reference scope: the reference (binning.py) has no sketches — this
  * family is part of the engine's training-data-pipeline surface, next
  * to the dedup/profile ops it complements.
  */
object SketchOps {

  /** Register geometry for precision `p`: `m = 2^p` buckets, `wbits =
    * 64-p` suffix bits, rho ∈ [1, wbits+1].
    */
  private def wbits(p: Int): Int = 64 - p

  private def requireP(p: Int): Unit =
    require(p >= 4 && p <= 16, s"HLL precision p=$p outside [4,16]")

  /** The `(bucket, rho)` pair for a string key expression.
    *
    * bucket = unsigned top-p bits of xxhash64(key); rho = (number of
    * leading zeros of the remaining wbits) + 1, i.e. `wbits + 1 -
    * bitLength(w)`, with the all-zero suffix mapping to `wbits + 1`.
    * `bin()` (Java `Long.toBinaryString`) gives bitLength without a
    * loop and stays inside whole-stage codegen.
    */
  private def bucketAndRho(key: Column, p: Int): (Column, Column) = {
    val h = xxhash64(key)
    val w = h.bitwiseAND(lit((1L << wbits(p)) - 1L))
    val bucket = shiftrightunsigned(h, wbits(p)).cast("int")
    val rho = when(w === 0L, lit(wbits(p) + 1))
      .otherwise(lit(wbits(p) + 1) - length(bin(w)))
      .cast("int")
    (bucket, rho)
  }

  /** Per-group HLL register table `(groupCols…, bucket INT, rho INT)`
    * for the distinct values of `keyCol` (cast to string; nulls
    * dropped).  At most `2^p` rows per group regardless of input size.
    */
  def hllRegisters(
      df: DataFrame, groupCols: Seq[String], keyCol: String,
      p: Int): DataFrame = {
    requireP(p)
    val key = col(keyCol).cast("string")
    val (bucket, rho) = bucketAndRho(key, p)
    df.where(key.isNotNull)
      .select(groupCols.map(col) :+ bucket.as("bucket") :+ rho.as("rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rho").as("rho"))
  }

  /** Lossless register merge: `merge(regs(A), regs(B)) == regs(A ∪ B)`
    * (max is idempotent/commutative/associative per bucket).  Inputs
    * must share the same `groupCols` schema and precision.
    */
  def hllMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rho").as("rho"))

  /** Exactly-representable double literal for 2^k (k ≤ 63). */
  private def pow2(k: Int): Double = java.lang.Math.scalb(1.0, k)

  /** Cardinality estimate per group from a register table:
    * `(groupCols…, buckets_used BIGINT, est_distinct DOUBLE)`.
    *
    * est_raw = alpha_m · m² / Σ 2^-rho  (zero registers contribute
    * 2^-0 each); if est_raw ≤ 2.5m and any register is zero, linear
    * counting `m · ln(m/V)` replaces it.  The harmonic sum is exact
    * (see object doc); every double op below has a textually identical
    * twin in the DuckDB oracle, so the two engines agree bit-for-bit
    * up to the final `ln`.
    */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    requireP(p)
    val m = 1 << p
    // 2^(wbits+1-rho): rho ∈ [1, wbits+1] → values 2^0 .. 2^wbits,
    // each exact in decimal(38,0); the scale cancels in est_raw.
    val scaled = expr(s"cast(pow(2.0d, ${wbits(p) + 1} - rho) as decimal(38,0))")
    val agg = regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("buckets_used"), sum(scaled).as("s_present"))
    val zeros = lit(m) - col("buckets_used")
    val sTotal = col("s_present") +
      zeros.cast("decimal(38,0)") * expr(
        s"cast(pow(2.0d, ${wbits(p) + 1}) as decimal(38,0))")
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val estRaw = alpha * lit(m.toDouble) * lit(m.toDouble) *
      (lit(pow2(wbits(p) + 1)) / sTotal.cast("double"))
    val est = when(estRaw <= lit(2.5 * m) && zeros > 0,
        lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(estRaw)
    agg.select(
      groupCols.map(col) :+ col("buckets_used") :+ est.as("est_distinct"): _*)
  }

  /** One-call convenience: registers + estimate. */
  def hllDistinct(
      df: DataFrame, groupCols: Seq[String], keyCol: String,
      p: Int): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, keyCol, p), groupCols, p)

  /** The AGGREGATE-function form — `graft.functions.HllSketchAgg` as
    * a Column for `groupBy.agg(...)`: one expression, registers live
    * in the agg buffer, no register table materializes.  Bit-equal to
    * [[hllDistinct]] by contract (same hash/layout/estimator; spec +
    * shared-oracle pinned).  `key` must be a string column.
    */
  def hllAggCol(key: Column, p: Int = 10): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.HllSketchAgg(
        org.apache.spark.sql.graft.ColumnBridge.expression(key), p)
        .toAggregateExpression())

  // ---------------------------------------------------------------
  // HDR-histogram quantile sketch — the quantile peer of the HLL
  // family.  DDSketch-style log buckets would put a value on a bucket
  // EDGE differently per engine (ln is a float); this indexing is pure
  // integer bit arithmetic, so registers are bit-identical everywhere:
  //
  //   v < 2^b            → idx = v                      (exact)
  //   v ≥ 2^b, L bits    → idx = (L−b)·2^b + (v >> (L−b−1)) − 2^b
  //
  // i.e. keep the top b+1 significant bits.  Bucket width 2^(L−b−1)
  // over a lower bound ≥ 2^(L−1) gives relative error ≤ 2^−b (~3% at
  // b=5, ~0.1% at b=10).  Registers are (group, idx, cnt): mergeable
  // by plain count-sum, ≤ (64−b)·2^b rows per group no matter the
  // data, and a quantile is a cumulative walk over the tiny register
  // frame — the 100 TB percentile-telemetry primitive (doc-length /
  // score distributions per source per day, merged on demand) without
  // re-scanning anything.
  // ---------------------------------------------------------------

  private def requireB(b: Int): Unit =
    require(b >= 2 && b <= 16, s"HDR sub-bucket bits b=$b outside [2,16]")

  /** Per-group HDR register table `(groupCols…, idx INT, cnt BIGINT)`
    * over a nonnegative integral `valueCol` (nulls dropped; a negative
    * value fails fast — silent clamping would skew every quantile).
    */
  def hdrRegisters(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      b: Int): DataFrame = {
    requireB(b)
    val base = 1 << b
    val v = "cast(" +
      s"case when $valueCol < 0 then raise_error('hdrRegisters: negative value') " +
      s"else $valueCol end as bigint)"
    // L = bit length of v (v > 0); bin() has no leading zeros
    val idx = s"cast(case when $v < $base then $v else " +
      s"(length(bin($v)) - $b) * $base + shiftright($v, length(bin($v)) - $b - 1) - $base " +
      s"end as int)"
    df.where(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ expr(idx).as("idx"): _*)
      .groupBy((groupCols :+ "idx").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Lossless register merge (counts add). */
  def hdrMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "idx").map(col): _*)
      .agg(sum("cnt").as("cnt"))

  /** Bucket lower bound for an index — the sketch's value estimate
    * (taking the lower bound, not the midpoint, keeps the estimate an
    * ACHIEVED value bound: est ≤ true quantile < est·(1+2^−b)).
    */
  private def hdrLowerBound(b: Int): String = {
    val base = 1 << b
    s"case when idx < $base then cast(idx as bigint) " +
      s"else shiftleft(cast($base + idx % $base as bigint), idx div $base - 1) end"
  }

  /** Quantile estimates per group from a register table:
    * `(groupCols…, q DOUBLE, est_value BIGINT, n BIGINT)` — for each
    * requested quantile, the lower bound of the bucket holding rank
    * `ceil(q·n)` (rank-1-indexed; q=1.0 → max bucket).  One window
    * over the register frame (≤ (64−b)·2^b rows per group).
    */
  def hdrQuantiles(
      regs: DataFrame, groupCols: Seq[String], b: Int,
      qs: Seq[Double]): DataFrame = {
    requireB(b)
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"bad quantiles $qs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy("idx")
    val cum = regs
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)))
    val qdf = {
      val sp = regs.sparkSession
      import sp.implicits._
      qs.toDF("q")
    }
    // first bucket whose cumulative count reaches rank ceil(q·n)
    cum.crossJoin(broadcast(qdf))
      .where(col("cum") >= ceil(col("q") * col("n")) &&
        (col("cum") - col("cnt")) < ceil(col("q") * col("n")))
      .select(
        groupCols.map(col) :+ col("q") :+
          expr(hdrLowerBound(b)).as("est_value") :+ col("n"): _*)
  }

  /** One-call convenience: registers + quantiles. */
  def hdrQuantilesOf(
      df: DataFrame, groupCols: Seq[String], valueCol: String, b: Int,
      qs: Seq[Double]): DataFrame =
    hdrQuantiles(hdrRegisters(df, groupCols, valueCol, b), groupCols, b, qs)

  // ---------------------------------------------------------------
  // Count-Min frequency sketch — the frequency peer: "how often does
  // key X occur per source/day" answered from a d×2^p integer table
  // instead of a full wordcount, with the same plain-DataFrame /
  // merge-by-sum discipline as the HLL and HDR families.  The d row
  // hashes derive from ONE xxhash64 via Kirsch–Mitzenmacher double
  // hashing (g_i = h1 + i·h2 mod w, h2 forced odd so it is a unit mod
  // the power-of-two w) — bit-deterministic and foreign-engine
  // replayable, unlike seeding a hash d times (Spark's xxhash64 seed
  // is fixed).  Estimates are the classic min over rows: never under
  // the true count, over by ≤ 2N/w with probability 1−2^−d per query.
  // ---------------------------------------------------------------

  private def requireDp(d: Int, p: Int): Unit = {
    require(d >= 1 && d <= 8, s"CMS depth d=$d outside [1,8]")
    require(p >= 4 && p <= 20, s"CMS width bits p=$p outside [4,20]")
  }

  /** The d bucket columns for a key expression (w = 2^p). */
  private def cmsBuckets(key: Column, d: Int, p: Int): Seq[Column] = {
    val h = xxhash64(key)
    val h1 = h.bitwiseAND(lit(0xFFFFFFFFL))
    val h2 = shiftrightunsigned(h, 32).bitwiseOR(lit(1L))
    (0 until d).map(i => (h1 + lit(i.toLong) * h2).bitwiseAND(lit((1L << p) - 1L)))
  }

  /** Per-group CMS register table `(groupCols…, row INT, bucket INT,
    * cnt BIGINT)` counting occurrences of `keyCol` (cast to string,
    * nulls dropped).  ≤ d·2^p rows per group.
    */
  def cmsRegisters(
      df: DataFrame, groupCols: Seq[String], keyCol: String,
      d: Int = 4, p: Int = 10): DataFrame = {
    requireDp(d, p)
    val key = col(keyCol).cast("string")
    df.where(key.isNotNull)
      .select(groupCols.map(col) :+
        posexplode(array(cmsBuckets(key, d, p): _*)).as(Seq("row", "bucket")): _*)
      .groupBy((groupCols :+ "row" :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("row", col("row").cast("int"))
      .withColumn("bucket", col("bucket").cast("int"))
  }

  /** Lossless register merge (counts add). */
  def cmsMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "row" :+ "bucket").map(col): _*)
      .agg(sum("cnt").as("cnt"))

  /** Point estimates: for each row of `keys` (carrying `groupCols` and
    * `keyCol`), the CMS estimate `min_i regs[i, g_i(key)]` — appended
    * as `est` (BIGINT, ≥ the true count).  The keys frame is expected
    * small (a watchlist / top-k probe) and is broadcast against the
    * register table; an absent register cell counts as 0.
    */
  def cmsLookup(
      regs: DataFrame, groupCols: Seq[String], keys: DataFrame,
      keyCol: String, d: Int = 4, p: Int = 10): DataFrame = {
    requireDp(d, p)
    val key = col(keyCol).cast("string")
    val probes = keys
      .select(keys.columns.map(col) :+
        posexplode(array(cmsBuckets(key, d, p): _*)).as(Seq("row", "bucket")): _*)
      .withColumn("row", col("row").cast("int"))
      .withColumn("bucket", col("bucket").cast("int"))
    // the register table is the broadcastable side (≤ d·2^p rows per
    // group); Spark cannot broadcast the preserved side of a left join
    val joinCols = groupCols ++ Seq("row", "bucket")
    probes.join(broadcast(regs), joinCols, "left")
      .groupBy(keys.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // ---------------------------------------------------------------
  // KMV (k-minimum-values / theta) sketch — SET OPERATIONS, which HLL
  // registers fundamentally cannot do: an HLL bucket max tells you
  // nothing about which elements two sketches share, while the k
  // smallest hash values of a set are a uniform SAMPLE of it.  Keep
  // the k smallest distinct signed xxhash64 values per group (signed
  // order is unsigned order shifted — still uniform, and both engines
  // sort it identically); then
  //   distinct(A)   = (k−1)/u_k            (u_k = normalized k-th min)
  //   |A ∩ B|       = |S_A ∩ S_B below θ| / θ,   θ = min(u_A, u_B)
  // Registers are k rows per group, merge = union-distinct + re-trim
  // (associative), and every estimate is arithmetic on stored hashes —
  // foreign-engine replayable.  The 100 TB story: pairwise source
  // overlap from ~KB register tables instead of a gram-set join over
  // the corpus (q_source_overlap's exact form).
  // ---------------------------------------------------------------

  /** Normalized position of a signed 64-bit hash in [0,1):
    * `(h + 2^63 + 1) / 2^64` written in overflow-free double form —
    * the same textual expression the DuckDB oracle evaluates.
    */
  private def normSql(h: String): String =
    s"cast($h as double) / 18446744073709551616.0d + 0.5d + " +
      "1.0d / 18446744073709551616.0d"

  /** Per-group KMV register table `(groupCols…, rank INT, h BIGINT)` —
    * the k smallest DISTINCT signed xxhash64 values of `keyCol`.
    *
    * Scale shape: distinct-hash shuffle (wordcount-shaped), then a
    * TWO-stage trim — per (group, hash mod 64) row_number keeps ≤ k
    * each, so the final per-group window ranks ≤ 64k candidate rows,
    * never the full distinct set through one task.
    */
  def kmvRegisters(
      df: DataFrame, groupCols: Seq[String], keyCol: String,
      k: Int): DataFrame = {
    require(k >= 16 && k <= 65536, s"KMV k=$k outside [16, 65536]")
    val key = col(keyCol).cast("string")
    val hashed = df.where(key.isNotNull)
      .select(groupCols.map(col) :+ xxhash64(key).as("h"): _*)
      .distinct()
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy((groupCols :+ "__salt").map(col): _*).orderBy("h")
    val cand = hashed
      .withColumn("__salt", pmod(col("h"), lit(64L)))
      .withColumn("__r", row_number().over(w1))
      .where(col("__r") <= k)
      .drop("__salt", "__r")
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy("h")
    cand.withColumn("rank", row_number().over(w2))
      .where(col("rank") <= k)
      .select(groupCols.map(col) :+ col("rank") :+ col("h"): _*)
  }

  /** Lossless register merge: union-distinct + re-trim to the k
    * smallest (associative — `regs(A ∪ B) == merge(regs(A), regs(B))`).
    */
  def kmvMerge(
      a: DataFrame, b: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy("h")
    a.unionByName(b)
      .select((groupCols :+ "h").map(col): _*).distinct()
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(groupCols.map(col) :+ col("rank") :+ col("h"): _*)
  }

  /** Per-group theta stats `(groupCols…, n_kept BIGINT, theta DOUBLE,
    * est_distinct DOUBLE)`: a group holding fewer than k hashes IS its
    * full set (theta = 1, estimate exact); otherwise theta is the
    * normalized k-th minimum and est = (k−1)/theta.
    */
  def kmvDistinct(regs: DataFrame, groupCols: Seq[String], k: Int): DataFrame =
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), max("h").as("__hmax"))
      .withColumn("theta",
        when(col("n_kept") < k, lit(1.0))
          .otherwise(expr(normSql("__hmax"))))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) / col("theta")))
      .drop("__hmax")

  /** Pairwise intersection estimates across the groups of ONE register
    * table: `(scope_a, scope_b, n_common BIGINT, est_inter DOUBLE)`
    * for every scope pair a < b.  n_common counts shared hashes with
    * norm < θ = min(θ_a, θ_b); est = n_common/θ.  All frames are
    * O(#scopes · k) — broadcast joins, nothing corpus-sized.
    */
  def kmvOverlap(regs: DataFrame, scopeCol: String, k: Int): DataFrame = {
    val stats = kmvDistinct(regs, Seq(scopeCol), k)
      .select(col(scopeCol).as("scope"), col("theta"))
    val pairs = stats.select(col("scope").as("scope_a"), col("theta").as("ta"))
      .crossJoin(broadcast(
        stats.select(col("scope").as("scope_b"), col("theta").as("tb"))))
      .where(col("scope_a") < col("scope_b"))
      .withColumn("theta_min", least(col("ta"), col("tb")))
    val ra = regs.select(col(scopeCol).as("scope_a"), col("h"))
    val rb = regs.select(col(scopeCol).as("scope_b"), col("h"))
    val common = ra.join(broadcast(rb), "h")
      .where(col("scope_a") < col("scope_b"))
      .join(broadcast(pairs), Seq("scope_a", "scope_b"))
      .where(expr(normSql("h")) < col("theta_min"))
      .groupBy("scope_a", "scope_b")
      .agg(count(lit(1)).as("n_common"))
    pairs.join(common, Seq("scope_a", "scope_b"), "left")
      .select(col("scope_a"), col("scope_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        (coalesce(col("n_common"), lit(0L)).cast("double") / col("theta_min"))
          .as("est_inter"))
  }
}
