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
}
