package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** EXACT distributed quantiles without a global sort — the corpus
  * governance numbers (token-length percentiles, outlier clips) that
  * approximate sketches can't certify.
  *
  * `percentile_approx` answers "roughly where is p50"; a winsorize
  * cut, an SLA bound, or a cross-engine parity gate needs the EXACT
  * order statistic.  The naive exact route — `orderBy(value)` + rank —
  * is a full-corpus range shuffle at 100 TB.  This implementation is
  * the classic radix-selection algorithm instead:
  *
  *  1. map each value to its order-preserving unsigned image
  *     `u = v XOR Long.MinValue` (flips the sign bit, so signed order
  *     becomes unsigned order);
  *  2. histogram the top 16 bits of `u` (≤ 65 536 buckets — a bounded
  *     driver collect, like the centroid/bloom/strata collects
  *     elsewhere in the engine) and locate each target rank's bucket
  *     by cumulative count;
  *  3. repeat on the next 16 bits, scanning only rows whose high bits
  *     match a still-active bucket (`IN` filter over ≤ #targets
  *     prefixes — pushable to the parquet scan);
  *  4. after 4 rounds the 64-bit image — hence the value — is exact.
  *
  * Cost: at most 4 column scans (each cheaper than the last — the
  * round-k scan carries a pushed `IN` prefix filter), zero shuffles of
  * row data (each round's groupBy aggregates to ≤ 65 536 × targets
  * partial rows), driver state O(65 536 × targets).  Degenerate
  * distributions (every row one value) cost the same 4 bounded
  * passes — there is no "one huge bucket" failure mode because the
  * narrowing is on bit prefixes, not data-dependent pivots.
  *
  * Reference scope: the reference's only exact order statistic is the
  * interpolated median of a pandas Series (`binning.py` fillna
  * median); this family generalizes it to corpus scale.
  */
object QuantileOps {

  private val SignBit = Long.MinValue

  /** `u` image column for a long-valued expression. */
  private def uCol(valueCol: String) =
    col(valueCol).cast("long").bitwiseXOR(lit(SignBit)).as("u")

  /** Exact values at the given 0-indexed ascending ranks of
    * `valueCol` (nulls excluded).  Returns (n, rank → value); ranks
    * outside [0, n) throw.  `ranksOf(n)` lets callers derive ranks
    * from the row count the first pass establishes — the count and
    * the first histogram share one scan.
    */
  def exactRankValues(
      df: DataFrame, valueCol: String,
      ranksOf: Long => Seq[Long]): (Long, Map[Long, Long]) = {
    val vals = df.where(col(valueCol).isNotNull).select(uCol(valueCol))

    // round 0: top-16-bit histogram of every row; also yields n
    val h0: Array[(Long, Long)] = vals
      .groupBy(shiftrightunsigned(col("u"), 48).as("b"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = h0.map(_._2).sum
    val ranks = ranksOf(n).distinct
    require(ranks.forall(r => r >= 0 && r < n),
      s"ranks $ranks out of [0, $n)")
    if (ranks.isEmpty) return (n, Map.empty)

    // locate rank `rem` inside ascending (bucket, count) runs: the
    // bucket whose cumulative count first exceeds it, and the rank
    // offset within that bucket
    def pick(buckets: Seq[(Long, Long)], rem: Long): (Long, Long) = {
      var acc = 0L
      for ((b, cnt) <- buckets) {
        if (rem < acc + cnt) return (b, rem - acc)
        acc += cnt
      }
      sys.error(s"radix-select: rank $rem beyond bucket run (total $acc)")
    }
    // state: target rank → (prefix image so far, remaining rank inside it)
    def walk(hist: Map[Long, Seq[(Long, Long)]],
        state: Map[Long, (Long, Long)]): Map[Long, (Long, Long)] =
      state.map { case (rank, (prefix, rem)) =>
        val buckets = hist.getOrElse(prefix,
          sys.error(s"radix-select: no buckets under prefix $prefix"))
        val (b, inBucket) = pick(buckets, rem)
        rank -> ((prefix << 16) | b, inBucket)
      }

    var state: Map[Long, (Long, Long)] =
      walk(Map(0L -> h0.toSeq), ranks.map(r => r -> (0L, r)).toMap)

    for (level <- 1 to 3) {
      val shift = 48 - 16 * level
      val prefixes = state.values.map(_._1).toSeq.distinct
      val rows: Array[Row] = vals
        .where(shiftrightunsigned(col("u"), shift + 16).isin(prefixes: _*))
        .groupBy(
          shiftrightunsigned(col("u"), shift + 16).as("parent"),
          shiftrightunsigned(col("u"), shift).bitwiseAND(lit(0xFFFFL)).as("b"))
        .agg(count(lit(1)).as("cnt"))
        .collect()
      val hist: Map[Long, Seq[(Long, Long)]] = rows
        .map(r => (r.getLong(0), r.getLong(1) & 0xFFFFL, r.getLong(2)))
        .groupBy(_._1)
        .map { case (p, bs) => p -> bs.map(t => (t._2, t._3)).sortBy(_._1).toSeq }
      state = walk(hist, state)
    }
    (n, state.map { case (rank, (image, _)) => rank -> (image ^ SignBit) })
  }

  /** Exact percentiles of a long column: one row per requested `p`
    * with the row count, the discrete percentile (smallest value with
    * cumulative share ≥ p — `percentile_disc`, rank ⌈p·n⌉−1), and the
    * linearly interpolated percentile (`percentile_cont`, `lo +
    * (hi−lo)·frac` at rank (n−1)·p) — both bit-identical to the ANSI
    * aggregates a warehouse engine computes, but in 4 bounded scans
    * instead of a sort.
    */
  def exactQuantilesLong(
      df: DataFrame, valueCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0), s"bad ps $ps")
    val spark = df.sparkSession
    val (n, values) = exactRankValues(df, valueCol, n => {
      require(n > 0, s"exactQuantilesLong: no non-null rows in $valueCol")
      ps.flatMap { p =>
        val disc = math.max(0L, math.ceil(p * n).toLong - 1L)
        val rn = (n - 1) * p
        Seq(disc, math.floor(rn).toLong, math.ceil(rn).toLong)
      }
    })
    val out = ps.map { p =>
      val disc = values(math.max(0L, math.ceil(p * n).toLong - 1L))
      val rn = (n - 1) * p
      val lo = values(math.floor(rn).toLong)
      val hi = values(math.ceil(rn).toLong)
      val cont = lo + (hi - lo) * (rn - math.floor(rn))
      (p, n, disc, cont)
    }
    import spark.implicits._
    out.toDF("p", "n", "q_disc", "q_cont")
  }

  /** Exact per-GROUP medians (disc + interpolated cont) via rank
    * windows — the grouped complement of the global radix selection
    * (which has no per-group form: its histogram narrowing is a
    * global walk).  One shuffle on the group key; each group's rank
    * assignment sorts only that group's rows, and the final
    * conditional-max aggregation touches the two needed ranks per
    * group.  For integer inputs both medians are exact: disc is the
    * ceil(n/2)-rank value, cont the exact mean of the two middle
    * values (equal doubles in any engine — integer-valued doubles
    * add/halve exactly).
    */
  def groupedMedian(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__v"))
    val g = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    val ranked = df
      .select(col(groupCol), col(valueCol).cast("long").as("__v"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(g))
      .withColumn("__lo_rank", expr("(__n + 1) div 2"))
      .withColumn("__hi_rank",
        col("__lo_rank") + lit(1) - pmod(col("__n"), lit(2)))
    ranked.groupBy(col(groupCol))
      .agg(max("__n").cast("long").as("n"),
        max(when(col("__rn") === col("__lo_rank"), col("__v"))).as("__lo"),
        max(when(col("__rn") === col("__hi_rank"), col("__v"))).as("__hi"))
      .select(col(groupCol), col("n"),
        col("__lo").as("med_disc"),
        ((col("__lo").cast("double") + col("__hi").cast("double")) / 2.0)
          .as("med_cont"))
  }

  /** Robust (MAD) outlier detection: flag rows whose integer value
    * deviates from the exact median by more than `k` × MAD (median
    * absolute deviation).  Mean/stddev outlier rules are themselves
    * dragged by the outliers they hunt; the median/MAD pair is the
    * standard robust replacement (50% breakdown point) and — on
    * integer values — is EXACT here: two bounded radix-rank
    * selections ([[exactRankValues]], ≤65536-row driver collects, no
    * sort) and a final shuffle-free projection with the cuts as
    * literals.  Three scans total at any scale.
    *
    * Output: the outlier rows (id, value, dev) with the med/MAD cuts
    * carried as columns (one frame gates both the selection machinery
    * and the rule).  `k` is integer so the threshold `k·mad` stays in
    * exact-integer space.
    */
  def madOutliers(
      df: DataFrame, idCol: String, valueCol: String,
      k: Long = 2): DataFrame = {
    require(k > 0, s"madOutliers: k=$k")
    def discRank(n: Long) = math.max(0L, math.ceil(0.5 * n).toLong - 1L)
    val (n, meds) = exactRankValues(df, valueCol, n => Seq(discRank(n)))
    require(n > 0, s"madOutliers: no non-null rows in $valueCol")
    val med = meds(discRank(n))
    val devs = df.where(col(valueCol).isNotNull)
      .select(col(idCol), col(valueCol).cast("long").as("value"),
        abs(col(valueCol).cast("long") - med).as("dev"))
    val (_, mads) = exactRankValues(devs, "dev", n => Seq(discRank(n)))
    val mad = mads(discRank(n))
    devs.where(col("dev") > k * mad)
      .withColumn("med", lit(med))
      .withColumn("mad", lit(mad))
  }

  /** Winsorize: clip `valueCol` to its exact [pLo, pHi] discrete
    * percentiles.  Two bounded-rank selections, then a pure projection
    * with the cut values as literals — the clip itself is shuffle-free
    * and scan-bound at any scale.  Output keeps the original value,
    * the clipped value, and the clip flag.
    */
  def winsorize(
      df: DataFrame, idCol: String, valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(0.0 <= pLo && pLo < pHi && pHi <= 1.0, s"bad clip [$pLo, $pHi]")
    val (n, values) = exactRankValues(df, valueCol, n =>
      Seq(pLo, pHi).map(p => math.max(0L, math.ceil(p * n).toLong - 1L)))
    require(n > 0, s"winsorize: no non-null rows in $valueCol")
    val cutLo = values(math.max(0L, math.ceil(pLo * n).toLong - 1L))
    val cutHi = values(math.max(0L, math.ceil(pHi * n).toLong - 1L))
    df.select(col(idCol),
      col(valueCol).cast("long").as("v"),
      // least/greatest IGNORE null operands, so guard explicitly: a
      // null value must stay null, not collapse to a cut
      when(col(valueCol).isNull, lit(null).cast("long"))
        .otherwise(
          greatest(lit(cutLo), least(lit(cutHi), col(valueCol).cast("long"))))
        .as("clipped"),
      (col(valueCol) < cutLo || col(valueCol) > cutHi).as("was_clipped"))
  }
}
