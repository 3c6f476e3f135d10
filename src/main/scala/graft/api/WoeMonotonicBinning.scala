package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{Kernels, WoeBin}
import graft.spark.{WoeBinning, WoeBinningModel, WoeFitOptions}

/** Drop-in façade mirroring the reference package's five exports
  * (`woe_monotonic_binning/__init__.py:1`): `woe_binning`,
  * `woe_binning_sep`, `batch_woe_binning`, `apply_bins`, `merge_bins`
  * — same parameters, same defaults, same output schema (the
  * 11-column bins table), re-expressed over Spark DataFrames so a
  * reference user can switch by translating names to camelCase.
  */
object WoeMonotonicBinning {

  /** `woe_binning(target, dataset, n_threshold, ...)` (binning.py:103):
    * `df` must carry the target column and exactly one feature column
    * (any extra columns are ignored after picking the first
    * non-target, matching `dataset.columns[...!= target][0]`).
    */
  def woeBinning(
      df: DataFrame,
      target: String,
      nThreshold: Double,
      nOccurrences: Double = 1.0,
      pThreshold: Double = 0.1,
      sortOverload: Option[Boolean] = None,
      mergeThreshold: Option[Double] = None): DataFrame = {
    val spark = df.sparkSession
    val cols = df.columns
    // duplicate-column degenerate guard (binning.py:106-109)
    if (cols.length >= 2 && cols(0) == cols(1))
      return new WoeBinningModel(Seq(cols(1) -> Kernels.degenerateBins(cols(1))))
        .binsDf(spark)
    val column = cols.filter(_ != target).head
    val m = WoeBinning.fit(df, target, Seq(column),
      WoeFitOptions(nThreshold = Some(nThreshold), nOccurrences = nOccurrences,
        pThreshold = pThreshold, sortOverload = sortOverload,
        mergeThreshold = mergeThreshold))
    m.binsDf(spark)
  }

  /** `woe_binning_sep(target, column, dataset, sep_value, ...)`
    * (binning.py:32).
    */
  def woeBinningSep(
      df: DataFrame,
      target: String,
      column: String,
      sepValue: Double,
      nThreshold: Double,
      nOccurrences: Double = 1.0,
      pThreshold: Double = 0.1,
      mergeThreshold: Option[Double] = None): DataFrame = {
    val m = WoeBinning.fit(df, target, Seq(column),
      WoeFitOptions(nThreshold = Some(nThreshold), nOccurrences = nOccurrences,
        pThreshold = pThreshold, sepValue = Some(sepValue),
        mergeThreshold = mergeThreshold))
    m.binsDf(df.sparkSession)
  }

  /** `batch_woe_binning(target, dataset, ...)` (binning.py:78): fits
    * every non-target column (default n_threshold = ceil(N/20),
    * :84-87); returns the stacked bins table — the same shape
    * `apply_bins(is_df=True)` consumes.
    */
  def batchWoeBinning(
      df: DataFrame,
      target: String,
      nThreshold: Option[Double] = None,
      nOccurrences: Double = 1.0,
      pThreshold: Double = 0.1,
      sepValue: Option[Double] = None,
      mergeThreshold: Option[Double] = None): DataFrame =
    batchWoeBinningModel(df, target, nThreshold, nOccurrences, pThreshold,
      sepValue, mergeThreshold).binsDf(df.sparkSession)

  /** Model-returning flavor of batchWoeBinning (keeps the driver-side
    * bins for a shuffle-free transform).
    */
  def batchWoeBinningModel(
      df: DataFrame,
      target: String,
      nThreshold: Option[Double] = None,
      nOccurrences: Double = 1.0,
      pThreshold: Double = 0.1,
      sepValue: Option[Double] = None,
      mergeThreshold: Option[Double] = None): WoeBinningModel =
    WoeBinning.fit(df, target, df.columns.filter(_ != target).toSeq,
      WoeFitOptions(nThreshold = nThreshold, nOccurrences = nOccurrences,
        pThreshold = pThreshold,
        // `if sep_value:` quirk (binning.py:88) — sep_value=0 is falsy
        // in Python, so the reference's batch path silently ignores it
        sepValue = sepValue.filter(_ != 0.0),
        mergeThreshold = mergeThreshold))

  /** `apply_bins(dataset, dict_woe, ...)` (binning.py:268) with the
    * `is_df=True` stacked-frame input: variables are processed in
    * first-occurrence row order, filtered by total IV / bin count /
    * infinite IV, deduped by exact IV equality when remove100Corr —
    * output holds only the `<col>_bin` columns.
    */
  def applyBins(
      df: DataFrame,
      binsDf: DataFrame,
      ivThreshold: Double = 0.02,
      binThreshold: Int = 2,
      remove100Corr: Boolean = true): DataFrame =
    modelFromBinsDf(binsDf)
      .transform(df, ivThreshold, binThreshold, remove100Corr)

  /** Rebuild a driver-side model from a stacked bins DataFrame (the
    * reference's `is_df=True` path, binning.py:271-277): variables
    * keyed by first occurrence, rows kept in frame order.
    *
    * ROW ORDER CONTRACT (same as the reference's pandas frame): each
    * variable's rows must appear in bin order — true for any binsDf
    * produced by this engine and for single-file parquet round-trips.
    * A shuffled/unioned frame loses that order silently (pandas has
    * the identical failure mode) — Spark frames lose order far more
    * easily (repartition, union, multi-file parquet), so disorder is
    * DETECTED here: a valid fit's complete rows always carry strictly
    * monotone interval starts (both orientations, sentinel stitch and
    * merge_bins included), and a violation fails fast with a pointer
    * to WoeBinningModel.save/load, which persists explicit ordinals.
    */
  def modelFromBinsDf(binsDf: DataFrame): WoeBinningModel = {
    val rows = binsDf.select("variable", "interval_start_include",
      "interval_end_exclude", "size", "mean", "bads", "goods", "dist_good",
      "dist_bad", "woe", "iv_components").collect()
    def d(r: org.apache.spark.sql.Row, i: Int): Double =
      if (r.isNullAt(i)) Double.NaN else r.getDouble(i)
    val order = scala.collection.mutable.LinkedHashMap[String, Vector[WoeBin]]()
    rows.foreach { r =>
      val b = WoeBin(r.getString(0), d(r, 1), d(r, 2), d(r, 3), d(r, 4),
        d(r, 5), d(r, 6), d(r, 7), d(r, 8), d(r, 9), d(r, 10))
      order.updateWith(b.variable) {
        case Some(v) => Some(v :+ b)
        case None => Some(Vector(b))
      }
    }
    order.foreach { case (v, bs) =>
      val complete = bs.filter(Kernels.isCompleteRow)
      // the cut sequence apply consumes: starts plus the outermost end —
      // including the end also catches a fully REVERSED frame, whose
      // starts alone read as valid opposite-orientation bins
      val cuts = complete.map(_.intervalStartInclude) ++
        complete.lastOption.map(_.intervalEndExclude)
      val monotone = complete.length < 2 ||
        cuts.iterator.sliding(2).forall(p => p.head < p(1)) ||
        cuts.iterator.sliding(2).forall(p => p.head > p(1))
      require(monotone,
        s"apply_bins(is_df): bins of variable '$v' are not in bin order — " +
          "the stacked frame's row order was lost (repartition/union/" +
          "multi-file parquet read). Use WoeBinningModel.save/load, " +
          "which persists explicit bin ordinals.")
    }
    new WoeBinningModel(order.toSeq)
  }

  /** `merge_bins(df, bins_index)` (binning.py:14) over the stacked
    * bins table of ONE variable — span-sum / listed-drop quirk
    * preserved (see Kernels.mergeBins).
    */
  def mergeBins(binsDf: DataFrame, binsIndex: Seq[Int]): DataFrame = {
    val m = modelFromBinsDf(binsDf)
    val (variable, bins) = m.fitted.head
    new WoeBinningModel(Seq(variable -> Kernels.mergeBins(bins, binsIndex)))
      .binsDf(binsDf.sparkSession)
  }
}
