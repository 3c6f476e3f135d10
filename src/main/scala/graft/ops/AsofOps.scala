package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of (point-in-time) join — for each left row, the most recent
  * right row with `right.time <= left.time` within the same key.
  *
  * Built the scalable way: union-tag the two sides, ONE shuffle on the
  * key, an in-partition sort, and a carry-forward window
  * (`last(..., ignoreNulls)` over unbounded-preceding rows).  No range
  * join, so there is no candidate-pair explosion to prune — cost is
  * sort + linear scan per key group, the same plan a 1000-executor
  * cluster wants (the alternative `left.time BETWEEN ...` range join
  * is quadratic in events-per-key).
  *
  * Tie rule (deterministic in any engine): at equal time the RIGHT row
  * sorts first, so an equal-timestamp right row IS visible to the left
  * row; among equal-time rows of one side the id breaks ties.
  */
object AsofOps {

  /** Time normalization shared by both joins.  A blanket
    * `cast("long")` would silently FLOOR timestamps to whole seconds —
    * two events 300 ms apart become a tie, and the right-first tie
    * rule would then show a right row up to 999 ms in the FUTURE to a
    * left row.  So: timestamps compare in exact integer MICROSECONDS
    * (`gap`/`matched_time`/lookback are µs for timestamp inputs),
    * dates in days, integrals as themselves; fractional time keeps its
    * native type (ordering and subtraction are exact operations there
    * too); anything else — strings in particular — throws instead of
    * nulling out.
    */
  private def timeExpr(df: DataFrame, timeCol: String): Column =
    df.schema(timeCol).dataType match {
      // NTZ wall-clocks interpret in the session timezone (standard
      // Spark cast semantics); both sides of a join shift identically,
      // so ordering and gaps are consistent for any fixed session tz
      case TimestampType | TimestampNTZType =>
        unix_micros(col(timeCol).cast(TimestampType))
      case DateType => unix_date(col(timeCol)).cast("long")
      case ByteType | ShortType | IntegerType | LongType =>
        col(timeCol).cast("long")
      case FloatType | DoubleType | _: DecimalType => col(timeCol)
      case other => throw new IllegalArgumentException(
        s"asof/interval join: time column '$timeCol' has un-orderable " +
          s"type ${other.catalogString}; cast it to a timestamp or a " +
          "numeric epoch first")
    }

  /** @param left  rows to annotate (must contain key, time, id columns)
    * @param right rows to look up (same three columns)
    * @return left (key, id, time) + matched right id/time (null when no
    *         right row precedes) + the gap `time - right_time`
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], timeCol: String, idCol: String): DataFrame = {
    def side(df: DataFrame, isLeft: Boolean): DataFrame =
      df.select(
        keyCols.map(col) :+
          timeExpr(df, timeCol).as("__t") :+
          col(idCol).as("__id") :+
          lit(isLeft).as("__is_left"): _*)
    val unioned = side(left, isLeft = true).unionByName(side(right, isLeft = false))
    // right-before-left at equal time: false < true
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__is_left").asc, col("__id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rightId = when(!col("__is_left"), col("__id"))
    val rightT = when(!col("__is_left"), col("__t"))
    unioned
      .withColumn("__right_id", last(rightId, ignoreNulls = true).over(w))
      .withColumn("__right_t", last(rightT, ignoreNulls = true).over(w))
      .filter(col("__is_left"))
      .select(
        keyCols.map(col) :+
          col("__id").as(idCol) :+
          col("__t").as(timeCol) :+
          col("__right_id").as("matched_id") :+
          col("__right_t").as("matched_time") :+
          (col("__t") - col("__right_t")).as("gap"): _*)
  }

  /** Interval (time-range) join — ALL right rows with
    * `left.time - lookback <= right.time <= left.time` per key, not
    * just the latest one ([[asofJoin]]'s top-1 specialization).  The
    * many-match attribution shape: every click within the window
    * before a purchase, every sensor reading around an alarm.
    *
    * Plan shape: an EQUI-join on the key columns (one shuffle both
    * sides, sort-merge or broadcast as size dictates) with the time
    * band as a post-join filter — Spark plans the band predicate
    * inside the join operator, so per-key candidate pairs are the only
    * quadratic term, bounded by events-per-key-per-window.  This is
    * also exactly the batch twin of the STREAMING stream-stream
    * interval join ([[StreamingOps.runIntervalJoinStream]]): same
    * condition, and the band is what lets streaming state expire —
    * a right row older than `lookback` past the watermark can never
    * match again.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], timeCol: String, idCol: String,
      lookback: Long): DataFrame = {
    // lookback is in the NORMALIZED time unit (µs for timestamp
    // inputs, days for dates, the caller's own unit for numerics)
    require(lookback >= 0, s"intervalJoin: lookback=$lookback")
    // the right side's key columns are RENAMED before the join: both
    // sides usually derive from one frame (a type-filtered self-join),
    // and same-named key attributes would force Spark's fragile
    // trivially-true-predicate disambiguation
    val l = left.select(
      keyCols.map(col) :+
        timeExpr(left, timeCol).as("__lt") :+
        col(idCol).as("left_id"): _*)
    val r = right.select(
      keyCols.map(k => col(k).as(s"__rk_$k")) :+
        timeExpr(right, timeCol).as("__rt") :+
        col(idCol).as("right_id"): _*)
    l.join(r,
        keyCols.map(k => col(k) === col(s"__rk_$k")).reduce(_ && _) &&
          col("__rt") >= col("__lt") - lookback && col("__rt") <= col("__lt"))
      .select(
        keyCols.map(col) :+
          col("left_id") :+ col("right_id") :+
          (col("__lt") - col("__rt")).as("gap"): _*)
  }
}
