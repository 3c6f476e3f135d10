package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE-style one-pass corpus profiling: per-column row/null/
  * distinct counts and min/max, as a long (one row per column) frame.
  *
  * Everything is computed in a SINGLE aggregation over one scan —
  * Spark rewrites the multiple `count(distinct …)` with one Expand
  * (|cols|× row fan-out inside the map task, no extra scans or
  * shuffles), then the wide single-row result is unpivoted driver-free
  * with an inline explode.  At 100 TB this is the shape you want:
  * profile cost ≈ one pass, independent of column count in I/O terms.
  *
  * min/max surface as strings so heterogeneous column types share one
  * schema; exact `count(distinct)` keeps the result oracle-comparable,
  * and `approxDistinct = true` swaps in HyperLogLog++ sketches — no
  * Expand, one plain pass — when a ±2% answer is enough (the right
  * default at 100 TB; kept off here because this frame feeds the
  * correctness gate).
  */
object ProfileOps {

  def profile(df: DataFrame, cols: Seq[String], approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: no such column(s): ${missing.mkString(", ")}")
    // the scale path: HyperLogLog++ distincts need no Expand at all —
    // ONE un-expanded pass with an O(2^p)-byte sketch per column —
    // at the documented ~2% relative error (the default rsd)
    def distinctOf(c: String): Column =
      if (approxDistinct) approx_count_distinct(col(c))
      else count_distinct(col(c))
    val aggs =
      count(lit(1)).as("__total") +:
      cols.flatMap { c =>
        Seq(
          count(col(c)).as(s"__n__$c"),
          distinctOf(c).as(s"__d__$c"),
          min(col(c)).cast("string").as(s"__min__$c"),
          max(col(c)).cast("string").as(s"__max__$c"))
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(cols.map { c =>
        struct(
          lit(c).as("col_name"),
          col("__total").as("n_rows"),
          (col("__total") - col(s"__n__$c")).as("n_null"),
          col(s"__d__$c").as("n_distinct"),
          col(s"__min__$c").as("min_val"),
          col(s"__max__$c").as("max_val"))
      }: _*)).as("p"))
      .select("p.*")
  }
}
