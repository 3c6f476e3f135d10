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

  /** Hot-key skew report for a prospective shuffle/join key: the
    * top-k keys by row count with each key's share of the table and
    * the running cumulative share — the numbers that decide between a
    * plain shuffle, a broadcast, and a salted join BEFORE launching
    * the 100 TB job (`JoinOps.saltedJoin`'s `salt` parameter is sized
    * off exactly this report).  One hash agg, then the rank window
    * runs over the (already tiny relative to the input) per-key count
    * frame; shares are single divisions of exact integers, so they
    * replay bit-for-bit.
    */
  def keySkew(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK > 0, s"keySkew: topK=$topK must be positive")
    // orderBy+limit plans as a distributed TakeOrdered — the billions
    // of per-key counts are NEVER globally sorted; the rank/cum-share
    // window then runs over the ≤ topK surviving rows only.  The
    // per-key count frame is cached (the dedup family's registered
    // persist, released by unpersistAll) so the input scans ONCE:
    // both the top-k and the total derive from the cached counts.
    val counts = DedupOps.registerPersist(
      df.groupBy(col(keyCol).cast("string").as("key"))
        .agg(count(lit(1)).as("n")))
    val top = counts
      .orderBy(col("n").desc, col("key"))
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("key"))
    top.crossJoin(broadcast(counts.agg(sum("n").as("total"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_n",
        sum(col("n")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("share", col("n").cast("double") / col("total"))
      .withColumn("cum_share", col("cum_n").cast("double") / col("total"))
      .select("rank", "key", "n", "share", "cum_share")
  }

  /** Declarative data-quality checks (the Deequ/Great-Expectations
    * shape) evaluated against a frame in as few passes as the check
    * mix allows: every scalar check (completeness, bounds, row count)
    * folds into ONE aggregation over one scan; uniqueness adds one
    * groupBy; referential integrity one anti-join per FK.  Output is
    * the audit table a pipeline gate consumes: `(check, metric,
    * threshold, passed)` — metrics are ratios of exact counts (one
    * division each), so the report replays bit-exactly.
    */
  sealed trait DqCheck { def name: String }
  /** non-null fraction of `col` must be ≥ `minRatio`. */
  case class Complete(col: String, minRatio: Double = 1.0) extends DqCheck {
    val name = s"complete:$col"
  }
  /** fraction of rows inside [lo, hi] (nulls fail) ≥ `minRatio`. */
  case class InRange(col: String, lo: Double, hi: Double,
      minRatio: Double = 1.0) extends DqCheck {
    val name = s"in_range:$col"
  }
  /** distinct(cols) / rows must be ≥ `minRatio` (1.0 = unique key). */
  case class Unique(cols: Seq[String], minRatio: Double = 1.0) extends DqCheck {
    val name = s"unique:${cols.mkString("+")}"
  }
  /** fraction of rows whose `col` exists in `ref.refCol` ≥ minRatio. */
  case class RefIntegrity(col: String, ref: DataFrame, refCol: String,
      minRatio: Double = 1.0) extends DqCheck {
    val name = s"ref:$col"
  }

  def dataQualityReport(df: DataFrame, checks: Seq[DqCheck]): DataFrame = {
    require(checks.nonEmpty, "dataQualityReport: no checks")
    val spark = df.sparkSession
    import spark.implicits._
    // one aggregation for every scalar check + the row count
    val scalarAggs = count(lit(1)).as("__rows") +: checks.collect {
      case c: Complete =>
        count(col(c.col)).as(c.name)
      case c: InRange =>
        sum(when(col(c.col) >= c.lo && col(c.col) <= c.hi, 1L)
          .otherwise(0L)).as(c.name)
    }
    val scalarRow = df.agg(scalarAggs.head, scalarAggs.tail: _*).head()
    val rows = scalarRow.getLong(0)
    val results = checks.map {
      case c: Complete =>
        val m = if (rows == 0) 1.0
          else scalarRow.getAs[Long](c.name).toDouble / rows
        (c.name, m, c.minRatio)
      case c: InRange =>
        val m = if (rows == 0) 1.0
          else scalarRow.getAs[Long](c.name).toDouble / rows
        (c.name, m, c.minRatio)
      case c: Unique =>
        val distinct = df.select(c.cols.map(col): _*).distinct().count()
        val m = if (rows == 0) 1.0 else distinct.toDouble / rows
        (c.name, m, c.minRatio)
      case c: RefIntegrity =>
        val matched = rows - df.join(
          c.ref.select(col(c.refCol).as(c.col)).distinct(),
          Seq(c.col), "left_anti").count()
        val m = if (rows == 0) 1.0 else matched.toDouble / rows
        (c.name, m, c.minRatio)
    }
    results.map { case (n, m, t) => (n, m, t, m >= t) }
      .toDF("check", "metric", "threshold", "passed")
  }

  /** Z-score standardization with integer-exact moments — the feature
    * scaler, done to the engine's determinism bar: the column is
    * quantized to integer units (caller passes e.g. cents), mean and
    * variance come from exact integer Σv and Σv² (order-free under
    * any partitioning; a float `avg`/`stddev` is not), and the
    * per-row z is one IEEE chain over those exact constants — so the
    * standardized value is bit-identical in any engine.  Sample
    * std (n−1); requires n ≥ 2 and non-constant values.
    *
    * Σv² of |v| ≤ V over n rows needs n·V² < 2^63 — at cents
    * precision that is ~10¹⁰ rows of $10k values; past that,
    * pre-aggregate per partition key or drop to decimal(38,0).
    * One global 3-long aggregate (broadcast), then a pure projection.
    */
  def standardize(
      df: DataFrame, idCol: String, valueCol: String): DataFrame = {
    val agg = df.agg(
      count(col(valueCol)).as("n"),
      sum(col(valueCol).cast("long")).as("s"),
      sum(col(valueCol).cast("long") * col(valueCol).cast("long")).as("s2"))
    df.select(col(idCol), col(valueCol).cast("long").as("value"))
      .crossJoin(broadcast(agg))
      .withColumn("mean", col("s").cast("double") / col("n"))
      .withColumn("std",
        sqrt((col("s2").cast("double") - col("s").cast("double")
          * col("s").cast("double") / col("n")) / (col("n") - 1)))
      .withColumn("z",
        (col("value").cast("double") - col("mean")) / col("std"))
      .select(idCol, "value", "mean", "std", "z")
  }

  /** Exact central moments → skewness / excess kurtosis.  Raw power
    * sums Σv..Σv⁴ accumulate as decimal(38,0) (v⁴ of a 10⁶-unit value
    * is 10²⁴ — past Long, far inside 38 digits), so the moments are
    * order-free exact and only the final skew/kurtosis expressions
    * are float — same closed forms, same IEEE chain, any engine.
    * One aggregate, one row out.
    */
  def moments(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("decimal(38,0)")
    df.agg(
        count(col(valueCol)).as("n"),
        sum(v).cast("decimal(38,0)").as("s1"),
        sum(v * v).cast("decimal(38,0)").as("s2"),
        sum(v * v * v).cast("decimal(38,0)").as("s3"),
        sum(v * v * v * v).cast("decimal(38,0)").as("s4"))
      .withColumn("mean", col("s1").cast("double") / col("n"))
      .withColumn("m2",
        col("s2").cast("double") / col("n") - col("mean") * col("mean"))
      .withColumn("m3",
        col("s3").cast("double") / col("n")
          - lit(3.0) * col("mean") * (col("s2").cast("double") / col("n"))
          + lit(2.0) * col("mean") * col("mean") * col("mean"))
      .withColumn("m4",
        col("s4").cast("double") / col("n")
          - lit(4.0) * col("mean") * (col("s3").cast("double") / col("n"))
          + lit(6.0) * col("mean") * col("mean") * (col("s2").cast("double") / col("n"))
          - lit(3.0) * col("mean") * col("mean") * col("mean") * col("mean"))
      // m2·sqrt(m2), not pow(m2, 1.5): sqrt is IEEE-exact everywhere,
      // pow is libm-dependent in the last ulp
      .withColumn("skewness", col("m3") / (col("m2") * sqrt(col("m2"))))
      .withColumn("kurtosis_excess", col("m4") / (col("m2") * col("m2")) - 3.0)
      .select("n", "mean", "m2", "skewness", "kurtosis_excess")
  }

  /** Exact-moment Pearson correlation between two integer columns:
    * all five sums exact decimals, r one float chain — deterministic
    * under any partitioning, unlike `corr()`'s streaming float
    * accumulation.
    */
  def correlation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(38,0)")
    val y = col(yCol).cast("decimal(38,0)")
    df.agg(
        count(lit(1)).as("n"),
        sum(x).cast("decimal(38,0)").as("sx"),
        sum(y).cast("decimal(38,0)").as("sy"),
        sum(x * y).cast("decimal(38,0)").as("sxy"),
        sum(x * x).cast("decimal(38,0)").as("sxx"),
        sum(y * y).cast("decimal(38,0)").as("syy"))
      .withColumn("r",
        (col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
          / (sqrt(col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
            * sqrt(col("n").cast("double") * col("syy").cast("double")
              - col("sy").cast("double") * col("sy").cast("double"))))
      .select("n", "r")
  }

  /** Chi-square contingency cells for two categorical columns: per
    * cell the observed count, expected count (one division of exact
    * integers), and the χ² contribution (one float chain per row) —
    * the independence-test surface, emitted as cells rather than one
    * statistic so no float SUM crosses the engine boundary (the
    * consumer folds the tiny cell frame in any order it likes).
    * Margins broadcast; the data passes once.
    */
  def chiSquareCells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("obs"))
    val aTot = cells.groupBy("a").agg(sum("obs").as("na"))
    val bTot = cells.groupBy("b").agg(sum("obs").as("nb"))
    val tot = cells.agg(sum("obs").as("n"))
    cells
      .join(broadcast(aTot), "a").join(broadcast(bTot), "b")
      .crossJoin(broadcast(tot))
      .withColumn("expected",
        col("na").cast("double") * col("nb").cast("double") / col("n"))
      .withColumn("chi2_term",
        (col("obs").cast("double") - col("expected"))
          * (col("obs").cast("double") - col("expected")) / col("expected"))
      .select(col("a"), col("b"), col("obs").cast("long").as("obs"),
        col("expected"), col("chi2_term"))
  }

  /** k-anonymity suppression over quasi-identifier columns — the
    * release-governance primitive: a row is publishable only if at
    * least `k` rows share its full quasi-identifier combination;
    * smaller groups get their identifiers REPLACED by a suppression
    * marker (collapsing them into one residual group) instead of being
    * dropped, so aggregate totals still reconcile.
    *
    * One groupBy on the quasi-identifier tuple (the counts frame is
    * tiny — bounded by the QI domain, not the data) broadcast back
    * onto the rows: at 100 TB the data passes once and only small
    * state shuffles.  Suppression is all-or-nothing per row (the
    * standard model): partially generalized hierarchies are the
    * caller's pre-processing.
    */
  def kAnonymize(
      df: DataFrame, quasiIds: Seq[String], k: Long,
      marker: String = "*"): DataFrame = {
    require(quasiIds.nonEmpty && k >= 1, s"kAnonymize: quasiIds=$quasiIds k=$k")
    val qi = quasiIds.map(col)
    val counts = df.groupBy(qi: _*).agg(count(lit(1)).as("__qn"))
    val out = df.join(broadcast(counts), quasiIds)
    val keep = col("__qn") >= k
    val masked = quasiIds.foldLeft(out) { (d, q) =>
      d.withColumn(q, when(keep, col(q).cast("string")).otherwise(lit(marker)))
    }
    masked.drop("__qn")
  }

  /** Keyed PSEUDONYMIZATION (GDPR Art. 4(5)): replace each named
    * column's value with a deterministic salted surrogate
    * `md5(salt ':' value)` — identity is severed from the data while
    * JOINS STILL WORK, because the same (salt, value) maps to the same
    * token in every table of the corpus (the property kAnonymize's
    * suppression destroys).  Re-identification requires the salt,
    * which lives outside the data.  NULL stays NULL: an absent
    * attribute carries no identity, and a salt-only token would
    * otherwise make every null row linkable to every other.
    *
    * One codegen'd projection per row — no shuffle, no join, composes
    * with pushdown; values cast to string first so numeric and string
    * keys tokenize identically across tables of different schemas.
    * Replayable by any engine with md5 (the oracle recomputes every
    * token).
    */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame = {
    require(cols.nonEmpty, "pseudonymize: need at least one column")
    require(salt.nonEmpty, "pseudonymize: empty salt defeats the purpose")
    cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c,
        when(col(c).isNull, lit(null).cast("string"))
          .otherwise(md5(concat_ws(":", lit(salt), col(c).cast("string")))))
    }
  }
}
