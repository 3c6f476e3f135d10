package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scorecard evaluation metrics — the numbers a user of a WoE-binning
  * library (reference: woe_monotonic_binning/binning.py, which emits
  * the bins these metrics grade) computes right after `apply_bins`:
  * exact AUC/Gini, the KS statistic, a gains/lift table by score band,
  * and fixed-bin information-value ranking across candidate variables.
  *
  * Scale design (100 TB): every metric here reduces the corpus with ONE
  * hash aggregation to a per-distinct-score (or per-bin) frame before
  * any window/sort runs.  A model score is a function of its bins, so
  * the grouped frame is O(bins) — tens of rows — and the unpartitioned
  * windows below run over THAT, never over the input.  (For a raw
  * continuous score, pre-band through `QuantileOps` first; grouping by
  * an unbounded-cardinality score would defeat the reduction.)  All
  * ratios are single divisions of exact integer counts, so results
  * replay bit-for-bit in any engine.
  */
object EvalOps extends Serializable {

  private def grouped(df: DataFrame, scoreCol: String, targetCol: String) =
    df.groupBy(col(scoreCol).cast("double").as("score"))
      .agg(count(lit(1)).as("n"), sum(col(targetCol).cast("bigint")).as("bads"))

  /** Fail-loud cardinality gate for the grouped per-score frame — the
    * [[isotonicCalibrate]] contract applied to every metric whose
    * cumulative window is unpartitioned.  An UNBANDED raw continuous
    * score (near-unique values) would silently turn that window into a
    * one-task pass over ~n rows.  A banded call is exempt: the
    * quantile snap already bounds the frame at O(maxBands).
    *
    * FUSED INTO THE METRIC'S OWN PASS — zero extra jobs, zero persist,
    * ONE corpus aggregation.  Two pieces cooperate:
    *
    *   1. `limit(maxGroups + 1)` here bounds the window's input: a
    *      within-contract frame (≤ maxGroups rows) passes through
    *      UNCHANGED, while a pathological frame is truncated BEFORE
    *      the single-task sort — the expensive degradation (a global
    *      sort of billions of grouped rows in one task) is pre-empted
    *      by the plan itself, not by a separate count job.
    *   2. [[groupGate]] below turns that truncation into a LOUD
    *      failure: a `count` of the grouped rows rides the metric's
    *      existing window/aggregation pass, and an `assert_true`
    *      projection throws (at action time, inside the caller's one
    *      job) the moment the count reaches maxGroups + 1 — silent
    *      truncation is impossible.
    *
    * The r12 form ran a separate `g.count()` job, re-aggregating the
    * corpus (two full scans); the r13 persist form shared the scan via
    * cache but still paid a fixed ~0.3-0.4 s of job/cache overhead per
    * call (BENCH_ab `eval_guard_fused`, EvalGuardProbe4).  This form
    * is plan-shaped like the unguarded metric — same jobs, same
    * exchanges — so the gate costs nothing measurable.
    *
    * `maxGroups <= 0` disables the gate entirely — the expert valve
    * for a score the CALLER already knows is banded (e.g. a scorecard
    * score that is a function of O(bins) WoE values).
    */
  private def guarded(
      g: DataFrame, maxGroups: Int, bandedAlready: Boolean): DataFrame =
    if (bandedAlready || maxGroups <= 0) g
    else g.limit(maxGroups + 1)

  /** The loud half of [[guarded]]: `groups` must carry the metric's
    * own count of grouped rows; rows only pass once the count is
    * proven ≤ maxGroups.  assert_true is non-foldable, so the check
    * survives optimization and fires during the caller's action.
    */
  private def groupGate(
      groups: Column, maxGroups: Int, bandedAlready: Boolean,
      caller: String): Column =
    if (bandedAlready || maxGroups <= 0) lit(true)
    else assert_true(groups <= lit(maxGroups.toLong),
      lit(s"$caller: more than $maxGroups distinct scores — pass " +
        "maxBands > 0 to band inline, pre-band through QuantileOps, " +
        "or raise maxGroups")).isNull

  /** Pre-banding valve for RAW CONTINUOUS scores: snap the score to
    * the lower edge of its approx-quantile bucket (the codegen'd
    * `WoeBinning.snapToEdges` binary search) so the downstream
    * unpartitioned cumulative windows see O(maxBands) rows instead of
    * O(distinct).  `maxBands <= 0` (the default everywhere) is a
    * no-op — banded scorecard scores are already O(bins) and must not
    * be perturbed.  Banding changes the reported cut resolution (a
    * documented semantics knob, like fit's `maxDistinct`), never the
    * totals: counts aggregate exactly within each band.
    */
  private[graft] def banded(df: DataFrame, scoreCol: String, maxBands: Int): DataFrame =
    if (maxBands <= 0) df
    else {
      val probs = (0 to maxBands).map(_.toDouble / maxBands).toArray
      val edges = df.stat.approxQuantile(scoreCol, probs, 1e-4).distinct.sorted
      if (edges.length <= 2) df
      else graft.spark.WoeBinning.snapToEdges(
        df.withColumn(scoreCol, col(scoreCol).cast("double")), scoreCol,
        edges.toIndexedSeq)
    }

  /** Exact tie-corrected AUC via the grouped Mann–Whitney rank sum.
    *
    * With per-score counts, the average rank of a tie group is
    * `below + (n+1)/2`, so TWICE the positive rank sum —
    * `Σ bads·(2·below + n + 1)` — stays integer, and
    * `AUC = (2·ranksum⁺ − n₁(n₁+1)) / (2·n₀·n₁)` is one exact-integer
    * division.  No per-row ranking ever happens: the corpus is reduced
    * by the single groupBy above, and the rank window runs over the
    * O(distinct score) grouped frame (single-partition by design —
    * bounded, documented, and the same trade `ProfileOps.keySkew`
    * makes after its top-k cut).
    *
    * `maxBands > 0` routes a raw continuous score through the
    * [[banded]] quantile snap first (same valve as [[ksReport]];
    * banding coarsens tie groups, so the AUC becomes the banded-score
    * AUC); default off.  Unbanded calls are [[guarded]]: more than
    * `maxGroups` distinct scores throws instead of silently running
    * the rank window in one task.
    */
  def aucReport(df: DataFrame, scoreCol: String, targetCol: String,
      maxBands: Int = 0, maxGroups: Int = 1 << 20): DataFrame =
    aucCore(banded(df, scoreCol, maxBands), scoreCol, targetCol, Nil,
      guard = g => guarded(g, maxGroups, maxBands > 0),
      gate = c => groupGate(c, maxGroups, maxBands > 0, "aucReport"))

  /** [[aucReport]] per segment (e.g. language, source, vintage) in ONE
    * pass: the rank window partitions BY SEGMENT, so unlike the global
    * report there is no single-partition reduction anywhere — segments
    * rank in parallel, and the grouped frame is O(segments × bins).
    * The fairness/stability slice a scorecard review always asks for.
    */
  def aucBySegment(
      df: DataFrame, scoreCol: String, targetCol: String,
      segCols: Seq[String]): DataFrame = {
    require(segCols.nonEmpty, "aucBySegment: need at least one segment column")
    aucCore(df, scoreCol, targetCol, segCols)
      .orderBy(segCols.map(col): _*)
  }

  private def aucCore(
      df: DataFrame, scoreCol: String, targetCol: String,
      segCols: Seq[String],
      guard: DataFrame => DataFrame = identity,
      gate: Column => Column = _ => lit(true)): DataFrame = {
    val g = guard(df
      .groupBy(segCols.map(col) :+ col(scoreCol).cast("double").as("score"): _*)
      .agg(count(lit(1)).as("n"), sum(col(targetCol).cast("bigint")).as("bads")))
    val w = Window.partitionBy(segCols.map(col): _*)
      .orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = g.withColumn("below", coalesce(sum("n").over(w), lit(0L)))
    // the rank sum is O(n²·bad_rate): past ~3e9 rows it exceeds Int64,
    // so it accumulates as decimal(38,0) — exact out to ~1e38, and the
    // decimal arithmetic only ever touches the O(bins) grouped rows
    val dec = "decimal(38,0)"
    ranked
      .groupBy(segCols.map(col): _*)
      .agg(
        sum("n").as("n"),
        sum("bads").as("n_pos"),
        (sum("n") - sum("bads")).as("n_neg"),
        sum(col("bads").cast(dec)
          * (lit(2L) * col("below") + col("n") + lit(1L)).cast(dec))
          .as("ranksum2"),
        // grouped-row census for the fail-loud gate — rides this agg
        count(lit(1)).as("__g"))
      .where(gate(col("__g")))
      .select(
        segCols.map(col) ++ Seq(
          col("n"), col("n_pos"), col("n_neg"),
          // single-class input has no ranking to grade — NULL, not ±Inf
          when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null).cast("double"))
            .otherwise(
              (col("ranksum2") - col("n_pos").cast(dec) * (col("n_pos") + lit(1L)).cast(dec))
                .cast("double")
                / (lit(2L).cast(dec) * col("n_neg").cast(dec) * col("n_pos").cast(dec))
                  .cast("double")).as("auc")): _*)
      .withColumn("gini", lit(2.0) * col("auc") - lit(1.0))
  }

  /** Kolmogorov–Smirnov separation: max over score cuts of
    * |F_bad − F_good| scanning scores DESCENDING (risk-ordered, the
    * scorecard convention).  Cumulative shares are divisions of exact
    * integers, so both engines compare identical doubles; the argmax
    * tie-break (higher diff first, then higher score) is total, so the
    * reported cut is deterministic.  Returns one row:
    * (ks, ks_score, n_pos, n_neg).
    *
    * `maxBands > 0` routes a raw continuous score through the
    * [[banded]] quantile snap first, bounding the cumulative window's
    * input at O(maxBands); default off (exact per-distinct-score KS).
    * Unbanded calls are [[guarded]] at `maxGroups` distinct scores.
    */
  def ksReport(df: DataFrame, scoreCol: String, targetCol: String,
      maxBands: Int = 0, maxGroups: Int = 1 << 20): DataFrame = {
    val g = guarded(grouped(banded(df, scoreCol, maxBands), scoreCol, targetCol),
      maxGroups, maxBands > 0)
    val wTot = Window.partitionBy()
    val wCum = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = g
      .withColumn("tot_bads", sum("bads").over(wTot))
      .withColumn("tot_goods", sum(col("n") - col("bads")).over(wTot))
      .withColumn("cum_bads", sum("bads").over(wCum))
      .withColumn("cum_goods", sum(col("n") - col("bads")).over(wCum))
      .withColumn("diff",
        abs(col("cum_bads").cast("double") / col("tot_bads").cast("double")
          - col("cum_goods").cast("double") / col("tot_goods").cast("double")))
      // grouped-row census for the fail-loud gate — rides wTot
      .withColumn("__g", count(lit(1)).over(wTot))
    cum.orderBy(col("diff").desc, col("score").desc).limit(1)
      .where(groupGate(col("__g"), maxGroups, maxBands > 0, "ksReport"))
      .select(
        col("diff").as("ks"),
        col("score").as("ks_score"),
        col("tot_bads").as("n_pos"),
        col("tot_goods").as("n_neg"))
  }

  /** Gains/lift table by score band, riskiest (highest score) first:
    * per band size/bads/bad-rate plus cumulative population share,
    * bad-capture rate, and lift — the table that decides a scorecard
    * cutoff.  One aggregation to O(bands) rows; the cumulative window
    * runs over those rows only.  Every ratio divides exact integers.
    *
    * `maxBands > 0` routes a raw continuous score through the
    * [[banded]] quantile snap first (one band row per bucket); default
    * off.  Unbanded calls are [[guarded]] at `maxGroups` distinct
    * scores.
    */
  def gainsTable(df: DataFrame, scoreCol: String, targetCol: String,
      maxBands: Int = 0, maxGroups: Int = 1 << 20): DataFrame = {
    val g = guarded(grouped(banded(df, scoreCol, maxBands), scoreCol, targetCol),
      maxGroups, maxBands > 0)
    val wTot = Window.partitionBy()
    val wCum = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    g.withColumn("band", row_number().over(Window.orderBy(col("score").desc)))
      .withColumn("tot_n", sum("n").over(wTot))
      .withColumn("tot_bads", sum("bads").over(wTot))
      .withColumn("cum_n", sum("n").over(wCum))
      .withColumn("cum_bads", sum("bads").over(wCum))
      // grouped-row census for the fail-loud gate — rides wTot (a
      // window can't live in a WHERE, so it lands as a column first)
      .withColumn("__g", count(lit(1)).over(wTot))
      .where(groupGate(col("__g"), maxGroups, maxBands > 0, "gainsTable"))
      .select(
        col("band"), col("score"), col("n"), col("bads"),
        (col("bads").cast("double") / col("n").cast("double")).as("bad_rate"),
        col("cum_n"), col("cum_bads"),
        (col("cum_n").cast("double") / col("tot_n").cast("double")).as("pop_share"),
        (col("cum_bads").cast("double") / col("tot_bads").cast("double")).as("capture_rate"),
        ((col("cum_bads").cast("double") / col("tot_bads").cast("double"))
          / (col("cum_n").cast("double") / col("tot_n").cast("double"))).as("lift"))
      .orderBy("band")
  }

  /** Information-value ranking of candidate variables over FIXED bin
    * edges (ascending interior edges; value ≤ edge → that bin, else
    * the last bin — the same right-closed convention as the golden
    * apply path).  IV = Σ_bins (bad% − good%)·ln(bad%/good%), with the
    * standard zero-cell guard (a bin with no goods or no bads
    * contributes 0 rather than ±∞).
    *
    * The melt is an inline explode (rows × variables fan-out inside
    * the map task, like `ProfileOps.profile`), the bucket assignment a
    * literal when-chain, and the only shuffle is the (variable, bin)
    * aggregation to O(Σ bins) rows; per-variable totals come from a
    * window over that tiny frame.  Ranking ties break by variable name
    * so the output is total-ordered.
    */
  def ivRanking(
      df: DataFrame,
      targetCol: String,
      bins: Seq[(String, Seq[Double])]): DataFrame = {
    require(bins.nonEmpty, "ivRanking: need at least one (variable, edges) pair")
    bins.foreach { case (v, es) =>
      require(df.columns.contains(v), s"ivRanking: no such column: $v")
      require(es.nonEmpty && es == es.sorted, s"ivRanking: edges for $v must ascend")
    }
    val melted = df.select(
      col(targetCol).cast("bigint").as("t"),
      explode(array(bins.map { case (v, es) =>
        val bucket = es.zipWithIndex.foldRight(lit(es.length)) {
          case ((e, i), rest) => when(col(v).cast("double") <= lit(e), lit(i)).otherwise(rest)
        }
        struct(lit(v).as("variable"), bucket.as("bin"))
      }: _*)).as("m"))
      .select(col("m.variable").as("variable"), col("m.bin").as("bin"), col("t"))
    val perBin = melted.groupBy("variable", "bin")
      .agg(count(lit(1)).as("n"), sum("t").as("bads"))
      .withColumn("goods", col("n") - col("bads"))
    val wVar = Window.partitionBy("variable")
    val shares = perBin
      .withColumn("tot_bads", sum("bads").over(wVar))
      .withColumn("tot_goods", sum("goods").over(wVar))
      .withColumn("bad_share", col("bads").cast("double") / col("tot_bads").cast("double"))
      .withColumn("good_share", col("goods").cast("double") / col("tot_goods").cast("double"))
      .withColumn("term",
        when(col("bads") === 0L || col("goods") === 0L, lit(0.0))
          .otherwise((col("bad_share") - col("good_share"))
            * log(col("bad_share") / col("good_share"))))
    // headline IV: fold the <=O(bins) terms in BIN ORDER (sort_array on
    // the (bin, term) structs, then a left-to-right IEEE fold) — a
    // plain float sum() would depend on partial-aggregation order and
    // break bit-replay; the oracle does the same with an ordered sum
    shares.groupBy("variable")
      .agg(aggregate(
        sort_array(collect_list(struct(col("bin"), col("term")))),
        lit(0.0),
        (acc, x) => acc + x("term")).as("iv"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("iv").desc, col("variable")))
          .cast("bigint"))
      .orderBy("rank")
  }

  /** Isotonic (PAV) calibration of the observed bad rate as a
    * NON-DECREASING step function of the score: the standard
    * score → probability-of-default map, and the natural companion to
    * the reference's monotone binning (same pool-adjacent-violators
    * idea `core/Kernels.monotonePool` applies with the reference's
    * significance rules; this is the classic unweighted-mean PAV).
    *
    * Pooling decisions compare rates by EXACT INTEGER cross-
    * multiplication (`bads_i·n_j > bads_j·n_i`, in BigInt so no count
    * magnitude can overflow) — no float comparison anywhere, so the
    * block structure is bit-deterministic on any JVM and the only
    * floats in the output are one division per block.  Equal rates do
    * NOT pool: the fitted values are already monotone, and keeping the
    * blocks separate preserves the score resolution.
    *
    * Scale: one hash aggregation reduces the corpus to per-distinct-
    * score exact counts; PAV itself is a driver-side O(distinct)
    * stack pass over that bounded frame (`maxGroups` fails loudly
    * BEFORE collecting if the score is not banded — pre-band raw
    * continuous scores through QuantileOps, same contract as the
    * other metrics here, or pass `maxBands > 0` to run the [[banded]]
    * quantile snap inline).
    */
  /** (loIdx, hiIdx, n, bads) PAV blocks over ascending grouped rows
    * `(score, n, bads)` — the stack pass shared by
    * [[isotonicCalibrate]], [[isotonicFitPerScore]], and the
    * per-segment flavor.
    */
  private final case class PavBlock(lo: Int, hi: Int, n: Long, bads: Long)

  private def pavStack(g: IndexedSeq[(Double, Long, Long)]): Seq[PavBlock] = {
    val stack = scala.collection.mutable.ArrayBuffer.empty[PavBlock]
    g.zipWithIndex.foreach { case (r, i) =>
      var cur = PavBlock(i, i, r._2, r._3)
      // pool while the previous block's rate STRICTLY exceeds ours
      while (stack.nonEmpty &&
        BigInt(stack.last.bads) * cur.n > BigInt(cur.bads) * stack.last.n) {
        val p = stack.remove(stack.length - 1)
        cur = PavBlock(p.lo, cur.hi, p.n + cur.n, p.bads + cur.bads)
      }
      stack += cur
    }
    stack.toSeq
  }

  private def collectGrouped(
      df: DataFrame, scoreCol: String, targetCol: String,
      maxGroups: Int, maxBands: Int, caller: String): Array[org.apache.spark.sql.Row] = {
    val g = grouped(banded(df, scoreCol, maxBands), scoreCol, targetCol)
      .orderBy("score")
      .limit(maxGroups + 1)
      .collect()
    require(g.length <= maxGroups,
      s"$caller: more than $maxGroups distinct scores — " +
        "band the score first (QuantileOps) or raise maxGroups")
    g
  }

  def isotonicCalibrate(
      df: DataFrame, scoreCol: String, targetCol: String,
      maxGroups: Int = 1 << 20, maxBands: Int = 0): DataFrame = {
    val g = collectGrouped(df, scoreCol, targetCol, maxGroups, maxBands,
      "isotonicCalibrate")
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toIndexedSeq
    val spark = df.sparkSession
    import spark.implicits._
    pavStack(g).zipWithIndex.map { case (b, i) =>
      (i + 1L, g(b.lo)._1, g(b.hi)._1, b.n, b.bads,
        b.bads.toDouble / b.n.toDouble)
    }.toDF("block", "score_lo", "score_hi", "n", "bads", "p_cal")
  }

  /** Per-DISTINCT-SCORE isotonic fit: `(score, n, bads, p_cal)` with
    * every score carrying its PAV block's pooled rate — the applyable
    * score → probability map (vs [[isotonicCalibrate]]'s block view).
    * The fitted VALUES are the unique L2 isotonic regression, which
    * the minimax characterization `p_cal(i) = max_{j≤i} min_{k≥i}
    * mean(j..k)` replays in plain SQL from the same exact integer
    * sums — so unlike the block table (whose equal-rate split is an
    * algorithmic choice), this surface has a TRUE independent oracle.
    */
  def isotonicFitPerScore(
      df: DataFrame, scoreCol: String, targetCol: String,
      maxGroups: Int = 1 << 20, maxBands: Int = 0): DataFrame = {
    val g = collectGrouped(df, scoreCol, targetCol, maxGroups, maxBands,
      "isotonicFitPerScore")
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toIndexedSeq
    val spark = df.sparkSession
    import spark.implicits._
    pavStack(g).flatMap { b =>
      val p = b.bads.toDouble / b.n.toDouble
      (b.lo to b.hi).map(i => (g(i)._1, g(i)._2, g(i)._3, p))
    }.toDF("score", "n", "bads", "p_cal")
  }

  /** [[isotonicFitPerScore]] PER SEGMENT — calibration-within-group,
    * the fairness companion of [[aucBySegment]] (a score calibrated
    * globally is routinely MIS-calibrated inside each segment; this
    * returns each segment's own monotone score → probability map).
    * One hash aggregation reduces the corpus to per-(segment, score)
    * exact counts.  At or below `maxGroups` TOTAL grouped rows the PAV
    * stacks run on the driver (one collect, no second shuffle); above
    * it the SAME stack pass runs per segment INSIDE the executors —
    * hash-repartition on the segment columns, sort each partition by
    * (segment, score), and stream consecutive same-segment runs
    * through [[pavStack]].  Segment counts grow multiplicatively
    * (language × source × vintage) at corpus scale, so the distributed
    * path is the 100 TB shape: per-task memory is one segment's
    * distinct-score frame, never the total.  Both paths run the
    * identical exact-integer pooling, so their outputs are bit-equal
    * (EvalSpec pins it).  Output: `(segCols…, score, n, bads, p_cal)`.
    */
  def isotonicFitPerScoreBySegment(
      df: DataFrame, segCols: Seq[String], scoreCol: String,
      targetCol: String, maxGroups: Int = 1 << 20): DataFrame = {
    require(segCols.nonEmpty, "isotonicFitPerScoreBySegment: need segment columns")
    val segN = segCols.length
    val grouped = df
      .groupBy(segCols.map(col) :+ col(scoreCol).cast("double").as("score"): _*)
      .agg(count(lit(1)).as("n"), sum(col(targetCol).cast("bigint")).as("bads"))
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      grouped.schema.take(segN) ++ Seq(
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("bads",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("p_cal",
          org.apache.spark.sql.types.DoubleType, nullable = false)))
    // emit one segment's fitted rows from its score-ascending run
    def fitRun(segRows: IndexedSeq[org.apache.spark.sql.Row]): Seq[org.apache.spark.sql.Row] = {
      val g = segRows
        .map(r => (r.getDouble(segN), r.getLong(segN + 1), r.getLong(segN + 2)))
      pavStack(g).flatMap { b =>
        val p = b.bads.toDouble / b.n.toDouble
        (b.lo to b.hi).map { i =>
          // Seq[Any]: a plain Seq would numerically WIDEN the mixed
          // Double/Long elements to all-Double and break the encoder
          org.apache.spark.sql.Row.fromSeq(
            (0 until segN).map(segRows(i).get(_)) ++
              Seq[Any](g(i)._1, g(i)._2, g(i)._3, p))
        }
      }
    }
    val head = grouped
      .orderBy(segCols.map(col) :+ col("score"): _*)
      .limit(maxGroups + 1)
      .collect()
    if (head.length <= maxGroups) {
      // driver fast path: rows arrive score-ascending within each segment
      val out = head.groupBy(r => (0 until segN).map(r.get(_)).toIndexedSeq)
        .toSeq
        .flatMap { case (_, segRows) => fitRun(segRows.toIndexedSeq) }
      spark.createDataFrame(spark.sparkContext.parallelize(out, 1), schema)
    } else {
      // distributed fallback: co-locate each segment in one partition,
      // sort it score-ascending, and PAV consecutive same-segment runs
      // with one segment buffered at a time
      val sorted = grouped
        .repartition(segCols.map(col): _*)
        .sortWithinPartitions(segCols.map(col) :+ col("score"): _*)
      val rdd = sorted.rdd.mapPartitions { it =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
        var key: IndexedSeq[Any] = null
        def flush(): Seq[org.apache.spark.sql.Row] =
          if (buf.isEmpty) Nil
          else { val r = fitRun(buf.toIndexedSeq); buf.clear(); r }
        val body = it.flatMap { r =>
          val k = (0 until segN).map(r.get(_))
          if (key == null || k == key) { key = k; buf += r; Iterator.empty }
          else { val done = flush(); key = k; buf += r; done.iterator }
        }
        body ++ new Iterator[org.apache.spark.sql.Row] {
          private var emitted: Iterator[org.apache.spark.sql.Row] = null
          def hasNext: Boolean = { if (emitted == null) emitted = flush().iterator; emitted.hasNext }
          def next(): org.apache.spark.sql.Row = { hasNext; emitted.next() }
        }
      }
      spark.createDataFrame(rdd, schema)
    }
  }
}
