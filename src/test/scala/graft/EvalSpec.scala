package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.EvalOps

/** Scorecard evaluation metrics (EvalOps): hand-computed exactness for
  * AUC/KS/gains/IV, a brute-force pair-count parity check for the
  * grouped rank-sum AUC (ties included), and the degenerate edges
  * (single-class input, zero-cell IV bins).
  */
class EvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def scored(rows: Seq[(Double, Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("score", "target")
  }

  // ---------------- AUC ----------------

  test("auc: perfect separation is 1, anti-separation is 0") {
    val perfect = scored(Seq((1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)))
    val r = EvalOps.aucReport(perfect, "score", "target").collect()(0)
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("n_pos") == 2L)
    assert(r.getAs[Double]("auc") == 1.0 && r.getAs[Double]("gini") == 1.0)
    val anti = scored(Seq((4.0, 0), (3.0, 0), (2.0, 1), (1.0, 1)))
    assert(EvalOps.aucReport(anti, "score", "target")
      .collect()(0).getAs[Double]("auc") == 0.0)
  }

  test("auc: full ties give exactly 0.5; hand case with partial ties") {
    val tied = scored(Seq((1.0, 0), (1.0, 1), (1.0, 0), (1.0, 1)))
    assert(EvalOps.aucReport(tied, "score", "target")
      .collect()(0).getAs[Double]("auc") == 0.5)
    // scores: pos {2, 3}, neg {1, 3} → pairs: (2>1)=1, (2,3)=0, (3>1)=1,
    // (3,3)=0.5 → AUC = 2.5/4
    val hand = scored(Seq((1.0, 0), (3.0, 0), (2.0, 1), (3.0, 1)))
    assert(EvalOps.aucReport(hand, "score", "target")
      .collect()(0).getAs[Double]("auc") == 2.5 / 4.0)
  }

  test("auc: grouped rank-sum equals brute-force pair counting on a tied mix") {
    // deterministic pseudo-random scores with heavy ties (LCG, mod 7)
    val rows = (0 until 400).map { i =>
      val s = ((i * 1103515245L + 12345L) % 7 + 7) % 7
      val t = if (((i * 7919 + 31) % 13) < 5) 1 else 0
      (s.toDouble, t)
    }
    val got = EvalOps.aucReport(scored(rows), "score", "target")
      .collect()(0).getAs[Double]("auc")
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val wins = (for (p <- pos; q <- neg)
      yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
    val brute = wins / (pos.length.toDouble * neg.length.toDouble)
    assert(math.abs(got - brute) < 1e-12, s"got $got brute $brute")
  }

  test("auc: single-class input reports NULL, not infinity") {
    val onlyPos = scored(Seq((1.0, 1), (2.0, 1)))
    val r = EvalOps.aucReport(onlyPos, "score", "target").collect()(0)
    assert(r.isNullAt(r.fieldIndex("auc")) && r.isNullAt(r.fieldIndex("gini")))
  }

  // ---------------- KS ----------------

  test("ks: hand-computed cut and value; tie-break takes the higher score") {
    // desc scan: score 3 → F1=2/3, F0=0   → diff 2/3  (the max)
    //            score 2 → F1=2/3, F0=1/2 → diff 1/6
    //            score 1 → F1=1,   F0=1   → diff 0
    val df = scored(Seq((3.0, 1), (3.0, 1), (2.0, 0), (1.0, 1), (1.0, 0)))
    val r = EvalOps.ksReport(df, "score", "target").collect()(0)
    assert(r.getAs[Double]("ks") == 2.0 / 3.0)
    assert(r.getAs[Double]("ks_score") == 3.0)
    assert(r.getAs[Long]("n_pos") == 3L && r.getAs[Long]("n_neg") == 2L)
  }

  test("ks: perfect separation reaches 1 at the lowest positive band") {
    val df = scored(Seq((4.0, 1), (3.0, 1), (2.0, 0), (1.0, 0)))
    val r = EvalOps.ksReport(df, "score", "target").collect()(0)
    assert(r.getAs[Double]("ks") == 1.0 && r.getAs[Double]("ks_score") == 3.0)
  }

  test("ks/gains pre-banding: near-unique score reduces to O(bands), totals exact") {
    // 5000 near-unique continuous scores (LCG jitter makes each distinct)
    val rows = (0 until 5000).map { i =>
      val s = i.toDouble + ((i * 1103515245L + 12345L) % 1000) / 1e6
      (s, if ((i * 7919 + 31) % 13 < 4) 1 else 0)
    }
    val df = scored(rows)
    val maxBands = 16
    // the banded valve itself: window input is O(bands), not O(distinct)
    val snapped = EvalOps.banded(df, "score", maxBands)
    val nBands = snapped.select("score").distinct().count()
    assert(nBands <= maxBands + 1,
      s"banding left $nBands distinct scores (> ${maxBands + 1})")
    assert(df.select("score").distinct().count() == 5000L, "fixture not near-unique")
    // totals are untouched by the snap; KS on bands is a valid KS over cuts
    val r = EvalOps.ksReport(df, "score", "target", maxBands = maxBands).collect()(0)
    assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") == 5000L)
    assert(r.getAs[Double]("ks") > 0.0 && r.getAs[Double]("ks") <= 1.0)
    val g = EvalOps.gainsTable(df, "score", "target", maxBands = maxBands).collect()
    assert(g.length.toLong == nBands)
    assert(g.map(_.getAs[Long]("n")).sum == 5000L)
    assert(g.last.getAs[Double]("capture_rate") == 1.0)
    // default (maxBands = 0) is bit-unchanged: one band per distinct score
    assert(EvalOps.gainsTable(df, "score", "target").collect().length == 5000)
    // the same valve on AUC and isotonic: totals exact, blocks bounded
    val a = EvalOps.aucReport(df, "score", "target", maxBands = maxBands).collect()(0)
    assert(a.getAs[Long]("n") == 5000L)
    assert(a.getAs[Double]("auc") > 0.0 && a.getAs[Double]("auc") < 1.0)
    val iso = EvalOps.isotonicCalibrate(df, "score", "target",
      maxGroups = maxBands + 1, maxBands = maxBands).collect()
    assert(iso.map(_.getAs[Long]("n")).sum == 5000L)
    assert(iso.length.toLong <= nBands)
  }

  test("auc/ks/gains fail loudly on an unbanded near-unique score") {
    // 200 distinct scores against a 50-group cap: the old behavior was
    // a silent single-task window over every distinct score.  The gate
    // is fused into the metric's plan, so the failure surfaces at
    // ACTION time (the assert_true projection) — walk the cause chain
    // for the diagnostic.
    val rows = (0 until 200).map(i => (i + i / 1e4, i % 3 min 1))
    val df = scored(rows)
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    Seq[(String, () => Unit)](
      "aucReport" -> (() => EvalOps.aucReport(df, "score", "target",
        maxGroups = 50).collect()),
      "ksReport" -> (() => EvalOps.ksReport(df, "score", "target",
        maxGroups = 50).collect()),
      "gainsTable" -> (() => EvalOps.gainsTable(df, "score", "target",
        maxGroups = 50).collect())
    ).foreach { case (name, run) =>
      val ex = intercept[Exception](run())
      assert(chain(ex).exists(_.contains("more than 50 distinct scores")),
        s"$name: ${chain(ex)}")
    }
    // maxBands > 0 exempts the guard AND bounds the window input
    val banded = EvalOps.gainsTable(df, "score", "target",
      maxBands = 8, maxGroups = 50).collect()
    assert(banded.length <= 9 && banded.map(_.getAs[Long]("n")).sum == 200L)
    assert(EvalOps.aucReport(df, "score", "target",
      maxBands = 8, maxGroups = 50).collect()(0).getAs[Long]("n") == 200L)
    // at or under the cap the unbanded exact path is untouched
    assert(EvalOps.ksReport(df, "score", "target", maxGroups = 200)
      .collect()(0).getAs[Long]("n_pos") > 0L)
  }

  test("guard is fused into the metric's ONE pass (no second aggregation)") {
    // r12 regression: the guard ran `g.count()` as a separate job and
    // the metric then re-ran the same corpus groupBy — two full scans.
    // The gate is now IN the metric's plan: a limit bounding the
    // window input + an assert on a count riding the existing pass.
    // Pin the shape: exactly ONE corpus aggregation pair (partial +
    // final HashAggregate over the input), no cache, a GlobalLimit,
    // and numbers identical to the unguarded escape.
    val rows = (0 until 150).map(i => ((i / 10).toDouble, i % 2))
    val df = scored(rows)
    // maxGroups below the input's provable maxRows, so the bounding
    // limit survives optimization (with the default 2^20 cap over a
    // 150-row LocalRelation, EliminateLimits correctly folds it —
    // the 15 grouped rows still pass the gate either way)
    val auc = EvalOps.aucReport(df, "score", "target", maxGroups = 100)
    val aucRow = auc.collect()(0)
    val plan = auc.queryExecution.executedPlan.toString
    assert(!plan.contains("InMemoryTableScan"), "fused gate must not cache")
    assert(plan.contains("Limit"), "fused gate bounds the window input")
    // ONE scan of the input: a second aggregation (the r12 wart) would
    // scan the source twice (count inside the FINAL adaptive plan only
    // — the "Initial Plan" section repeats every node)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val scans = "LocalTableScan".r.findAllIn(finalPlan).length
    assert(scans == 1, s"expected ONE input scan, plan had $scans:\n$finalPlan")
    val off = EvalOps.aucReport(df, "score", "target", maxGroups = 0)
      .collect()(0)
    assert(off.getAs[Double]("auc") == aucRow.getAs[Double]("auc"))
    assert(off.getAs[Long]("n") == aucRow.getAs[Long]("n"))
    // ks/gains: same fused shape, same values as their escapes
    val ks = EvalOps.ksReport(df, "score", "target")
    assert(!ks.queryExecution.executedPlan.toString.contains("InMemoryTableScan"))
    assert(ks.collect()(0).getAs[Double]("ks") ==
      EvalOps.ksReport(df, "score", "target", maxGroups = 0)
        .collect()(0).getAs[Double]("ks"))
    val gains = EvalOps.gainsTable(df, "score", "target").collect()
    val gainsOff = EvalOps.gainsTable(df, "score", "target", maxGroups = 0).collect()
    assert(gains.toSeq == gainsOff.toSeq)
  }

  test("isotonicFitPerScore: expansion of the block table, minimax values") {
    // crafted violations: rates 0.5, 0.2, 0.8 → first two pool to 0.35
    val df = scored(Seq(
      (1.0, 1), (1.0, 0), (1.0, 1), (1.0, 0), (1.0, 1), (1.0, 0),
      (1.0, 1), (1.0, 0), (1.0, 1), (1.0, 0), // score 1: 5/10
      (2.0, 1), (2.0, 1), (2.0, 0), (2.0, 0), (2.0, 0),
      (2.0, 0), (2.0, 0), (2.0, 0), (2.0, 0), (2.0, 0), // score 2: 2/10
      (3.0, 1), (3.0, 1), (3.0, 1), (3.0, 1), (3.0, 0))) // score 3: 4/5
    val per = EvalOps.isotonicFitPerScore(df, "score", "target")
      .collect().map(r =>
        (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(per.toSeq == Seq(
      (1.0, 10L, 5L, 7.0 / 20.0), (2.0, 10L, 2L, 7.0 / 20.0),
      (3.0, 5L, 4L, 4.0 / 5.0)))
    // coherent with the block view: same fitted value per member score
    val blocks = EvalOps.isotonicCalibrate(df, "score", "target")
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(5)))
    assert(blocks.toSeq == Seq((1.0, 2.0, 0.35), (3.0, 3.0, 0.8)))
    // minimax brute force agrees on every score
    val g = Seq((1.0, 10L, 5L), (2.0, 10L, 2L), (3.0, 5L, 4L))
    g.indices.foreach { i =>
      val mm = (0 to i).map { j =>
        (i until g.length).map { k =>
          val slice = g.slice(j, k + 1)
          slice.map(_._3).sum.toDouble / slice.map(_._2).sum.toDouble
        }.min
      }.max
      assert(per(i)._4 == mm, s"score ${g(i)._1}")
    }
  }

  test("isotonicFitPerScoreBySegment: each segment pools independently") {
    import spark.implicits._
    // segment A: violation (pools to 7/20); segment B: already monotone
    val df = (Seq.fill(5)(("A", 1.0, 1)) ++ Seq.fill(5)(("A", 1.0, 0)) ++
      Seq.fill(2)(("A", 2.0, 1)) ++ Seq.fill(8)(("A", 2.0, 0)) ++
      Seq.fill(1)(("B", 1.0, 1)) ++ Seq.fill(9)(("B", 1.0, 0)) ++
      Seq.fill(5)(("B", 2.0, 1)) ++ Seq.fill(5)(("B", 2.0, 0)))
      .toDF("seg", "score", "target")
    val got = EvalOps.isotonicFitPerScoreBySegment(
        df, Seq("seg"), "score", "target")
      .collect().map(r => ((r.getString(0), r.getDouble(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(("A", 1.0)) == ((10L, 5L, 7.0 / 20.0)))
    assert(got(("A", 2.0)) == ((10L, 2L, 7.0 / 20.0)))
    assert(got(("B", 1.0)) == ((10L, 1L, 0.1)))
    assert(got(("B", 2.0)) == ((10L, 5L, 0.5)))
    // each segment matches the global form run on its own slice
    Seq("A", "B").foreach { s =>
      val solo = EvalOps.isotonicFitPerScore(
          df.where(col("seg") === s), "score", "target")
        .collect().map(r => r.getDouble(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      solo.foreach { case (sc, v) => assert(got((s, sc)) == v, s"$s/$sc") }
    }
  }

  test("isotonicFitPerScoreBySegment: distributed fallback is bit-equal to driver path") {
    import spark.implicits._
    // 12 segments × 40 scores with crafted violations; LCG targets so
    // both paths fold the identical exact-integer counts
    val rows = for {
      seg <- 0 until 12; i <- 0 until 40
      rep <- 0 until (1 + (seg * 40 + i) % 3)
    } yield (s"seg$seg", i.toDouble + (if (i % 5 == 0) 100 else 0),
      if ((seg * 7919 + i * 31 + rep * 13) % 11 < 4) 1 else 0)
    val df = rows.toDF("seg", "score", "target")
    def run(cap: Int) = EvalOps.isotonicFitPerScoreBySegment(
        df, Seq("seg"), "score", "target", maxGroups = cap)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2))
    val driver = run(1 << 20) // 480 groups ≤ cap → driver stacks
    val dist = run(100)       // 480 groups > cap → executor stacks
    assert(driver.length == 12 * 40)
    assert(dist.toSeq == driver.toSeq)
    // fitted values are monotone within every segment (sanity)
    driver.groupBy(_._1).values.foreach { seg =>
      val ps = seg.sortBy(_._2).map(_._5)
      assert(ps.zip(ps.tail).forall { case (a, b) => a <= b })
    }
  }

  // ---------------- gains table ----------------

  test("gains table: hand-computed bands, captures, and lift") {
    // bands desc: 3.0 (n=2, bads=2), 2.0 (n=2, bads=1), 1.0 (n=4, bads=1)
    val df = scored(Seq(
      (3.0, 1), (3.0, 1), (2.0, 1), (2.0, 0),
      (1.0, 1), (1.0, 0), (1.0, 0), (1.0, 0)))
    val rows = EvalOps.gainsTable(df, "score", "target").collect()
    assert(rows.map(_.getAs[Int]("band")).toSeq == Seq(1, 2, 3))
    val b1 = rows(0)
    assert(b1.getAs[Double]("score") == 3.0 && b1.getAs[Long]("n") == 2L)
    assert(b1.getAs[Double]("bad_rate") == 1.0)
    assert(b1.getAs[Double]("pop_share") == 0.25)
    assert(b1.getAs[Double]("capture_rate") == 0.5)
    assert(b1.getAs[Double]("lift") == 2.0) // 50% of bads in 25% of pop
    val b3 = rows(2)
    assert(b3.getAs[Long]("cum_n") == 8L && b3.getAs[Long]("cum_bads") == 4L)
    assert(b3.getAs[Double]("capture_rate") == 1.0 && b3.getAs[Double]("lift") == 1.0)
  }

  // ---------------- IV ranking ----------------

  private def ivFrame(rows: Seq[(Double, Double, Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("x", "y", "target")
  }

  test("iv ranking: hand-computed IV, signal ranks above noise") {
    // x bins at edge 0: bin0 = {4 goods, 1 bad}, bin1 = {1 good, 4 bads}
    // shares: bin0 bad 1/5 good 4/5, bin1 bad 4/5 good 1/5
    // IV = 2 · (4/5 − 1/5) · ln(4) = 1.2 ln 4
    // y is the constant 1 → single bin → zero-cell-free but no split →
    // its only bin has bad_share = good_share = 1 → term ln(1)·0 = 0
    val rows = Seq(
      (-1.0, 1.0, 0), (-1.0, 1.0, 0), (-1.0, 1.0, 0), (-1.0, 1.0, 0), (-1.0, 1.0, 1),
      (1.0, 1.0, 1), (1.0, 1.0, 1), (1.0, 1.0, 1), (1.0, 1.0, 1), (1.0, 1.0, 0))
    val got = EvalOps.ivRanking(ivFrame(rows), "target",
      Seq("x" -> Seq(0.0), "y" -> Seq(0.0)))
      .collect().map(r => (r.getAs[String]("variable"),
        r.getAs[Double]("iv"), r.getAs[Long]("rank")))
    val expIv = 2.0 * (4.0 / 5.0 - 1.0 / 5.0) * math.log(4.0)
    assert(got(0)._1 == "x" && math.abs(got(0)._2 - expIv) < 1e-12)
    assert(got(0)._3 == 1L)
    assert(got(1)._1 == "y" && got(1)._2 == 0.0 && got(1)._3 == 2L)
  }

  test("iv ranking: a bin with zero goods or zero bads contributes 0, not infinity") {
    // bin0 = all goods (zero bads) → guarded term 0; bin1 mixed
    val rows = Seq(
      (-1.0, 0.0, 0), (-1.0, 0.0, 0),
      (1.0, 0.0, 1), (1.0, 0.0, 0))
    val got = EvalOps.ivRanking(ivFrame(rows), "target", Seq("x" -> Seq(0.0)))
      .collect()(0).getAs[Double]("iv")
    // only bin1 contributes: bad_share 1/1, good_share 1/3 →
    // (1 − 1/3) · ln(3)
    val exp = (1.0 - 1.0 / 3.0) * math.log(3.0)
    assert(!got.isInfinite && math.abs(got - exp) < 1e-12)
  }

  test("iv ranking: rejects unknown columns and unsorted edges") {
    val df = ivFrame(Seq((1.0, 2.0, 0)))
    intercept[IllegalArgumentException] {
      EvalOps.ivRanking(df, "target", Seq("nope" -> Seq(0.0)))
    }
    intercept[IllegalArgumentException] {
      EvalOps.ivRanking(df, "target", Seq("x" -> Seq(1.0, 0.0)))
    }
  }
}
