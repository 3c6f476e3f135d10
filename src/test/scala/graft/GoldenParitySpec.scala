package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.WoeBin
import graft.spark.{WoeBinning, WoeFitOptions}

/** Bit-level (1e-9) parity against golden tables captured by executing
  * the reference library (tools/gen_golden.py → src/test/resources/golden).
  */
class GoldenParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val sf0001 = TestSpark.lcgFrame("/root/testdata/sf0.001").cache()

  private def assertMatches(got: Vector[WoeBin], fixture: String): Unit = {
    val exp = Golden.load(fixture)
    assert(got.length == exp.rows.length,
      s"$fixture: ${got.length} bins vs expected ${exp.rows.length}")
    got.zip(exp.rows).zipWithIndex.foreach { case ((b, row), i) =>
      def d(idx: Int): Double = row(idx) match {
        case x: Double => x
        case null => Double.NaN
        case other => other.toString.toDouble
      }
      assert(b.variable == row(0).toString, s"$fixture row $i variable")
      val fields = Seq(
        "interval_start_include" -> (b.intervalStartInclude, d(1)),
        "interval_end_exclude" -> (b.intervalEndExclude, d(2)),
        "size" -> (b.size, d(3)),
        "mean" -> (b.mean, d(4)),
        "bads" -> (b.bads, d(5)),
        "goods" -> (b.goods, d(6)),
        "dist_good" -> (b.distGood, d(7)),
        "dist_bad" -> (b.distBad, d(8)),
        "woe" -> (b.woe, d(9)),
        "iv_components" -> (b.ivComponents, d(10)))
      fields.foreach { case (name, (g, e)) =>
        assert(Golden.approxEq(g, e), s"$fixture row $i $name: got $g expected $e")
      }
    }
  }

  test("target derivation matches the fixture recipe (sum=3817 at sf0.001)") {
    val s = sf0001.agg(sum("target"), count(lit(1))).head()
    assert(s.getLong(0) == 3817L, s"target sum ${s.getLong(0)}")
    assert(s.getLong(1) == 6000L)
  }

  test("golden: extendedprice sf0.001 n=300 (descending, 12 bins)") {
    val m = WoeBinning.fit(sf0001, "target", Seq("extendedprice"),
      WoeFitOptions(nThreshold = Some(300)))
    assertMatches(m.bins("extendedprice"), "sf0.001_extendedprice_n300.json")
  }

  test("golden: quantity sf0.001 n=300 (degenerate single descending bin)") {
    val m = WoeBinning.fit(sf0001, "target", Seq("quantity"),
      WoeFitOptions(nThreshold = Some(300)))
    assertMatches(m.bins("quantity"), "sf0.001_quantity_n300.json")
  }

  test("golden: discount sf0.001 n=300 (ascending, 2 bins)") {
    val m = WoeBinning.fit(sf0001, "target", Seq("discount"),
      WoeFitOptions(nThreshold = Some(300)))
    assertMatches(m.bins("discount"), "sf0.001_discount_n300.json")
  }

  test("golden: extendedprice sf0.001 n=60 (deeper merge path, 18 bins)") {
    val m = WoeBinning.fit(sf0001, "target", Seq("extendedprice"),
      WoeFitOptions(nThreshold = Some(60)))
    assertMatches(m.bins("extendedprice"), "sf0.001_extendedprice_n60.json")
  }

  test("golden: merge_threshold=0.2 on extendedprice sf0.001") {
    val m = WoeBinning.fit(sf0001, "target", Seq("extendedprice"),
      WoeFitOptions(nThreshold = Some(300), mergeThreshold = Some(0.2)))
    assertMatches(m.bins("extendedprice"), "sf0.001_extendedprice_n300_mt0.2.json")
  }

  test("golden: NaN bin — extendedprice nulled where discount=0") {
    val withNulls = sf0001.withColumn("extendedprice",
      when(col("discount") === 0.0, lit(null)).otherwise(col("extendedprice")))
    val m = WoeBinning.fit(withNulls, "target", Seq("extendedprice"),
      WoeFitOptions(nThreshold = Some(300)))
    assertMatches(m.bins("extendedprice"), "sf0.001_extendedprice_nan_n300.json")
  }

  test("golden: sentinel sep_value=1.0 on quantity sf0.001 n=60") {
    val m = WoeBinning.fit(sf0001, "target", Seq("quantity"),
      WoeFitOptions(nThreshold = Some(60), sepValue = Some(1.0)))
    assertMatches(m.bins("quantity"), "sf0.001_quantity_sep1_n60.json")
  }

  test("golden: sentinel + merge_threshold threaded into both subset fits") {
    val m = WoeBinning.fit(sf0001, "target", Seq("quantity"),
      WoeFitOptions(nThreshold = Some(60), sepValue = Some(1.0),
        mergeThreshold = Some(0.5)))
    assertMatches(m.bins("quantity"), "sf0.001_quantity_sep1_n60_mt05.json")
  }

  test("golden: apply_bins aggregate parity (3-col batch, n=300)") {
    val m = WoeBinning.fit(sf0001, "target",
      Seq("extendedprice", "quantity", "discount"),
      WoeFitOptions(nThreshold = Some(300)))
    val applied = m.transform(sf0001)
    val exp = Golden.load("sf0.001_apply_agg.json")
    // golden columns: stat + the surviving *_bin columns
    val expCols = exp.columns.drop(1)
    assert(applied.columns.toSeq == expCols,
      s"apply columns ${applied.columns.toSeq} vs $expCols")
    val statIdx = exp.rows.map(r => r(0).toString).zipWithIndex.toMap
    val sums = applied.agg(
      expr(s"sum(`${expCols.head}`)"), expr(s"count(`${expCols.head}`)"),
      expr(s"avg(`${expCols.head}`)")).head()
    val sumRow = exp.rows(statIdx("sum"))
    val meanRow = exp.rows(statIdx("mean"))
    val cntRow = exp.rows(statIdx("count"))
    assert(Golden.approxEq(sums.getDouble(0), sumRow(1).asInstanceOf[Double]))
    assert(Golden.approxEq(sums.getDouble(2), meanRow(1).asInstanceOf[Double]))
    assert(sums.getLong(1).toDouble == cntRow(1).asInstanceOf[Double])
  }

  private def assertApplyAgg(
      applied: org.apache.spark.sql.DataFrame, fixture: String): Unit = {
    val exp = Golden.load(fixture)
    val expCols = exp.columns.drop(1)
    assert(applied.columns.toSeq == expCols,
      s"$fixture columns: ${applied.columns.toSeq} vs $expCols")
    val statIdx = exp.rows.map(r => r(0).toString).zipWithIndex.toMap
    expCols.zipWithIndex.foreach { case (c, j) =>
      val row = applied.agg(
        sum(col(c)), avg(col(c)), count(col(c))).head()
      def e(stat: String): Double =
        exp.rows(statIdx(stat))(j + 1).asInstanceOf[Double]
      assert(Golden.approxEq(row.getDouble(0), e("sum")), s"$fixture $c sum")
      assert(Golden.approxEq(row.getDouble(1), e("mean")), s"$fixture $c mean")
      assert(row.getLong(2).toDouble == e("count"), s"$fixture $c count")
    }
  }

  test("golden: apply with iv_threshold=0 (ascending branch + bin_threshold filter)") {
    val m = WoeBinning.fit(sf0001, "target",
      Seq("extendedprice", "quantity", "discount"),
      WoeFitOptions(nThreshold = Some(300)))
    // quantity (1 bin) still dropped by bin_threshold=2; discount's
    // ascending/left-closed orientation flows through apply
    assertApplyAgg(m.transform(sf0001, ivThreshold = 0.0),
      "sf0.001_apply_iv0_agg.json")
  }

  test("golden: sentinel bins through apply (sep splice edges)") {
    val m = WoeBinning.fit(sf0001, "target", Seq("quantity"),
      WoeFitOptions(nThreshold = Some(60), sepValue = Some(1.0)))
    assertApplyAgg(m.transform(sf0001, ivThreshold = 0.0),
      "sf0.001_apply_sep_agg.json")
  }

  test("golden: n_occurences=50 (min-bads penalty path)") {
    val m = WoeBinning.fit(sf0001, "target", Seq("extendedprice"),
      WoeFitOptions(nThreshold = Some(300), nOccurrences = 50))
    assertMatches(m.bins("extendedprice"), "sf0.001_extendedprice_n300_occ50.json")
  }

  test("golden: p_threshold=0.01 (strict) and 0.5 (lax) at n=60") {
    val strict = WoeBinning.fit(sf0001, "target", Seq("extendedprice"),
      WoeFitOptions(nThreshold = Some(60), pThreshold = 0.01))
    assertMatches(strict.bins("extendedprice"), "sf0.001_extendedprice_n60_p001.json")
    val lax = WoeBinning.fit(sf0001, "target", Seq("extendedprice"),
      WoeFitOptions(nThreshold = Some(60), pThreshold = 0.5))
    assertMatches(lax.bins("extendedprice"), "sf0.001_extendedprice_n60_p05.json")
  }

  test("golden: sf0.01 extendedprice n=3000 (15 bins)") {
    val df = TestSpark.lcgFrame("/root/testdata/sf0.01")
    val m = WoeBinning.fit(df, "target", Seq("extendedprice", "quantity", "discount"),
      WoeFitOptions(nThreshold = Some(3000)))
    assertMatches(m.bins("extendedprice"), "sf0.01_extendedprice_n3000.json")
    assertMatches(m.bins("quantity"), "sf0.01_quantity_n3000.json")
    assertMatches(m.bins("discount"), "sf0.01_discount_n3000.json")
  }
}
