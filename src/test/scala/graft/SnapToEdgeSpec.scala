package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Pins the codegen'd SnapToEdge expression bucket-for-bucket against
  * the ml.feature.Bucketizer path it replaced in
  * WoeBinning.snapToEdges — any drift here silently re-bins the
  * maxDistinct scale valve and breaks the prebin golden fixture.
  */
class SnapToEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The original Bucketizer-based snap, kept verbatim as reference. */
  private def bucketizerSnap(
      df: org.apache.spark.sql.DataFrame, c: String,
      es: Seq[Double]): org.apache.spark.sql.DataFrame = {
    val splits =
      Double.NegativeInfinity +: es.drop(1).dropRight(1) :+ Double.PositiveInfinity
    val reps = es.dropRight(1)
    val bucketizer = new org.apache.spark.ml.feature.Bucketizer()
      .setInputCol(c).setOutputCol(s"__${c}_bucket")
      .setSplits(splits.toArray).setHandleInvalid("keep")
    val repCol = element_at(
      lit(reps.toArray), (col(s"__${c}_bucket") + 1).cast(IntegerType))
    bucketizer.transform(df)
      .withColumn(c, when(col(c).isNull || isnan(col(c)), col(c)).otherwise(repCol))
      .drop(s"__${c}_bucket")
  }

  test("SnapToEdge matches the Bucketizer on every boundary class") {
    val edges = Seq(1.0, 2.5, 2.5000001, 10.0, 100.0)
    // exact edge hits, between-edge values, below-min, above-max,
    // adjacent-edge floats, NaN, null
    val values: Seq[java.lang.Double] =
      edges.map(Double.box) ++ Seq[java.lang.Double](
        0.5, 1.0000001, 2.4999999, 3.0, 9.999999, 10.0000001, 55.0,
        99.9999999, 100.0000001, 1e9, -1e9, Double.NaN, null)
    val df = values.toDF("v")
    val got = graft.spark.WoeBinning.snapToEdges(df, "v", edges)
      .select("v").collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    val want = bucketizerSnap(df, "v", edges)
      .select("v").collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    got.zip(want).zip(values).foreach { case ((g, w), v) =>
      assert(g == w || (g != null && w != null &&
          g.asInstanceOf[Double].isNaN && w.asInstanceOf[Double].isNaN),
        s"snap($v): expression=$g bucketizer=$w")
    }
  }

  test("SnapToEdge matches the Bucketizer on 10k random doubles") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 50).map(_ => rnd.nextDouble() * 1000).distinct.sorted
    val values = (0 until 10000).map(_ => rnd.nextDouble() * 1200 - 100)
    val df = values.toDF("v")
    val got = graft.spark.WoeBinning.snapToEdges(df, "v", edges)
      .select("v").as[Double].collect()
    val want = bucketizerSnap(df, "v", edges)
      .select("v").as[Double].collect()
    assert(got.sameElements(want))
  }

  test("SnapToEdge stays whole-stage-codegen (no UDF fence)") {
    val df = (1 to 10).map(_.toDouble).toDF("v")
    val plan = graft.spark.WoeBinning.snapToEdges(df, "v", Seq(1.0, 5.0, 10.0))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("udf"),
      s"unexpected UDF in plan:\n$plan")
  }
}
