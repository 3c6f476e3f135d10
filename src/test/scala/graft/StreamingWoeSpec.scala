package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.core.WoeConfig
import graft.spark.{WoeBinning, WoeBinningModel, WoeFitOptions}

/** The incremental (streaming) fit converges to the batch fit once the
  * stream has consumed the same data.
  */
class StreamingWoeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming WoE fit after one pass == batch fit (golden 12 bins)") {
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/lineitem.parquet").schema
    val stream = spark.readStream.schema(schema)
      .parquet(SparkEntry.stageAsDir(dir, "lineitem"))
      .select(SparkEntry.lcgColumns: _*)
      .select("target", "extendedprice")

    @volatile var last: Option[WoeBinningModel] = None
    val q = graft.ops.StreamingWoe.fitStream(
      stream, "target", Seq("extendedprice"), WoeConfig(nThreshold = 300)) {
      (_, m) => last = Some(m)
    }
    try q.processAllAvailable()
    finally q.stop()

    val batch = WoeBinning.fit(TestSpark.lcgFrame(dir), "target",
      Seq("extendedprice"), WoeFitOptions(nThreshold = Some(300)))
    val got = last.get.bins("extendedprice")
    val expected = batch.bins("extendedprice")
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g == e) }
  }
}
