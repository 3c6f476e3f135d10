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
    // stage the single lineitem file into a stream-source directory
    val staged = java.nio.file.Paths.get("/tmp/graft-stream-woe/lineitem")
    java.nio.file.Files.createDirectories(staged)
    val link = staged.resolve("lineitem.parquet")
    if (!java.nio.file.Files.exists(link))
      java.nio.file.Files.createSymbolicLink(
        link, java.nio.file.Paths.get(dir, "lineitem.parquet"))
    val schema = spark.read.parquet(s"$dir/lineitem.parquet").schema
    val liStream = spark.readStream.schema(schema).parquet(staged.toString)

    val k = col("l_orderkey") * lit(7919L) + col("l_linenumber").cast("long")
    val u = pmod(k * lit(1103515245L) + lit(12345L), lit(2147483648L))
      .cast(DoubleType) / lit(2147483648.0)
    val z = (col("l_extendedprice") - lit(38000.0)) / lit(15000.0)
    val p = lit(1.0) / (lit(1.0) + exp(z * lit(-1.0)))
    val stream = liStream.select(
      when(u < p, 1L).otherwise(0L).as("target"),
      col("l_extendedprice").cast(DoubleType).as("extendedprice"))

    @volatile var last: Option[WoeBinningModel] = None
    val q = graft.ops.StreamingWoe.fitStream(
      stream, "target", Seq("extendedprice"), WoeConfig(nThreshold = 300)) {
      (_, m) => last = Some(m)
    }
    q.processAllAvailable()
    q.stop()

    val batch = WoeBinning.fit(TestSpark.lcgFrame(dir), "target",
      Seq("extendedprice"), WoeFitOptions(nThreshold = Some(300)))
    val got = last.get.bins("extendedprice")
    val expected = batch.bins("extendedprice")
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g == e) }
  }
}
