package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** One shared local SparkSession for the whole test run. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The deterministic LCG target of FIXTURES.md §2 over lineitem. */
  def lcgFrame(sfDir: String): DataFrame = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val k = col("l_orderkey") * lit(7919L) + col("l_linenumber").cast("long")
    val x = k * lit(1103515245L) + lit(12345L)
    val u = pmod(x, lit(2147483648L)).cast(DoubleType) / lit(2147483648.0)
    val z = (col("l_extendedprice") - lit(38000.0)) / lit(15000.0)
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    li.select(
      when(u < p, 1L).otherwise(0L).as("target"),
      col("l_extendedprice").cast(DoubleType).as("extendedprice"),
      col("l_quantity").cast(DoubleType).as("quantity"),
      col("l_discount").cast(DoubleType).as("discount"))
  }
}
