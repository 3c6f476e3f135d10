package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{WoeBinning, WoeFitOptions}

/** Manual scale stress (not part of the driver bench): inflates sf0.1
  * lineitem 10× with value jitter → ~6M rows / ~6M distinct values,
  * then fits exact vs quantile-prebinned.  Validates the
  * distinct-value-explosion story beyond the shipped testdata.
  * Run: `sbt "runMain graft.Stress"`.
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = SparkEntry.lcgFrame(spark, "/root/testdata/sf0.1")
    val inflated = spark.range(10).crossJoin(base)
      .withColumn("extendedprice",
        col("extendedprice") + col("id").cast("double") * lit(0.0001))
      .drop("id")
      .cache()
    val n = inflated.count()
    val distinct = inflated.select(countDistinct("extendedprice")).head().getLong(0)
    println(s"rows=$n distinctPrices=$distinct")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val exact = time("exact fit (collect ~6M stats)") {
      WoeBinning.fit(inflated, "target", Seq("extendedprice"),
        WoeFitOptions(nThreshold = Some(300000)))
    }
    println(s"exact bins=${exact.bins("extendedprice").length} " +
      s"iv=${exact.bins("extendedprice").map(_.ivComponents).sum}")
    val pre = time("prebinned fit (maxDistinct=10000)") {
      WoeBinning.fit(inflated, "target", Seq("extendedprice"),
        WoeFitOptions(nThreshold = Some(300000), maxDistinct = Some(10000)))
    }
    println(s"prebinned bins=${pre.bins("extendedprice").length} " +
      s"iv=${pre.bins("extendedprice").map(_.ivComponents).sum}")
    spark.stop()
  }
}
