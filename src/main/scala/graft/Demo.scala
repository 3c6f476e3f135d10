package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.spark.{WoeBinning, WoeFitOptions}

/** End-to-end usage demo of the public API — what a reference user's
  * `batch_woe_binning` + `apply_bins` session becomes on Spark.
  * Run: `sbt "runMain graft.Demo [sfDir]"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // derive the FIXTURES.md §2 deterministic target over lineitem
    val df = SparkEntry.lcgFrame(spark, sfDir)

    val model = WoeBinning.fit(df, "target",
      Seq("extendedprice", "quantity", "discount"),
      WoeFitOptions(nThreshold = Some(300)))
    println("== stacked bins table ==")
    model.binsDf(spark).show(40, truncate = false)

    println("== transform (WoE-encoded output) ==")
    val out = model.transform(df)
    out.show(5, truncate = false)
    println("== transform plan ==")
    out.explain("formatted")

    println("== model round-trip ==")
    val path = "/tmp/graft-demo-model"
    model.save(spark, path)
    val loaded = graft.spark.WoeBinningModel.load(spark, path)
    println(s"reloaded variables: ${loaded.fitted.map(_._1).mkString(", ")}")

    println("== MLlib pipeline form ==")
    val est = new graft.spark.WoeBinningEstimator()
      .setTargetCol("target")
      .setInputCols(Array("extendedprice", "quantity", "discount"))
      .setNThreshold(300)
    val pipeModel = new org.apache.spark.ml.Pipeline().setStages(Array(est)).fit(df)
    pipeModel.transform(df).show(3, truncate = false)

    println("== reference-API façade ==")
    val binsDf = graft.api.WoeMonotonicBinning.batchWoeBinning(df, "target")
    println(s"batchWoeBinning → ${binsDf.count()} bins; applyBins → " +
      graft.api.WoeMonotonicBinning.applyBins(df, binsDf).columns.mkString(", "))
    spark.stop()
  }
}
