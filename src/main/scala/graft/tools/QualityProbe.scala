package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

/** Attribution probe for the PipelineDemo `quality_gate` stage (the
  * dominant stage after the r12 dedup fix): times each sub-projection
  * of the gate separately over the same corpus.
  * Run: `sbt "runMain graft.tools.QualityProbe [sfDir]"`.
  */
object QualityProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") >= 20).persist()
    println(s"docs: ${docs.count()}")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n)")
    }

    timed("baseline_scan")(docs.agg(sum(length(col("text")))).head().getLong(0))
    timed("tokens_only")(
      docs.select(size(TextOps.tokens(col("text"))).as("n")).agg(sum("n")).head().getLong(0))
    timed("quality_metrics")(
      TextOps.qualityMetrics(docs, "text").where(col("quality_score") >= 0.5).count())
    timed("repetition_stats")(
      TextOps.repetitionStats(docs, "text", 2).where(col("dup_gram_frac") <= 0.5).count())
    timed("dedup_paragraphs")(
      docs.select(length(TextOps.dedupParagraphs(col("text"))).as("n"))
        .agg(sum("n")).head().getLong(0))
    timed("full_gate") {
      TextOps.repetitionStats(
          TextOps.qualityMetrics(docs, "text"), "text", 2)
        .where(col("quality_score") >= 0.5 && col("dup_gram_frac") <= 0.5)
        .select(docs.columns.map(col): _*)
        .withColumn("text", TextOps.dedupParagraphs(col("text")))
        .count()
    }
    spark.stop()
  }
}
