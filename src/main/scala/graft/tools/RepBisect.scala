package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

/** Bisects repetitionStats' per-row expression chain to attribute the
  * quality_gate cost.  Run: `sbt "runMain graft.tools.RepBisect [sfDir]"`.
  */
object RepBisect {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sfx10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") >= 20).select("text").persist()
    println(s"docs: ${docs.count()}")

    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"BISECT $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }

    val toks = docs.withColumn("__t", TextOps.tokens(col("text")))
    timed("tokens")(toks.agg(sum(size(col("__t")))).head().getLong(0))
    val grams = toks.withColumn("__g", TextOps.wordNgramsOf(col("__t"), 2))
    timed("tokens+grams")(grams.agg(sum(size(col("__g")))).head().getLong(0))
    val sorted = grams.withColumn("__sg", array_sort(col("__g")))
    timed("tokens+grams+sort")(sorted.agg(sum(size(col("__sg")))).head().getLong(0))
    val uniq = grams.withColumn("__u", size(array_distinct(col("__g"))))
    timed("tokens+grams+distinct")(uniq.agg(sum(col("__u"))).head().getLong(0))
    timed("full_no_filter")(
      TextOps.repetitionStats(docs, "text", 2)
        .agg(sum("n_grams"), sum(col("dup_char_frac"))).head().toString)
    timed("full_with_filter")(
      TextOps.repetitionStats(docs, "text", 2)
        .where(col("dup_gram_frac") <= 0.5).count())
    spark.stop()
  }
}
