package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

/** Times the winnowing fingerprint chain (char k-gram hashes →
  * sliding-window minima) at scale.
  * Run: `sbt "runMain graft.tools.WinnowBisect [sfDir]"`.
  */
object WinnowBisect {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sfx10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").persist()
    println(s"docs: ${docs.count()}")

    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"WN $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }

    val kh = docs.withColumn("__kh", TextOps.kgramHashes(col("text"), 8))
    timed("kgram_hashes")(kh.agg(sum(size(col("__kh")))).head().getLong(0))
    timed("winnow_full")(
      TextOps.winnowFingerprints(docs, "text", "fp", 8, 16)
        .agg(sum(size(col("fp")))).head().getLong(0))
    spark.stop()
  }
}
