package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

/** Bisects the minhash chain (shingle → base-hash → signature) to
  * attribute the dedup family's per-row cost.
  * Run: `sbt "runMain graft.tools.MinhashBisect [sfDir]"`.
  */
object MinhashBisect {
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
      println(f"MH $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }

    val toks = docs.withColumn("__t", TextOps.tokens(col("text")))
    timed("tokens")(toks.agg(sum(size(col("__t")))).head().getLong(0))
    val sh = toks.withColumn("__sh", DedupOps.shinglesOf(col("__t")))
    timed("tokens+shingles")(sh.agg(sum(size(col("__sh")))).head().getLong(0))
    val base = sh.withColumn("__bh",
      transform(col("__sh"), s => pmod(xxhash64(s), lit(2147483647L))))
    timed(".. +basehash")(base.agg(sum(size(col("__bh")))).head().getLong(0))
    val sig = base.withColumn("__sig",
      DedupOps.minhashSignatureFromBase(col("__bh"), 32))
    timed(".. +signature32")(sig.agg(sum(size(col("__sig")))).head().getLong(0))
    timed("full_minhash_pairs") {
      val p = DedupOps.minhashPairs(docs, "text", "doc_id", jaccardThreshold = 0.5)
        .count()
      DedupOps.unpersistAll()
      p
    }
    spark.stop()
  }
}
