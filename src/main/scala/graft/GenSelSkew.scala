package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skewed-language selection fixture: `n` short documents with 90% of
  * the corpus in ONE hot language and the rest spread over 50 tails —
  * the shape where [[graft.ops.SelectionOps.perplexityBuckets]]'
  * exact per-language ntile degrades (the hot language's whole rank
  * sort lands in a single window task) and the `approxCutpoints`
  * sketch path is supposed to win (mergeable percentile sketch, no
  * per-language sort).  Text is 8 tokens from a 50k-token vocabulary
  * derived from id arithmetic — deterministic, engine-replayable, and
  * big enough that the shared token-rarity aggregation parallelizes
  * like a real corpus.
  *
  * Usage: runMain graft.GenSelSkew [nDocs] [outDir]
  */
object GenSelSkew {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 4000000L
    val out = if (args.length > 1) args(1) else "/tmp/selskew"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(0L, n, 1L, cpus.toInt * 4)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(7)),
          j => concat(lit("t"),
            pmod(xxhash64(col("id") * 8 + j), lit(50000))))).as("text"),
        when(col("id") % 10 < 9, lit("hot"))
          .otherwise(concat(lit("l"), col("id") % 50)).as("lang"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"[selskew] wrote $n docs (90% lang=hot) to $out")
    spark.stop()
  }
}
