package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

/** One-off attribution probe for the PipelineDemo `dedup_purge` stage
  * (62% of q_pipeline_e2e at sf10): times its three sub-computations —
  * exact-dup star pairs, token-Jaccard near-dup pairs, and the CC +
  * anti-join purge — each materialized independently so the split is
  * attributable.  Run: `sbt "runMain graft.tools.DedupProbe [sfDir]"`.
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") >= 20)

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // replicate PipelineDemo's quality stage as the common input
    val quality = timed("quality_gate") {
      val q = TextOps.repetitionStats(
          TextOps.qualityMetrics(docs, "text"), "text", 2)
        .where(col("quality_score") >= 0.5 && col("dup_gram_frac") <= 0.5)
        .select(docs.columns.map(col): _*)
        .withColumn("text", TextOps.dedupParagraphs(col("text")))
        .persist()
      println(s"  quality rows: ${q.count()}")
      q
    }

    val exactPairs = timed("exact_pairs") {
      val p = DedupOps.exactDupMembers(quality, "text", "doc_id")
        .join(DedupOps.exactDupGroups(quality, "text", "doc_id")
          .select("content_hash", "keep_id"), "content_hash")
        .where(col("id") =!= col("keep_id"))
        .select(col("keep_id").as("id_a"), col("id").as("id_b"))
        .persist()
      println(s"  exact pairs: ${p.count()}")
      p
    }

    val nearPairs = timed("token_jaccard_pairs") {
      val p = DedupOps
        .tokenJaccardPairs(quality, "text", "doc_id", "n_chars", 0.7)
        .select("id_a", "id_b")
        .persist()
      println(s"  near pairs: ${p.count()}")
      p
    }

    timed("cc_plus_purge") {
      val cc = ClusterOps.connectedComponents(
        exactPairs.union(nearPairs), "id_a", "id_b")
      val n = ClusterOps.dedupedCorpus(quality, "doc_id", cc).count()
      println(s"  deduped rows: $n")
    }

    // block-size census for the jaccard self-join: how many candidate
    // pairs does the n_chars blocking generate?
    val census = quality.groupBy("n_chars").agg(count(lit(1)).as("pop"))
      .agg(sum(col("pop") * (col("pop") - 1) / 2).as("cand_pairs"),
        max("pop").as("max_block"), count(lit(1)).as("n_blocks"))
      .head()
    println(s"PROBE blocking: cand_pairs=${census.get(0)} " +
      s"max_block=${census.get(1)} n_blocks=${census.get(2)}")
    spark.stop()
  }
}
