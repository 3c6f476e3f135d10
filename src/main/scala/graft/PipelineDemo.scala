package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** End-to-end training-data pipeline over the documents table — the
  * composed form of the operator families (each stage is individually
  * oracle-checked; `PipelineSpec` pins the composition):
  *
  *   quality gate → exact+near dedup → cluster purge →
  *   benchmark decontamination → PII scrub → stratified rebalance →
  *   train/val/test split → token-budget shard packing
  *
  * Run: `sbt "runMain graft.PipelineDemo [sfDir]"`.
  */
object PipelineDemo {

  /** The pipeline as a function: corpus in, packed training plan out.
    * Returns (kept corpus with split+shard columns, per-stage counts).
    */
  def run(spark: SparkSession, docs: DataFrame,
      benchmark: DataFrame): (DataFrame, Seq[(String, Long)]) = {
    val stages = Seq.newBuilder[(String, Long)]
    stages += "input" -> docs.count()

    // 1. quality gate (C4/Gopher-style composite + repetition cap)
    val quality = TextOps.repetitionStats(
        TextOps.qualityMetrics(docs, "text"), "text", 2)
      .where(col("quality_score") >= 0.5 && col("dup_gram_frac") <= 0.5)
      .select(docs.columns.map(col): _*)
    stages += "quality_gate" -> quality.count()

    // 2. dedup: exact star pairs + token-jaccard near-dups → components
    //   → one canonical doc per cluster
    val exactPairs = DedupOps.exactDupMembers(quality, "text", "doc_id")
      .join(DedupOps.exactDupGroups(quality, "text", "doc_id")
        .select("content_hash", "keep_id"), "content_hash")
      .where(col("id") =!= col("keep_id"))
      .select(col("keep_id").as("id_a"), col("id").as("id_b"))
    val nearPairs = DedupOps
      .tokenJaccardPairs(quality, "text", "doc_id", "n_chars", 0.7)
      .select("id_a", "id_b")
    val cc = ClusterOps.connectedComponents(
      exactPairs.union(nearPairs), "id_a", "id_b")
    val deduped = ClusterOps.dedupedCorpus(quality, "doc_id", cc)
    stages += "dedup_purge" -> deduped.count()

    // 3. benchmark decontamination (drop docs sharing >= 10 trigrams)
    val contaminated = TextOps.contaminationScores(
        deduped, "doc_id", "text", benchmark, "text", n = 3)
      .where(col("n_overlap") >= 10).select(col("id").as("doc_id"))
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    stages += "decontaminate" -> clean.count()

    // 4. PII scrub (projection; row count unchanged by construction)
    val scrubbed = clean.withColumn("text", TextOps.redactPii(col("text")))

    // 5. stratified rebalance (halve the dominant language)
    val balanced = SampleOps.stratifiedSample(
      scrubbed, "doc_id", "lang", Map("en" -> 0.5), "demo")
    stages += "rebalance" -> balanced.count()

    // 6. deterministic split + 7. token-budget shard packing
    val split = SampleOps.hashSplit(balanced, "doc_id", "demo")
    val packed = PackingOps.packByTokenBudget(
      split.select(col("doc_id"),
        TextOps.bpeTokenEstimate(col("text")).as("tok")),
      "doc_id", "tok", 4096L)
    val out = split.join(
      packed.select(col("doc_id"), col("n_tokens"), col("shard_id")), "doc_id")
    stages += "packed" -> out.count()
    (out, stages.result())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (out, stages) = run(spark, docs.filter(col("doc_id") >= 20),
      docs.filter(col("doc_id") < 20))
    println("== pipeline stages ==")
    stages.foreach { case (name, n) => println(f"$name%-16s $n%7d docs") }
    println("== split x shard summary ==")
    out.groupBy("split").agg(count(lit(1)).as("docs"),
        sum("n_tokens").as("tokens"),
        countDistinct("shard_id").as("shards"))
      .orderBy("split").show(truncate = false)
    spark.stop()
  }
}
