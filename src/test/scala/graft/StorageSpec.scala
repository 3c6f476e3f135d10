package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.StorageOps

/** Verifies the storage-layout levers actually delete shuffles /
  * prune files — the properties SCALE.md claims for them.
  */
class StorageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf001 = "/root/testdata/sf0.001"

  test("bucketed table: bucket-key self-join plans ZERO exchanges") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    StorageOps.writeBucketed(docs, "docs_bucketed", "doc_id", 4)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the join must pick sort-merge — the case
      // where bucketing either saves the shuffle or doesn't
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val t = spark.table("docs_bucketed")
      val joined = t.as("a").join(t.as("b"), "doc_id")
        .select(col("doc_id"), col("a.n_chars"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed self-join must not shuffle, got:\n$plan")
      assert(joined.count() == docs.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS docs_bucketed")
    }
  }

  test("bucketed table: groupBy on the bucket key plans zero exchanges") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    StorageOps.writeBucketed(docs, "docs_bucketed2", "doc_id", 4)
    try {
      val agg = spark.table("docs_bucketed2")
        .groupBy("doc_id").agg(sum("n_chars").as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket-key groupBy must not shuffle, got:\n$plan")
      assert(agg.count() == docs.count())
    } finally spark.sql("DROP TABLE IF EXISTS docs_bucketed2")
  }

  test("partitioned table: partition predicate prunes at planning time") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    StorageOps.writePartitioned(docs, "docs_by_lang", "lang")
    try {
      val one = spark.table("docs_by_lang").where(col("lang") === "en")
      val scan = one.queryExecution.executedPlan.toString
      // pruned scan reads only the matching partition directory
      assert(scan.contains("PartitionFilters") || scan.contains("lang=en") ||
        one.inputFiles.forall(_.contains("lang=en")),
        s"expected partition pruning, got:\n$scan")
      val expected = docs.where(col("lang") === "en").count()
      assert(one.count() == expected)
    } finally spark.sql("DROP TABLE IF EXISTS docs_by_lang")
  }
}
