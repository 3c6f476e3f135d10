package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.{GraftDoc, GraftDocSource}

/** The graftdoc DataSource V2 connector: roundtrip fidelity, pushed
  * doc_id bounds skipping whole shards at planning time, and column
  * pruning reaching the scan.
  */
class GraftDocSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf001 = "/root/testdata/sf0.001"
  private val fmt = classOf[GraftDocSource].getName

  private def writeSharded(path: String): Unit = {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("text"))
      // range partitioning gives shards DISJOINT doc_id spans — the
      // layout file skipping exists for
      .repartitionByRange(5, col("doc_id"))
    GraftDoc.write(docs, path)
  }

  test("roundtrip: byte-identical corpus back from the binary shards") {
    val path = "/tmp/graft-gdoc-rt"
    writeSharded(path)
    val back = spark.read.format(fmt).option("path", path).load()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val truth = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == truth && truth.nonEmpty)
  }

  test("pushed doc_id bounds skip whole shards at planning time") {
    val path = "/tmp/graft-gdoc-skip"
    writeSharded(path)
    val all = spark.read.format(fmt).option("path", path).load()
    val filtered = all.where(col("doc_id") < 100)
    val plan = filtered.queryExecution.executedPlan.toString
    // the scan description reports surviving shards: must be fewer
    // than the 5 written
    val files = "files=(\\d+)".r.findFirstMatchIn(plan).map(_.group(1).toInt)
    assert(files.exists(n => n >= 1 && n < 5), s"no shard skipping in:\n$plan")
    // and the result is still exactly right (filters stay residual)
    val got = filtered.collect().map(_.getLong(0)).toSet
    val truth = spark.read.parquet(s"$sf001/documents.parquet")
      .where(col("doc_id") < 100).collect().map(_.getLong(0)).toSet
    assert(got == truth)
    // empty-result bound: every shard skipped, zero partitions planned
    assert(all.where(col("doc_id") > 1000000).count() == 0)
  }

  test("column pruning reaches the scan; doc_id-only projection correct") {
    val path = "/tmp/graft-gdoc-prune"
    writeSharded(path)
    val ids = spark.read.format(fmt).option("path", path).load()
      .select("doc_id")
    val plan = ids.queryExecution.executedPlan.toString
    assert(plan.contains("columns=doc_id"), s"pruning not pushed in:\n$plan")
    assert(ids.collect().map(_.getLong(0)).toSet ==
      spark.read.parquet(s"$sf001/documents.parquet")
        .collect().map(_.getLong(0)).toSet)
  }

  test("permissive mode skips corrupt shards; strict mode fails loudly") {
    import spark.implicits._
    val path = "/tmp/graft-gdoc-corrupt"
    GraftDoc.write(
      Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
        .repartitionByRange(2, col("doc_id")), path)
    // corrupt one shard: overwrite its magic
    val dir = new java.io.File(path)
    val victim = dir.listFiles().filter(_.getName.endsWith(".gdoc")).head
    val bytes = java.nio.file.Files.readAllBytes(victim.toPath)
    bytes(0) = 'X'.toByte
    java.nio.file.Files.write(victim.toPath, bytes)
    // drop the local-FS checksum sidecar: editing bytes under Hadoop's
    // CRC would fail at open, BEFORE format-level corruption handling
    // (object stores have no sidecar; the footer probe tolerates the
    // checksum failure too, but this test targets the magic check)
    val crc = new java.io.File(dir, s".${victim.getName}.crc")
    if (crc.exists()) crc.delete()
    val permissive = spark.read.format(fmt)
      .option("path", path).option("permissive", "true").load()
    assert(permissive.count() == 1) // the healthy shard's row
    val strict = intercept[Exception] {
      spark.read.format(fmt).option("path", path).load().count()
    }
    assert(strict.getMessage.contains("corrupt shard") ||
      Option(strict.getCause).exists(_.getMessage.contains("corrupt shard")),
      s"unexpected failure: ${strict.getMessage}")
  }

  test("null text survives the format") {
    import spark.implicits._
    val path = "/tmp/graft-gdoc-null"
    GraftDoc.write(
      Seq((1L, "alpha"), (2L, null: String), (3L, "")).toDF("doc_id", "text"),
      path)
    val back = spark.read.format(fmt).option("path", path).load()
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(back == Set((1L, Some("alpha")), (2L, None), (3L, Some(""))))
  }
}
