package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-lines corpus interchange — the de-facto wire format for LLM
  * training corpora (one JSON object per line, newline-delimited).
  *
  * Read side is SCHEMA-EXPLICIT on purpose: Spark's schema inference
  * costs a full extra pass over the data (fatal at 100 TB) and can
  * silently widen types between ingestion batches; a declared schema
  * makes the scan single-pass and the types stable.  Malformed lines
  * are quarantined into a corrupt-record column (PERMISSIVE mode)
  * instead of failing the job — at corpus scale there is ALWAYS a
  * broken line, and one bad shard must not kill a 1000-executor read.
  *
  * Compression note for cluster use: `.jsonl.gz` is not splittable —
  * one executor core per file regardless of size.  Write many
  * moderate files (the `repartition` before write controls the
  * count) or use a splittable codec; the reader works either way.
  */
object JsonlCorpus {

  /** Write `df` as JSONL under `path` (one object per row, overwrite). */
  def write(df: DataFrame, path: String, numFiles: Int = 0): Unit = {
    val out = if (numFiles > 0) df.repartition(numFiles) else df
    out.write.mode("overwrite").json(path)
  }

  /** Read JSONL with a declared schema; lines that fail to parse land
    * whole in `corruptCol` (all data columns null) rather than
    * aborting the scan.  The corrupt column is appended to the
    * declared schema, so `df.filter(col(corruptCol).isNotNull)` is
    * the quarantine stream and `.isNull` the clean one.
    *
    * Spark quirk: a query whose only referenced column is the corrupt
    * column is rejected on raw-file scans (SPARK-21610) — select at
    * least one data column alongside it (or cache first) when
    * counting quarantined lines.
    */
  def read(
      spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** The clean stream only: malformed lines are DROPPED at the scan
    * (DROPMALFORMED), no corrupt column in the schema — so any
    * downstream plan shape (including a bare `count()`, which the
    * PERMISSIVE corrupt-column form rejects when column pruning
    * leaves only the corrupt column referenced) is legal.  Use
    * [[read]] when the quarantined lines themselves need inspecting.
    */
  def readClean(
      spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "DROPMALFORMED")
      .json(path)

  /** Streaming flavor of [[readClean]]: the same schema-explicit,
    * malformed-dropping scan as a file-watch source — point it at the
    * landing directory and every NEW JSONL shard flows through the
    * (unchanged) downstream pipeline as it arrives; Structured
    * Streaming tracks seen files, so ingestion is exactly-once per
    * shard.  `maxFilesPerTrigger` bounds the per-batch ingest burst
    * (the backpressure knob when a backfill drops 10⁵ shards at once).
    */
  def readCleanStream(
      spark: SparkSession, path: String, schema: StructType,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    val base = spark.readStream
      .schema(schema)
      .option("mode", "DROPMALFORMED")
    val tuned = if (maxFilesPerTrigger > 0)
      base.option("maxFilesPerTrigger", maxFilesPerTrigger) else base
    tuned.json(path)
  }
}
