package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV corpus interchange — the tabular sibling of [[JsonlCorpus]],
  * for metadata tables and legacy corpus dumps.  Same design rules:
  * schema-explicit (no inference pass over the data), malformed rows
  * dropped at the scan (DROPMALFORMED), and full quoting/escaping on
  * the write side so embedded delimiters, quotes, and newlines
  * round-trip losslessly.
  *
  * Multiline note: quoted fields CAN contain newlines; the reader
  * needs `multiLine` for those files, which makes each file
  * single-split (unsplittable).  Corpora with newline-bearing text
  * belong in JSONL/parquet; CSV here is for the flat-field case, and
  * the writer therefore refuses nothing but the reader is configured
  * for the common splittable single-line layout.
  */
object CsvCorpus {

  def write(df: DataFrame, path: String, numFiles: Int = 0): Unit = {
    val out = if (numFiles > 0) df.repartition(numFiles) else df
    out.write.mode("overwrite")
      .option("header", "true")
      .option("quoteAll", "true")
      .option("escape", "\"")
      .csv(path)
  }

  def readClean(
      spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .option("escape", "\"")
      // write() quotes all fields, so a quoted field may legally carry
      // an embedded newline; without multiLine each such row parses as
      // two malformed lines and DROPMALFORMED makes the loss SILENT —
      // multiLine keeps the sanctioned write-then-readClean round-trip
      // lossless on realistic corpora (at the cost of per-file rather
      // than per-split parallelism, the standard multiLine trade)
      .option("multiLine", "true")
      .csv(path)
}
