package graft

import org.apache.spark.sql.SparkSession

/** One-off fixture generator for the zstd compression-ratio golden
  * ([[graft.ops.TextOps.zstdCompressionRatio]] at the fixed default
  * level over sf0.01 documents — deterministic byte counts for a
  * fixed level and zstd-jni version, verified across separate JVM
  * runs at capture time).  Same contract as [[GenIsotonic]]: the
  * fixture is not a second source of truth (OpsSpec pins runtime ==
  * fixture); it exists so the oracle SQL can embed the literals
  * without a SparkSession.
  *
  * Usage: sbt "runMain graft.GenCompressZstd [sfDir] [outFile]"
  */
object GenCompressZstd {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1)
      else "src/main/resources/golden/sf0.01_compress_zstd_l3.json"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.ops.TextOps.zstdCompressionRatio(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
      .orderBy("doc_id")
      .collect()
    val cols = Seq("doc_id", "n_bytes", "n_zstd")
      .map("\"" + _ + "\"").mkString("[", ", ", "]")
    val body = rows.map { r =>
      Seq(r.getLong(0), r.getLong(1), r.getLong(2)).mkString("[", ", ", "]")
    }.mkString(",\n    ")
    val json = s"""{"columns": $cols,\n  "rows": [\n    $body\n  ]}\n"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"wrote ${rows.length} zstd rows to $out")
    spark.stop()
  }
}
