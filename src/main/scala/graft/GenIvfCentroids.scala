package graft

import org.apache.spark.sql.SparkSession

/** One-off fixture generator: captures the deterministic IVF
  * centroids ([[graft.ops.SimilarityOps.deterministicCentroids]] —
  * sorted 256-id sample + 10 sequential Lloyd iterations) for the
  * driver's verify SF, as a Golden-format JSON resource.  The capture
  * is NOT an extra source of truth: the algorithm is bit-deterministic,
  * so the fixture only pins what every run recomputes identically
  * (OpsSpec asserts runtime == fixture), and it lets the DuckDB oracle
  * SQL embed the centroid literals without a SparkSession.
  *
  * Usage: sbt "runMain graft.GenIvfCentroids [sfDir] [outFile]"
  */
object GenIvfCentroids {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1)
      else "src/main/resources/golden/sf0.01_ivf_centroids.json"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional 3rd arg: cell count (default 16 — the fixed-geometry
    // fixture; the auto-geometry fixture passes autoCells(corpus))
    val nCells = if (args.length > 2) args(2).toInt else 16
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = graft.ops.SimilarityOps.deterministicCentroids(
      emb, "vec_id", "embedding", nCells = nCells,
      sampleN = math.max(256, 4 * nCells), iters = 10)
    val dim = cents.head.length
    val cols = ("cell" +: (0 until dim).map(j => s"v$j"))
      .map("\"" + _ + "\"").mkString("[", ", ", "]")
    val rows = cents.zipWithIndex.map { case (c, i) =>
      (i.toDouble +: c.toSeq).map(_.toString).mkString("[", ", ", "]")
    }.mkString(",\n    ")
    val json = s"""{"columns": $cols,\n  "rows": [\n    $rows\n  ]}\n"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"wrote ${cents.length}x$dim centroids to $out")
    spark.stop()
  }
}
