package graft

import org.apache.spark.sql.SparkSession

/** One-off fixture generator for the FULL-CORPUS distributed Lloyd
  * centroids ([[graft.ops.SimilarityOps.distributedCentroids]] —
  * smallest-id seeds + quantized-integer-sum means, bit-deterministic
  * under any partitioning).  Same contract as [[GenIvfCentroids]]:
  * the fixture is not a second source of truth (OpsSpec pins
  * runtime == fixture); it exists so the oracle SQL can embed the
  * centroid literals without a SparkSession.
  *
  * Usage: sbt "runMain graft.GenDistCentroids [sfDir] [outFile]"
  */
object GenDistCentroids {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1)
      else "src/main/resources/golden/sf0.01_dist_centroids.json"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = graft.ops.SimilarityOps.distributedCentroids(
      emb, "vec_id", "embedding", nCells = 16, iters = 10)
    val dim = cents.head.length
    val cols = ("cell" +: (0 until dim).map(j => s"v$j"))
      .map("\"" + _ + "\"").mkString("[", ", ", "]")
    val rows = cents.zipWithIndex.map { case (c, i) =>
      (i.toDouble +: c.toSeq).map(_.toString).mkString("[", ", ", "]")
    }.mkString(",\n    ")
    val json = s"""{"columns": $cols,\n  "rows": [\n    $rows\n  ]}\n"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"wrote ${cents.length}x$dim distributed centroids to $out")
    spark.stop()
  }
}
