package graft

import org.apache.spark.sql.SparkSession

/** One-off fixture generator: captures the deterministic PCA basis
  * ([[graft.ops.SimilarityOps.pcaBasis]] — sorted 256-id sample,
  * driver eigensolve, eigenvalue-ordered sign-canonical axes) for the
  * driver's verify SF, as a Golden-format JSON resource.  Same
  * contract as [[GenIvfCentroids]]: the algorithm is
  * bit-deterministic, OpsSpec asserts runtime == fixture, and the
  * fixture exists so the DuckDB oracle SQL can embed mean/basis
  * literals without a SparkSession.  Row 0 is the mean; rows 1..k are
  * the axes in order.
  *
  * Usage: sbt "runMain graft.GenPcaBasis [sfDir] [outFile]"
  */
object GenPcaBasis {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1)
      else "src/main/resources/golden/sf0.01_pca_basis.json"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val (mean, basis) = graft.ops.SimilarityOps.pcaBasis(
      emb, "vec_id", "embedding", k = 8, sampleN = 256)
    val dim = mean.length
    val cols = ("row" +: (0 until dim).map(j => s"v$j"))
      .map("\"" + _ + "\"").mkString("[", ", ", "]")
    val rows = (mean +: basis.toSeq).zipWithIndex.map { case (r, i) =>
      (i.toDouble +: r.toSeq).map(_.toString).mkString("[", ", ", "]")
    }.mkString(",\n    ")
    val json = s"""{"columns": $cols,\n  "rows": [\n    $rows\n  ]}\n"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"wrote mean + ${basis.length}x$dim basis to $out")
    spark.stop()
  }
}
