package graft

import org.apache.spark.sql.SparkSession

/** Captures the deterministic PQ codebooks for the verify SF as a
  * golden fixture (same contract as [[GenIvfCentroids]]): not a second
  * source of truth — the derivation is bit-deterministic and OpsSpec
  * pins runtime == fixture; the fixture exists so the oracle SQL can
  * embed the literals without a SparkSession.
  *
  * Run: `sbt "runMain graft.GenPqCodebooks"`.
  */
object GenPqCodebooks {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1)
      else "src/main/resources/golden/sf0.01_pq_codebooks.json"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cbs = graft.ops.SimilarityOps.pqCodebooks(
      emb, "vec_id", "embedding", m = 8, ksub = 16, sampleN = 256, iters = 10)
    val sub = cbs.head.head.length
    val cols = ("s" +: "j" +: (0 until sub).map(d => s"v$d"))
      .map("\"" + _ + "\"").mkString("[", ", ", "]")
    val rows = (for {
      (cb, s) <- cbs.zipWithIndex
      (cw, j) <- cb.zipWithIndex
    } yield (s.toDouble +: j.toDouble +: cw.toSeq)
      .map(_.toString).mkString("[", ", ", "]")).mkString(",\n    ")
    val json = s"""{"columns": $cols,\n  "rows": [\n    $rows\n  ]}\n"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"wrote ${cbs.length}x${cbs.head.length}x$sub codebooks to $out")
    spark.stop()
  }
}
