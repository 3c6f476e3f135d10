package graft

import org.apache.spark.sql.SparkSession

/** One-off fixture generator for the isotonic-calibration golden
  * ([[graft.ops.EvalOps.isotonicCalibrate]] over the LCG-target
  * quantity column — integer-exact PAV, bit-deterministic on any
  * JVM).  Same contract as [[GenDistCentroids]]: the fixture is not a
  * second source of truth (EvalSpec pins runtime == fixture); it
  * exists so the oracle SQL can embed the block literals without a
  * SparkSession.
  *
  * Usage: sbt "runMain graft.GenIsotonic [sfDir] [outFile]"
  */
object GenIsotonic {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1)
      else "src/main/resources/golden/sf0.01_isotonic_quantity.json"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.lcgFrame(spark, dir)
    val blocks = graft.ops.EvalOps.isotonicCalibrate(df, "quantity", "target")
      .collect()
    val cols = Seq("block", "score_lo", "score_hi", "n", "bads", "p_cal")
      .map("\"" + _ + "\"").mkString("[", ", ", "]")
    val rows = blocks.map { r =>
      Seq(r.getLong(0).toString, r.getDouble(1).toString,
        r.getDouble(2).toString, r.getLong(3).toString,
        r.getLong(4).toString, r.getDouble(5).toString)
        .mkString("[", ", ", "]")
    }.mkString(",\n    ")
    val json = s"""{"columns": $cols,\n  "rows": [\n    $rows\n  ]}\n"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"wrote ${blocks.length} isotonic blocks to $out")
    spark.stop()
  }
}
