package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage attribution for the approx-cut-point selection flag: runs
  * selectionPipelineTimed exact vs approx alternating and prints each
  * stage's incremental seconds — where does the approx path's extra
  * wall-time live?
  */
object SelApproxProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfx10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val targets = Map("src0" -> 0.30, "src1" -> 0.25, "src2" -> 0.20,
      "src3" -> 0.15, "src4" -> 0.10)
    for (pass <- 1 to 2; approx <- Seq(false, true)) {
      val (out, secs) = graft.ops.SelectionOps.selectionPipelineTimed(
        docs, "doc_id", "text", "lang", "source", budgetPerLang = 4000L,
        targets = targets, totalBudget = 50000L, seqLen = 256L,
        salt = "sel7", approxBuckets = approx)
      out.unpersist()
      graft.ops.DedupOps.unpersistAll()
      println(s"[sel] pass $pass approx=$approx  " +
        secs.map { case (n, s) => f"$n=$s%.2f" }.mkString(" ") +
        f"  total=${secs.map(_._2).sum}%.2f")
    }
    spark.stop()
  }
}
