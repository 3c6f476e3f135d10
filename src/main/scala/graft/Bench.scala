package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state measurement: run every query once on the tiny SF
    // first (untimed) so whole-stage-codegen compilation + JIT of the
    // generated classes is paid before the clock starts — that cost is
    // a per-plan constant (7s+ for the wide dedup plans) that a long
    // cluster job amortizes to nothing, and the plan shapes are
    // identical across SFs so the codegen cache hits.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (warmDir != sfDir) {
      SparkEntry.queries.foreach { case (name, fn) =>
        try { fn(spark, warmDir).count() }
        catch { case e: Throwable =>
          System.err.println(s"[bench] warmup $name: ${e.getMessage}")
        }
      }
      // drop the small-SF cached data so every timed query reads its
      // inputs cold — only code/JIT warm-up carries over
      spark.catalog.clearCache()
    }
    var failed = List.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
