package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-session round-robin of the four relevant shapes (plain agg
  * count, unguarded metric, guard job, guarded metric e2e) so ordering
  * and host smear hit all arms equally — the decisive attribution.
  */
object EvalGuardProbe4 {
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
    def df = graft.SparkEntry.scoredFrame(spark, sfDir)
    def g = df.groupBy(col("score").cast("double").as("score"))
      .agg(count(lit(1)).as("n"), sum(col("target").cast("bigint")).as("bads"))
    val arms: Seq[(String, () => Unit)] = Seq(
      "plain agg.count()" -> (() => { g.count(); () }),
      "unguarded metric" -> (() =>
        { graft.ops.EvalOps.aucReport(df, "score", "target", maxGroups = 0).count(); () }),
      "guard job only (persist+limit+count)" -> (() => {
        val p = g.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.limit((1 << 20) + 1).count()
        p.unpersist(blocking = false); ()
      }),
      "guarded metric e2e" -> (() => {
        graft.ops.EvalOps.aucReport(df, "score", "target").count()
        graft.ops.DedupOps.unpersistAll(); ()
      }))
    arms.foreach(_._2())  // warm every shape once
    val times = collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to 7; (n, f) <- arms) {
      val t0 = System.nanoTime(); f()
      times(n) = times(n) :+ (System.nanoTime() - t0) / 1e9
    }
    arms.foreach { case (n, _) =>
      val ts = times(n).sorted
      println(f"[p4] $n%-40s median=${ts(ts.length / 2)}%6.3f all=${times(n).map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
