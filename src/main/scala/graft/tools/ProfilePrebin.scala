package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{WoeBinning, WoeFitOptions}

/** Dev-only phase profiler for the maxDistinct prebin scale valve:
  * splits q_fit_prebinned's wall time into (a) the approxQuantile edge
  * pass, (b) the snap + sufficient-stats pass, (c) kernel fit — so a
  * bench regression can be attributed to a phase instead of guessed at.
  */
object ProfilePrebin {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.lcgFrame(spark, dir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm: one full untimed pass so codegen/JIT is paid
    WoeBinning.fit(df, "target", Seq("extendedprice"),
      WoeFitOptions(nThreshold = Some(300), maxDistinct = Some(1000))).binsDf(spark).count()
    (1 to 3).foreach { i =>
      println(s"-- pass $i")
      val probs = (0 to 1000).map(_.toDouble / 1000).toArray
      val qs = time("approxQuantile")(
        df.stat.approxQuantile(Array("extendedprice"), probs, 1e-4))
      val edges = qs(0).distinct.sorted.toSeq
      val snapped = WoeBinning.snapToEdges(df, "extendedprice", edges)
      time("snap+stats")(
        WoeBinning.sufficientStats(snapped, "target", Seq("extendedprice")))
      time("full fit")(
        WoeBinning.fit(df, "target", Seq("extendedprice"),
          WoeFitOptions(nThreshold = Some(300), maxDistinct = Some(1000)))
          .binsDf(spark).count())
      time("exact fit")(
        WoeBinning.fit(df, "target", Seq("extendedprice"),
          WoeFitOptions(nThreshold = Some(300))).binsDf(spark).count())
    }
    spark.stop()
  }
}
