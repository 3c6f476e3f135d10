package graft.tools

import org.apache.spark.sql.SparkSession
import graft.spark.{WoeBinning, WoeFitOptions}
import graft.core.{Kernels, WoeConfig}

/** Dev phase-bisect for the EXACT fit path (r18 optimization): splits
  * q_fit_exact's wall into (a) the distributed stats aggregation +
  * sort + collect, (b) rows→VarStats conversion, (c) each driver
  * kernel phase (detectOrder / monotonePool / significanceMerge /
  * assembly+finalize) — so the fit family's ~2 s rows are
  * attributable to a phase.
  */
object FitProbe {
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
      println(f"[fit] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm
    WoeBinning.fit(df, "target", Seq("extendedprice"),
      WoeFitOptions(nThreshold = Some(300))).binsDf(spark).count()
    (1 to 3).foreach { i =>
      println(s"-- pass $i")
      val rows = time("stats agg+sort+collect") {
        WoeBinning.statsAggregation(df, "target", Seq("extendedprice"))
          .orderBy("variable", "value").collect()
      }
      val rowsU = time("stats agg+collect (no sort)") {
        WoeBinning.statsAggregation(df, "target", Seq("extendedprice"))
          .collect()
      }
      time("statsFromRows (driver sort)")(WoeBinning.statsFromRows(rowsU))
      // r19 typed-collect comparison arm: tuple encoder vs Row decode
      import spark.implicits._
      val rowsT = time("stats agg+collect (typed)") {
        WoeBinning.statsAggregation(df, "target", Seq("extendedprice"))
          .as[WoeBinning.StatsTuple].collect()
      }
      time("statsFromTuples (driver sort)")(WoeBinning.statsFromTuples(rowsT))
      time("stats agg+collect (spread scan)") {
        WoeBinning.statsAggregation(
          df.repartition(32), "target", Seq("extendedprice")).collect()
      }
      println(s"[fit] collected rows: ${rows.length}")
      val stats = time("statsFromRows")(WoeBinning.statsFromRows(rows))
      val s = stats("extendedprice")
      val cfg = WoeConfig(nThreshold = 300)
      time("kernel fitVariable")(Kernels.fitVariable(s, cfg))
      // phase split inside the kernel
      val ordered = time("  detectOrder+sort") {
        val asc = Kernels.detectOrder(s)
        if (asc) s.groups else s.groups.reverse
      }
      val gs = ordered.map { case (v, n, t) =>
        graft.core.GroupStat(v, n.toDouble, t.toDouble / n,
          Kernels.binaryStd(n, t))
      }
      val pooled = time("  monotonePool")(Kernels.monotonePool(gs))
      println(s"[fit] pooled bins: ${gs.length} -> ${pooled.length}")
      val merged = time("  significanceMerge")(
        Kernels.significanceMerge(pooled, 300.0, 5.0, 0.05))
      println(s"[fit] merged bins: ${pooled.length} -> ${merged.length}")
    }
    spark.stop()
  }
}
