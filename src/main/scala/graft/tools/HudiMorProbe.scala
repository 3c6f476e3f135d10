package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only stage attribution for the Hudi MOR merged read (args:
  * [sfDir]) — times each composition layer separately so a slow
  * q_hudi_mor_read pass is attributable: fixture staging (fingerprint
  * -skipped when warm), the log-block decode alone, the record-level
  * JSON view alone, and the full merged read.  Bisect-first, per the
  * build discipline: measure before optimizing.
  */
object HudiMorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // twice each: pass 1 carries codegen/JIT, pass 2 is steady-state
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val sliceDir = t("staging")(graft.SparkEntry.stageHudiMorSlice(spark, dir))
      val logFile = new java.io.File(s"$sliceDir/logs").listFiles()
        .find(_.getName.contains(".log.")).get
      val bytes = java.nio.file.Files.readAllBytes(logFile.toPath)
      t(s"raw_decode(${bytes.length / 1024}KB)")(
        graft.ops.StorageOps.hudiLogBlocksOf("f", bytes).get.map(_._2.size).sum)
      t("log_blocks")(graft.ops.StorageOps
        .hudiLogBlocks(spark, Seq(s"$sliceDir/logs")).count())
      t("log_records")(graft.ops.StorageOps
        .hudiLogRecords(spark, Seq(s"$sliceDir/logs")).count())
      t("base_scan")(spark.read.parquet(s"$sliceDir/base").count())
      // inlined sub-stages of hudiMorRead (keep in sync)
      locally {
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.types._
        import org.apache.spark.sql.expressions.Window
        val base = spark.read.parquet(s"$sliceDir/base")
        val recs = graft.ops.DedupOps.registerPersist(
          graft.ops.StorageOps.hudiLogRecords(spark, Seq(s"$sliceDir/logs")))
          .repartition(spark.sparkContext.defaultParallelism)
        val updates = recs.filter(col("block_type") === "avro")
          .withColumn("payload", from_json(col("record_json"), base.schema))
          .select(col("payload").getField("_hoodie_record_key").as("k"),
            col("instant"), col("block_seq"),
            lit(0).as("is_delete"), col("payload"))
        t("from_json_updates")(updates.count())
        val delSchema = StructType(Seq(StructField("recordKey", StringType)))
        val deletes = recs.filter(col("block_type") === ":delete")
          .withColumn("d", from_json(col("record_json"), delSchema))
          .select(col("d").getField("recordKey").as("k"),
            col("instant"), col("block_seq"),
            lit(1).as("is_delete"),
            lit(null).cast(base.schema).as("payload"))
        val w = Window.partitionBy("k")
          .orderBy(col("instant").desc, col("is_delete").desc,
            col("block_seq").desc)
        val logLatest = updates.unionByName(deletes)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("k"), col("is_delete"), col("payload"))
        t("log_latest")(logLatest.count())
        graft.ops.DedupOps.unpersistAll()
      }
      t("mor_read")(graft.ops.StorageOps.hudiMorRead(
        spark, Seq(s"$sliceDir/base"), Seq(s"$sliceDir/logs")).count())
    }
    spark.stop()
  }
}
