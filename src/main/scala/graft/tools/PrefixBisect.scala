package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

/** Bisects the prefix-filtered token-Jaccard join: wordcount demotion
  * pass, prefix construction, candidate join, verify.
  * Run: `sbt "runMain graft.tools.PrefixBisect [sfDir]"`.
  */
object PrefixBisect {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sfx10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PX $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    val t = docs.select(col("doc_id").as("id"), col("n_chars").as("blk"),
      array_distinct(TextOps.tokens(col("text"))).as("toks"))
      .withColumn("sz", size(col("toks"))).persist()
    timed("base")(t.count())
    timed("wordcount_top1024")(
      t.select(explode(col("toks")).as("tk")).groupBy("tk")
        .agg(count(lit(1)).as("df")).orderBy(col("df").desc, col("tk"))
        .limit(1024).collect().length)
    val pfx = DedupOps.jaccardPrefixes(t, 0.7, 1024).persist()
    timed("prefix_rows")(pfx.count())
    val cand = pfx.as("l").join(pfx.as("r"),
        col("l.blk") === col("r.blk") && col("l.ptok") === col("r.ptok") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b")).distinct()
      .persist()
    timed("candidates")(cand.count())
    val sides = t.select(col("id"), col("toks"))
    timed("verify")(
      cand.join(sides.select(col("id").as("id_a"), col("toks").as("__ta")), Seq("id_a"))
        .join(sides.select(col("id").as("id_b"), col("toks").as("__tb")), Seq("id_b"))
        .filter(size(col("__ta")) + size(col("__tb")) > 0)
        .withColumn("__i", size(array_intersect(col("__ta"), col("__tb"))))
        .select((col("__i").cast("double") /
          (size(col("__ta")) + size(col("__tb")) - col("__i"))).as("j"))
        .filter(col("j") >= 0.7).count())
    spark.stop()
  }
}
