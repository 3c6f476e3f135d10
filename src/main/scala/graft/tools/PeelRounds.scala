package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the ITERATION counts SCALE.md quotes for the graph family
  * at a given SF: the k-core peel-round count (and survivor curve) of
  * the q_kcore bigram graph, plus the candidate-pair edge count that
  * decides q_dedup_clusters' adaptive CC path (driver union-find vs
  * large/small-star).  The peel replay collects the FILTERED bigram
  * graph (tiny at every SF — the `n >= 66` co-occurrence cut bounds
  * it by vocabulary, not corpus) and runs the exact integer loop on
  * the driver, so the printed round count is the engine's by
  * construction (same fixpoint rule).
  *
  * Usage: runMain graft.tools.PeelRounds <sfDir> [k]
  */
object PeelRounds {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = if (args.length > 1) args(1).toInt else 6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(graft.ops.TextOps.tokens(col("text")).as("__t"))
    val edges = t
      .select(col("__t"), explode(
        when(size(col("__t")) >= 2,
          sequence(lit(1), size(col("__t")) - 1))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(element_at(col("__t"), col("i")).as("x"),
        element_at(col("__t"), col("i") + 1).as("y"))
      .where(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .where(col("n") >= 66)
      .select("a", "b")
    val e = edges.collect().map(r => (r.getString(0), r.getString(1)))
    require(e.length < 5000000, s"graph unexpectedly large: ${e.length}")
    // exact integer peel: same fixpoint rule as GraphOps.kCore
    var nodes = e.flatMap(p => Seq(p._1, p._2)).toSet
    var rounds = 0
    var history = List.empty[Int]
    var converged = false
    while (!converged) {
      val deg = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
      e.foreach { case (a, b) =>
        if (nodes(a) && nodes(b)) { deg(a) += 1; deg(b) += 1 }
      }
      val next = nodes.filter(deg(_) >= k)
      converged = next.size == nodes.size
      nodes = next
      rounds += 1
      history ::= next.size
    }
    println(s"[peel] sf=$sfDir k=$k edges=${e.length} " +
      s"rounds_to_fixpoint=$rounds survivors=${history.reverse.mkString(">")}")
    // the CC decision input: candidate pairs from the dedup chain
    val pairs = graft.ops.DedupOps.minhashPairs(
      spark.read.parquet(s"$sfDir/documents.parquet"),
      "text", "doc_id", jaccardThreshold = 0.5)
    println(s"[cc] candidate_pairs=${pairs.count()} " +
      s"(driver union-find path while <= 1,000,000)")
    spark.stop()
  }
}
