package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Replicates the sf0.1 testdata `factor`× into a scratch dir so the
  * bench can measure ≥ sf1 scale factors the driver never materializes
  * (VERDICT r09: the 100 TB design claims — CC round count, banded-join
  * skew, IVF probe fraction — were plan-verified but unmeasured past
  * sf0.1).
  *
  * Replication keeps each table's internal structure instead of pasting
  * exact copies:
  *  - every entity key is offset by `replica * 1e10`, consistently
  *    across fact/dim tables, so join fan-in and key cardinality scale
  *    with the data (10 exact key copies would instead turn every join
  *    into a hot-key microbenchmark);
  *  - document text is salted with a per-replica SUFFIX ON EVERY TOKEN
  *    (`tok` → `tok_r3`): within a replica the token stream is
  *    isomorphic to the original — exact/near-dup structure, token
  *    counts, and shingle-collision behavior are preserved — while no
  *    shingle survives across replicas, so cross-replica Jaccard is ~0
  *    and dup DENSITY stays constant as the corpus grows.  (A weaker
  *    prefix-only salt leaves replicas ~0.99-Jaccard near-dups of each
  *    other: every doc gains `factor`−1 true near-dups, the pair count
  *    grows quadratically in `factor`, and the bench measures a
  *    100-way-boilerplate stress corpus instead of scaling — kept
  *    available as `saltMode=prefix` because that adversarial shape is
  *    worth measuring too);
  *  - embeddings get a deterministic per-replica nudge on dim 0 for the
  *    same reason (identical vectors would make every ANN hit a tie);
  *  - events keep their time range — same window span, `factor`× the
  *    density and users, which is how a bigger corpus actually looks.
  *
  * Usage: runMain graft.tools.ScaleUp <inSfDir> <outDir> <factor> [saltMode]
  * saltMode: `token` (default, iso-density) | `prefix` (adversarial
  * 100-way-cluster stress).
  */
object ScaleUp {
  private val K = 10000000000L // replica key offset; >> any sf0.1 key

  def main(args: Array[String]): Unit = {
    val in = args(0)
    val out = args(1)
    val factor = args(2).toInt
    val saltMode = if (args.length > 3) args(3) else "token"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def reps(t: String)(f: (DataFrame, Int) => DataFrame): DataFrame = {
      val df = spark.read.parquet(s"$in/$t.parquet")
      (0 until factor).map(i => f(df, i)).reduce(_.unionByName(_))
    }
    def offset(df: DataFrame, i: Int, keys: String*): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * K)))
    // output files sized for the factor: sf0.1 ships ~32 row groups'
    // worth at ×100, so spread each table over enough files that the
    // bench scans parallelize across all local[32] slots
    def write(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")

    write(reps("lineitem")((d, i) =>
      offset(d, i, "l_orderkey", "l_partkey", "l_suppkey")), "lineitem",
      4 * factor)
    write(reps("orders")((d, i) => offset(d, i, "o_orderkey", "o_custkey")),
      "orders", factor)
    write(reps("customer")((d, i) => offset(d, i, "c_custkey")), "customer",
      math.max(1, factor / 4))
    write(reps("supplier")((d, i) => offset(d, i, "s_suppkey")), "supplier",
      math.max(1, factor / 8))
    write(reps("part")((d, i) => offset(d, i, "p_partkey")), "part",
      math.max(1, factor / 4))
    // dims that stay fixed at every TPC-H SF
    Seq("nation", "region").foreach { t =>
      write(spark.read.parquet(s"$in/$t.parquet"), t, 1)
    }
    write(reps("events")((d, i) => offset(d, i, "event_id", "user_id")),
      "events", factor)
    write(reps("documents") { (d, i) =>
      val salted =
        if (i == 0) d
        else {
          val txt =
            if (saltMode == "prefix") concat(lit(s"r$i "), col("text"))
            else concat_ws(" ", transform(
              filter(split(col("text"), "\\s+"), t => t =!= lit("")),
              t => concat(t, lit(s"_r$i"))))
          d.withColumn("text", txt)
            .withColumn("n_chars", length(col("text")).cast("long"))
        }
      offset(salted, i, "doc_id")
    }, "documents", factor)
    write(reps("embeddings") { (d, i) =>
      val nudged =
        if (i == 0) d
        else d.withColumn("embedding",
          transform(col("embedding"), (x, j) =>
            when(j === 0, x + lit((i * 1e-6).toFloat)).otherwise(x)))
      offset(nudged, i, "vec_id")
    }, "embeddings", math.max(1, factor / 2))

    println(s"[scaleup] wrote $out at factor $factor")
    spark.stop()
  }
}
