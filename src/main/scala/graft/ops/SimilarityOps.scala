package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a
  * hyperplane-LSH-bucketed variant as the scale path (candidates only
  * join within matching buckets; multi-probe widens recall).
  *
  * Dot products are `aggregate(zip_with(...))` — a sequential
  * codegen'd fold, deterministic and UDF-free.
  */
object SimilarityOps {

  /** Σ aᵢ·bᵢ with double accumulation (elements cast up from float). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k: broadcast the (small) query set against
    * the corpus, rank per query.  At 100 TB the corpus side stays
    * partitioned; only queries are broadcast — no corpus shuffle
    * before the per-query top-k (rank runs on the shuffled slice of
    * query×k candidates via takeOrdered-style window).
    */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int = 10): DataFrame = {
    // norms precomputed per side — computing cosine(cv,qv) directly
    // would inline THREE dot products per candidate pair.  Zero-norm
    // vectors (padding rows, failed encodes) have no direction and are
    // dropped — under Spark 4's default ANSI mode the division would
    // otherwise kill the whole job
    val joined = corpus.select(col(corpusId).as("corpus_id"), col(corpusVec).as("cv"),
        norm(col(corpusVec)).as("cn"))
      .filter(col("cn") > 0)
      .crossJoin(broadcast(
        queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"),
          norm(col(queryVec)).as("qn"))
          .filter(col("qn") > 0)))
      .select(col("query_id"), col("corpus_id"),
        (dot(col("cv"), col("qv")) / (col("cn") * col("qn"))).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** Deterministic pseudo-random hyperplanes (LCG; values in
    * [-1, 1)), shipped as literals — no RNG at execution time.
    */
  private def hyperplanes(bits: Int, dim: Int): Seq[Seq[Double]] = {
    var state = 20240613L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 20) % 2000001L).toDouble / 1000000.0 - 1.0
    }
    Seq.fill(bits)(Seq.fill(dim)(next()))
  }

  /** Sign-LSH bucket id of a vector: one bit per hyperplane. */
  def lshBucket(vec: Column, bits: Int, dim: Int): Column =
    hyperplanes(bits, dim).zipWithIndex.map { case (h, i) =>
      when(dot(vec, lit(h.toArray)) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed near-neighbor pairs: vectors whose bucket collides,
    * verified by exact cosine ≥ threshold.  One shuffle on the bucket
    * id; bucket population is ~n/2^bits so the join is local and
    * skew-resistant (AQE handles hot buckets).
    */
  def lshCosinePairs(
      df: DataFrame, idCol: String, vecCol: String,
      bits: Int = 8, dim: Int = 64,
      threshold: Double = 0.9): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(vecCol).as("v"),
        norm(col(vecCol)).as("nrm"),
        lshBucket(col(vecCol), bits, dim).as("bucket"))
      .filter(col("nrm") > 0) // zero-norm: no direction; ANSI-safe
    val l = b.as("l")
    val r = b.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        (dot(col("l.v"), col("r.v")) / (col("l.nrm") * col("r.nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Exact all-pairs cosine ≥ threshold within a blocking key (used as
    * the oracle-checkable flavor; the LSH variant is the scale path).
    */
  def blockedCosinePairs(
      df: DataFrame, idCol: String, vecCol: String, blockCol: String,
      threshold: Double): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(vecCol).as("v"), col(blockCol).as("blk"),
        norm(col(vecCol)).as("nrm"))
      .filter(col("nrm") > 0) // zero-norm: no direction; ANSI-safe
    val l = b.as("l")
    val r = b.as("r")
    l.join(r, col("l.blk") === col("r.blk") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        (dot(col("l.v"), col("r.v")) / (col("l.nrm") * col("r.nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** IVF-flavored top-k: assign corpus vectors to the nearest of
    * `nCells` LSH-bucket centroids is overkill without kmeans; the
    * pragmatic scale path re-uses sign-LSH — probe the query's bucket
    * plus single-bit-flip neighbors (multi-probe) and rank only those
    * candidates.
    */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      bits: Int = 8, dim: Int = 64, k: Int = 10): DataFrame = {
    val c = corpus.select(col(corpusId).as("corpus_id"), col(corpusVec).as("cv"),
        norm(col(corpusVec)).as("cn"),
        lshBucket(col(corpusVec), bits, dim).as("bucket"))
      .filter(col("cn") > 0) // zero-norm: no direction; ANSI-safe
    // multi-probe: own bucket + all 1-bit flips
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"),
        norm(col(queryVec)).as("qn"),
        lshBucket(col(queryVec), bits, dim).as("qbucket"))
      .filter(col("qn") > 0)
      .select(col("query_id"), col("qv"), col("qn"),
        explode(array((0 to bits).map { i =>
          if (i == 0) col("qbucket")
          else col("qbucket").bitwiseXOR(shiftleft(lit(1L), i - 1))
        }: _*)).as("bucket"))
    val cand = c.join(broadcast(q), "bucket")
      .select(col("query_id"), col("corpus_id"),
        (dot(col("cv"), col("qv")) / (col("cn") * col("qn"))).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }
}
