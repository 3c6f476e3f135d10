package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Positional inverted index + phrase search — the serving-side shape
  * a corpus query layer needs once the corpus is too big to scan per
  * question.
  *
  * Two flavors of the same phrase query, pinned to identical output:
  *
  *  - [[phraseScan]] — the baseline: a pure per-row projection over
  *    the corpus (tokenize, slide, match).  Zero shuffle, zero state;
  *    cost is one full corpus scan per query.  Right answer when the
  *    query set is as big as the corpus (contamination sweeps).
  *  - [[writePostingsIndex]] + [[phraseProbe]] — the scale path: the
  *    positional posting table `(term, doc_id, tf, positions)` is
  *    written ONCE, bucketed by `term`, and every later phrase query
  *    reads ONLY the phrase's terms via bucket pruning (an `IN` filter
  *    on the bucket column selects those terms' buckets at planning
  *    time — `SelectedBucketsCount` in the scan node, pinned by
  *    `IndexSpec`).  At 100 TB the probe cost is O(posting lists of
  *    the query terms), not O(corpus): the index build is the one
  *    explode+groupBy shuffle, amortized over every query after it.
  *
  * Position intersection does the phrase matching in both flavors: a
  * phrase `w0 w1 … wk` matches at start `i` iff `i ∈ pos(w0) ∩
  * (pos(w1)−1) ∩ … ∩ (pos(wk)−k)` — integer set algebra on 1-based
  * token positions, exact under cross-engine replay (the DuckDB
  * oracle runs the same algebra on the same whitespace tokens).
  *
  * Reference scope: the reference engine has no text retrieval at
  * all; this family is part of the engine's beyond-reference
  * training-data surface (corpus inspection / contamination lookup).
  */
object IndexOps {

  /** Positional posting rows: one row per (term, doc_id) with the term
    * frequency and the ascending 1-based token positions.  One
    * explode + one groupBy — the classic index-build shuffle, keyed by
    * (term, doc_id) so a hot term still spreads over its documents
    * rather than funneling one reducer.  The positions array is
    * bounded by the document's own token count.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos0", "term")))
      .select(col("doc_id"), col("term"),
        (col("pos0") + 1).cast("int").as("pos"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).cast("long").as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))

  /** Posting summary for a term subset: `(term, doc_id, tf, first_pos,
    * last_pos)`.  The `isin` filter sits UNDER the explode's groupBy,
    * so only the requested terms' token instances are aggregated.
    */
  def postingSummary(
      df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos0", "term")))
      .where(col("term").isin(terms: _*))
      .select(col("doc_id"), col("term"), (col("pos0") + 1).as("pos"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).cast("long").as("tf"),
        min(col("pos")).cast("long").as("first_pos"),
        max(col("pos")).cast("long").as("last_pos"))

  /** Per-doc phrase-match start positions as a pure projection (no
    * explode, no shuffle): filter the candidate start range `1 …
    * n−k+1` by the k-way token-equality conjunction.  The `sequence`
    * is guarded for short docs — `sequence(1, 0)` would count DOWN.
    * `toks` MUST be a materialized token-array attribute, not the
    * tokenize expression itself: the lambda references it k times per
    * candidate start, and a re-inlined split would be O(n²) per doc
    * (the TextOps word-n-gram trap).
    */
  private def scanStarts(toks: org.apache.spark.sql.Column,
      phrase: Seq[String]): org.apache.spark.sql.Column = {
    val k = phrase.size
    val lastStart = size(toks) - (k - 1)
    when(lastStart >= 1,
      filter(sequence(lit(1), lastStart), i =>
        phrase.zipWithIndex.map { case (w, j) =>
          element_at(toks, i + j) === lit(w)
        }.reduce(_ && _)))
      .otherwise(array().cast("array<int>"))
  }

  /** Baseline phrase query: full-corpus projection scan.  Output
    * `(doc_id, n_matches, first_pos)` for matching docs only.
    *
    * The match filter is a REGEX on the raw text, not a predicate on
    * the computed starts: under `\s+` tokenization, "phrase occurs"
    * ⟺ `(^|\s)w0\s+w1…(\s|$)` matches, so the regex is exact (not a
    * prefilter) and the position algebra runs only on matching docs.
    * Filtering on `size(starts) > 0` instead would get PUSHED below
    * the projection with the whole token expression re-inlined into
    * the filter lambda — the split would recompute per candidate
    * start, O(n²·|text|) per doc (observed 40× slower at bench SF).
    */
  def phraseScan(
      df: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty && phrase.forall(_.nonEmpty), "empty phrase")
    val pat = phrase.map(java.util.regex.Pattern.quote)
      .mkString("(^|\\s)", "\\s+", "(\\s|$)")
    df.where(col(textCol).rlike(pat))
      .select(col(idCol).as("doc_id"),
        TextOps.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), scanStarts(col("toks"), phrase).as("starts"))
      .select(col("doc_id"),
        size(col("starts")).cast("long").as("n_matches"),
        array_min(col("starts")).cast("long").as("first_pos"))
  }

  /** Term → directory bucket, portable: the md5-60-bit hash mod
    * `nParts` ([[DedupOps.md5Hash60]] — same bytes in any engine and
    * computable on the driver, so a probe can name its partitions at
    * PLANNING time).
    */
  private def termBucket(c: org.apache.spark.sql.Column, nParts: Int) =
    pmod(DedupOps.md5Hash60(c), lit(nParts.toLong))

  /** Driver-side twin of [[termBucket]] — md5 hex head as a 60-bit
    * non-negative long, mod `nParts`.
    */
  private[graft] def termBucketLocal(term: String, nParts: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % nParts
  }

  /** One-time index build: [[invertedIndex]] written
    * DIRECTORY-PARTITIONED by the term's hash bucket `tb`.  A probe
    * filters `tb IN (buckets of its terms)`, which prunes at planning
    * time — only the named directories are listed and read,
    * independent of any planner heuristics (bucketed-table scans,
    * by contrast, are auto-disabled when a query doesn't join/agg on
    * the bucket key).  `nParts` trades pruning granularity against
    * directory count: at 100 TB a few thousand buckets keeps each at
    * one task's worth of postings while a k-term probe still reads
    * ≤ k/nParts of the index.
    */
  def writePostingsIndex(
      df: DataFrame, idCol: String, textCol: String,
      path: String, nParts: Int): Unit = {
    require(nParts > 0, s"bad nParts $nParts")
    invertedIndex(df, idCol, textCol)
      .withColumn("tb", termBucket(col("term"), nParts))
      .write.mode("overwrite")
      .partitionBy("tb")
      .parquet(path)
  }

  /** Indexed phrase query over a [[writePostingsIndex]] directory:
    * the `tb IN (term buckets)` filter partition-prunes the scan to
    * the phrase terms' directories (the bucket ids are computed on
    * the driver with [[termBucketLocal]] — `nParts` must match the
    * build), the `term IN` filter is pushed into those files' row
    * groups, the per-doc term→positions map is a k-entry
    * `map_from_entries` (posting rows are unique per (term, doc)),
    * and the shifted-set intersection reproduces [[phraseScan]]
    * exactly — a document missing any phrase term yields a null map
    * lookup, which nulls the intersection and drops the row.
    */
  def phraseProbe(
      spark: SparkSession, path: String, phrase: Seq[String],
      nParts: Int): DataFrame = {
    require(phrase.nonEmpty && phrase.forall(_.nonEmpty), "empty phrase")
    val terms = phrase.distinct
    val buckets = terms.map(termBucketLocal(_, nParts)).distinct
    val perDoc = spark.read.parquet(path)
      .where(col("tb").isin(buckets: _*) && col("term").isin(terms: _*))
      .groupBy("doc_id")
      .agg(map_from_entries(
        collect_list(struct(col("term"), col("positions")))).as("pm"))
    val starts = phrase.zipWithIndex.map { case (w, j) =>
      transform(element_at(col("pm"), lit(w)), p => p - j)
    }.reduce(array_intersect)
    perDoc.select(col("doc_id"), starts.as("starts"))
      .where(size(col("starts")) > 0)
      .select(col("doc_id"),
        size(col("starts")).cast("long").as("n_matches"),
        array_min(col("starts")).cast("long").as("first_pos"))
  }
}
