package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.MultiMatchCounts

/** Multi-pattern (blocklist) matching over document text.
  *
  * The operator a contamination/compliance stage actually runs at
  * 100 TB: match EVERY document against a list of banned phrases /
  * benchmark canaries / trigger strings in ONE pass, not one scan per
  * pattern.  Backed by the codegen'd
  * [[graft.functions.MultiMatchCounts]] Aho–Corasick expression —
  * O(chars + matches) per document independent of pattern count, no
  * shuffle (pure per-row projection), pattern list shipped once with
  * the serialized expression (a driver-built automaton, the
  * broadcast-variable shape without the broadcast plumbing).
  */
object MatchOps {

  /** `array<long>` of per-pattern occurrence counts for `text`. */
  def multiMatchCounts(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(
      MultiMatchCounts(ColumnBridge.expression(text), patterns))

  /** Long form: one row per (id, pattern) with a positive occurrence
    * count.  The posexplode runs over the single-pass count array, so
    * the text is scanned exactly once per document however long the
    * blocklist is; the zero-hit filter sits directly on the generate
    * output, where whole-stage codegen pipelines it — zero-hit
    * entries cost a loop iteration each, never a buffered row, and
    * nothing downstream (the element_at projection, any shuffle) sees
    * them.
    */
  def matchHits(
      df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val patternArr = array(patterns.map(lit): _*)
    df.select(col(idCol),
        multiMatchCounts(col(textCol), patterns).as("cnts"))
      .select(col(idCol), posexplode(col("cnts")).as(Seq("pidx", "hits")))
      .where(col("hits") > 0)
      .select(col(idCol),
        element_at(patternArr, col("pidx") + 1).as("pattern"),
        col("hits"))
  }

  /** Per-pattern corpus rollup: documents hit + total occurrences —
    * the audit table a blocklist owner reads.  One text pass + one
    * small-key aggregation (|patterns| groups).
    */
  def matchSummary(
      df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame =
    matchHits(df, idCol, textCol, patterns)
      .groupBy("pattern")
      .agg(count("*").cast("long").as("n_docs"),
        sum("hits").cast("long").as("total_hits"))

  /** Documents carrying NO blocklisted phrase — the pipeline's filter
    * form (the complement of [[matchHits]]'s audit form).  A NULL
    * document carries no blocklisted phrase, so it is KEPT: without
    * the coalesce the exists(...) predicate is NULL, its negation is
    * NULL, and where() would silently drop the row.
    */
  def filterClean(
      df: DataFrame, textCol: String, patterns: Seq[String]): DataFrame =
    df.where(coalesce(
      !exists(multiMatchCounts(col(textCol), patterns), _ > 0L), lit(true)))
}
