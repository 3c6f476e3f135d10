package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage: match DIRTY records (typos, truncations, OCR noise)
  * back to their clean counterparts — the entity-resolution step a
  * metadata ingest runs when joining "almost the same key" tables that
  * an equi-join would silently drop.
  *
  * Dedup's minhash/simhash families answer "are these two DOCUMENTS
  * near-identical" at token granularity; linkage needs CHARACTER-level
  * tolerance on short keys (a one-char deletion changes every token
  * after it), so the verify here is true Levenshtein distance and the
  * blocking is the classic SORTED-NEIGHBORHOOD method (Hernández &
  * Stolfo): sort all records by key, compare only records within a
  * window of `w` sort positions.  A small edit usually leaves the key
  * lexicographically adjacent to its original — and when it does not
  * (an edit in the first character moves the record far away), the
  * miss is deterministic and visible, not a sampling artifact.
  *
  * Execution shape: the rank is the TWO-PASS prefix-rank of
  * PackingOps (range-partition by the sort key, per-partition counts
  * prefix-summed on the driver — one tiny row per partition — and the
  * intra-partition row_number windowed BY PARTITION ID), never a
  * single global-ORDER window, which Spark executes as a one-task
  * sort over the whole corpus; the window join is `w` EQUI-joins on
  * shifted ranks (an offset explode), never a range/cross join; the
  * Levenshtein verify runs only on the ≤ w·n candidate pairs.
  */
object LinkOps {

  /** Dense global rank of `df` in ascending (`s`, `kind`, `id`) order
    * via the two-pass prefix scan (PackingOps.withGlobalOffset
    * pattern).  The ranged frame is PINNED before the two passes:
    * range boundaries come from sampling, so the offset pass and the
    * final pass must read one fixed partitioning.  Requires the
    * (s, kind, id) triple to be a total order (id unique per kind).
    */
  private[graft] def withGlobalRank(df: DataFrame, sortExpr: org.apache.spark.sql.Column): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val keyed = df.withColumn("sk", sortExpr)
    val ranged = DedupOps.registerPersist(keyed
      .repartitionByRange(parts, col("sk"), col("kind"), col("id"))
      .sortWithinPartitions("sk", "kind", "id")
      .withColumn("pid", spark_partition_id()))
    val partials = ranged.groupBy("pid").agg(count(lit(1)).as("pn"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = partials.map(_._1)
      .zip(partials.map(_._2).scanLeft(0L)(_ + _).init)
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("pid", "offset")
    val w = Window.partitionBy("pid").orderBy("sk", "kind", "id")
    ranged.join(broadcast(offDf), "pid")
      .withColumn("rn", col("offset") + row_number().over(w))
      .select(col("kind"), col("id"), col("s"), col("rn"))
  }

  /** Link `dirty` records to `clean` records whose `keyCol` is within
    * `maxLev` edits, considering candidates within `window` positions
    * of the combined sort order.  Returns
    * `(dirty_id, clean_id, lev INT)` — one row per surviving pair.
    *
    * With `reversePass` (the multi-pass discipline) the same machinery
    * runs a second time sorted on the REVERSED key and the pair sets
    * union: a front-of-string edit moves a record arbitrarily far in
    * forward order but leaves its reversed key adjacent, and dense
    * shared-prefix clusters that overflow the forward window rarely
    * share suffixes too.
    *
    * Both inputs must expose `idCol` and `keyCol`; null/empty keys are
    * dropped.  Comparison order is binary (both engines' default for
    * ASCII keys).
    */
  def sortedNeighborhoodLink(
      dirty: DataFrame, clean: DataFrame, idCol: String, keyCol: String,
      window: Int = 5, maxLev: Int = 3,
      reversePass: Boolean = false,
      bandedVerify: Boolean = true): DataFrame = {
    require(window >= 1 && window <= 64, s"bad window $window")
    require(maxLev >= 0, s"bad maxLev $maxLev")
    // Keep the caller's id TYPE (kCore/triangleCounts discipline): a
    // cast("long") here would silently null string ids — URL/doc-key
    // linkage would return null-id pairs instead of failing.  Any
    // orderable type works: the id only tiebreaks the sort and labels
    // the output.
    def side(df: DataFrame, kind: String) = df
      .select(col(idCol).as("id"), col(keyCol).as("s"))
      .where(col("s").isNotNull && length(col("s")) > 0)
      .withColumn("kind", lit(kind))
    val spark = dirty.sparkSession
    import spark.implicits._
    val offsets = (1 to window).toDF("off")
    def onePass(sortKey: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val u = withGlobalRank(
        side(dirty, "d").unionByName(side(clean, "c")), sortKey(col("s")))
      // w equi-joins via offset explode: pair (rn, rn+off) — no range join
      val lo = u.select(col("kind").as("kind_a"), col("id").as("id_a"),
        col("s").as("s_a"), col("rn"))
      val hi = u.select(col("kind").as("kind_b"), col("id").as("id_b"),
        col("s").as("s_b"), col("rn").as("rn_b"))
        .crossJoin(broadcast(offsets))
        .withColumn("rn", col("rn_b") - col("off"))
      val joined = lo.join(hi, "rn")
        .where(col("kind_a") =!= col("kind_b"))
      // bandedVerify (default): length band first (free column
      // arithmetic — |Δlen| > maxLev can never verify), then the
      // THRESHOLD levenshtein, a banded O(len·maxLev) DP with early
      // exit returning -1 past the threshold, instead of the full
      // O(len²) table per candidate pair.  The unbanded form stays as
      // the A/B reference (identical pairs, spec-pinned).
      val verified =
        if (bandedVerify)
          joined
            .where(abs(length(col("s_a")) - length(col("s_b"))) <= maxLev)
            .withColumn("lev", levenshtein(col("s_a"), col("s_b"), maxLev))
            .where(col("lev") >= 0)
        else
          joined
            .withColumn("lev", levenshtein(col("s_a"), col("s_b")))
            .where(col("lev") <= maxLev)
      verified
        .select(
          when(col("kind_a") === "d", col("id_a")).otherwise(col("id_b"))
            .as("dirty_id"),
          when(col("kind_a") === "d", col("id_b")).otherwise(col("id_a"))
            .as("clean_id"),
          col("lev").cast("int").as("lev"))
    }
    val fwd = onePass(identity)
    (if (reversePass) fwd.unionByName(onePass(reverse)) else fwd).distinct()
  }
}
