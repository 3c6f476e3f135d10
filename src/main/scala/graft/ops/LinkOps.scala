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
  * Execution shape: the rank comes from one global sort (range
  * partition + window — at corpus scale substitute the two-pass
  * prefix-rank of PackingOps); the window join is `w` EQUI-joins on
  * shifted ranks (an offset explode), never a range/cross join; the
  * Levenshtein verify runs only on the ≤ w·n candidate pairs.
  */
object LinkOps {

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
      reversePass: Boolean = false): DataFrame = {
    require(window >= 1 && window <= 64, s"bad window $window")
    require(maxLev >= 0, s"bad maxLev $maxLev")
    def side(df: DataFrame, kind: String) = df
      .select(col(idCol).cast("long").as("id"), col(keyCol).as("s"))
      .where(col("s").isNotNull && length(col("s")) > 0)
      .withColumn("kind", lit(kind))
    val spark = dirty.sparkSession
    import spark.implicits._
    val offsets = (1 to window).toDF("off")
    def onePass(sortKey: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val u = side(dirty, "d").unionByName(side(clean, "c"))
        .withColumn("rn", row_number().over(
          Window.orderBy(sortKey(col("s")), col("kind"), col("id"))))
      // w equi-joins via offset explode: pair (rn, rn+off) — no range join
      val lo = u.select(col("kind").as("kind_a"), col("id").as("id_a"),
        col("s").as("s_a"), col("rn"))
      val hi = u.select(col("kind").as("kind_b"), col("id").as("id_b"),
        col("s").as("s_b"), col("rn").as("rn_b"))
        .crossJoin(broadcast(offsets))
        .withColumn("rn", col("rn_b") - col("off"))
      lo.join(hi, "rn")
        .where(col("kind_a") =!= col("kind_b"))
        .withColumn("lev", levenshtein(col("s_a"), col("s_b")))
        .where(col("lev") <= maxLev)
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
