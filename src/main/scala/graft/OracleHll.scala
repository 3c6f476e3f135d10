package graft

/** DuckDB-SQL replay of the [[graft.ops.SketchOps]] HyperLogLog family.
  *
  * The sketch is bit-deterministic (xxhash64 registers, exact decimal
  * harmonic sum — see SketchOps), so a foreign engine can recompute the
  * ESTIMATE itself, not just an "is it close" bound: bucket/rho come
  * from the same [[OracleXxh64.xxh64Cte]] hash replay the dedup oracles
  * use, the register max and scaled harmonic sum are integer arithmetic
  * (HUGEINT here, decimal(38,0) in Spark), and the final double
  * expressions are textually identical between the two engines, so the
  * driver's hash compare sees the same floats.
  *
  * Each oracle also recomputes the EXACT distinct count from the same
  * occurrence CTE, so the emitted rows pin estimate AND ground truth —
  * the accuracy claim (≤ ~1.04/sqrt(m) rse) is visible in the output,
  * not just asserted in a spec.
  */
object OracleHll {

  /** Full oracle for one HLL query.  `occCtes` must end with a CTE
    * `hll_occ(scope, s)` — one row per (group, key-string) occurrence;
    * duplicates are fine (HLL dedups by construction).  Emits
    * `(scope, buckets_used BIGINT, est_distinct DOUBLE,
    * exact_distinct BIGINT)` ordered by scope.
    */
  def hllSql(occCtes: String, p: Int): String = {
    val m = 1 << p
    val wb = 64 - p
    val pow2w = (BigInt(1) << wb).toString // bucket divisor 2^wbits
    val pow2w1 = (BigInt(1) << (wb + 1)).toString // harmonic scale 2^(wbits+1)
    // bit length of w (w > 0, w < 2^wbits): descending threshold chain
    val bitLen = (wb to 1 by -1)
      .map(l => s"WHEN w >= ${BigInt(1) << (l - 1)} THEN $l")
      .mkString("CASE ", " ", " END")
    s"""WITH $occCtes, hll_vocab AS (
       |  SELECT DISTINCT s AS s0 FROM hll_occ
       |), ${OracleXxh64.xxh64Cte("hll_vocab", Nil, sCol = "s0")}, hll_h AS (
       |  SELECT s, CAST(h AS HUGEINT) + CASE WHEN h < 0
       |         THEN 18446744073709551616 ELSE 0 END AS hu
       |  FROM xx_out
       |), hll_br AS (
       |  SELECT o.scope, CAST(hu // $pow2w AS BIGINT) AS bucket,
       |         CAST(hu % $pow2w AS BIGINT) AS w
       |  FROM hll_occ o JOIN hll_h USING (s)
       |), hll_regs AS (
       |  SELECT scope, bucket,
       |         max(CASE WHEN w = 0 THEN ${wb + 1}
       |                  ELSE ${wb + 1} - ($bitLen) END) AS rho
       |  FROM hll_br GROUP BY scope, bucket
       |), hll_agg AS (
       |  SELECT scope, CAST(count(*) AS BIGINT) AS buckets_used,
       |         sum(CAST(POW(2.0, ${wb + 1} - rho) AS HUGEINT)) AS s_present
       |  FROM hll_regs GROUP BY scope
       |), hll_est AS (
       |  SELECT scope, buckets_used,
       |         CASE WHEN est_raw <= ${2.5 * m} AND $m - buckets_used > 0
       |              THEN $m.0 * ln($m.0 / CAST($m - buckets_used AS DOUBLE))
       |              ELSE est_raw END AS est_distinct
       |  FROM (
       |    SELECT scope, buckets_used,
       |           0.7213 / (1.0 + 1.079 / $m.0) * $m.0 * $m.0 *
       |           ($pow2w1.0 / CAST(s_present + ($m - buckets_used)
       |              * CAST(POW(2.0, ${wb + 1}) AS HUGEINT) AS DOUBLE)) AS est_raw
       |    FROM hll_agg) t
       |), hll_exact AS (
       |  SELECT scope, CAST(count(DISTINCT s) AS BIGINT) AS exact_distinct
       |  FROM hll_occ GROUP BY scope
       |)
       |SELECT scope, buckets_used, est_distinct, exact_distinct
       |FROM hll_est JOIN hll_exact USING (scope)
       |ORDER BY scope""".stripMargin
  }

  /** q_hll_distinct: distinct word-3-shingles per documents.source at
    * p=10 — the corpus-vocabulary profile.  Shingle construction is
    * the minhash oracle's (same tokenizer, same `greatest(len-2,1)`
    * short-doc rule), so the key set matches `DedupOps.shingles`.
    */
  def hllDistinctSql: String = hllSql(
    s"""t AS (
       |  SELECT source,
       |         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
       |  FROM documents
       |), shing AS (
       |  SELECT source,
       |         list_distinct(list_transform(
       |           range(1, greatest(len(toks) - 2, 1) + 1),
       |           i -> array_to_string(toks[i:i+2], ' '))) AS sh
       |  FROM t
       |), hll_occ AS (
       |  SELECT source AS scope, unnest(sh) AS s FROM shing
       |)""".stripMargin, p = 10)

  /** q_hll_merged: distinct l_orderkey per l_returnflag plus a merged
    * 'ALL' row at p=12.  The Spark side builds 'ALL' by MERGING the
    * three per-flag register tables (hllMerge fold); DuckDB computes
    * 'ALL' directly over the union of occurrences — equality of the
    * two is exactly HLL's lossless-merge law, so this oracle pins the
    * law end-to-end, not just the estimator arithmetic.
    */
  def hllMergedSql: String = hllSql(
    s"""o AS (
       |  SELECT l_returnflag AS scope, CAST(l_orderkey AS VARCHAR) AS s
       |  FROM lineitem
       |), hll_occ AS (
       |  SELECT scope, s FROM o
       |  UNION ALL
       |  SELECT 'ALL' AS scope, s FROM o
       |)""".stripMargin, p = 12)
}
