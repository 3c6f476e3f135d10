package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-shape utilities for skewed keys at scale.
  *
  * Spark's own answers to join skew are broadcast (small side) and
  * AQE's runtime skew-join splitting; `saltedJoin` is the third,
  * PLAN-TIME lever for the case AQE cannot fix: a replicate-capable
  * small-but-not-broadcastable side against a big side whose hottest
  * key exceeds a single task even after AQE splits — salting spreads
  * ONE key's rows over `salt` reducers deterministically, trading a
  * `salt`× replication of the right side for a `salt`× fan-out of the
  * hot partition.
  */
object JoinOps {

  /** Skew-safe inner equi-join on `key`: the (big) left side gets a
    * per-row salt in `[0, salt)`, the (small) right side is replicated
    * once per salt value, and the join runs on `(key, salt)` — so the
    * rows of even a single degenerate key spread across `salt`
    * reducers.  The result set is EXACTLY the plain `big ⋈ small`
    * join (salting only re-routes rows), which is what the oracle
    * checks.
    *
    * The salt must NOT be a function of the join key (that would send
    * a hot key's rows to one reducer again), and it must be STABLE
    * under task re-attempts: a positional salt
    * (`monotonically_increasing_id`) changes when a lost shuffle
    * partition is recomputed in a different row order, silently
    * dropping/duplicating join rows (the SPARK-23207 class of bug).
    * So the salt hashes stable row CONTENT — `idCol` (a record id or
    * any roughly-uniform non-key column) plus a few cheap hashable
    * companion columns — which re-routes identically no matter how
    * many times the stage re-runs, and keeps spreading even when
    * `idCol` is null.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String, salt: Int,
      idCol: String): DataFrame = {
    require(salt > 0, s"saltedJoin: salt=$salt must be positive")
    require(small.columns.contains(key) && big.columns.contains(key),
      s"saltedJoin: both sides need column '$key'")
    require(big.columns.contains(idCol),
      s"saltedJoin: big side needs salt-source column '$idCol'")
    require(idCol != key,
      s"saltedJoin: salt source '$idCol' must differ from the join key — " +
        "salting by the key re-concentrates the hot key on one reducer")
    val saltCol = "__graft_salt"
    // hash the id FIRST but fold in companion columns too: xxhash64
    // skips null inputs (returning the running seed), so a null idCol
    // alone would send every null-id row of a hot key to ONE salt
    // bucket — the exact concentration the salt exists to avoid.
    // Companions are chosen, not "everything": MAP-typed columns (at
    // any nesting depth) are not hashable (analysis error) and hashing
    // whole document-sized payloads per row is a real cost at scale,
    // so take up to four hash-safe columns — fixed-width atomics
    // before variable-size ones — skipping duplicated names (ambiguous
    // references) and the JOIN KEY (constant per hot key, so it
    // carries zero spread and must not occupy a slot).  Arrays and
    // structs stay eligible: they are often the only varying content
    // next to a null id.  Null-id rows with identical companions still
    // co-locate — the deterministic floor: any content-stable salt
    // must map equal rows equally.
    import org.apache.spark.sql.types._
    def mapFree(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case ArrayType(e, _) => mapFree(e)
      case StructType(fields) => fields.forall(f => mapFree(f.dataType))
      case _ => true
    }
    val cheap: DataType => Boolean = {
      case StringType | BinaryType => false
      case _: ArrayType | _: StructType => false
      case _ => true
    }
    val uniqueNames = big.schema.fields.groupBy(_.name.toLowerCase)
      .collect { case (_, Array(f)) => f }.toSeq
    val companions = uniqueNames
      .filter(f => f.name != idCol && f.name != key && mapFree(f.dataType))
      .sortBy(f => (!cheap(f.dataType), big.columns.indexOf(f.name)))
      .take(4)
      .map(f => col(f.name))
    val saltSrc = col(idCol) +: companions
    val bigS = big.withColumn(saltCol,
      pmod(xxhash64(saltSrc: _*), lit(salt.toLong)).cast("int"))
    val smallS = small.withColumn(saltCol,
      explode(array((0 until salt).map(lit(_)): _*)))
    bigS.join(smallS, big.columns.intersect(Seq(key)).toSeq :+ saltCol)
      .drop(saltCol)
  }

  /** Bloom-pruned inner equi-join — the semi-join reduction lever for
    * a BIG probe side joining a selective build side: light a bloom
    * filter with the build side's keys (driver-collected bit
    * positions, ≤ m bits — ~16 KiB at m = 2¹⁷ regardless of build
    * row count), pre-filter the probe side with k codegen'd bit
    * probes per row, and only THEN shuffle for the join.  At 100 TB
    * the win is what never enters the exchange: with a 1%-selective
    * build side, ~99% of probe rows drop at the scan (false-positive
    * rate `(1−e^(−k·n/m))^k` leaks a few extra rows into the shuffle;
    * the join itself removes them, so the RESULT is exactly the plain
    * join — which is what the oracle checks; the row-reduction claim
    * is spec-pinned).
    *
    * This is the manual, portable form of Spark's own runtime bloom
    * rewrite (`spark.sql.optimizer.runtime.bloomFilter.enabled`) —
    * explicit so it applies when the optimizer's heuristics decline
    * (pre-aggregated builds, non-AQE plans, multi-use filters).
    *
    * Keys hash natively with xxhash64 — build and probe must pass the
    * same key TYPE (xxhash64 of a long and of its string differ).
    */
  def bloomPrunedJoin(
      big: DataFrame, bigKey: String, small: DataFrame, smallKey: String,
      mBits: Int = 1 << 17, k: Int = 4): DataFrame = {
    require(k <= 7 && mBits % 64 == 0, s"bloomPrunedJoin: mBits=$mBits k=$k")
    val positions = buildPositions(small, smallKey, mBits, k)
    val probe = withBloomFilter(big, bigKey, positions, mBits, k)
    // same key name on both sides (self-joins, conformed dimensions)
    // would make col(bigKey) === col(smallKey) ambiguous — alias the
    // sides so the condition resolves, like intervalJoin does
    probe.as("__bloom_big").join(small.as("__bloom_small"),
      col(s"__bloom_big.$bigKey") === col(s"__bloom_small.$smallKey"))
  }

  /** Kirsch–Mitzenmacher position set from TWO xxhash64 draws — the
    * bloom here is engine-internal (the join removes false positives,
    * so the oracle never sees the hash), which frees it from the
    * portable-md5 discipline: xxhash64 on the native key type costs
    * ~nothing per row where the md5-on-string chain measured ~1.7 µs
    * (the whole probe scan was 5× the join it was pruning for).
    */
  private def positionCols(key: org.apache.spark.sql.Column, mBits: Int, k: Int) = {
    // mod-reduce BEFORE the j·h2 combination: full-range 64-bit
    // hashes overflow the Long sum under ANSI; mod distributes, so
    // the position set is unchanged
    val m = lit(mBits.toLong)
    val h1 = pmod(xxhash64(key), m)
    val h2 = pmod(xxhash64(key, lit("graft-bloom-2")), m)
    (0 until k).map(j => pmod(h1 + lit(j.toLong) * h2, m))
  }

  private def buildPositions(
      small: DataFrame, smallKey: String, mBits: Int, k: Int): Array[Long] =
    small.select(col(smallKey).as("g")).distinct()
      .select(explode(array(positionCols(col("g"), mBits, k): _*)).as("pos"))
      .distinct().collect().map(_.getLong(0))

  private def withBloomFilter(
      big: DataFrame, bigKey: String, positions: Array[Long],
      mBits: Int, k: Int): DataFrame = {
    val words = new Array[Long](mBits / 64)
    positions.foreach { p => words((p / 64).toInt) |= 1L << (p % 64).toInt }
    val wordsLit = lit(words)
    def bitSet(pos: org.apache.spark.sql.Column) =
      call_function("shiftrightunsigned",
        element_at(wordsLit, (pos / lit(64L)).cast("int") + lit(1)),
        (pos % lit(64L)).cast("int")).bitwiseAND(lit(1L)) === lit(1L)
    val probe = positionCols(col(bigKey), mBits, k)
      .map(bitSet).reduce(_ && _)
    big.where(probe)
  }

  /** The probe-side survivor count of [[bloomPrunedJoin]]'s
    * pre-filter — the observability hook the spec pins the reduction
    * claim with.
    */
  private[graft] def bloomSurvivors(
      big: DataFrame, bigKey: String, small: DataFrame, smallKey: String,
      mBits: Int = 1 << 17, k: Int = 4): Long =
    withBloomFilter(big, bigKey,
      buildPositions(small, smallKey, mBits, k), mBits, k).count()
}
