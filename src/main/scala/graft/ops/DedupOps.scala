package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, Spark-first:
  *
  *  - exact (hash groupBy)
  *  - MinHash + LSH banding (shingle → signature → band → bucket join)
  *  - SimHash (near-dup via fingerprint chunk collision + hamming)
  *  - n-gram Jaccard verification
  *  - embedding-cosine near-dup with hyperplane-LSH blocking
  *
  * Signatures/fingerprints are computed as pure per-row array
  * expressions (no explode, no UDF) so the only shuffles are the final
  * bucket joins — which group a handful of candidate rows per key.
  * Skew note: a degenerate corpus (one shingle everywhere) would skew
  * a band bucket; the bucket join keys include the band index and AQE
  * skew-join handles stragglers at scale.
  */
object DedupOps {

  private val P: Long = 2147483647L // 2^31-1, Mersenne prime

  /** Plans persisted by dedup passes (minhashPairs keeps its shingle and
    * signature tables alive for the band + verify joins).  The returned
    * DataFrames are lazy, so the operators themselves can never know
    * when the caller's terminal action has run — long-lived sessions
    * issuing repeated dedup passes should call [[unpersistAll]] after
    * consuming each result (otherwise the MEMORY_AND_DISK blocks wait
    * for LRU eviction).
    */
  private val persistedPlans =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  private[graft] def registerPersist(df: DataFrame): DataFrame = {
    persistedPlans.add(df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    df
  }

  /** Release every cached plan a dedup pass left behind (blocking=false:
    * eviction proceeds asynchronously).  Safe to call between passes —
    * an in-flight plan would just recompute.
    */
  def unpersistAll(): Unit = {
    var df = persistedPlans.poll()
    while (df != null) { df.unpersist(blocking = false); df = persistedPlans.poll() }
  }

  /** Deterministic (a,b) parameters for the minhash family. */
  private[graft] def hashParams(n: Int): Seq[(Long, Long)] = {
    var state = 42L
    def next(): Long = { // LCG (Numerical Recipes constants), exact i64 wrap
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 33) % (P - 1)
    }
    Seq.fill(n)((next() + 1, next()))
  }

  /** 60-bit integer hash from the first 15 hex chars of md5 —
    * reproducible in any engine with md5 + hex parsing (DuckDB:
    * `('0x' || substr(md5(s),1,15))::BIGINT`), unlike Spark's
    * xxhash64.  The oracle-checkable `portableHash` dedup flavors use
    * this; the default xxhash64 stays the fast path.  Since r12 the
    * implementation is the fused [[graft.functions.Md5Hash60]] —
    * digest bytes straight to the long, no hex-string round-trip per
    * gram (the composed `conv(substring(md5(c),1,15),16,10)` stays
    * below as the parity reference).
    */
  private[graft] def md5Hash60(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.Md5Hash60(
        org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Composed parity reference for [[md5Hash60]]. */
  private[graft] def md5Hash60Composed(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Word k-shingles of a document as a distinct array.  Single-
    * expression convenience — the operators here tokenize into a
    * materialized column first and use [[shinglesOf]] (see
    * [[TextOps.wordNgramsOf]] for the re-inlining trap this avoids).
    */
  def shingles(c: Column, k: Int = 3): Column =
    array_distinct(TextOps.wordNgrams(c, k))

  /** [[shingles]] over a PRE-MATERIALIZED token-array column. */
  def shinglesOf(toks: Column, k: Int = 3): Column =
    array_distinct(TextOps.wordNgramsOf(toks, k))

  /** MinHash signature from a MATERIALIZED base-hash column:
    * h_i(s) = (a_i * base + b_i) mod P, minimum over shingles.
    *
    * The base hashes must be their own projection column — inlining
    * them would recompute the whole shingle+hash chain once per hash
    * function per row (numHashes× slower; same re-inlining trap as
    * TextOps.winnowFingerprints documents).
    */
  def minhashSignatureFromBase(base: Column, numHashes: Int): Column = {
    val params = hashParams(numHashes)
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.MinhashSignature(
        org.apache.spark.sql.graft.ColumnBridge.expression(base),
        params.map(_._1).toArray, params.map(_._2).toArray))
  }

  /** Composed form of [[minhashSignatureFromBase]] — parity-spec
    * reference (numHashes interpreted transform+array_min passes).
    * Null wrap: a null base gives a null signature, not an array of
    * nulls — the fused expression's (and the only useful) contract.
    */
  private[graft] def minhashSignatureFromBaseHof(base: Column, numHashes: Int): Column =
    when(base.isNull, lit(null).cast("array<bigint>")).otherwise(
      array(hashParams(numHashes).map { case (a, b) =>
        array_min(transform(base, h => pmod(h * lit(a) + lit(b), lit(P))))
      }: _*))

  /** Whole-chain MinHash signature of a text column in ONE projection
    * — the SQL-surface / single-column convenience (`graft_minhash`):
    * tokens → k-shingles → xxhash64-mod-P base → fused k-minima.  The
    * base transform is the one interpreted HOF in the chain; for the
    * corpus-scale candidate-pair path use [[minhashPairs]], whose
    * explode formulation keeps the base hash codegen'd.
    */
  def minhashSignatureOfText(
      text: Column, shingleSize: Int = 3, numHashes: Int = 32): Column =
    minhashSignatureFromBase(
      transform(shinglesOf(TextOps.tokens(text), shingleSize),
        s => pmod(xxhash64(s), lit(P))), numHashes)

  /** MinHash signature straight from a gram-array column in ONE
    * compiled loop ([[graft.functions.MinhashFromGrams]]): base hash +
    * k minima fused, no explode, no shuffle.  Empty/null gram arrays
    * → null (filter `isNotNull` to match the explode form's row set).
    */
  def minhashFromGrams(
      grams: Column, numHashes: Int, portable: Boolean = false): Column = {
    val params = hashParams(numHashes)
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.MinhashFromGrams(
        org.apache.spark.sql.graft.ColumnBridge.expression(grams),
        params.map(_._1).toArray, params.map(_._2).toArray, portable))
  }

  /** Adds shingle + signature columns (two materialized stages). */
  def withMinhashSignature(
      df: DataFrame, textCol: String, shCol: String, sigCol: String,
      numHashes: Int = 32, shingleSize: Int = 3): DataFrame =
    df.withColumn(shCol + "__toks", TextOps.tokens(col(textCol)))
      .withColumn(shCol, shinglesOf(col(shCol + "__toks"), shingleSize))
      .drop(shCol + "__toks")
      .withColumn(sigCol + "__base",
        transform(col(shCol), s => pmod(xxhash64(s), lit(P))))
      .withColumn(sigCol, minhashSignatureFromBase(col(sigCol + "__base"), numHashes))
      .drop(sigCol + "__base")

  /** Exact-duplicate groups: content-hash groupBy keeping the minimum
    * id as the canonical row.  One shuffle on the 128-bit hash.
    * No collect_list of member ids — a boilerplate document duplicated
    * billions of times would put unbounded state in one aggregate row;
    * recover members by joining the hash back when needed
    * (`exactDupMembers`).
    */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("keep_id"))
      .filter(col("cnt") > 1)

  /** (content_hash, id) membership rows for the duplicate groups —
    * the bounded-row form of the member listing.
    */
  def exactDupMembers(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(md5(col(textCol)).as("content_hash"), col(idCol).as("id"))
      .join(exactDupGroups(df, textCol, idCol).select("content_hash"), "content_hash")

  /** Substring-level duplication profile (the window-granularity form
    * of Lee et al. 2022's "Deduplicating Training Data Makes Language
    * Models Better" exact-substring dedup): hash every OVERLAPPING
    * k-token window of every document, count how many documents each
    * window hash occurs in, and report per document how many of its
    * windows also appear in some OTHER document.  `dup_frac` near 1
    * marks documents that are mostly stitched from text duplicated
    * elsewhere in the corpus even when no whole-document or
    * shingle-set test fires (templated spam, mirrored fragments).
    *
    * Scale shape: windows travel as 8-byte hashes from the first
    * projection on (the suffix-array formulation needs a global sort
    * over all corpus positions; this one needs only hash-keyed
    * aggregation).  The per-hash document count and the join back to
    * window occurrences are BOTH keyed on the window hash, so the
    * second step lands on co-partitioned sides — one logical shuffle
    * of (id, hash) pairs plus the final per-doc aggregation.  A
    * within-doc repeat alone (nd = 1) is intra-doc repetition, which
    * [[TextOps.repetitionStats]] already measures — it does not count
    * as corpus duplication here.
    *
    * `portableHash` swaps xxhash64 for the md5-60bit hash so DuckDB
    * replays the identical pipeline.
    */
  /** Span-level duplicate REMOVAL (Lee et al. 2022's substring dedup
    * as an action, not just a statistic): every k-token window seen in
    * ≥ 2 documents is kept ONLY by the lowest-id document containing
    * it; every other document has that window's token span cut out.
    * Overlapping cut spans merge naturally (a token goes when ANY
    * removed window covers it), and exact-duplicate documents of a
    * keeper collapse to empty — keep-first at span granularity.
    * Output per doc: original/removed token counts + the md5 of the
    * cleaned text, so the result frame stays narrow at any corpus
    * size.
    *
    * Scale shape: windows travel as (id, start, 8-byte hash) rows —
    * the text itself never shuffles; the keeper rule is one hash agg
    * (min id + distinct count) joined back hash-keyed; the cut is a
    * pure array projection per doc (`exists` over the ≤ n_windows
    * sorted starts).  Same clamp convention as
    * [[duplicateWindowStats]]: a doc shorter than k yields one
    * clamped window, so short exact-dups dedup too.
    */
  def removeDuplicateSpans(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, portableHash: Boolean = false): DataFrame = {
    val gramHash: Column => Column =
      if (portableHash) md5Hash60 else c => xxhash64(c)
    val toks = df.select(col(idCol).as("id"),
      TextOps.tokens(col(textCol)).as("toks"))
    // windows via the FUSED gram builder + a post-explode scalar hash
    // (posexplode supplies the start index): the old per-window
    // `gramHash(concat_ws(slice(...)))` ran INTERPRETED inside the
    // transform lambda — the exact trap wordNgramsOf exists to avoid;
    // gram strings are parity-pinned identical to that composed form
    val wins = registerPersist(toks.select(col("id"),
        posexplode(TextOps.wordNgramsOf(col("toks"), k)).as(Seq("pos", "g")))
      .select(col("id"), (col("pos") + 1).as("start"),
        gramHash(col("g")).as("wh")))
    val own = wins.groupBy("wh").agg(
      count_distinct(col("id")).as("nd"), min(col("id")).as("keeper"))
    val rm = wins.join(own, "wh")
      .filter(col("nd") >= 2 && col("id") =!= col("keeper"))
      .groupBy("id").agg(sort_array(collect_set(col("start"))).as("starts"))
    cutSpans(toks, rm, k)
  }

  /** The span-cut projection shared by [[removeDuplicateSpans]] and
    * [[TextOps.removeContaminatedSpans]]: drop every token covered by
    * any removed window start in `rm` (`(id, starts sorted array)`),
    * and summarize per doc.  Pure array projection — the text never
    * shuffles.
    */
  private[graft] def cutSpans(
      toks: DataFrame, rm: DataFrame, k: Int): DataFrame =
    toks.join(rm, Seq("id"), "left")
      .withColumn("st", coalesce(col("starts"), array().cast("array<int>")))
      // greatest(…, 1) + the j <= size guard keeps the sequence
      // ascending for empty docs (sequence(1, 0) would run DESCENDING)
      .withColumn("kept", filter(
        sequence(lit(1), greatest(size(col("toks")), lit(1))),
        j => j <= size(col("toks")) &&
          !exists(col("st"), s => j >= s && j <= s + lit(k - 1))))
      .select(col("id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"),
        md5(concat_ws(" ",
          transform(col("kept"), j => element_at(col("toks"), j))))
          .as("clean_md5"))

  def duplicateWindowStats(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, portableHash: Boolean = false): DataFrame = {
    val gramHash: Column => Column =
      if (portableHash) md5Hash60 else c => xxhash64(c)
    val occ = registerPersist(
      df.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("__t"))
        .select(col("id"), explode(TextOps.wordNgramsOf(col("__t"), k)).as("g"))
        .select(col("id"), gramHash(col("g")).as("wh")))
    val docsPerHash = occ.groupBy("wh")
      .agg(count_distinct(col("id")).as("nd"))
    occ.join(docsPerHash, "wh")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_windows"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_dup_windows"))
      .withColumn("dup_frac",
        col("n_dup_windows").cast("double") / col("n_windows"))
  }

  /** MinHash-LSH near-duplicate candidate pairs, verified with exact
    * shingle-set Jaccard.
    *
    * Plan shape: per-row signature (codegen'd) → explode only the BAND
    * hashes (bands × rows, small) → self-join per (band, bandHash)
    * bucket → distinct candidate pairs → exact Jaccard verify on the
    * pair (array intersection over the two shingle sets).
    */
  /** @param saltHotBands auto-salt threshold (0 = off): a band bucket
    *   holding more than this many docs has its self-join split into a
    *   triangular GRID — each row hashes to a cell `c` of
    *   `s = ⌈n/threshold⌉` (capped 64), the left side replicates to
    *   cells `(c, j ≥ c)` and the right to `(i ≤ c, c)`, so every
    *   unordered pair meets in EXACTLY one cell and the pair set is
    *   bit-identical to the plain join while no join task reads more
    *   than ~threshold rows per side.  Unlike `maxBand` (which drops
    *   buckets whole) this keeps every candidate; unlike AQE skew-split
    *   (which re-plans partitions, pinned in OpsSpec) it bounds the
    *   per-KEY group that a single sort-merge task must buffer.
    *   DEFAULT ON at 2¹³ rows, so the 100 TB invocation is never one
    *   hot boilerplate band away from a single task emitting a C(n,2)
    *   group — opting OUT (0) is the explicit choice now, not opting
    *   in.  The threshold doubles as the per-task OUTPUT bound and
    *   must stay modest: the grid join's input arrives pre-shuffled on
    *   (band, band_hash) by the bucket-count join, which concentrates
    *   each key in ONE mapper — AQE skew-split cannot subdivide a
    *   single-mapper key (spec-pinned), so a sub-threshold bucket is
    *   one task producing ≤ C(threshold, 2) pairs.  2¹³ caps that at
    *   ~3×10⁷ pairs (seconds); 2¹⁶ would be ~2×10⁹ (hours).
    */
  def minhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleSize: Int = 3,
      jaccardThreshold: Double = 0.8,
      portableHash: Boolean = false,
      maxBand: Int = Int.MaxValue,
      saltHotBands: Int = 1 << 13,
      fusedSignature: Boolean = true): DataFrame = {
    val rows = numHashes / bands
    // portableHash: md5-derived base hashes + comma-joined band keys so
    // an external engine can recompute the identical pipeline (the
    // oracle flavor); default: xxhash64 base + 8-byte band keys (the
    // scale flavor — band keys shuffle as longs, not strings)
    val bandKey: Column => Column =
      if (portableHash)
        b => concat_ws(",",
          transform(slice(col("sig"), b * lit(rows) + lit(1), lit(rows)),
            _.cast("string")))
      else b => xxhash64(slice(col("sig"), b * lit(rows) + lit(1), lit(rows)))
    // persisted because three downstream passes (signature explode +
    // the two candidate verify joins) would otherwise each re-derive
    // every shingle array — the same pattern MLlib's LSH uses; spills
    // to disk at scale, released via DedupOps.unpersistAll()
    val shingled = registerPersist(
      df.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("__t"))
        .select(col("id"), shinglesOf(col("__t"), shingleSize).as("sh")))
    // signature stage.  Default (r12): ONE compiled loop straight off
    // the persisted gram arrays (MinhashFromGrams — base hash + 32
    // minima fused), a shuffle-free projection.  fusedSignature =
    // false keeps the pre-r12 explode + 33-column aggregation as the
    // A/B reference (hash AFTER the explode because a hash inside a
    // transform lambda runs interpreted per element).  Persisted
    // either way: the band self-join references sigs twice (l/r); the
    // signature table is tiny (one 32-long row per doc)
    val sigs = registerPersist(
      if (fusedSignature)
        shingled.select(col("id"),
            minhashFromGrams(col("sh"), numHashes, portableHash).as("sig"))
          .where(col("sig").isNotNull)
      else {
        val baseHash: Column => Column =
          if (portableHash) s => pmod(md5Hash60(s), lit(P))
          else s => pmod(xxhash64(s), lit(P))
        val exploded = shingled.select(col("id"), explode(col("sh")).as("s"))
          .select(col("id"), baseHash(col("s")).as("h"))
        val minCols = hashParams(numHashes).zipWithIndex.map { case ((a, b), i) =>
          min(pmod(col("h") * lit(a) + lit(b), lit(P))).as(s"m$i")
        }
        exploded.groupBy("id").agg(minCols.head, minCols.tail: _*)
          .select(col("id"),
            array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
      })
    // band bucketing on the SMALL signature rows only (no shingle
    // arrays through this shuffle); candidate pairs are rare, so the
    // exact-Jaccard verify re-derives shingles just for them via two
    // broadcast joins of the candidate ids
    val bandedAll = sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), bandKey))
        .as(Seq("band", "band_hash")))
    // hot-band guard (same discipline as simhashPairs/tokenJaccardPairs):
    // a band bucket of n docs emits C(n,2) candidates, and no runtime
    // re-plan fixes OUTPUT explosion — a boilerplate bucket of 10M docs
    // at 100 TB is 5·10¹³ pairs.  Buckets past `maxBand` are dropped
    // whole (an oversized bucket is near-boilerplate; exact dedup
    // catches its identical members far cheaper).  Default keeps every
    // bucket — moderate skew is AQE's job (skew-split pinned in
    // OpsSpec), the cap is for the pathological tail.
    val banded =
      if (maxBand == Int.MaxValue) bandedAll
      else {
        // persisted: referenced by both the count subquery and the
        // probe side; the window alternative would single-task each
        // hot bucket — exactly the skew this guard exists to bound
        val b = registerPersist(bandedAll)
        val ok = b.groupBy("band", "band_hash")
          .agg(count(lit(1)).as("__n")).filter(col("__n") <= maxBand)
          .drop("__n")
        b.join(ok, Seq("band", "band_hash"))
      }
    // single reference to `cand` — referencing it more than once would
    // recompute the whole signature/band subtree per reference
    val rawPairs =
      if (saltHotBands <= 0)
        banded.as("l").join(banded.as("r"),
            col("l.band") === col("r.band") &&
            col("l.band_hash") === col("r.band_hash") &&
            col("l.id") < col("r.id"))
          .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      else saltedBandPairs(banded, saltHotBands)
    val cand = rawPairs.dropDuplicates("id_a", "id_b")
    cand
      .join(shingled.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shingled.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      // |A∪B| = |A|+|B|−|A∩B| for the DISTINCT shingle arrays — one
      // hash-set pass per pair instead of intersect AND union (same
      // integers, bit-identical quotient)
      .withColumn("__i", size(array_intersect(col("sh_a"), col("sh_b"))))
      .select(col("id_a"), col("id_b"),
        (col("__i").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("__i"))).as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
  }

  /** Grid-salted bucket cells for [[saltedBandPairs]]: each `(band,
    * band_hash, id)` row annotated with its counted bucket size `__n`,
    * split factor `__s = ⌈n/threshold⌉` (1 for cold buckets, capped
    * 64), and hash cell `__c = xxhash64(id) mod __s`.  Exposed to the
    * spec so the per-cell input bound is directly assertable.
    */
  private[graft] def bandCells(banded: DataFrame, threshold: Int): DataFrame = {
    val b = registerPersist(banded)
    val counts = b.groupBy("band", "band_hash").agg(count(lit(1)).as("__n"))
    b.join(counts, Seq("band", "band_hash"))
      .withColumn("__s",
        when(col("__n") <= threshold, lit(1L))
          .otherwise(least(
            ceil(col("__n").cast("double") / threshold).cast("long"),
            lit(64L))))
      .withColumn("__c", pmod(xxhash64(col("id")), col("__s")))
  }

  /** Skew-bounded band self-join: the triangular grid split described
    * on [[minhashPairs]]'s `saltHotBands` — returns the IDENTICAL
    * unordered pair set as the plain `(band, band_hash)` self-join,
    * with per-join-key group size bounded by the cell population
    * ≈ threshold instead of the full bucket.  A pair with cells
    * `c_a < c_b` meets exactly once, at grid cell `(c_a, c_b)` (the
    * lower-cell row as `l`, whichever id order); an equal-cell pair
    * meets in both orientations, which the canonical least/greatest
    * projection + the caller's dropDuplicates collapse — an `id_a <
    * id_b` JOIN filter would instead LOSE pairs whose id order opposes
    * their cell order.  Replication cost is ~`s/2`+1 rows per
    * hot-bucket row — O(n·s) input for C(n,2) output, the standard
    * skew-grid trade.
    */
  private[graft] def saltedBandPairs(banded: DataFrame, threshold: Int): DataFrame = {
    val cells = bandCells(banded, threshold)
    val lSide = cells.select(col("band"), col("band_hash"), col("id"),
      col("__c").as("gi"),
      explode(sequence(col("__c"), col("__s") - 1)).as("gj"))
    val rSide = cells.select(col("band"), col("band_hash"), col("id"),
      explode(sequence(lit(0L), col("__c"))).as("gi"),
      col("__c").as("gj"))
    lSide.as("l").join(rSide.as("r"),
        col("l.band") === col("r.band") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.gi") === col("r.gi") && col("l.gj") === col("r.gj") &&
        col("l.id") =!= col("r.id"))
      .select(least(col("l.id"), col("r.id")).as("id_a"),
        greatest(col("l.id"), col("r.id")).as("id_b"))
  }

  /** 64-bit SimHash from a MATERIALIZED token-hash array column —
    * per-bit majority vote as 64 aggregate expressions (one
    * projection, no shuffle).  See withMinhashSignature for why the
    * hash array must not be inlined.
    */
  def simhash64FromHashes(hs: Column): Column = {
    val bitCols = (0 until 64).map { b =>
      val votes = aggregate(hs, lit(0L),
        (acc, h) => acc + (shiftright(h, b).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)))
      when(votes > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Adds a simhash column via a materialized token-hash stage. */
  def withSimhash(df: DataFrame, textCol: String, outCol: String): DataFrame =
    df.withColumn(outCol + "__th",
        transform(TextOps.tokens(col(textCol)), t => xxhash64(t)))
      .withColumn(outCol, simhash64FromHashes(col(outCol + "__th")))
      .drop(outCol + "__th")

  /** SimHash of a text column as ONE codegen'd scalar —
    * [[graft.functions.SimhashBits]].  Simhash is per-row, so no
    * explode and NO SHUFFLE: the r12 fused form of
    * [[simhashByExplode]] (bit-parity spec-pinned).  Token-less text
    * → null (the explode form emits no row for such docs — filter
    * `isNotNull` to match it).
    */
  def simhashOfText(
      text: Column, nBits: Int = 64, portable: Boolean = false): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.SimhashBits(
        org.apache.spark.sql.graft.ColumnBridge.expression(text),
        nBits, portable))

  /** (id, simhash) in one shuffle-free projection, row set identical
    * to [[simhashByExplode]] (token-less docs absent).
    */
  private def withSimhashScalar(
      df: DataFrame, textCol: String, idCol: String,
      nBits: Int, portable: Boolean): DataFrame =
    df.select(col(idCol).as("id"),
        simhashOfText(col(textCol), nBits, portable).as("simhash"))
      .where(col("simhash").isNotNull)

  /** SimHash near-dup pairs: block on 16-bit chunks (a pair within
    * hamming distance ≤ 3 of 64 bits collides on ≥ 1 of 4 chunks),
    * verify with bit_count(xor) ≤ maxHamming.
    */
  /** (id, simhash) via explode + hash aggregate — the parity-spec
    * reference for [[simhashOfText]] (higher-order `aggregate` lambdas
    * are interpreted in Spark, so the pre-r12 engine kept the 64
    * per-bit sums inside whole-stage codegen this way; the fused
    * scalar removes the explode AND the per-doc 65-column shuffle).
    */
  def simhashByExplode(df: DataFrame, textCol: String, idCol: String): DataFrame =
    simhashByExplodeImpl(df, textCol, idCol, 64, t => xxhash64(t))

  /** Portable (md5-60bit) explode form — parity reference for
    * `simhashOfText(_, 60, portable = true)`.
    */
  private[graft] def simhashByExplodePortable(
      df: DataFrame, textCol: String, idCol: String): DataFrame =
    simhashByExplodeImpl(df, textCol, idCol, 60, md5Hash60)

  private def simhashByExplodeImpl(
      df: DataFrame, textCol: String, idCol: String,
      nBits: Int, tokHash: Column => Column): DataFrame = {
    // hash after the explode — codegen'd scalar projection, not an
    // interpreted per-element lambda (see minhashPairs)
    val hashed = df
      .select(col(idCol).as("id"),
        explode(TextOps.tokens(col(textCol))).as("t"))
      .select(col("id"), tokHash(col("t")).as("h"))
    val bitSums = (0 until nBits).map { b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)).as(s"b$b")
    }
    hashed.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        (0 until nBits).map(b =>
          when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** @param maxBucket hot-bucket guard (the MinHashLSH convention): a
    *   chunk bucket holding more than this many docs is dropped from
    *   the candidate join — a boilerplate-heavy corpus otherwise
    *   drives the chunk-collision self-join toward O(n²/65536) pairs
    *   (Manku et al.'s remedy is more tables / wider keys; dropping
    *   hot buckets bounds the pair count and the near-dup mass inside
    *   a dropped bucket is exactly what the minhash path catches).
    *   Use [[simhashHotBuckets]] to see what a cap would drop.
    */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 10000,
      portableHash: Boolean = false,
      fusedSignature: Boolean = true): DataFrame = {
    // portable flavor: 60-bit md5-derived token hashes (15 hex chars)
    // in 4 chunks of 15 bits, recomputable by the DuckDB oracle;
    // default: full 64-bit xxhash64 in 4×16-bit chunks.  Both via the
    // r12 fused scalar — the signature stage is now shuffle-free
    // (fusedSignature = false keeps the explode form as A/B reference)
    val nBits = if (portableHash) 60 else 64
    val chunkBits = if (portableHash) 15 else 16
    val withSim =
      if (fusedSignature)
        withSimhashScalar(df, textCol, idCol, nBits, portable = portableHash)
      else if (portableHash) simhashByExplodePortable(df, textCol, idCol)
      else simhashByExplode(df, textCol, idCol)
    val chunkMask = (1L << chunkBits) - 1
    // persisted: the hot-bucket agg + the two self-join sides would
    // each re-read and re-hash the full corpus otherwise
    val chunked = registerPersist(withSim.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("simhash"), i * chunkBits).bitwiseAND(lit(chunkMask))): _*))
        .as(Seq("chunk", "chunk_val"))))
    val hot = chunked.groupBy("chunk", "chunk_val")
      .agg(count(lit(1)).as("pop")).filter(col("pop") > maxBucket)
      .select("chunk", "chunk_val")
    val cold = chunked.join(broadcast(hot), Seq("chunk", "chunk_val"), "left_anti")
    val l = cold.as("l")
    val r = cold.as("r")
    l.join(r,
        col("l.chunk") === col("r.chunk") &&
        col("l.chunk_val") === col("r.chunk_val") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
      // filter BEFORE the pair dedup: hamming is a pure function of
      // the pair (multi-chunk duplicates carry identical values), so
      // the order is semantics-free and the dedup hash table sees only
      // surviving pairs
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** The chunk buckets a `maxBucket` cap would drop, with populations —
    * the observability companion of [[simhashPairs]]'s guard.
    */
  def simhashHotBuckets(
      df: DataFrame, textCol: String, idCol: String, maxBucket: Int): DataFrame =
    withSimhashScalar(df, textCol, idCol, 64, portable = false)
      .select(col("id"),
        posexplode(array((0 until 4).map(i =>
          shiftrightunsigned(col("simhash"), i * 16).bitwiseAND(lit(0xffffL))): _*))
          .as(Seq("chunk", "chunk_val")))
      .groupBy("chunk", "chunk_val")
      .agg(count(lit(1)).as("pop")).filter(col("pop") > maxBucket)

  /** Exact token-set Jaccard over blocked candidate pairs (the cheap
    * length-blocked flavor used as a verification / standalone dedup).
    *
    * Candidate generation inside each block uses PREFIX FILTERING by
    * default (the AllPairs/PPJoin principle — Chaudhuri et al.
    * ICDE'06, Bayardo et al. WWW'07): under any fixed total token
    * order, two sets with Jaccard ≥ t must share a token among the
    * first |x| − ⌈t·|x|⌉ + 1 tokens of EACH side, so an equi-join on
    * (block, prefix-token) generates a candidate superset whose size
    * tracks the TRUE near-dup mass instead of the block population.
    * The block nested-loop alternative is quadratic in block size —
    * measured at sf10: 164.7M block-join candidates for 777k true
    * pairs (0.47% selectivity), 276 s → the prefix path verifies only
    * pairs that share a rare-prefix token.  Both paths end in the same
    * exact-Jaccard filter, so the output is bit-identical (OpsSpec
    * pins it); the final verify joins re-fetch token arrays by id from
    * the persisted base table rather than carrying arrays through the
    * explode (which would shuffle Σ prefix·|toks| — quadratic in
    * document length).
    *
    * The prefix's token order is FREQUENCY-DEMOTED (Bayardo §3.1): a
    * wordcount pass finds the `demoteHotTokens` globally most frequent
    * tokens and sorts them AFTER everything else, so prefixes are made
    * of rare tokens and a stopword shared by every doc in a block
    * cannot become a C(block²) candidate key.  Any total order is
    * lossless, so this is selectivity only — the parity spec runs with
    * the default on.
    *
    * @param maxBlock hot-block guard: common blocking-key values (e.g.
    *   popular document lengths) otherwise form O(block²) self-joins;
    *   blocks above this population are excluded from the join
    *   entirely.  Dropped near-dup mass is what the minhash path is
    *   for — this flavor trades recall for an exact, oracle-checkable
    *   candidate rule.
    * @param prefixFilter false forces the plain block nested-loop
    *   (small inputs / spec parity pins); the default prefix path is
    *   the one that scales.
    * @param demoteHotTokens size of the demoted hot-token set (0 skips
    *   the wordcount pass and orders purely by hash — fine for corpora
    *   already known stopword-free, e.g. post-normalization shingles).
    */
  def tokenJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      blockCol: String,
      threshold: Double = 0.9,
      maxBlock: Int = 10000,
      prefixFilter: Boolean = true,
      demoteHotTokens: Int = 1024): DataFrame = {
    val t = df.select(col(idCol).as("id"), col(blockCol).as("blk"),
      array_distinct(TextOps.tokens(col(textCol))).as("toks"))
    val hot = t.groupBy("blk").agg(count(lit(1)).as("pop"))
      .filter(col("pop") > maxBlock).select("blk")
    val cold = t.join(broadcast(hot), Seq("blk"), "left_anti")
    // the prefix theorem needs t > 0 (at t = 0 disjoint pairs qualify)
    if (!prefixFilter || threshold <= 0.0) {
      val l = cold.as("l")
      val r = cold.as("r")
      l.join(r, col("l.blk") === col("r.blk") && col("l.id") < col("r.id"))
        // token-less pairs have union 0 → skip (ANSI divide-by-zero);
        // union size from the DISTINCT arrays' size identity
        .filter(size(col("l.toks")) + size(col("r.toks")) > 0)
        .withColumn("__i", size(array_intersect(col("l.toks"), col("r.toks"))))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
          (col("__i").cast("double") /
            (size(col("l.toks")) + size(col("r.toks")) - col("__i")))
            .as("jaccard"))
        .filter(col("jaccard") >= threshold)
    } else {
      // persisted: referenced by the prefix explode AND both verify
      // joins — without the cache each reference re-tokenizes the
      // corpus (released via unpersistAll, like minhashPairs' tables)
      val base = registerPersist(cold.withColumn("sz", size(col("toks"))))
      val pfx = jaccardPrefixes(base, threshold, demoteHotTokens)
      // J ≥ t also bounds the size ratio (t·max ≤ min) — slack in the
      // keep-more direction for the same float-safety reason
      val cand = pfx.as("l").join(pfx.as("r"),
          col("l.blk") === col("r.blk") && col("l.ptok") === col("r.ptok") &&
            col("l.id") < col("r.id") &&
            lit(threshold) * col("l.sz") <= col("r.sz") + lit(1e-9) &&
            lit(threshold) * col("r.sz") <= col("l.sz") + lit(1e-9))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
        .distinct()
      val sides = base.select(col("id"), col("toks"))
      cand
        .join(sides.select(col("id").as("id_a"), col("toks").as("__ta")), Seq("id_a"))
        .join(sides.select(col("id").as("id_b"), col("toks").as("__tb")), Seq("id_b"))
        .filter(size(col("__ta")) + size(col("__tb")) > 0)
        .withColumn("__i", size(array_intersect(col("__ta"), col("__tb"))))
        .select(col("id_a"), col("id_b"),
          (col("__i").cast("double") /
            (size(col("__ta")) + size(col("__tb")) - col("__i")))
            .as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
  }

  /** The (id, blk, sz, ptok) prefix rows of the filtered-Jaccard
    * candidate join — package-visible so the spec can pin the
    * demotion contract (a doc with enough rare tokens never carries a
    * hot token in its prefix).  Expects `base` with (id, blk, toks,
    * sz) columns.
    *
    * Token order = (hot?, xxhash64, token): deterministic and total;
    * hot tokens (top `demoteHotTokens` by corpus frequency over the
    * distinct-per-doc token sets) sort last.  ⌈t·sz⌉ computes with a
    * 1e-9 slack so float error can only LENGTHEN the prefix (more
    * candidates, never a missed pair).
    */
  private[graft] def jaccardPrefixes(
      base: DataFrame, threshold: Double, demoteHotTokens: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val hotArr: Array[org.apache.spark.unsafe.types.UTF8String] =
      if (demoteHotTokens <= 0) Array.empty
      else base.select(explode(col("toks")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("t"))
        .limit(demoteHotTokens)
        .collect()
        .map(r => org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)))
    val hotKey: Column => Column =
      if (hotArr.isEmpty) _ => lit(0)
      else tk => ColumnBridge.column(graft.functions.TokenSetContains(
        ColumnBridge.expression(tk), hotArr))
    val minOverlap = ceil(lit(threshold) * col("sz") - lit(1e-9))
    base.select(col("id"), col("blk"), col("sz"),
      explode(slice(
        transform(
          array_sort(transform(col("toks"),
            tk => struct(hotKey(tk).as("d"), xxhash64(tk).as("h"), tk.as("t")))),
          s => s.getField("t")),
        lit(1),
        greatest(col("sz") - minOverlap.cast("int") + lit(1), lit(0))))
        .as("ptok"))
  }
}
