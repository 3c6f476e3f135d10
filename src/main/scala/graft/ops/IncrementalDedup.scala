package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental dedup: fingerprint STORES persisted once, then each
  * ingest batch checked against them — the operation a continuously-fed
  * corpus needs, because re-running whole-corpus dedup per batch scales
  * O(corpus) per ingest while the store probe scales O(batch + store
  * scan) with NO store shuffle.
  *
  * Two stores, matching the two whole-corpus flavors:
  *
  *  - EXACT: one `(content_hash, keep_id)` row per distinct content —
  *    the md5-keyed dedup state of [[DedupOps.exactDupGroups]] made
  *    durable.  A batch probe is one join keyed on the hash.
  *  - MINHASH: per-doc signature rows exploded to `(band, band_hash,
  *    id, sig)` — the LSH banding state of [[DedupOps.minhashPairs]]
  *    made durable.  A batch probe joins the batch's banded signatures
  *    against the store and verifies candidates by SIGNATURE AGREEMENT
  *    (the fraction of equal minhash components — the standard unbiased
  *    Jaccard estimate), so the store never needs the original text.
  *
  * Scale shape of the probes: the batch side is small by the ingest
  * contract, so it is explicitly `broadcast()` — the store scans
  * once, shuffles never.  Store merges (absorbing a batch) are a
  * union + re-aggregate written to a NEW path: object stores don't
  * re-write in place, and the previous store stays readable until the
  * swap (the usual snapshot-roll pattern).
  */
object IncrementalDedup {

  private val P: Long = 2147483647L // 2^31-1, matches DedupOps base hashes

  // ---------------------------------------------------------------- exact

  /** Build the exact-dup store: `(content_hash, keep_id)`, keep_id =
    * the minimum id ever seen for that content.
    */
  def writeExactStore(
      df: DataFrame, textCol: String, idCol: String, path: String): Unit =
    df.select(md5(col(textCol)).as("content_hash"), col(idCol).as("keep_id"))
      .groupBy("content_hash").agg(min("keep_id").as("keep_id"))
      .write.mode("overwrite").parquet(path)

  /** Batch rows whose content ALREADY exists in the store:
    * `(id, dup_of)` — dup_of is the store's canonical keeper.  The
    * batch is broadcast; the store never shuffles.
    */
  def exactDupsAgainstStore(
      spark: SparkSession, storePath: String,
      batch: DataFrame, textCol: String, idCol: String): DataFrame =
    spark.read.parquet(storePath)
      .join(broadcast(
        batch.select(md5(col(textCol)).as("content_hash"), col(idCol).as("id"))),
        "content_hash")
      .select(col("id"), col("keep_id").as("dup_of"))

  /** Absorb a batch into the exact store at a NEW path (snapshot
    * roll): the min-id merge is associative, so ingest order never
    * changes the keeper.
    */
  def mergeExactStore(
      spark: SparkSession, storePath: String,
      batch: DataFrame, textCol: String, idCol: String,
      outPath: String): Unit =
    spark.read.parquet(storePath)
      // native id type, matching writeExactStore — a cast("long") here
      // nulled string ids and made numeric-string mins lexicographic
      .union(batch.select(md5(col(textCol)).as("content_hash"),
        col(idCol).as("keep_id")))
      .groupBy("content_hash").agg(min("keep_id").as("keep_id"))
      .write.mode("overwrite").parquet(outPath)

  /** ERASURE propagation (the GDPR/right-to-be-forgotten op) through
    * the exact store: remove every erased id's influence WITHOUT a
    * whole-store rebuild.  A keeper-only store cannot just filter —
    * when a group's canonical keeper is erased, the new keeper is the
    * min of the SURVIVING members, which only the corpus knows.  So:
    *
    *  - groups whose keeper survives pass through untouched (erasing
    *    a non-keeper member changes nothing the store records);
    *  - groups whose keeper was erased are rebuilt from the
    *    post-erasure corpus, but ONLY those groups — a semi-join on
    *    the affected hashes keeps the rebuild O(affected), not
    *    O(corpus state);
    *  - a group with no survivors disappears (its hash no longer
    *    joins anything).
    *
    * Written to a NEW path (the snapshot-roll discipline).  The
    * incremental patch must equal a from-scratch rebuild of the
    * filtered corpus — that equality IS q_erasure's oracle gate.
    */
  def eraseExactStore(
      spark: SparkSession, storePath: String,
      corpusAfter: DataFrame, textCol: String, idCol: String,
      erasedIds: DataFrame, outPath: String): Unit = {
    val store = spark.read.parquet(storePath)
    val erased = broadcast(erasedIds.select(col(erasedIds.columns.head).as("__eid")))
    val untouched = store.join(erased,
      store("keep_id") === col("__eid"), "left_anti")
    val affectedHashes = store.join(erased,
      store("keep_id") === col("__eid"), "left_semi")
      .select("content_hash")
    val rebuilt = corpusAfter
      .select(md5(col(textCol)).as("content_hash"), col(idCol).as("keep_id"))
      .join(broadcast(affectedHashes), "content_hash")
      .groupBy("content_hash").agg(min("keep_id").as("keep_id"))
    untouched.unionByName(rebuilt)
      .write.mode("overwrite").parquet(outPath)
  }

  /** Erasure through the minhash signature store: signatures are
    * per-id state, so the patch is one broadcast anti-join — no
    * rebuild, no corpus access (the store never held text).
    */
  def eraseMinhashStore(
      spark: SparkSession, storePath: String,
      erasedIds: DataFrame, outPath: String): Unit = {
    val store = spark.read.parquet(storePath)
    val erased = broadcast(erasedIds.select(col(erasedIds.columns.head).as("__eid")))
    store.join(erased, store("id") === col("__eid"), "left_anti")
      .write.mode("overwrite").partitionBy("band").parquet(outPath)
  }

  // -------------------------------------------------------------- minhash

  /** The minhash signature of every doc, banded for LSH — shared by
    * the store writer and the batch probe so both sides band
    * identically.  Mirrors [[DedupOps.minhashPairs]]'s two hash
    * flavors: md5-portable (oracle-replayable) and xxhash64 (scale).
    */
  private def bandedSignatures(
      df: DataFrame, textCol: String, idCol: String,
      numHashes: Int, bands: Int, shingleSize: Int,
      portableHash: Boolean): DataFrame = {
    val rows = numHashes / bands
    val bandKey: Column => Column =
      if (portableHash)
        b => concat_ws(",",
          transform(slice(col("sig"), b * lit(rows) + lit(1), lit(rows)),
            _.cast("string")))
      else b => xxhash64(slice(col("sig"), b * lit(rows) + lit(1), lit(rows)))
        .cast("string")
    // r12: the fused one-loop signature (MinhashFromGrams), identical
    // to the old explode + 33-column aggregation by the minhashPairs
    // parity pin — the batch and incremental stores stay bit-equal
    df.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("__t"))
      .select(col("id"),
        DedupOps.minhashFromGrams(
          DedupOps.shinglesOf(col("__t"), shingleSize),
          numHashes, portableHash).as("sig"))
      .where(col("sig").isNotNull)
      .select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), bandKey))
          .as(Seq("band", "band_hash")))
  }

  /** Build the minhash LSH store: `(band, band_hash, id, sig)`,
    * partitioned by band so a probe of a single band (diagnostics)
    * prunes at planning time.  One pass over the corpus — the same
    * cost the first whole-corpus dedup already paid.
    */
  def writeMinhashStore(
      df: DataFrame, textCol: String, idCol: String, path: String,
      numHashes: Int = 32, bands: Int = 8, shingleSize: Int = 3,
      portableHash: Boolean = false): Unit =
    bandedSignatures(df, textCol, idCol, numHashes, bands, shingleSize,
      portableHash)
      .write.mode("overwrite").partitionBy("band").parquet(path)

  /** Near-dup matches of a new batch against the store: LSH band
    * collision → signature-agreement estimate ≥ `simThreshold`.
    * Output `(id, dup_of, est_jaccard)` — one row per (batch doc,
    * matching store doc).  Batch ids may overlap store ids (re-ingest);
    * self-matches are excluded by id inequality.
    *
    * The agreement fraction `|{i : sigA[i] = sigB[i]}| / numHashes` is
    * the textbook unbiased MinHash Jaccard estimate — the store never
    * needs original text, so it stays ~300 B/doc at any corpus size.
    */
  def minhashDupsAgainstStore(
      spark: SparkSession, storePath: String,
      batch: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 32, bands: Int = 8, shingleSize: Int = 3,
      simThreshold: Double = 0.5, portableHash: Boolean = false): DataFrame =
    minhashDupsAgainstStoreDf(spark.read.parquet(storePath),
      batch, textCol, idCol, numHashes, bands, shingleSize,
      simThreshold, portableHash)

  /** As [[minhashDupsAgainstStore]] over an already-read (possibly
    * filtered) store frame — the streaming ingest path probes the
    * store restricted to EARLIER batches so a replayed micro-batch
    * cannot match its own previously-landed signatures.
    */
  def minhashDupsAgainstStoreDf(
      store: DataFrame,
      batch: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 32, bands: Int = 8, shingleSize: Int = 3,
      simThreshold: Double = 0.5, portableHash: Boolean = false): DataFrame = {
    val probe = bandedSignatures(batch, textCol, idCol,
      numHashes, bands, shingleSize, portableHash)
    val agree = (0 until numHashes).map(i =>
      when(element_at(col("bsig"), i + 1) === element_at(col("ssig"), i + 1), 1)
        .otherwise(0))
      .reduce(_ + _)
    store.select(col("band"), col("band_hash"),
        col("id").as("dup_of"), col("sig").as("ssig"))
      .join(broadcast(probe.select(col("band"), col("band_hash"),
        col("id"), col("sig").as("bsig"))),
        Seq("band", "band_hash"))
      .where(col("id") =!= col("dup_of"))
      .select(col("id"), col("dup_of"), col("bsig"), col("ssig"))
      .dropDuplicates("id", "dup_of")
      .select(col("id"), col("dup_of"),
        (agree.cast("double") / lit(numHashes)).as("est_jaccard"))
      .where(col("est_jaccard") >= simThreshold)
  }

  /** STREAMING near-dup ingest gate: every arriving micro-batch is
    * (1) probed against the signatures of all EARLIER batches — the
    * matches land in `dupsOut/batch=<id>` — and (2) its own banded
    * signatures land in `storePath/batch=<id>`, so the store grows
    * with the stream and never needs the original text.  Both writes
    * OVERWRITE their own `batch=<id>` subdirectory and the probe
    * filters the store to `batch < id`, so a micro-batch replayed
    * after a crash (foreachBatch's at-least-once contract) reproduces
    * byte-identical outputs instead of appending duplicates or
    * matching its own half-landed signatures — exactly-once results
    * from at-least-once execution, the [[graft.ops.SimilarityOps
    * .streamIntoIvfIndex]] discipline.  Readers see `batch` as one
    * more partition column; intra-batch duplicates are the batch
    * operator's job ([[graft.ops.DedupOps.minhashPairs]] on the
    * micro-batch if needed).
    */
  def streamIntoMinhashStore(
      stream: DataFrame, textCol: String, idCol: String,
      storePath: String, dupsOut: String, checkpointDir: String,
      numHashes: Int = 32, bands: Int = 8, shingleSize: Int = 3,
      simThreshold: Double = 0.5, portableHash: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val root = new org.apache.hadoop.fs.Path(storePath)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // committed DATA must exist, not just the directory: a crash
        // mid-write leaves storePath with only _temporary scaffolding,
        // and spark.read.parquet on that throws schema-inference
        // errors on EVERY replay — the store would be wedged until a
        // manual cleanup instead of healing via the batch overwrite
        def hasCommittedFiles: Boolean = fs.exists(root) && {
          val it = fs.listFiles(root, true)
          var found = false
          while (!found && it.hasNext) {
            val s = it.next()
            found = s.isFile && s.getPath.getName.endsWith(".parquet") &&
              !s.getPath.toString.contains("/_temporary/")
          }
          found
        }
        val dups =
          if (hasCommittedFiles)
            minhashDupsAgainstStoreDf(
              spark.read.parquet(storePath).where(col("batch") < batchId),
              batch, textCol, idCol, numHashes, bands, shingleSize,
              simThreshold, portableHash)
          else // empty frame with the id column's NATIVE type, so the
            // batch=0 dups dir schema-merges with every later one
            batch.select(col(idCol).as("id"), col(idCol).as("dup_of"),
              lit(0.0).as("est_jaccard")).where(lit(false))
        dups.write.mode("overwrite").parquet(s"$dupsOut/batch=$batchId")
        bandedSignatures(batch, textCol, idCol,
            numHashes, bands, shingleSize, portableHash)
          .write.mode("overwrite").partitionBy("band")
          .parquet(s"$storePath/batch=$batchId")
      }
      .start()
}
