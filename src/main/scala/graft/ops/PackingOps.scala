package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shard-packing planner: assign documents to fixed-token-budget
  * training shards in a deterministic global order (the planning step
  * of sequence packing — each doc's shard is where its running token
  * total starts).
  *
  * The global running sum is the textbook two-pass distributed scan,
  * NOT a single global window (which would funnel the corpus through
  * one reducer): range-partition by the order key, per-partition
  * partial sums (one tiny row per partition) prefix-summed on the
  * driver, broadcast back as offsets, and the intra-partition cumsum
  * runs in a window PARTITIONED by the partition id — fully parallel.
  *
  * The ranged frame is PINNED (registered persist) before the two
  * passes: range boundaries come from sampling seeded by the RDD id,
  * so two independent executions of the same plan may split
  * partitions differently — the offset pass and the final pass MUST
  * read one pinned partitioning.  A persist (not a checkpoint) is the
  * right pin: both passes read the one cached RDD DAG, and a lost
  * block RECOMPUTES through the intact lineage with the same RDD id —
  * hence the same boundaries — where a truncated localCheckpoint
  * lineage could not recompute at all.  The cache is released via
  * `DedupOps.unpersistAll()` once the derived plan is materialized.
  */
object PackingOps {

  /** `(id, tok, before)` — each doc's exclusive global running-token
    * offset in ascending-id order, via the two-pass scan above.
    * (`private[ops]`: SampleOps' weighted systematic sampler rides the
    * same scan.)
    */
  private[ops] def withGlobalOffset(
      df: DataFrame, idCol: String, tokenCol: String,
      numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = DedupOps.registerPersist(df
      .select(col(idCol).as("id"), col(tokenCol).cast("long").as("tok"))
      .repartitionByRange(parts, col("id"))
      .sortWithinPartitions("id")
      .withColumn("pid", spark_partition_id()))
    // pass 1: one row per partition → driver prefix sum (O(partitions))
    val partials = ranged.groupBy("pid").agg(sum("tok").as("psum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = partials.map(_._1)
      .zip(partials.map(_._2).scanLeft(0L)(_ + _).init)
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("pid", "offset")
    // pass 2: parallel per-partition cumsum + broadcast offset join
    val w = Window.partitionBy("pid").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(offDf), "pid")
      .withColumn("before", coalesce(sum("tok").over(w), lit(0L)) + col("offset"))
      .select(col("id"), col("tok"), col("before"))
  }

  def packByTokenBudget(
      df: DataFrame, idCol: String, tokenCol: String, budget: Long,
      numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"bad budget $budget")
    withGlobalOffset(df, idCol, tokenCol, numPartitions)
      .select(col("id").as(idCol), col("tok").as("n_tokens"),
        expr(s"before DIV ${budget}L").as("shard_id"))
  }

  /** GPT-style SEQUENCE packing: concatenate every document's tokens
    * in ascending-id order and cut the stream into fixed `seqLen`
    * training sequences that CROSS document boundaries — the
    * pretraining batch layout (vs [[packByTokenBudget]], which
    * assigns whole docs to shards).  One output row per
    * (document, sequence) it occupies:
    * `(id, seq_id, start_in_seq, n_taken, doc_offset)` — enough for a
    * loader to materialize any sequence by fetching exactly the docs
    * that intersect it.
    *
    * Same two-pass prefix scan as the shard packer (never a global
    * single-reducer window); the per-doc sequence fan-out is
    * `⌈tok/seqLen⌉ + 1` rows of five integers.  Empty documents span
    * no sequence and are dropped.  All-integer arithmetic → exact
    * cross-engine replay.
    */
  def packSequences(
      df: DataFrame, idCol: String, tokenCol: String, seqLen: Long,
      numPartitions: Int = 0): DataFrame = {
    require(seqLen > 0, s"bad seqLen $seqLen")
    withGlobalOffset(df, idCol, tokenCol, numPartitions)
      .where(col("tok") > 0)
      .select(col("id"), col("tok"), col("before"),
        explode(sequence(
          expr(s"before DIV ${seqLen}L"),
          expr(s"(before + tok - 1) DIV ${seqLen}L"))).as("seq_id"))
      .select(
        col("id").as(idCol),
        col("seq_id"),
        (greatest(col("before"), col("seq_id") * seqLen)
          - col("seq_id") * seqLen).as("start_in_seq"),
        (least(col("before") + col("tok"), (col("seq_id") + 1) * seqLen)
          - greatest(col("before"), col("seq_id") * seqLen)).as("n_taken"),
        col("before").as("doc_offset"))
  }

  /** Shard/sequence MANIFEST over [[packSequences]] output (or any
    * frame with `idCol, seq_id, start_in_seq, n_taken`): one row per
    * sequence with its document count, realized token count, id range,
    * and a content signature — the md5 of the `id:start:len` triples
    * in ascending-id order.  The signature is what a loader (or a
    * later verification pass) compares against the shards it actually
    * materialized, making "did every byte land" checkable without
    * re-reading the corpus.
    *
    * A document intersects a sequence at most once, so ascending `id`
    * is a total order within the group and the `sort_array(
    * collect_list(struct(...)))` canonicalization is deterministic
    * regardless of partition layout.  Per-sequence groups are
    * `⌈seqLen/min_doc_tokens⌉`-bounded — collect_list here is safe at
    * any corpus size (group width is set by seqLen, not data volume).
    */
  /** Deterministic per-epoch training order: every epoch is a
    * different, reproducible global permutation of the corpus —
    * `position = rank of md5(id ":" epoch)` — so a training run can
    * be resumed, sharded, or re-audited without ever materializing a
    * random state.  The hash key makes the permutation (a) stable
    * across cluster sizes and retries, (b) uncorrelated between
    * epochs, and (c) joinable back to the corpus by id.
    *
    * Positions are assigned with the same two-pass prefix scan as the
    * packer (range-partition by the hash key, per-partition counts
    * prefix-summed on the driver — never a single global window), and
    * `shard = position % nShards` hands each data-parallel worker an
    * interleaved, size-balanced (±1) slice of the epoch order.  `id`
    * breaks the (astronomically unlikely) hash-collision tie so the
    * order is total.
    */
  def epochShuffle(
      df: DataFrame, idCol: String, epoch: Int, nShards: Int,
      numPartitions: Int = 0): DataFrame = {
    require(nShards > 0, s"bad nShards $nShards")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = DedupOps.registerPersist(df
      .select(col(idCol).as("id"),
        md5(concat(col(idCol).cast("string"), lit(s":$epoch"))).as("k"))
      .repartitionByRange(parts, col("k"), col("id"))
      .sortWithinPartitions("k", "id")
      .withColumn("pid", spark_partition_id()))
    val partials = ranged.groupBy("pid").agg(count(lit(1)).as("pn"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = partials.map(_._1)
      .zip(partials.map(_._2).scanLeft(0L)(_ + _).init)
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("pid", "offset")
    val w = Window.partitionBy("pid").orderBy("k", "id")
    ranged.join(broadcast(offDf), "pid")
      .withColumn("position",
        col("offset") + row_number().over(w).cast("long") - 1L)
      .select(col("id").as(idCol), col("position"),
        (col("position") % nShards).as("shard"))
  }

  def shardManifest(packed: DataFrame, idCol: String): DataFrame =
    packed.groupBy("seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_taken").as("n_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"),
        md5(concat_ws(",",
          transform(
            sort_array(collect_list(struct(
              col(idCol).as("id"), col("start_in_seq").as("s"),
              col("n_taken").as("n")))),
            e => concat_ws(":",
              e.getField("id").cast("string"),
              e.getField("s").cast("string"),
              e.getField("n").cast("string"))))).as("sig"))
}
