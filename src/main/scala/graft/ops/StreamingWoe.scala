package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.core.WoeConfig
import graft.spark.{WoeBinning, WoeBinningModel}
import scala.collection.parallel.CollectionConverters._

/** Incremental WoE binning over a stream — a capability the
  * single-shot reference cannot express (SURVEY.md §2.10: no streaming
  * surface) but which falls out of this engine's architecture: the
  * distributed part of the fit is just (count, Σtarget) per
  * (variable, value), which is an incrementally-maintainable
  * aggregation.  Each micro-batch updates the running stats
  * (complete-mode groupBy); the driver-side MOB kernels re-fit from
  * the updated stats on every trigger and hand the refreshed model to
  * the caller.
  *
  * The melt/aggregation and rows→stats conversion are the SAME code as
  * the batch fit (WoeBinning.statsAggregation / statsFromRows /
  * fitOne), so streaming == batch equality holds by construction.
  *
  * Scale note: state is O(distinct (variable, value)) and each trigger
  * collects it, like the batch path.  For unbounded-cardinality
  * features, pass `preBucketEdges` — per-column FIXED bucket edges
  * applied to the stream before the aggregation (the same
  * lower-edge-snap as the batch `maxDistinct` path, WoeBinning
  * .snapToEdges), bounding complete-mode state at |edges| distinct
  * values per column.  The edges must be caller-fixed because the
  * batch knob's quantile pass is a full-data scan a stream cannot do.
  */
object StreamingWoe {

  /** Start an incremental fit on a STREAMING frame carrying the target
    * and feature columns.  `onModel` fires after each micro-batch with
    * the model fitted to all data seen so far.
    *
    * @param checkpointLocation pass for a restart-recoverable fit
    *                           (complete-mode state replays from it)
    * @param trigger            micro-batch cadence (default: as fast
    *                           as data arrives)
    * @param preBucketEdges     per-column fixed bucket edges capping
    *                           streaming state at |edges| distinct
    *                           values per column (unbounded otherwise)
    */
  def fitStream(
      stream: DataFrame,
      targetCol: String,
      inputCols: Seq[String],
      cfg: WoeConfig,
      sepValue: Option[Double] = None,
      checkpointLocation: Option[String] = None,
      trigger: Option[Trigger] = None,
      preBucketEdges: Map[String, Seq[Double]] = Map.empty)(
      onModel: (Long, WoeBinningModel) => Unit): StreamingQuery = {
    preBucketEdges.keys.foreach(c => require(inputCols.contains(c),
      s"fitStream: preBucketEdges column '$c' is not an input column"))
    val bucketed = preBucketEdges.foldLeft(stream) {
      case (acc, (c, es)) => WoeBinning.snapToEdges(acc, c, es)
    }
    val stats = WoeBinning.statsAggregation(bucketed, targetCol, inputCols)
    var writer = stats.writeStream.outputMode("complete")
    checkpointLocation.foreach(p => writer = writer.option("checkpointLocation", p))
    trigger.foreach(t => writer = writer.trigger(t))
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val byVar = WoeBinning.statsFromRows(batch.collect())
        if (byVar.nonEmpty) { // no data yet → no model to emit
          val fitted = inputCols.par
            .map(c => c -> WoeBinning.fitOne(c, targetCol, byVar, cfg, sepValue))
            .seq.toVector
          onModel(batchId, new WoeBinningModel(fitted))
        }
      }
      .start()
  }
}
