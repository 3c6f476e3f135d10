package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.core.{Kernels, WoeConfig}
import graft.spark.WoeBinningModel
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
  */
object StreamingWoe {

  /** Start an incremental fit on a STREAMING frame carrying the target
    * and feature columns.  `onModel` fires after each micro-batch with
    * the model fitted to all data seen so far.
    */
  def fitStream(
      stream: DataFrame,
      targetCol: String,
      inputCols: Seq[String],
      cfg: WoeConfig)(onModel: (Long, WoeBinningModel) => Unit): StreamingQuery = {
    val stackExpr = s"stack(${inputCols.length}, " +
      inputCols.map(c => s"'$c', cast(`$c` as double)").mkString(", ") +
      ") as (variable, value)"
    val stats = stream
      .selectExpr(stackExpr, s"cast(`$targetCol` as bigint) as t")
      .withColumn("value",
        when(isnan(col("value")), lit(null)).otherwise(col("value")))
      .groupBy("variable", "value")
      .agg(count(lit(1)).as("cnt"), sum("t").as("tsum"))
    stats.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val model = fitFromStatsRows(batch.collect(), inputCols, cfg)
        onModel(batchId, model)
      }
      .start()
  }

  /** Kernel re-fit from collected running stats (same shape as the
    * batch path in WoeBinning.sufficientStats).
    */
  private def fitFromStatsRows(
      rows: Array[org.apache.spark.sql.Row],
      inputCols: Seq[String],
      cfg: WoeConfig): WoeBinningModel = {
    val byVar = rows.groupBy(_.getString(0))
    val fitted = inputCols.par.map { c =>
      val vr = byVar.getOrElse(c, Array.empty)
      val (nanRows, valRows) = vr.partition(_.isNullAt(1))
      val groups = valRows
        .map(r => (r.getDouble(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toVector
      val nanCount = nanRows.map(_.getLong(2)).sum
      val nanTsum = nanRows.map(_.getLong(3)).sum
      val s = Kernels.VarStats(c, groups, nanCount, nanTsum,
        nanCount + groups.iterator.map(_._2).sum,
        nanTsum + groups.iterator.map(_._3).sum)
      c -> Kernels.fitVariable(s, cfg)
    }.seq.toVector
    new WoeBinningModel(fitted)
  }
}
