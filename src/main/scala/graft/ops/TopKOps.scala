package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.LongType

import graft.plans.TopKPerKey

/** API surface of the [[graft.plans.TopKPerKey]] whole-operator: the
  * sort-free per-key top-k.  See the plan node's scaladoc for the
  * execution story (bounded heaps, partial-before-exchange).
  *
  * The strategy arrives with `GraftExtensions` (every engine entry
  * point carries the config); for a bare user session the API
  * self-arms through `spark.experimental.extraStrategies` — the
  * sanctioned session-local hook — so the operator works either way.
  */
object TopKOps {

  private def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit = {
    val present =
      spark.sessionState.planner.strategies.exists(_ eq graft.plans.TopKStrategy) ||
        spark.experimental.extraStrategies.exists(_ eq graft.plans.TopKStrategy)
    if (!present)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKStrategy
  }

  /** Top `k` rows per `keys` group under the LEXICOGRAPHIC
    * (col, ascending) order sequence.  Ordering columns must be
    * non-nullable LONGs (a total order over exact integers is what
    * makes the kept set partitioning-independent); pass an id column
    * last to break value ties deterministically.
    */
  def topKPerKey(
      df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    ensureStrategy(df.sparkSession)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String) = analyzed.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"topKPerKey: no column '$n' in ${analyzed.output.map(_.name)}"))
    order.foreach { case (n, _) =>
      require(attr(n).dataType == LongType,
        s"topKPerKey: order column '$n' must be LONG, " +
          s"got ${attr(n).dataType.catalogString}")
    }
    ColumnBridge.ofRows(df.sparkSession,
      TopKPerKey(keys.map(n => attr(n): org.apache.spark.sql.catalyst.expressions.Expression),
        order.map { case (n, _) => attr(n): org.apache.spark.sql.catalyst.expressions.Expression },
        order.map(_._2), k, analyzed))
  }
}
