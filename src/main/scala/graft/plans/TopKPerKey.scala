package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator tier of the extension preference order: per-key
  * top-k as a custom LogicalPlan + Strategy + SparkPlan, injected via
  * `SparkSessionExtensions` (`GraftExtensions`).
  *
  * The DataFrame spelling of "top k rows per key" is
  * `row_number().over(partitionBy(key).orderBy(v)) <= k` — which
  * FULLY SORTS every key group before the rank filter throws
  * `group − k` rows away.  For the 100 TB shapes this operator serves
  * (top-5 documents per domain, top-k candidates per query), groups
  * are millions of rows and k is tiny: the sort is almost pure waste.
  * No composition of built-ins expresses "bounded heap per key", and
  * a Window-pattern optimizer rewrite cannot remove the sort the
  * Window operator itself demands — hence the whole-operator tier.
  *
  * Execution is the grouped analog of `TakeOrderedAndProject`:
  *
  *  - a PARTIAL exec on the map side keeps a k-bounded binary heap
  *    per key per partition (memory O(keys·k), rows never sorted),
  *    pruning each partition to ≤ k rows per key BEFORE the exchange
  *    — correct because the global top-k is a subset of the union of
  *    per-partition top-k;
  *  - `requiredChildDistribution` on the FINAL exec makes
  *    EnsureRequirements insert the hash exchange on the keys, so
  *    the shuffle moves at most `partitions · keys · k` rows instead
  *    of the corpus;
  *  - the final exec re-heaps per key (all rows of a key are now
  *    co-located) and emits the exact result.
  *
  * Determinism: ordering is the LEXICOGRAPHIC (value, tiebreak…)
  * sequence over long-typed expressions — a TOTAL order, so the kept
  * set never depends on partitioning (spec-pinned against the window
  * spelling; q_topk_per_key hash-gates it against a DuckDB
  * row_number replay).  Ordering columns must be non-null longs —
  * the API layer validates.
  *
  * `keys` and `orderExprs` are ordinary expression children (NOT
  * tuple-wrapped), so every analyzer/optimizer rule that remaps
  * attributes rewires them with the tree — a tuple-held Attribute is
  * invisible to `transformExpressions` and dangles after any
  * attribute-rewriting rule (the bug the first cut of this operator
  * shipped with; the Verify write path surfaced it).
  */
case class TopKPerKey(
    keys: Seq[Expression], orderExprs: Seq[Expression],
    orderAsc: Seq[Boolean], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(keys.nonEmpty && orderExprs.nonEmpty &&
    orderExprs.length == orderAsc.length && k >= 1,
    s"TopKPerKey: keys=$keys order=$orderExprs/$orderAsc k=$k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerKey = copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial-then-final [[TopKPerKeyExec]]. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, orderExprs, orderAsc, k, child) =>
      TopKPerKeyExec(keys, orderExprs, orderAsc, k, partial = false,
        TopKPerKeyExec(keys, orderExprs, orderAsc, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression], orderExprs: Seq[Expression],
    orderAsc: Seq[Boolean], k: Int,
    partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def nodeName: String =
    if (partial) "GraftTopKPerKeyPartial" else "GraftTopKPerKeyFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerKeyExec = copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val ordExprs = orderExprs
    val asc: Array[Boolean] = orderAsc.toArray
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordProj = UnsafeProjection.create(ordExprs, childOutput)
      val nOrd = ordExprs.length
      // heap entries cache the evaluated order vector: comparisons
      // never re-evaluate expressions against stored rows
      final class Entry(val ord: Array[Long], val row: InternalRow)
      def cmpRank(x: Entry, y: Entry): Int = {
        var i = 0
        while (i < nOrd) {
          val c = java.lang.Long.compare(x.ord(i), y.ord(i))
          if (c != 0) return if (asc(i)) c else -c
          i += 1
        }
        0
      }
      val weakestFirst = new java.util.Comparator[Entry] {
        def compare(a: Entry, b: Entry): Int = cmpRank(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[Entry]]
      while (iter.hasNext) {
        val row = iter.next()
        val projected = ordProj(row)
        val ord = new Array[Long](nOrd)
        var i = 0
        while (i < nOrd) { ord(i) = projected.getLong(i); i += 1 }
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[Entry](kk, weakestFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(new Entry(ord, row.copy()))
        else {
          val weakest = heap.peek()
          val probe = new Entry(ord, row) // no copy unless kept
          if (cmpRank(probe, weakest) < 0) {
            heap.poll()
            heap.add(new Entry(ord, row.copy()))
          }
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values.iterator.asScala.flatMap(_.iterator.asScala.map(_.row))
    }, preservesPartitioning = true)
  }
}
