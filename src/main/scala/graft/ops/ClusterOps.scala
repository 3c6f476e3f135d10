package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-dup graph clustering for dedup pipelines: candidate PAIRS
  * (from any DedupOps/SimilarityOps flavor) → connected components →
  * one canonical document per component.
  *
  * Algorithm selection is ADAPTIVE, like Spark's own broadcast-join
  * cutoff: at or below `collectThreshold` edges the whole graph ships
  * to the driver for union-find (milliseconds, zero rounds); above
  * it, the distributed star contraction below.  After heavy dedup
  * filtering the surviving pair graph is often tiny even when the
  * corpus is not — paying ~2 scheduling-bound shuffle jobs per
  * contraction round for a 10k-edge graph is pure overhead.
  *
  * Components use the alternating large-star / small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14): converges in O(log n) rounds on ANY graph shape — a
  * million-doc boilerplate chain collapses in ~20 rounds where naive
  * min-label propagation needs a million.  Each round is two shuffles
  * over the EDGE set only (a groupBy for neighborhood minima and a
  * join to rewrite edges); neighborhoods are never materialized as
  * arrays (no collect_list — a cluster with millions of members stays
  * distributed).
  *
  * Every round is checkpointed: an iterative DataFrame loop otherwise
  * compounds plan depth and re-executes all prior rounds at each
  * action.  Two flavors, selected by `checkpointDir`:
  *
  *  - None (default): `localCheckpoint` — executor-memory/disk blocks,
  *    right for local mode where there is no executor loss.  Each
  *    round's blocks are RELEASED as soon as the next round is
  *    materialized (a 20-round contraction holds 2 edge sets, not 20);
  *    the final round's blocks back the returned frame and are
  *    released by [[unpersistAll]] once every derived frame is
  *    materialized.
  *  - Some(dir): RELIABLE checkpoints under `dir` — survive executor
  *    loss, the right choice on a real cluster (a lost
  *    localCheckpoint block would otherwise kill the job, since the
  *    truncated lineage cannot recompute).  Superseded round files
  *    stay in `dir` until the job cleans it (or
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true`).
  */
object ClusterOps {

  /** The RDD holding a checkpoint-backed Dataset's blocks (the
    * LogicalRDD the checkpoint rewrote the plan to).
    */
  private def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  private val liveCheckpoints =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()

  /** Release the final-round localCheckpoint blocks of every
    * [[connectedComponents]] call since the last release.  Call ONLY
    * after every frame derived from those results is materialized — a
    * checkpoint-backed frame cannot recompute once its blocks are
    * gone (truncated lineage), unlike DedupOps' recomputable caches.
    */
  /** Natural ordering of the runtime id type (ids are orderable Spark
    * types — Long, Int, String... — all `Comparable`).
    */
  private def anyLess(a: Any, b: Any): Boolean =
    a.asInstanceOf[Comparable[Any]].compareTo(b) < 0

  /** Driver union-find over a collected edge list — the SMALL-GRAPH
    * fast path of [[connectedComponents]].  Union-by-min (the smaller
    * root absorbs) + path compression: near-linear, and the root of
    * every tree is the component minimum by construction, so the
    * output is exactly the distributed path's `(id, cluster_id=min)`
    * mapping.
    */
  private def driverComponents(
      edges: Array[org.apache.spark.sql.Row],
      spark: org.apache.spark.sql.SparkSession,
      idType: org.apache.spark.sql.types.DataType): DataFrame = {
    val parent = new java.util.HashMap[Any, Any]()
    def find(x: Any): Any = {
      var r = x
      var p = parent.get(r)
      while (p != null && p != r) { r = p; p = parent.get(r) }
      // path compression
      var c = x
      while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    edges.foreach { row =>
      val u = row.get(0)
      val v = row.get(1)
      if (!parent.containsKey(u)) parent.put(u, u)
      if (!parent.containsKey(v)) parent.put(v, v)
      val ru = find(u)
      val rv = find(v)
      if (ru != rv) {
        if (anyLess(ru, rv)) parent.put(rv, ru) else parent.put(ru, rv)
      }
    }
    val out = Vector.newBuilder[org.apache.spark.sql.Row]
    parent.keySet().forEach(k =>
      out += org.apache.spark.sql.Row(k, find(k)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType, nullable = false),
      org.apache.spark.sql.types.StructField("cluster_id", idType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.result(), 1), schema)
  }

  def unpersistAll(): Unit = {
    var r = liveCheckpoints.poll()
    while (r != null) { r.unpersist(blocking = false); r = liveCheckpoints.poll() }
  }

  /** large-star: connect every neighbor v > u to min(N(u) ∪ {u}).
    * Output edges are directed big → small.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val und = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = und.groupBy("u").agg(min("v").as("mn"))
    und.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), least(col("mn"), col("u")).as("v"))
      .distinct()
  }

  /** small-star: for each node u of big→small edges, reconnect u and
    * all its (smaller) neighbors to the neighborhood minimum.
    * Preserves the big → small direction.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("u").agg(min("v").as("mn"))
    e.join(mins, "u")
      .select(col("v").as("u"), col("mn").as("v"))
      .union(mins.select(col("u"), col("mn").as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Connected components of the pair graph: one row per non-isolated
    * node, `(id, cluster_id)` with `cluster_id` = the component's
    * minimum id (so the cluster id doubles as the canonical member).
    * Ids may be any orderable Spark type.  Isolated docs (no pairs)
    * don't appear — they are their own cluster by definition.
    *
    * ONE distributed action per round: the lazy `localCheckpoint` is
    * materialized by the same aggregate that returns the convergence
    * signature — edge count + an order-free `bit_xor` over the
    * per-edge hashes.  Two distinct edge sets of equal size collide on
    * the 64-bit xor with probability ~2⁻⁶⁴ (vs the r3 count +
    * `except().isEmpty`, which cost two extra jobs per round);
    * `maxIter` bounds the driver loop, and exhausting it THROWS — a
    * truncated contraction is not a component mapping.
    */
  /** @param collectThreshold edge count at or below which the DRIVER
    *        union-find fast path runs instead of the distributed
    *        contraction — the same adaptive cutoff logic as a
    *        broadcast join: a graph of ≤ ~1M edges (≈ 16 MB of longs)
    *        resolves in milliseconds on the driver, where the
    *        log-round loop would pay ~2 shuffle jobs per round of
    *        pure scheduling overhead.  Set 0 to force the distributed
    *        path (the specs pinning the contraction do).  The output
    *        is set-identical either way.
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50, checkpointDir: Option[String] = None,
      collectThreshold: Long = 1000000L): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    checkpointDir.foreach(sc.setCheckpointDir)
    val reliable = checkpointDir.isDefined
    def ckpt(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = false)
      else df.localCheckpoint(eager = false)
    // local blocks are truncated lineage — release only when the next
    // round is safely materialized; reliable files need no release here
    def release(df: DataFrame): Unit =
      if (!reliable) checkpointRdd(df).foreach(_.unpersist(blocking = false))
    // (count, xor-of-hashes ×2) in the single job that also
    // materializes the checkpoint blocks; xor (unlike sum) cannot
    // overflow under ANSI mode and is insensitive to row order.  TWO
    // independent 64-bit statistics (hash of (u,v) and of (v,u)) so an
    // accidental or adversarially-constructed collision on one stream
    // still has to collide the other — declaring a truncated
    // contraction "converged" needs a simultaneous 128-bit collision
    // (ADVICE r04).
    def sig(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(
        count(lit(1)),
        expr("bit_xor(xxhash64(u, v))"),
        expr("bit_xor(xxhash64(v, u))")).head()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    var e = ckpt(pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .where(col("u") =!= col("v"))
      .distinct())
    var (cnt, hs, hs2x) = sig(e)
    if (cnt <= collectThreshold) {
      // small-graph fast path: the edge list fits on the driver with
      // room to spare — union-find beats paying the round loop's
      // scheduling overhead.  Reads the just-materialized checkpoint,
      // then releases it (nothing to register: no checkpoint backs
      // the returned frame).
      val rows = e.collect()
      release(e)
      return driverComponents(rows, pairs.sparkSession,
        pairs.schema(aCol).dataType)
    }
    var converged = cnt == 0
    var iter = 0
    while (!converged && iter < maxIter) {
      val e2 = ckpt(smallStar(largeStar(e)))
      val (cnt2, h2, h2x) = sig(e2)
      release(e) // e2 is materialized; the prior round is dead weight
      converged = cnt2 == cnt && h2 == hs && h2x == hs2x
      e = e2
      cnt = cnt2
      hs = h2
      hs2x = h2x
      iter += 1
    }
    if (!converged)
      // a truncated contraction is NOT components: edges may still
      // point at intermediate nodes, so downstream keep/drop decisions
      // would silently under-merge.  50 rounds covers any graph the
      // O(log n) bound admits; hitting this means something is wrong.
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint after $maxIter rounds " +
          s"($cnt edges remain) — raise maxIter")
    // the final round's blocks back the returned frame — releasable
    // via unpersistAll once derived frames are materialized
    if (!reliable) checkpointRdd(e).foreach(liveCheckpoints.add)
    // at the fixpoint every edge is (member, component-min); the min
    // itself only appears on the right, so union it in as its own row
    e.select(col("u").as("id"), col("v").as("cluster_id"))
      .union(e.select(col("v").as("id"), col("v").as("cluster_id")))
      .distinct()
  }

  /** Members to DROP — every clustered doc except its canonical
    * (minimum-id) representative.
    */
  def dropList(components: DataFrame): DataFrame =
    components.where(col("id") =!= col("cluster_id")).select("id")

  /** The deduplicated corpus: `df` minus non-canonical cluster members.
    * Anti-join on the drop list — at 100 TB the drop list is ~the dup
    * mass (potentially large), so this is a shuffle join by default;
    * AQE converts it to broadcast when the list turns out small.
    */
  def dedupedCorpus(df: DataFrame, idCol: String, components: DataFrame): DataFrame =
    df.join(dropList(components).withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
}
