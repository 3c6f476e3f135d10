package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph ranking beyond ClusterOps' connected components:
  * PageRank for source/host QUALITY — the CommonCrawl-era curation
  * signal ("rank hosts by link structure, keep the reputable tail")
  * that degree counts alone miss.
  *
  * The whole iteration runs in FIXED-POINT integer arithmetic (ranks
  * are long micro-units of `scale`): float PageRank sums incoming
  * contributions in shuffle order, which no two engines (or two runs)
  * replay identically, while long sums are order-free — so 10
  * iterations later the ranks are STILL bit-identical in Spark and the
  * DuckDB oracle, per-iteration truncation and all.  Update rule per
  * iteration (N nodes, damping d = num/den):
  *
  *   contrib(v)  = rank(v) DIV outdeg(v)          (per out-edge)
  *   dangling    = Σ rank(v) over outdeg-0 nodes  (one scalar)
  *   rank'(u)    = (scale − d·scale/den... spelled exactly as:)
  *                 (scale DIV N · (den−num)) DIV den
  *               + (Σ contrib + dangling DIV N) · num DIV den
  *
  * Execution shape: edges are the only big table; each iteration is
  * one join (ranks → edges on src, broadcastable when the node table
  * is small; co-partitioned on src otherwise) + one groupBy(dst) long
  * sum with map-side combine.  The rank frame is O(nodes); iterations
  * persist-rotate like `bpeTrain` so lineage stays flat.
  */
object GraphOps {

  /** Fixed-point PageRank over a directed edge list.  Returns
    * `(node, rank_fp BIGINT, rank DOUBLE)` where rank = rank_fp/scale
    * and Σ rank_fp ≈ scale·N (conserved up to integer truncation).
    *
    * ADAPTIVE like [[ClusterOps]]: an edge list at or below
    * `collectThreshold` resolves in a driver array loop (every
    * iteration of a distributed loop costs job-scheduling overhead
    * that dwarfs the arithmetic on small graphs); larger graphs run
    * the distributed loop — per iteration one edge⋈rank join + one
    * `groupBy(dst)` LONG sum with map-side combine, rank frames
    * persist-rotated.  Both paths run the identical integer update
    * rule, so they are bit-equal (GraphSpec pins it).
    *
    * Self-loops are legal; duplicate edges should be deduped by the
    * caller if unweighted semantics are intended.
    */
  def pageRankFixedPoint(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 10, dampNum: Long = 85, dampDen: Long = 100,
      scale: Long = 1000000000000L,
      collectThreshold: Long = 1000000L): DataFrame = {
    require(iters >= 1 && iters <= 100, s"bad iters $iters")
    require(dampNum > 0 && dampNum < dampDen, s"bad damping $dampNum/$dampDen")
    // the edge list feeds every iteration — pin it once
    val e = DedupOps.registerPersist(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull))
    if (e.count() <= collectThreshold)
      pageRankDriver(e, iters, dampNum, dampDen, scale)
    else pageRankDistributed(e, iters, dampNum, dampDen, scale)
  }

  /** Primitive-specialized driver kernel for LONG node ids — the
    * common case (graphs keyed by 64-bit hashes or row ids), and the
    * one where the generic `Any`-keyed LinkedHashMap intern hurt: it
    * boxed every endpoint on both the hash and the store side, ~4 M
    * transient Longs at the 1 M-edge collectThreshold before the
    * first iteration ran.  Intern is linear probing over primitive
    * arrays (insertion-order ids, so the order array doubles as the
    * id→node decode), then the IDENTICAL integer update rule as the
    * generic and distributed paths — bit-equal output (GraphSpec);
    * BenchSpec micro-pins this kernel under a second at exactly the
    * threshold.  Returns (nodes in first-seen order, final ranks).
    */
  private[graft] def pageRankLongKernel(
      srcs: Array[Long], dsts: Array[Long], iters: Int,
      dampNum: Long, dampDen: Long, scale: Long): (Array[Long], Array[Long]) = {
    val m = srcs.length
    require(m == dsts.length, "pageRankLongKernel: ragged edge arrays")
    require(m < (1 << 28),
      s"pageRankLongKernel: $m edges is beyond the driver fast path")
    // ≤ 2m distinct endpoints; cap ≥ next pow2 of 3.4m keeps the
    // linear-probe load factor under ~0.6 even in the all-distinct
    // worst case
    var cap = 16
    while (cap < m * 3 + m / 2 + 2) cap <<= 1
    val mask = cap - 1
    val keys = new Array[Long](cap)
    val ids = new Array[Int](cap)
    java.util.Arrays.fill(ids, -1)
    var order = new Array[Long](math.max(16, m))
    var n = 0
    def idOf(k: Long): Int = {
      var h = (java.lang.Long.hashCode(k) * 0x9e3779b9) & mask
      var res = -1
      while (res == -1) {
        val id = ids(h)
        if (id == -1) {
          ids(h) = n
          keys(h) = k
          if (n == order.length)
            order = java.util.Arrays.copyOf(order, order.length * 2)
          order(n) = k
          n += 1
          res = n - 1
        } else if (keys(h) == k) res = id
        else h = (h + 1) & mask
      }
      res
    }
    val se = new Array[Int](m)
    val de = new Array[Int](m)
    var i = 0
    while (i < m) { se(i) = idOf(srcs(i)); de(i) = idOf(dsts(i)); i += 1 }
    require(n > 0, "pageRankFixedPoint: empty graph")
    val outdeg = new Array[Long](n)
    i = 0
    while (i < m) { outdeg(se(i)) += 1; i += 1 }
    val nn = n.toLong
    val teleport = scale / nn * (dampDen - dampNum) / dampDen
    var ranks = Array.fill(n)(scale / nn)
    var it = 0
    while (it < iters) {
      var dangling = 0L
      i = 0
      while (i < n) { if (outdeg(i) == 0) dangling += ranks(i); i += 1 }
      val inflow = new Array[Long](n)
      i = 0
      while (i < m) {
        inflow(de(i)) += ranks(se(i)) / outdeg(se(i)); i += 1
      }
      val dshare = dangling / nn
      val next = new Array[Long](n)
      i = 0
      while (i < n) {
        next(i) = teleport + (inflow(i) + dshare) * dampNum / dampDen
        i += 1
      }
      ranks = next
      it += 1
    }
    (java.util.Arrays.copyOf(order, n), ranks)
  }

  /** Driver fast path: same update rule on arrays.  LONG node ids
    * take [[pageRankLongKernel]] (primitive arrays, no boxing); other
    * node types keep the generic Any-keyed intern — they're the rare
    * case and their equality/hash semantics vary by type.
    */
  private def pageRankDriver(
      e: DataFrame, iters: Int, dampNum: Long, dampDen: Long,
      scale: Long): DataFrame = {
    val spark = e.sparkSession
    val nodeType = e.schema.head.dataType
    val rows = e.collect()
    val (nodeSeq: Seq[Any], ranks: Array[Long]) = nodeType match {
      case org.apache.spark.sql.types.LongType =>
        val srcs = new Array[Long](rows.length)
        val dsts = new Array[Long](rows.length)
        var i = 0
        while (i < rows.length) {
          srcs(i) = rows(i).getLong(0); dsts(i) = rows(i).getLong(1)
          i += 1
        }
        val (nodes, rk) =
          pageRankLongKernel(srcs, dsts, iters, dampNum, dampDen, scale)
        (nodes.toSeq, rk)
      case _ =>
        val idx = scala.collection.mutable.LinkedHashMap.empty[Any, Int]
        def idOf(v: Any): Int = idx.getOrElseUpdate(v, idx.size)
        val es = rows.map(r => (idOf(r.get(0)), idOf(r.get(1))))
        val n = idx.size.toLong
        require(n > 0, "pageRankFixedPoint: empty graph")
        val outdeg = new Array[Long](idx.size)
        es.foreach { case (s, _) => outdeg(s) += 1 }
        val teleport = scale / n * (dampDen - dampNum) / dampDen
        var ranks = Array.fill(idx.size)(scale / n)
        for (_ <- 1 to iters) {
          var dangling = 0L
          var i = 0
          while (i < ranks.length) {
            if (outdeg(i) == 0) dangling += ranks(i); i += 1
          }
          val inflow = new Array[Long](idx.size)
          es.foreach { case (s, d) => inflow(d) += ranks(s) / outdeg(s) }
          val dshare = dangling / n
          ranks = Array.tabulate(idx.size)(u =>
            teleport + (inflow(u) + dshare) * dampNum / dampDen)
        }
        (idx.keys.toSeq, ranks)
    }
    val out = nodeSeq.zipWithIndex.map { case (v, i) =>
      org.apache.spark.sql.Row(v, ranks(i), ranks(i).toDouble / scale)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", nodeType),
        org.apache.spark.sql.types.StructField("rank_fp",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
  }

  /** Distributed loop: one join + one long-sum groupBy per iteration. */
  private def pageRankDistributed(
      e: DataFrame, iters: Int, dampNum: Long, dampDen: Long,
      scale: Long): DataFrame = {
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    val base = DedupOps.registerPersist(
      nodes.join(outdeg, Seq("node"), "left")
        .select(col("node"), coalesce(col("outdeg"), lit(0L)).as("outdeg")))
    val n = base.count()
    require(n > 0, "pageRankFixedPoint: empty graph")
    val teleport = scale / n * (dampDen - dampNum) / dampDen
    var ranks = DedupOps.registerPersist(
      base.select(col("node"), col("outdeg"), lit(scale / n).as("rank_fp")))
    for (_ <- 1 to iters) {
      val dangling = ranks.where(col("outdeg") === 0)
        .agg(coalesce(sum("rank_fp"), lit(0L))).head().getLong(0)
      // integer DIV throughout: Spark's `/` is double division, whose
      // round-to-nearest can land one above the true floor on large
      // operands — DIV keeps every iteration exact
      val contribs = e
        .join(ranks.select(col("node").as("src"),
          expr("rank_fp DIV outdeg").as("c")), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum("c").as("inflow"))
      val next = DedupOps.registerPersist(
        base.join(contribs, Seq("node"), "left")
          .select(col("node"), col("outdeg"),
            expr(s"${teleport}L + (coalesce(inflow, 0L) + ${dangling / n}L) " +
              s"* ${dampNum}L DIV ${dampDen}L").as("rank_fp")))
      next.count() // materialize before releasing the previous round
      ranks.unpersist()
      ranks = next
    }
    ranks.select(col("node"), col("rank_fp"),
      (col("rank_fp").cast("double") / lit(scale.toDouble)).as("rank"))
  }

  /** k-core decomposition membership: the maximal subgraph in which
    * every node keeps degree ≥ k — the graph-density mining standard
    * (spam-farm detection, community cores, the robustness filter
    * before expensive per-node analytics).  Peeling is inherently
    * iterative: removing one under-k node can drop a neighbor below
    * k, so rounds repeat until a fixpoint.
    *
    * Distributed shape per round: ONE semi-join of the (both-
    * direction) edge list against the surviving node set + one
    * degree aggregation.  The node-side join strategy is ADAPTIVE
    * (the pageRankFixedPoint / ClusterOps discipline): the node set
    * broadcasts only while its COUNTED size is at or below
    * `broadcastThreshold` — round 1's node set is every distinct node
    * of the graph, which at billion-node scale exceeds Spark's
    * broadcast ceiling, so early rounds run shuffle hash/sort-merge
    * joins and later rounds (survivor set shrunk by the peel) flip to
    * broadcast.  Survivors persist-rotate so each round reads the
    * previous round's materialization, never the whole lineage.
    * Round count is bounded by the peel depth (≤ the degeneracy
    * ordering length; single digits on real graphs), never by node
    * count.
    *
    * Throws if `maxRounds` is exhausted before the peeling fixpoint —
    * a silent early exit would return a superset of the true k-core
    * with no signal to the caller.
    *
    * Returns `(node, deg)` — survivors with their degree INSIDE the
    * core.  Direction/duplicates collapse; self-loops drop.
    */
  def kCore(
      edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 50, broadcastThreshold: Long = 1000000L): DataFrame = {
    require(k >= 1 && maxRounds >= 1, s"kCore: k=$k maxRounds=$maxRounds")
    // node type stays the caller's (string tokens, long ids, …)
    val und = DedupOps.registerPersist(
      edges.select(
          least(col(srcCol), col(dstCol)).as("a"),
          greatest(col(srcCol), col(dstCol)).as("b"))
        .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
        .distinct())
    val de = und.select(col("a").as("u"), col("b").as("v"))
      .unionAll(und.select(col("b").as("u"), col("a").as("v")))
    def coreDegrees(nodes: DataFrame, nodeCount: Long): DataFrame = {
      // broadcast only a COUNTED-small survivor set; a large one joins
      // shuffle-side (AQE still promotes it if the measured size allows)
      def hinted(c: org.apache.spark.sql.Column) = {
        val side = nodes.select(c)
        if (nodeCount <= broadcastThreshold) broadcast(side) else side
      }
      de.join(hinted(col("n").as("u")), "u")
        .join(hinted(col("n").as("v")), "v")
        .groupBy("u").agg(count(lit(1)).as("deg"))
    }
    var cur = DedupOps.registerPersist(de.select(col("u").as("n")).distinct())
    var curCount = cur.count()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val next = DedupOps.registerPersist(
        coreDegrees(cur, curCount).where(col("deg") >= k)
          .select(col("u").as("n")))
      val nextCount = next.count()
      converged = nextCount == curCount
      cur = next
      curCount = nextCount
      rounds += 1
    }
    if (!converged) throw new IllegalStateException(
      s"kCore: no fixpoint after $maxRounds rounds ($curCount survivors); " +
        "raise maxRounds")
    coreDegrees(cur, curCount)
      .select(col("u").as("node"), col("deg").cast("long").as("deg"))
  }

  /** Per-node triangle counts over an undirected graph (directed
    * input: direction and duplicates collapse, self-loops drop).
    *
    * Degree-ordered node-iterator — the MapReduce-era standard (Cohen
    * 2009; Suri & Vassilvitskii's MR-friendly variant): orient every
    * edge from its lower-(degree, id) endpoint to the higher, form
    * wedges only at each edge's LOW endpoint, and close them against
    * the edge set.  The orientation is what makes this scale: wedge
    * count is Σ out-deg² with out-degree ≤ O(√m) under degree
    * ordering, so the intermediate is O(m^1.5) — a hub with degree d
    * in a plain formulation would fan out d² wedges (10¹⁰ for a
    * 100k-degree hub at 100 TB); oriented, hubs sit on the receiving
    * end.  Three hash-joins, no explosion, AQE skew-split applies to
    * the wedge join.
    *
    * The result is orientation-independent (each triangle counted
    * exactly once, at its lowest-ordered vertex), so any engine
    * replays it with the simple a<b enumeration.  Nodes in no
    * triangle are absent.
    *
    * Node ids keep the CALLER'S type (the [[kCore]] discipline):
    * string-keyed graphs — domains, URLs, the engine's own dedup
    * corpus — canonicalize through `least`/`greatest`'s lexicographic
    * total order, which is all the orientation needs.  (An earlier
    * long cast silently nulled-and-dropped non-numeric ids.)
    */
  def triangleCounts(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = DedupOps.registerPersist(
      edges.select(
          least(col(srcCol), col(dstCol)).as("a"),
          greatest(col(srcCol), col(dstCol)).as("b"))
        .where(col("a").isNotNull && col("b").isNotNull &&
          col("a") =!= col("b"))
        .distinct())
    val deg = und.select(col("a").as("n"))
      .unionAll(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
    // lower (degree, id) endpoint first
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(lowFirst, col("a")).otherwise(col("b")).as("u"),
      when(lowFirst, col("b")).otherwise(col("a")).as("v"))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
    val tri = wedges.join(und,
      least(col("y"), col("z")) === col("a") &&
        greatest(col("y"), col("z")) === col("b"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
  }
}
