package graft

/** DuckDB-SQL replay of [[graft.ops.GraphOps.pageRankFixedPoint]]:
  * the iterations UNROLL as a CTE chain (d_i → f_i → r_i per round),
  * with every division an integer floor on nonnegative operands —
  * DuckDB's `//` and Spark's `DIV` agree there — and every truncation
  * in the same place the Scala update rule puts it, so ten iterations
  * later the fixed-point ranks are still bit-identical.
  */
object OraclePageRank {

  /** Full oracle: `edgesSql` must yield `(src BIGINT, dst BIGINT)`
    * (already distinct if unweighted semantics are intended).  Emits
    * `(node, rank_fp BIGINT, rank DOUBLE)` ordered by node.
    */
  def sql(edgesSql: String, iters: Int, dampNum: Long = 85,
      dampDen: Long = 100, scale: Long = 1000000000000L): String = {
    val tele = s"($scale // (SELECT n FROM meta)) * ${dampDen - dampNum} // $dampDen"
    val rounds = (1 to iters).map { i =>
      val prev = s"r${i - 1}"
      // MATERIALIZED is load-bearing: r_i is referenced twice by round
      // i+1, so inlined CTEs would expand the base join 2^iters times
      s"""d$i AS MATERIALIZED (
         |  SELECT coalesce(sum(rank_fp), 0) AS dang FROM $prev WHERE outdeg = 0
         |), f$i AS MATERIALIZED (
         |  SELECT e.dst AS node, sum(r.rank_fp // r.outdeg) AS inflow
         |  FROM edges e JOIN $prev r ON e.src = r.node GROUP BY 1
         |), r$i AS MATERIALIZED (
         |  SELECT b.node, b.outdeg,
         |         $tele + (coalesce(f.inflow, 0)
         |           + (SELECT dang FROM d$i) // (SELECT n FROM meta))
         |           * $dampNum // $dampDen AS rank_fp
         |  FROM deg b LEFT JOIN f$i f USING (node)
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH edges AS MATERIALIZED (
       |$edgesSql
       |), nodes AS (
       |  SELECT src AS node FROM edges UNION SELECT dst FROM edges
       |), deg AS MATERIALIZED (
       |  SELECT n.node, coalesce(o.d, 0) AS outdeg
       |  FROM nodes n LEFT JOIN (
       |    SELECT src AS node, count(*) AS d FROM edges GROUP BY 1) o
       |  USING (node)
       |), meta AS MATERIALIZED (
       |  SELECT count(*) AS n FROM deg
       |), r0 AS MATERIALIZED (
       |  SELECT node, outdeg,
       |         $scale // (SELECT n FROM meta) AS rank_fp
       |  FROM deg
       |), $rounds
       |SELECT node, CAST(rank_fp AS BIGINT) AS rank_fp,
       |       CAST(rank_fp AS DOUBLE) / $scale.0 AS rank
       |FROM r$iters ORDER BY node""".stripMargin
  }

  /** The nation-trade graph: an edge customer-nation → supplier-nation
    * for every distinct trading relationship in lineitem ⋈ orders ⋈
    * customer ⋈ supplier.
    */
  val nationEdgesSql: String =
    """  SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
      |         CAST(s.s_nationkey AS BIGINT) AS dst
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey""".stripMargin
}
