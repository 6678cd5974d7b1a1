package graft.queries

/** Shared DuckDB-oracle SQL fragments for queries whose oracles unroll
  * iterative algorithms as chained CTEs (the q156 sweep precedent).
  */
object OracleGen {

  /** The PageRank iteration chain for
    * [[graft.operators.GraphOps.pageRank]] at damping 85/100 and scale
    * 1e6: `iters` levels of the exact integer update
    * r' = 150000 + (85·Σ⌊r·w/out⌋) // 100 + (85·dang) // (100·N).
    *
    * Assumes the caller's WITH-clause already defines:
    *   e    (u, v, w, outw)  — out-weight-annotated edges
    *   outd (u, outw)        — per-source out-weights
    *   nodes(n), nn(nn), r0(n, r = 1000000)
    *
    * Returns the ",d1 AS ..., c1 AS ..., r1 AS ..." chain; the caller
    * appends its own final SELECT over r`iters`.
    */
  def pageRankChain(iters: Int): String = {
    val sb = new StringBuilder
    for (i <- 1 to iters) {
      val p = i - 1
      sb.append(s""",
        |d$i AS (SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dang FROM r$p
        |        WHERE n NOT IN (SELECT u FROM outd)),
        |c$i AS (SELECT e.v AS n, CAST(sum((r.r * e.w) // e.outw) AS BIGINT) AS ct
        |        FROM e JOIN r$p r ON r.n = e.u GROUP BY e.v),
        |r$i AS (SELECT nodes.n,
        |          CAST(150000 + (85 * coalesce(c$i.ct, 0)) // 100
        |               + (85 * d$i.dang) // (100 * nn.nn) AS BIGINT) AS r
        |        FROM nodes LEFT JOIN c$i ON c$i.n = nodes.n
        |        CROSS JOIN d$i CROSS JOIN nn)""".stripMargin)
    }
    sb.toString
  }
}
