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

  /** The Bradley–Terry MM iteration chain for
    * [[graft.llm.Preference.bradleyTerry]] at scale 1e6: `iters`
    * levels of the pinned integer update
    * den = max(1, Σ (n·1e9) // (r_i + r_j)),
    * u = min(max((W·1e9) // den, 1), 1e12),
    * r' = max(1, (u·1e6) // max(1, Σu // |items|)).
    *
    * Assumes the caller's WITH-clause already defines:
    *   g  (i, j, n)  — the symmetric game matrix, directed both ways
    *   wn (i, wi)    — per-item win totals (0 for never-winners)
    *   r0 (i, r = 1000000)
    *
    * Every level is MATERIALIZED: r(k−1) feeds two joins in level k,
    * and DuckDB's default CTE inlining would re-execute the chain
    * exponentially (the q171 unroll lesson). Returns the ",d1 AS …"
    * chain; the caller appends its final SELECT over r`iters`.
    */
  def bradleyTerryChain(iters: Int): String = {
    val sb = new StringBuilder
    for (i <- 1 to iters) {
      val p = i - 1
      sb.append(s""",
        |d$i AS MATERIALIZED (SELECT g.i AS i,
        |  GREATEST(CAST(sum((g.n * 1000000000) // (ri.r + rj.r)) AS BIGINT), 1) AS den
        |  FROM g JOIN r$p ri ON ri.i = g.i JOIN r$p rj ON rj.i = g.j
        |  GROUP BY g.i),
        |u$i AS MATERIALIZED (SELECT wn.i,
        |  LEAST(GREATEST(CAST((wn.wi * 1000000000) // d$i.den AS BIGINT), 1),
        |    1000000000000) AS u
        |  FROM wn JOIN d$i USING (i)),
        |t$i AS MATERIALIZED (SELECT GREATEST(CAST(sum(u) AS BIGINT)
        |    // CAST(count(*) AS BIGINT), 1) AS mean FROM u$i),
        |r$i AS MATERIALIZED (SELECT i,
        |  GREATEST(CAST((u * 1000000) // mean AS BIGINT), 1) AS r
        |  FROM u$i CROSS JOIN t$i)""".stripMargin)
    }
    sb.toString
  }
}
