package graft.operators

import graft.llm.CacheRegistry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge DataFrames.
  *
  * PageRank here is the classic power iteration expressed as per-
  * iteration join + aggregate — the shape that scales: each iteration
  * is ONE shuffle of the edge list (join on source) plus one
  * destination-keyed aggregation, with the node table, out-degree
  * totals and the per-iteration dangling/node-count terms riding as
  * 1-row or node-sized frames the planner broadcasts. Ranks are
  * eagerly `localCheckpoint`ed per iteration: each level is read twice
  * (contribution join + dangling aggregate), so without lineage
  * TRUNCATION the logical plan doubles per level — 2^iters plan nodes
  * that OOM the driver in analysis long before any data moves (a
  * persist alone caches execution but not the plan). Checkpointed
  * blocks live in executor storage; on executor loss the iteration
  * restarts rather than recomputes — the standard trade for iterative
  * graph algorithms (GraphX makes the same one).
  *
  * All arithmetic is integer micro-units with floor division at the
  * same points on both engines, so results are engine-exact and
  * oracle-checkable (no float damping).
  */
object GraphOps {

  /** Weighted PageRank, `iters` power iterations at `dampingPct`/100
    * damping over integer micro-unit ranks (initial rank = `scale` per
    * node).
    *
    * Update, exactly (floor division throughout):
    *
    *   r'(v) = scale·(100−d)/100
    *         + (d · Σ_{u→v} ⌊r(u)·w(u,v) / out(u)⌋) DIV 100
    *         + (d · dang) DIV (100·N)
    *
    * where out(u) = Σ w over u's out-edges, dang = Σ r(u) over nodes
    * with no out-edges (their mass redistributes uniformly), and N =
    * |nodes|. N and dang stay in-plan as 1-row aggregates — no driver
    * action anywhere.
    *
    * Output: (node, rank_micro) — `node` keeps the source/dest column
    * type.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
               iters: Int, dampingPct: Long = 85L, scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    require(dampingPct >= 0L && dampingPct <= 100L,
      s"dampingPct must be in [0, 100], got $dampingPct")
    require(scale >= 100L, s"scale must be >= 100, got $scale")
    val ed = edges.select(col(srcCol).as("graft_u"), col(dstCol).as("graft_v"),
      col(wCol).cast("long").as("graft_w"))
    val out = ed.groupBy(col("graft_u")).agg(sum(col("graft_w")).as("graft_out"))
    // edges annotated with their source's out-weight: every iteration
    // joins this — one persisted frame instead of an edge+out join per
    // level
    val e2 = CacheRegistry.persist(ed.join(out, Seq("graft_u")))
    val nodes = CacheRegistry.persist(
      ed.select(col("graft_u").as("graft_n"))
        .union(ed.select(col("graft_v").as("graft_n"))).distinct())
    val nCount = nodes.agg(count(lit(1)).as("graft_nn"))
    val outSrc = nodes.join(e2.select(col("graft_u").as("graft_n")).distinct(),
      Seq("graft_n"), "left_semi")
    val base = scale * (100L - dampingPct) / 100L
    var ranks = nodes.select(col("graft_n"), lit(scale).as("graft_r"))
      .localCheckpoint()
    // superseded checkpoints are unpersisted deterministically (after
    // the eager replacement materializes) instead of waiting on GC +
    // ContextCleaner; only the FINAL checkpoint survives — it IS the
    // returned result's storage, so callers wanting a cache-free
    // session should write the result out and drop the reference.
    // Dataset.unpersist only talks to the CacheManager, which knows
    // nothing of checkpoint storage — the persisted RDD under the
    // checkpoint's LogicalRDD is what must be released.
    def dropCheckpoint(df: DataFrame): Unit = df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
    var prevCkpt = ranks
    for (i <- 1 to iters) {
      val contrib = e2.join(ranks, e2("graft_u") === ranks("graft_n"))
        .select(col("graft_v"),
          expr("(graft_r * graft_w) DIV graft_out").as("graft_c"))
        .groupBy(col("graft_v")).agg(sum(col("graft_c")).as("graft_ct"))
      val dang = ranks.join(outSrc, Seq("graft_n"), "left_anti")
        .agg(coalesce(sum(col("graft_r")), lit(0L)).as("graft_dang"))
      ranks = nodes.join(contrib, nodes("graft_n") === contrib("graft_v"), "left")
        .crossJoin(dang)
        .crossJoin(nCount)
        .select(col("graft_n"),
          (lit(base) +
            expr(s"($dampingPct * coalesce(graft_ct, CAST(0 AS BIGINT))) DIV 100") +
            expr(s"($dampingPct * graft_dang) DIV (100 * graft_nn)")).as("graft_r"))
      // checkpoint every 3rd level (and the last): lineage doubles per
      // uncheckpointed level, so the interval bounds plan growth at 2³
      // nodes while cutting the eager materialization jobs — pure
      // fixed overhead on small graphs — to a third
      if (i % 3 == 0 || i == iters) {
        ranks = ranks.localCheckpoint()
        dropCheckpoint(prevCkpt)
        prevCkpt = ranks
      }
    }
    ranks.select(col("graft_n").as("node"), col("graft_r").as("rank_micro"))
  }
}
