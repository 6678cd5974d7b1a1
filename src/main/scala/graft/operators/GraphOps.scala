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
    *
    * Adaptive execution, the [[graft.llm.Dedup.connectedComponents]]
    * pattern: graphs at or under `smallGraphThreshold` edges (< 0 → the
    * `graft.pagerank.smallGraphEdges` session conf, default 100k) run
    * the power iteration on the DRIVER over the collected edge list —
    * identical integer update, none of the per-iteration job overhead
    * that dominates tiny graphs (an event-type or vocabulary graph is
    * |types|²-bounded no matter the corpus size; measured 8 s of pure
    * scheduling for a 5-node graph distributed vs ~0.1 s on-driver).
    * Bigger graphs (document-similarity scale) run the distributed
    * join+agg loop. A spec pins both paths value-identical.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
               iters: Int, dampingPct: Long = 85L, scale: Long = 1000000L,
               smallGraphThreshold: Long = -1L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    require(dampingPct >= 0L && dampingPct <= 100L,
      s"dampingPct must be in [0, 100], got $dampingPct")
    require(scale >= 100L, s"scale must be >= 100, got $scale")
    val spark = edges.sparkSession
    val smallCutoff =
      if (smallGraphThreshold >= 0L) smallGraphThreshold
      else spark.conf.get("graft.pagerank.smallGraphEdges", "100000").toLong
    // weights must be strictly positive: a zero out-weight sum would be
    // a bare DIVIDE_BY_ZERO from deep inside iteration codegen, and a
    // negative weight lets ranks go negative, where Spark's DIV
    // (truncate toward zero) and the oracle's // (floor) disagree —
    // silent divergence. Loud in-plan check, the raise_error convention
    // (weights are unknowable at plan time).
    val ed = edges.select(col(srcCol).as("graft_u"), col(dstCol).as("graft_v"),
      col(wCol).cast("long").as("graft_w"))
      .withColumn("graft_w", expr(
        """CASE WHEN graft_w <= 0 THEN
          |  CAST(raise_error(concat('pageRank: edge weight must be positive, got ',
          |    CAST(graft_w AS STRING))) AS BIGINT)
          |ELSE graft_w END""".stripMargin))
    val out = ed.groupBy(col("graft_u")).agg(sum(col("graft_w")).as("graft_out"))
    // edges annotated with their source's out-weight: every iteration
    // joins this — one persisted frame instead of an edge+out join per
    // level
    val e2 = CacheRegistry.persist(ed.join(out, Seq("graft_u")))
    // bounded probe on the persisted frame (materialized here, reused by
    // every iteration either way)
    val probeN = math.min(smallCutoff + 1L, Int.MaxValue.toLong).toInt
    val eCount = e2.limit(probeN).count()
    if (eCount <= smallCutoff)
      return pageRankDriver(spark, e2, iters, dampingPct, scale)
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
        CacheRegistry.dropLocalCheckpoint(prevCkpt)
        prevCkpt = ranks
      }
    }
    ranks.select(col("graft_n").as("node"), col("graft_r").as("rank_micro"))
  }

  /** Deterministic synchronous label propagation: community detection
    * over a weighted edge list. The graph is symmetrized (weights of
    * coincident directed edges sum); every node starts labeled with
    * itself; each of `iters` rounds relabels EVERY node with the label
    * carrying the maximum total neighbor weight, ties broken on the
    * SMALLEST label — a fully deterministic variant of Raghavan et
    * al.'s LPA (async updates + random tie-breaks are irreproducible
    * across engines and runs, useless for an oracle-checked pipeline).
    *
    * Scale shape mirrors [[pageRank]]: per round, one join of the
    * persisted symmetric edge list against the label table plus three
    * key-partitioned aggregations ((node,label) weight sum → per-node
    * max → min-label argmax), labels localCheckpoint-ed on the same
    * every-3rd-round cadence with deterministic release of superseded
    * checkpoints. Graphs under the small-graph cutoff
    * (`graft.lpa.smallGraphEdges`, default 100k edges) run the
    * identical update on the driver — the event-type/vocabulary graphs
    * are |types|²-bounded regardless of corpus size.
    *
    * Output: (node, label) — label is the community representative
    * (the minimum label that won the node's final round).
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       wCol: String, iters: Int,
                       smallGraphThreshold: Long = -1L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    val spark = edges.sparkSession
    val smallCutoff =
      if (smallGraphThreshold >= 0L) smallGraphThreshold
      else spark.conf.get("graft.lpa.smallGraphEdges", "100000").toLong
    val ed = edges.select(col(srcCol).as("graft_u"), col(dstCol).as("graft_v"),
      col(wCol).cast("long").as("graft_w"))
      .withColumn("graft_w", expr(
        """CASE WHEN graft_w <= 0 THEN
          |  CAST(raise_error(concat('labelPropagation: edge weight must be positive, got ',
          |    CAST(graft_w AS STRING))) AS BIGINT)
          |ELSE graft_w END""".stripMargin))
    val sym = CacheRegistry.persist(
      ed.union(ed.select(col("graft_v").as("graft_u"), col("graft_u").as("graft_v"),
        col("graft_w")))
        .groupBy(col("graft_u"), col("graft_v"))
        .agg(sum(col("graft_w")).as("graft_w")))
    val probeN = math.min(smallCutoff + 1L, Int.MaxValue.toLong).toInt
    if (sym.limit(probeN).count() <= smallCutoff)
      return lpaDriver(spark, sym, iters)
    val nodes = CacheRegistry.persist(sym.select(col("graft_u").as("graft_n")).distinct())
    def round(cur: DataFrame): DataFrame = {
      val scores = sym.join(cur, sym("graft_u") === cur("graft_n"))
        .groupBy(col("graft_v"), col("graft_l"))
        .agg(sum(col("graft_w")).as("graft_s"))
      val best = scores.groupBy(col("graft_v")).agg(max(col("graft_s")).as("graft_ms"))
      scores.join(best, Seq("graft_v"))
        .filter(col("graft_s") === col("graft_ms"))
        .groupBy(col("graft_v")).agg(min(col("graft_l")).as("graft_l"))
        .select(col("graft_v").as("graft_n"), col("graft_l"))
    }
    var labels = nodes.select(col("graft_n"), col("graft_n").as("graft_l"))
      .localCheckpoint()
    var done = 0
    var converged = false
    while (done < iters && !converged) {
      // up to 3 lazy rounds per checkpoint (bounds plan growth at 2³)
      val block = math.min(3, iters - done)
      var cur = labels
      for (_ <- 1 to block) cur = round(cur)
      val ckpt = cur.localCheckpoint()
      CacheRegistry.dropLocalCheckpoint(labels)
      done += block
      if (done < iters) {
        // Convergence probe between CONSECUTIVE MATERIALIZED states:
        // run one more round, checkpoint it, compare with a bounded
        // limit(1) count. Every round executes exactly once — the
        // probe round IS the next block's first round — and at a
        // fixed point synchronous LPA is idempotent, so stopping
        // returns exactly what the remaining rounds would.
        val nxt = round(ckpt).localCheckpoint()
        converged = nxt
          .join(ckpt.withColumnRenamed("graft_l", "graft_prev"), Seq("graft_n"))
          .filter(col("graft_l") =!= col("graft_prev"))
          .limit(1).count() == 0L
        CacheRegistry.dropLocalCheckpoint(ckpt)
        labels = nxt
        done += 1
      } else labels = ckpt
    }
    labels.select(col("graft_n").as("node"), col("graft_l").as("label"))
  }

  /** Driver LPA over the collected (bounded) symmetric edge list —
    * the exact update of the distributed loop.
    */
  private def lpaDriver(spark: org.apache.spark.sql.SparkSession,
      sym: DataFrame, iters: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructField, StructType}
    val edges = sym.collect().map(r => (r.get(0), r.get(1), r.getLong(2)))
    val nodes = edges.map(_._1).distinct
    // strings must compare the way Spark's min() does — unsigned UTF-8
    // byte order, not Java's UTF-16 code-unit order (graft.core.Utf8Order)
    def utf8Less(a: String, b: String): Boolean = graft.core.Utf8Order.less(a, b)
    implicit val anyOrd: Ordering[Any] =
      Ordering.fromLessThan[Any] {
        case (a: String, b: String) => utf8Less(a, b)
        case (a: Long, b: Long) => a < b
        case (a: Int, b: Int) => a < b
        case (a, b) => utf8Less(a.toString, b.toString)
      }
    var label: Map[Any, Any] = nodes.iterator.map(n => (n: Any) -> (n: Any)).toMap
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val scores = scala.collection.mutable.HashMap.empty[(Any, Any), Long]
      edges.foreach { case (u, v, w) =>
        val k = ((v: Any), label(u))
        scores(k) = scores.getOrElse(k, 0L) + w
      }
      val next: Map[Any, Any] = scores.toSeq.groupBy(_._1._1).map { case (v, ls) =>
        val ms = ls.map(_._2).max
        v -> ls.filter(_._2 == ms).map(_._1._2).min
      }
      converged = next == label // fixed point: remaining rounds are no-ops
      label = next
      it += 1
    }
    val nodeType = sym.schema("graft_u").dataType
    val schema = StructType(Seq(
      StructField("node", nodeType),
      StructField("label", nodeType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(nodes.map(n => Row(n, label(n))).toSeq, 1),
      schema)
  }

  /** Per-node triangle counts + local clustering coefficient over the
    * UNDIRECTED simple graph of `edges` (direction, multiplicity, and
    * self-loops are collapsed/dropped first). The wedge enumeration
    * uses the classic degree-ordered orientation — every edge points
    * from its lower-(degree, node) endpoint to the higher — which
    * bounds each node's out-degree by ~√m, so the wedge join's fan-out
    * is O(m^1.5) worst case instead of Σ deg² (the hub-explosion
    * killer on power-law graphs at scale). Each triangle is found
    * exactly once (at its minimum-order apex) and credited to all
    * three corners.
    *
    * Output: (node, degree, n_triangles, clustering_bp) for every
    * non-isolated node, where clustering_bp is the HALF_UP local
    * clustering coefficient 2·t/(deg·(deg−1)) in basis points (0 for
    * degree < 2). The triangle SET is orientation-independent, so the
    * result does not depend on how ties order — only the plan shape
    * does.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = graft.llm.CacheRegistry.persist(edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())
    val deg = graft.llm.CacheRegistry.persist(
      und.select(col("a").as("n")).unionAll(und.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d")))
    // orient by (degree, node); carry the head's degree for the wedge
    // ordering below
    val oriented = graft.llm.CacheRegistry.persist(und
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(expr("struct(da, a) < struct(db, b)"), col("a")).otherwise(col("b")).as("u"),
        when(expr("struct(da, a) < struct(db, b)"), col("b")).otherwise(col("a")).as("v"),
        when(expr("struct(da, a) < struct(db, b)"), col("db")).otherwise(col("da")).as("dv")))
    val wedges = oriented.select(col("u"), col("v").as("v1"), col("dv").as("d1"))
      .join(oriented.select(col("u"), col("v").as("v2"), col("dv").as("d2")), Seq("u"))
      .filter(expr("struct(d1, v1) < struct(d2, v2)"))
    // a closing edge between v1 and v2 is stored as (v1, v2): both
    // wedge order and storage use the same total order
    val tris = wedges.join(oriented.select(col("v").as("v2"),
        col("u").as("v1")), Seq("v1", "v2"), "left_semi")
      .select(col("u"), col("v1"), col("v2"))
    val perNode = tris.select(col("u").as("n"))
      .unionAll(tris.select(col("v1").as("n")))
      .unionAll(tris.select(col("v2").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("n"), "left")
      .select(col("n").as("node"), col("d").as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("clustering_bp", expr(
        """CASE WHEN degree < 2 THEN CAST(0 AS BIGINT)
          |ELSE (40000 * n_triangles + degree * (degree - 1))
          |     DIV (2 * degree * (degree - 1)) END""".stripMargin))
  }

  /** k-core peeling over the same undirected simple graph: `iters`
    * synchronous rounds of drop-every-node-with-degree-below-k, then
    * the surviving edge set's degrees. At the fixpoint (reached when a
    * round removes nothing) every reported node has degree ≥ k in the
    * subgraph — the standard k-core; `iters` bounds the work and is
    * part of the spec so any engine replays the identical rounds.
    * Nodes are reported with their degree WITHIN the surviving
    * subgraph; isolated and peeled nodes are absent.
    *
    * Per round: one map-side-combinable degree count + two semi-joins
    * — all keyed on node, no wedge expansion anywhere. The edge frame
    * localCheckpoints every 3 rounds (the PageRank cadence) so the
    * plan does not deepen linearly.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            iters: Int, smallGraphThreshold: Long = -1L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1 && iters <= 32, s"iters must be in [1, 32], got $iters")
    val spark = edges.sparkSession
    var alive = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    // Adaptive driver path (the connectedComponents cutoff judgment):
    // each peel round is 3 fixed-latency distributed jobs; a bounded
    // graph — event-type transition graphs have |node| = distinct
    // types — peels in microseconds on the driver with identical set
    // logic (pure degree counts, no arithmetic to drift). The
    // checkpoint is already materialized, so the count is free.
    val smallCutoff =
      if (smallGraphThreshold >= 0L) smallGraphThreshold
      else spark.conf.get("graft.kcore.smallGraphEdges", "1000000").toLong
    if (alive.count() <= smallCutoff) {
      var es = alive.collect().map(r => (r.get(0), r.get(1)))
      CacheRegistry.dropLocalCheckpoint(alive)
      for (_ <- 1 to iters) {
        val deg = scala.collection.mutable.HashMap.empty[Any, Long]
        es.foreach { case (a, b) =>
          deg(a) = deg.getOrElse(a, 0L) + 1L
          deg(b) = deg.getOrElse(b, 0L) + 1L
        }
        es = es.filter { case (a, b) => deg(a) >= k && deg(b) >= k }
      }
      val deg = scala.collection.mutable.LinkedHashMap.empty[Any, Long]
      es.foreach { case (a, b) =>
        deg(a) = deg.getOrElse(a, 0L) + 1L
        deg(b) = deg.getOrElse(b, 0L) + 1L
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          alive.schema("a").dataType, nullable = true),
        org.apache.spark.sql.types.StructField("degree",
          org.apache.spark.sql.types.LongType, nullable = false)))
      import scala.jdk.CollectionConverters._
      return spark.createDataFrame(
        deg.iterator.map { case (n, d) =>
          org.apache.spark.sql.Row(n, d) }.toSeq.asJava, schema)
    }
    var prevCkpt = alive
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
    for (round <- 1 to iters) {
      val keep = degrees(alive).filter(col("d") >= k)
      alive = alive
        .join(keep.select(col("n").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("n").as("b")), Seq("b"), "left_semi")
      if (round % 3 == 0 || round == iters) {
        alive = alive.localCheckpoint()
        CacheRegistry.dropLocalCheckpoint(prevCkpt)
        prevCkpt = alive
      }
    }
    // the final checkpoint stays alive: the returned plan reads it
    // (its lineage was truncated — dropping it would orphan the frame);
    // it is executor-memory block storage released with the session or
    // by the caller's materialize-then-clearCache cycle
    degrees(alive).select(col("n").as("node"), col("d").as("degree"))
  }

  /** Driver power iteration over the collected (bounded) edge list —
    * the exact integer update of the distributed loop: contributions
    * floor-divide per edge, then base + (d·contrib) DIV 100 +
    * (d·dang) DIV (100·N). Longs stay positive throughout, so Scala's
    * `/` is the same floor division as Spark's `DIV`.
    */
  private def pageRankDriver(spark: org.apache.spark.sql.SparkSession,
      e2: DataFrame, iters: Int, dampingPct: Long, scale: Long): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val edges = e2.collect().map(r => (r.get(0), r.get(1), r.getLong(2), r.getLong(3)))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.length.toLong
    val base = scale * (100L - dampingPct) / 100L
    val sources = edges.iterator.map(_._1).toSet
    var rank: Map[Any, Long] = nodes.iterator.map(nd => (nd: Any) -> scale).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.HashMap.empty[Any, Long]
      edges.foreach { case (u, v, w, outw) =>
        contrib(v) = contrib.getOrElse(v, 0L) + rank(u) * w / outw
      }
      val dang = nodes.iterator.filterNot(sources).map(rank).sum
      rank = nodes.iterator.map(nd => (nd: Any) ->
        (base + dampingPct * contrib.getOrElse(nd, 0L) / 100L +
          dampingPct * dang / (100L * n))).toMap
    }
    val schema = StructType(Seq(
      StructField("node", e2.schema("graft_u").dataType),
      StructField("rank_micro", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(nodes.map(nd => Row(nd, rank(nd))).toSeq, 1),
      schema)
  }

  /** Common-neighbor link prediction (Liben-Nowell & Kleinberg 2003):
    * scores every NON-adjacent node pair that shares at least one
    * neighbor by (common-neighbor count, preferential-attachment
    * degree product) and returns the deterministic top-k. Both scores
    * are integer-exact; the ordering ties break on the pair itself.
    *
    * Scale shape: the wedge join through shared neighbors is the
    * classic Θ(Σ deg(w)²) enumeration, so hub nodes are excluded as
    * wedge CENTERS once their degree exceeds `maxDegree` — the
    * standard production cap (a celebrity's followers are not all
    * pairwise-likely links); hubs still count toward endpoint degrees
    * and may themselves be endpoints. The anti-join that removes
    * existing edges and the degree attachments are all key-equi joins
    * on bounded frames; nothing all-pairs survives the cap.
    */
  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
                     topK: Int, maxDegree: Long = 10000L): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    require(maxDegree >= 2L, s"maxDegree must be >= 2, got $maxDegree")
    val und = CacheRegistry.persist(edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct())
    val adj = und.select(col("a").as("u"), col("b").as("v"))
      .unionAll(und.select(col("b").as("u"), col("a").as("v")))
    val deg = CacheRegistry.persist(
      adj.groupBy(col("u")).agg(count(lit(1)).as("deg")))
    val centers = adj.select(col("v").as("w"), col("u").as("x"))
      .join(deg.select(col("u").as("w"), col("deg")), Seq("w"))
      .filter(col("deg") <= maxDegree)
      .select(col("w"), col("x"))
    val wedges = centers.select(col("w"), col("x"))
      .join(centers.select(col("w"), col("x").as("y")), Seq("w"))
      .filter(col("x") < col("y"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("common_neighbors"))
    wedges
      .join(und, wedges("x") === und("a") && wedges("y") === und("b"),
        "left_anti")
      .join(deg.select(col("u").as("x"), col("deg").as("graft_dx")), Seq("x"))
      .join(deg.select(col("u").as("y"), col("deg").as("graft_dy")), Seq("y"))
      .select(col("x").as("node_a"), col("y").as("node_b"),
        col("common_neighbors"),
        (col("graft_dx") * col("graft_dy")).as("pref_attachment"))
      .orderBy(col("common_neighbors").desc, col("pref_attachment").desc,
        col("node_a"), col("node_b"))
      .limit(topK)
  }
}
