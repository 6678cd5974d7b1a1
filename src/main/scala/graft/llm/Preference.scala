package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference-pair aggregation for reward-model / RLHF data prep:
  * pairwise "A beat B" judgments (human rater picks, LLM-judge
  * verdicts, A/B outcomes) reduce to one per-item strength score.
  *
  * [[bradleyTerry]] is the Bradley–Terry model fitted by Hunter's MM
  * iteration (Hunter 2004, "MM algorithms for generalized
  * Bradley-Terry models"), re-expressed in pinned INTEGER micro-unit
  * arithmetic so the result is engine-exact and a DuckDB oracle
  * replays it verbatim (the [[graft.operators.GraphOps.pageRank]]
  * discipline — no float damping, floor division at pinned points,
  * every operand positive so Spark's `DIV` (truncate) and the
  * oracle's `//` (floor) agree).
  *
  * Order independence is the point at scale: Elo is
  * sequence-dependent (a shuffle changes every score — useless for a
  * distributed, re-runnable pipeline); Bradley–Terry is a function of
  * the comparison COUNTS alone, so the estimate is invariant under
  * partitioning, retries, and ingestion order.
  */
object Preference {

  /** The per-term multiplier: comparison counts scale by 1e9 before
    * the floor division by a rank sum, keeping ~1e-3 relative
    * precision at rank sums near 2·scale while `wins × Mult` stays
    * inside BIGINT for up to ~9.2e9 total wins per item (documented
    * input bound — beyond that, pre-divide the counts).
    */
  private val Mult = 1000000000L

  /** Hard saturation on the un-normalized update: strength ratios
    * beyond ~1e6 : 1 clamp, bounding `u × scale` inside BIGINT.
    */
  private val UCap = 1000000000000L

  /** Bradley–Terry strengths from pairwise win counts. `pairs` rows
    * mean: `winCol` beat `loseCol`, `nCol` times (duplicate rows sum;
    * `nCol` must be positive and a self-comparison is rejected — both
    * loudly in-plan, the pageRank weight convention).
    *
    * The pinned MM update, per iteration (S = `scale`, M = 1e9,
    * all-integer, every operand positive):
    *
    *   den_i = max(1, Σ_j (n_ij · M) DIV (r_i + r_j))   n_ij = games
    *   u_i   = min(max((W_i · M) DIV den_i, 1), 1e12)   W_i = wins
    *   mean  = max(1, (Σ u) DIV |items|)
    *   r'_i  = max(1, (u_i · S) DIV mean)
    *
    * The mean-normalization pins the scale the true model leaves free
    * (BT strengths are only defined up to a constant factor); the
    * floor-1 clamps keep never-winners and saturated floors inside
    * the next iteration's divisions. Items appearing only as losers
    * get W = 0 → strength floors at 1.
    *
    * Scale shape: comparisons aggregate ONCE to the |items|²-bounded
    * symmetric game matrix (the only corpus-sized pass); each
    * iteration is a join of that matrix against the rank table plus
    * two aggregations, ranks localCheckpoint-ed on the every-3rd
    * cadence with deterministic release of superseded checkpoints.
    * Matrices at or under `smallPairsThreshold` directed rows (< 0 →
    * the `graft.bt.smallPairs` session conf, default 100k) run the
    * identical update on the driver — a judged-model or rater
    * leaderboard is |items|²-bounded no matter how many comparisons
    * stream in.
    *
    * Output: (item, strength_micro) — `item` keeps the win/lose
    * column type; initial strength = `scale` per item.
    */
  def bradleyTerry(pairs: DataFrame, winCol: String, loseCol: String,
      nCol: String, iters: Int, scale: Long = 1000000L,
      smallPairsThreshold: Long = -1L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    // upper bound: the normalization computes u·scale with u clamped
    // at UCap = 1e12, so scale beyond ~9.2e6 would wrap the update
    // negative (where DIV-truncate and the oracle's floor diverge)
    // instead of erroring
    require(scale >= 100L && scale <= 9000000L,
      s"scale must be in [100, 9000000], got $scale")
    val spark = pairs.sparkSession
    val smallCutoff =
      if (smallPairsThreshold >= 0L) smallPairsThreshold
      else spark.conf.get("graft.bt.smallPairs", "100000").toLong
    val pr = pairs.select(col(winCol).as("graft_w"), col(loseCol).as("graft_l"),
        col(nCol).cast("long").as("graft_n"))
      .withColumn("graft_n", expr(
        """CASE WHEN graft_n <= 0 THEN
          |  CAST(raise_error(concat('bradleyTerry: comparison count must be positive, got ',
          |    CAST(graft_n AS STRING))) AS BIGINT)
          |WHEN graft_w <=> graft_l THEN
          |  CAST(raise_error('bradleyTerry: self-comparison (winner = loser)') AS BIGINT)
          |ELSE graft_n END""".stripMargin))
    // PERSISTED: dir feeds both union arms of the game matrix AND the
    // wins fold — unpersisted, the corpus-sized pairs groupBy would
    // re-run per reference (ReuseExchange is not guaranteed)
    val dir = CacheRegistry.persist(
      pr.groupBy(col("graft_w"), col("graft_l"))
        .agg(sum(col("graft_n")).as("graft_n")))
    // the symmetric game matrix, kept DIRECTED both ways for the
    // per-iteration join: n_ij rides on (i, j) AND (j, i)
    val games = CacheRegistry.persist(
      dir.select(col("graft_w").as("graft_i"), col("graft_l").as("graft_j"),
          col("graft_n"))
        .unionByName(dir.select(col("graft_l").as("graft_i"),
          col("graft_w").as("graft_j"), col("graft_n")))
        .groupBy(col("graft_i"), col("graft_j"))
        .agg(sum(col("graft_n")).as("graft_gn")))
    val probeN = math.min(smallCutoff + 1L, Int.MaxValue.toLong).toInt
    val gCount = games.limit(probeN).count()
    val nodes = games.select(col("graft_i")).distinct()
    val winsAll = CacheRegistry.persist(
      nodes.join(dir.groupBy(col("graft_w").as("graft_i"))
          .agg(sum(col("graft_n")).as("graft_wi0")), Seq("graft_i"), "left")
        .select(col("graft_i"),
          coalesce(col("graft_wi0"), lit(0L)).as("graft_wi")))
    if (gCount <= smallCutoff)
      return bradleyTerryDriver(spark, games, winsAll, iters, scale)
    var ranks = nodes.select(col("graft_i").as("graft_n2"),
      lit(scale).as("graft_r")).localCheckpoint()
    var prevCkpt = ranks
    for (i <- 1 to iters) {
      val ri = ranks.select(col("graft_n2").as("graft_i"), col("graft_r").as("graft_ri"))
      val rj = ranks.select(col("graft_n2").as("graft_j"), col("graft_r").as("graft_rj"))
      val den = games.join(ri, Seq("graft_i")).join(rj, Seq("graft_j"))
        .select(col("graft_i"),
          expr(s"(graft_gn * ${Mult}L) DIV (graft_ri + graft_rj)").as("graft_t"))
        .groupBy(col("graft_i"))
        .agg(greatest(sum(col("graft_t")), lit(1L)).as("graft_den"))
      val upd = winsAll.join(den, Seq("graft_i"))
        .select(col("graft_i"),
          least(greatest(expr(s"(graft_wi * ${Mult}L) DIV graft_den"), lit(1L)),
            lit(UCap)).as("graft_u"))
      val mean = upd.agg(
        greatest(expr("CAST(sum(graft_u) AS BIGINT) DIV count(1)"), lit(1L))
          .as("graft_mean"))
      ranks = upd.crossJoin(mean)
        .select(col("graft_i").as("graft_n2"),
          greatest(expr(s"(graft_u * ${scale}L) DIV graft_mean"), lit(1L))
            .as("graft_r"))
      if (i % 3 == 0 || i == iters) {
        ranks = ranks.localCheckpoint()
        CacheRegistry.dropLocalCheckpoint(prevCkpt)
        prevCkpt = ranks
      }
    }
    ranks.select(col("graft_n2").as("item"), col("graft_r").as("strength_micro"))
  }

  /** Fleiss' kappa over a categorical rating table — the standard
    * inter-rater agreement gate for human annotation batches
    * (preference labels, quality tiers): how much better than chance
    * do the raters agree. One row out:
    * (n_items, raters_per_item, p_bar_micro, p_e_micro, kappa_micro).
    *
    * Pinned integer semantics at S = `scale` (default 1e6), N items,
    * n = `ratersPerItem`, n_ik = votes item i got for label k,
    * q_k = Σ_i n_ik:
    *
    *   P_i  = ((Σ_k n_ik² − n) · S) DIV (n·(n−1))      per-item agreement
    *   P̄    = (Σ_i P_i) DIV N
    *   p_k  = (q_k · S) DIV (N·n)
    *   P_e  = (Σ_k p_k²) DIV S                          chance agreement
    *   κ    = sign(P̄−P_e) · ((|P̄−P_e| · S) DIV (S−P_e))
    *
    * Every division except the last has a non-negative numerator, so
    * Spark's DIV (truncate) and DuckDB's // (floor) agree; the signed
    * κ uses the sign-split form for the same reason. κ is NULL when
    * P_e = S (every vote one label — chance agreement is total and
    * kappa is undefined).
    *
    * Input discipline (loud, in-plan): each (item, rater) pair must
    * rate ONCE, and every item must carry EXACTLY `ratersPerItem`
    * ratings — Fleiss' statistic assumes a constant panel, and
    * silently averaging a ragged table misstates agreement.
    *
    * Scale shape: two key-partitioned aggregations (item×label
    * counts → per-item P_i) plus label-grain and single-row folds —
    * no iteration, no driver action, nothing beyond |items|+|labels|
    * intermediate rows; the twice-consumed counts and P̄ subtrees
    * persist once via CacheRegistry (callers release).
    */
  def fleissKappa(ratings: DataFrame, itemCol: String, raterCol: String,
      labelCol: String, ratersPerItem: Int,
      scale: Long = 1000000L): DataFrame = {
    require(ratersPerItem >= 2,
      s"ratersPerItem must be >= 2, got $ratersPerItem")
    require(scale >= 100L, s"scale must be >= 100, got $scale")
    val n = ratersPerItem.toLong
    // the panel guard: exactly n ratings from exactly n DISTINCT
    // raters per item — together these force one-rating-per-rater (a
    // duplicate plus an absentee could not keep both counts at n).
    // The checked value IS the join key the counts pass consumes, so
    // column pruning cannot optimize the check away.
    val guard = ratings.groupBy(col(itemCol).as("graft_gi0"))
      .agg(count(lit(1)).as("graft_tot"),
        countDistinct(col(raterCol)).as("graft_nr"))
      .select(expr(
        s"""CASE WHEN graft_tot <> ${n}L OR graft_nr <> ${n}L THEN
           |  raise_error(concat('fleissKappa: item with ',
           |    CAST(graft_tot AS STRING), ' ratings from ',
           |    CAST(graft_nr AS STRING), ' distinct raters, expected $n'))
           |ELSE graft_gi0 END""".stripMargin).as("graft_gi"))
    // PERSISTED: counts feeds the per-item fold AND the label-grain
    // fold, pbar feeds p_e AND the final row — unpersisted, each
    // reference would re-run the ratings scan plus the guard shuffle
    // (AQE does not guarantee identical-subplan exchange reuse)
    val counts = CacheRegistry.persist(
      ratings.join(guard, col(itemCol) === col("graft_gi"))
        .groupBy(col(itemCol).as("graft_i"), col(labelCol).as("graft_k"))
        .agg(count(lit(1)).as("graft_nik")))
    val perItem = counts.groupBy(col("graft_i"))
      .agg(sum(expr("graft_nik * graft_nik")).as("graft_sq"))
      .select(col("graft_i"),
        expr(s"((graft_sq - ${n}L) * ${scale}L) DIV (${n}L * ${n - 1}L)")
          .as("graft_pi"))
    val pbar = CacheRegistry.persist(perItem.agg(
      expr("CAST(sum(graft_pi) AS BIGINT)").as("graft_psum"),
      count(lit(1)).as("graft_n_items"))
      .select(col("graft_n_items"),
        expr("graft_psum DIV graft_n_items").as("graft_pbar")))
    val pe = counts.groupBy(col("graft_k"))
      .agg(sum(col("graft_nik")).as("graft_qk"))
      .crossJoin(pbar.select(col("graft_n_items").as("graft_ni2")))
      .select(expr(s"(graft_qk * ${scale}L) DIV (graft_ni2 * ${n}L)").as("graft_pk"))
      .agg(expr(s"CAST(sum(graft_pk * graft_pk) AS BIGINT) DIV ${scale}L")
        .as("graft_pe"))
    pbar.crossJoin(pe).select(
      col("graft_n_items").as("n_items"),
      lit(n).as("raters_per_item"),
      col("graft_pbar").as("p_bar_micro"),
      col("graft_pe").as("p_e_micro"),
      expr(
        s"""CASE WHEN graft_pe >= ${scale}L THEN CAST(NULL AS BIGINT)
           |ELSE CAST(sign(graft_pbar - graft_pe) AS BIGINT) *
           |  ((abs(graft_pbar - graft_pe) * ${scale}L) DIV (${scale}L - graft_pe))
           |END""".stripMargin).as("kappa_micro"))
  }

  private def bradleyTerryDriver(spark: org.apache.spark.sql.SparkSession,
      games: DataFrame, winsAll: DataFrame, iters: Int,
      scale: Long): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val g = games.collect().map(r => (r.get(0), r.get(1), r.getLong(2)))
    val wins = winsAll.collect().map(r => (r.get(0): Any) -> r.getLong(1)).toMap
    val nodes = wins.keys.toArray
    val c = nodes.length.toLong
    var rank: Map[Any, Long] = nodes.iterator.map(nd => nd -> scale).toMap
    // empty comparisons → empty result (pageRankDriver's grace on an
    // empty edge list); without the guard the mean's Σu/c is 0/0
    for (_ <- 1 to iters if c > 0L) {
      val den = scala.collection.mutable.HashMap.empty[Any, Long]
      g.foreach { case (i, j, n) =>
        den(i) = den.getOrElse(i, 0L) + n * Mult / (rank(i) + rank(j))
      }
      val u = nodes.iterator.map { nd =>
        nd -> math.min(math.max(wins(nd) * Mult / math.max(den.getOrElse(nd, 0L), 1L), 1L), UCap)
      }.toMap
      val mean = math.max(u.valuesIterator.sum / c, 1L)
      rank = nodes.iterator.map(nd => nd -> math.max(u(nd) * scale / mean, 1L)).toMap
    }
    val schema = StructType(Seq(
      StructField("item", games.schema("graft_i").dataType),
      StructField("strength_micro", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(nodes.map(nd => Row(nd, rank(nd))).toSeq, 1),
      schema)
  }
}
