package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel and retention-cohort analytics over event streams.
  *
  * Both are single-shuffle formulations: the funnel walks each user's
  * time-sorted events in ONE `aggregate` pass (the FOLD state is the
  * O(stages) stage-timestamp vector, but the sorted event array it
  * folds over is the user's whole history — a pathological hot user
  * concentrates their events into one row, so cap or pre-filter bot
  * traffic first; the k-join textbook form trades that for k shuffles
  * and k scans). Retention is two map-side-combinable aggregates and
  * one user-keyed join. Timestamps are carried as epoch-µs BIGINTs so
  * every comparison is exact integer arithmetic.
  */
object EventAnalytics {

  /** Furthest funnel stage per user: stage i counts only when it happens
    * STRICTLY after the recorded time of stage i-1 (first eligible
    * occurrence wins; an event can satisfy only one stage). Returns
    * (userCol, stage LONG, t0_us..t{n-1}_us BIGINT nullable) — stage =
    * number of stages reached.
    *
    * One shuffle (groupBy user); the per-user walk runs over the
    * time-sorted event array inside whole-stage codegen. Stage strings
    * must be simple literals (no quotes).
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String, typeCol: String,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty &&
      stages.forall(s => !s.contains("'") && !s.contains("\\")),
      s"stages must be simple literals (no quotes/backslashes): $stages")
    val n = stages.length
    val fields = (0 until n).map(i => s"t$i")
    val init = fields.map(f => s"CAST(NULL AS BIGINT) AS $f").mkString(", ")
    val step = stages.zipWithIndex.map { case (st, i) =>
      val guard =
        if (i == 0) s"acc.t0 IS NULL AND x.ty = '$st'"
        else s"acc.t${i - 1} IS NOT NULL AND acc.t$i IS NULL AND x.ty = '$st' AND x.us > acc.t${i - 1}"
      s"CASE WHEN $guard THEN x.us ELSE acc.t$i END AS t$i"
    }.mkString(", ")
    val stage = (n to 1 by -1)
      .map(i => s"WHEN fu.t${i - 1} IS NOT NULL THEN ${i}")
      .mkString("CASE ", " ", " ELSE 0 END")
    events
      .select(col(userCol), struct(
        expr(s"unix_micros($tsCol)").as("us"), col(typeCol).as("ty")).as("ev"))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("ev"))).as("evs"))
      .withColumn("fu", expr(
        s"aggregate(evs, struct($init), (acc, x) -> struct($step))"))
      .select(
        col(userCol) +: expr(s"CAST($stage AS BIGINT)").as("stage") +:
          fields.map(f => col(s"fu.$f").as(s"${f}_us")): _*)
  }

  /** Retention cohort grid: users keyed by the epoch-day of their first
    * event, counted on each later day they were active. Day arithmetic
    * is integer epoch-µs FLOOR division (via pmod — Spark's `div`
    * truncates toward zero, which would fold the last pre-1970 half-day
    * into day 0; floor matches DuckDB's `//`) — no timezone in play.
    * Returns (cohort_day, day_offset, n_users), one row per
    * (cohort, offset) with at least one active user.
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val usPerDay = 86400000000L
    val day = expr(
      s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), $usPerDay)) div $usPerDay")
    val first = events.groupBy(col(userCol))
      .agg(min(day).as("cohort_day"))
    val active = events
      .select(col(userCol), day.as("active_day")).distinct()
    active.join(first, Seq(userCol))
      .groupBy(col("cohort_day"), (col("active_day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-user inter-event gaps in whole seconds: for every event after a
    * user's first, the time since that user's previous event — the
    * distribution that calibrates session-gap thresholds. One user-keyed
    * window (shuffle bounded by per-user event counts); epoch-µs integer
    * arithmetic, no timezone. Returns (user_id, gap_s).
    */
  def interEventGaps(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val us = expr(s"unix_micros($tsCol)")
    val w = Window.partitionBy(col(userCol)).orderBy(col("graft_us"))
    events.select(col(userCol).as("user_id"), us.as("graft_us"))
      .withColumn("graft_prev", lag(col("graft_us"), 1).over(w))
      .filter(col("graft_prev").isNotNull)
      .select(col("user_id"),
        expr("(graft_us - graft_prev) div 1000000L").as("gap_s"))
  }

  /** Per-group σ-outlier flags with EXACT integer arithmetic: a value v
    * in group g is an outlier iff (v − μ_g)² > sigmas²·σ_g² — evaluated
    * as (n·v − s1)² > sigmas²·(n·s2 − s1²) after multiplying through by
    * n², so only integer sums of the cent-scaled values are ever
    * compared: no float division, no engine-dependent rounding anywhere.
    * One map-side-combinable stats aggregation (one row per group) plus
    * a join back onto the scan. Returns the id/group/cents columns plus
    * `is_outlier`.
    *
    * Precision bound: the comparison runs in decimal(38,0), so it is
    * exact while n·|v_cents| (and hence every operand) stays below 10¹⁹
    * — ample for monetary data, but a group whose scaled magnitudes
    * breach it would, under Spark's default non-ANSI decimal overflow,
    * silently emit NULL flags. That failure mode is closed: an
    * overflowed operand on a non-null value raises a run-stopping error
    * instead of a null verdict (rescale the value column to proceed).
    */
  def outliers(events: DataFrame, idCol: String, groupCol: String,
               valCol: String, sigmas: Int): DataFrame = {
    require(sigmas > 0, s"sigmas must be positive, got $sigmas")
    val cents = expr(s"CAST(round($valCol * 100) AS BIGINT)")
    val rows = events.select(col(idCol).as("id"), col(groupCol).as("grp"),
      cents.as("v_cents"))
    val dec = col("v_cents").cast("decimal(38,0)")
    val stats = rows.groupBy(col("grp"))
      // count the VALUES (count(*) would inflate n when valCol has
      // nulls while s1/s2 sum only the non-null ones)
      .agg(count(col("v_cents")).cast("decimal(38,0)").as("graft_n"),
        sum(dec).cast("decimal(38,0)").as("graft_s1"),
        sum(dec * dec).cast("decimal(38,0)").as("graft_s2"))
    val lhs = pow2(col("graft_n") * col("v_cents").cast("decimal(38,0)") - col("graft_s1"))
    val rhs = lit(sigmas.toLong * sigmas) *
      (col("graft_n") * col("graft_s2") - pow2(col("graft_s1")))
    rows.join(stats, Seq("grp"))
      .select(col("id"), col("grp"), col("v_cents"),
        when(col("v_cents").isNotNull && (lhs.isNull || rhs.isNull),
          raise_error(lit("outliers: decimal(38,0) overflow — n*|v_cents| exceeds " +
            "10^19; rescale the value column")))
          .otherwise(lhs > rhs)
          .as("is_outlier"))
  }

  private def pow2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (c * c).cast("decimal(38,0)")

  /** Rolling active users (the DAU/WAU/MAU curve): for every date D
    * whose trailing `windowDays`-day window (D-windowDays+1 .. D]
    * saw at least one active user, that distinct-user count. Dates
    * with an empty window are ABSENT, not 0 — left-join a calendar
    * spine for a gap-free curve. Days bucket via `to_date`, i.e. in
    * the session timezone (graft entry points pin UTC); the cohort
    * operators use timezone-free epoch-day arithmetic instead, so mix
    * the two only under UTC.
    *
    * COUNT(DISTINCT) over a sliding range frame is not a window
    * aggregate Spark supports, and buffering per-day user sets in one
    * partition would not scale; instead each distinct (user, day)
    * activity row EXPLODES into the `windowDays` window-dates it
    * contributes to — a bounded ×windowDays expansion of the per-day
    * distinct pairs (not of raw events) — and one distinct-count
    * aggregation per window-date finishes the job. Shuffles: the
    * (user, day) distinct, then the count-distinct expand; both
    * map-side combinable. Only the trailing overhang needs clipping
    * (win_day = d + k with k >= 0 can never undershoot the data's
    * min day). Returns (win_day DATE, active_users).
    */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
                         windowDays: Int): DataFrame = {
    require(windowDays > 0, s"windowDays must be positive, got $windowDays")
    val ud = events
      .select(col(userCol).as("user_id"), to_date(col(tsCol)).as("d"))
      .distinct()
    val bounds = ud.agg(max(col("d")).as("graft_hi"))
    ud.select(col("user_id"),
        explode(expr(s"sequence(d, date_add(d, ${windowDays - 1}))")).as("win_day"))
      .crossJoin(broadcast(bounds))
      .filter(col("win_day") <= col("graft_hi"))
      .groupBy(col("win_day"))
      .agg(countDistinct(col("user_id")).as("active_users"))
  }

  /** First-order Markov transition matrix over per-user event streams:
    * for each consecutive pair in a user's (ts, tiebreak) order, count
    * the (from_type → to_type) transition and report its row-normalized
    * probability in basis points (HALF_UP integer rounding — both
    * engines agree bit-for-bit, no float division). `tieCol` breaks
    * equal timestamps deterministically (e.g. the event id).
    *
    * Scale shape: ONE user-keyed shuffle for the lead() window (the
    * same partitioning sessionize uses — at 100 TB this is the
    * unavoidable order-by-user pass), then two aggregations over the
    * event-type vocabulary, which is tiny by construction — both
    * map-side combinable, post-shuffle volume = |types|². The row
    * totals re-join on from_type: |types|-sized, broadcast by AQE.
    * Returns (from_type, to_type, n_trans, p_bp).
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val trans = events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val totals = trans.groupBy(col("from_type"))
      .agg(sum(col("n_trans")).as("graft_tot"))
    trans.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        expr("(20000 * n_trans + graft_tot) DIV (2 * graft_tot)").as("p_bp"))
  }

  /** First-order Markov next-event backtest: for every observed
    * transition, "predict" the modal next type of its source (highest
    * transition count, ties → lexicographically smallest type) and
    * score the hit rate per source type — the sanity check before
    * shipping a transition model as a recommender/prefetcher. The
    * model and the evaluation share ONE persisted transition pass
    * ([[graft.llm.CacheRegistry]]); the model is |types|²-bounded.
    *
    * Output: (from_type, predicted_type, n_total, n_hit, hit_bp),
    * hit_bp the HALF_UP basis-point hit rate.
    */
  def markovBacktest(events: DataFrame, userCol: String, tsCol: String,
                     typeCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val trans = graft.llm.CacheRegistry.persist(events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("from_type"), col("to_type")))
    val byFrom = org.apache.spark.sql.expressions.Window
      .partitionBy(col("from_type"))
      .orderBy(col("graft_n").desc, col("to_type"))
    val model = trans.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("graft_n"))
      .withColumn("graft_rk", row_number().over(byFrom))
      .filter(col("graft_rk") === 1)
      .select(col("from_type"), col("to_type").as("predicted_type"))
    trans.join(model, Seq("from_type"))
      .groupBy(col("from_type"))
      .agg(first(col("predicted_type")).as("predicted_type"),
        count(lit(1)).as("n_total"),
        sum(when(col("to_type") === col("predicted_type"), 1L).otherwise(0L)).as("n_hit"))
      .select(col("from_type"), col("predicted_type"), col("n_total"), col("n_hit"),
        expr("(20000 * n_hit + n_total) DIV (2 * n_total)").as("hit_bp"))
  }

  /** Pairwise association rules over per-user event-type baskets:
    * support / confidence / lift for every unordered type pair that at
    * least `minSupport` users share — the market-basket view of an
    * event log ("users who error also purchase?").
    *
    * The basket is the user's DISTINCT type set, so the per-user
    * self-join emits at most |types|² rows per user and the output is
    * |types|²-bounded regardless of event volume: two map-side-
    * combinable shuffles (distinct, pair groupBy) and constant-size
    * finishing joins. `lift_milli`'s cross-multiplied numerator is
    * promoted to decimal(38,0) — in BIGINT it wraps once
    * n_both·n_users exceeds ~9.2e15, well inside 100-TB territory.
    * All ratios are HALF_UP integers: support/confidence in basis
    * points, lift in milli-units (1000 = independent). Confidence is
    * DIRECTIONAL and both directions are emitted: `conf_ab_bp` is
    * P(b|a) and `conf_ba_bp` is P(a|b), with item_a < item_b
    * lexicographically.
    */
  def associationRules(events: DataFrame, userCol: String, typeCol: String,
                       minSupport: Long = 1L): DataFrame = {
    val baskets = graft.llm.CacheRegistry.persist(
      events.select(col(userCol).as("graft_u"), col(typeCol).as("graft_it"))
        .distinct())
    val nUsers = baskets.agg(
      count_distinct(col("graft_u")).as("graft_nu"))
    val itemN = baskets.groupBy(col("graft_it"))
      .agg(count(lit(1)).as("graft_ni"))
    // Apriori prune: a pair can only reach minSupport if BOTH items do,
    // so semi-join baskets against the frequent-item set before the
    // per-user pair join — a high-cardinality itemCol (URLs, SKUs) can't
    // go quadratic on items that could never survive the n_both filter.
    // Output is provably unchanged: n_both >= minSupport implies
    // n_a, n_b >= minSupport. Skipped at minSupport <= 1 (no-op prune).
    val pairable =
      if (minSupport <= 1L) baskets
      else baskets.join(
        itemN.filter(col("graft_ni") >= minSupport).select(col("graft_it")),
        Seq("graft_it"), "left_semi")
    pairable.as("x")
      .join(pairable.as("y"),
        col("x.graft_u") === col("y.graft_u") &&
          col("x.graft_it") < col("y.graft_it"))
      .groupBy(col("x.graft_it").as("item_a"), col("y.graft_it").as("item_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minSupport)
      .join(itemN.select(col("graft_it").as("item_a"), col("graft_ni").as("n_a")),
        Seq("item_a"))
      .join(itemN.select(col("graft_it").as("item_b"), col("graft_ni").as("n_b")),
        Seq("item_b"))
      .crossJoin(nUsers)
      .select(col("item_a"), col("item_b"), col("n_both"), col("n_a"), col("n_b"),
        expr("(20000 * n_both + graft_nu) DIV (2 * graft_nu)").as("support_bp"),
        expr("(20000 * n_both + n_a) DIV (2 * n_a)").as("conf_ab_bp"),
        expr("(20000 * n_both + n_b) DIV (2 * n_b)").as("conf_ba_bp"),
        expr("""CAST((2000 * CAST(n_both AS DECIMAL(38,0)) * graft_nu
                      + CAST(n_a AS DECIMAL(38,0)) * n_b)
                  DIV (2 * CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)""")
          .as("lift_milli"))
  }

  /** Last-touch attribution: each conversion event linked to the SAME
    * user's most recent touch event at-or-before it (ties at an
    * instant → greatest touch id), unattributed when the latest touch
    * is older than `horizonUs`. Runs on [[AsOfJoin.lookupLatest]]'s
    * merge-window formulation — one key shuffle + one sorted scan,
    * O(|conversions|+|touches|) rows, no per-pair blow-up — so the
    * lookback horizon is a row-local post-filter, not a range join.
    *
    * Output per conversion: (conv_id, userCol, conv_ts, touch_id,
    * touch_type, age_us) with NULL touch columns when unattributed.
    *
    * NULL user keys get equality-join semantics, not window-partition
    * semantics: the underlying window groups NULL keys into one
    * partition, which would attribute a NULL-user conversion to a
    * NULL-user touch. Touches with a NULL key are filtered up front, so
    * an anonymous conversion is always emitted UNATTRIBUTED (exactly
    * what `t.user_id = c.user_id` yields in the quadratic formulation).
    */
  def lastTouchAttribution(events: DataFrame, userCol: String, tsCol: String,
                           idCol: String, typeCol: String, convType: String,
                           touchTypes: Seq[String], horizonUs: Long): DataFrame = {
    require(horizonUs > 0, s"horizonUs must be positive, got $horizonUs")
    val conversions = events.filter(col(typeCol) === convType)
      .select(col(idCol).as("conv_id"), col(userCol), col(tsCol).as("conv_ts"))
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .filter(col(userCol).isNotNull)
      .select(col(userCol), col(tsCol).as("graft_tts"),
        col(idCol).as("touch_id"), col(typeCol).as("touch_type"))
    val within = col("graft_tts").isNotNull &&
      expr("unix_micros(graft_tts)") >= expr("unix_micros(conv_ts)") - lit(horizonUs)
    AsOfJoin.lookupLatest(conversions, userCol, "conv_ts",
        touches, userCol, "graft_tts", Seq("touch_id", "graft_tts", "touch_type"))
      .select(col("conv_id"), col(userCol), col("conv_ts"),
        when(within, col("touch_id")).as("touch_id"),
        when(within, col("touch_type")).as("touch_type"),
        when(within,
          expr("unix_micros(conv_ts)") - expr("unix_micros(graft_tts)"))
          .as("age_us"))
  }

  /** Schema-on-read stats over a semi-structured JSON column: extract
    * one integer property by JSONPath (`get_json_object`, codegen'd —
    * no UDF, no upfront schema) and aggregate it per group. Events with
    * a missing/non-numeric property are counted (`n_missing`) but
    * excluded from the numeric stats; `mean_centi` is the HALF_UP
    * integer mean ×100 so both engines agree bit-for-bit.
    *
    * One map-side-combinable shuffle on the group key; the JSON parse
    * runs row-local inside whole-stage codegen, so the pass scales
    * linearly with the event log and never materializes a parsed
    * struct column.
    */
  def jsonPropStats(events: DataFrame, groupCol: String, jsonCol: String,
                    path: String): DataFrame = {
    require(path.startsWith("$") && !path.contains("'") && !path.contains("\\"),
      s"path must be a quote- and backslash-free JSONPath starting at $$: $path")
    require(!jsonCol.contains("`"),
      s"jsonCol must not contain backticks: $jsonCol")
    events
      .select(col(groupCol),
        // try_cast, not cast: a non-numeric property value must count
        // as missing, not abort the job under ANSI mode
        expr(s"try_cast(get_json_object(`$jsonCol`, '$path') AS BIGINT)")
          .as("graft_v"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("graft_v")).as("n_with_prop"),
        coalesce(sum(col("graft_v")), lit(0L)).as("sum_prop"),
        min(col("graft_v")).as("min_prop"),
        max(col("graft_v")).as("max_prop"))
      .select(col(groupCol), col("n_events"),
        (col("n_events") - col("n_with_prop")).as("n_missing"),
        col("sum_prop"), col("min_prop"), col("max_prop"),
        // signed HALF_UP (the (2x+y) DIV (2y) trick is only HALF_UP for
        // x >= 0) with the sum promoted to decimal(38,0): 200·sum wraps
        // BIGINT once a group's property mass passes ~4.6e16
        when(col("n_with_prop") > 0, expr(
          """CAST(CASE WHEN sum_prop < 0 THEN -1 ELSE 1 END *
            |  ((200 * abs(CAST(sum_prop AS DECIMAL(38,0))) + n_with_prop)
            |    DIV (2 * n_with_prop)) AS BIGINT)""".stripMargin))
          .as("mean_centi"))
  }

  /** Day-of-week periodicity profile per event type: one cell per
    * (type, dow 0–6, Sunday = 0 — DuckDB's convention, Spark's
    * `dayofweek` minus 1) with the count and its HALF_UP share of the
    * type's events — the seasonal signature that decides batch-window
    * placement and flags types whose traffic is automation (flat
    * profile) vs human (weekday hump). One map-side-combinable shuffle
    * to the |types|·7-bounded cell table (persisted — it feeds the
    * totals and the final join).
    */
  def dowProfile(events: DataFrame, typeCol: String, tsCol: String): DataFrame = {
    val cells = graft.llm.CacheRegistry.persist(events
      .select(col(typeCol), (dayofweek(col(tsCol)) - 1).cast("long").as("dow"))
      .groupBy(col(typeCol), col("dow"))
      .agg(count(lit(1)).as("n_events")))
    val totals = cells.groupBy(col(typeCol)).agg(sum(col("n_events")).as("graft_tot"))
    cells.join(totals, Seq(typeCol))
      .select(col(typeCol), col("dow"), col("n_events"),
        expr("(20000 * n_events + graft_tot) DIV (2 * graft_tot)").as("share_bp"))
  }

  /** Daily burst report per event type: each PRESENT day's count
    * against the trailing window of up to `trail` preceding present
    * days (rows-based — absent days don't dilute the baseline, the
    * convention monitoring systems use for sparse series). Emits every
    * (type, day) with `rate_ratio_bp` = HALF_UP(10⁴ · n · trail_days /
    * trail_sum) — >10000 means above trailing mean — NULL for the
    * first day of a type (no baseline), plus `is_burst` at the
    * caller's threshold. Integer-exact end to end.
    *
    * Scale shape: one map-side-combinable shuffle to the (type, day)
    * daily table — |types|·|days| rows, tiny at any corpus size — then
    * driver-free windows over it. The raw corpus is never windowed.
    */
  def burstDays(events: DataFrame, typeCol: String, tsCol: String,
                trail: Int = 7, thresholdBp: Long = 30000L): DataFrame = {
    require(trail >= 1, s"trail must be >= 1, got $trail")
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .select(col(typeCol), to_date(col(tsCol)).as("day"))
      .groupBy(col(typeCol), col("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col(typeCol)).orderBy(col("day"))
      .rowsBetween(-trail, -1)
    daily
      .withColumn("trail_sum", sum(col("n_events")).over(w))
      .withColumn("trail_days", count(lit(1)).over(w))
      .withColumn("rate_ratio_bp", expr(
        "CASE WHEN trail_days > 0 THEN " +
          "(20000 * n_events * trail_days + trail_sum) DIV (2 * trail_sum) END"))
      .withColumn("is_burst",
        coalesce(col("rate_ratio_bp") >= thresholdBp, lit(false)))
      .select(col(typeCol), col("day"), col("n_events"),
        coalesce(col("trail_sum"), lit(0L)).as("trail_sum"),
        col("trail_days"), col("rate_ratio_bp"), col("is_burst"))
  }

  /** Benford first-digit profile per group — the classic
    * fabricated-data / unit-mixup tripwire (Benford 1938; auditors'
    * first test): counts of each first significant digit of the
    * integer value column vs the Benford expectation, with the
    * per-digit deviation in basis points. The expected shares are the
    * standard integer bp table (3010, 1761, 1249, 969, 792, 669, 580,
    * 512, 458 — log₁₀(1+1/d) rounded, summing to 10000), so the whole
    * report is float-free. Values whose |v| is 0 carry no significant
    * digit and are excluded. Output per (group, digit 1..9):
    * (n, obs_bp, exp_bp, dev_bp) — zero-count digits included via the
    * digit grid, so every group reports all 9 rows.
    *
    * One map-side-combinable count aggregation; everything after runs
    * on a |groups|·9-bounded table.
    */
  def benfordProfile(df: DataFrame, groupCol: String,
                     valCol: String): DataFrame = {
    val expBp = Seq(1 -> 3010L, 2 -> 1761L, 3 -> 1249L, 4 -> 969L,
      5 -> 792L, 6 -> 669L, 7 -> 580L, 8 -> 512L, 9 -> 458L)
    val s = df.sparkSession
    import s.implicits._
    val grid = expBp.map { case (d, e) => (d.toLong, e) }.toDF("digit", "exp_bp")
    val counts = df
      .select(col(groupCol),
        substring(abs(col(valCol).cast("long")).cast("string"), 1, 1)
          .cast("long").as("digit"))
      .filter(col("digit") >= 1)
      .groupBy(col(groupCol), col("digit"))
      .agg(count(lit(1)).as("n"))
    val groups = counts.groupBy(col(groupCol))
      .agg(sum(col("n")).as("graft_tot"))
    groups.crossJoin(broadcast(grid))
      .join(counts, Seq(groupCol, "digit"), "left")
      .select(col(groupCol), col("digit"),
        coalesce(col("n"), lit(0L)).as("n"),
        expr("(20000 * coalesce(n, 0L) + graft_tot) DIV (2 * graft_tot)")
          .as("obs_bp"),
        col("exp_bp"))
      .withColumn("dev_bp", abs(col("obs_bp") - col("exp_bp")))
  }

  /** Largest silent gap per group — the outage detector: the maximum
    * inter-event gap in whole seconds and WHEN it started (ties → the
    * earliest start), via one per-key lag window and a
    * map-side-combinable max_by — no per-group sort of gaps. Output:
    * (group, n_gaps, max_gap_s, gap_start).
    */
  def maxGapReport(df: DataFrame, groupCol: String, tsCol: String,
                   idCol: String): DataFrame = {
    df.select(col(groupCol), col(tsCol), col(idCol))
      .withColumn("graft_prev", expr(
        s"lag($tsCol, 1) OVER (PARTITION BY $groupCol ORDER BY $tsCol, $idCol)"))
      .filter(col("graft_prev").isNotNull)
      .withColumn("graft_gap", expr(
        s"(unix_micros($tsCol) - unix_micros(graft_prev)) DIV 1000000"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_gaps"),
        max(col("graft_gap")).as("max_gap_s"),
        max_by(col("graft_prev"),
          struct(col("graft_gap"), expr("-unix_micros(graft_prev)")))
          .as("gap_start"))
  }

  /** Inter-event timing statistics per group — burstiness profiling:
    * over consecutive-event gaps (whole seconds of the µs diff),
    * the arrival rate per hour and the squared coefficient of
    * variation CV² = (n·Σg² − (Σg)²)/(Σg)² in HALF_UP basis points —
    * CV² = 10000 is a Poisson process, far above means bursty, far
    * below means metronomic. Everything integer-exact (sums in
    * decimal(38,0): Σg² alone passes BIGINT on month-long spans at
    * corpus scale); groups with Σg = 0 (all gaps zero) report NULLs.
    * One per-key lag window (per-key sort), then a key rollup.
    * Output: (group, n_gaps, rate_per_hour_milli, cv2_bp).
    */
  def interEventStats(df: DataFrame, groupCol: String, tsCol: String,
                      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(tsCol), col(idCol))
    df.select(col(groupCol), col(tsCol), col(idCol))
      .withColumn("graft_gap", expr(
        s"(unix_micros($tsCol) - unix_micros(lag($tsCol, 1) OVER " +
          s"(PARTITION BY $groupCol ORDER BY $tsCol, $idCol))) DIV 1000000"))
      .filter(col("graft_gap").isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("graft_gap").cast("decimal(38,0)")).cast("decimal(38,0)")
          .as("graft_sg"),
        sum(col("graft_gap").cast("decimal(38,0)") * col("graft_gap"))
          .cast("decimal(38,0)").as("graft_sgg"))
      .select(col(groupCol), col("n_gaps"),
        when(col("graft_sg") > 0, expr(
          """CAST((2 * 3600000 * CAST(n_gaps AS DECIMAL(38,0)) + graft_sg)
            |  DIV (2 * graft_sg) AS BIGINT)""".stripMargin))
          .as("rate_per_hour_milli"),
        when(col("graft_sg") > 0, expr(
          """CAST((20000 * (CAST(n_gaps AS DECIMAL(38,0)) * graft_sgg
            |                - graft_sg * graft_sg)
            |       + graft_sg * graft_sg)
            |  DIV (2 * graft_sg * graft_sg) AS BIGINT)""".stripMargin))
          .as("cv2_bp"))
  }

  /** DAU/MAU stickiness — the engagement ratio every growth report
    * leads with: per calendar day, the distinct users active THAT day
    * over the distinct users active in the trailing `windowDays`
    * (28 = the industry convention), HALF_UP basis points. The MAU
    * side expands presence days ×windowDays via a bounded
    * calendar-interval join (presence is already distinct (user, day)
    * — the multiplier is the CALENDAR window, never the event count);
    * early days report over their partial window, the standard
    * reading. Output per day: (day, dau, mau, stickiness_bp).
    */
  def stickiness(df: DataFrame, userCol: String, tsCol: String,
                 windowDays: Int = 28): DataFrame = {
    require(windowDays >= 2, s"windowDays must be >= 2, got $windowDays")
    val presence = graft.llm.CacheRegistry.persist(df
      .select(col(userCol).as("graft_u"), to_date(col(tsCol)).as("day"))
      .distinct())
    val dau = presence.groupBy(col("day"))
      .agg(count(lit(1)).as("dau"))
    val grid = presence.agg(min(col("day")).as("graft_d0"),
        max(col("day")).as("graft_d1"))
      .select(explode(expr("sequence(graft_d0, graft_d1)")).as("day"))
    val mau = grid
      .join(presence.select(col("graft_u"), col("day").as("graft_p")),
        col("graft_p") <= col("day") &&
          col("graft_p") >= date_sub(col("day"), windowDays - 1))
      .groupBy(col("day"))
      .agg(countDistinct(col("graft_u")).as("mau"))
    dau.join(mau, Seq("day"))
      .withColumn("stickiness_bp",
        expr("(20000 * dau + mau) DIV (2 * mau)"))
  }

  /** Multiwindow SLO burn-rate report (the SRE-workbook alert): per
    * (group, hour), the error-budget burn rate over the last hour and
    * over the trailing `longHours` hours, in HALF_UP milli-multiples
    * of the budget (1000 = burning exactly at budget), and the alert
    * flag — fast burn AND slow burn both over their thresholds, the
    * standard two-window rule that ignores blips and catches fires.
    * burn = err_rate/budget = 10⁴·e/(n·budgetBp), cross-multiplied so
    * only the final milli rounds. The long window is a RANGE window
    * over the integer hour index (missing hours genuinely absent from
    * the trailing sums — range, not rows). One (group, hour)
    * aggregation; windows run per group over hour-bounded frames.
    * Output: (group, hour_idx, n, e, burn1_milli, burnl_milli, alert).
    */
  def sloBurn(df: DataFrame, groupCol: String, tsCol: String,
              flagCol: String, budgetBp: Long = 500L, longHours: Int = 6,
              fastThresholdMilli: Long = 14400L,
              slowThresholdMilli: Long = 6000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetBp >= 1 && budgetBp <= 10000, s"budgetBp bad: $budgetBp")
    require(longHours >= 2, s"longHours must be >= 2, got $longHours")
    // FLOOR hour bucketing (negative-safe CASE, the psiDrift idiom):
    // Spark DIV truncates toward zero, so a bare DIV would merge the
    // 1969-12-31 23:xx bucket into hour 0 and diverge from the
    // oracle's floor //
    val hourly = df
      .select(col(groupCol).as("graft_g"),
        expr(s"""CASE WHEN unix_micros($tsCol) >= 0
                 |THEN unix_micros($tsCol) DIV 3600000000
                 |ELSE -((-unix_micros($tsCol) + 3599999999) DIV 3600000000)
                 |END""".stripMargin).as("hour_idx"),
        col(flagCol).cast("long").as("graft_f"))
      .groupBy(col("graft_g"), col("hour_idx"))
      .agg(count(lit(1)).as("n"), sum(col("graft_f")).as("e"))
    val w = Window.partitionBy(col("graft_g")).orderBy(col("hour_idx"))
      .rangeBetween(-(longHours - 1).toLong, 0L)
    hourly
      .withColumn("graft_nl", sum(col("n")).over(w))
      .withColumn("graft_el", sum(col("e")).over(w))
      .withColumn("burn1_milli", expr(
        s"(2 * 10000000 * e + n * $budgetBp) DIV (2 * n * $budgetBp)"))
      .withColumn("burnl_milli", expr(
        s"""(2 * 10000000 * graft_el + graft_nl * $budgetBp)
           | DIV (2 * graft_nl * $budgetBp)""".stripMargin))
      .withColumn("alert",
        (col("burn1_milli") >= fastThresholdMilli &&
          col("burnl_milli") >= slowThresholdMilli).cast("long"))
      .select(col("graft_g").as(groupCol), col("hour_idx"), col("n"),
        col("e"), col("burn1_milli"), col("burnl_milli"), col("alert"))
  }

  /** Autocorrelation of daily counts per group at lags 1..maxLag — the
    * seasonality detector behind the seasonal-naive choice (a lag-7
    * peak SAYS weekly): exact Pearson correlation between the dense
    * series and its k-shifted self over the overlapping days, integer
    * sums throughout, the one irrational step (√(varx·vary)) taken as
    * floor-sqrt of the exact integer product (the q249 isqrt
    * precedent) before the HALF_UP milli divide. Zero-variance
    * overlaps emit NULL. The lag join runs on the |groups|·|days|
    * daily table against itself — calendar-bounded, after the one
    * row-scale daily count. Output per (group, lag):
    * (n_overlap, r_milli).
    */
  def autocorrelation(df: DataFrame, groupCol: String, tsCol: String,
                      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 366, s"maxLag in [1,366], got $maxLag")
    val spark = df.sparkSession
    import spark.implicits._
    val dense = graft.llm.CacheRegistry.persist(
      denseDailyCounts(df, groupCol, tsCol)
        .select(col("graft_g"), col("day"), col("y")))
    val lags = (1 to maxLag).map(_.toLong).toDF("lag")
    dense.crossJoin(broadcast(lags))
      .withColumn("graft_dj", expr("date_add(day, CAST(lag AS INT))"))
      .join(dense.select(col("graft_g"), col("day").as("graft_dj"),
        col("y").as("graft_yj")), Seq("graft_g", "graft_dj"))
      .groupBy(col("graft_g"), col("lag"))
      .agg(count(lit(1)).as("n_overlap"),
        sum(col("y")).as("graft_si"), sum(col("graft_yj")).as("graft_sj"),
        sum(col("y") * col("graft_yj")).as("graft_sij"),
        sum(col("y") * col("y")).as("graft_sii"),
        sum(col("graft_yj") * col("graft_yj")).as("graft_sjj"))
      .withColumn("graft_num",
        expr("n_overlap * graft_sij - graft_si * graft_sj"))
      .withColumn("graft_den", expr(
        """CAST(floor(sqrt(CAST((n_overlap * graft_sii - graft_si * graft_si)
          |  * (n_overlap * graft_sjj - graft_sj * graft_sj) AS DOUBLE))) AS BIGINT)"""
          .stripMargin))
      .select(col("graft_g").as(groupCol), col("lag"), col("n_overlap"),
        when(col("graft_den") > 0, expr(
          """CAST(sign(graft_num) AS BIGINT) *
            |((2000 * abs(graft_num) + graft_den) DIV (2 * graft_den))"""
            .stripMargin)).as("r_milli"))
  }

  /** Ordinary-least-squares trend of daily counts per group — the
    * "is this metric growing" number: slope over (day index x, daily
    * count y) as the exact rational (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²),
    * emitted in HALF_UP milli-counts-per-day. x is the day offset from
    * the group's first PRESENT day over the dense grid (absent days
    * count 0 — a metric that stops emitting is a falling trend, not a
    * missing one). All sums are exact integers; one daily count
    * aggregation, then |groups|·|days|-bounded arithmetic. Groups with
    * a single day are omitted (no slope). Output:
    * (group, n_days, slope_milli).
    */
  def dailyTrend(df: DataFrame, groupCol: String, tsCol: String): DataFrame = {
    denseDailyCounts(df, groupCol, tsCol)
      .select(col("graft_g"),
        datediff(col("day"), col("graft_d0")).cast("long").as("graft_x"),
        col("y").as("graft_y"))
      .groupBy(col("graft_g"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("graft_x")).as("graft_sx"),
        sum(col("graft_y")).as("graft_sy"),
        sum(col("graft_x") * col("graft_y")).as("graft_sxy"),
        sum(col("graft_x") * col("graft_x")).as("graft_sxx"))
      .filter(col("n_days") >= 2)
      .withColumn("slope_milli", expr(
        """CAST(sign(n_days * graft_sxy - graft_sx * graft_sy) AS BIGINT) *
          |((2000 * abs(n_days * graft_sxy - graft_sx * graft_sy)
          |    + (n_days * graft_sxx - graft_sx * graft_sx))
          |  DIV (2 * (n_days * graft_sxx - graft_sx * graft_sx)))"""
          .stripMargin))
      .select(col("graft_g").as(groupCol), col("n_days"), col("slope_milli"))
  }

  /** Mann–Kendall trend statistic S per group — the nonparametric
    * companion to [[dailyTrend]] (no linearity assumption, immune to
    * outlier days): S = Σ_{i<j} sign(yⱼ − yᵢ) over day-ordered daily
    * counts on the dense grid; S near +n(n−1)/2 ⇒ monotone rise. Exact
    * integer by construction. The pair join is |days|² per group —
    * bounded by the CALENDAR, not the corpus (a year is 66k pairs) —
    * after the one row-scale daily count. Output:
    * (group, n_days, s_stat, n_pairs).
    */
  def mannKendall(df: DataFrame, groupCol: String, tsCol: String): DataFrame = {
    val dense = denseDailyCounts(df, groupCol, tsCol)
      .select(col("graft_g"), col("day"), col("y").as("graft_y"))
    val a = dense.select(col("graft_g"), col("day").as("graft_di"),
      col("graft_y").as("graft_yi"))
    val b = dense.select(col("graft_g"), col("day").as("graft_dj"),
      col("graft_y").as("graft_yj"))
    a.join(b, Seq("graft_g"))
      .filter(col("graft_di") < col("graft_dj"))
      .groupBy(col("graft_g"))
      .agg(coalesce(sum(signum(col("graft_yj") - col("graft_yi"))
          .cast("long")), lit(0L)).as("s_stat"),
        count(lit(1)).as("n_pairs"))
      .join(dense.groupBy(col("graft_g")).agg(count(lit(1)).as("n_days")),
        Seq("graft_g"))
      .select(col("graft_g").as(groupCol), col("n_days"), col("s_stat"),
        col("n_pairs"))
  }

  /** Engaged time per (key, day) — the session-duration metric product
    * analytics actually reports: sum over consecutive same-day event
    * pairs of min(gap, idleCap) seconds, so staring at a tab for an
    * hour counts idleCap, not 3600 (the standard idle-capped
    * formulation). Whole seconds of the µs gap (floor); the lead
    * window partitions by (key, day) — per-key-day sorts, never
    * global. Output: (key, day, n_events, engaged_seconds).
    */
  def engagedTime(df: DataFrame, keyCol: String, tsCol: String,
                  idCol: String, idleCapS: Long = 300L): DataFrame = {
    require(idleCapS >= 1L, s"idleCapS must be >= 1, got $idleCapS")
    df.select(col(keyCol), col(tsCol), col(idCol),
        to_date(col(tsCol)).as("day"))
      .withColumn("graft_gap", expr(
        s"(unix_micros(lead($tsCol, 1) OVER (PARTITION BY $keyCol, day " +
          s"ORDER BY $tsCol, $idCol)) - unix_micros($tsCol)) DIV 1000000"))
      .groupBy(col(keyCol), col("day"))
      .agg(count(lit(1)).as("n_events"),
        // guard the NULL explicitly: least() IGNORES NULLs (on Spark
        // AND DuckDB), so an unguarded least(gap, cap) would credit
        // every day's LAST event a full idleCap of phantom engagement
        coalesce(sum(when(col("graft_gap").isNotNull,
          least(col("graft_gap"), lit(idleCapS))).otherwise(0L)), lit(0L))
          .as("engaged_seconds"))
  }

  /** Top user-journey trigrams: consecutive state triples per key in
    * time order, counted corpus-wide, deterministic top-k (count desc,
    * then the triple) — the "what do users actually do" sequence
    * report one step deeper than the [[transitionMatrix]] bigrams.
    * One per-key window sort (each key's own events, never a global
    * sort) feeding a map-side-combinable triple count; the top-k is a
    * TakeOrdered over the |distinct triples|-bounded count table.
    */
  def pathTrigrams(df: DataFrame, keyCol: String, tsCol: String,
                   stateCol: String, idCol: String, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK > 0, s"topK must be positive, got $topK")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    df.select(col(keyCol), col(tsCol), col(idCol),
        col(stateCol).as("s1"),
        lead(col(stateCol), 1).over(w).as("s2"),
        lead(col(stateCol), 2).over(w).as("s3"))
      .filter(col("s2").isNotNull && col("s3").isNotNull)
      .groupBy(col("s1"), col("s2"), col("s3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
      .limit(topK)
  }

  /** First-touch conversion latency quantiles: per key, the seconds
    * from its FIRST `fromState` event to its first `toState` event at
    * or after it; exact quantiles of those gaps from the
    * value-compressed gap histogram (the madOutlierReport rank idiom:
    * probe value = smallest gap whose cumulative count reaches
    * ⌈φ·n⌉). Row-scale work: two filtered min-aggregations and one
    * key-equi join; the quantile window runs over DISTINCT gap values
    * only. Output per probe: (q_bp, gap_seconds, n_pairs).
    */
  def conversionLatency(df: DataFrame, keyCol: String, tsCol: String,
                        stateCol: String, fromState: String,
                        toState: String, probesBp: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(probesBp.nonEmpty && probesBp.forall(p => p >= 0 && p <= 10000),
      s"probes must be bp in [0, 10000], got $probesBp")
    val f = df.filter(col(stateCol) === fromState)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("graft_f"))
    val gaps = df.filter(col(stateCol) === toState)
      .join(f, Seq(keyCol))
      .filter(col(tsCol) >= col("graft_f"))
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("graft_t"),
        first(col("graft_f")).as("graft_f"))
      // whole seconds of the µs DIFFERENCE (non-negative → trunc ≡
      // floor ≡ DuckDB's epoch_us diff // 1e6); per-operand
      // unix_timestamp would floor each side before subtracting
      .select(expr(
        "(unix_micros(graft_t) - unix_micros(graft_f)) DIV 1000000")
        .as("gap_s"))
    val hist = gaps.groupBy(col("gap_s")).agg(count(lit(1)).as("graft_n"))
    val tot = hist.agg(sum(col("graft_n")).as("n_pairs"))
    // single-group prefix sum over DISTINCT gaps (bounded by the gap
    // cardinality, not the corpus)
    val wv = Window.orderBy(col("gap_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("graft_cum", sum(col("graft_n")).over(wv))
      .crossJoin(broadcast(tot))
    val spark = df.sparkSession
    import spark.implicits._
    val probes = probesBp.toDF("q_bp")
    broadcast(probes).crossJoin(cum)
      .filter(col("graft_cum") * 10000 >= col("q_bp") * col("n_pairs"))
      .groupBy(col("q_bp"))
      .agg(min(col("gap_s")).as("gap_seconds"),
        first(col("n_pairs")).as("n_pairs"))
  }

  /** Seasonal-naive forecast backtest — the capacity-planning baseline
    * every fancier model must beat (Hyndman & Athanasopoulos, fpp3
    * §5.2): forecast for day d is the observed count at day d−season
    * on a DENSE per-group day grid (absent days count 0, so a quiet
    * week genuinely predicts a quiet week). Emits one row per
    * evaluable (group, day): actual n, forecast, |error| — all
    * integer-exact. The only row-scale work is the (group, day) count
    * aggregation (map-side combinable); the grid explode, lag window,
    * and error columns all run on the |groups|·|days|-bounded daily
    * table, so the lag's per-group sort never touches raw rows.
    */
  /** Dense per-group daily counts on the group's own calendar span —
    * the shared densification every daily-series operator here uses
    * (seasonal-naive, OLS trend, Mann–Kendall, autocorrelation), so
    * the convention (UTC to_date, absent days are REAL zeros, span =
    * [first present day, last present day]) lives in exactly one
    * place. Returns (graft_g, graft_d0, day, y).
    */
  private def denseDailyCounts(df: DataFrame, groupCol: String,
                               tsCol: String): DataFrame = {
    val daily = df
      .select(col(groupCol).as("graft_g"), to_date(col(tsCol)).as("day"))
      .groupBy(col("graft_g"), col("day"))
      .agg(count(lit(1)).as("graft_n"))
    val grid = daily.groupBy(col("graft_g"))
      .agg(min(col("day")).as("graft_d0"), max(col("day")).as("graft_d1"))
      .select(col("graft_g"), col("graft_d0"),
        explode(expr("sequence(graft_d0, graft_d1)")).as("day"))
    grid.join(daily, Seq("graft_g", "day"), "left")
      .select(col("graft_g"), col("graft_d0"), col("day"),
        coalesce(col("graft_n"), lit(0L)).as("y"))
  }

  def seasonalNaiveBacktest(df: DataFrame, groupCol: String, tsCol: String,
                            season: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(season >= 1, s"season must be >= 1, got $season")
    val w = Window.partitionBy(col("graft_g")).orderBy(col("day"))
    denseDailyCounts(df, groupCol, tsCol)
      .select(col("graft_g"), col("day"), col("y").as("n"))
      .withColumn("forecast", lag(col("n"), season).over(w))
      .filter(col("forecast").isNotNull)
      .withColumn("abs_err", abs(col("n") - col("forecast")))
      .select(col("graft_g").as(groupCol), col("day"), col("n"),
        col("forecast"), col("abs_err"))
  }

  /** CUSUM change-point per event type over its daily counts: with D
    * present days and total T, the scaled cumulative sum at day k is
    * Σ_{i≤k} (D·cᵢ − T) — integer-exact (the ×D clears the mean T/D) —
    * and the estimated change point is the day maximizing |cusum|
    * (ties → earliest day), the classic single-change-point estimator.
    * Output (type, n_days, cp_day, cusum_at_cp, cusum_abs_max).
    *
    * Same scale shape as [[burstDays]]: everything after the one daily
    * aggregation runs on the |types|·|days|-bounded table.
    */
  def cusumChangePoint(events: DataFrame, typeCol: String,
                       tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .select(col(typeCol), to_date(col(tsCol)).as("day"))
      .groupBy(col(typeCol), col("day"))
      .agg(count(lit(1)).as("n_events"))
    val wAll = Window.partitionBy(col(typeCol))
    val wCum = Window.partitionBy(col(typeCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wPick = Window.partitionBy(col(typeCol))
      .orderBy(col("cusum_abs").desc, col("day"))
    daily
      .withColumn("n_days", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("n_events")).over(wAll))
      .withColumn("cusum",
        sum(col("n_events") * col("n_days") - col("total")).over(wCum))
      .withColumn("cusum_abs", abs(col("cusum")))
      .withColumn("graft_rn", row_number().over(wPick))
      .filter(col("graft_rn") === 1)
      .select(col(typeCol), col("n_days"), col("day").as("cp_day"),
        col("cusum").as("cusum_at_cp"), col("cusum_abs").as("cusum_abs_max"))
  }
}
