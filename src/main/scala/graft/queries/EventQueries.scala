package graft.queries

import graft.operators.{AsOfJoin, EventAnalytics, RangeJoin, Sessionize}
import org.apache.spark.sql.functions._

/** Event-stream operators a training-data/analytics pipeline needs that
  * the reference lacks: gap sessionization and a distributed as-of join.
  * Both are single-shuffle window formulations (see the operator
  * Scaladocs for the scale argument).
  */
object EventQueries {
  import Registry.table

  val defs: Map[String, QueryDef] = Map(
    // ---- Sliding-frame rolling deviation: each event vs its user's last
    // 5 events. Fully integer (dev_scaled = cents*n - sum over the frame)
    // so the comparison is exact; one shuffle (the user_id window).
    "q60_rolling_deviation" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id")).rowsBetween(-4, 0)
        table(s, dir, "events")
          .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
          .select(col("event_id"), col("user_id"), col("cents"),
            sum(col("cents")).over(w).as("win_sum"),
            count(lit(1)).over(w).as("win_n"))
          .withColumn("dev_scaled", col("cents") * col("win_n") - col("win_sum"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, ts, CAST(round(value*100) AS BIGINT) AS cents FROM events)
             |SELECT event_id, user_id, cents,
             |  CAST(sum(cents) OVER w AS BIGINT) AS win_sum,
             |  CAST(count(*) OVER w AS BIGINT) AS win_n,
             |  CAST(cents * (count(*) OVER w) - (sum(cents) OVER w) AS BIGINT) AS dev_scaled
             |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // ---- Gap-based sessionization (30-minute inactivity split)
    "q48_sessionize" -> QueryDef(
      (s, dir) => {
        val ev = table(s, dir, "events")
          .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
        Sessionize.summarize(ev, "user_id", "ts", "event_id", 1800L * 1000000L,
            Seq(sum(col("cents")).as("total_cents")))
          .select(col("user_id"), col("session_seq").cast("long").as("session_seq"),
            col("n_events"), col("session_start"), col("session_end"), col("total_cents"))
          .orderBy("user_id", "session_seq")
      },
      Some("""WITH e AS (SELECT event_id, ts, user_id, CAST(round(value*100) AS BIGINT) AS cents FROM events),
             |g AS (SELECT e.*, CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (SELECT g.*, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq FROM g)
             |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, count(*) AS n_events,
             |       min(ts) AS session_start, max(ts) AS session_end, CAST(sum(cents) AS BIGINT) AS total_cents
             |FROM s GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin)),

    // ---- Band (interval) join: per event, how many other events the
    // same user produced within ±60 s. The bucketed-bin formulation
    // (RangeJoin Scaladoc) keeps a hot user's rows sharded by time.
    "q63_range_join" -> QueryDef(
      (s, dir) => {
        val ev = table(s, dir, "events")
        RangeJoin.countNeighbors(ev, ev, "user_id", "ts", "event_id", 60L * 1000000L)
          .orderBy("event_id")
      },
      Some("""SELECT a.event_id, a.user_id, a.ts,
             |  CAST(coalesce(sum(CASE WHEN b.event_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_nearby
             |FROM events a LEFT JOIN events b
             |  ON b.user_id = a.user_id AND b.event_id <> a.event_id
             | AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 60000000
             |GROUP BY a.event_id, a.user_id, a.ts
             |ORDER BY a.event_id""".stripMargin)),

    // ---- As-of join: latest order at or before each event, per user
    "q49_asof_join" -> QueryDef(
      (s, dir) => {
        val ev = table(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"))
        val ord = table(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        AsOfJoin.lookupLatest(ev, "user_id", "ts", ord, "o_custkey", "o_orderdate",
            Seq("o_orderkey", "o_orderdate"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (
             |  SELECT e.event_id, o.o_orderkey, o.o_orderdate,
             |         row_number() OVER (PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
             |  FROM events e JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
             |SELECT e.event_id, e.user_id, e.ts, p.o_orderkey, p.o_orderdate
             |FROM events e LEFT JOIN p ON p.event_id = e.event_id AND p.rn = 1
             |ORDER BY e.event_id""".stripMargin)),

    // ---- Ordered funnel view -> click -> purchase: one aggregate walk
    // per user over the time-sorted events (single shuffle), vs the
    // textbook one-join-per-stage chain the oracle runs.
    "q80_funnel" -> QueryDef(
      (s, dir) => {
        EventAnalytics.funnel(table(s, dir, "events"), "user_id", "ts", "event_type",
            Seq("view", "click", "purchase"))
          .orderBy("user_id")
      },
      Some("""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1),
             |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 ON s1.user_id = e.user_id
             |       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
             |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 ON s2.user_id = e.user_id
             |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1),
             |u AS (SELECT DISTINCT user_id FROM events)
             |SELECT u.user_id,
             |  CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
             |            WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage,
             |  epoch_us(t1) AS t0_us, epoch_us(t2) AS t1_us, epoch_us(t3) AS t2_us
             |FROM u LEFT JOIN s1 ON s1.user_id = u.user_id
             |       LEFT JOIN s2 ON s2.user_id = u.user_id
             |       LEFT JOIN s3 ON s3.user_id = u.user_id
             |ORDER BY u.user_id""".stripMargin)),

    // ---- Retention cohorts: users by epoch-day of first event, counted
    // on each later active day. Integer day arithmetic, no timezone.
    "q81_retention" -> QueryDef(
      (s, dir) => {
        EventAnalytics.retentionCohorts(table(s, dir, "events"), "user_id", "ts")
          .orderBy("cohort_day", "day_offset")
      },
      // FLOOR epoch-day division on both engines (// truncates toward
      // zero in DuckDB exactly like Spark's div, so the pmod form keeps
      // the two bit-identical even for pre-1970 timestamps)
      Some("""WITH e AS (SELECT user_id,
             |  (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000)
             |    // 86400000000 AS d FROM events),
             |f AS (SELECT user_id, min(d) AS cohort_day FROM e GROUP BY 1),
             |a AS (SELECT DISTINCT user_id, d AS active_day FROM e)
             |SELECT f.cohort_day, a.active_day - f.cohort_day AS day_offset,
             |       count(*) AS n_users
             |FROM a JOIN f ON f.user_id = a.user_id
             |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin)),

    // ---- Salted two-phase aggregation over genuinely skewed keys (5
    // event types across the whole table): spreading each hot key over
    // 16 salts must be value-identical to the plain group-by the oracle
    // runs — the correctness contract of the skew tool.
    "q87_salted_agg" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "events")
          .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        graft.llm.Skew.saltedAggregate(e, "event_type", 16,
            partials = Seq(count(lit(1)).as("pc"), sum(col("cents")).as("ps")),
            finals = Seq(sum(col("pc")).as("n_events"), sum(col("ps")).as("total_cents")))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n_events,
             |       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total_cents
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- Salted skew join: hot-keyed events against a 5-row dimension,
    // salt-spread on the big side, dim replicated per salt — row-for-row
    // identical to the plain join.
    "q88_salted_join" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "events").select(col("event_id"), col("event_type"))
        val dim = e.select(col("event_type")).distinct()
          .withColumn("type_len", length(col("event_type")).cast("long"))
        graft.llm.Skew.saltedJoin(e, dim, "event_type", 16)
          .select(col("event_id"), col("event_type"), col("type_len"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, event_type, CAST(length(event_type) AS BIGINT) AS type_len
             |FROM events ORDER BY event_id""".stripMargin)),

    // ---- Rolling 7-day active users (the WAU curve): each distinct
    // (user, day) pair explodes into the 7 window-dates it serves —
    // bounded ×7 on per-day distinct pairs, never on raw events — then
    // one distinct-count per window-date. No per-day user-set buffering.
    "q96_rolling_active_users" -> QueryDef(
      (s, dir) => {
        graft.operators.EventAnalytics.rollingActiveUsers(
            table(s, dir, "events"), "user_id", "ts", windowDays = 7)
          .orderBy("win_day")
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
             |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ud),
             |w AS (SELECT user_id, d + CAST(o AS INTEGER) AS win_day
             |      FROM ud, (SELECT unnest(range(0, 7)) AS o) os),
             |c AS (SELECT win_day, count(DISTINCT user_id) AS active_users
             |      FROM w GROUP BY win_day)
             |SELECT win_day, active_users FROM c, b
             |WHERE win_day BETWEEN b.lo AND b.hi ORDER BY win_day""".stripMargin)),

    // ---- Per-type 3σ outlier flags with pure-integer arithmetic:
    // (n·v − s1)² > 9·(n·s2 − s1²) — the σ test multiplied through by
    // n², so no float division or sqrt exists on either engine.
    "q98_value_outliers" -> QueryDef(
      (s, dir) => {
        graft.operators.EventAnalytics.outliers(
            table(s, dir, "events"), "event_id", "event_type", "value", sigmas = 3)
          .orderBy("id")
      },
      Some("""WITH r AS (SELECT event_id AS id, event_type AS grp,
             |                 CAST(round(value * 100) AS BIGINT) AS v_cents
             |          FROM events),
             |st AS (SELECT grp, CAST(count(*) AS HUGEINT) AS n,
             |              CAST(sum(v_cents) AS HUGEINT) AS s1,
             |              CAST(sum(CAST(v_cents AS HUGEINT) * v_cents) AS HUGEINT) AS s2
             |       FROM r GROUP BY grp)
             |SELECT id, grp, v_cents,
             |       ((n * v_cents - s1) * (n * v_cents - s1)) > 9 * (n * s2 - s1 * s1) AS is_outlier
             |FROM r JOIN st USING (grp) ORDER BY id""".stripMargin)),

    // ---- Inter-event gap distribution: per-user lag (one user-keyed
    // window) → whole-second gaps → power-of-two histogram. The curve
    // that calibrates session-gap thresholds.
    "q99_gap_histogram" -> QueryDef(
      (s, dir) => {
        val gaps = graft.operators.EventAnalytics.interEventGaps(
          table(s, dir, "events"), "user_id", "ts")
        graft.llm.Profiling.lengthHistogram(gaps, "gap_s")
          .select(col("bucket"), col("n_docs").as("n_gaps"),
            col("sum_chars").as("sum_gap_s"), col("min_chars").as("min_gap_s"),
            col("max_chars").as("max_gap_s"))
          .orderBy("bucket")
      },
      Some("""WITH g AS (SELECT user_id,
             |                 (epoch_us(ts) - lag(epoch_us(ts)) OVER
             |                    (PARTITION BY user_id ORDER BY epoch_us(ts))) // 1000000 AS gap_s
             |          FROM events),
             |gg AS (SELECT gap_s FROM g WHERE gap_s IS NOT NULL)
             |SELECT CAST(CASE WHEN gap_s <= 0 THEN 0 ELSE length(bin(gap_s)) END AS BIGINT) AS bucket,
             |       count(*) AS n_gaps, CAST(sum(gap_s) AS BIGINT) AS sum_gap_s,
             |       min(gap_s) AS min_gap_s, max(gap_s) AS max_gap_s
             |FROM gg GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // ---- First-order Markov transition matrix over per-user event
    // streams: one user-keyed window shuffle, then two tiny aggs over
    // the |types|^2 transition grid. Row probabilities in HALF_UP bp.
    "q152_event_transitions" -> QueryDef(
      (s, dir) => {
        graft.operators.EventAnalytics.transitionMatrix(
            table(s, dir, "events"), "user_id", "ts", "event_type", "event_id")
          .orderBy("from_type", "to_type")
      },
      Some("""WITH s AS (SELECT user_id, event_type AS from_type,
             |                 lead(event_type) OVER
             |                   (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |          FROM events),
             |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_trans
             |      FROM s WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
             |t AS (SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS tot
             |      FROM c GROUP BY from_type)
             |SELECT from_type, to_type, n_trans,
             |       (20000 * n_trans + tot) // (2 * tot) AS p_bp
             |FROM c JOIN t USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin)),

    // ---- PageRank over the event-type transition digraph (edges =
    // q152's transition counts): 8 integer-exact power iterations with
    // uniform dangling-mass redistribution — "which event type is the
    // behavioral sink" — the oracle unrolls the iterations as chained
    // CTEs (q156 precedent).
    "q160_event_pagerank" -> QueryDef(
      (s, dir) => {
        val edges = graft.operators.EventAnalytics.transitionMatrix(
            table(s, dir, "events"), "user_id", "ts", "event_type", "event_id")
          .select(col("from_type"), col("to_type"), col("n_trans"))
        graft.operators.GraphOps.pageRank(edges, "from_type", "to_type", "n_trans",
            iters = 8)
          .withColumnRenamed("node", "event_type")
          .orderBy("event_type")
      },
      Some(pageRankOracle(8))),

    // ---- Deterministic label-propagation communities over the same
    // transition graph: symmetrized weights, self-labels, 4 synchronous
    // max-weight/min-label rounds — the cheap community structure pass
    // before sampling or visualizing an event taxonomy.
    "q188_event_communities" -> QueryDef(
      (s, dir) => {
        val edges = graft.operators.EventAnalytics.transitionMatrix(
            table(s, dir, "events"), "user_id", "ts", "event_type", "event_id")
          .select(col("from_type"), col("to_type"), col("n_trans"))
        graft.operators.GraphOps.labelPropagation(edges, "from_type", "to_type",
            "n_trans", iters = 4)
          .withColumnRenamed("node", "event_type")
          .withColumnRenamed("label", "community")
          .orderBy("event_type")
      },
      Some(lpaOracle(4))),

    // ---- Per-node triangle counts + local clustering over the HOT
    // transition graph (per-from share > 2040 bp — the above-uniform
    // transitions): which event types sit in tightly-looping behavior
    // clusters. The operator's wedge join runs degree-ordered (the
    // √m-fan-out orientation); the triangle set itself is orientation-
    // independent, which is what the oracle checks.
    "q205_event_triangles" -> QueryDef(
      (s, dir) => {
        val edges = graft.operators.EventAnalytics.transitionMatrix(
            table(s, dir, "events"), "user_id", "ts", "event_type", "event_id")
          .filter(col("p_bp") > 2040)
        graft.operators.GraphOps.triangleCounts(edges, "from_type", "to_type")
          .withColumnRenamed("node", "event_type")
          .orderBy("event_type")
      },
      Some("""WITH s AS (SELECT user_id, event_type AS ft,
             |                 lead(event_type) OVER
             |                   (PARTITION BY user_id ORDER BY ts, event_id) AS tt
             |          FROM events),
             |c AS (SELECT ft, tt, CAST(count(*) AS BIGINT) AS n
             |      FROM s WHERE tt IS NOT NULL GROUP BY 1, 2),
             |t AS (SELECT ft, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY ft),
             |p AS (SELECT c.ft, c.tt, (20000 * n + tot) // (2 * tot) AS p_bp
             |      FROM c JOIN t USING (ft)),
             |und AS MATERIALIZED (SELECT DISTINCT least(ft, tt) AS a, greatest(ft, tt) AS b
             |       FROM p WHERE ft <> tt AND p_bp > 2040),
             |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS degree FROM
             |        (SELECT a AS n FROM und UNION ALL SELECT b AS n FROM und)
             |        GROUP BY n),
             |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM und e1
             |        JOIN und e2 ON e2.a = e1.b
             |        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
             |pn AS (SELECT n, CAST(count(*) AS BIGINT) AS nt FROM
             |       (SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
             |        UNION ALL SELECT z FROM tri) GROUP BY n)
             |SELECT deg.n AS event_type, degree,
             |       CAST(coalesce(pn.nt, 0) AS BIGINT) AS n_triangles,
             |       CASE WHEN degree < 2 THEN CAST(0 AS BIGINT)
             |            ELSE (40000 * coalesce(pn.nt, 0) + degree * (degree - 1))
             |                 // (2 * degree * (degree - 1)) END AS clustering_bp
             |FROM deg LEFT JOIN pn ON pn.n = deg.n
             |ORDER BY event_type""".stripMargin)),

    // ---- k-core peeling of the same hot-transition graph (k = 2,
    // 4 synchronous rounds — converged at these graph sizes): the
    // maximal subgraph where every event type keeps ≥ 2 hot neighbors,
    // the skeleton of the behavioral loop structure. The oracle
    // unrolls the identical rounds as MATERIALIZED CTEs.
    "q206_event_kcore" -> QueryDef(
      (s, dir) => {
        val edges = graft.operators.EventAnalytics.transitionMatrix(
            table(s, dir, "events"), "user_id", "ts", "event_type", "event_id")
          .filter(col("p_bp") > 2040)
        graft.operators.GraphOps.kCore(edges, "from_type", "to_type",
            k = 2, iters = 4)
          .withColumnRenamed("node", "event_type")
          .orderBy("event_type")
      },
      Some("""WITH s AS (SELECT user_id, event_type AS ft,
             |                 lead(event_type) OVER
             |                   (PARTITION BY user_id ORDER BY ts, event_id) AS tt
             |          FROM events),
             |c AS (SELECT ft, tt, CAST(count(*) AS BIGINT) AS n
             |      FROM s WHERE tt IS NOT NULL GROUP BY 1, 2),
             |t AS (SELECT ft, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY ft),
             |p AS (SELECT c.ft, c.tt, (20000 * n + tot) // (2 * tot) AS p_bp
             |      FROM c JOIN t USING (ft)),
             |e0 AS MATERIALIZED (SELECT DISTINCT least(ft, tt) AS a, greatest(ft, tt) AS b
             |      FROM p WHERE ft <> tt AND p_bp > 2040),
             |k1 AS (SELECT n FROM (SELECT n, count(*) AS d FROM
             |       (SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0) GROUP BY n)
             |       WHERE d >= 2),
             |e1 AS MATERIALIZED (SELECT e0.a, e0.b FROM e0
             |      JOIN k1 x ON x.n = e0.a JOIN k1 y ON y.n = e0.b),
             |k2 AS (SELECT n FROM (SELECT n, count(*) AS d FROM
             |       (SELECT a AS n FROM e1 UNION ALL SELECT b FROM e1) GROUP BY n)
             |       WHERE d >= 2),
             |e2 AS MATERIALIZED (SELECT e1.a, e1.b FROM e1
             |      JOIN k2 x ON x.n = e1.a JOIN k2 y ON y.n = e1.b),
             |k3 AS (SELECT n FROM (SELECT n, count(*) AS d FROM
             |       (SELECT a AS n FROM e2 UNION ALL SELECT b FROM e2) GROUP BY n)
             |       WHERE d >= 2),
             |e3 AS MATERIALIZED (SELECT e2.a, e2.b FROM e2
             |      JOIN k3 x ON x.n = e2.a JOIN k3 y ON y.n = e2.b),
             |k4 AS (SELECT n FROM (SELECT n, count(*) AS d FROM
             |       (SELECT a AS n FROM e3 UNION ALL SELECT b FROM e3) GROUP BY n)
             |       WHERE d >= 2),
             |e4 AS MATERIALIZED (SELECT e3.a, e3.b FROM e3
             |      JOIN k4 x ON x.n = e3.a JOIN k4 y ON y.n = e3.b)
             |SELECT n AS event_type, CAST(d AS BIGINT) AS degree FROM
             |(SELECT n, count(*) AS d FROM
             | (SELECT a AS n FROM e4 UNION ALL SELECT b FROM e4) GROUP BY n)
             |ORDER BY event_type""".stripMargin)),

    // ---- Day-of-week periodicity per event type (dow 0 = Sunday):
    // counts + HALF_UP shares — the seasonal signature behind batch-
    // window placement and bot-vs-human traffic triage.
    "q195_dow_profile" -> QueryDef(
      (s, dir) => {
        graft.operators.EventAnalytics.dowProfile(
            table(s, dir, "events"), "event_type", "ts")
          .orderBy("event_type", "dow")
      },
      Some("""WITH c AS (SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
             |                 CAST(count(*) AS BIGINT) AS n_events
             |          FROM events GROUP BY 1, 2),
             |t AS (SELECT event_type, CAST(sum(n_events) AS BIGINT) AS tot
             |      FROM c GROUP BY 1)
             |SELECT c.event_type, c.dow, c.n_events,
             |       (20000 * c.n_events + t.tot) // (2 * t.tot) AS share_bp
             |FROM c JOIN t USING (event_type)
             |ORDER BY c.event_type, c.dow""".stripMargin)),

    // ---- Daily burst report: each present day's count vs the trailing
    // ≤7 present days (rows-based — absent days don't dilute the
    // baseline); ratio in basis points, burst at ≥3× trailing mean.
    // Everything past the one (type, day) aggregation runs on a
    // |types|·|days|-bounded table.
    "q213_event_bursts" -> QueryDef(
      (s, dir) => {
        graft.operators.EventAnalytics.burstDays(
            table(s, dir, "events"), "event_type", "ts",
            trail = 7, thresholdBp = 30000L)
          .orderBy("event_type", "day")
      },
      Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |                  CAST(count(*) AS BIGINT) AS n_events
             |           FROM events GROUP BY 1, 2),
             |w AS (SELECT event_type, day, n_events,
             |             CAST(coalesce(sum(n_events) OVER tw, 0) AS BIGINT) AS trail_sum,
             |             CAST(count(*) OVER tw AS BIGINT) AS trail_days
             |      FROM d WINDOW tw AS (PARTITION BY event_type ORDER BY day
             |             ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
             |SELECT event_type, day, n_events, trail_sum, trail_days,
             |       CAST(CASE WHEN trail_days > 0
             |            THEN (20000 * n_events * trail_days + trail_sum) // (2 * trail_sum)
             |            END AS BIGINT) AS rate_ratio_bp,
             |       coalesce(CASE WHEN trail_days > 0
             |            THEN (20000 * n_events * trail_days + trail_sum) // (2 * trail_sum)
             |            END >= 30000, false) AS is_burst
             |FROM w ORDER BY event_type, day""".stripMargin)),

    // ---- CUSUM single change-point per type: scaled cumulative sum
    // Σ(D·cᵢ − T) over the daily counts (×D clears the mean exactly —
    // no floats), change point = argmax |cusum|, ties → earliest day.
    "q214_cusum_changepoint" -> QueryDef(
      (s, dir) => {
        graft.operators.EventAnalytics.cusumChangePoint(
            table(s, dir, "events"), "event_type", "ts")
          .orderBy("event_type")
      },
      Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |                  CAST(count(*) AS BIGINT) AS n_events
             |           FROM events GROUP BY 1, 2),
             |s AS (SELECT event_type, day, n_events,
             |             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days,
             |             CAST(sum(n_events) OVER (PARTITION BY event_type) AS BIGINT) AS total
             |      FROM d),
             |c AS (SELECT event_type, day, n_days,
             |             CAST(sum(n_events * n_days - total) OVER
             |               (PARTITION BY event_type ORDER BY day
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cusum
             |      FROM s),
             |r AS (SELECT event_type, n_days, day, cusum, abs(cusum) AS cusum_abs,
             |             row_number() OVER (PARTITION BY event_type
             |               ORDER BY abs(cusum) DESC, day) AS rn
             |      FROM c)
             |SELECT event_type, n_days, day AS cp_day, cusum AS cusum_at_cp,
             |       cusum_abs AS cusum_abs_max
             |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin)),

    // ---- Benford first-digit profile of value cents per type: digit
    // counts vs the integer-bp Benford table (fraud / unit-mixup
    // tripwire). Uniform synthetic values deviate hard — that IS the
    // report. Bounded |types|·9 output, one count aggregation.
    "q223_benford_profile" -> QueryDef(
      (s, dir) => {
        graft.operators.EventAnalytics.benfordProfile(
            table(s, dir, "events")
              .withColumn("cents", round(col("value") * 100).cast("long")),
            "event_type", "cents")
          .orderBy("event_type", "digit")
      },
      Some("""WITH v AS (SELECT event_type,
             |                  CAST(substr(CAST(abs(CAST(round(value * 100) AS BIGINT)) AS VARCHAR), 1, 1) AS BIGINT) AS digit
             |           FROM events),
             |c AS (SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n
             |      FROM v WHERE digit >= 1 GROUP BY 1, 2),
             |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1),
             |g AS (SELECT * FROM (VALUES (1, 3010), (2, 1761), (3, 1249), (4, 969),
             |                            (5, 792), (6, 669), (7, 580), (8, 512),
             |                            (9, 458)) e(digit, exp_bp))
             |SELECT t.event_type, CAST(g.digit AS BIGINT) AS digit,
             |       CAST(coalesce(c.n, 0) AS BIGINT) AS n,
             |       CAST((20000 * coalesce(c.n, 0) + t.tot) // (2 * t.tot) AS BIGINT) AS obs_bp,
             |       CAST(g.exp_bp AS BIGINT) AS exp_bp,
             |       CAST(abs((20000 * coalesce(c.n, 0) + t.tot) // (2 * t.tot) - g.exp_bp) AS BIGINT) AS dev_bp
             |FROM t CROSS JOIN g
             |LEFT JOIN c ON c.event_type = t.event_type AND c.digit = g.digit
             |ORDER BY t.event_type, digit""".stripMargin)),

    // ---- Seasonal-naive backtest: forecast each day's event count per
    // type with the count 7 days earlier on a dense day grid (absent
    // days are real zeros); per-day integer |error|. The baseline any
    // forecaster must beat.
    "q225_seasonal_backtest" -> QueryDef(
      (s, dir) => {
        graft.operators.EventAnalytics.seasonalNaiveBacktest(
            table(s, dir, "events"), "event_type", "ts", season = 7)
          .orderBy("event_type", "day")
      },
      Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |                  CAST(count(*) AS BIGINT) AS n
             |           FROM events GROUP BY 1, 2),
             |s AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM d GROUP BY 1),
             |g AS (SELECT event_type,
             |             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
             |      FROM s),
             |f AS (SELECT g.event_type, g.day, coalesce(d.n, 0) AS n,
             |             lag(coalesce(d.n, 0), 7) OVER
             |               (PARTITION BY g.event_type ORDER BY g.day) AS forecast
             |      FROM g LEFT JOIN d USING (event_type, day))
             |SELECT event_type, day, CAST(n AS BIGINT) AS n,
             |       CAST(forecast AS BIGINT) AS forecast,
             |       CAST(abs(n - forecast) AS BIGINT) AS abs_err
             |FROM f WHERE forecast IS NOT NULL
             |ORDER BY event_type, day""".stripMargin)),

    // ---- Median/MAD robust outlier report on value cents per type —
    // exact integer medians from prefix sums over the value-compressed
    // histogram (never a row-scale sort), outlier at |v−med| > 3·MAD.
    "q226_mad_outliers" -> QueryDef(
      (s, dir) => {
        graft.llm.Profiling.madOutlierReport(
            table(s, dir, "events")
              .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)")),
            "event_type", "cents", kNum = 3L)
          .orderBy("event_type")
      },
      Some("""WITH h AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
             |                  CAST(count(*) AS BIGINT) AS n
             |           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
             |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot FROM h GROUP BY 1),
             |c AS (SELECT h.*, CAST(sum(n) OVER (PARTITION BY event_type ORDER BY v
             |                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM h),
             |m AS (SELECT c.event_type, min(v) AS median, min(tot) AS n_rows
             |      FROM c JOIN t USING (event_type)
             |      WHERE cum * 2 >= tot GROUP BY 1),
             |d AS (SELECT h.event_type, abs(h.v - m.median) AS dv,
             |             CAST(sum(h.n) AS BIGINT) AS n
             |      FROM h JOIN m USING (event_type) GROUP BY 1, 2),
             |dc AS (SELECT d.*, CAST(sum(n) OVER (PARTITION BY event_type ORDER BY dv
             |                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM d),
             |md AS (SELECT dc.event_type, min(dv) AS mad
             |       FROM dc JOIN m USING (event_type)
             |       WHERE cum * 2 >= n_rows GROUP BY 1)
             |SELECT h.event_type, min(m.n_rows) AS n_rows, min(m.median) AS median,
             |       min(md.mad) AS mad,
             |       CAST(coalesce(sum(CASE WHEN abs(h.v - m.median) > 3 * md.mad
             |                              THEN h.n ELSE 0 END), 0) AS BIGINT) AS n_outliers
             |FROM h JOIN m USING (event_type) JOIN md USING (event_type)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- Largest silent gap per type and when it started — the
    // outage report; one lag window + a max_by, earliest-start ties.
    "q260_max_gap" -> QueryDef(
      (s, dir) => {
        graft.operators.EventAnalytics.maxGapReport(
            table(s, dir, "events"), "event_type", "ts", "event_id")
          .orderBy("event_type")
      },
      Some("""WITH g AS (SELECT event_type, ts, lag(ts) OVER
             |             (PARTITION BY event_type ORDER BY ts, event_id) AS prev
             |           FROM events),
             |h AS (SELECT event_type,
             |             (epoch_us(ts) - epoch_us(prev)) // 1000000 AS gap, prev
             |      FROM g WHERE prev IS NOT NULL),
             |r AS (SELECT h.*, row_number() OVER (PARTITION BY event_type
             |               ORDER BY gap DESC, prev) AS rn,
             |             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_gaps
             |      FROM h)
             |SELECT event_type, n_gaps, CAST(gap AS BIGINT) AS max_gap_s,
             |       prev AS gap_start
             |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin)),

    // ---- Behavioral diversity: Shannon entropy of each user's
    // event-type mix in exact micro-nats (once-rounded logs) — 0 for
    // single-minded users, ln K for uniform explorers.
    "q257_behavior_entropy" -> QueryDef(
      (s, dir) => {
        graft.llm.Profiling.groupEntropy(
            table(s, dir, "events"), "user_id", "event_type")
          .orderBy("user_id")
      },
      Some("""WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
             |           FROM events
             |           WHERE user_id IS NOT NULL AND event_type IS NOT NULL
             |           GROUP BY 1, 2),
             |a AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n_rows,
             |             CAST(count(*) AS BIGINT) AS n_distinct,
             |             CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT)) AS BIGINT) AS s
             |      FROM c GROUP BY 1)
             |SELECT user_id, n_rows, n_distinct,
             |       CAST(CAST(round(ln(CAST(n_rows AS DOUBLE)) * 1000000.0) AS BIGINT)
             |            - (2 * s + n_rows) // (2 * n_rows) AS BIGINT) AS entropy_micro
             |FROM a ORDER BY user_id""".stripMargin)),

    // ---- Inter-event burstiness per type: arrival rate per hour and
    // CV² of gaps in bp (10000 = Poisson; above = bursty) — exact
    // integer sums, floor-second gaps.
    "q258_burstiness" -> QueryDef(
      (s, dir) => {
        graft.operators.EventAnalytics.interEventStats(
            table(s, dir, "events"), "event_type", "ts", "event_id")
          .orderBy("event_type")
      },
      Some("""WITH g AS (SELECT event_type,
             |                  (epoch_us(ts) - epoch_us(lag(ts) OVER
             |                    (PARTITION BY event_type ORDER BY ts, event_id)))
             |                  // 1000000 AS gap
             |           FROM events),
             |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
             |             sum(CAST(gap AS HUGEINT)) AS sg,
             |             sum(CAST(gap AS HUGEINT) * gap) AS sgg
             |      FROM g WHERE gap IS NOT NULL GROUP BY 1)
             |SELECT event_type, n_gaps,
             |       CAST(CASE WHEN sg > 0 THEN
             |         (2 * 3600000 * CAST(n_gaps AS HUGEINT) + sg) // (2 * sg)
             |       ELSE NULL END AS BIGINT) AS rate_per_hour_milli,
             |       CAST(CASE WHEN sg > 0 THEN
             |         (20000 * (CAST(n_gaps AS HUGEINT) * sgg - sg * sg) + sg * sg)
             |           // (2 * sg * sg)
             |       ELSE NULL END AS BIGINT) AS cv2_bp
             |FROM a ORDER BY event_type""".stripMargin)),

    // ---- DAU/MAU-28 stickiness per day — the growth-engagement ratio;
    // calendar-interval presence join, partial early windows reported
    // as-is.
    "q259_stickiness" -> QueryDef(
      (s, dir) => {
        graft.operators.EventAnalytics.stickiness(
            table(s, dir, "events"), "user_id", "ts", windowDays = 28)
          .orderBy("day")
      },
      Some("""WITH p AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events),
             |d AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM p GROUP BY 1),
             |s0 AS (SELECT min(day) AS d0, max(day) AS d1 FROM p),
             |g AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
             |      FROM s0),
             |m AS (SELECT g.day, CAST(count(DISTINCT p.u) AS BIGINT) AS mau
             |      FROM g JOIN p ON p.day <= g.day AND p.day >= g.day - 27
             |      GROUP BY 1)
             |SELECT d.day, d.dau, m.mau,
             |       CAST((20000 * dau + mau) // (2 * mau) AS BIGINT) AS stickiness_bp
             |FROM d JOIN m USING (day) ORDER BY day""".stripMargin)),

    // ---- Multiwindow SLO burn rate per (type, hour): share of
    // high-value events (> 200.00) against a 5% budget, 1h fast burn +
    // trailing-6h slow burn (RANGE window — absent hours truly
    // absent), alert on the 14.4×/6× two-window rule.
    "q256_slo_burn" -> QueryDef(
      (s, dir) => {
        graft.operators.EventAnalytics.sloBurn(
            table(s, dir, "events")
              .withColumn("is_hi",
                (expr("CAST(round(value * 100) AS BIGINT)") > 20000L)
                  .cast("long")),
            "event_type", "ts", "is_hi", budgetBp = 500L, longHours = 6)
          .orderBy("event_type", "hour_idx")
      },
      Some("""WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour_idx,
             |                  CAST(count(*) AS BIGINT) AS n,
             |                  CAST(sum(CASE WHEN round(value * 100) > 20000
             |                           THEN 1 ELSE 0 END) AS BIGINT) AS e
             |           FROM events GROUP BY 1, 2),
             |w AS (SELECT h.*, CAST(sum(n) OVER win AS BIGINT) AS nl,
             |             CAST(sum(e) OVER win AS BIGINT) AS el
             |      FROM h WINDOW win AS (PARTITION BY event_type ORDER BY hour_idx
             |                            RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)),
             |q AS (SELECT event_type, CAST(hour_idx AS BIGINT) AS hour_idx, n, e,
             |             CAST((2 * 10000000 * e + n * 500) // (2 * n * 500) AS BIGINT) AS burn1_milli,
             |             CAST((2 * 10000000 * el + nl * 500) // (2 * nl * 500) AS BIGINT) AS burnl_milli
             |      FROM w)
             |SELECT q.*, CAST(CASE WHEN burn1_milli >= 14400 AND burnl_milli >= 6000
             |                 THEN 1 ELSE 0 END AS BIGINT) AS alert
             |FROM q ORDER BY event_type, hour_idx""".stripMargin)),

    // ---- Autocorrelation of daily counts per type at lags 1..7 — the
    // seasonality detector (a lag-7 peak says weekly); exact integer
    // Pearson with the one floor-sqrt, NULL on zero-variance overlaps.
    "q253_autocorrelation" -> QueryDef(
      (s, dir) => {
        graft.operators.EventAnalytics.autocorrelation(
            table(s, dir, "events"), "event_type", "ts", maxLag = 7)
          .orderBy("event_type", "lag")
      },
      Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |                  CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
             |s0 AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM d GROUP BY 1),
             |g AS (SELECT event_type,
             |             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
             |      FROM s0),
             |v AS (SELECT g.event_type, g.day, coalesce(d.n, 0) AS y
             |      FROM g LEFT JOIN d USING (event_type, day)),
             |l AS (SELECT unnest(range(1, 8)) AS lag),
             |p AS (SELECT a.event_type, CAST(l.lag AS BIGINT) AS lag,
             |             a.y AS yi, b.y AS yj
             |      FROM v a CROSS JOIN l
             |      JOIN v b ON b.event_type = a.event_type
             |              AND b.day = a.day + CAST(l.lag AS INTEGER)),
             |a2 AS (SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n_overlap,
             |              CAST(sum(yi) AS BIGINT) AS si, CAST(sum(yj) AS BIGINT) AS sj,
             |              CAST(sum(yi * yj) AS BIGINT) AS sij,
             |              CAST(sum(yi * yi) AS BIGINT) AS sii,
             |              CAST(sum(yj * yj) AS BIGINT) AS sjj
             |       FROM p GROUP BY 1, 2),
             |q AS (SELECT a2.*, n_overlap * sij - si * sj AS num,
             |             CAST(floor(sqrt(CAST((n_overlap * sii - si * si)
             |               * (n_overlap * sjj - sj * sj) AS DOUBLE))) AS BIGINT) AS den
             |      FROM a2)
             |SELECT event_type, lag, n_overlap,
             |       CAST(CASE WHEN den > 0 THEN CAST(sign(num) AS BIGINT) *
             |              ((2000 * abs(num) + den) // (2 * den))
             |            ELSE NULL END AS BIGINT) AS r_milli
             |FROM q ORDER BY event_type, lag""".stripMargin)),

    // ---- Empirical-Bayes smoothed per-user error rates (prior
    // strength 20 pseudo-trials toward the global rate) — the
    // CTR-smoothing standard; 2-trial users stop reporting 0/10000 bp.
    "q254_smoothed_rates" -> QueryDef(
      (s, dir) => {
        graft.llm.Profiling.smoothedRates(
            table(s, dir, "events")
              .withColumn("is_err",
                (col("event_type") === "error").cast("long")),
            "user_id", "is_err", priorStrength = 20L)
          .orderBy("user_id")
      },
      Some("""WITH b AS (SELECT user_id,
             |                  CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS f
             |           FROM events),
             |g AS (SELECT CAST((20000 * sum(f) + count(*)) // (2 * count(*)) AS BIGINT) AS gbp
             |      FROM b),
             |k AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(f) AS BIGINT) AS x FROM b GROUP BY 1)
             |SELECT user_id, n, x,
             |       CAST((20000 * x + n) // (2 * n) AS BIGINT) AS raw_bp,
             |       CAST((2 * (10000 * x + 20 * gbp) + (n + 20))
             |            // (2 * (n + 20)) AS BIGINT) AS smoothed_bp
             |FROM k CROSS JOIN g ORDER BY user_id""".stripMargin)),

    // ---- Affinity index per (user, type): share-within-user over
    // global share in milli (1000 = neutral) — the over/under-
    // representation number, cross-multiplied so only the final
    // HALF_UP rounds.
    "q255_affinity_index" -> QueryDef(
      (s, dir) => {
        graft.llm.Profiling.affinityIndex(
            table(s, dir, "events"), "user_id", "event_type")
          .orderBy("user_id", "event_type")
      },
      Some("""WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS x
             |           FROM events GROUP BY 1, 2),
             |k AS (SELECT user_id, CAST(sum(x) AS BIGINT) AS n_key FROM c GROUP BY 1),
             |t AS (SELECT event_type, CAST(sum(x) AS BIGINT) AS xc FROM c GROUP BY 1),
             |tt AS (SELECT CAST(sum(x) AS BIGINT) AS tot FROM c)
             |SELECT c.user_id, c.event_type, k.n_key, c.x,
             |       CAST((2000 * x * tot + n_key * xc)
             |            // (2 * n_key * xc) AS BIGINT) AS index_milli
             |FROM c JOIN k USING (user_id) JOIN t USING (event_type) CROSS JOIN tt
             |ORDER BY user_id, event_type""".stripMargin)),

    // ---- Chi-square independence cells for event_type × day-of-week:
    // per-cell observed count and (OT−RC)²/(TRC) contribution in
    // HALF_UP micro — the association test with its driving cells
    // visible.
    "q250_chi_square" -> QueryDef(
      (s, dir) => {
        // Spark dayofweek is 1-based (Sunday=1), DuckDB's is 0-based —
        // the q195 dowProfile convention: shift to 0-based here
        graft.llm.Profiling.chiSquareCells(
            table(s, dir, "events")
              .withColumn("dow", (dayofweek(col("ts")) - 1).cast("long")),
            "event_type", "dow")
          .orderBy("event_type", "dow")
      },
      Some("""WITH c AS (SELECT event_type AS a, CAST(dayofweek(ts) AS BIGINT) AS b,
             |                  CAST(count(*) AS BIGINT) AS o
             |           FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
             |r AS (SELECT a, CAST(sum(o) AS BIGINT) AS rr FROM c GROUP BY 1),
             |cc AS (SELECT b, CAST(sum(o) AS BIGINT) AS ccol FROM c GROUP BY 1),
             |t AS (SELECT CAST(sum(o) AS BIGINT) AS tt FROM c)
             |SELECT c.a AS event_type, c.b AS dow, c.o,
             |       CAST(((2000000 * (CAST(o AS HUGEINT) * tt - CAST(rr AS HUGEINT) * ccol)
             |                      * (CAST(o AS HUGEINT) * tt - CAST(rr AS HUGEINT) * ccol))
             |             + (CAST(tt AS HUGEINT) * rr * ccol))
             |         // (2 * CAST(tt AS HUGEINT) * rr * ccol) AS BIGINT) AS contrib_micro
             |FROM c JOIN r USING (a) JOIN cc USING (b) CROSS JOIN t
             |ORDER BY event_type, dow""".stripMargin)),

    // ---- Gini coefficient of value cents per type — the inequality
    // number, exact over the value-compressed histogram (no row sort).
    "q251_gini" -> QueryDef(
      (s, dir) => {
        graft.llm.Profiling.giniCoefficient(
            table(s, dir, "events")
              .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)")),
            "event_type", "cents")
          .orderBy("event_type")
      },
      Some("""WITH h AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
             |                  CAST(count(*) AS BIGINT) AS c
             |           FROM events
             |           WHERE value IS NOT NULL AND round(value * 100) >= 0
             |           GROUP BY 1, 2),
             |w AS (SELECT h.*, CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v
             |                   ROWS UNBOUNDED PRECEDING) AS BIGINT) - c AS p FROM h),
             |a AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_rows,
             |             sum(CAST(v AS HUGEINT) * c) AS sx,
             |             sum(CAST(v AS HUGEINT) *
             |                 (CAST(c AS HUGEINT) * p + (c * (c + 1)) // 2)) AS si
             |      FROM w GROUP BY 1)
             |SELECT event_type, n_rows,
             |       CAST((20000 * abs(2 * si - (n_rows + 1) * sx)
             |             + (CAST(n_rows AS HUGEINT) * sx))
             |         // (2 * CAST(n_rows AS HUGEINT) * sx) AS BIGINT) AS gini_bp
             |FROM a WHERE sx > 0 ORDER BY event_type""".stripMargin)),

    // ---- Exact two-sample KS between the purchase and click cents
    // distributions — the bucketing-free companion to the q235 PSI;
    // cross-multiplied (division only at the final bp), with the
    // max-divergence value reported.
    "q252_ks_test" -> QueryDef(
      (s, dir) => {
        val ev = table(s, dir, "events")
          .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
        graft.llm.Profiling.ksStatistic(
            ev.filter(col("event_type") === "purchase"),
            ev.filter(col("event_type") === "click"), "cents")
          .orderBy("n_a")
      },
      Some("""WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
             |           FROM events WHERE value IS NOT NULL),
             |ha AS (SELECT v, CAST(count(*) AS BIGINT) AS ca FROM e
             |       WHERE event_type = 'purchase' GROUP BY 1),
             |hb AS (SELECT v, CAST(count(*) AS BIGINT) AS cb FROM e
             |       WHERE event_type = 'click' GROUP BY 1),
             |m AS (SELECT coalesce(ha.v, hb.v) AS v, coalesce(ca, 0) AS ca,
             |             coalesce(cb, 0) AS cb
             |      FROM ha FULL OUTER JOIN hb ON ha.v = hb.v),
             |c AS (SELECT m.*, CAST(sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cua,
             |             CAST(sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cub
             |      FROM m),
             |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b FROM m),
             |s AS (SELECT c.v, abs(CAST(cua AS HUGEINT) * t.n_b -
             |                      CAST(cub AS HUGEINT) * t.n_a) AS d,
             |             t.n_a, t.n_b
             |      FROM c CROSS JOIN t),
             |dm AS (SELECT max(d) AS dmx FROM s)
             |SELECT s.n_a, s.n_b,
             |       CAST((20000 * dm.dmx + CAST(s.n_a AS HUGEINT) * s.n_b)
             |         // (2 * CAST(s.n_a AS HUGEINT) * s.n_b) AS BIGINT) AS ks_bp,
             |       min(s.v) AS at_value
             |FROM s CROSS JOIN dm WHERE s.d = dm.dmx
             |GROUP BY 1, 2, 3""".stripMargin)),

    // ---- Neyman minimum-variance allocation of a 1000-row labeling
    // budget across event types by value-cents spread: n_h ∝ N_h·σ_h
    // via exact integer discriminants, isqrt, largest-remainder —
    // allocations sum EXACTLY to the budget.
    "q249_neyman_allocation" -> QueryDef(
      (s, dir) => {
        graft.llm.Curation.neymanAllocation(
            table(s, dir, "events")
              .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)")),
            "event_type", "cents", budget = 1000L)
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
             |           FROM events WHERE value IS NOT NULL),
             |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
             |             CAST(sum(c) AS BIGINT) AS sx,
             |             CAST(sum(c * c) AS BIGINT) AS sxx
             |      FROM e GROUP BY 1),
             |w AS (SELECT event_type, n_rows,
             |             CAST(floor(sqrt(CAST(n_rows * sxx - sx * sx AS DOUBLE))) AS BIGINT)
             |               AS neyman_weight
             |      FROM n),
             |t AS (SELECT greatest(CAST(sum(neyman_weight) AS BIGINT), 1) AS tw FROM w),
             |b AS (SELECT event_type, n_rows, neyman_weight,
             |             (1000 * neyman_weight) // tw AS base,
             |             (1000 * neyman_weight) % tw AS rem
             |      FROM w CROSS JOIN t),
             |lo AS (SELECT CAST(1000 - sum(base) AS BIGINT) AS leftover FROM b),
             |r AS (SELECT b.*, CAST(row_number() OVER (ORDER BY rem DESC, event_type)
             |               AS BIGINT) AS rk FROM b)
             |SELECT r.event_type, r.n_rows, r.neyman_weight,
             |       (20000 * r.neyman_weight + t.tw) // (2 * t.tw) AS share_bp,
             |       CAST(r.base + CASE WHEN r.rk <= lo.leftover THEN 1 ELSE 0 END
             |         AS BIGINT) AS allocated
             |FROM r CROSS JOIN lo CROSS JOIN t ORDER BY r.event_type""".stripMargin)),

    // ---- Leave-one-out target encoding of event_type by value cents —
    // the leak-free categorical feature ((Σ−own)/(n−1), HALF_UP milli);
    // singleton categories encode NULL.
    "q246_target_encoding" -> QueryDef(
      (s, dir) => {
        graft.llm.Profiling.targetEncoding(
            table(s, dir, "events")
              .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)")),
            "event_id", "event_type", "cents")
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, event_type,
             |                  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
             |s AS (SELECT event_type, CAST(sum(cents) AS BIGINT) AS sm,
             |             CAST(count(*) AS BIGINT) AS n_cat
             |      FROM e WHERE cents IS NOT NULL GROUP BY 1)
             |SELECT e.event_id, e.event_type, s.n_cat,
             |       CASE WHEN s.n_cat > 1 AND e.cents IS NOT NULL THEN
             |         CAST(CAST(sign(sm - cents) AS BIGINT) *
             |              ((2000 * abs(sm - cents) + (n_cat - 1))
             |                // (2 * (n_cat - 1))) AS BIGINT)
             |       ELSE NULL END AS loo_mean_milli
             |FROM e LEFT JOIN s USING (event_type) ORDER BY event_id""".stripMargin)),

    // ---- OLS slope of daily counts per type (dense grid, zeros real)
    // in milli-counts/day — the "is this metric growing" number, exact
    // integer sums.
    "q247_daily_trend" -> QueryDef(
      (s, dir) => {
        graft.operators.EventAnalytics.dailyTrend(
            table(s, dir, "events"), "event_type", "ts")
          .orderBy("event_type")
      },
      Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |                  CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
             |s0 AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM d GROUP BY 1),
             |g AS (SELECT event_type, d0,
             |             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
             |      FROM s0),
             |v AS (SELECT g.event_type,
             |             CAST(date_diff('day', g.d0, g.day) AS BIGINT) AS x,
             |             coalesce(d.n, 0) AS y
             |      FROM g LEFT JOIN d USING (event_type, day)),
             |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |             CAST(sum(x * y) AS BIGINT) AS sxy,
             |             CAST(sum(x * x) AS BIGINT) AS sxx
             |      FROM v GROUP BY 1)
             |SELECT event_type, n_days,
             |       CAST(CAST(sign(n_days * sxy - sx * sy) AS BIGINT) *
             |            ((2000 * abs(n_days * sxy - sx * sy) + (n_days * sxx - sx * sx))
             |              // (2 * (n_days * sxx - sx * sx))) AS BIGINT) AS slope_milli
             |FROM a WHERE n_days >= 2 ORDER BY event_type""".stripMargin)),

    // ---- Mann–Kendall S per type over the dense daily counts — the
    // nonparametric trend test, exact integer; |days|²-bounded pairs.
    "q248_mann_kendall" -> QueryDef(
      (s, dir) => {
        graft.operators.EventAnalytics.mannKendall(
            table(s, dir, "events"), "event_type", "ts")
          .orderBy("event_type")
      },
      Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |                  CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
             |s0 AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM d GROUP BY 1),
             |g AS (SELECT event_type,
             |             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
             |      FROM s0),
             |v AS (SELECT g.event_type, g.day, coalesce(d.n, 0) AS y
             |      FROM g LEFT JOIN d USING (event_type, day)),
             |p AS (SELECT a.event_type, CAST(sign(b.y - a.y) AS BIGINT) AS sg
             |      FROM v a JOIN v b ON a.event_type = b.event_type AND a.day < b.day),
             |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM v GROUP BY 1)
             |SELECT p.event_type, t.n_days,
             |       CAST(coalesce(sum(sg), 0) AS BIGINT) AS s_stat,
             |       CAST(count(*) AS BIGINT) AS n_pairs
             |FROM p JOIN t USING (event_type)
             |GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    // ---- Idle-capped engaged time per (user, day): Σ min(gap, 300 s)
    // over consecutive same-day events — the session-duration metric,
    // per-key-day windows only.
    "q245_engaged_time" -> QueryDef(
      (s, dir) => {
        graft.operators.EventAnalytics.engagedTime(
            table(s, dir, "events"), "user_id", "ts", "event_id",
            idleCapS = 300L)
          .orderBy("user_id", "day")
      },
      Some("""WITH e AS (SELECT user_id, ts, event_id, CAST(ts AS DATE) AS day FROM events),
             |g AS (SELECT e.*, (epoch_us(lead(ts) OVER (PARTITION BY user_id, day
             |                     ORDER BY ts, event_id)) - epoch_us(ts)) // 1000000 AS gap
             |      FROM e)
             |SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_events,
             |       CAST(coalesce(sum(CASE WHEN gap IS NULL THEN 0
             |                              ELSE least(gap, 300) END), 0) AS BIGINT) AS engaged_seconds
             |FROM g GROUP BY 1, 2 ORDER BY user_id, day""".stripMargin)),

    // ---- SCD2 dimension lookup: a 3-epoch rate history keyed on
    // event_type (epochs cut 10/20 days after the corpus min day)
    // joined valid-at each event's timestamp — the price/config
    // history join; broadcast dim, key equi-join + residual interval.
    "q239_scd2_lookup" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ev = table(s, dir, "events")
          .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
        val m = ev.agg(min(to_date(col("ts"))).as("graft_d0"))
        val epochs = Seq((1L, 0, 10), (2L, 10, 20), (3L, 20, 100000))
          .toDF("epoch_id", "graft_off_from", "graft_off_to")
        val dim = ev.select(col("event_type")).distinct()
          .crossJoin(broadcast(m)).crossJoin(broadcast(epochs))
          .select(col("event_type"), col("epoch_id"),
            to_timestamp(expr("date_add(graft_d0, graft_off_from)"))
              .as("valid_from"),
            to_timestamp(expr("date_add(graft_d0, graft_off_to)"))
              .as("valid_to"),
            (col("epoch_id") * 1000 + length(col("event_type")))
              .as("rate_milli"))
        graft.operators.Scd2.lookup(ev, dim, "event_type", "ts",
            "valid_from", "valid_to")
          .groupBy(col("event_type"), col("epoch_id"), col("rate_milli"))
          .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
          .orderBy("event_type", "epoch_id")
      },
      Some("""WITH m AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
             |e AS (SELECT event_type, ts,
             |             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
             |j AS (SELECT e.event_type, e.cents,
             |             CASE WHEN ts < d0 + INTERVAL 10 DAY THEN 1
             |                  WHEN ts < d0 + INTERVAL 20 DAY THEN 2
             |                  ELSE 3 END AS epoch_id
             |      FROM e CROSS JOIN m)
             |SELECT event_type, CAST(epoch_id AS BIGINT) AS epoch_id,
             |       CAST(epoch_id * 1000 + strlen(event_type) AS BIGINT) AS rate_milli,
             |       CAST(count(*) AS BIGINT) AS n_events,
             |       CAST(sum(cents) AS BIGINT) AS sum_cents
             |FROM j GROUP BY j.event_type, j.epoch_id
             |ORDER BY 1, 2""".stripMargin)),

    // ---- Top user-journey trigrams (one step past the bigram
    // transition matrix): per-user time-ordered state triples, counted
    // corpus-wide, deterministic top-25.
    "q240_path_trigrams" -> QueryDef(
      (s, dir) => {
        graft.operators.EventAnalytics.pathTrigrams(
            table(s, dir, "events"), "user_id", "ts", "event_type",
            "event_id", topK = 25)
          .orderBy("s1", "s2", "s3")
      },
      Some("""WITH s AS (SELECT user_id, event_type AS s1,
             |                 lead(event_type, 1) OVER w AS s2,
             |                 lead(event_type, 2) OVER w AS s3
             |          FROM events
             |          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |c AS (SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n
             |      FROM s WHERE s2 IS NOT NULL AND s3 IS NOT NULL GROUP BY 1, 2, 3),
             |top AS (SELECT * FROM c ORDER BY n DESC, s1, s2, s3 LIMIT 25)
             |SELECT * FROM top ORDER BY s1, s2, s3""".stripMargin)),

    // ---- First-touch view→purchase conversion latency quantiles —
    // exact ranks over the value-compressed gap histogram.
    "q241_conversion_latency" -> QueryDef(
      (s, dir) => {
        graft.operators.EventAnalytics.conversionLatency(
            table(s, dir, "events"), "user_id", "ts", "event_type",
            fromState = "view", toState = "purchase",
            probesBp = Seq(2500L, 5000L, 7500L, 9000L))
          .orderBy("q_bp")
      },
      Some("""WITH f AS (SELECT user_id, min(ts) AS tf FROM events
             |           WHERE event_type = 'view' GROUP BY 1),
             |t AS (SELECT e.user_id, min(e.ts) AS tt, min(f.tf) AS tf
             |      FROM events e JOIN f USING (user_id)
             |      WHERE e.event_type = 'purchase' AND e.ts >= f.tf GROUP BY 1),
             |g AS (SELECT (epoch_us(tt) - epoch_us(tf)) // 1000000 AS gap_s FROM t),
             |h AS (SELECT gap_s, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1),
             |c AS (SELECT h.*, CAST(sum(n) OVER (ORDER BY gap_s
             |                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM h),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_pairs FROM h),
             |p AS (SELECT unnest([2500, 5000, 7500, 9000]) AS q_bp)
             |SELECT CAST(p.q_bp AS BIGINT) AS q_bp,
             |       CAST(min(c.gap_s) AS BIGINT) AS gap_seconds,
             |       min(tot.n_pairs) AS n_pairs
             |FROM p CROSS JOIN tot JOIN c ON c.cum * 10000 >= p.q_bp * tot.n_pairs
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- IPW sampling calibration: deterministic md5-prefix sampling
    // (purchase at 64/256, everything else 32/256), the inverse-
    // probability estimate vs the true count, relative error in bp —
    // the report you run before trusting a sampled telemetry stream.
    "q242_ipw_totals" -> QueryDef(
      (s, dir) => {
        graft.llm.Profiling.ipwCalibration(
            table(s, dir, "events"), "event_id", "event_type",
            Map("purchase" -> 64), defaultRate = 32)
          .orderBy("event_type")
      },
      Some("""WITH s AS (SELECT event_type,
             |             CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 2) <
             |                    CASE WHEN event_type = 'purchase' THEN '40' ELSE '20' END
             |                  THEN 1 ELSE 0 END AS smp,
             |             CASE WHEN event_type = 'purchase' THEN 64 ELSE 32 END AS r
             |           FROM events),
             |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_true,
             |             CAST(sum(smp) AS BIGINT) AS n_sampled,
             |             CAST(min(r) AS BIGINT) AS rate_n256
             |      FROM s GROUP BY 1),
             |e AS (SELECT a.*, CAST((2 * n_sampled * 256 + rate_n256)
             |                       // (2 * rate_n256) AS BIGINT) AS est_total FROM a)
             |SELECT event_type, n_true, n_sampled, rate_n256, est_total,
             |       CAST((2 * 10000 * abs(est_total - n_true) + n_true)
             |            // (2 * n_true) AS BIGINT) AS err_bp
             |FROM e ORDER BY event_type""".stripMargin)),

    // ---- Winsorized mean of value cents per type (clip at the exact
    // 2.5%/97.5% percentile values, then HALF_UP milli-mean) — the
    // robust center that keeps every row's vote, from the same
    // value-compressed histogram as the MAD report.
    "q238_winsorized_mean" -> QueryDef(
      (s, dir) => {
        graft.llm.Profiling.winsorizedMean(
            table(s, dir, "events")
              .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)")),
            "event_type", "cents", loBp = 250L, hiBp = 9750L)
          .orderBy("event_type")
      },
      Some("""WITH h AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
             |                  CAST(count(*) AS BIGINT) AS n
             |           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
             |c AS (SELECT h.*, CAST(sum(n) OVER (PARTITION BY event_type ORDER BY v
             |                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM h),
             |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_rows FROM h GROUP BY 1),
             |lo AS (SELECT c.event_type, min(v) AS lo_value FROM c JOIN t USING (event_type)
             |       WHERE cum * 10000 >= 250 * n_rows GROUP BY 1),
             |hi AS (SELECT c.event_type, min(v) AS hi_value FROM c JOIN t USING (event_type)
             |       WHERE cum * 10000 >= 9750 * n_rows GROUP BY 1)
             |SELECT h.event_type, min(t.n_rows) AS n_rows, min(lo_value) AS lo_value,
             |       min(hi_value) AS hi_value,
             |       CAST(CAST(sign(sum(greatest(lo_value, least(hi_value, v)) * n)) AS BIGINT) *
             |            ((2000 * abs(sum(greatest(lo_value, least(hi_value, v)) * n)) + min(t.n_rows))
             |              // (2 * min(t.n_rows))) AS BIGINT) AS winsorized_mean_milli
             |FROM h JOIN t USING (event_type) JOIN lo USING (event_type) JOIN hi USING (event_type)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- PSI drift between the purchase and click value-cents
    // distributions (10-unit buckets): per-bucket HALF_UP shares and
    // exact integer contributions via once-rounded micro-nat logs —
    // the model-monitoring drift table, region-resolved.
    "q235_psi_drift" -> QueryDef(
      (s, dir) => {
        val ev = table(s, dir, "events")
          .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
        graft.llm.Profiling.psiDrift(
            ev.filter(col("event_type") === "purchase"),
            ev.filter(col("event_type") === "click"),
            "cents", bucketWidth = 1000L)
          .orderBy("bucket")
      },
      Some("""WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events),
             |ha AS (SELECT c // 1000 AS bucket, CAST(count(*) AS BIGINT) AS n_a
             |       FROM e WHERE event_type = 'purchase' GROUP BY 1),
             |hb AS (SELECT c // 1000 AS bucket, CAST(count(*) AS BIGINT) AS n_b
             |       FROM e WHERE event_type = 'click' GROUP BY 1),
             |t AS (SELECT (SELECT CAST(sum(n_a) AS BIGINT) FROM ha) AS ta,
             |             (SELECT CAST(sum(n_b) AS BIGINT) FROM hb) AS tb),
             |j AS (SELECT coalesce(ha.bucket, hb.bucket) AS bucket,
             |             coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
             |      FROM ha FULL OUTER JOIN hb ON ha.bucket = hb.bucket),
             |p AS (SELECT j.*, ta, tb,
             |             (20000 * n_a + ta) // (2 * ta) AS pa_bp,
             |             (20000 * n_b + tb) // (2 * tb) AS pb_bp
             |      FROM j CROSS JOIN t)
             |SELECT bucket, n_a, n_b, CAST(pa_bp AS BIGINT) AS pa_bp,
             |       CAST(pb_bp AS BIGINT) AS pb_bp,
             |       CAST(CASE WHEN n_a > 0 AND n_b > 0 THEN
             |         (pa_bp - pb_bp) *
             |         (CAST(round(ln(CAST(n_a AS DOUBLE)) * 1000000.0) AS BIGINT)
             |          + CAST(round(ln(CAST(tb AS DOUBLE)) * 1000000.0) AS BIGINT)
             |          - CAST(round(ln(CAST(n_b AS DOUBLE)) * 1000000.0) AS BIGINT)
             |          - CAST(round(ln(CAST(ta AS DOUBLE)) * 1000000.0) AS BIGINT))
             |       ELSE NULL END AS BIGINT) AS psi_contrib
             |FROM p ORDER BY bucket""".stripMargin)),

    // ---- Common-neighbor link prediction on the >20.4%-share
    // transition graph (the q205 graph): non-adjacent type pairs ranked
    // by shared neighbors then degree product — "which transition is
    // missing". Hub wedge-centers capped (moot at 5 nodes, load-bearing
    // at 100 TB).
    "q227_link_prediction" -> QueryDef(
      (s, dir) => {
        val edges = graft.operators.EventAnalytics.transitionMatrix(
            table(s, dir, "events"), "user_id", "ts", "event_type", "event_id")
          .filter(col("p_bp") > 2040)
        graft.operators.GraphOps.linkPrediction(
            edges, "from_type", "to_type", topK = 20)
          .orderBy("node_a", "node_b")
      },
      Some("""WITH s AS (SELECT user_id, event_type AS ft,
             |                 lead(event_type) OVER
             |                   (PARTITION BY user_id ORDER BY ts, event_id) AS tt
             |          FROM events),
             |c AS (SELECT ft, tt, CAST(count(*) AS BIGINT) AS n
             |      FROM s WHERE tt IS NOT NULL GROUP BY 1, 2),
             |t AS (SELECT ft, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY ft),
             |p AS (SELECT c.ft, c.tt, (20000 * n + tot) // (2 * tot) AS p_bp
             |      FROM c JOIN t USING (ft)),
             |und AS MATERIALIZED (SELECT DISTINCT least(ft, tt) AS a, greatest(ft, tt) AS b
             |       FROM p WHERE ft <> tt AND p_bp > 2040),
             |adj AS (SELECT a AS u, b AS v FROM und
             |        UNION ALL SELECT b, a FROM und),
             |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
             |ctr AS (SELECT adj.v AS w, adj.u AS x FROM adj
             |        JOIN deg ON deg.u = adj.v WHERE deg.deg <= 10000),
             |wdg AS (SELECT c1.x, c2.x AS y, CAST(count(*) AS BIGINT) AS cn
             |        FROM ctr c1 JOIN ctr c2 USING (w)
             |        WHERE c1.x < c2.x GROUP BY 1, 2),
             |nc AS (SELECT wdg.* FROM wdg WHERE NOT EXISTS
             |        (SELECT 1 FROM und WHERE und.a = wdg.x AND und.b = wdg.y)),
             |top AS (SELECT nc.x AS node_a, nc.y AS node_b, cn AS common_neighbors,
             |               CAST(dx.deg * dy.deg AS BIGINT) AS pref_attachment
             |        FROM nc JOIN deg dx ON dx.u = nc.x JOIN deg dy ON dy.u = nc.y
             |        ORDER BY cn DESC, dx.deg * dy.deg DESC, nc.x, nc.y LIMIT 20)
             |SELECT * FROM top ORDER BY node_a, node_b""".stripMargin)),

    // ---- 5%-trimmed mean of event value cents per type: the robust
    // center for fat-tailed metrics — rank windows per type (per-key
    // sorts, never global), trim counts floored, signed HALF_UP mean
    // in milli-cents.
    "q221_trimmed_mean" -> QueryDef(
      (s, dir) => {
        graft.llm.Profiling.trimmedMean(
            table(s, dir, "events")
              .withColumn("cents", round(col("value") * 100).cast("long")),
            "event_type", "cents", "event_id", trimBp = 500L)
          .orderBy("event_type")
      },
      Some("""WITH v AS (SELECT event_type, event_id,
             |                  CAST(round(value * 100) AS BIGINT) AS c FROM events),
             |r AS (SELECT event_type, c,
             |             CAST(row_number() OVER (PARTITION BY event_type
             |               ORDER BY c, event_id) AS BIGINT) AS rn,
             |             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
             |      FROM v),
             |k AS (SELECT event_type, n, c FROM r
             |      WHERE rn > n * 500 // 10000 AND rn <= n - n * 500 // 10000),
             |g AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n_total,
             |             CAST(count(*) AS BIGINT) AS n_kept,
             |             CAST(sum(c) AS BIGINT) AS kept_sum
             |      FROM k GROUP BY 1)
             |SELECT event_type, n_total, n_kept, kept_sum,
             |       CAST(CAST(sign(kept_sum) AS BIGINT) *
             |            ((2000 * abs(kept_sum) + n_kept) // (2 * n_kept)) AS BIGINT) AS trimmed_mean_milli
             |FROM g ORDER BY event_type""".stripMargin)),

    // ---- Z-order layout locality: events mapped to (user bucket,
    // day-of-month), z-values bit-interleaved, equal-width z-range
    // buckets (the file stand-in) each reporting its (x, y) bounding
    // rectangle — small rectangles in BOTH dims is exactly what
    // parquet footer pruning sees under a z-ordered write. Exact bit
    // arithmetic; narrow scan + one bounded aggregation.
    "q218_zorder_layout" -> QueryDef(
      (s, dir) => {
        val ev = table(s, dir, "events")
          .select(pmod(col("user_id"), lit(64)).as("x"),
            (dayofmonth(col("ts")) - 1).as("y"))
        graft.sources.ZOrderLayout.zOrderStats(ev, "x", "y",
            bits = 6, nBuckets = 16)
          .orderBy("bucket")
      },
      Some(zOrderOracle(bits = 6, nBuckets = 16))),

    // ---- First-order Markov next-event backtest: per source type, the
    // hit rate of "predict the modal next type" — ties in the model go
    // to the lexicographically smallest type on both engines.
    "q162_markov_backtest" -> QueryDef(
      (s, dir) => {
        graft.operators.EventAnalytics.markovBacktest(
            table(s, dir, "events"), "user_id", "ts", "event_type", "event_id")
          .orderBy("from_type")
      },
      Some("""WITH s AS (SELECT user_id, event_type AS from_type,
             |                 lead(event_type) OVER
             |                   (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |          FROM events),
             |t AS (SELECT from_type, to_type FROM s WHERE to_type IS NOT NULL),
             |m AS (SELECT from_type, to_type AS predicted_type,
             |             row_number() OVER (PARTITION BY from_type
             |                                ORDER BY count(*) DESC, to_type) AS rk
             |      FROM t GROUP BY from_type, to_type)
             |SELECT t.from_type, m.predicted_type,
             |       CAST(count(*) AS BIGINT) AS n_total,
             |       CAST(sum(CASE WHEN t.to_type = m.predicted_type THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_hit,
             |       CAST((20000 * sum(CASE WHEN t.to_type = m.predicted_type THEN 1 ELSE 0 END)
             |             + count(*)) // (2 * count(*)) AS BIGINT) AS hit_bp
             |FROM t JOIN m ON m.from_type = t.from_type AND m.rk = 1
             |GROUP BY t.from_type, m.predicted_type
             |ORDER BY t.from_type""".stripMargin)),

    // ---- Schema-on-read JSON property stats: the events table's props
    // column parsed per row (get_json_object — codegen'd, no upfront
    // schema) and aggregated per event type. mean_centi is the HALF_UP
    // integer mean ×100 so both engines agree exactly.
    "q167_json_props" -> QueryDef(
      (s, dir) => {
        EventAnalytics.jsonPropStats(table(s, dir, "events"),
            "event_type", "props", "$.k")
          .orderBy("event_type")
      },
      // json_valid + integer-regex guards make the oracle equivalent to
      // Spark's get_json_object + try_cast on malformed/fractional
      // payloads (DuckDB's json_extract aborts on malformed JSON and
      // TRY_CAST('1.5') rounds where Spark nulls). The inner cast is
      // TRY_CAST: the regex pins the lexical form but not the range, so a
      // 20-digit integer must become NULL (Spark's try_cast behavior), not
      // abort the oracle.
      Some("""WITH v AS (SELECT event_type,
             |                 CASE WHEN json_valid(props) THEN
             |                   CASE WHEN regexp_matches(
             |                          COALESCE(json_extract_string(props, '$.k'), ''),
             |                          '^\s*[-+]?[0-9]+\s*$')
             |                        THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
             |                   END
             |                 END AS v
             |          FROM events)
             |SELECT event_type,
             |       CAST(count(*) AS BIGINT) AS n_events,
             |       CAST(count(*) - count(v) AS BIGINT) AS n_missing,
             |       CAST(COALESCE(sum(v), 0) AS BIGINT) AS sum_prop,
             |       CAST(min(v) AS BIGINT) AS min_prop,
             |       CAST(max(v) AS BIGINT) AS max_prop,
             |       CASE WHEN count(v) > 0 THEN
             |         CAST((CASE WHEN sum(v) < 0 THEN -1 ELSE 1 END) *
             |              ((200 * abs(sum(v)) + count(v)) // (2 * count(v))) AS BIGINT)
             |       END AS mean_centi
             |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- Market-basket association rules over per-user event-type
    // baskets: support/confidence in HALF_UP bp, lift in milli-units
    // (1000 = independent), |types|²-bounded output.
    "q169_assoc_rules" -> QueryDef(
      (s, dir) => {
        EventAnalytics.associationRules(table(s, dir, "events"),
            "user_id", "event_type", minSupport = 1L)
          .orderBy("item_a", "item_b")
      },
      Some("""WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
             |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu FROM b),
             |i AS (SELECT event_type, CAST(count(*) AS BIGINT) AS ni FROM b GROUP BY 1),
             |p AS (SELECT x.event_type AS item_a, y.event_type AS item_b,
             |             CAST(count(*) AS BIGINT) AS n_both
             |      FROM b x JOIN b y ON x.user_id = y.user_id
             |                       AND x.event_type < y.event_type
             |      GROUP BY 1, 2)
             |SELECT item_a, item_b, n_both, ia.ni AS n_a, ib.ni AS n_b,
             |       CAST((20000 * n_both + nu.nu) // (2 * nu.nu) AS BIGINT) AS support_bp,
             |       CAST((20000 * n_both + ia.ni) // (2 * ia.ni) AS BIGINT) AS conf_ab_bp,
             |       CAST((20000 * n_both + ib.ni) // (2 * ib.ni) AS BIGINT) AS conf_ba_bp,
             |       CAST((2000 * n_both * nu.nu + ia.ni * ib.ni)
             |            // (2 * ia.ni * ib.ni) AS BIGINT) AS lift_milli
             |FROM p JOIN i ia ON ia.event_type = p.item_a
             |       JOIN i ib ON ib.event_type = p.item_b
             |       CROSS JOIN nu
             |WHERE n_both >= 1
             |ORDER BY item_a, item_b""".stripMargin)),

    // ---- Last-touch attribution: each purchase linked to the user's
    // most recent view/click at-or-before it (ties -> greatest touch
    // id), unattributed when the latest touch is > 1 day old. The
    // operator is the merge-window as-of join + a row-local horizon
    // filter; the oracle is the quadratic textbook join.
    // ---- Shuffle-skew report: events keyed by user_id into 8 md5
    // buckets — per-bucket load, key count, heaviest key, and the two
    // ratios that decide salting vs more-partitions before a 100-TB
    // shuffle on that key.
    "q183_key_skew" -> QueryDef(
      (s, dir) => {
        graft.llm.Profiling.keySkewReport(table(s, dir, "events"), "user_id", 8)
          .orderBy("bucket")
      },
      Some("""WITH k AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events),
             |b AS (SELECT key, CASE WHEN key IS NULL THEN -1
             |                  ELSE CAST('0x' || substr(md5(key), 1, 12) AS BIGINT) % 8
             |             END AS bucket
             |      FROM k),
             |kn AS (SELECT bucket, key, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1, 2),
             |ba AS (SELECT bucket, CAST(sum(n) AS BIGINT) AS n_rows,
             |              CAST(count(*) AS BIGINT) AS n_keys,
             |              CAST(max(n) AS BIGINT) AS top_key_rows
             |       FROM kn GROUP BY 1),
             |tk AS (SELECT kn.bucket, max(kn.key) AS top_key
             |       FROM kn JOIN ba ON kn.bucket = ba.bucket AND kn.n = ba.top_key_rows
             |       GROUP BY 1),
             |st AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM kn)
             |SELECT ba.bucket, ba.n_rows, ba.n_keys, tk.top_key, ba.top_key_rows,
             |       (20000 * ba.n_rows * 8 + st.total) // (2 * st.total) AS load_bp,
             |       (20000 * ba.top_key_rows + ba.n_rows) // (2 * ba.n_rows) AS top_share_bp
             |FROM ba JOIN tk ON tk.bucket = ba.bucket CROSS JOIN st
             |ORDER BY ba.bucket""".stripMargin)),

    "q170_attribution" -> QueryDef(
      (s, dir) => {
        EventAnalytics.lastTouchAttribution(table(s, dir, "events"),
            "user_id", "ts", "event_id", "event_type",
            convType = "purchase", touchTypes = Seq("view", "click"),
            horizonUs = 86400000000L)
          .orderBy("conv_id")
      },
      Some("""WITH c AS (SELECT event_id AS conv_id, user_id, ts AS conv_ts
             |          FROM events WHERE event_type = 'purchase'),
             |t AS (SELECT user_id, ts, event_id, event_type FROM events
             |      WHERE event_type IN ('view', 'click')),
             |m AS (SELECT c.conv_id, t.event_id AS touch_id,
             |             t.event_type AS touch_type, t.ts,
             |             row_number() OVER (PARTITION BY c.conv_id
             |                                ORDER BY t.ts DESC, t.event_id DESC) AS rn
             |      FROM c JOIN t ON t.user_id = c.user_id AND t.ts <= c.conv_ts)
             |SELECT c.conv_id, c.user_id, c.conv_ts,
             |       CASE WHEN epoch_us(m.ts) >= epoch_us(c.conv_ts) - 86400000000
             |            THEN m.touch_id END AS touch_id,
             |       CASE WHEN epoch_us(m.ts) >= epoch_us(c.conv_ts) - 86400000000
             |            THEN m.touch_type END AS touch_type,
             |       CASE WHEN epoch_us(m.ts) >= epoch_us(c.conv_ts) - 86400000000
             |            THEN epoch_us(c.conv_ts) - epoch_us(m.ts) END AS age_us
             |FROM c LEFT JOIN m ON m.conv_id = c.conv_id AND m.rn = 1
             |ORDER BY c.conv_id""".stripMargin)))

  /** DuckDB oracle for [[graft.sources.ZOrderLayout.zOrderStats]] over
    * events: the same bit-interleave unrolled as SQL shift/mask terms.
    */
  private def zOrderOracle(bits: Int, nBuckets: Int): String = {
    val terms = (0 until bits).map(i =>
      s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")
    val width = math.max(1L, (1L << (2 * bits)) / nBuckets)
    s"""WITH b AS (SELECT CAST(user_id % 64 AS BIGINT) AS x,
       |                  CAST(day(ts) - 1 AS BIGINT) AS y FROM events),
       |z AS (SELECT x, y, CAST($terms AS BIGINT) AS zval FROM b)
       |SELECT zval // $width AS bucket,
       |       CAST(count(*) AS BIGINT) AS n_rows,
       |       min(x) AS x_min, max(x) AS x_max,
       |       min(y) AS y_min, max(y) AS y_max
       |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  /** DuckDB oracle for [[graft.operators.GraphOps.labelPropagation]]:
    * `iters` unrolled synchronous rounds (each MATERIALIZED — the
    * inlining-explosion gotcha) of weight-sum → per-node max →
    * min-label argmax over the symmetrized transition graph.
    */
  private def lpaOracle(iters: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH s AS (SELECT user_id, event_type AS u,
        |                 lead(event_type) OVER
        |                   (PARTITION BY user_id ORDER BY ts, event_id) AS v
        |          FROM events),
        |e0 AS (SELECT u, v, CAST(count(*) AS BIGINT) AS w FROM s
        |       WHERE v IS NOT NULL GROUP BY u, v),
        |e AS MATERIALIZED (SELECT u, v, CAST(sum(w) AS BIGINT) AS w FROM (
        |       SELECT u, v, w FROM e0 UNION ALL SELECT v, u, w FROM e0) t
        |     GROUP BY u, v),
        |l0 AS MATERIALIZED (SELECT DISTINCT u AS n, u AS lab FROM e)""".stripMargin)
    for (i <- 1 to iters) {
      sb.append(s""",
        |sc$i AS MATERIALIZED (SELECT e.v AS n, l.lab, CAST(sum(e.w) AS BIGINT) AS s
        |        FROM e JOIN l${i - 1} l ON l.n = e.u GROUP BY 1, 2),
        |mx$i AS (SELECT n, max(s) AS ms FROM sc$i GROUP BY 1),
        |l$i AS MATERIALIZED (SELECT sc$i.n AS n, min(lab) AS lab
        |       FROM sc$i JOIN mx$i ON mx$i.n = sc$i.n AND sc$i.s = mx$i.ms
        |       GROUP BY 1)""".stripMargin)
    }
    sb.append(s"\nSELECT n AS event_type, lab AS community FROM l$iters ORDER BY event_type")
    sb.toString
  }

  /** DuckDB oracle for [[graft.operators.GraphOps.pageRank]] over the
    * transition graph, `iters` unrolled levels of the exact integer
    * update r' = 150000 + (85·Σ⌊r·w/out⌋) // 100 + (85·dang) // (100·N).
    */
  private def pageRankOracle(iters: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH s AS (SELECT user_id, event_type AS u,
        |                 lead(event_type) OVER
        |                   (PARTITION BY user_id ORDER BY ts, event_id) AS v
        |          FROM events),
        |e0 AS (SELECT u, v, CAST(count(*) AS BIGINT) AS w FROM s
        |       WHERE v IS NOT NULL GROUP BY u, v),
        |outd AS (SELECT u, CAST(sum(w) AS BIGINT) AS outw FROM e0 GROUP BY u),
        |e AS (SELECT e0.u, e0.v, e0.w, outd.outw FROM e0 JOIN outd USING (u)),
        |nodes AS (SELECT u AS n FROM e0 UNION SELECT v FROM e0),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM nodes),
        |r0 AS (SELECT n, CAST(1000000 AS BIGINT) AS r FROM nodes)""".stripMargin)
    sb.append(OracleGen.pageRankChain(iters))
    sb.append(s"\nSELECT n AS event_type, r AS rank_micro FROM r$iters ORDER BY event_type")
    sb.toString
  }
}
