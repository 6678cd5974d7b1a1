package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the batch event/dedup operators:
  *
  *  - `sessionize`: watermarked gap sessions via the native
  *    `session_window` aggregation — the streaming counterpart of
  *    `operators.Sessionize` (same gap semantics; emits a session row
  *    once the watermark passes its end).
  *  - `dedupFirstSeen`: streaming exact dedup with explicit keyed state
  *    (`flatMapGroupsWithState`): the first document per content hash
  *    passes through, later duplicates are dropped, and state expires
  *    after an idle timeout so the state store stays bounded — the
  *    streaming counterpart of `llm.Dedup.exactGroups`.
  *
  * State scale: both operators shuffle by key into the state store, so
  * capacity grows with executors, and watermark/timeout bound the live
  * state (without them a 100 TB stream would accrete state forever).
  */
object EventStreams {

  /** Gap-based streaming sessions. `events` needs (user_id, ts, value). */
  def sessionize(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("total_cents"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_cents"))

  /** Watermarked tumbling-window counts per event type — the canonical
    * `window()` aggregation: a window's row is emitted once the
    * watermark passes its end, so late events inside the allowed delay
    * still count and state is evicted beyond it. `events` needs
    * (ts, event_type, value).
    */
  def tumblingTypeCounts(events: DataFrame, width: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("total_cents"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n_events"), col("total_cents"))

  final case class Doc(contentHash: String, docId: Long)

  /** First-seen filter over a keyed stream: emits a Doc only the first
    * time its contentHash appears. With `idleTimeout = Some("1 hour")`
    * per-key state expires after that much inactivity (bounding the state
    * store at the cost of possibly re-admitting a very old duplicate);
    * note processing-time timeouts keep the micro-batch engine triggering
    * even without input. `None` keeps state forever — fine when an
    * upstream watermarked window bounds the key space.
    */
  def dedupFirstSeen(docs: Dataset[Doc], idleTimeout: Option[String]): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    docs.groupByKey(_.contentHash)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (hash: String, rows: Iterator[Doc], state: GroupState[Long]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator.empty // all duplicates of an already-seen hash
          } else {
            // keep the smallest docId of this batch as the canonical first
            val first = rows.minBy(_.docId)
            state.update(first.docId)
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator.single(first)
          }
        })
  }

  /** Stream-stream event-time interval join (attribution): every `follow`
    * event joins the `base` events of the same key whose timestamp it
    * trails by at most `within` — the impressions→clicks shape. Both
    * sides carry watermarks, and the time-bound join condition is what
    * lets the engine evict buffered rows: without it a stream-stream
    * join must hold both sides forever. Inner-join rows emit as soon as
    * both sides arrive (the watermark only gates state cleanup), so
    * results are append-mode safe. Columns: (join key, base_ts,
    * follow_ts, follow value).
    *
    * Scale: state per key ≈ events inside the `within` horizon — the
    * join shuffles both streams by key into the state store, so capacity
    * grows with executors, and the interval bound keeps per-key state
    * O(rate × within) regardless of stream length.
    */
  def attributeWithin(base: DataFrame, follow: DataFrame, keyCol: String,
                      within: String, watermark: String): DataFrame = {
    val b = base.withWatermark("ts", watermark)
      .select(col(keyCol).as("graft_k"), col("ts").as("base_ts"))
    val f = follow.withWatermark("ts", watermark)
      .select(col(keyCol).as("graft_fk"), col("ts").as("follow_ts"),
        col("value").as("follow_value"))
    b.join(f,
        col("graft_k") === col("graft_fk") &&
          col("follow_ts") >= col("base_ts") &&
          col("follow_ts") <= col("base_ts") + expr(s"INTERVAL $within"))
      .select(col("graft_k").as(keyCol), col("base_ts"), col("follow_ts"),
        col("follow_value"))
  }

  /** Built-in watermarked streaming dedup: the engine-managed twin of
    * [[dedupFirstSeen]] — `dropDuplicatesWithinWatermark` keeps the
    * first row per key and expires its state once the event-time
    * watermark passes the row's timestamp plus the allowed delay, so
    * the state store is bounded by the watermark horizon instead of a
    * processing-time timeout. Use this when "duplicates arrive close in
    * event time" holds; keep the keyed-state variant when duplicates
    * can be arbitrarily late but idle keys may be dropped.
    */
  def dedupWithinWatermark(docs: DataFrame, keyCol: String,
                           watermark: String): DataFrame =
    docs.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Sliding-window distinct active users on a stream — the streaming
    * twin of `operators.EventAnalytics.rollingActiveUsers`. Distinct
    * aggregates are unsupported in streaming, so the count chains TWO
    * stateful operators (the Spark 3.5+ pattern): a watermarked
    * per-(window, user) dedup whose state the watermark evicts, then a
    * windowed count of the surviving rows. A window's row emits once the
    * watermark passes its end.
    */
  def slidingActiveUsers(events: DataFrame, width: String, slide: String,
                         watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), window(col("ts"), width, slide).as("w"), col("user_id"))
      .dropDuplicates("w", "user_id")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("active_users"))
      .select(col("w.start").as("win_start"), col("w.end").as("win_end"),
        col("active_users"))

  final case class FunnelEvent(userId: Long, us: Long, ty: String)
  final case class StageAdvance(userId: Long, stage: Long, atUs: Long)

  /** Streaming twin of `operators.EventAnalytics.funnel`: per-user keyed
    * state holds the timestamps of the stages reached so far (a prefix
    * vector, O(stages)); each micro-batch's events are walked in
    * event-time order and a StageAdvance row is emitted every time a
    * user's furthest stage moves forward. Same strictly-after / one-
    * stage-per-event semantics as the batch walk.
    *
    * Ordering caveat (inherent to forward-only streaming funnels): the
    * walk is event-time-sorted WITHIN a micro-batch, but an event
    * arriving in a later batch with an earlier timestamp than an
    * already-recorded stage cannot retroactively rewrite the funnel —
    * replay the batch operator when exact late-data semantics matter.
    * State never expires here; compose with a timeout variant when the
    * user key space is unbounded.
    */
  def funnelAdvances(events: Dataset[FunnelEvent], stages: Seq[String]): Dataset[StageAdvance] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[FunnelEvent], state: GroupState[Seq[Long]]) => {
          var times = state.getOption.getOrElse(Seq.empty)
          val out = scala.collection.mutable.ArrayBuffer.empty[StageAdvance]
          rows.toSeq.sortBy(e => (e.us, e.ty)).foreach { e =>
            val i = times.length
            if (i < stages.length && e.ty == stages(i) &&
                (i == 0 || e.us > times(i - 1))) {
              times = times :+ e.us
              out += StageAdvance(user, i + 1L, e.us)
            }
          }
          if (out.nonEmpty) state.update(times)
          out.iterator
        })
  }
}
