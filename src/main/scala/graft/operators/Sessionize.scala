package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Gap-based sessionization: consecutive events of the same key belong to
  * one session while the time gap stays <= `gapMicros`.
  *
  * Classic streaming-warehouse shape: one window spec drives both the
  * `lag` (gap detection) and the running `sum` (session counter), so the
  * whole operator is a single shuffle on the key plus one per-partition
  * sort — no self-join, no iteration. This is the batch twin of
  * Structured Streaming's session windows
  * (`session_window(col, gap)`), kept as an explicit window formulation
  * so the session ids are deterministic and oracle-checkable.
  */
object Sessionize {

  /** Adds `session_seq`: 1-based session counter per key, split where the
    * gap to the previous event exceeds `gapMicros`. `tieCol` breaks
    * equal-timestamp ordering deterministically (use a unique id).
    */
  def assign(df: DataFrame, keyCol: String, tsCol: String, tieCol: String, gapMicros: Long): DataFrame = {
    val order = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val prev = lag(unix_micros(col(tsCol)), 1).over(order)
    val brk = when(prev.isNull || unix_micros(col(tsCol)) - prev > gapMicros, 1L).otherwise(0L)
    df.withColumn("session_seq",
      sum(brk).over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session summary: (key, session_seq, n_events, session_start,
    * session_end, aggregates...) — map-side partial aggregation applies.
    */
  def summarize(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      gapMicros: Long, extraAggs: Seq[org.apache.spark.sql.Column] = Seq.empty): DataFrame =
    assign(df, keyCol, tsCol, tieCol, gapMicros)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        Seq(min(col(tsCol)).as("session_start"), max(col(tsCol)).as("session_end")) ++ extraAggs: _*)
}
