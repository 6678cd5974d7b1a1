package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key quantile monitor: the deterministic MRL/KLL ladder
  * of `Sketches.kllQuantiles` (same fixed compaction schedule: at k
  * items a level's sorted even-indexed half promotes with doubled
  * weight, odd leftover stays) kept as `mapGroupsWithState` state, so
  * a long-running stream reports per-key value quantiles every trigger
  * with O(levels·k) state per key — the latency/size monitor you stand
  * next to the skew monitor.
  *
  * Batch contents are sorted before insertion, so a given (state,
  * batch-multiset) transition is deterministic; ACROSS batches the
  * result depends on arrival batching, as any one-pass sketch does —
  * the batch [[graft.llm.Sketches.kllQuantiles]] is the reproducible
  * offline counterpart (use it for oracle-checked reports; use this
  * for live monitoring). Weight conservation is exact: each key's
  * reported n_rows is the true row count at every trigger.
  */
object QuantileMonitor {

  /** Ladder state: exact count + per-level retained values. */
  case class LadderState(n: Long, levels: Seq[Seq[Long]])

  case class QuantileRow(key: String, q_bp: Long, est_value: Long,
                         n_rows: Long)

  // both methods delegate to the SHARED graft.llm.Sketches.KllLadder
  // core — the batch sketch and this monitor must compact identically,
  // so there is exactly one implementation of the schedule

  private[streaming] def insertAll(st: LadderState, vs: Seq[Long],
                                   k: Int): LadderState = {
    import graft.llm.Sketches.KllLadder
    val ladder: KllLadder.Ladder = scala.collection.mutable.ArrayBuffer(
      st.levels.map(l => scala.collection.mutable.ArrayBuffer(l: _*)): _*)
    if (ladder.isEmpty)
      ladder += scala.collection.mutable.ArrayBuffer.empty[Long]
    var n = st.n
    vs.sorted.foreach { v =>
      n += 1
      KllLadder.insert(ladder, v, k)
    }
    LadderState(n, ladder.map(_.toSeq).toSeq)
  }

  private[streaming] def probe(st: LadderState, probesBp: Seq[Long])
      : Seq[(Long, Long, Long)] = {
    import graft.llm.Sketches.KllLadder
    val items = st.levels.zipWithIndex
      .flatMap { case (buf, lvl) => buf.map(v => (v, 1L << lvl)) }
      .sortBy(_._1).toArray
    probesBp.map { bp =>
      if (st.n == 0L || items.isEmpty) (bp, 0L, 0L)
      else (bp, KllLadder.probe(items, st.n, bp), st.n)
    }
  }

  /** Attach the monitor to a streaming frame; emits one row per
    * (key, probe) each trigger the key saw data (Update mode).
    */
  def quantiles(stream: DataFrame, keyCol: String, valCol: String,
                probesBp: Seq[Long], k: Int = 128): Dataset[QuantileRow] = {
    require(k >= 8 && k % 2 == 0, s"k must be even and >= 8, got $k")
    require(probesBp.nonEmpty && probesBp.forall(p => p >= 0 && p <= 10000),
      s"probes must be bp in [0, 10000], got $probesBp")
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(keyCol).cast("string").as("k"),
        col(valCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LadderState, QuantileRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)],
         state: GroupState[LadderState]) =>
          val prev = state.getOption.getOrElse(LadderState(0L, Seq(Seq())))
          val next = insertAll(prev, rows.map(_._2).toSeq, k)
          state.update(next)
          probe(next, probesBp).iterator.map { case (bp, est, n) =>
            QuantileRow(key, bp, est, n)
          }
      }
  }
}
