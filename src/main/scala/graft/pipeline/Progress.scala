package graft.pipeline

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** One progress observation (reference src/pipeline/mod.rs:526-583:
  * percent complete, MiB/s, ETA, every ~5 s while the scan runs).
  */
final case class ProgressEvent(
    runId: String,
    bytesScanned: Long,
    totalBytes: Long,
    percent: Double,
    mibPerSec: Double,
    etaSec: Double,
    elapsedSec: Double)

/** SparkListener tracking scan progress for one pipeline run (SURVEY
  * step 9). The scan stage bumps the named accumulator
  * `graft_bytes_scanned_<runId>` once per chunk; every finished task
  * reports its delta through `taskInfo.accumulables`, and this listener
  * folds those into a running total, emitting a throttled
  * [[ProgressEvent]] (%, MiB/s, ETA) at most once per `intervalMs`.
  *
  * Register with `spark.sparkContext.addSparkListener(listener)` before
  * the run and remove it after. Totals are for progress display, not
  * accounting: task retries or cache-eviction recomputes re-add their
  * bytes, exactly like any Spark accumulator observed from a
  * transformation — the authoritative end-of-run counters are the
  * pipeline's `observe()` metrics.
  */
final class ProgressListener(
    runId: String,
    totalBytes: Long,
    intervalMs: Long = 5000L,
    onProgress: ProgressEvent => Unit = ProgressListener.logEvent)
  extends SparkListener {

  private val bytes = new AtomicLong(0L)
  private val startNs = System.nanoTime()
  // seeded one interval in the past so the first delta emits immediately
  // (Long.MinValue would overflow the `now - last` comparison)
  private val lastEmitNs = new AtomicLong(startNs - intervalMs * 1000000L - 1L)

  /** Bytes observed so far (driver-side view). */
  def bytesScanned: Long = bytes.get()

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    var delta = 0L
    taskEnd.taskInfo.accumulables.foreach { acc =>
      if (acc.name.contains(ProgressListener.accumulatorName(runId)))
        acc.update.foreach(u => delta += u.toString.toLong)
    }
    if (delta > 0L) {
      val current = bytes.addAndGet(delta)
      val now = System.nanoTime()
      val last = lastEmitNs.get()
      if (now - last >= intervalMs * 1000000L && lastEmitNs.compareAndSet(last, now)) {
        val elapsed = (now - startNs) / 1e9
        val mibps = if (elapsed > 0) current / (1024.0 * 1024.0) / elapsed else 0.0
        val pct = if (totalBytes > 0) math.min(100.0, current * 100.0 / totalBytes) else 0.0
        val eta =
          if (current > 0 && totalBytes > current) elapsed * (totalBytes - current).toDouble / current
          else 0.0
        onProgress(ProgressEvent(runId, current, totalBytes, pct, mibps, eta, elapsed))
      }
    }
  }
}

object ProgressListener {
  /** The accumulator name the scan stage and the listener agree on. */
  def accumulatorName(runId: String): String = s"graft_bytes_scanned_$runId"

  private def logEvent(e: ProgressEvent): Unit =
    println(f"[graft] run ${e.runId}: ${e.percent}%.1f%% " +
      f"(${e.bytesScanned}/${e.totalBytes} bytes) ${e.mibPerSec}%.1f MiB/s " +
      f"eta ${e.etaSec}%.0f s")
}
