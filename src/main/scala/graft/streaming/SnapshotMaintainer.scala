package graft.streaming

import graft.operators.CdcApply
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming snapshot maintenance — the incremental-table loop: a CDC
  * changelog stream folds into a VERSIONED parquet snapshot via
  * [[graft.operators.CdcApply.applyChangelog]], one new immutable
  * version directory per micro-batch (`v0`, `v1`, …) with a batch-id
  * ledger pointing at the current version. Readers always see a
  * complete version (writes go to a fresh directory; the ledger is the
  * commit point), and old versions stay readable for time travel until
  * an external retention job removes them — the Delta/Hudi/Iceberg
  * maintenance loop as plain parquet + a ledger.
  *
  * Restart semantics ([[IndexIngest]]'s honest story): the ledger
  * makes a replayed COMMITTED batch a no-op; a crash between the
  * version write and the ledger append leaves an orphaned, unreferenced
  * version directory (replay overwrites it) — never a torn snapshot,
  * because the ledger still points at the previous version.
  *
  * Scale: each batch costs one CdcApply (one key shuffle over
  * snapshot+batch). For 100-TB snapshots, partition the snapshot by a
  * key prefix and rewrite only touched partitions; this maintainer
  * keeps the whole-snapshot form the fixtures exercise and documents
  * the partitioned variant as the scale path.
  */
object SnapshotMaintainer {

  private val LedgerName = "_graft_snapshot_ledger"

  /** Initialize the versioned store from a base snapshot (version 0,
    * empty ledger).
    */
  def init(base: DataFrame, dir: String): Unit = {
    base.write.mode("overwrite").parquet(s"$dir/v0")
    val ledger = new java.io.File(dir, LedgerName)
    val out = new java.io.FileWriter(ledger, false)
    try out.write("") finally out.close()
  }

  /** Current committed version number (0 = just initialized). */
  def currentVersion(dir: String): Long = {
    val ledger = new java.io.File(dir, LedgerName)
    if (!ledger.exists()) return 0L
    val src = scala.io.Source.fromFile(ledger)
    try {
      val lines = src.getLines().filter(_.nonEmpty).toSeq
      if (lines.isEmpty) 0L else lines.map(_.split(" ")(1).toLong).max
    } finally src.close()
  }

  private def committedBatchIds(dir: String): Set[Long] = {
    val ledger = new java.io.File(dir, LedgerName)
    if (!ledger.exists()) return Set.empty
    val src = scala.io.Source.fromFile(ledger)
    try src.getLines().filter(_.nonEmpty).map(_.split(" ")(0).toLong).toSet
    finally src.close()
  }

  /** The current snapshot frame. */
  def snapshot(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/v${currentVersion(dir)}")

  /** Apply one changelog micro-batch; returns the new version, or -1
    * when `batchId` is already committed (replay after restart).
    * Exposed for direct testing and batch-mode backfills.
    */
  def processBatch(batch: DataFrame, batchId: Long, dir: String,
                   keyCols: Seq[String], seqCol: String,
                   opCol: String): Long = {
    if (committedBatchIds(dir).contains(batchId)) return -1L
    val spark = batch.sparkSession
    val cur = currentVersion(dir)
    val next = cur + 1
    CdcApply.applyChangelog(snapshot(spark, dir), batch, keyCols,
        seqCol, opCol)
      .write.mode("overwrite").parquet(s"$dir/v$next")
    // version written, THEN the ledger commit — a crash between the
    // two leaves an unreferenced v(next) that replay overwrites
    val out = new java.io.FileWriter(new java.io.File(dir, LedgerName), true)
    try out.write(s"$batchId $next\n") finally out.close()
    next
  }

  /** Attach the maintainer to a streaming changelog frame (payload
    * columns + seqCol + opCol). The store must be [[init]]ialized.
    */
  def start(changes: DataFrame, dir: String, keyCols: Seq[String],
            seqCol: String, opCol: String,
            checkpoint: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, dir, keyCols, seqCol, opCol)
        ()
      }
      .start()
}
