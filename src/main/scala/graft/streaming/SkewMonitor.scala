package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Runtime hot-key guardrail for streaming pipelines — the monitor
  * that tells an operator to reach for [[graft.llm.Skew.saltedJoin]] /
  * AQE skew handling BEFORE a straggler task does: every micro-batch
  * appends its top-N keys by row count with their batch share, so a
  * key drifting hot shows up one batch after it starts, not in a
  * post-mortem of a 3-hour stage.
  *
  * Per batch the work is one map-side-combinable count per key plus a
  * distributed top-N (TakeOrderedAndProject — per-partition heads then
  * a driver merge of N·partitions rows, never a global sort or an
  * unpartitioned window), and one 1-row total for the share — cost
  * proportional to the batch's DISTINCT keys, not its rows, after the
  * partial agg.
  */
object SkewMonitor {

  /** The per-batch report frame: (key, n_rows, share_bp, rank) for the
    * batch's `topN` heaviest keys — [[graft.llm.Profiling.keySkewReport]]'s
    * dominant-key read, per micro-batch. NULL keys report as the
    * literal "(null)" bucket: they are exactly the rows an equality
    * join drops and a groupBy lumps into one task, so they must be
    * visible in the monitor, not silently absent. share_bp is the
    * key's HALF_UP share of the whole batch.
    */
  def hotKeys(batch: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN >= 1 && topN <= 1024, s"topN must be in [1, 1024], got $topN")
    val total = batch.agg(count(lit(1)).as("graft_total"))
    batch
      .select(coalesce(col(keyCol).cast("string"), lit("(null)")).as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc, col("key"))
      .limit(topN)
      .crossJoin(broadcast(total))
      .select(col("key"), col("n_rows"),
        expr("(20000 * n_rows + graft_total) DIV (2 * graft_total)")
          .as("share_bp"))
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n_rows").desc, col("key"))).cast("long"))
  }

  /** Attach the monitor to a streaming frame: each micro-batch's
    * [[hotKeys]] report is stamped with the batch id and APPENDED as
    * parquet under `outPath` — an ordinary table any alerting query
    * tails (`share_bp > threshold` is the page). Returns the writer;
    * the caller sets checkpoint/trigger and calls `start()`.
    *
    * The monitor is a separate sink on the same stream, not an
    * interception of the data path — attach it to the input of a
    * salted join to watch the key it salts on.
    */
  def monitor(stream: DataFrame, keyCol: String, topN: Int,
              outPath: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      // skip empty batches: a no-data trigger adds no report rows
      if (!batch.isEmpty)
        hotKeys(batch, keyCol, topN)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outPath)
    }
}
