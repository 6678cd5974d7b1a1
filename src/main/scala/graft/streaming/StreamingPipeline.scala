package graft.streaming

import graft.carve.EngineConfig
import graft.evidence.EvidenceRef
import graft.pipeline.CarvePipeline
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured Streaming variant of the engine (SURVEY §2.8): the
  * reference is a bounded pipeline with streaming execution, so the
  * faithful Spark analog is a batch DAG — this module exists for the
  * RESUME story: evidence chunk manifests arrive as files, each
  * micro-batch carves its chunk ranges, and `checkpointLocation` replaces
  * the reference's checkpoint.json (exactly-once per chunk from Spark's
  * offset tracking + the engine's deterministic output naming).
  *
  * Input: a directory of JSON lines `{"start": N, "length": M}` naming
  * chunk ranges of the evidence (written by an enumerator or by hand).
  * Output: per-batch carved-file parquet under `outDir`.
  */
object StreamingPipeline {

  def chunkManifestSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("start", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType)))

  /** Start the stream: manifest files → foreachBatch carve → parquet. */
  def run(
      spark: SparkSession,
      manifestDir: String,
      evidenceRef: EvidenceRef,
      cfg: EngineConfig,
      runId: String,
      outDir: String,
      checkpointDir: String): StreamingQuery = {
    val manifests: DataFrame = spark.readStream
      .schema(chunkManifestSchema)
      .json(manifestDir)

    manifests.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions._
        val ranges = batch.select(col("start"), col("length")).collect()
        if (ranges.nonEmpty) {
          val minStart = ranges.map(_.getLong(0)).min
          val maxEnd = ranges.map(r => r.getLong(0) + r.getLong(1)).max
          // carve just the announced region; deterministic naming makes
          // re-delivered batches idempotent
          val result = CarvePipeline.run(spark, evidenceRef, cfg, runId,
            enableStrings = false, enableEntropy = false,
            resumeOffset = minStart, endOffset = Some(maxEnd))
          result.carvedFiles
            .filter(c => c.globalStart >= minStart && c.globalStart < maxEnd)
            .write.mode("append").parquet(s"$outDir/batch_$batchId")
          result.scanned.unpersist()
        }
        ()
      }
      .start()
  }
}
