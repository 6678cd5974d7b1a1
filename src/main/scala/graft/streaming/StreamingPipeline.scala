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
        // malformed manifest lines (permissive JSON → null fields) must
        // not NPE the stream; they are simply not announced ranges
        val ranges = batch
          .filter(col("start").isNotNull && col("length").isNotNull &&
            col("length") > 0)
          .select(col("start"), col("length")).collect()
          .map(r => (r.getLong(0), r.getLong(0) + r.getLong(1)))
        if (ranges.nonEmpty) {
          // carve each COALESCED announced range, not the batch's
          // bounding box: a batch holding {0,10MB} and {1GB,10MB} must
          // not carve (and later double-carve) the unannounced middle
          val merged = ranges.sortBy(_._1)
            .foldLeft(List.empty[(Long, Long)]) {
              case ((s, e) :: tail, (s2, e2)) if s2 <= e =>
                (s, math.max(e, e2)) :: tail
              case (acc, r) => r :: acc
            }.reverse
          merged.foreach { case (start, end) =>
            val result = CarvePipeline.run(spark, evidenceRef, cfg, runId,
              enableStrings = false, enableEntropy = false,
              resumeOffset = start, endOffset = Some(end))
            // OVERWRITE the per-(batch, range) dir: foreachBatch is
            // at-least-once, and append would duplicate every row when
            // a failed batch re-delivers (parquet part names are fresh
            // UUIDs, so nothing collides to save us)
            result.carvedFiles
              .filter(c => c.globalStart >= start && c.globalStart < end)
              .write.mode("overwrite")
              .parquet(s"$outDir/batch_${batchId}_$start")
            result.release()
          }
        }
        ()
      }
      .start()
  }
}
