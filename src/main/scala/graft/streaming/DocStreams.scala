package graft.streaming

import graft.llm.{Curation, TextAnalysis}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming document curation: the batch curation operators composed
  * over an unbounded stream. `qualityGate` and `fingerprint` are narrow
  * per-row expression pipelines, so they run on a streaming DataFrame
  * unchanged; the only stateful stage is the first-seen dedup
  * (`EventStreams.dedupFirstSeen`), keyed by the content fingerprint.
  *
  * Scale: the stateless stages scale with input partitions and hold no
  * state; the dedup stage shuffles by fingerprint into the state store,
  * whose live size is one (hash, docId) entry per distinct document —
  * bound it with the idle timeout when the stream is unbounded.
  */
object DocStreams {

  /** quality-gate → fingerprint → first-seen dedup over a (possibly
    * streaming) documents frame with columns (idCol, textCol). Returns
    * the curated stream of (contentHash = fingerprint, docId) — the
    * documents a downstream sink should keep.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             minTokens: Long = 20L,
             idleTimeout: Option[String] = None): Dataset[EventStreams.Doc] = {
    import docs.sparkSession.implicits._
    val kept = Curation.qualityGate(docs, idCol, textCol, minTokens)
      .filter(col("keep"))
      .select(col(idCol), col(textCol))
    val fp = TextAnalysis.fingerprint(kept, idCol, textCol)
      .select(col("fingerprint").as("contentHash"), col("id").as("docId"))
      .as[EventStreams.Doc]
    EventStreams.dedupFirstSeen(fp, idleTimeout)
  }

  /** Watermark-bounded streaming dedup via the engine-native
    * `dropDuplicatesWithinWatermark`: rows sharing a fingerprint are
    * deduplicated as long as they arrive within the watermark delay of
    * each other, and the state store evicts fingerprints older than the
    * watermark automatically — the zero-custom-code alternative to
    * `dedupFirstSeen` when an event-time column exists.
    *
    * Documents too short to fingerprint (< 5 words — no 5-gram exists)
    * are DROPPED, mirroring the batch fingerprint/dedup operators'
    * domain; route them around this stage if they must survive.
    */
  def dedupWithinWatermark(docs: DataFrame, idCol: String, textCol: String,
                           tsCol: String, delay: String): DataFrame =
    TextAnalysis.withFingerprint(docs, textCol)
      .filter(col("fingerprint").isNotNull)
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Streaming incremental dedup against an already-ingested STATIC
    * reference corpus — the streaming face of
    * [[graft.llm.Dedup.dedupAgainst]]: only documents whose content
    * md5 is NOT in the reference pass through. A stream-static
    * left-anti join, which Structured Streaming executes per
    * micro-batch against the (broadcast- or shuffle-joined) reference
    * hash table; at production scale the reference digests are a
    * precomputed table refreshed per snapshot, so the stream side
    * never rescans the reference corpus itself.
    */
  def dedupAgainstReference(docs: DataFrame, ref: DataFrame,
                            textCol: String, refTextCol: String): DataFrame = {
    val refHashes = ref
      .select(md5(coalesce(col(refTextCol), lit(""))).as("graft_ref_hash"))
      .distinct()
    // join on an internal graft_-prefixed key and drop it: the output
    // keeps the input schema exactly (no clobbering a caller's own
    // content_hash column, no internal leaking into the sink)
    docs
      .withColumn("graft_doc_hash", md5(coalesce(col(textCol), lit(""))))
      .join(refHashes, col("graft_doc_hash") === col("graft_ref_hash"), "left_anti")
      .drop("graft_doc_hash")
  }
}
