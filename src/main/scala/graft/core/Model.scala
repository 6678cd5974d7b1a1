package graft.core

/** Core row types of the engine (see SURVEY.md §1; reference:
  * src/chunk.rs:1-7, src/scanner/mod.rs:9-22, src/strings/mod.rs:9-24,
  * src/carve/mod.rs:70-85, src/metadata/mod.rs:13-31).
  *
  * These are the schemas every stage of the Spark DAG exchanges. All
  * offsets/sizes are Long (the reference uses u64; evidence > 8 EiB is out
  * of scope), entropy Double, flags Int bitmask.
  */

/** One overlapping scan window over the evidence byte space.
  * `length = min(chunkSize + overlap, total - start)`,
  * `validLength = min(chunkSize, total - start)` — a hit is *owned* by the
  * chunk iff `localOffset < validLength` (exactly-once under overlap).
  */
final case class ScanChunk(id: Long, start: Long, length: Long, validLength: Long)

/** A signature match local to one chunk. */
final case class Hit(chunkId: Long, localOffset: Long, patternId: Int, fileTypeId: Int)

/** A hit rebased to the global byte space after overlap-dedup. */
final case class NormalizedHit(globalOffset: Long, fileTypeId: Int, patternId: Int)

/** A printable-string run found in a chunk. Flags per StringFlags. */
final case class StringSpan(chunkId: Long, localStart: Long, length: Int, flags: Int)

object StringFlags {
  val Utf16Le = 1 << 0
  val Utf16Be = 1 << 1
  val Utf8 = 1 << 2
  val UrlLike = 1 << 4
  val EmailLike = 1 << 5
  val PhoneLike = 1 << 6
}

/** Metadata record for one carved (recovered) file. */
final case class CarvedFile(
    runId: String,
    fileType: String,
    path: String,
    extension: String,
    globalStart: Long,
    globalEnd: Long,
    size: Long,
    md5: String,
    sha256: String,
    validated: Boolean,
    truncated: Boolean,
    errors: Seq[String],
    patternId: String)

/** URL / email / phone / generic string artefact. */
final case class StringArtefact(
    runId: String,
    artefactKind: String, // Url | Email | Phone | GenericString
    content: String,
    encoding: String, // ascii | utf-8 | utf-16le | utf-16be
    globalStart: Long,
    globalEnd: Long)

/** High-entropy byte region (merged adjacent windows, max entropy kept). */
final case class EntropyRegion(
    runId: String,
    globalStart: Long,
    globalEnd: Long,
    entropy: Double,
    windowSize: Long)

/** Browser artefacts extracted from carved SQLite databases. */
final case class BrowserHistoryRecord(
    runId: String,
    browser: String,
    profile: String,
    url: Option[String],
    title: Option[String],
    visitTime: Option[java.sql.Timestamp],
    visitCount: Option[Long],
    transition: Option[String],
    sourceFile: String)

final case class BrowserCookieRecord(
    runId: String,
    browser: String,
    profile: String,
    host: Option[String],
    name: Option[String],
    value: Option[String],
    path: Option[String],
    expiresUtc: Option[java.sql.Timestamp],
    lastAccessUtc: Option[java.sql.Timestamp],
    creationUtc: Option[java.sql.Timestamp],
    secure: Option[Boolean],
    httpOnly: Option[Boolean],
    sourceFile: String)

final case class BrowserDownloadRecord(
    runId: String,
    browser: String,
    profile: String,
    url: Option[String],
    targetPath: Option[String],
    startTime: Option[java.sql.Timestamp],
    endTime: Option[java.sql.Timestamp],
    totalBytes: Option[Long],
    state: Option[String],
    sourceFile: String)

/** End-of-run counters (reference src/metadata/mod.rs:13-22). */
final case class RunSummary(
    runId: String,
    bytesScanned: Long,
    chunksProcessed: Long,
    hitsFound: Long,
    filesCarved: Long,
    stringSpans: Long,
    artefactsExtracted: Long,
    errorCount: Long)

/** Resume state (reference src/checkpoint.rs:8-17). */
final case class CheckpointState(
    version: Int,
    runId: String,
    chunkSize: Long,
    overlap: Long,
    nextOffset: Long,
    evidenceLen: Long,
    createdAt: String)
