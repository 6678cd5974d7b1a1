package graft.carve

import graft.core.CarvedFile
import graft.evidence.EvidenceReader
import java.security.MessageDigest

/** Carve-stage plumbing with exact reference semantics
  * (src/carve/mod.rs:104-351): streamed copy with incremental MD5/SHA-256,
  * max_size enforcement mid-stream, EOF tolerance, min_size drop, and the
  * shared CarvedFile assembly. Error strings match the reference's
  * thiserror Display forms — they land in the `errors` column.
  */
object CarveErrors {
  final class Invalid(val msg: String) extends Exception(msg)
  final class Truncated extends Exception("truncated output")
  final class Eof extends Exception("unexpected eof")
}

/** Per-task context: evidence handle + run metadata. `payloadSink`, when
  * set, receives carved bytes keyed by relative path (local dir or object
  * storage adapter); metadata-only runs pass None — hashing happens
  * regardless.
  */
final case class ExtractionContext(
    runId: String,
    evidence: EvidenceReader,
    payloadSink: Option[(String, Array[Byte], Int) => Unit] = None)

/** A hit normalized to the global byte space, with string ids as the
  * reference carries them (scanner/mod.rs:17-22).
  */
final case class CarveHit(globalOffset: Long, fileTypeId: String, patternId: String)

trait CarveHandler extends Serializable {
  def fileType: String
  def extension: String
  def processHit(hit: CarveHit, ctx: ExtractionContext): Option[CarvedFile]
}

/** Sequential read-and-hash stream over the evidence
  * (reference CarveStream, src/carve/mod.rs:240-313): readExact fails
  * Truncated when the *request* would cross maxSize, Eof on evidence end;
  * everything read is hashed and counted.
  */
final class CarveStream(
    ctx: ExtractionContext,
    relPath: String,
    startOffset: Long,
    maxSize: Long) {
  private var offset = startOffset
  private var written0 = 0L
  private val md5 = MessageDigest.getInstance("MD5")
  private val sha256 = MessageDigest.getInstance("SHA-256")

  def written: Long = written0
  def context: ExtractionContext = ctx

  def readExact(len: Int): Array[Byte] = {
    // a negative length here is a Long size field wrapped by .toInt — an
    // evidence-controlled value; drop the hit (Invalid) instead of
    // letting new Array[Byte](-n) kill the task uncaught
    if (len < 0) throw new CarveErrors.Invalid(s"negative read length $len (size overflow)")
    if (maxSize > 0 && written0 + len > maxSize) throw new CarveErrors.Truncated
    val buf = new Array[Byte](len)
    var read = 0
    while (read < len) {
      val n = ctx.evidence.readAt(offset, buf, read, len - read)
      if (n == 0) throw new CarveErrors.Eof
      writeBytes(buf, read, n)
      read += n
    }
    buf
  }

  def writeBytes(buf: Array[Byte], off: Int, len: Int): Unit = {
    if (maxSize > 0 && written0 + len > maxSize) throw new CarveErrors.Truncated
    md5.update(buf, off, len)
    sha256.update(buf, off, len)
    ctx.payloadSink.foreach(sink => sink(relPath, java.util.Arrays.copyOfRange(buf, off, off + len), len))
    offset += len
    written0 += len
  }

  def finish(): (Long, String, String) =
    (written0, Hex.lower(md5.digest()), Hex.lower(sha256.digest()))
}

object Hex {
  private val digits = "0123456789abcdef".toCharArray
  def lower(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach { b => sb.append(digits((b >> 4) & 0xf)).append(digits(b & 0xf)) }
    sb.toString
  }

  def decode(hex: String): Array[Byte] = {
    require(hex.length % 2 == 0, s"odd hex length: $hex")
    hex.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
  }
}

object CarveOps {

  /** Copy-and-hash [start, end) with 64 KiB buffers; returns
    * (bytesWritten, eofTruncated) — reference write_range
    * (src/carve/mod.rs:315-351).
    */
  def writeRange(
      ctx: ExtractionContext,
      relPath: String,
      start: Long,
      end: Long,
      md5: MessageDigest,
      sha256: MessageDigest): (Long, Boolean) = {
    var offset = start
    var remaining = math.max(0L, end - start)
    var written = 0L
    val bufSize = 64 * 1024
    val buf = new Array[Byte](bufSize)
    while (remaining > 0) {
      val readLen = math.min(remaining, bufSize.toLong).toInt
      val n = ctx.evidence.readAt(offset, buf, 0, readLen)
      if (n == 0) return (written, true)
      md5.update(buf, 0, n)
      sha256.update(buf, 0, n)
      ctx.payloadSink.foreach(sink => sink(relPath, java.util.Arrays.copyOfRange(buf, 0, n), n))
      written += n
      offset += n
      remaining -= n
      if (n < readLen) return (written, true)
    }
    (written, false)
  }

  def globalEnd(globalStart: Long, size: Long): Long =
    if (size == 0) globalStart else globalStart + size - 1

  /** Assemble the final record (reference build_carved_file). */
  def carvedFile(
      ctx: ExtractionContext,
      fileType: String,
      extension: String,
      globalStart: Long,
      size: Long,
      md5Hex: String,
      sha256Hex: String,
      validated: Boolean,
      truncated: Boolean,
      errors: Seq[String],
      patternId: String): CarvedFile =
    CarvedFile(
      runId = ctx.runId,
      fileType = fileType,
      path = Naming.relPath(fileType, extension, globalStart),
      extension = extension,
      globalStart = globalStart,
      globalEnd = globalEnd(globalStart, size),
      size = size,
      md5 = md5Hex,
      sha256 = sha256Hex,
      validated = validated,
      truncated = truncated,
      errors = errors,
      patternId = patternId)
}

/** Shared shape for declared-size carvers: validate the header, compute a
  * target end, then writeRange + the standard min-size / flag handling
  * with `validated = !eofTruncated` (the 7z/lrf/elf/wmv/mobi/bmp/ico/tiff
  * family). Carvers with extra error strings or different validated
  * semantics override pieces.
  */
abstract class RangeCarver extends CarveHandler {
  def maxSize: Long
  def minSize: Long

  /** Parse headers; None ⇒ silently drop the hit. Returns
    * (carveStart, targetEnd, preErrors, preTruncated).
    */
  def plan(hit: CarveHit, ctx: ExtractionContext): Option[(Long, Long, Seq[String], Boolean)]

  /** Error to record when the evidence ends before targetEnd ("" = none). */
  def eofError: String = ""

  override def processHit(hit: CarveHit, ctx: ExtractionContext): Option[CarvedFile] = {
    val planned =
      try plan(hit, ctx)
      catch { case _: CarveErrors.Invalid => None }
    planned.flatMap { case (start, targetEnd0, preErrors, preTruncated) =>
      var targetEnd = targetEnd0
      if (maxSize > 0) targetEnd = math.min(targetEnd, start + maxSize)
      val relPath = Naming.relPath(fileType, extension, start)
      val md5 = MessageDigest.getInstance("MD5")
      val sha256 = MessageDigest.getInstance("SHA-256")
      val (written, eofTruncated) = CarveOps.writeRange(ctx, relPath, start, targetEnd, md5, sha256)
      if (written < minSize) None
      else {
        var errors = preErrors
        if (eofTruncated && eofError.nonEmpty) errors = errors :+ eofError
        val truncated = preTruncated || eofTruncated
        Some(CarveOps.carvedFile(
          ctx, fileType, extension, start, written,
          Hex.lower(md5.digest()), Hex.lower(sha256.digest()),
          validated = !truncated, truncated = truncated, errors = errors,
          patternId = hit.patternId))
      }
    }
  }
}
