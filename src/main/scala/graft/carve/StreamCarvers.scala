package graft.carve

import graft.core.CarvedFile
import java.security.MessageDigest

/** CarveStream-walking validators: the carver reads forward through the
  * stream (hashing as it goes) until it proves the end of the structure.
  * On Truncated/Eof the partial carve is kept with truncated=true; on
  * Invalid the hit is silently dropped. Some carvers add a post-hoc
  * "max_size reached" flag when the carve filled maxSize exactly
  * (reference: sqlite.rs/webp.rs/wav.rs/avi.rs do, png.rs/gif.rs don't).
  */
abstract class StreamCarver extends CarveHandler {
  def maxSize: Long
  def minSize: Long

  /** Walk the structure; set validated via return. Throws CarveErrors. */
  protected def walk(stream: CarveStream, hit: CarveHit): Boolean

  /** Whether to flag size >= maxSize after a successful walk. */
  protected def postMaxCheck: Boolean = true

  /** Drop hits that finish the walk unvalidated (mp3's sync-word rule). */
  protected def rejectUnvalidated: Boolean = false

  override def processHit(hit: CarveHit, ctx: ExtractionContext): Option[CarvedFile] = {
    val relPath = Naming.relPath(fileType, extension, hit.globalOffset)
    val stream = new CarveStream(ctx, relPath, hit.globalOffset, maxSize)
    var validated = false
    var truncated = false
    var errors = Vector.empty[String]
    try validated = walk(stream, hit)
    catch {
      case e: CarveErrors.Truncated => truncated = true; errors :+= e.getMessage
      case e: CarveErrors.Eof => truncated = true; errors :+= e.getMessage
      case _: CarveErrors.Invalid => return None
    }
    if (rejectUnvalidated && !validated && !truncated) return None
    val (size, md5Hex, shaHex) = stream.finish()
    if (size < minSize) return None
    if (postMaxCheck && maxSize > 0 && size >= maxSize) {
      truncated = true
      if (!errors.exists(_.contains("max_size"))) errors :+= "max_size reached"
    }
    Some(CarveOps.carvedFile(ctx, fileType, extension, hit.globalOffset, size,
      md5Hex, shaHex, validated, truncated, errors, hit.patternId))
  }
}

/** SQLite main file: exact size = page_size × page_count from the 100-byte
  * header (reference src/carve/sqlite.rs:35-144).
  */
final class SqliteCarver(val maxSize: Long, val minSize: Long, val extension: String = "sqlite")
    extends StreamCarver {
  override def fileType: String = "sqlite"
  private val Magic = "SQLite format 3\u0000".getBytes("ISO-8859-1")

  override protected def walk(stream: CarveStream, hit: CarveHit): Boolean = {
    val header = stream.readExact(100)
    if (!header.take(Magic.length).sameElements(Magic))
      throw new CarveErrors.Invalid("sqlite header mismatch")
    val pageSizeRaw = ((header(16) & 0xff) << 8) | (header(17) & 0xff)
    val pageSize = if (pageSizeRaw == 1) 65536L else pageSizeRaw.toLong
    if (pageSize < 512 || pageSize > 65536 || (pageSize & (pageSize - 1)) != 0)
      throw new CarveErrors.Invalid("sqlite page size invalid")
    val pageCount = Bin.beU32(header, 28)
    var totalSize = if (pageCount == 0) pageSize else pageSize * pageCount
    if (totalSize < 100) totalSize = 100
    val target = math.min(totalSize, if (maxSize > 0) maxSize else totalSize)
    val remaining = target - 100
    if (remaining > Int.MaxValue) // unlimited max_size + a huge header page count
      throw new CarveErrors.Invalid("sqlite declared size exceeds 2 GiB carve limit")
    if (remaining > 0) stream.readExact(remaining.toInt)
    true
  }
}

/** Shared RIFF-declared-size carver (reference src/carve/riff.rs):
  * total = le_u32@4 + 8; form type at bytes 8-12.
  */
abstract class RiffCarver(form: String) extends StreamCarver {
  private val Riff = "RIFF".getBytes("ISO-8859-1")
  private val Form = form.getBytes("ISO-8859-1")

  override protected def walk(stream: CarveStream, hit: CarveHit): Boolean = {
    val header = stream.readExact(12)
    if (!header.take(4).sameElements(Riff))
      throw new CarveErrors.Invalid("riff magic mismatch")
    if (!header.slice(8, 12).sameElements(Form))
      throw new CarveErrors.Invalid(s"$fileType form type mismatch")
    val totalSize = Bin.leU32(header, 4) + 8
    if (totalSize < 12) throw new CarveErrors.Invalid(s"$fileType size too small")
    val target = math.min(totalSize, if (maxSize > 0) maxSize else totalSize)
    val remaining = target - 12
    // declared RIFF sizes near 0xFFFFFFFF minus the cap can exceed a
    // JVM array; reject instead of wrapping .toInt negative
    if (remaining > Int.MaxValue)
      throw new CarveErrors.Invalid(s"$fileType declared size exceeds 2 GiB carve limit")
    if (remaining > 0) stream.readExact(remaining.toInt)
    true
  }
}

final class WavCarver(val maxSize: Long, val minSize: Long, val extension: String = "wav")
    extends RiffCarver("WAVE") { override def fileType: String = "wav" }

final class AviCarver(val maxSize: Long, val minSize: Long, val extension: String = "avi")
    extends RiffCarver("AVI ") { override def fileType: String = "avi" }

final class WebpCarver(val maxSize: Long, val minSize: Long, val extension: String = "webp")
    extends StreamCarver {
  override def fileType: String = "webp"
  override protected def walk(stream: CarveStream, hit: CarveHit): Boolean = {
    val header = stream.readExact(12)
    if (!header.take(4).sameElements("RIFF".getBytes("ISO-8859-1")) ||
        !header.slice(8, 12).sameElements("WEBP".getBytes("ISO-8859-1")))
      throw new CarveErrors.Invalid("webp header mismatch")
    val totalSize = Bin.leU32(header, 4) + 8
    if (totalSize < 12) throw new CarveErrors.Invalid("webp size invalid")
    val target = math.min(totalSize, if (maxSize > 0) maxSize else totalSize)
    val remaining = target - 12
    if (remaining > 0) stream.readExact(remaining.toInt)
    true
  }
}

/** PNG chunk walk to IEND: 4B len + 4B type + data + CRC per chunk
  * (reference src/carve/png.rs:35-125). No post max-size flag.
  */
final class PngCarver(val maxSize: Long, val minSize: Long, val extension: String = "png")
    extends StreamCarver {
  override def fileType: String = "png"
  override protected def postMaxCheck: Boolean = false
  private val Sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  override protected def walk(stream: CarveStream, hit: CarveHit): Boolean = {
    val sig = stream.readExact(8)
    if (!sig.sameElements(Sig)) throw new CarveErrors.Invalid("png signature mismatch")
    while (true) {
      val lenBytes = stream.readExact(4)
      val len = Bin.beU32(lenBytes, 0)
      val typBytes = stream.readExact(4)
      val chunkType = new String(typBytes, "ISO-8859-1")
      if (maxSize > 0 && len > maxSize) throw new CarveErrors.Truncated
      if (len > 0) stream.readExact(len.toInt)
      stream.readExact(4) // CRC
      if (chunkType == "IEND") return true
    }
    true
  }
}

/** GIF 87a/89a block walk to trailer 0x3B (reference src/carve/gif.rs:36-152). */
final class GifCarver(val maxSize: Long, val minSize: Long, val extension: String = "gif")
    extends StreamCarver {
  override def fileType: String = "gif"
  override protected def postMaxCheck: Boolean = false

  override protected def walk(stream: CarveStream, hit: CarveHit): Boolean = {
    val header = stream.readExact(6)
    val h = new String(header, "ISO-8859-1")
    if (h != "GIF87a" && h != "GIF89a") throw new CarveErrors.Invalid("gif header mismatch")
    val lsd = stream.readExact(7)
    val packed = lsd(4) & 0xff
    if ((packed & 0x80) != 0) {
      val sizePow = packed & 0x07
      stream.readExact((3L * (1L << (sizePow + 1))).toInt)
    }
    while (true) {
      val blockId = stream.readExact(1)(0) & 0xff
      blockId match {
        case 0x3b => return true
        case 0x21 =>
          stream.readExact(1) // label
          readSubBlocks(stream)
        case 0x2c =>
          val imageDesc = stream.readExact(9)
          val p = imageDesc(8) & 0xff
          if ((p & 0x80) != 0) {
            val sizePow = p & 0x07
            stream.readExact((3L * (1L << (sizePow + 1))).toInt)
          }
          stream.readExact(1) // LZW min code size
          readSubBlocks(stream)
        case _ => throw new CarveErrors.Invalid("gif block id invalid")
      }
    }
    true
  }

  private def readSubBlocks(stream: CarveStream): Unit = {
    var done = false
    while (!done) {
      val size = stream.readExact(1)(0) & 0xff
      if (size == 0) done = true else stream.readExact(size)
    }
  }
}

/** Byte-order helpers shared by carvers. */
object Bin {
  def leU16(b: Array[Byte], off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  def beU16(b: Array[Byte], off: Int): Int = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  def leU32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) | ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  def beU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) | ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  def leU64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }
  def beU64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }
  def leI32(b: Array[Byte], off: Int): Int = leU32(b, off).toInt
}
