package graft.carve

/** Declared-size carvers: the header alone determines the extent; the
  * payload is then ranged-copied with EOF tolerance. validated == no
  * truncation (reference sevenz.rs / lrf.rs / elf.rs / wmv.rs / mobi.rs /
  * bmp.rs all end `validated: !truncated`).
  */

/** 7-Zip: fixed 32-byte start header; size = 32 + next_header_offset +
  * next_header_size (reference src/carve/sevenz.rs:39-133).
  */
final class SevenZCarver(val maxSize: Long, val minSize: Long, val extension: String = "7z")
    extends RangeCarver {
  override def fileType: String = "7z"
  private val Magic = Array(0x37, 0x7a, 0xbc, 0xaf, 0x27, 0x1c).map(_.toByte)
  override def eofError: String = "eof before 7z end"

  override def plan(hit: CarveHit, ctx: ExtractionContext): Option[(Long, Long, Seq[String], Boolean)] = {
    val header = ctx.evidence.readExactAt(hit.globalOffset, 32).getOrElse(return None)
    if (!header.take(6).sameElements(Magic)) return None
    val nextHeaderOffset = Bin.leU64(header, 12)
    val nextHeaderSize = Bin.leU64(header, 20)
    var totalSize = 32L + nextHeaderOffset + nextHeaderSize
    if (totalSize < 32) return None
    var errors = Seq.empty[String]
    var preTruncated = false
    if (maxSize > 0 && totalSize > maxSize) {
      totalSize = maxSize
      preTruncated = true
      errors = Seq("max_size reached before 7z end")
    }
    Some((hit.globalOffset, hit.globalOffset + totalSize, errors, preTruncated))
  }
}

/** LRF ebook: declared u32 size @8; 0 ⇒ fall back to max_size then 1024
  * (reference src/carve/lrf.rs:41-115). No eof error string.
  */
final class LrfCarver(val maxSize: Long, val minSize: Long, val extension: String = "lrf")
    extends RangeCarver {
  override def fileType: String = "lrf"
  private val Magic = Array('L'.toByte, 'R'.toByte, 'F'.toByte, 0.toByte)

  override def plan(hit: CarveHit, ctx: ExtractionContext): Option[(Long, Long, Seq[String], Boolean)] = {
    val header = ctx.evidence.readExactAt(hit.globalOffset, 12)
      .getOrElse(throw new CarveErrors.Invalid("lrf header too short"))
    if (!header.take(4).sameElements(Magic)) return None
    val declared = Bin.leU32(header, 8)
    var size = if (declared > 0) declared else 0L
    if (maxSize > 0 && (size == 0 || size > maxSize)) size = maxSize
    if (size == 0) size = 1024
    Some((hit.globalOffset, hit.globalOffset + size, Seq.empty, false))
  }

}

/** ELF: size = max(e_phoff + phentsize*phnum, e_shoff + shentsize*shnum)
  * for 32/64-bit, LE/BE (reference src/carve/elf.rs:41-144).
  */
final class ElfCarver(val maxSize: Long, val minSize: Long, val extension: String = "elf")
    extends RangeCarver {
  override def fileType: String = "elf"
  private val Magic = Array(0x7f, 'E', 'L', 'F').map(_.toByte)

  override def plan(hit: CarveHit, ctx: ExtractionContext): Option[(Long, Long, Seq[String], Boolean)] = {
    val h = ctx.evidence.readExactAt(hit.globalOffset, 64)
      .getOrElse(throw new CarveErrors.Invalid("elf header too short"))
    if (!h.take(4).sameElements(Magic)) return None
    val elfClass = h(4) & 0xff
    val endian = h(5) & 0xff
    if (elfClass != 1 && elfClass != 2) return None
    if (endian != 1 && endian != 2) return None
    def u16(off: Int): Long = (if (endian == 1) Bin.leU16(h, off) else Bin.beU16(h, off)).toLong
    def u32(off: Int): Long = if (endian == 1) Bin.leU32(h, off) else Bin.beU32(h, off)
    def u64(off: Int): Long = if (endian == 1) Bin.leU64(h, off) else Bin.beU64(h, off)
    val (phoff, phentsize, phnum, shoff, shentsize, shnum) =
      if (elfClass == 1) (u32(28), u16(42), u16(44), u32(32), u16(46), u16(48))
      else (u64(32), u16(54), u16(56), u64(40), u16(58), u16(60))
    var size = 0L
    if (phoff > 0 && phentsize > 0 && phnum > 0) size = math.max(size, phoff + phentsize * phnum)
    if (shoff > 0 && shentsize > 0 && shnum > 0) size = math.max(size, shoff + shentsize * shnum)
    if (size == 0) size = 64
    Some((hit.globalOffset, hit.globalOffset + size, Seq.empty, false))
  }

}

/** ASF/WMV: header GUID + object walk to the File Properties object,
  * declared file size @+40 (reference src/carve/wmv.rs:46-148).
  */
final class WmvCarver(val maxSize: Long, val minSize: Long, val extension: String = "wmv")
    extends RangeCarver {
  override def fileType: String = "wmv"
  private val HeaderGuid = Hex.decode("3026B2758E66CF11A6D900AA0062CE6C")
  private val FilePropGuid = Hex.decode("A1DCAB8C47A9CF118EE400C00C205365")

  override def plan(hit: CarveHit, ctx: ExtractionContext): Option[(Long, Long, Seq[String], Boolean)] = {
    val header = ctx.evidence.readExactAt(hit.globalOffset, 30)
      .getOrElse(throw new CarveErrors.Invalid("asf header too short"))
    if (!header.take(16).sameElements(HeaderGuid)) return None
    val headerSize = Bin.leU64(header, 16)
    var fileSize: Option[Long] = None
    var offset = hit.globalOffset + 30
    val headerEnd = hit.globalOffset + headerSize
    var done = false
    while (!done && offset + 24 <= headerEnd) {
      val obj = ctx.evidence.readExactAt(offset, 24)
        .getOrElse(throw new CarveErrors.Invalid("asf object truncated"))
      val objSize = Bin.leU64(obj, 16)
      if (objSize < 24) done = true
      else if (obj.take(16).sameElements(FilePropGuid)) {
        ctx.evidence.readExactAt(offset + 40, 8).foreach { bytes =>
          fileSize = Some(Bin.leU64(bytes, 0))
        }
        done = true
      } else offset += objSize
    }
    val totalEnd = fileSize.map(hit.globalOffset + _).getOrElse(headerEnd)
    Some((hit.globalOffset, totalEnd, Seq.empty, false))
  }

}

/** MOBI/PDB: hit on "BOOKMOBI"@60 rebased −60; 8-byte record directory;
  * size = last record offset + estimated last-record size
  * (reference src/carve/mobi.rs:43-156).
  */
final class MobiCarver(val maxSize: Long, val minSize: Long, val extension: String = "mobi")
    extends RangeCarver {
  override def fileType: String = "mobi"
  private val Magic = "BOOKMOBI".getBytes("ISO-8859-1")
  private val PdbHeaderLen = 78

  override def plan(hit: CarveHit, ctx: ExtractionContext): Option[(Long, Long, Seq[String], Boolean)] = {
    val start =
      if (hit.patternId == "mobi_pdb") {
        if (hit.globalOffset < 60) return None
        hit.globalOffset - 60
      } else hit.globalOffset
    val header = ctx.evidence.readExactAt(start, PdbHeaderLen)
      .getOrElse(throw new CarveErrors.Invalid("pdb header too short"))
    if (!header.slice(60, 68).sameElements(Magic)) return None
    val recordCount = Bin.beU16(header, 76)
    if (recordCount == 0 || recordCount > 4096) return None
    val recordListLen = recordCount * 8
    val recordList = ctx.evidence.readExactAt(start + PdbHeaderLen, recordListLen)
      .getOrElse(throw new CarveErrors.Invalid("pdb record list truncated"))
    val offsets = (0 until recordCount).map(i => Bin.beU32(recordList, i * 8)).sorted
    if (offsets.head < PdbHeaderLen + recordListLen) return None
    val lastOffset = offsets.last
    val estLastSize =
      if (offsets.length >= 2) math.max(lastOffset - offsets(offsets.length - 2), 1L)
      else 4096L
    var totalSize = lastOffset + estLastSize
    if (maxSize > 0) totalSize = math.min(totalSize, maxSize)
    Some((start, start + totalSize, Seq.empty, false))
  }

}

/** BMP: declared file size @2 with DIB/dimension/bpp plausibility gates
  * (reference src/carve/bmp.rs:54-165). Flags max-size clamp explicitly.
  */
final class BmpCarver(val maxSize: Long, val minSize: Long, val extension: String = "bmp")
    extends RangeCarver {
  override def fileType: String = "bmp"
  private val ValidDib = Set(12L, 40L, 52L, 56L, 108L, 124L)
  private val MaxDimension = 32768L
  private val BmpHeaderLen = 14L
  override def eofError: String = "eof before BMP end"

  override def plan(hit: CarveHit, ctx: ExtractionContext): Option[(Long, Long, Seq[String], Boolean)] = {
    // looped prefix read: a single readAt may legally return short
    // (EWF serves one chunk per call) and would drop a valid BMP whose
    // header straddles a chunk boundary
    val buf = Scan.readPrefix(ctx, hit.globalOffset, 58)
    val n = buf.length
    if (n < 18) return None
    if (buf(0) != 'B'.toByte || buf(1) != 'M'.toByte) return None
    val fileSize = Bin.leU32(buf, 2)
    val pixelOffset = Bin.leU32(buf, 10)
    if (fileSize < BmpHeaderLen || pixelOffset < BmpHeaderLen || pixelOffset > fileSize) return None
    val dibSize = Bin.leU32(buf, 14)
    if (!ValidDib.contains(dibSize)) return None
    if (pixelOffset < BmpHeaderLen + dibSize) return None
    if (dibSize >= 40 && n >= 26) {
      val width = Bin.leI32(buf, 18)
      val height = Bin.leI32(buf, 22)
      val absWidth = math.abs(width.toLong)
      val absHeight = math.abs(height.toLong)
      if (width <= 0 || absWidth > MaxDimension || absHeight > MaxDimension) return None
      if (n >= 30) {
        val bpp = Bin.leU16(buf, 28)
        if (!Set(1, 4, 8, 16, 24, 32).contains(bpp)) return None
        val rowSize = ((absWidth * bpp + 31) / 32) * 4
        val pixelDataSize = rowSize * absHeight
        val minExpected = pixelOffset + pixelDataSize
        if (fileSize < math.max(0L, minExpected - 1024)) return None
      }
    }
    var errors = Seq.empty[String]
    var preTruncated = false
    var end = hit.globalOffset + fileSize
    if (maxSize > 0 && fileSize > maxSize) {
      end = hit.globalOffset + maxSize
      preTruncated = true
      errors = Seq("max_size reached before BMP end")
    }
    Some((hit.globalOffset, end, errors, preTruncated))
  }
}
