package graft.evidence

import java.nio.ByteBuffer
import java.nio.ByteOrder
import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.zip.Inflater

/** Pure-JVM reader for EWF-E01 (Expert Witness Format / EnCase)
  * evidence images — the format a forensic user's acquisitions usually
  * arrive in. The reference reaches E01 through a libewf FFI binding
  * (src/evidence.rs:165-400); a JVM cluster can't assume a native
  * library on every executor, so this reads the container directly from
  * the public format structure: 13-byte segment header, a chain of
  * 76-byte section descriptors (adler32-checksummed), a `volume` section
  * carrying chunk geometry, `sectors` sections carrying chunk payloads,
  * and `table` sections whose 31-bit entries locate each chunk (MSB set
  * = zlib-compressed, otherwise raw bytes + trailing adler32).
  *
  * Multi-segment images are supported through the EnCase naming chain:
  * `parse(image.E01)` walks sibling segments (`.E02`, `.E03`, …) in
  * order; non-final segments terminate with a `next` section, the final
  * one with `done`, and each chunk entry remembers its segment. Scope
  * notes: EnCase-style volume (64-bit sector count at offset 16),
  * read-only; the EWF2 (.Ex01) container is out of scope — convert
  * off-cluster or extend `parseSegments`.
  */
object EwfReader {

  val Signature: Array[Byte] =
    Array(0x45, 0x56, 0x46, 0x09, 0x0d, 0x0a, 0xff, 0x00).map(_.toByte)

  /** One chunk's location: which segment file, where, how stored. */
  final case class ChunkEntry(segment: Int, dataOffset: Long, storedSize: Int, compressed: Boolean)

  /** Parsed image geometry. `chunkSize` = sectorsPerChunk ·
    * bytesPerSector; every chunk decodes to exactly `chunkSize` bytes
    * except the last, which decodes to the media remainder.
    */
  final case class Info(
      segmentPaths: Vector[String],
      chunkSize: Int,
      mediaSize: Long,
      chunks: Vector[ChunkEntry]) {
    require(chunkSize > 0, "ewf: chunk size must be positive")
    def chunkLogicalSize(idx: Int): Int =
      math.min(chunkSize.toLong, mediaSize - idx.toLong * chunkSize).toInt
  }

  /** Parse starting from the first segment; sibling segments are
    * discovered by the EnCase extension chain (.E01 → .E02 → …).
    */
  def parse(first: Path): Info = parseSegments(discoverSegments(first))

  /** EnCase segment naming: E01..E99, then EAA..EZZ. We generate the
    * successor of the current extension and stop at the first gap.
    */
  def discoverSegments(first: Path): Seq[Path] = {
    val name = first.getFileName.toString
    val dot = name.lastIndexOf('.')
    if (dot < 0) return Seq(first)
    val (stem, ext) = (name.substring(0, dot + 1), name.substring(dot + 1))
    def next(e: String): Option[String] = {
      if (e.length != 3) return None
      val upper = e == e.toUpperCase(java.util.Locale.ROOT)
      val u = e.toUpperCase(java.util.Locale.ROOT)
      val succ: Option[String] =
        if (u(0) == 'E' && u(1).isDigit && u(2).isDigit) {
          val n = (u(1) - '0') * 10 + (u(2) - '0')
          if (n < 99) Some(f"E${n + 1}%02d") else Some("EAA")
        } else if (u(0) == 'E' && u(1).isLetter && u(2).isLetter) {
          if (u(2) < 'Z') Some(s"E${u(1)}${(u(2) + 1).toChar}")
          else if (u(1) < 'Z') Some(s"E${(u(1) + 1).toChar}A")
          else None
        } else None
      succ.map(s => if (upper) s else s.toLowerCase(java.util.Locale.ROOT))
    }
    val out = Vector.newBuilder[Path]
    out += first
    var cur = ext
    var continue = true
    while (continue) {
      next(cur) match {
        case Some(e) =>
          val p = first.resolveSibling(stem + e)
          if (Files.isRegularFile(p)) { out += p; cur = e }
          else continue = false
        case None => continue = false
      }
    }
    out.result()
  }

  def parseSegments(paths: Seq[Path]): Info = {
    require(paths.nonEmpty, "ewf: no segment files")
    var geometry: Option[(Int, Long)] = None
    var declaredChunks = 0L
    var sawDeclared = false
    val chunks = Vector.newBuilder[ChunkEntry]
    paths.zipWithIndex.foreach { case (p, segIdx) =>
      val ch = FileChannel.open(p, StandardOpenOption.READ)
      val seg =
        try parseOneSegment(ch, p.toString, segIdx, isLast = segIdx == paths.length - 1)
        finally ch.close()
      seg.geometry.foreach { g =>
        geometry.foreach(prev => require(prev == g, s"ewf: segment geometry mismatch in $p"))
        geometry = Some(g)
      }
      if (seg.declaredChunks >= 0) { declaredChunks += seg.declaredChunks; sawDeclared = true }
      chunks ++= seg.chunks
    }
    val (chunkSize, mediaSize) = geometry.getOrElse(
      throw new IllegalArgumentException(s"ewf: no volume section in ${paths.head}"))
    val all = chunks.result()
    // EnCase re-states the TOTAL chunk count in every volume section, so
    // only validate when it was seen exactly once (the usual layout:
    // volume in segment 1 only)
    require(!sawDeclared || declaredChunks == all.length.toLong || paths.length > 1,
      s"ewf: table has ${all.length} chunks, volume declares $declaredChunks")
    require(all.length.toLong * chunkSize >= mediaSize,
      s"ewf: chunk table too short for media size (${all.length} chunks of $chunkSize for $mediaSize)")
    Info(paths.map(_.toString).toVector, chunkSize, mediaSize, all)
  }

  private final case class SegmentParse(
      geometry: Option[(Int, Long)],
      declaredChunks: Long,
      chunks: Vector[ChunkEntry])

  private def parseOneSegment(
      ch: FileChannel, name: String, segIdx: Int, isLast: Boolean): SegmentParse = {
    val fileLen = ch.size()
    val header = readExact(ch, 0L, 13)
    require(header.take(8).sameElements(Signature), s"ewf: bad signature in $name")
    require(header(8) == 1, s"ewf: unexpected fields_start in $name")
    val segmentNumber = ByteBuffer.wrap(header, 9, 2).order(ByteOrder.LITTLE_ENDIAN).getShort.toInt
    require(segmentNumber == segIdx + 1,
      s"ewf: $name carries segment number $segmentNumber, expected ${segIdx + 1}")

    var off = 13L
    var geometry: Option[(Int, Long)] = None
    var declaredChunks = -1L
    val sectorsRanges = Vector.newBuilder[(Long, Long)]
    val tableEntries = Vector.newBuilder[(Long, Boolean)]
    var terminator: Option[String] = None
    while (terminator.isEmpty && off + 76 <= fileLen) {
      val desc = readExact(ch, off, 76)
      val bb = ByteBuffer.wrap(desc).order(ByteOrder.LITTLE_ENDIAN)
      val typeBytes = new Array[Byte](16); bb.get(typeBytes)
      val sectionType = new String(typeBytes.takeWhile(_ != 0), "US-ASCII")
      val next = bb.getLong(16)
      val size = bb.getLong(24)
      val storedCrc = bb.getInt(72)
      require(storedCrc == adler32(desc, 0, 72).toInt,
        s"ewf: section descriptor checksum mismatch at $off in $name")
      val dataStart = off + 76
      val dataEnd = off + math.max(size, 76L)
      sectionType match {
        case "volume" | "disk" =>
          val v = readExact(ch, dataStart, math.min(dataEnd - dataStart, 1052L).toInt)
          val vb = ByteBuffer.wrap(v).order(ByteOrder.LITTLE_ENDIAN)
          declaredChunks = vb.getInt(4).toLong & 0xffffffffL
          val sectorsPerChunk = vb.getInt(8).toLong & 0xffffffffL
          val bytesPerSector = vb.getInt(12).toLong & 0xffffffffL
          val sectorCount = vb.getLong(16)
          require(sectorsPerChunk > 0 && bytesPerSector > 0,
            s"ewf: invalid volume geometry in $name")
          geometry = Some(((sectorsPerChunk * bytesPerSector).toInt, sectorCount * bytesPerSector))
        case "sectors" =>
          sectorsRanges += ((dataStart, dataEnd))
        case "table" =>
          // header: u32 entry_count, pad4, u64 base, pad4, u32 checksum;
          // then entry_count u32 entries (MSB = compressed), u32 checksum
          val th = readExact(ch, dataStart, 24)
          val tb = ByteBuffer.wrap(th).order(ByteOrder.LITTLE_ENDIAN)
          val n = tb.getInt(0)
          val base = tb.getLong(8)
          require(n >= 0 && dataStart + 24 + 4L * n <= fileLen,
            s"ewf: table overruns file in $name")
          val ents = readExact(ch, dataStart + 24, 4 * n)
          val eb = ByteBuffer.wrap(ents).order(ByteOrder.LITTLE_ENDIAN)
          (0 until n).foreach { i =>
            val e = eb.getInt(4 * i)
            tableEntries += ((base + (e & 0x7fffffffL), (e & 0x80000000L) != 0))
          }
        case "table2" => // mirror of table — primary already collected
        case _ => // header/header2/data/hash: no chunk data
      }
      if (sectionType == "done" || sectionType == "next" || next <= off)
        terminator = Some(sectionType)
      else off = next
    }
    // a segment must end in done (final) / next (more segments follow);
    // running off the end of the file means a truncated acquisition
    terminator match {
      case Some("done") => require(isLast,
        s"ewf: $name ends with 'done' but more segments were given")
      case Some("next") => require(!isLast,
        s"ewf: $name ends with 'next' but no ${segIdx + 2}th segment exists")
      case Some(other) => throw new IllegalArgumentException(
        s"ewf: segment $name ends in unexpected section '$other'")
      case None => throw new IllegalArgumentException(
        s"ewf: no done/next terminator — truncated segment $name")
    }

    val ranges = sectorsRanges.result()
    val offsets = tableEntries.result()
    // stored size = gap to the next chunk in the same sectors section,
    // or to that section's end for the final chunk of a section. Table
    // entries are ascending (chunks are written sequentially), so the
    // in-section successor is found with a short forward probe — the
    // drop(i+1).find(...) form was O(chunks²) and re-allocated a
    // collection per entry (a 64k-chunk segment cost ~2e9 comparisons
    // per parse).
    val offArr = offsets.map(_._1)
    val chunks = offsets.zipWithIndex.map { case ((o, comp), i) =>
      val sectionEnd = ranges.find(r => o >= r._1 && o < r._2).map(_._2).getOrElse(fileLen)
      var j = i + 1
      while (j < offArr.length && offArr(j) <= o) j += 1
      val nextOff =
        if (j < offArr.length && offArr(j) <= sectionEnd) offArr(j) else sectionEnd
      ChunkEntry(segIdx, o, (nextOff - o).toInt, comp)
    }
    SegmentParse(geometry, declaredChunks, chunks)
  }

  private def readExact(ch: FileChannel, off: Long, len: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(len)
    var pos = off
    while (buf.hasRemaining) {
      val n = ch.read(buf, pos)
      require(n > 0, s"ewf: truncated file at offset $pos")
      pos += n
    }
    buf.array()
  }

  private[evidence] def adler32(data: Array[Byte], off: Int, len: Int): Long = {
    val a = new java.util.zip.Adler32
    a.update(data, off, len)
    a.getValue
  }
}

/** EvidenceReader over a parsed E01: chunk-granular decompression with a
  * one-chunk cache (scan access is sequential within a task, so each
  * chunk inflates once per task even though readAt is range-oriented).
  * Segment channels open lazily — a task reading one chunk range touches
  * only the segment files that range lives in.
  */
final class EwfEvidence(info: EwfReader.Info) extends EvidenceReader {
  private val channels = new Array[FileChannel](info.segmentPaths.length)
  private var cachedIdx = -1
  private var cached: Array[Byte] = Array.emptyByteArray

  private def channel(seg: Int): FileChannel = {
    if (channels(seg) == null)
      channels(seg) = FileChannel.open(Paths.get(info.segmentPaths(seg)), StandardOpenOption.READ)
    channels(seg)
  }

  override def length: Long = info.mediaSize

  override def readAt(offset: Long, buf: Array[Byte], bufOff: Int, len: Int): Int = {
    if (offset >= info.mediaSize || len <= 0) return 0
    val idx = (offset / info.chunkSize).toInt
    val chunk = loadChunk(idx)
    val within = (offset - idx.toLong * info.chunkSize).toInt
    // one chunk per call: short reads are allowed by the contract and the
    // caller's loop crosses chunk boundaries naturally
    val n = math.min(len, chunk.length - within)
    System.arraycopy(chunk, within, buf, bufOff, n)
    n
  }

  private def loadChunk(idx: Int): Array[Byte] = {
    if (idx != cachedIdx) {
      val entry = info.chunks(idx)
      val logical = info.chunkLogicalSize(idx)
      val stored = new Array[Byte](entry.storedSize)
      val bb = ByteBuffer.wrap(stored)
      val ch = channel(entry.segment)
      var pos = entry.dataOffset
      while (bb.hasRemaining) {
        val n = ch.read(bb, pos)
        require(n > 0, s"ewf: truncated chunk $idx")
        pos += n
      }
      val out = new Array[Byte](logical)
      if (entry.compressed) {
        val inf = new Inflater()
        inf.setInput(stored)
        var got = 0
        while (got < logical && !inf.finished()) {
          val n = inf.inflate(out, got, logical - got)
          require(n > 0 || inf.finished(), s"ewf: bad zlib stream in chunk $idx")
          got += n
        }
        inf.end()
        require(got == logical, s"ewf: chunk $idx inflated to $got of $logical bytes")
      } else {
        // raw chunk: payload + trailing u32le adler32
        require(entry.storedSize >= logical + 4, s"ewf: raw chunk $idx too small")
        System.arraycopy(stored, 0, out, 0, logical)
        val want = ByteBuffer.wrap(stored, logical, 4)
          .order(ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xffffffffL
        require(EwfReader.adler32(out, 0, logical) == want,
          s"ewf: chunk $idx checksum mismatch")
      }
      cached = out
      cachedIdx = idx
    }
    cached
  }

  override def close(): Unit = channels.foreach(c => if (c != null) c.close())
}

/** Serializable descriptor for E01 evidence on shared storage: only the
  * path ships with the task closure (a 100 TB image's chunk table would
  * be gigabytes — too big to embed), and each JVM parses the
  * section/table geometry ONCE into a process-level cache; every task
  * on that executor reuses it and re-opens just the segment
  * FileChannels. `path` is the FIRST segment; siblings are discovered
  * by naming.
  */
final case class EwfRef(path: String) extends EvidenceRef {
  override def open(): EvidenceReader = new EwfEvidence(EwfRef.infoFor(path))
  def mediaSize: Long = EwfRef.infoFor(path).mediaSize
}

object EwfRef {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, EwfReader.Info]()
  private def infoFor(path: String): EwfReader.Info =
    cache.computeIfAbsent(path, p => EwfReader.parse(Paths.get(p)))
}

/** Container-format dispatch (reference `open_source`,
  * src/evidence.rs:402-420): "raw" and "ewf" select explicitly; "auto"
  * sniffs the 8-byte EWF signature so `.E01` acquisitions and raw `.dd`
  * images flow through the same entry points (Ingest, the DSv2 source)
  * with no flag.
  */
object EvidenceOpen {
  def ref(path: String, format: String = "auto"): EvidenceRef =
    format.toLowerCase(java.util.Locale.ROOT) match {
      case "raw" => RawFileRef(path)
      case "ewf" => EwfRef(path)
      case "auto" => if (isEwf(path)) EwfRef(path) else RawFileRef(path)
      case other => throw new IllegalArgumentException(
        s"unknown evidence format '$other' (raw | ewf | auto)")
    }

  def isEwf(path: String): Boolean = {
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    try {
      val bb = ByteBuffer.allocate(8)
      var n = 0
      while (bb.hasRemaining && n >= 0) n = ch.read(bb, bb.position().toLong)
      bb.position() == 8 && bb.array().sameElements(EwfReader.Signature)
    } finally ch.close()
  }
}
