package graft.sources

import java.nio.charset.StandardCharsets

import graft.evidence.{EvidenceReader, RawFileEvidence}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, decode, explode, expr, least, lit}
import org.apache.spark.sql.types._

/** WARC (ISO 28500) corpus reader — the crawl-archive ingest every
  * web-scale training pipeline starts from (Common Crawl ships WARC /
  * WET; a WET "conversion" record is plain-text payload under the same
  * framing this reader parses). Two physical layouts, same schema:
  *
  *   - [[read]]/[[readMany]] — uncompressed archives.
  *   - [[readGz]]/[[readGzMany]] — per-record-gzip archives
  *     (`.warc.gz`, the format Common Crawl actually ships): each
  *     record is its own gzip MEMBER, members concatenated, so record
  *     starts are findable by the gzip magic exactly as the carve
  *     pipeline's gzip heuristic finds embedded streams
  *     (reference src/carve/gzip.rs:42-217).
  *
  * Architecture: the signature-scan DAG, not a sequential reader. The
  * archive is chunked ([[graft.core.ChunkPlanner]] — same plan as the
  * evidence scan), each task scans its chunk's bytes for the record
  * anchor (`WARC/1.x` version line, or the gzip member magic) and
  * keeps only anchors it OWNS (`localOffset < validLength` — the
  * overlap-dedup predicate, so a record straddling a boundary is
  * parsed exactly once), then parses the bounded header block and
  * reads `Content-Length` payload bytes by random access (the carve
  * pipeline's cross-chunk read discipline — headers, payloads, and
  * compressed members may extend past the chunk, tasks re-open the
  * archive, nothing is buffered whole). One narrow pass over the
  * archive bytes plus per-record bounded reads; parallelism == chunk
  * count; no driver-side materialization anywhere.
  *
  * Robustness contract: a corrupt record (missing/unparseable
  * `Content-Length`, unterminated header block, payload running past
  * EOF, payload over the cap, unsupported WARC version, corrupt or
  * CRC-failing gzip member) becomes a quarantine ROW (`error` set,
  * `payload` NULL) — and because records are FOUND by anchor scan, not
  * by chaining lengths, parsing resynchronizes at the next record
  * unaided, where a sequential reader loses the rest of the file behind
  * one bad length. An archive whose byte 0 is NOT a record anchor
  * (a non-WARC file, a legacy `WARC/0.x`, or a gzip archive handed to
  * the plain reader) emits a quarantine row at offset 0 instead of
  * silently parsing as zero records — the data-loss shape a crawl
  * batch must never ledger-commit. The flip side, documented: payload
  * bytes that themselves contain the anchor (a WARC archived inside a
  * WARC) surface as extra parse attempts — spurious rows a caller
  * deduplicates by offset containment if its corpus can hold nested
  * archives ([[WarcSpec]] pins the behavior). On the gz path a false-
  * positive magic inside compressed bytes is skipped silently (it
  * fails the gzip header/CRC long before producing a `WARC/` prefix);
  * only members that demonstrably held a record quarantine — so a
  * member whose FIRST compressed bytes are damaged is indistinguishable
  * from a false positive and is lost without a row, the one corruption
  * class the magic-scan design cannot see.
  *
  * Columns: (record_offset, warc_type, target_uri, record_id,
  * content_length, payload BINARY, error). Payload is BINARY because
  * `response`/`resource` records carry arbitrary bytes (HTML, images —
  * a WARC full of JPEGs must round-trip byte-exact into the carve
  * pipeline); decode WET text downstream via [[payloadText]] /
  * [[text]].
  */
object WarcCorpus {

  /** Version-line anchor prefix: accepts any `WARC/1.<digits>\r\n`
    * shape at scan time (1.0 and 1.1 are the published revisions and
    * parse; other 1.x minors quarantine with an explicit error — never
    * silently zero records). The digit run is bounded at
    * [[MaxVersionDigits]] = 9 so the chunk-overlap tail stays finite;
    * a minor version wider than NINE digits is not a credible version
    * line and is treated as not-an-anchor (invisible), not quarantined
    * — the one documented exception to the quarantine contract.
    */
  private val AnchorPrefix: Array[Byte] = "WARC/1.".getBytes(StandardCharsets.US_ASCII)
  private val MaxVersionDigits = 9
  /** Longest version line the scan must see whole: prefix + digits + CRLF. */
  private val MaxAnchorSpan: Int = AnchorPrefix.length + MaxVersionDigits + 2
  /** Gzip member magic + deflate method byte; +FLG byte checked at scan. */
  private val GzMagic: Array[Byte] = Array(0x1f.toByte, 0x8b.toByte, 0x08.toByte)

  val schema: StructType = StructType(Seq(
    StructField("record_offset", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("content_length", LongType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("error", StringType, nullable = true)))

  /** UTF-8 view of the binary payload — the WET-conversion text
    * column (codegen'd `decode`, malformed sequences → U+FFFD).
    */
  def payloadText: Column = decode(col("payload"), "UTF-8")

  /** Adds `payload_text` (UTF-8 decode of `payload`) — the one-liner
    * bridge from a parsed WET archive to every text operator.
    */
  def text(parsed: DataFrame): DataFrame =
    parsed.withColumn("payload_text", payloadText)

  /** Parse every WARC record in an UNCOMPRESSED archive. `chunkSize`
    * sizes the scan tasks (64 MiB default — at 100 TB that is ~1.6M
    * tasks of one narrow byte pass each); `maxHeaderBytes` bounds the
    * header block a record may claim; `maxPayloadBytes` bounds a single
    * record's payload (oversized records quarantine instead of OOMing a
    * task).
    */
  def read(spark: SparkSession, path: String,
           chunkSize: Long = 64L * 1024 * 1024,
           maxHeaderBytes: Int = 8192,
           maxPayloadBytes: Int = 4 * 1024 * 1024): DataFrame =
    readMany(spark, Seq(path), chunkSize, maxHeaderBytes, maxPayloadBytes)
      .drop("archive")

  /** Parse MANY uncompressed archives as ONE relation — the
    * multi-archive front door. One distributed chunk plan covers every
    * archive (archive metadata joins the chunk explode in-plan), so a
    * 100k-archive drop is a single scan stage — NOT a 100k-leaf union,
    * whose left-nested plan overflows the analyzer stack orders of
    * magnitude below that bound. A missing or empty archive is an
    * ERROR, not an empty result: `File.length()` returns 0 for both,
    * and a crawl batch that silently parses a typo'd path as zero
    * records then ledger-commits is data loss. Adds an `archive` column
    * (the source path) to [[schema]].
    */
  def readMany(spark: SparkSession, paths: Seq[String],
               chunkSize: Long = 64L * 1024 * 1024,
               maxHeaderBytes: Int = 8192,
               maxPayloadBytes: Int = 4 * 1024 * 1024): DataFrame = {
    require(maxHeaderBytes >= 64 && maxPayloadBytes >= 0,
      "header/payload caps must be sane")
    // downstream Html chains (charset decode, entity decode) resolve
    // their codec functions in this session
    graft.functions.TextFunctions.register(spark)
    val rows = scanChunks(spark, paths, chunkSize, (MaxAnchorSpan - 1).toLong) {
      (reader, archive, alen, start, vlen, buf, got) =>
        val anchors = anchorOffsets(buf, got).filter(_ < vlen)
        val recs = anchors.iterator.map(local => parseRecord(
          reader, alen, start + local, maxHeaderBytes, maxPayloadBytes, archive))
        // byte 0 of a valid archive IS a version line; surfacing its
        // absence as a quarantine row keeps "zero records from a
        // non-empty file" impossible (the silent-data-loss shape)
        if (start == 0L && !anchors.headOption.contains(0L))
          Iterator.single(Row(0L, null, null, null, null, null,
            if (got >= GzMagic.length && buf(0) == GzMagic(0) && buf(1) == GzMagic(1))
              "archive begins with a gzip member — use readGz for .warc.gz"
            else
              "archive does not begin with a WARC/1.x version line — " +
                "not a WARC archive, or an unsupported version",
            archive)) ++ recs
        else recs
    }
    spark.createDataFrame(rows,
      schema.add(StructField("archive", StringType, nullable = false)))
  }

  /** Parse a PER-RECORD-GZIP archive (`.warc.gz`) — one gzip member per
    * record, members concatenated (the Common Crawl layout).
    */
  def readGz(spark: SparkSession, path: String,
             chunkSize: Long = 64L * 1024 * 1024,
             maxHeaderBytes: Int = 8192,
             maxPayloadBytes: Int = 4 * 1024 * 1024): DataFrame =
    readGzMany(spark, Seq(path), chunkSize, maxHeaderBytes, maxPayloadBytes)
      .drop("archive")

  /** [[readMany]] for per-record-gzip archives. Chunks scan for the
    * gzip member magic (`1F 8B 08` + clean FLG reserved bits — the
    * gzip carver's heuristic, `carve/ScanCarvers.scala` GzipCarver);
    * each owned hit inflates MEMBER-WISE with bounded cross-chunk
    * reads (output capped at header+payload budget, CRC32 + ISIZE
    * verified against the member trailer) and the inflated bytes parse
    * as exactly one record. `record_offset` is the member's COMPRESSED
    * start offset — the re-fetchable address in the archive.
    */
  def readGzMany(spark: SparkSession, paths: Seq[String],
                 chunkSize: Long = 64L * 1024 * 1024,
                 maxHeaderBytes: Int = 8192,
                 maxPayloadBytes: Int = 4 * 1024 * 1024): DataFrame = {
    require(maxHeaderBytes >= 64 && maxPayloadBytes >= 0,
      "header/payload caps must be sane")
    graft.functions.TextFunctions.register(spark)
    val rows = scanChunks(spark, paths, chunkSize, GzMagic.length.toLong) {
      (reader, archive, alen, start, vlen, buf, got) =>
        val members = gzMemberOffsets(buf, got).filter(_ < vlen)
        val recs = members.iterator.flatMap { local =>
          val r = parseGzMember(reader, alen, start + local,
            maxHeaderBytes, maxPayloadBytes, archive)
          // a skipped FIRST member is not a false positive — byte 0 of
          // a .warc.gz IS a member, so a header/stream too damaged to
          // even look like a record still surfaces (the zero-records
          // silence rule, gz edition)
          if (r.isEmpty && start + local == 0L)
            Some(Row(0L, null, null, null, null, null,
              "gzip member at offset 0 is truncated or corrupt", archive))
          else r
        }
        if (start == 0L && !members.headOption.contains(0L))
          Iterator.single(Row(0L, null, null, null, null, null,
            if (got >= AnchorPrefix.length &&
                java.util.Arrays.equals(
                  java.util.Arrays.copyOf(buf, AnchorPrefix.length), AnchorPrefix))
              "archive begins with a plain WARC version line — use read"
            else
              "archive does not begin with a gzip member — not a .warc.gz",
            archive)) ++ recs
        else recs
    }
    spark.createDataFrame(rows,
      schema.add(StructField("archive", StringType, nullable = false)))
  }

  /** Parse a MIXED drop: sniffs each archive's leading bytes (driver-
    * side, 4 bytes per path — operations metadata, bounded like the
    * path list itself) and routes it to the plain or the gz plan; the
    * two relations union (two leaves, not per-archive). The front door
    * for manifests that interleave `.warc` and `.warc.gz`.
    */
  def readAuto(spark: SparkSession, paths: Seq[String],
               chunkSize: Long = 64L * 1024 * 1024,
               maxHeaderBytes: Int = 8192,
               maxPayloadBytes: Int = 4 * 1024 * 1024): DataFrame = {
    require(paths.nonEmpty, "readAuto needs at least one archive")
    val (gz, plain) = paths.partition(isGzArchive)
    val parts = Seq(
      if (plain.nonEmpty)
        Some(readMany(spark, plain, chunkSize, maxHeaderBytes, maxPayloadBytes))
      else None,
      if (gz.nonEmpty)
        Some(readGzMany(spark, gz, chunkSize, maxHeaderBytes, maxPayloadBytes))
      else None).flatten
    parts.reduce(_ unionAll _)
  }

  /** True if the file's leading bytes are a gzip member (magic +
    * deflate method). Missing/empty files sniff as NOT gz and fail in
    * the reader's existence check with its clearer error.
    */
  def isGzArchive(path: String): Boolean = {
    val f = new java.io.File(path)
    if (!f.isFile || f.length() < GzMagic.length) return false
    val in = new java.io.FileInputStream(f)
    try {
      val head = new Array[Byte](GzMagic.length)
      var at = 0
      while (at < head.length) {
        val n = in.read(head, at, head.length - at)
        if (n < 0) return false
        at += n
      }
      java.util.Arrays.equals(head, GzMagic)
    } finally in.close()
  }

  /** Percent-encode the bytes that would break WARC header framing if
    * a crawl-harvested value carried them: CR and LF anywhere (a
    * hostile page's href can capture across newlines — unencoded they
    * inject forged header lines or an early CRLFCRLF, corrupting the
    * record's framing on re-read), plus leading whitespace (a value
    * starting with SP/TAB reads as header folding). Raw CR/LF are
    * already ILLEGAL in a URI (RFC 3986 requires them percent-encoded),
    * so this is canonicalization of invalid input, not data loss —
    * legitimate values (including ordinary %-escapes) pass through
    * byte-identical.
    */
  private[sources] def sanitizeHeaderValue(v: String): String = {
    val pct = v.replace("\r", "%0D").replace("\n", "%0A")
    if (pct.startsWith(" ")) "%20" + pct.substring(1)
    else if (pct.startsWith("\t")) "%09" + pct.substring(1)
    else pct
  }

  /** Serialize one record under the ISO 28500 framing the readers
    * parse: version line, typed headers, Content-Length, CRLFCRLF,
    * payload, CRLFCRLF. Header values pass through
    * [[sanitizeHeaderValue]] — framing safety over byte fidelity for
    * hostile URIs/ids.
    */
  private[sources] def serializeRecord(uri: String, payload: Array[Byte],
      warcType: String, recordId: Option[String]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: ${sanitizeHeaderValue(warcType)}\r\n")
    sb.append(s"WARC-Target-URI: ${sanitizeHeaderValue(uri)}\r\n")
    recordId.foreach(r =>
      sb.append(s"WARC-Record-ID: ${sanitizeHeaderValue(r)}\r\n"))
    sb.append(s"Content-Length: ${payload.length}\r\n\r\n")
    val head = sb.toString.getBytes(StandardCharsets.UTF_8)
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Export a corpus AS a WARC drop — the write side of the crawl
    * front door (WET-style interchange: curate here, hand the drop to
    * any ISO 28500 consumer; [[readGzMany]]/[[readMany]] round-trip
    * it). One archive file per non-empty partition
    * (`part-NNNNN.warc[.gz]` under `outDir`), written task-side via
    * stage-then-atomic-rename so a killed task never leaves a
    * half-archive a reader would quarantine-spray over. With
    * `gz = true` (default) each record is its own gzip MEMBER — the
    * Common Crawl layout, so exports re-read with the same chunked
    * magic scan at any scale. Returns the record count written.
    *
    * `uriCol` → WARC-Target-URI (cast to string); `payloadCol` →
    * the record body (binary or string — strings serialize as UTF-8);
    * `idCol` (optional) → WARC-Record-ID, angle-bracketed if the
    * value isn't already.
    */
  def write(df: DataFrame, outDir: String, uriCol: String,
            payloadCol: String, idCol: Option[String] = None,
            warcType: String = "conversion", gz: Boolean = true): Long = {
    val dir = new java.io.File(outDir)
    dir.mkdirs()
    require(dir.isDirectory, s"cannot create export dir $outDir")
    val cols = Seq(col(uriCol).cast("string"), col(payloadCol).cast("binary")) ++
      idCol.map(c => col(c).cast("string"))
    val ext = if (gz) ".warc.gz" else ".warc"
    val counts = df.select(cols: _*).rdd.mapPartitionsWithIndex { (pid, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val name = f"part-$pid%05d$ext"
        // unique staging name: a speculative twin or a retried attempt
        // stages separately and the LAST atomic move wins whole; a
        // FAILED attempt deletes its stage (otherwise every retry
        // leaks one orphaned multi-MB .tmp in the export dir)
        val tmp = new java.io.File(dir,
          s".$name.${java.util.UUID.randomUUID}.tmp")
        try writePartition(tmp, new java.io.File(dir, name), it, warcType, gz)
        catch { case t: Throwable => tmp.delete(); throw t }
      }
    }
    counts.fold(0L)(_ + _)
  }

  /** One export task's body: stage every record into `tmp`, then
    * atomically publish as `target`. Returns the record count.
    */
  private def writePartition(tmp: java.io.File, target: java.io.File,
      it: Iterator[org.apache.spark.sql.Row], warcType: String,
      gz: Boolean): Iterator[Long] = {
    val fileOut = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(tmp))
    // ONE Deflater reused across members — a GZIPOutputStream per
    // record would hold a native zlib stream until GC (a
    // million-record task = a million un-ended deflaters)
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    val dBuf = new Array[Byte](64 * 1024)
    var n = 0L
    try {
      it.foreach { r =>
        val uri = r.getString(0)
        val payload = r.getAs[Array[Byte]](1)
        require(uri != null && payload != null,
          "WARC export rows need non-null uri and payload")
        val rid = if (r.size > 2 && !r.isNullAt(2)) {
          val v = r.getString(2)
          Some(if (v.startsWith("<")) v else s"<$v>")
        } else None
        val rec = serializeRecord(uri, payload, warcType, rid)
        if (gz) writeGzMember(fileOut, rec, deflater, dBuf)
        else fileOut.write(rec)
        n += 1L
      }
      fileOut.flush()
    } finally {
      deflater.end()
      fileOut.close()
    }
    java.nio.file.Files.move(tmp.toPath, target.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Iterator.single(n)
  }

  /** Write one gzip member (fixed 10-byte header with zero MTIME/XFL/
    * OS — byte-deterministic — then the deflate stream, then the
    * CRC32+ISIZE trailer the reader verifies). The deflater is
    * caller-owned and reset per member.
    */
  private def writeGzMember(out: java.io.OutputStream, rec: Array[Byte],
      d: java.util.zip.Deflater, buf: Array[Byte]): Unit = {
    out.write(Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0))
    d.reset()
    d.setInput(rec)
    d.finish()
    while (!d.finished()) {
      val n = d.deflate(buf)
      if (n > 0) out.write(buf, 0, n)
    }
    val crc = new java.util.zip.CRC32
    crc.update(rec)
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    le32(crc.getValue)
    le32(rec.length.toLong & 0xffffffffL)
  }

  /** Parseable records only. */
  def clean(parsed: DataFrame): DataFrame = parsed.filter(col("error").isNull)

  /** Corrupt records, for the audit/quarantine sink. */
  def quarantine(parsed: DataFrame): DataFrame = parsed.filter(col("error").isNotNull)

  /** The shared distributed chunk scan: plans (archive, start, len,
    * vlen, alen) chunk rows cluster-side and runs `parseChunk` against
    * each with a task-scoped reader cache — the one DAG under both the
    * plain and the gz reader.
    */
  private def scanChunks(spark: SparkSession, paths: Seq[String],
      chunkSize: Long, overlap: Long)(
      parseChunk: (EvidenceReader, String, Long, Long, Long, Array[Byte], Int)
        => Iterator[Row]): org.apache.spark.rdd.RDD[Row] = {
    require(paths.nonEmpty, "readMany needs at least one archive")
    require(paths.size <= 100000,
      s"${paths.size} archives exceed the 100k single-plan bound — shard the drop")
    require(chunkSize > overlap,
      s"chunkSize must cover the anchor overlap, got $chunkSize")
    // the chunk (plus anchor overlap) is read into one task-local array
    require(chunkSize + overlap <= Int.MaxValue,
      s"chunkSize must fit a JVM array, got $chunkSize")
    val lens = paths.map(p => p -> new java.io.File(p).length())
    lens.foreach { case (p, l) =>
      require(l > 0, s"archive missing or empty: $p") }
    // archive metadata is a bounded driver list; the CHUNK fan-out is
    // a distributed explode, so total chunk count never materializes
    // on the driver (100 TB of archives at 64 MiB chunks = ~1.6M plan
    // rows, all cluster-side)
    import spark.implicits._
    val meta = lens.toDF("archive", "graft_alen")
      .repartition(math.min(paths.size, 200))
    val chunks = meta.select(col("archive"), col("graft_alen"),
      explode(expr(
        s"sequence(0L, (graft_alen + ${chunkSize}L - 1) DIV ${chunkSize}L - 1L)"))
        .as("graft_ci"))
      .select(col("archive"),
        (col("graft_ci") * chunkSize).as("graft_start"),
        least(col("graft_alen") - col("graft_ci") * chunkSize,
          lit(chunkSize + overlap)).as("graft_len"),
        least(col("graft_alen") - col("graft_ci") * chunkSize,
          lit(chunkSize)).as("graft_vlen"),
        col("graft_alen"))
      // one chunk per task-row: at cluster scale parallelism == chunk
      // count, exactly the evidence-scan discipline
      .repartition(spark.sessionState.conf.numShufflePartitions)
    chunks.rdd.mapPartitions { it =>
      // one open reader per archive per task, closed on task end (a
      // limit/take or failed task never drains the iterator, and a
      // drain-detection close would leak one FileChannel per such
      // task — the CarvePipeline.closeOnTaskEnd leak class)
      val readers = scala.collection.mutable.HashMap.empty[String, RawFileEvidence]
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ =>
          readers.values.foreach(_.close())))
      it.flatMap { r =>
        val (p, start, len, vlen, alen) = (r.getString(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getLong(4))
        val reader = readers.getOrElseUpdate(p, new RawFileEvidence(p))
        val buf = new Array[Byte](len.toInt)
        val got = reader.readAt(start, buf)
        parseChunk(reader, p, alen, start, vlen, buf, got)
      }
    }
  }

  /** All start offsets of a well-shaped version anchor
    * (`WARC/1.<1-[[MaxVersionDigits]] digits>\r\n`) within buf[0, len).
    * Shape-validating at scan time keeps payload text that merely
    * MENTIONS `WARC/1.` from producing spurious parse attempts.
    */
  private[sources] def anchorOffsets(buf: Array[Byte], len: Int): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    val last = len - AnchorPrefix.length
    while (i <= last) {
      var j = 0
      while (j < AnchorPrefix.length && buf(i + j) == AnchorPrefix(j)) j += 1
      if (j == AnchorPrefix.length) {
        var k = i + AnchorPrefix.length
        var digits = 0
        while (k < len && digits < MaxVersionDigits &&
               buf(k) >= '0' && buf(k) <= '9') { k += 1; digits += 1 }
        if (digits >= 1 && k + 1 < len && buf(k) == '\r' && buf(k + 1) == '\n')
          out += i.toLong
      }
      i += 1
    }
    out.toSeq
  }

  /** All start offsets of a plausible gzip member (magic + deflate
    * method + FLG reserved bits clear) within buf[0, len).
    */
  private[sources] def gzMemberOffsets(buf: Array[Byte], len: Int): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    val last = len - GzMagic.length - 1
    while (i <= last) {
      if (buf(i) == GzMagic(0) && buf(i + 1) == GzMagic(1) &&
          buf(i + 2) == GzMagic(2) && (buf(i + 3) & 0xe0) == 0)
        out += i.toLong
      i += 1
    }
    out.toSeq
  }

  /** Parse one record whose version anchor sits at absolute `off` of an
    * uncompressed archive (header block + payload read via bounded
    * random access).
    */
  private def parseRecord(reader: EvidenceReader, totalLen: Long, off: Long,
                          maxHeaderBytes: Int, maxPayloadBytes: Int,
                          archive: String): Row = {
    val headCap = math.min(maxHeaderBytes.toLong, totalLen - off).toInt
    val head = new Array[Byte](headCap)
    val got = reader.readAt(off, head)
    parseRecordAt(head, got, off, maxPayloadBytes, archive,
      fetch = (bodyOff, n) => reader.readExactAt(off + bodyOff, n),
      headCap = headCap)
  }

  /** Parse the single record held WHOLE in `rec` (an inflated gzip
    * member), reporting `off` (the member's compressed start) as the
    * record offset.
    */
  private[sources] def parseRecordBytes(rec: Array[Byte], off: Long,
      maxHeaderBytes: Int, maxPayloadBytes: Int, archive: String): Row =
    parseRecordAt(rec, math.min(rec.length, maxHeaderBytes), off,
      maxPayloadBytes, archive,
      fetch = (bodyOff, n) =>
        if (bodyOff + n <= rec.length)
          Some(java.util.Arrays.copyOfRange(rec, bodyOff, bodyOff + n))
        else None,
      headCap = math.min(rec.length, maxHeaderBytes))

  /** The shared record parse: header block from `head[0, got)`, payload
    * via `fetch(bodyOffsetFromRecordStart, n)`. Validates the version,
    * the header terminator, and the Content-Length ladder; every
    * failure is a quarantine row at `off`.
    */
  private def parseRecordAt(head: Array[Byte], got: Int, off: Long,
      maxPayloadBytes: Int, archive: String,
      fetch: (Int, Int) => Option[Array[Byte]], headCap: Int): Row = {
    def err(msg: String, wType: String = null, uri: String = null,
            rid: String = null, clen: java.lang.Long = null): Row =
      Row(off, wType, uri, rid, clen, null, msg, archive)
    val headEnd = indexOfCrlfCrlf(head, got)
    if (headEnd < 0)
      return err(s"unterminated header block within $headCap bytes")
    // header lines are ASCII per spec; tolerate UTF-8 field values
    val headerText = new String(head, 0, headEnd, StandardCharsets.UTF_8)
    val lines = headerText.split("\r\n")
    val version = lines.head.stripPrefix("WARC/")
    if (version != "1.0" && version != "1.1")
      return err(s"unsupported WARC version: ${lines.head}")
    val fields = lines.drop(1).flatMap { line =>
      val k = line.indexOf(':')
      if (k <= 0) None
      else Some(line.substring(0, k).trim.toLowerCase -> line.substring(k + 1).trim)
    }.toMap
    val wType = fields.get("warc-type").orNull
    val uri = fields.get("warc-target-uri").orNull
    val rid = fields.get("warc-record-id").orNull
    val clenStr = fields.get("content-length")
    val clen = clenStr.flatMap(s => scala.util.Try(s.toLong).toOption)
    clen match {
      case None =>
        err(s"missing or unparseable Content-Length: ${clenStr.getOrElse("<absent>")}",
          wType, uri, rid)
      case Some(n) if n < 0 =>
        err(s"negative Content-Length: $n", wType, uri, rid)
      case Some(n) if n > maxPayloadBytes =>
        err(s"payload $n exceeds cap $maxPayloadBytes", wType, uri, rid, n)
      case Some(n) =>
        fetch(headEnd + 4, n.toInt) match {
          case None => err(s"payload truncated at EOF", wType, uri, rid, n)
          case Some(body) =>
            Row(off, wType, uri, rid, n, body, null, archive)
        }
    }
  }

  /** Inflate + parse one gzip member whose magic sits at absolute `off`.
    * Returns None for a skipped false positive (a magic inside
    * compressed bytes — it fails the gzip header, the deflate stream,
    * or the CRC before ever LOOKING like a record), a quarantine row
    * for a member that demonstrably held a record but is damaged, or
    * the parsed record row.
    */
  private[sources] def parseGzMember(reader: EvidenceReader, totalLen: Long,
      off: Long, maxHeaderBytes: Int, maxPayloadBytes: Int,
      archive: String): Seq[Row] = {
    def quarantineRow(msg: String): Seq[Row] =
      Seq(Row(off, null, null, null, null, null, msg, archive))
    // --- gzip member header (FEXTRA/FNAME/FCOMMENT/FHCRC — the carve
    // heuristic's walk, GzipCarver.parseHeader) via bounded reads
    val fixed = reader.readExactAt(off, 10).getOrElse(return Seq.empty)
    val flags = fixed(3) & 0xff
    if ((flags & 0xe0) != 0) return Seq.empty // reserved bits: not a member
    var cursor = off + 10
    if ((flags & 0x04) != 0) { // FEXTRA
      val xl = reader.readExactAt(cursor, 2).getOrElse(return Seq.empty)
      cursor += 2 + ((xl(0) & 0xff) | ((xl(1) & 0xff) << 8))
    }
    def skipCString(start: Long): Option[Long] = {
      // one bounded block read + in-memory scan — per-byte positioned
      // reads would cost up to maxHeaderBytes syscalls per FNAME-
      // bearing member on the archive-scan hot path. readExactAt loops
      // internally, honoring the EvidenceReader short-read contract (a
      // chunk-bounded reader like EwfEvidence may return fewer bytes
      // per call; a single readAt would truncate the NUL scan and
      // silently drop the record)
      val cap = math.min(totalLen - start, maxHeaderBytes.toLong).toInt
      if (cap <= 0) return None
      val block = reader.readExactAt(start, cap).getOrElse(return None)
      var i = 0
      while (i < cap) {
        if (block(i) == 0) return Some(start + i + 1)
        i += 1
      }
      None
    }
    if ((flags & 0x08) != 0) cursor = skipCString(cursor).getOrElse(return Seq.empty)
    if ((flags & 0x10) != 0) cursor = skipCString(cursor).getOrElse(return Seq.empty)
    if ((flags & 0x02) != 0) cursor += 2 // FHCRC
    if (cursor >= totalLen) return Seq.empty
    // --- member-wise inflate with bounded sequential reads; output
    // capped at the record budget (header block + payload + framing)
    val cap = maxHeaderBytes.toLong + maxPayloadBytes.toLong + 64L
    inflateMember(reader, totalLen, cursor, cap, 64 * 1024) match {
      case Right(rec) =>
        if (rec.length >= AnchorPrefix.length &&
            java.util.Arrays.equals(
              java.util.Arrays.copyOf(rec, AnchorPrefix.length), AnchorPrefix))
          parseMemberRecords(rec, off, maxHeaderBytes, maxPayloadBytes,
            archive)
        else
          // a VALID gzip member that does not hold a record: in a
          // .warc.gz every member is a record, so this is visible, not
          // silent — and a CRC-verified false positive is ~impossible
          quarantineRow("gzip member does not contain a WARC record")
      case Left((msg, true)) => quarantineRow(msg)
      case Left((_, false)) =>
        // the failing Inflater.inflate CALL discards its own output
        // (JDK contract) — a small member processed in ONE call can
        // fail with ZERO surviving bytes, leaving no record evidence
        // even though its header inflated fine (observed at sf0.1: 6
        // of 295 planted-corrupt members silently skipped). Retry with
        // 64-byte input slices (crawl records compress to a few
        // hundred bytes — a 512-byte slice would still cover a whole
        // member in one call): output lands incrementally across
        // calls, so the pre-corruption prefix survives and proves the
        // member held a record. Only members that fail WITHOUT
        // evidence pay the retry — true false positives (rare by the
        // magic odds) and corrupt members; both bounded by cap.
        inflateMember(reader, totalLen, cursor, cap, 64) match {
          case Left((msg2, true)) => quarantineRow(msg2)
          case Right(rec)
            if rec.length >= AnchorPrefix.length &&
              java.util.Arrays.equals(
                java.util.Arrays.copyOf(rec, AnchorPrefix.length), AnchorPrefix) =>
            parseMemberRecords(rec, off, maxHeaderBytes, maxPayloadBytes,
              archive)
          case _ => Seq.empty
        }
    }
  }

  /** Every record inside ONE inflated member's bytes. Per-record-gzip
    * crawls hold exactly one (the Common Crawl 1:1 layout), but ISO
    * 28500 permits several per member — parsing only the first would
    * lose the rest SILENTLY. Rows report the MEMBER's compressed
    * offset (the re-fetchable archive address; inner records share
    * it). A member whose byte 0 is not a well-formed version line
    * leads with a quarantine row, so nothing at the member head can
    * vanish without trace.
    */
  private def parseMemberRecords(rec: Array[Byte], off: Long,
      maxHeaderBytes: Int, maxPayloadBytes: Int,
      archive: String): Seq[Row] = {
    val anchors = anchorOffsets(rec, rec.length)
    val lead =
      if (!anchors.headOption.contains(0L))
        Seq(Row(off, null, null, null, null, null,
          "gzip member does not begin with a well-formed record", archive))
      else Seq.empty
    lead ++ anchors.map { a =>
      parseRecordBytes(
        if (a == 0L) rec
        else java.util.Arrays.copyOfRange(rec, a.toInt, rec.length),
        off, maxHeaderBytes, maxPayloadBytes, archive)
    }
  }

  /** One member-wise inflation attempt from absolute `dataStart`:
    * Right(memberBytes) on a CRC/ISIZE-verified member, Left((error,
    * recordEvidence)) on failure — `recordEvidence` is true when the
    * output produced BEFORE the failure starts with the record anchor
    * prefix (the caller's quarantine-vs-skip rule). `inChunk` sizes
    * the input feed; smaller chunks preserve more pre-failure output
    * (the failing inflate call's own output is unrecoverable).
    */
  private def inflateMember(reader: EvidenceReader, totalLen: Long,
      dataStart: Long, cap: Long,
      inChunk: Int): Either[(String, Boolean), Array[Byte]] = {
    val inflater = new java.util.zip.Inflater(true)
    val out = new java.io.ByteArrayOutputStream(8192)
    val crc = new java.util.zip.CRC32
    val inBuf = new Array[Byte](inChunk)
    val outBuf = new Array[Byte](64 * 1024)
    var inAt = dataStart
    var lastFed = 0
    def evidence: Boolean = {
      val b = out.toByteArray
      b.length >= AnchorPrefix.length &&
        java.util.Arrays.equals(
          java.util.Arrays.copyOf(b, AnchorPrefix.length), AnchorPrefix)
    }
    def fail(msg: String): Either[(String, Boolean), Array[Byte]] =
      Left((msg, evidence))
    try {
      while (!inflater.finished()) {
        if (inflater.needsInput()) {
          if (inAt >= totalLen)
            return fail("gzip member truncated at EOF")
          val want = math.min(inBuf.length.toLong, totalLen - inAt).toInt
          lastFed = reader.readAt(inAt, inBuf, 0, want)
          if (lastFed <= 0) return fail("gzip member truncated at EOF")
          inAt += lastFed
          inflater.setInput(inBuf, 0, lastFed)
        }
        val n =
          try inflater.inflate(outBuf)
          catch { case _: java.util.zip.DataFormatException =>
            return fail("corrupt gzip member (deflate error)") }
        if (n > 0) {
          out.write(outBuf, 0, n)
          crc.update(outBuf, 0, n)
          if (out.size() > cap)
            return fail(s"inflated gzip member exceeds cap $cap")
        } else if (n == 0 && inflater.needsDictionary())
          return fail("gzip member needs preset dictionary")
      }
      // --- trailer: 8 bytes (CRC32 + ISIZE) follow the deflate stream;
      // the first ones may already sit in the last fed input buffer
      val rem = inflater.getRemaining
      val trailer = new Array[Byte](8)
      val fromBuf = math.min(rem, 8)
      System.arraycopy(inBuf, lastFed - rem, trailer, 0, fromBuf)
      if (fromBuf < 8) {
        val more = reader.readExactAt(inAt, 8 - fromBuf)
          .getOrElse(return fail("gzip member trailer truncated at EOF"))
        System.arraycopy(more, 0, trailer, fromBuf, 8 - fromBuf)
      }
      def leU32(o: Int): Long =
        (trailer(o) & 0xffL) | ((trailer(o + 1) & 0xffL) << 8) |
          ((trailer(o + 2) & 0xffL) << 16) | ((trailer(o + 3) & 0xffL) << 24)
      if (leU32(0) != crc.getValue)
        return fail("gzip member CRC mismatch")
      if (leU32(4) != (out.size().toLong & 0xffffffffL))
        return fail("gzip member ISIZE mismatch")
      Right(out.toByteArray)
    } finally inflater.end()
  }

  /** First index of \r\n\r\n in buf[0, len), or −1. */
  private[sources] def indexOfCrlfCrlf(buf: Array[Byte], len: Int): Int = {
    var i = 0
    while (i + 3 < len) {
      if (buf(i) == '\r' && buf(i + 1) == '\n' &&
          buf(i + 2) == '\r' && buf(i + 3) == '\n') return i
      i += 1
    }
    -1
  }
}
