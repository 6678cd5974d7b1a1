package graft.sources

import java.nio.charset.StandardCharsets

import graft.core.ChunkPlanner
import graft.evidence.RawFileEvidence
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, explode, expr, least, lit}
import org.apache.spark.sql.types._

/** WARC (ISO 28500) corpus reader — the crawl-archive ingest every
  * web-scale training pipeline starts from (Common Crawl ships WARC /
  * WET; a WET "conversion" record is plain-text payload under the same
  * framing this reader parses).
  *
  * Architecture: the signature-scan DAG, not a sequential reader. The
  * archive is chunked ([[graft.core.ChunkPlanner]] — same plan as the
  * evidence scan), each task scans its chunk's bytes for the
  * `WARC/1.0\r\n` version anchor and keeps only anchors it OWNS
  * (`localOffset < validLength` — the overlap-dedup predicate, so a
  * record straddling a boundary is parsed exactly once), then parses
  * the bounded header block and reads `Content-Length` payload bytes by
  * random access (the carve pipeline's cross-chunk read discipline —
  * headers and payloads may extend past the chunk, tasks re-open the
  * archive, nothing is buffered whole). One narrow pass over the
  * archive bytes plus per-record bounded reads; parallelism == chunk
  * count; no driver-side materialization anywhere.
  *
  * Robustness contract: a corrupt record (missing/unparseable
  * `Content-Length`, unterminated header block, payload running past
  * EOF, payload over the cap) becomes a quarantine ROW (`error` set,
  * `payload` NULL) — and because records are FOUND by anchor scan, not
  * by chaining lengths, parsing resynchronizes at the next record
  * unaided, where a sequential reader loses the rest of the file behind
  * one bad length. The flip side, documented: payload bytes that
  * themselves contain the anchor (a WARC archived inside a WARC)
  * surface as extra parse attempts — spurious rows a caller
  * deduplicates by offset containment if its corpus can hold nested
  * archives ([[WarcSpec]] pins the behavior).
  *
  * Columns: (record_offset, warc_type, target_uri, record_id,
  * content_length, payload, error).
  */
object WarcCorpus {

  private val Anchor: Array[Byte] = "WARC/1.0\r\n".getBytes(StandardCharsets.US_ASCII)

  val schema: StructType = StructType(Seq(
    StructField("record_offset", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("content_length", LongType, nullable = true),
    StructField("payload", StringType, nullable = true),
    StructField("error", StringType, nullable = true)))

  /** Parse every WARC record in `path`. `chunkSize` sizes the scan
    * tasks (64 MiB default — at 100 TB that is ~1.6M tasks of one
    * narrow byte pass each); `maxHeaderBytes` bounds the header block a
    * record may claim; `maxPayloadBytes` bounds a single record's
    * payload (oversized records quarantine instead of OOMing a task).
    */
  def read(spark: SparkSession, path: String,
           chunkSize: Long = 64L * 1024 * 1024,
           maxHeaderBytes: Int = 8192,
           maxPayloadBytes: Int = 4 * 1024 * 1024): DataFrame =
    readMany(spark, Seq(path), chunkSize, maxHeaderBytes, maxPayloadBytes)
      .drop("archive")

  /** Parse MANY archives as ONE relation — the multi-archive front
    * door. One distributed chunk plan covers every archive (archive
    * metadata joins the chunk explode in-plan), so a 100k-archive drop
    * is a single scan stage — NOT a 100k-leaf union, whose
    * left-nested plan overflows the analyzer stack orders of magnitude
    * below that bound. A missing or empty archive is an ERROR, not an
    * empty result: `File.length()` returns 0 for both, and a crawl
    * batch that silently parses a typo'd path as zero records then
    * ledger-commits is data loss. Adds an `archive` column (the source
    * path) to [[schema]].
    */
  def readMany(spark: SparkSession, paths: Seq[String],
               chunkSize: Long = 64L * 1024 * 1024,
               maxHeaderBytes: Int = 8192,
               maxPayloadBytes: Int = 4 * 1024 * 1024): DataFrame = {
    require(paths.nonEmpty, "readMany needs at least one archive")
    require(paths.size <= 100000,
      s"${paths.size} archives exceed the 100k single-plan bound — shard the drop")
    require(chunkSize >= Anchor.length,
      s"chunkSize must cover the anchor, got $chunkSize")
    // the chunk (plus anchor overlap) is read into one task-local array
    require(chunkSize + Anchor.length - 1 <= Int.MaxValue,
      s"chunkSize must fit a JVM array, got $chunkSize")
    require(maxHeaderBytes >= 64 && maxPayloadBytes >= 0,
      "header/payload caps must be sane")
    val lens = paths.map(p => p -> new java.io.File(p).length())
    lens.foreach { case (p, l) =>
      require(l > 0, s"archive missing or empty: $p") }
    val overlap = (Anchor.length - 1).toLong
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
    val rows = chunks.rdd.mapPartitions { it =>
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
        anchorOffsets(buf, got)
          .filter(_ < vlen)
          .map(local => parseRecord(reader, alen, start + local,
            maxHeaderBytes, maxPayloadBytes, p))
      }
    }
    spark.createDataFrame(rows,
      schema.add(StructField("archive", StringType, nullable = false)))
  }

  /** Parseable records only. */
  def clean(parsed: DataFrame): DataFrame = parsed.filter(col("error").isNull)

  /** Corrupt records, for the audit/quarantine sink. */
  def quarantine(parsed: DataFrame): DataFrame = parsed.filter(col("error").isNotNull)

  /** All start offsets of the version anchor within buf[0, len). */
  private[sources] def anchorOffsets(buf: Array[Byte], len: Int): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    val last = len - Anchor.length
    while (i <= last) {
      var j = 0
      while (j < Anchor.length && buf(i + j) == Anchor(j)) j += 1
      if (j == Anchor.length) out += i.toLong
      i += 1
    }
    out.toSeq
  }

  /** Parse one record whose version anchor sits at absolute `off`. */
  private def parseRecord(reader: RawFileEvidence, totalLen: Long, off: Long,
                          maxHeaderBytes: Int, maxPayloadBytes: Int,
                          archive: String): Row = {
    def err(msg: String, wType: String = null, uri: String = null,
            rid: String = null, clen: java.lang.Long = null): Row =
      Row(off, wType, uri, rid, clen, null, msg, archive)
    val headCap = math.min(maxHeaderBytes.toLong, totalLen - off).toInt
    val head = new Array[Byte](headCap)
    val got = reader.readAt(off, head)
    val headEnd = indexOfCrlfCrlf(head, got)
    if (headEnd < 0)
      return err(s"unterminated header block within $headCap bytes")
    // header lines are ASCII per spec; tolerate UTF-8 field values
    val headerText = new String(head, 0, headEnd, StandardCharsets.UTF_8)
    val fields = headerText.split("\r\n").drop(1).flatMap { line =>
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
        val bodyOff = off + headEnd + 4
        reader.readExactAt(bodyOff, n.toInt) match {
          case None => err(s"payload truncated at EOF", wType, uri, rid, n)
          case Some(body) =>
            Row(off, wType, uri, rid, n,
              new String(body, StandardCharsets.UTF_8), null, archive)
        }
    }
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
