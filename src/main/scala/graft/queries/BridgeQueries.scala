package graft.queries

import graft.carve.EngineConfig
import graft.evidence.{EvidenceReader, EvidenceRef}
import graft.llm.CarvedText
import graft.pipeline.CarvePipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Carve→curation bridge as an oracle-checkable query: evidence is
  * synthesized with one PER-SLOT-VARYING text document per doc_id (even
  * slots an RFC-822 eml ended by an mbox boundary, odd slots an rtf
  * ended by its closing brace), the full distributed
  * scan→dedup→carve→payload-store DAG runs, and
  * [[graft.llm.CarvedText]] reads the payload store back into a
  * documents frame — whose text DuckDB predicts arithmetically from
  * doc_id. This checks the whole loop: signature scan, eml/rtf walkers,
  * payload naming, binaryFile re-read, and both text extractors.
  */
object BridgeQueries {

  private val Stride = 4096L

  /** The q306 charset arms: (JVM charset that encodes the fixture,
    * declared label the page carries, marker text whose encoded bytes
    * differ from latin1 AND utf-8). Shared between the fixture builder
    * and the oracle so the two cannot drift.
    */
  private val CjkArms: Seq[(String, String, String)] = Seq(
    ("Shift_JIS", "Shift_JIS", "日本語テスト"),
    ("EUC-JP", "euc-jp", "テスト終了"),
    ("GBK", "gb2312", "中文测试"),
    ("GB18030", "gb18030", "汉字处理"),
    ("Big5", "big5", "中文測試"),
    ("EUC-KR", "euc-kr", "한국어시험"),
    ("windows-1252", "windows-1252", "“quoted” — €9"),
    ("UTF-8", "utf-8", "ütf marker"))

  /** Deterministic cached jpeg/png-slotted raw image for the DSv2
    * pushdown queries (q150/q185): one sample per doc_id slot, even
    * slots jpeg, odd slots png, zero-padded to `stride`. Written once
    * per (nDocs, stride) to a deterministic tmpdir path and reused —
    * repeated bench/verify passes must not accumulate temp files. The
    * size check guards against a partially-written file from an
    * interrupted earlier run; bump the version on any layout change.
    */
  private[graft] def plantedImage(nDocs: Long, stride: Int): java.io.File = {
    val img = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft-img-v1-$nDocs-$stride.dd")
    if (!(img.isFile && img.length() == nDocs * stride)) {
      val jpeg = graft.fixtures.FixtureBytes.jpeg()
      val png = graft.fixtures.FixtureBytes.png()
      val tmp = new java.io.File(img.getParentFile, img.getName + ".tmp")
      val out = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(tmp))
      var slot = 0L
      while (slot < nDocs) {
        val sample = if (slot % 2 == 0) jpeg else png
        out.write(sample)
        out.write(new Array[Byte](stride - sample.length))
        slot += 1
      }
      out.close()
      java.nio.file.Files.move(tmp.toPath, img.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    img
  }

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Slot content: deterministic in the slot index, small enough for
    * any stride, cycling the three text-bearing carve types. The eml
    * body is followed by an mbox `\nFrom ` boundary so the carve ends
    * exactly at the document; the rtf ends itself at brace depth 0; the
    * fb2 ends at `</FictionBook>`. The eml body is long enough (≥20
    * tokens, ≥10% stopwords, no heavy repeats) to clear
    * [[graft.llm.Curation]]'s quality gate, so the bridged corpus also
    * exercises Curate.run; the short rtf/fb2 docs are the gate's
    * realistic drop fodder.
    */
  private[graft] val EmlBody =
    "the quick brown fox %d jumps over a lazy dog and walks to the old stone town in light rain near noon"

  private[graft] def slotSample(slot: Long): Array[Byte] =
    (slot % 3) match {
      case 0 =>
        ascii(s"From: user$slot@example.com\r\nTo: list@example.com\r\n" +
          s"Subject: note $slot\r\n\r\n${EmlBody.format(slot)}\r\n\nFrom -")
      case 1 =>
        ascii(s"{\\rtf1\\ansi doc $slot {\\b bold} text\\par}")
      case _ =>
        ascii("<?xml version=\"1.0\"?><FictionBook><body>" +
          s"<p>story $slot goes here tonight</p></body></FictionBook>")
    }

  /** Synthetic evidence with one generated document per stride slot,
    * zero-filled between — bytes are computed at read time from the
    * slot index alone, so the task closure carries two Longs no matter
    * the byte-space size (the [[graft.evidence.StridedSamplesRef]]
    * scale story, with varying instead of cycling content).
    */
  private[graft] final case class DocSlotsRef(stride: Long, slots: Long)
      extends EvidenceRef {
    override def open(): EvidenceReader = new EvidenceReader {
      override val length: Long = stride * slots
      override def readAt(offset: Long, buf: Array[Byte], bufOff: Int, len: Int): Int = {
        if (offset >= length) 0
        else {
          val n = math.min(len.toLong, length - offset).toInt
          java.util.Arrays.fill(buf, bufOff, bufOff + n, 0.toByte)
          var slot = offset / stride
          while (slot < slots && slot * stride < offset + n) {
            val sample = slotSample(slot)
            val sStart = slot * stride
            val from = math.max(offset, sStart)
            val to = math.min(offset + n, sStart + sample.length)
            if (to > from)
              System.arraycopy(sample, (from - sStart).toInt,
                buf, bufOff + (from - offset).toInt, (to - from).toInt)
            slot += 1
          }
          n
        }
      }
    }
  }

  val defs: Map[String, QueryDef] = Map(
    "q149_carved_documents" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val nDocs = Registry.table(s, dir, "documents").agg(count(lit(1))).as[Long].head()
        val (cfg0, _) = EngineConfig.filterFileTypes(
          EngineConfig(chunkSize = 512 * 1024, overlap = 4096),
          Some(Seq("eml", "rtf", "fb2")), disableZip = false)
        val cfg = cfg0.copy(fileTypes = cfg0.fileTypes.map(_.copy(minSize = 0)))
        // Deterministic store keyed by (generator version, nDocs): the
        // carve output is bit-identical for a given slot count, so a
        // complete store from an earlier invocation is reused instead
        // of re-carving ~nDocs files into a fresh temp dir per bench
        // pass (the real pipeline shape too: payload store written
        // once, curated many times). Bump the version on any
        // slotSample change.
        val payloadDir = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft-bridge-v2-$nDocs")
        val complete = payloadDir.isDirectory && {
          val counts = payloadDir.listFiles()
          counts != null && counts.iterator.flatMap(d =>
            Option(d.listFiles()).map(_.length).iterator).sum == nDocs
        }
        if (!complete) {
          // materialize the carve so the payload store exists before
          // the (lazy) binaryFile read resolves it; release the scan
          // cache — the returned frame reads only the payload store
          val run = CarvePipeline.run(s, DocSlotsRef(Stride, nDocs), cfg, "bridge-run",
            enableStrings = false, enableEntropy = false,
            payloadDir = Some(payloadDir.toString))
          run.carvedFiles.count()
          run.release()
        }
        CarvedText.documents(s, payloadDir.toString)
          .select((col("global_start") / Stride).cast("long").as("doc_id"),
            col("file_type"), col("text"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'eml' WHEN 1 THEN 'rtf'
             |  ELSE 'fb2' END AS file_type,
             |CASE CAST(doc_id % 3 AS INT)
             |  WHEN 0 THEN 'note ' || doc_id || chr(10) ||
             |    'the quick brown fox ' || doc_id ||
             |    ' jumps over a lazy dog and walks to the old stone town in light rain near noon'
             |  WHEN 1 THEN 'doc ' || doc_id || ' bold text'
             |  ELSE 'story ' || doc_id || ' goes here tonight' END AS text
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- DSv2 hits-mode pushdown under the oracle gate: a raw image
    // with one jpeg/png sample per doc_id slot is scanned through the
    // `mode=hits` table; the `file_type = 'jpeg'` predicate pushes into
    // Aho–Corasick construction (only jpeg patterns compile), and the
    // surviving offsets must be exactly the even slots. The image is a
    // deterministic cached fixture (like q199's jsonl drop) so repeated
    // bench passes reuse one file instead of accumulating temp images.
    "q150_dsv2_hits_pushdown" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val nDocs = Registry.table(s, dir, "documents").agg(count(lit(1))).as[Long].head()
        val stride = 1024
        val img = plantedImage(nDocs, stride)
        s.read.format("graft.sources.EvidenceSource")
          .option("path", img.toString).option("mode", "hits")
          .option("chunkSize", (64 * 1024).toString).option("overlap", "128")
          .load()
          .filter(col("file_type") === "jpeg")
          .select((col("global_offset") / stride).cast("long").as("doc_id"),
            col("file_type"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, 'jpeg' AS file_type FROM documents
             |WHERE doc_id % 2 = 0 ORDER BY doc_id""".stripMargin)),

    // ---- DSv2 COUNT pushdown: the same planted jpeg/png image, but the
    // per-type hit counts come out of the SOURCE as per-partition
    // partial counts (SupportsPushDownAggregates) — no hit rows cross
    // the scan boundary. The oracle predicts the totals from the slot
    // parity arithmetic.
    "q185_dsv2_count_pushdown" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val nDocs = Registry.table(s, dir, "documents").agg(count(lit(1))).as[Long].head()
        val stride = 1024
        val img = plantedImage(nDocs, stride)
        s.read.format("graft.sources.EvidenceSource")
          .option("path", img.toString).option("mode", "hits")
          .option("chunkSize", (64 * 1024).toString).option("overlap", "128")
          .load()
          .groupBy("file_type").count()
          .withColumnRenamed("count", "n_hits")
          .orderBy("file_type")
      },
      Some("""SELECT file_type, n_hits FROM (
             |  SELECT 'jpeg' AS file_type, CAST(count(*) AS BIGINT) AS n_hits
             |  FROM documents WHERE doc_id % 2 = 0
             |  UNION ALL
             |  SELECT 'png', CAST(count(*) AS BIGINT)
             |  FROM documents WHERE doc_id % 2 = 1) t
             |ORDER BY file_type""".stripMargin)),

    // ---- JSONL corpus ingest with corrupt-record quarantine: the
    // documents table round-trips through a gzip JSONL drop whose %17
    // lines are deliberately truncated mid-object; the PERMISSIVE
    // reader must type every parseable line (per-source counts +
    // char mass both intact) and quarantine exactly the broken ones.
    "q199_jsonl_ingest" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = Registry.table(s, dir, "documents")
        val tag = Registry.contentTag(docs, "doc_id", "text", "lang", "source")
        val fixture = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft-jsonl-v2-$tag")
        if (!fixture.exists()) {
          docs.select(
            when(col("doc_id") % 17 === 0,
              concat(lit("{\"doc_id\": "), col("doc_id").cast("string"),
                lit(", TRUNCATED")))
              .otherwise(to_json(struct(col("doc_id"), col("text"),
                col("lang"), col("source"))))
              .as("value"))
            .write.mode("overwrite").option("compression", "gzip")
            .text(fixture.toString)
        }
        val parsed = graft.sources.JsonlCorpus.read(s, fixture.toString)
        val cleanCounts = graft.sources.JsonlCorpus.clean(parsed)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("sum_chars"))
        val corrupt = graft.sources.JsonlCorpus.quarantine(parsed)
          .agg(count(lit(1)).as("graft_n"))
          .select(lit("_corrupt").as("source"), col("graft_n").as("n_docs"),
            lit(0L).as("sum_chars"))
        cleanCounts.union(corrupt).orderBy("source")
      },
      Some("""SELECT source, n_docs, sum_chars FROM (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |         CAST(sum(length(text)) AS BIGINT) AS sum_chars
             |  FROM documents WHERE doc_id % 17 <> 0 GROUP BY source
             |  UNION ALL
             |  SELECT '_corrupt', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT)
             |  FROM documents WHERE doc_id % 17 = 0) t
             |ORDER BY source""".stripMargin)),

    // ---- CSV manifest ingest with quarantine: the documents metadata
    // rendered as a headerless CSV manifest, every 13th row corrupted
    // (unparseable doc_id or truncated token count, alternating). The
    // reader must type every parseable line and quarantine exactly the
    // broken ones — same contract as the q199 JSONL path.
    "q229_csv_ingest" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val tag = Registry.contentTag(docs, "doc_id", "lang", "source", "n_chars")
        val fixture = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft-csvman-v1-$tag")
        if (!fixture.exists()) {
          docs.select(
            when(col("doc_id") % 26 === 0, lit("TRUNCATED_ROW"))
              .when(col("doc_id") % 13 === 0,
                concat(lit("X"), col("doc_id").cast("string"), lit(","),
                  col("lang"), lit(","), col("source"), lit(","),
                  col("n_chars").cast("string")))
              .otherwise(concat_ws(",", col("doc_id"), col("lang"),
                col("source"), col("n_chars")))
              .as("value"))
            .write.mode("overwrite").option("compression", "gzip")
            .text(fixture.toString)
        }
        val parsed = graft.sources.CsvCorpus.read(s, fixture.toString)
        val cleanCounts = graft.sources.CsvCorpus.clean(parsed)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"))
        val corrupt = graft.sources.CsvCorpus.quarantine(parsed)
          .agg(count(lit(1)).as("graft_n"))
          .select(lit("_corrupt").as("source"), col("graft_n").as("n_docs"),
            lit(0L).as("sum_chars"))
        cleanCounts.union(corrupt).orderBy("source")
      },
      Some("""SELECT source, n_docs, sum_chars FROM (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |         CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |  FROM documents WHERE doc_id % 13 <> 0 GROUP BY source
             |  UNION ALL
             |  SELECT '_corrupt', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT)
             |  FROM documents WHERE doc_id % 13 = 0) t
             |ORDER BY source""".stripMargin)),

    // ---- WARC crawl-archive ingest with quarantine: the documents
    // table round-trips through a WET-style WARC drop (one conversion
    // record per doc, the source riding as the target-URI host), every
    // %19th record's Content-Length corrupted. The anchor-scan reader
    // must parse every well-formed record (per-source counts + char
    // mass intact), quarantine exactly the broken ones, and — the
    // property that separates it from a sequential reader — RESYNC at
    // the next record despite the unusable length field.
    "q291_warc_ingest" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val tag = Registry.contentTag(docs, "doc_id", "text", "source")
        val fixture = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft-warc-v1-$tag.warc")
        if (!fixture.isFile) {
          val rows = docs.select(col("doc_id"), col("source"), col("text"))
            .orderBy("doc_id").collect()
          val tmp = new java.io.File(fixture.getParentFile, fixture.getName + ".tmp")
          val out = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(tmp))
          try rows.foreach { r =>
            val (id, src, text) = (r.getLong(0), r.getString(1), r.getString(2))
            out.write(graft.fixtures.FixtureBytes.warcRecord(
              s"http://$src/doc/$id",
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
              contentLength = if (id % 19 == 0) Some("XX") else None,
              recordId = Some(s"<urn:graft:$id>")))
          } finally out.close()
          java.nio.file.Files.move(tmp.toPath, fixture.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        // small chunks force records across chunk boundaries — the
        // overlap-ownership and cross-chunk header/payload reads are
        // exercised, not just declared
        val parsed = graft.sources.WarcCorpus.read(s, fixture.toString,
          chunkSize = 16 * 1024)
        val cleanCounts = graft.sources.WarcCorpus.clean(parsed)
          .select(regexp_extract(col("target_uri"), "^http://([^/]+)/", 1).as("source"),
            // payload is BINARY — decode to chars before measuring (the
            // oracle counts characters over the source text)
            length(graft.sources.WarcCorpus.payloadText).cast("long").as("graft_len"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("graft_len")).as("sum_chars"))
        val corrupt = graft.sources.WarcCorpus.quarantine(parsed)
          .agg(count(lit(1)).as("graft_n"))
          .select(lit("_corrupt").as("source"), col("graft_n").as("n_docs"),
            lit(0L).as("sum_chars"))
        cleanCounts.union(corrupt).orderBy("source")
      },
      Some("""SELECT source, n_docs, sum_chars FROM (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |         CAST(sum(length(text)) AS BIGINT) AS sum_chars
             |  FROM documents WHERE doc_id % 19 <> 0 GROUP BY source
             |  UNION ALL
             |  SELECT '_corrupt', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT)
             |  FROM documents WHERE doc_id % 19 = 0) t
             |ORDER BY source""".stripMargin)),

    // ---- PER-RECORD-GZIP WARC ingest (.warc.gz — the layout Common
    // Crawl actually ships): the documents table round-trips through a
    // gz drop (one gzip MEMBER per record, members concatenated, half
    // the records WARC/1.1), every %17th member's deflate stream
    // byte-flipped near its end. The magic-scan reader must inflate
    // every clean member across chunk boundaries (CRC32+ISIZE
    // verified), QUARANTINE exactly the damaged ones, and resync at
    // the next member's magic unaided.
    "q294_warc_gz_ingest" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val tag = Registry.contentTag(docs, "doc_id", "text", "source")
        val fixture = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft-warcgz-v1-$tag.warc.gz")
        if (!fixture.isFile) {
          val rows = docs.select(col("doc_id"), col("source"), col("text"))
            .orderBy("doc_id").collect()
          val tmp = new java.io.File(fixture.getParentFile, fixture.getName + ".tmp")
          val out = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(tmp))
          try rows.foreach { r =>
            val (id, src, text) = (r.getLong(0), r.getString(1), r.getString(2))
            out.write(graft.fixtures.FixtureBytes.gzMember(
              graft.fixtures.FixtureBytes.warcRecord(
                s"http://$src/doc/$id",
                text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
                recordId = Some(s"<urn:graft:$id>"),
                version = if (id % 2 == 0) "1.0" else "1.1"),
              corrupt = id % 17 == 0))
          } finally out.close()
          java.nio.file.Files.move(tmp.toPath, fixture.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        // small chunks force members across chunk boundaries — the
        // ownership predicate and cross-chunk member inflation are
        // exercised, not just declared
        val parsed = graft.sources.WarcCorpus.readGz(s, fixture.toString,
          chunkSize = 16 * 1024)
        val cleanCounts = graft.sources.WarcCorpus.clean(parsed)
          .select(regexp_extract(col("target_uri"), "^http://([^/]+)/", 1).as("source"),
            length(graft.sources.WarcCorpus.payloadText).cast("long").as("graft_len"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("graft_len")).as("sum_chars"))
        val corrupt = graft.sources.WarcCorpus.quarantine(parsed)
          .agg(count(lit(1)).as("graft_n"))
          .select(lit("_corrupt").as("source"), col("graft_n").as("n_docs"),
            lit(0L).as("sum_chars"))
        cleanCounts.union(corrupt).orderBy("source")
      },
      Some("""SELECT source, n_docs, sum_chars FROM (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |         CAST(sum(length(text)) AS BIGINT) AS sum_chars
             |  FROM documents WHERE doc_id % 17 <> 0 GROUP BY source
             |  UNION ALL
             |  SELECT '_corrupt', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT)
             |  FROM documents WHERE doc_id % 17 = 0) t
             |ORDER BY source""".stripMargin)),

    // ---- HTML→text extraction (graft.llm.Html.htmlToText): each doc
    // wrapped in a synthetic page — title with an escaped entity, a
    // style block, a script block with comparison operators, a
    // multi-line comment, entity-bearing tail — all IN-PLAN (no
    // fixture file). The extraction chain (script/style/comment drop,
    // tag strip, core entity decode with &amp; last, whitespace
    // collapse) is a pure codegen'd Column expression whose exact
    // semantics the oracle replays step for step.
    "q295_html_extract" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val html = concat(
          lit("<html><head><title>Q&amp;A</title><style type=\"text/css\">p { color: red; }\n" +
            "</style></head><body class=\"x\"><h1>"),
          col("source"),
          lit("</h1><script>\nvar s = 1 < 2 && 3 > 2;\n</script><!-- hidden\ncomment --><p>"),
          col("text"),
          lit("&nbsp;&lt;fin&gt;</p></body></html>"))
        docs.select(col("doc_id"),
            graft.llm.Html.htmlToText(html).as("text_out"))
          .withColumn("n_chars", length(col("text_out")).cast("long"))
          .orderBy("doc_id")
      },
      Some(s"""WITH h AS (SELECT doc_id,
              |  '<html><head><title>Q&amp;A</title><style type="text/css">p { color: red; }'
              |  || chr(10) || '</style></head><body class="x"><h1>' || source
              |  || '</h1><script>' || chr(10) || 'var s = 1 < 2 && 3 > 2;' || chr(10)
              |  || '</script><!-- hidden' || chr(10) || 'comment --><p>' || text
              |  || '&nbsp;&lt;fin&gt;</p></body></html>' AS html
              |  FROM documents),
              |x AS (SELECT doc_id, ${graft.llm.Html.htmlToTextSql("html")} AS text_out FROM h)
              |SELECT doc_id, text_out, CAST(length(text_out) AS BIGINT) AS n_chars
              |FROM x ORDER BY doc_id""".stripMargin)),

    // ---- Raw-crawl response chain (WARC response records → HTTP split
    // → HTML extraction): each doc rides as an HTTP response message
    // (status line — %23rd docs 404 —, two headers, HTML body) inside
    // a plain WARC. The chain read→payloadText→httpStatus/httpHeader/
    // httpBody→htmlToText must recover status, content type, and the
    // extracted body length for every record — the operator the
    // boilerplate battery (q111-q113) was missing upstream.
    "q296_warc_response_chain" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val tag = Registry.contentTag(docs, "doc_id", "text", "source")
        val fixture = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft-warcresp-v1-$tag.warc")
        if (!fixture.isFile) {
          val rows = docs.select(col("doc_id"), col("source"), col("text"))
            .orderBy("doc_id").collect()
          val tmp = new java.io.File(fixture.getParentFile, fixture.getName + ".tmp")
          val out = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(tmp))
          try rows.foreach { r =>
            val (id, src, text) = (r.getLong(0), r.getString(1), r.getString(2))
            val st = if (id % 23 == 0) 404 else 200
            val msg = s"HTTP/1.1 $st OK\r\n" +
              "Content-Type: text/html; charset=UTF-8\r\n" +
              "X-Crawl: graft\r\n\r\n" +
              s"<html><body><h1>$src</h1><p>$text &amp; more</p></body></html>"
            out.write(graft.fixtures.FixtureBytes.warcRecord(
              s"http://$src/doc/$id",
              msg.getBytes(java.nio.charset.StandardCharsets.UTF_8),
              warcType = "response"))
          } finally out.close()
          java.nio.file.Files.move(tmp.toPath, fixture.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        val parsed = graft.sources.WarcCorpus.read(s, fixture.toString,
          chunkSize = 16 * 1024)
        val msg = graft.sources.WarcCorpus.payloadText
        graft.sources.WarcCorpus.clean(parsed)
          .select(
            regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1)
              .cast("long").as("doc_id"),
            graft.llm.Html.httpStatus(msg).as("status"),
            graft.llm.Html.httpHeader(msg, "Content-Type").as("content_type"),
            length(graft.llm.Html.htmlToText(graft.llm.Html.httpBody(msg)))
              .cast("long").as("body_chars"))
          .orderBy("doc_id")
      },
      Some {
        val crlf = "chr(13) || chr(10)"
        s"""WITH p AS (SELECT doc_id,
           |  CASE WHEN doc_id % 23 = 0 THEN 404 ELSE 200 END AS st,
           |  'HTTP/1.1 ' || CASE WHEN doc_id % 23 = 0 THEN 404 ELSE 200 END
           |  || ' OK' || $crlf || 'Content-Type: text/html; charset=UTF-8' || $crlf
           |  || 'X-Crawl: graft' || $crlf || $crlf
           |  || '<html><body><h1>' || source || '</h1><p>' || text
           |  || ' &amp; more</p></body></html>' AS msg
           |  FROM documents),
           |b AS (SELECT doc_id, st, msg, ${graft.llm.Html.httpBodySql("msg")} AS body
           |  FROM p)
           |SELECT doc_id, CAST(st AS INT) AS status,
           |  nullif(regexp_extract(
           |    CASE WHEN strpos(msg, $crlf || $crlf) > 0
           |         THEN substr(msg, 1, strpos(msg, $crlf || $crlf) + 1) ELSE msg END,
           |    '(?i)(?:^|\r\n)Content-Type:[ \t]*([^\r\n]*)', 1), '') AS content_type,
           |  CAST(length(${graft.llm.Html.htmlToTextSql("body")}) AS BIGINT) AS body_chars
           |FROM b ORDER BY doc_id""".stripMargin
      }),

    // ---- WARC → carve composition (binary payloads survive byte-
    // exact): a plain WARC of `response` records each carrying the
    // 32-byte jpeg sample as its BINARY payload. The reader's payload
    // hash must equal the jpeg's, AND the carve pipeline run over the
    // ARCHIVE FILE ITSELF must recover exactly one validated jpeg per
    // record whose sha256 matches the payload's — the two halves of
    // the engine (crawl reader, forensic carver) agreeing on the same
    // bytes. Rank-aligned by offset (records and carves are both
    // sequential in the archive); the unpartitioned row_number is
    // fixture-verification shape, not a corpus operator.
    "q297_warc_carve_chain" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val tag = Registry.contentTag(docs, "doc_id")
        val fixture = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft-warcjpg-v1-$tag.warc")
        val jpeg = graft.fixtures.FixtureBytes.jpeg()
        if (!fixture.isFile) {
          val ids = docs.select(col("doc_id")).orderBy("doc_id")
            .collect().map(_.getLong(0))
          val tmp = new java.io.File(fixture.getParentFile, fixture.getName + ".tmp")
          val out = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(tmp))
          try ids.foreach { id =>
            out.write(graft.fixtures.FixtureBytes.warcRecord(
              s"http://img/doc/$id", jpeg, warcType = "response"))
          } finally out.close()
          java.nio.file.Files.move(tmp.toPath, fixture.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        val recs = graft.sources.WarcCorpus.clean(
            graft.sources.WarcCorpus.read(s, fixture.toString,
              chunkSize = 16 * 1024))
          .select(
            regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1)
              .cast("long").as("doc_id"),
            sha2(col("payload"), 256).as("payload_sha256"),
            col("record_offset"))
          .withColumn("graft_rk",
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy("record_offset")))
        val (cfg0, _) = EngineConfig.filterFileTypes(
          EngineConfig(chunkSize = 256 * 1024, overlap = 4096),
          Some(Seq("jpeg")), disableZip = false)
        val cfg = cfg0.copy(fileTypes = cfg0.fileTypes.map(_.copy(minSize = 0)))
        val run = CarvePipeline.run(s, graft.evidence.RawFileRef(fixture.toString),
          cfg, "warc-carve", enableStrings = false, enableEntropy = false)
        val carved = run.carvedFiles.toDF()
          .filter(col("fileType") === "jpeg" && col("validated"))
          .select(col("sha256").as("carved_sha256"), col("globalStart"))
          .withColumn("graft_rk",
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy("globalStart")))
        recs.join(carved, Seq("graft_rk"))
          .select(col("doc_id"), col("payload_sha256"),
            (col("payload_sha256") === col("carved_sha256")).as("carve_match"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
              |'${graft.fixtures.FixtureBytes.sha256Hex(graft.fixtures.FixtureBytes.jpeg())}' AS payload_sha256,
              |true AS carve_match
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Outlink graph (crawl-frontier extraction): each doc rendered
    // as a page with four <a> tags IN-PLAN — two absolute (a .com and
    // a cdn.*.co.uk), one relative, one mailto — plus one
    // single-quoted href. extractLinks harvests both quote forms,
    // host() nulls the non-authority links, registeredDomain folds
    // subdomains onto the site key (the public-suffix-aware "group by
    // site" every crawl mix/quota step needs). The two-level-suffix
    // branch is exercised by the cdn.*.co.uk link.
    "q298_outlink_domains" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val html = concat(
          lit("<html><body><p>intro</p><a href=\"https://www."),
          col("source"), lit(".com/a/"), col("doc_id").cast("string"),
          lit("\">one</a><a class=\"m\" href=\"http://cdn."),
          col("source"), lit(".co.uk/img/"), col("doc_id").cast("string"),
          lit("\">two</a><a href=\"mailto:x@y.example\">m</a><a href='/rel/"),
          col("doc_id").cast("string"), lit("'>rel</a></body></html>"))
        val links = docs.select(col("doc_id"),
            explode(graft.llm.UrlOps.extractLinks(html)).as("link"))
          .withColumn("graft_host", graft.llm.UrlOps.host(col("link")))
          .filter(col("graft_host").isNotNull)
        links.select(col("doc_id"),
            graft.llm.UrlOps.registeredDomain(col("graft_host")).as("domain"))
          .groupBy(col("domain"))
          .agg(count(lit(1)).as("n_links"),
            countDistinct(col("doc_id")).as("n_docs"))
          .orderBy("domain")
      },
      Some(s"""WITH h AS (SELECT doc_id, source,
              |  '<html><body><p>intro</p><a href="https://www.' || source
              |  || '.com/a/' || CAST(doc_id AS VARCHAR)
              |  || '">one</a><a class="m" href="http://cdn.' || source
              |  || '.co.uk/img/' || CAST(doc_id AS VARCHAR)
              |  || '">two</a><a href="mailto:x@y.example">m</a><a href=' || chr(39)
              |  || '/rel/' || CAST(doc_id AS VARCHAR) || chr(39)
              |  || '>rel</a></body></html>' AS html
              |  FROM documents),
              |l AS (SELECT doc_id, unnest(list_concat(
              |  regexp_extract_all(html, ${graft.llm.UrlOps.sqlLit(graft.llm.UrlOps.hrefDqRegex)}, 1),
              |  regexp_extract_all(html, ${graft.llm.UrlOps.sqlLit(graft.llm.UrlOps.hrefSqRegex)}, 1)))
              |  AS link FROM h),
              |ho AS (SELECT doc_id, lower(nullif(regexp_extract(link,
              |  ${graft.llm.UrlOps.sqlLit(graft.llm.UrlOps.hostRegex)}, 1), '')) AS host FROM l),
              |d AS (SELECT doc_id,
              |  ${graft.llm.UrlOps.registeredDomainSql("host")} AS domain
              |  FROM ho WHERE host IS NOT NULL)
              |SELECT domain, CAST(count(*) AS BIGINT) AS n_links,
              |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
              |FROM d GROUP BY domain ORDER BY domain""".stripMargin)),

    // ---- URL canonical keys (SURT + registered domain): per-doc URLs
    // with rotating subdomain depth and TLD family, canonicalized to
    // the keys archives sort by (SURT host) and pipelines group by
    // (registered domain). Pure codegen'd regex/string chains — the
    // oracle replays label reversal and the pinned suffix subset
    // verbatim.
    "q299_surt_keys" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val url = concat(lit("https://"),
          when(col("doc_id") % 3 === 0, lit("www."))
            .when(col("doc_id") % 3 === 1, lit("sub.news."))
            .otherwise(lit("")),
          col("source"),
          when(col("doc_id") % 2 === 0, lit(".co.uk")).otherwise(lit(".org")),
          lit("/p/"), col("doc_id").cast("string"))
        val host = graft.llm.UrlOps.host(url)
        docs.select(col("doc_id"),
            host.as("host"),
            graft.llm.UrlOps.registeredDomain(host).as("registered_domain"),
            graft.llm.UrlOps.surtHost(host).as("surt_host"))
          .orderBy("doc_id")
      },
      Some(s"""WITH u AS (SELECT doc_id,
              |  'https://' || CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'www.'
              |    WHEN 1 THEN 'sub.news.' ELSE '' END || source
              |  || CASE WHEN doc_id % 2 = 0 THEN '.co.uk' ELSE '.org' END
              |  || '/p/' || CAST(doc_id AS VARCHAR) AS url
              |  FROM documents),
              |ho AS (SELECT doc_id, lower(nullif(regexp_extract(url,
              |  ${graft.llm.UrlOps.sqlLit(graft.llm.UrlOps.hostRegex)}, 1), '')) AS host FROM u)
              |SELECT doc_id, host,
              |  ${graft.llm.UrlOps.registeredDomainSql("host")} AS registered_domain,
              |  array_to_string(list_reverse(string_split(host, '.')), ',') AS surt_host
              |FROM ho ORDER BY doc_id""".stripMargin)),

    // ---- WET export round-trip (the WRITE side of the crawl front
    // door): the documents table exports as a per-record-gzip WET drop
    // (WarcCorpus.write — one archive per partition, staged atomic
    // renames, one reused deflater per task) and reads back through
    // the chunked magic-scan reader byte-identical. Curate →
    // interchange → re-ingest, the full loop.
    "q300_wet_export_roundtrip" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val tag = Registry.contentTag(docs, "doc_id", "text")
        val fixture = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft-wetexp-v1-$tag")
        if (!fixture.isDirectory) {
          // stage-then-rename: a killed earlier run can only leave a
          // stage dir behind, never a partial fixture the reader
          // would trust
          val stage = new java.io.File(fixture.getParentFile,
            fixture.getName + "." + java.util.UUID.randomUUID + ".stage")
          graft.sources.WarcCorpus.write(
            docs.select(concat(lit("http://corpus/doc/"),
                col("doc_id").cast("string")).as("uri"), col("text")),
            stage.toString, "uri", "text", idCol = None)
          try java.nio.file.Files.move(stage.toPath, fixture.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch { case _: java.nio.file.FileAlreadyExistsException => () }
        }
        val files = Option(fixture.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.endsWith(".warc.gz")).map(_.toString).toSeq.sorted
        val back = graft.sources.WarcCorpus.text(
          graft.sources.WarcCorpus.readGzMany(s, files))
        graft.sources.WarcCorpus.clean(back)
          .select(regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1)
            .cast("long").as("doc_id"),
            col("payload_text").as("text"))
          .orderBy("doc_id")
      },
      Some("SELECT doc_id, text FROM documents ORDER BY doc_id")),

    // ---- Crawl-frontier membership (graft.llm.Frontier — the
    // persisted seen-URL set that closes the crawl loop): phase 1
    // probes the full URL corpus against a frontier seeded with the
    // %3==0 urls (news = the other two thirds); phase 2 probes after a
    // FENCED, bucketed append of the %3==1 urls (news = the last
    // third). Fixture frontiers cache in /tmp keyed by corpus content;
    // a torn cached index (interrupted append) reads as absent via the
    // lifecycle manifest/fence rules and rebuilds.
    "q301_frontier_discovery" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val tag = Registry.contentTag(docs, "doc_id", "source")
        val urlOf = concat(lit("https://"), col("source"), lit("/d/"),
          col("doc_id").cast("string"))
        val urls = docs.select(col("doc_id"), urlOf.as("url"))
        def ensure(fdir: java.io.File, appendPhase2: Boolean): String = {
          if (!graft.llm.Frontier.indexExists(fdir.toString)) {
            def rmr(f: java.io.File): Unit = {
              if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmr))
              f.delete()
            }
            rmr(fdir)
            graft.llm.Frontier.buildFrontier(
              urls.filter(col("doc_id") % 3 === 0), "url", fdir.toString,
              numBuckets = 4)
            if (appendPhase2)
              graft.llm.Frontier.appendToFrontier(
                urls.filter(col("doc_id") % 3 === 1), "url", fdir.toString)
          }
          fdir.toString
        }
        val f1 = ensure(new java.io.File(
          sys.props("java.io.tmpdir"), s"graft-frontier1-v1-$tag"), false)
        val f2 = ensure(new java.io.File(
          sys.props("java.io.tmpdir"), s"graft-frontier2-v1-$tag"), true)
        val p1 = graft.llm.Frontier.probeNew(urls, "url", f1)
          .select(lit("p1").as("phase"), col("doc_id"))
        val p2 = graft.llm.Frontier.probeNew(urls, "url", f2)
          .select(lit("p2").as("phase"), col("doc_id"))
        p1.unionAll(p2).orderBy("phase", "doc_id")
      },
      Some("""SELECT phase, doc_id FROM (
             |  SELECT 'p1' AS phase, doc_id FROM documents WHERE doc_id % 3 <> 0
             |  UNION ALL
             |  SELECT 'p2', doc_id FROM documents WHERE doc_id % 3 = 2) t
             |ORDER BY phase, doc_id""".stripMargin)),

    // ---- Robots-directive compliance gate (graft.llm.Html.noindex):
    // every %7th page declares a noindex robots meta — rotating
    // through quoted name-first, single-quoted content-first, and
    // UNQUOTED attributes (valid HTML5, common in the wild) so all
    // regex arms are exercised; the corpus filter must drop exactly
    // those BEFORE any text operator reads them, and the directive
    // itself surfaces for the audit trail. In-plan synthesis, no
    // fixture.
    "q302_noindex_gate" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val meta = when(col("doc_id") % 21 === 0,
            lit("<meta name=robots content=noindex>"))
          .when(col("doc_id") % 14 === 0,
            lit("<meta name=\"robots\" content=\"noindex, nofollow\">"))
          .when(col("doc_id") % 7 === 0,
            lit("<meta content='noindex' name='robots'>"))
          .otherwise(when(col("doc_id") % 5 === 0,
            lit("<meta name=\"robots\" content=\"index, follow\">"))
            .otherwise(lit("")))
        val html = concat(lit("<html><head>"), meta,
          lit("</head><body><p>"), col("text"), lit("</p></body></html>"))
        docs.select(col("doc_id"), col("source"),
            graft.llm.Html.metaRobots(html).as("robots"),
            graft.llm.Html.noindex(html).as("graft_ni"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_pages"),
            sum(when(col("graft_ni"), 1L).otherwise(0L)).as("n_noindex"),
            sum(when(col("robots").isNull, 1L).otherwise(0L)).as("n_undeclared"))
          .orderBy("source")
      },
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_pages,
             |  CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_noindex,
             |  CAST(sum(CASE WHEN doc_id % 7 <> 0 AND doc_id % 5 <> 0
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_undeclared
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // ---- Charset-aware response decode (Html.responseTextCharset):
    // half the crawl's pages ship as ISO-8859-1 BYTES (declared in the
    // Content-Type header), a third of the rest declare utf-8 only via
    // a <meta charset> tag — every page carries the same non-ASCII
    // text (" café à né"), so a reader that decodes everything as
    // UTF-8 mangles the latin-1 half into U+FFFD and hash-fails here.
    // The oracle reconstructs the expected extraction from the source
    // text — charset handling must be LOSSLESS end to end.
    "q303_charset_decode" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val tag = Registry.contentTag(docs, "doc_id", "text")
        val fixture = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft-warccs-v1-$tag.warc")
        if (!fixture.isFile) {
          val rows = docs.select(col("doc_id"), col("text"))
            .orderBy("doc_id").collect()
          val tmp = new java.io.File(fixture.getParentFile, fixture.getName + ".tmp")
          val out = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(tmp))
          try rows.foreach { r =>
            val (id, text) = (r.getLong(0), r.getString(1))
            val latin = id % 2 == 0
            val metaOnly = !latin && id % 3 == 0
            val head = if (metaOnly) "<head><meta charset=\"utf-8\"></head>" else ""
            val body = s"<html>$head<body><p>$text café à né</p></body></html>"
            val ctype = if (latin) "text/html; charset=ISO-8859-1"
              else if (metaOnly) "text/html"
              else "text/html; charset=UTF-8"
            val msg = s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n\r\n$body"
            val bytes = msg.getBytes(
              if (latin) java.nio.charset.StandardCharsets.ISO_8859_1
              else java.nio.charset.StandardCharsets.UTF_8)
            out.write(graft.fixtures.FixtureBytes.warcRecord(
              s"http://cs/doc/$id", bytes, warcType = "response"))
          } finally out.close()
          java.nio.file.Files.move(tmp.toPath, fixture.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        val parsed = graft.sources.WarcCorpus.read(s, fixture.toString,
          chunkSize = 16 * 1024)
        graft.sources.WarcCorpus.clean(parsed)
          .select(
            regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1)
              .cast("long").as("doc_id"),
            graft.llm.Html.responseTextCharset(col("payload")).as("text_out"))
          .orderBy("doc_id")
      },
      Some(s"""WITH b AS (SELECT doc_id,
              |  '<html><body><p>' || text || ' café à né</p></body></html>' AS body
              |  FROM documents)
              |SELECT doc_id, ${graft.llm.Html.htmlToTextSql("body")} AS text_out
              |FROM b ORDER BY doc_id""".stripMargin)),

    // ---- Main-block extraction (Html.mainBlockText — the
    // trafilatura-style boilerplate heuristic as exact semantics):
    // each doc rendered as a page whose nav, sidebar, and footer are
    // separate block segments around the body prose; the split-clean-
    // argmax chain must pick the longest cleaned segment, and the
    // oracle replays the identical split pattern, per-segment clean,
    // and struct (length, text) max. Whole-page htmlToText rides
    // along for the contrast audit (boilerplate chars included vs
    // excluded).
    "q304_main_block" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val html = concat(
          lit("<html><head><title>Example page</title></head><body>" +
            "<nav><a href=\"/h\">Home</a> <a href=\"/a\">About</a> " +
            "<a href=\"/c\">Contact</a></nav>" +
            "<div class=\"side\">subscribe to the weekly newsletter</div><p>"),
          col("text"),
          lit("</p><footer>copyright 2026 example corp all rights reserved" +
            "</footer></body></html>"))
        docs.select(col("doc_id"),
            graft.llm.Html.mainBlockText(html).as("main_out"),
            length(graft.llm.Html.htmlToText(html)).cast("long").as("full_chars"))
          .withColumn("main_chars", length(col("main_out")).cast("long"))
          .orderBy("doc_id")
      },
      Some(s"""WITH h AS (SELECT doc_id,
              |  '<html><head><title>Example page</title></head><body>'
              |  || '<nav><a href="/h">Home</a> <a href="/a">About</a> '
              |  || '<a href="/c">Contact</a></nav>'
              |  || '<div class="side">subscribe to the weekly newsletter</div><p>'
              |  || text
              |  || '</p><footer>copyright 2026 example corp all rights reserved'
              |  || '</footer></body></html>' AS html
              |  FROM documents),
              |x AS (SELECT doc_id,
              |  ${graft.llm.Html.mainBlockTextSql("html")} AS main_out,
              |  CAST(length(${graft.llm.Html.htmlToTextSql("html")}) AS BIGINT)
              |    AS full_chars
              |  FROM h)
              |SELECT doc_id, main_out, full_chars,
              |  CAST(length(main_out) AS BIGINT) AS main_chars
              |FROM x ORDER BY doc_id""".stripMargin)),

    // ---- Content-type routing (the mime dispatch a raw crawl batch
    // needs before anything reads payloads): a mixed WARC — every
    // %3rd response carries image/jpeg BYTES, the rest text/html —
    // routes on the Content-Type header; html rows extract
    // charset-aware text, image rows surface their body BYTES
    // byte-exact (length + sha256 pinned against the planted jpeg),
    // each path blind to the other's columns.
    "q305_mime_routing" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val tag = Registry.contentTag(docs, "doc_id", "text")
        val jpeg = graft.fixtures.FixtureBytes.jpeg()
        val fixture = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft-warcmime-v1-$tag.warc")
        if (!fixture.isFile) {
          val rows = docs.select(col("doc_id"), col("text"))
            .orderBy("doc_id").collect()
          val tmp = new java.io.File(fixture.getParentFile, fixture.getName + ".tmp")
          val out = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(tmp))
          try rows.foreach { r =>
            val (id, text) = (r.getLong(0), r.getString(1))
            val payload: Array[Byte] =
              if (id % 3 == 0)
                ("HTTP/1.1 200 OK\r\nContent-Type: image/jpeg\r\n\r\n")
                  .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++ jpeg
              else
                (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n\r\n" +
                  s"<html><body><p>$text</p></body></html>")
                  .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            out.write(graft.fixtures.FixtureBytes.warcRecord(
              s"http://mime/doc/$id", payload, warcType = "response"))
          } finally out.close()
          java.nio.file.Files.move(tmp.toPath, fixture.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        val parsed = graft.sources.WarcCorpus.read(s, fixture.toString,
          chunkSize = 16 * 1024)
        val msg = decode(col("payload"), "ISO-8859-1")
        val ctype = lower(coalesce(
          graft.llm.Html.httpHeader(msg, "Content-Type"), lit("")))
        val kind = when(ctype.startsWith("image/"), lit("image"))
          .when(ctype.startsWith("text/html"), lit("html"))
          .otherwise(lit("other"))
        graft.sources.WarcCorpus.clean(parsed)
          .select(
            regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1)
              .cast("long").as("doc_id"),
            kind.as("kind"),
            when(kind === "html",
              length(graft.llm.Html.responseTextCharset(col("payload"))))
              .cast("long").as("n_chars"),
            when(kind === "image",
              length(graft.llm.Html.httpBodyBytes(col("payload"))))
              .cast("long").as("n_bytes"),
            when(kind === "image",
              sha2(graft.llm.Html.httpBodyBytes(col("payload")), 256))
              .as("sha256"))
          .orderBy("doc_id")
      },
      Some(s"""WITH b AS (SELECT doc_id,
              |  '<html><body><p>' || text || '</p></body></html>' AS body
              |  FROM documents)
              |SELECT doc_id,
              |  CASE WHEN doc_id % 3 = 0 THEN 'image' ELSE 'html' END AS kind,
              |  CASE WHEN doc_id % 3 = 0 THEN NULL
              |    ELSE CAST(length(${graft.llm.Html.htmlToTextSql("body")}) AS BIGINT)
              |  END AS n_chars,
              |  CASE WHEN doc_id % 3 = 0
              |    THEN CAST(${graft.fixtures.FixtureBytes.jpeg().length} AS BIGINT)
              |    ELSE NULL END AS n_bytes,
              |  CASE WHEN doc_id % 3 = 0
              |    THEN '${graft.fixtures.FixtureBytes.sha256Hex(graft.fixtures.FixtureBytes.jpeg())}'
              |    ELSE NULL END AS sha256
              |FROM b ORDER BY doc_id""".stripMargin)),

    // ---- CJK/multibyte charset decode (Html.responseTextCharset, the
    // round-14 dispatch): every doc becomes a page ENCODED in one of
    // eight charsets (shift_jis, euc-jp, gbk-as-gb2312, gb18030, big5,
    // euc-kr, REAL windows-1252, utf-8 control) with a per-charset
    // marker whose bytes differ from both latin1 and utf-8 — a wrong
    // decode arm cannot hash-match. DuckDB cannot decode these
    // charsets, so the oracle predicts the post-decode text as
    // literals (the q297 fixture pattern: corpus text is pure ASCII —
    // gate-checked — so only the marker exercises the multibyte path,
    // and the expected text is text || marker verbatim).
    "q306_charset_cjk" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val tag = Registry.contentTag(docs, "doc_id", "text")
        val fixture = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft-warccjk-v1-$tag.warc")
        if (!fixture.isFile) {
          val rows = docs.select(col("doc_id"), col("text"))
            .orderBy("doc_id").collect()
          val tmp = new java.io.File(fixture.getParentFile, fixture.getName + ".tmp")
          val out = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(tmp))
          try rows.foreach { r =>
            val (id, text) = (r.getLong(0), r.getString(1))
            val (jvm, label, marker) = CjkArms((id % 8).toInt)
            val body = s"<html><body><p>$text $marker</p></body></html>"
            val msg = "HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
              s"charset=$label\r\n\r\n$body"
            out.write(graft.fixtures.FixtureBytes.warcRecord(
              s"http://cjk/doc/$id",
              msg.getBytes(java.nio.charset.Charset.forName(jvm)),
              warcType = "response"))
          } finally out.close()
          java.nio.file.Files.move(tmp.toPath, fixture.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        val parsed = graft.sources.WarcCorpus.read(s, fixture.toString,
          chunkSize = 16 * 1024)
        graft.sources.WarcCorpus.clean(parsed)
          .select(
            regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1)
              .cast("long").as("doc_id"),
            graft.llm.Html.responseTextCharset(col("payload")).as("text_out"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, text || CASE CAST(doc_id % 8 AS INT)
              |${CjkArms.zipWithIndex.map { case ((_, _, m), i) =>
                  s"  WHEN $i THEN ' $m'" }.mkString("\n")}
              |END AS text_out
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Numeric character references (the codegen'd
    // graft_decode_nrefs step inside Html.inlineClean): an entity-heavy
    // page per doc — decimal, hex, the HTML5 C1 remap (cp1252 curly
    // quotes for &#147;), the &amp;#65; ordering trap, and an invalid
    // NUL ref. In-plan synthesis (no fixture file); the oracle carries
    // the expected decoded literals, because the SQL replay
    // deliberately does not re-express the decode.
    "q307_numeric_refs" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val html = concat(lit("<html><body><p>"), col("text"),
          lit(" caf&#233; caf&#xE9; &#147;q&#148; &#x20AC;5 &amp;#65; &#0;" +
            "</p></body></html>"))
        docs.select(col("doc_id"),
            graft.llm.Html.htmlToText(html).as("text_out"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  text || ' café café “q” €5 &#65; ' || chr(65533) AS text_out
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- robots.txt compliance (graft.llm.Robots): 20 synthetic hosts
    // whose robots bodies exercise every pinned arm — agent-specific
    // groups (selected INSTEAD of *), comment lines, the conservative
    // wildcard reductions (Disallow truncation, dropped $-Allow),
    // longest-match with the allow tiebreak — against five URL path
    // shapes per host. The oracle REPLAYS the full semantics in SQL
    // (line split → group windows → agent selection → longest-match
    // parity rank), sharing the host/target regex constants verbatim.
    "q308_robots_rules" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = Registry.table(s, dir, "documents")
        val robots = (0 until 20).map { h =>
          val txt = "# graft test\n" +
            (if (h % 3 == 0)
              "User-agent: graftbot\nDisallow: /private/\nAllow: /private/ok\n"
             else "") +
            "User-agent: *\nDisallow: /tmp/\nDisallow: /cgi*bin/\n" +
            "Allow: /tmp/pub$\n" +
            (if (h % 4 == 0) "Disallow: /blocked\n" else "")
          (s"site$h.example", txt)
        }.toDF("host", "robots_txt")
        val urls = docs.select(col("doc_id"),
          concat(lit("http://site"), col("doc_id") % 20, lit(".example"),
            expr("""CASE CAST(doc_id % 5 AS INT)
                   |  WHEN 0 THEN '/private/ok/p' || doc_id
                   |  WHEN 1 THEN '/private/x' || doc_id
                   |  WHEN 2 THEN '/tmp/y' || doc_id
                   |  WHEN 3 THEN '/cgiXbin/z' || doc_id
                   |  ELSE '/blocked/w' || doc_id END""".stripMargin)).as("url"))
        graft.llm.Robots.disallowed(urls, "url", robots, "host", "robots_txt",
            agent = "graftbot")
          .select(col("doc_id"), col("url"), col("disallowed"))
          .orderBy("doc_id")
      },
      Some(s"""WITH hosts AS MATERIALIZED (
              |  SELECT h, 'site' || h || '.example' AS host,
              |    '# graft test' || chr(10) ||
              |    CASE WHEN h % 3 = 0 THEN 'User-agent: graftbot' || chr(10)
              |      || 'Disallow: /private/' || chr(10)
              |      || 'Allow: /private/ok' || chr(10) ELSE '' END ||
              |    'User-agent: *' || chr(10) || 'Disallow: /tmp/' || chr(10)
              |    || 'Disallow: /cgi*bin/' || chr(10) || 'Allow: /tmp/pub$$' || chr(10)
              |    || CASE WHEN h % 4 = 0 THEN 'Disallow: /blocked' || chr(10)
              |       ELSE '' END AS txt
              |  FROM (SELECT unnest(range(0, 20)) AS h)),
              |lns AS MATERIALIZED (
              |  SELECT host, i AS ln, arr[CAST(i AS INT)] AS l
              |  FROM (SELECT host,
              |          regexp_split_to_array(txt, chr(13) || '?' || chr(10)) AS arr
              |        FROM hosts), LATERAL (SELECT unnest(range(1, len(arr) + 1)) AS i)),
              |parsed AS MATERIALIZED (
              |  SELECT host, ln,
              |    lower(trim(regexp_extract(nc, '^([^:]+):', 1))) AS nm,
              |    trim(regexp_extract(nc, '^[^:]+:(.*)$$', 1)) AS v
              |  FROM (SELECT host, ln, regexp_replace(l, '#.*$$', '') AS nc FROM lns)
              |  WHERE lower(trim(regexp_extract(nc, '^([^:]+):', 1)))
              |    IN ('user-agent', 'allow', 'disallow', 'crawl-delay')),
              |g AS MATERIALIZED (
              |  SELECT host, nm, v,
              |    CAST(SUM(CASE WHEN isua AND NOT prev THEN 1 ELSE 0 END)
              |      OVER (PARTITION BY host ORDER BY ln
              |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS grp
              |  FROM (SELECT *, nm = 'user-agent' AS isua,
              |          coalesce(last_value(CASE WHEN nm <> 'crawl-delay'
              |              THEN nm = 'user-agent' END IGNORE NULLS)
              |            OVER (PARTITION BY host ORDER BY ln
              |                  ROWS BETWEEN UNBOUNDED PRECEDING
              |                  AND 1 PRECEDING), false) AS prev
              |        FROM parsed)),
              |uas AS MATERIALIZED (
              |  SELECT DISTINCT host, grp, lower(v) AS ua FROM g
              |  WHERE nm = 'user-agent'),
              |spec AS (SELECT DISTINCT host FROM uas WHERE ua = 'graftbot'),
              |chosen AS MATERIALIZED (
              |  SELECT DISTINCT host, grp FROM uas WHERE ua = 'graftbot'
              |  UNION
              |  SELECT DISTINCT host, grp FROM uas
              |  WHERE ua = '*' AND host NOT IN (SELECT host FROM spec)),
              |rules AS MATERIALIZED (
              |  SELECT lower(host) AS host, nm, path FROM (
              |    SELECT g2.host, g2.nm,
              |      CASE WHEN g2.nm = 'disallow' AND g2.v <> '' THEN
              |             CASE WHEN tr = '' THEN '/' ELSE tr END
              |           WHEN g2.nm = 'allow' AND g2.v NOT LIKE '%*%'
              |                AND g2.v NOT LIKE '%$$%' THEN g2.v END AS path
              |    FROM (SELECT *, regexp_extract(
              |            regexp_replace(v, '\\$$$$', ''), '^([^*]*)', 1) AS tr
              |          FROM g WHERE nm IN ('allow', 'disallow')) g2
              |    JOIN chosen c ON c.host = g2.host AND c.grp = g2.grp)
              |  WHERE path IS NOT NULL AND path <> ''),
              |u AS MATERIALIZED (
              |  SELECT doc_id, 'http://site' || (doc_id % 20) || '.example' ||
              |    CASE CAST(doc_id % 5 AS INT)
              |      WHEN 0 THEN '/private/ok/p' || doc_id
              |      WHEN 1 THEN '/private/x' || doc_id
              |      WHEN 2 THEN '/tmp/y' || doc_id
              |      WHEN 3 THEN '/cgiXbin/z' || doc_id
              |      ELSE '/blocked/w' || doc_id END AS url
              |  FROM documents),
              |k AS MATERIALIZED (
              |  SELECT doc_id, url,
              |    lower(nullif(regexp_extract(url,
              |      ${graft.llm.UrlOps.sqlLit(graft.llm.UrlOps.hostRegex)}, 1), '')) AS uh,
              |    CASE WHEN regexp_extract(url,
              |           ${graft.llm.UrlOps.sqlLit(graft.llm.Robots.targetRegex)}, 1) = '' THEN '/'
              |         WHEN substr(regexp_extract(url,
              |           ${graft.llm.UrlOps.sqlLit(graft.llm.Robots.targetRegex)}, 1), 1, 1) = '/'
              |           THEN regexp_extract(url,
              |             ${graft.llm.UrlOps.sqlLit(graft.llm.Robots.targetRegex)}, 1)
              |         ELSE '/' || regexp_extract(url,
              |           ${graft.llm.UrlOps.sqlLit(graft.llm.Robots.targetRegex)}, 1)
              |    END AS t
              |  FROM u),
              |vd AS (
              |  SELECT k.doc_id, k.url,
              |    CAST(max(2 * length(r.path) +
              |      CASE WHEN r.nm = 'allow' THEN 1 ELSE 0 END) AS BIGINT) AS rnk
              |  FROM k JOIN rules r ON r.host = k.uh
              |    AND substr(k.t, 1, length(r.path)) = r.path
              |  GROUP BY k.doc_id, k.url)
              |SELECT k.doc_id, k.url,
              |  coalesce(vd.rnk % 2 = 0, false) AS disallowed
              |FROM k LEFT JOIN vd ON vd.doc_id = k.doc_id
              |ORDER BY k.doc_id""".stripMargin)),

    // ---- Per-domain politeness cap (Robots.perDomainCap): subdomain
    // variants fold onto one registered domain, at most 3 URLs per
    // domain survive, deterministic by URL order — the WindowGroupLimit
    // rank filter replayed as a plain row_number window.
    "q309_domain_cap" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val urls = docs.select(col("doc_id"),
          concat(
            expr("""CASE CAST(doc_id % 3 AS INT)
                   |  WHEN 0 THEN 'http://a.' WHEN 1 THEN 'http://b.'
                   |  ELSE 'http://' END""".stripMargin),
            lit("site"), col("doc_id") % 10, lit(".example/p/"),
            col("doc_id")).as("url"))
        graft.llm.Robots.perDomainCap(urls, "url", cap = 3)
          .orderBy("doc_id")
      },
      Some(s"""WITH u AS (
              |  SELECT doc_id,
              |    CASE CAST(doc_id % 3 AS INT)
              |      WHEN 0 THEN 'http://a.' WHEN 1 THEN 'http://b.'
              |      ELSE 'http://' END
              |    || 'site' || (doc_id % 10) || '.example/p/' || doc_id AS url
              |  FROM documents),
              |h AS (SELECT doc_id, url,
              |    lower(nullif(regexp_extract(url,
              |      ${graft.llm.UrlOps.sqlLit(graft.llm.UrlOps.hostRegex)}, 1), '')) AS host
              |  FROM u),
              |r AS (SELECT doc_id, url, row_number() OVER (
              |    PARTITION BY ${graft.llm.UrlOps.registeredDomainSql("host")}
              |    ORDER BY url) AS rn
              |  FROM h)
              |SELECT doc_id, url FROM r WHERE rn <= 3 ORDER BY doc_id""".stripMargin)),

    // ---- Crawl-delay politeness schedule (Robots.crawlDelays +
    // scheduleManifest): specific-agent groups shadow the '*' group's
    // delay, invalid values ("bogus") are ignored, an unselected
    // group's delay never applies, fractional delays parse, hosts
    // without a directive take the default, and each host's URLs get
    // 0-based fetch slots × delay. The oracle replays group selection
    // (q308's skeleton with crawl-delay participating) + the schedule
    // window.
    "q311_crawl_delay" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = Registry.table(s, dir, "documents")
        val robots = (0 until 20).map { h =>
          val txt = "# graft test\n" +
            (if (h % 3 == 0)
              "User-agent: graftbot\nCrawl-delay: 2\nDisallow: /x\n"
             else "") +
            "User-agent: *\n" +
            (if (h % 4 == 0) "Crawl-delay: 0.5\n" else "") +
            "Disallow: /tmp/\n" +
            (if (h % 5 == 0) "Crawl-delay: bogus\n" else "") +
            (if (h % 6 == 0) "User-agent: other\nCrawl-delay: 9\n" else "")
          (s"site$h.example", txt)
        }.toDF("host", "robots_txt")
        val urls = docs.select(col("doc_id"),
          concat(lit("http://site"), col("doc_id") % 20, lit(".example/p/"),
            col("doc_id")).as("url"))
        graft.llm.Robots.scheduleManifest(urls, "url",
            robots, "host", "robots_txt",
            agent = "graftbot", defaultDelaySec = 1.0)
          .select(col("doc_id"), col("url"), col("crawl_delay_sec"),
            col("fetch_slot"), col("fetch_after_sec"))
          .orderBy("doc_id")
      },
      Some(s"""WITH hosts AS MATERIALIZED (
              |  SELECT h, 'site' || h || '.example' AS host,
              |    '# graft test' || chr(10) ||
              |    CASE WHEN h % 3 = 0 THEN 'User-agent: graftbot' || chr(10)
              |      || 'Crawl-delay: 2' || chr(10)
              |      || 'Disallow: /x' || chr(10) ELSE '' END ||
              |    'User-agent: *' || chr(10) ||
              |    CASE WHEN h % 4 = 0 THEN 'Crawl-delay: 0.5' || chr(10)
              |      ELSE '' END ||
              |    'Disallow: /tmp/' || chr(10) ||
              |    CASE WHEN h % 5 = 0 THEN 'Crawl-delay: bogus' || chr(10)
              |      ELSE '' END ||
              |    CASE WHEN h % 6 = 0 THEN 'User-agent: other' || chr(10)
              |      || 'Crawl-delay: 9' || chr(10) ELSE '' END AS txt
              |  FROM (SELECT unnest(range(0, 20)) AS h)),
              |lns AS MATERIALIZED (
              |  SELECT host, i AS ln, arr[CAST(i AS INT)] AS l
              |  FROM (SELECT host,
              |          regexp_split_to_array(txt, chr(13) || '?' || chr(10)) AS arr
              |        FROM hosts), LATERAL (SELECT unnest(range(1, len(arr) + 1)) AS i)),
              |parsed AS MATERIALIZED (
              |  SELECT host, ln,
              |    lower(trim(regexp_extract(nc, '^([^:]+):', 1))) AS nm,
              |    trim(regexp_extract(nc, '^[^:]+:(.*)$$', 1)) AS v
              |  FROM (SELECT host, ln, regexp_replace(l, '#.*$$', '') AS nc FROM lns)
              |  WHERE lower(trim(regexp_extract(nc, '^([^:]+):', 1)))
              |    IN ('user-agent', 'allow', 'disallow', 'crawl-delay')),
              |g AS MATERIALIZED (
              |  SELECT host, nm, v,
              |    CAST(SUM(CASE WHEN isua AND NOT prev THEN 1 ELSE 0 END)
              |      OVER (PARTITION BY host ORDER BY ln
              |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS grp
              |  FROM (SELECT *, nm = 'user-agent' AS isua,
              |          coalesce(last_value(CASE WHEN nm <> 'crawl-delay'
              |              THEN nm = 'user-agent' END IGNORE NULLS)
              |            OVER (PARTITION BY host ORDER BY ln
              |                  ROWS BETWEEN UNBOUNDED PRECEDING
              |                  AND 1 PRECEDING), false) AS prev
              |        FROM parsed)),
              |uas AS MATERIALIZED (
              |  SELECT DISTINCT host, grp, lower(v) AS ua FROM g
              |  WHERE nm = 'user-agent'),
              |spec AS (SELECT DISTINCT host FROM uas WHERE ua = 'graftbot'),
              |chosen AS MATERIALIZED (
              |  SELECT DISTINCT host, grp FROM uas WHERE ua = 'graftbot'
              |  UNION
              |  SELECT DISTINCT host, grp FROM uas
              |  WHERE ua = '*' AND host NOT IN (SELECT host FROM spec)),
              |delays AS MATERIALIZED (
              |  SELECT lower(g.host) AS dh,
              |    max(CAST(g.v AS DOUBLE)) AS crawl_delay_sec
              |  FROM g JOIN chosen c ON c.host = g.host AND c.grp = g.grp
              |  WHERE g.nm = 'crawl-delay'
              |    AND regexp_matches(g.v, '^[0-9]+(\\.[0-9]+)?\\z')
              |  GROUP BY 1),
              |u AS MATERIALIZED (
              |  SELECT doc_id,
              |    'http://site' || (doc_id % 20) || '.example/p/' || doc_id AS url
              |  FROM documents),
              |k AS MATERIALIZED (
              |  SELECT doc_id, url,
              |    lower(nullif(regexp_extract(url,
              |      ${graft.llm.UrlOps.sqlLit(graft.llm.UrlOps.hostRegex)}, 1), '')) AS uh
              |  FROM u)
              |SELECT k.doc_id, k.url,
              |  coalesce(d.crawl_delay_sec, CAST(1.0 AS DOUBLE)) AS crawl_delay_sec,
              |  CAST(row_number() OVER (PARTITION BY k.uh ORDER BY k.url) - 1
              |    AS BIGINT) AS fetch_slot,
              |  (row_number() OVER (PARTITION BY k.uh ORDER BY k.url) - 1)
              |    * coalesce(d.crawl_delay_sec, CAST(1.0 AS DOUBLE)) AS fetch_after_sec
              |FROM k LEFT JOIN delays d ON d.dh = k.uh
              |ORDER BY k.doc_id""".stripMargin)),

    // ---- Sitemap discovery (Robots.sitemapUrls + Html.sitemapLocs):
    // phase 'directive' harvests Sitemap lines from a robots corpus
    // (group-independent; relative values resolve against the https
    // root), phase 'loc' harvests <loc> values from fetched sitemap
    // XML bodies (whitespace-padded, entity-bearing — &amp; decodes
    // exactly once). The fixtures synthesize arithmetically, so the
    // oracle predicts every decoded URL as a literal (the q297
    // pattern — DuckDB never needs the decode kernel).
    "q312_sitemap_harvest" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = Registry.table(s, dir, "documents")
        val nHosts = 20
        val robots = (0 until nHosts).map { h =>
          val txt = "User-agent: *\nDisallow: /x\n" +
            (if (h % 3 == 0) s"Sitemap: https://site$h.example/sm.xml\n" else "") +
            (if (h % 4 == 0) "Sitemap: /sm2.xml\n" else "")
          (s"site$h.example", txt)
        }.toDF("host", "robots_txt")
        val sitemaps = (0 until nHosts).map { h =>
          // every 5th host CDATA-wraps its first loc — the unwrap
          // yields the SAME URL, so the oracle is shared verbatim
          val loc0 =
            if (h % 5 == 0)
              s"<loc><![CDATA[https://site$h.example/d/${h}00]]></loc>"
            else s"<loc> https://site$h.example/d/${h}00 </loc>"
          val xml = "<?xml version=\"1.0\"?><urlset>" +
            s"<url>$loc0</url>" +
            (if (h % 2 == 0)
              s"<url><loc>https://site$h.example/s?a=1&amp;b=$h</loc></url>"
             else "") +
            "</urlset>"
          (s"site$h.example", xml)
        }.toDF("host", "xml")
        val directives = graft.llm.Robots
          .sitemapUrls(robots, "host", "robots_txt")
          .select(lit("directive").as("phase"), col("host"),
            col("sitemap_url").as("url"))
        val locs = sitemaps
          .select(col("host"), posexplode(
            graft.llm.Html.sitemapLocs(col("xml"))))
          .select(lit("loc").as("phase"), col("host"), col("col").as("url"))
        // anchor the fixture to the table so the driver's rows>0 smoke
        // and the oracle share a corpus-derived guard
        val guard = docs.agg(count(lit(1)).as("n"))
        directives.unionByName(locs)
          .join(guard.filter(col("n") > 0).select(lit(1).as("graft_one")))
          .drop("graft_one")
          .orderBy("phase", "host", "url")
      },
      Some("""WITH h AS (SELECT unnest(range(0, 20)) AS h),
             |guard AS (SELECT count(*) AS n FROM documents),
             |rows_ AS (
             |  SELECT 'directive' AS phase, 'site' || h || '.example' AS host,
             |    'https://site' || h || '.example/sm.xml' AS url
             |  FROM h WHERE h % 3 = 0
             |  UNION ALL
             |  SELECT 'directive', 'site' || h || '.example',
             |    'https://site' || h || '.example/sm2.xml'
             |  FROM h WHERE h % 4 = 0
             |  UNION ALL
             |  SELECT 'loc', 'site' || h || '.example',
             |    'https://site' || h || '.example/d/' || h || '00'
             |  FROM h
             |  UNION ALL
             |  SELECT 'loc', 'site' || h || '.example',
             |    'https://site' || h || '.example/s?a=1&b=' || h
             |  FROM h WHERE h % 2 = 0)
             |SELECT phase, host, url FROM rows_, guard WHERE guard.n > 0
             |ORDER BY phase, host, url""".stripMargin)),

    // ---- Redirect-chain walk (Html.redirectTarget ∘ UrlOps.resolveUrl
    // + a 3-lookup bounded follow): messages synthesize with real
    // header blocks (Spark EXTRACTS status + Location and RESOLVES
    // root-relative and bare-relative values; the oracle PREDICTS both
    // arithmetically — the q297 pattern). Chains r/0→r/1→r/2→… end at
    // every %4==3 record (terminal), jump cross-host at %8==2
    // (dangling — no record serves d.example), or exhaust the pinned
    // 3-lookup budget (capped). The walk is two broadcast-shaped self
    // joins over batch-bounded edges — no iteration, no driver loop.
    "q313_redirect_hops" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val url = concat(lit("http://c.example/r/"), col("doc_id"))
        val loc = when(col("doc_id") % 8 === 2,
            concat(lit("https://d.example/final/"), col("doc_id")))
          .when(col("doc_id") % 4 === 1, (col("doc_id") + 1).cast("string"))
          .otherwise(concat(lit("/r/"), col("doc_id") + 1))
        val msg = when(col("doc_id") % 4 === 3,
            lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>done</html>"))
          .otherwise(concat(
            lit("HTTP/1.1 301 Moved Permanently\r\nLocation: "), loc,
            lit("\r\nContent-Type: text/html\r\n\r\n<html>moved</html>")))
        val msgs = docs.select(col("doc_id"), url.as("url"), msg.as("msg"))
        // the regex chain (status + Location + resolve) feeds THREE join
        // branches — persist or it executes once per branch (PERF
        // LESSON 1); the hop lookups are url-keyed projections of the
        // same cached frame, broadcast so the walk stays shuffle-free
        val edges = graft.llm.CacheRegistry.persist(
          msgs.select(col("url"),
            graft.llm.Html.httpStatus(col("msg")).as("status"),
            graft.llm.UrlOps.resolveUrl(col("url"),
              graft.llm.Html.redirectTarget(col("msg"))).as("tgt")))
        val e1 = edges.select(col("url").as("u1k"), col("tgt").as("t1"))
        val e2 = edges.select(col("url").as("u2k"), col("tgt").as("t2"))
        msgs.select(col("doc_id"), col("url"))
          .join(edges, Seq("url"))
          .join(broadcast(e1), col("tgt") === col("u1k"), "left")
          .join(broadcast(e2), col("t1") === col("u2k"), "left")
          .select(col("doc_id"), col("url"), col("status"),
            when(col("tgt").isNull, col("url"))
              .when(col("u1k").isNull, col("tgt"))
              .when(col("t1").isNull, col("tgt"))
              .when(col("u2k").isNull, col("t1"))
              .when(col("t2").isNull, col("t1"))
              .otherwise(col("t2")).as("final_url"),
            when(col("tgt").isNull, lit(0L))
              .when(col("u1k").isNull || col("t1").isNull, lit(1L))
              .when(col("u2k").isNull || col("t2").isNull, lit(2L))
              .otherwise(lit(3L)).as("hops"),
            when(col("tgt").isNull, lit("terminal"))
              .when(col("u1k").isNull, lit("dangling"))
              .when(col("t1").isNull, lit("terminal"))
              .when(col("u2k").isNull, lit("dangling"))
              .when(col("t2").isNull, lit("terminal"))
              .otherwise(lit("capped")).as("state"))
          .orderBy("doc_id")
      },
      Some("""WITH edges AS MATERIALIZED (
             |  SELECT doc_id, 'http://c.example/r/' || doc_id AS url,
             |    CASE WHEN doc_id % 4 = 3 THEN 200 ELSE 301 END AS status,
             |    CASE WHEN doc_id % 4 = 3 THEN NULL
             |         WHEN doc_id % 8 = 2 THEN 'https://d.example/final/' || doc_id
             |         ELSE 'http://c.example/r/' || (doc_id + 1) END AS tgt
             |  FROM documents)
             |SELECT e.doc_id, e.url, e.status,
             |  CASE WHEN e.tgt IS NULL THEN e.url
             |       WHEN e1.u1k IS NULL THEN e.tgt
             |       WHEN e1.t1 IS NULL THEN e.tgt
             |       WHEN e2.u2k IS NULL THEN e1.t1
             |       WHEN e2.t2 IS NULL THEN e1.t1
             |       ELSE e2.t2 END AS final_url,
             |  CAST(CASE WHEN e.tgt IS NULL THEN 0
             |       WHEN e1.u1k IS NULL OR e1.t1 IS NULL THEN 1
             |       WHEN e2.u2k IS NULL OR e2.t2 IS NULL THEN 2
             |       ELSE 3 END AS BIGINT) AS hops,
             |  CASE WHEN e.tgt IS NULL THEN 'terminal'
             |       WHEN e1.u1k IS NULL THEN 'dangling'
             |       WHEN e1.t1 IS NULL THEN 'terminal'
             |       WHEN e2.u2k IS NULL THEN 'dangling'
             |       WHEN e2.t2 IS NULL THEN 'terminal'
             |       ELSE 'capped' END AS state
             |FROM edges e
             |LEFT JOIN (SELECT url AS u1k, tgt AS t1 FROM edges) e1
             |  ON e.tgt = e1.u1k
             |LEFT JOIN (SELECT url AS u2k, tgt AS t2 FROM edges) e2
             |  ON e1.t1 = e2.u2k
             |ORDER BY e.doc_id""".stripMargin)),

    // ---- Revalidation manifest (Html.validators): cache validators
    // extract from real header blocks and route each previously
    // fetched URL to a conditional GET (any validator present) or a
    // full refetch (none, or Cache-Control: no-store) — the recrawl
    // plan that refreshes a corpus at 304-cost instead of
    // re-downloading it. Spark EXTRACTS from synthesized messages; the
    // oracle PREDICTS arithmetically (the q297 pattern).
    "q314_revalidation_manifest" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val etagH = when(col("doc_id") % 2 === 0,
          concat(lit("ETag: W/\"v"), col("doc_id"), lit("\"\r\n")))
          .otherwise(lit(""))
        val lmH = when(col("doc_id") % 3 === 0,
          concat(lit("Last-Modified: Mon, 0"), col("doc_id") % 9 + 1,
            lit(" Jan 2024 00:00:00 GMT\r\n")))
          .otherwise(lit(""))
        val ccH = when(col("doc_id") % 7 === 0,
          lit("Cache-Control: private, no-store\r\n")).otherwise(lit(""))
        val msg = concat(lit("HTTP/1.1 200 OK\r\n"), etagH, lmH, ccH,
          lit("Content-Type: text/html\r\n\r\n<html>x</html>"))
        val recs = docs.select(col("doc_id"),
          concat(lit("https://r.example/p/"), col("doc_id")).as("url"),
          msg.as("msg"))
        val v = graft.llm.Html.validators(col("msg"))
        val cc = graft.llm.Html.httpHeader(col("msg"), "Cache-Control")
        recs
          .withColumn("etag", v.getField("etag"))
          .withColumn("last_modified", v.getField("last_modified"))
          .withColumn("mode",
            when(lower(coalesce(cc, lit(""))).contains("no-store"), "full")
              .when(col("etag").isNull && col("last_modified").isNull, "full")
              .otherwise("conditional"))
          .select(col("doc_id"), col("url"), col("etag"),
            col("last_modified"), col("mode"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, 'https://r.example/p/' || doc_id AS url,
             |  CASE WHEN doc_id % 2 = 0 THEN 'W/"v' || doc_id || '"' END AS etag,
             |  CASE WHEN doc_id % 3 = 0 THEN 'Mon, 0' || ((doc_id % 9) + 1)
             |    || ' Jan 2024 00:00:00 GMT' END AS last_modified,
             |  CASE WHEN doc_id % 7 = 0 THEN 'full'
             |       WHEN doc_id % 2 <> 0 AND doc_id % 3 <> 0 THEN 'full'
             |       ELSE 'conditional' END AS mode
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- URL canonicalization into dedup/frontier keys
    // (UrlOps.urlNormalize): fragment + tracking params drop, default
    // ports strip, scheme/authority case-fold, empty path becomes '/',
    // non-default ports and path case survive, authority-less inputs
    // are NULL. The oracle replays urlNormalizeSql over the same pairs.
    "q315_url_normalize" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val u = expr("""CASE CAST(doc_id % 5 AS INT)
                      |  WHEN 0 THEN 'HTTP://WWW.Ex' || (doc_id % 7)
                      |    || '.EXAMPLE:80/Path/P' || doc_id
                      |    || '?utm_source=x&a=' || doc_id || '&fbclid=zz#frag'
                      |  WHEN 1 THEN 'https://Site' || (doc_id % 7)
                      |    || '.example:443'
                      |  WHEN 2 THEN 'https://h' || (doc_id % 7)
                      |    || '.example:8443/p?utm_campaign=c'
                      |  WHEN 3 THEN 'not a url'
                      |  ELSE 'http://h' || (doc_id % 7)
                      |    || '.example/p?gclid=1&utm_x' END""".stripMargin)
        docs.select(col("doc_id"), u.as("url"))
          .withColumn("canonical",
            graft.llm.UrlOps.urlNormalize(col("url")))
          .orderBy("doc_id")
      },
      Some(s"""WITH p AS (
              |  SELECT doc_id,
              |    CASE CAST(doc_id % 5 AS INT)
              |      WHEN 0 THEN 'HTTP://WWW.Ex' || (doc_id % 7)
              |        || '.EXAMPLE:80/Path/P' || doc_id
              |        || '?utm_source=x&a=' || doc_id || '&fbclid=zz#frag'
              |      WHEN 1 THEN 'https://Site' || (doc_id % 7)
              |        || '.example:443'
              |      WHEN 2 THEN 'https://h' || (doc_id % 7)
              |        || '.example:8443/p?utm_campaign=c'
              |      WHEN 3 THEN 'not a url'
              |      ELSE 'http://h' || (doc_id % 7)
              |        || '.example/p?gclid=1&utm_x' END AS url
              |  FROM documents)
              |SELECT doc_id, url,
              |  ${graft.llm.UrlOps.urlNormalizeSql("url")} AS canonical
              |FROM p ORDER BY doc_id""".stripMargin)),

    // ---- Anchor-text harvest (Html.anchorTexts): (href, text) pairs
    // with inner tags stripped, entities decoded once, whitespace
    // collapsed; dq anchors before sq (the extractLinks order
    // contract); a data-href tracker never harvests. Spark EXTRACTS
    // from synthesized markup; the oracle PREDICTS the cleaned pairs
    // arithmetically (the q297 pattern).
    "q316_anchor_text" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val html = concat(
          lit("<html><body><p>pre</p><a class=\"x\" href=\"https://a.example/d/"),
          col("doc_id"),
          lit("\">Read <b>More</b> &amp; info</a>"),
          lit("<a data-href=\"https://tracker.example/t\">skip</a>"),
          lit("<a href='/rel/"), col("doc_id"),
          lit("'>  go\n here </a></body></html>"))
        docs.select(col("doc_id"),
            posexplode(graft.llm.Html.anchorTexts(html)))
          .select(col("doc_id"), col("pos").cast("long").as("idx"),
            col("col.href").as("href"), col("col.text").as("text"))
          .orderBy("doc_id", "idx")
      },
      Some("""SELECT doc_id, idx, href, text FROM (
             |  SELECT doc_id, CAST(0 AS BIGINT) AS idx,
             |    'https://a.example/d/' || doc_id AS href,
             |    'Read More & info' AS text
             |  FROM documents
             |  UNION ALL
             |  SELECT doc_id, CAST(1 AS BIGINT), '/rel/' || doc_id, 'go here'
             |  FROM documents) t
             |ORDER BY doc_id, idx""".stripMargin)),

    // ---- Crawl → web graph → rank: the harvested outlinks become a
    // HOST-level edge list (weight = link count, intra-host links
    // dropped) and GraphOps.pageRank ranks the hosts — the CommonCrawl
    // webgraph product, composed end-to-end from the same operators
    // the discovery loop runs (extractLinks → host → groupBy). At
    // 100 TB the edge build is one map-side explode + one shuffle to
    // (src,dst); the host graph itself is tiny relative to the page
    // corpus (|hosts|² bound), which is exactly why ranking at host
    // grain is the scalable first cut. The oracle rebuilds the edges
    // arithmetically and unrolls 6 integer-exact iterations
    // (OracleGen.pageRankChain — the q160 precedent).
    "q317_host_rank" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val h = col("doc_id") % 8
        val pageUrl = concat(lit("https://h"), h.cast("string"),
          lit(".example/p/"), col("doc_id").cast("string"))
        val html = concat(
          lit("<html><body><a href=\"https://h"),
          ((h + 1) % 8).cast("string"), lit(".example/\">next</a>"),
          lit("<a href=\"https://h0.example/\">hub</a>"),
          when(col("doc_id") % 3 === 0,
            concat(lit("<a href='https://h"), ((h + 5) % 8).cast("string"),
              lit(".example/x'>far</a>"))).otherwise(lit("")),
          lit("</body></html>"))
        val edges = docs.select(pageUrl.as("page_url"),
            explode(graft.llm.UrlOps.extractLinks(html)).as("link"))
          .select(graft.llm.UrlOps.host(col("page_url")).as("src"),
            graft.llm.UrlOps.host(col("link")).as("dst"))
          .filter(col("dst").isNotNull && col("src") =!= col("dst"))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        graft.operators.GraphOps.pageRank(edges, "src", "dst", "w", iters = 6)
          .withColumnRenamed("node", "host")
          .orderBy("host")
      },
      Some(s"""WITH d AS (SELECT doc_id, doc_id % 8 AS h FROM documents),
              |raw AS (
              |  SELECT 'h' || CAST(h AS VARCHAR) || '.example' AS u,
              |    'h' || CAST((h + 1) % 8 AS VARCHAR) || '.example' AS v FROM d
              |  UNION ALL
              |  SELECT 'h' || CAST(h AS VARCHAR) || '.example', 'h0.example' FROM d
              |  UNION ALL
              |  SELECT 'h' || CAST(h AS VARCHAR) || '.example',
              |    'h' || CAST((h + 5) % 8 AS VARCHAR) || '.example' FROM d
              |  WHERE doc_id % 3 = 0),
              |e0 AS (SELECT u, v, CAST(count(*) AS BIGINT) AS w FROM raw
              |       WHERE u <> v GROUP BY u, v),
              |outd AS (SELECT u, CAST(sum(w) AS BIGINT) AS outw FROM e0 GROUP BY u),
              |e AS (SELECT e0.u, e0.v, e0.w, outd.outw FROM e0 JOIN outd USING (u)),
              |nodes AS (SELECT u AS n FROM e0 UNION SELECT v FROM e0),
              |nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM nodes),
              |r0 AS (SELECT n, CAST(1000000 AS BIGINT) AS r FROM nodes)${OracleGen.pageRankChain(6)}
              |SELECT n AS host, r AS rank_micro FROM r6 ORDER BY host""".stripMargin)),

    // ---- Anchor-text index (the classic search-relevance signal):
    // every harvested (href, anchor text) pair resolves against its
    // page URL, defragments, and canonicalizes (urlNormalize — case,
    // default ports, tracking params), then aggregates ACROSS pages
    // per canonical target: how many anchors, from how many documents,
    // call the target by this text. Variant hrefs of one resource
    // (mixed-case host, :443, utm params) and whitespace/markup
    // variants of one text (inner tags, entity refs, space runs)
    // collapse onto single (target, text) rows — the collapse IS the
    // signal. Pure codegen'd chain + one aggregation shuffle keyed by
    // (target, text); the oracle PREDICTS the canonical rows
    // arithmetically (the q297 pattern).
    "q318_anchor_index" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val pageUrl = concat(lit("https://s"),
          (col("doc_id") % 5).cast("string"), lit(".example/d/"),
          col("doc_id").cast("string"))
        val html = concat(
          lit("<html><body><a href=\"https://T"),
          (col("doc_id") % 3).cast("string"),
          lit(".EXAMPLE:443/page?utm_source=f#sec\">Read <b>this</b></a>"),
          when(col("doc_id") % 2 === 0,
            concat(lit("<a href=\"https://t"),
              (col("doc_id") % 3).cast("string"),
              lit(".example/page\">Read   this</a>"))).otherwise(lit("")),
          lit("<a href=' /local/"), (col("doc_id") % 4).cast("string"),
          lit(" '>see &amp; go</a></body></html>"))
        val pairs = docs.select(col("doc_id"), pageUrl.as("graft_pu"),
            posexplode(graft.llm.Html.anchorTexts(html)))
          .select(col("doc_id"), col("graft_pu"),
            col("col.href").as("href"), col("col.text").as("text"))
        pairs
          .withColumn("graft_res", regexp_extract(
            graft.llm.UrlOps.resolveUrl(col("graft_pu"),
              regexp_replace(col("href"), "^[\\s]+|[\\s]+$", "")),
            "^([^#]*)", 1))
          .withColumn("target", coalesce(
            graft.llm.UrlOps.urlNormalize(col("graft_res")), col("graft_res")))
          .filter(col("text") =!= "")
          .groupBy("target", "text")
          .agg(count(lit(1)).as("n_anchors"),
            countDistinct(col("doc_id")).as("n_docs"))
          .orderBy("target", "text")
      },
      Some("""WITH d AS (SELECT doc_id, doc_id % 5 AS k5, doc_id % 4 AS k4,
             |            doc_id % 3 AS k3 FROM documents),
             |a AS (
             |  SELECT 'https://t' || CAST(k3 AS VARCHAR) || '.example/page' AS target,
             |    'Read this' AS text, doc_id FROM d
             |  UNION ALL
             |  SELECT 'https://t' || CAST(k3 AS VARCHAR) || '.example/page',
             |    'Read this', doc_id FROM d WHERE doc_id % 2 = 0
             |  UNION ALL
             |  SELECT 'https://s' || CAST(k5 AS VARCHAR) || '.example/local/'
             |    || CAST(k4 AS VARCHAR), 'see & go', doc_id FROM d)
             |SELECT target, text, CAST(count(*) AS BIGINT) AS n_anchors,
             |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
             |FROM a GROUP BY target, text
             |ORDER BY target, text""".stripMargin)),

    // ---- Priority-aware politeness cap (Robots.withHostPriority +
    // perDomainCap(priorityCol)): a host-rank sidecar (mixed-case host
    // keys fold via lower(), duplicate rows fold via max, unranked
    // hosts get NULL) attaches as the batch's `priority`, and the
    // per-registered-domain quota keeps the HIGHEST-priority URLs
    // instead of the lexicographically-first — the crawl-scheduler
    // composition the discovery loop runs when hostPriority is set.
    // The oracle replays the priority CASE and the window verbatim.
    "q319_priority_cap" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = Registry.table(s, dir, "documents")
        val urls = docs.select(col("doc_id"),
          concat(
            expr("""CASE CAST(doc_id % 3 AS INT)
                   |  WHEN 0 THEN 'http://a.' WHEN 1 THEN 'http://b.'
                   |  ELSE 'http://' END""".stripMargin),
            lit("site"), col("doc_id") % 10, lit(".example/p/"),
            col("doc_id")).as("url"))
        val sidecar = (0 until 10).flatMap { k => Seq(
          (s"B.SITE$k.EXAMPLE", 100L + k),
          (s"b.site$k.example", 1L),
          (s"site$k.example", 50L + k))
        }.toDF("host", "rank")
        val prioritized = graft.llm.Robots.withHostPriority(
          urls, "url", sidecar, "host", "rank")
        graft.llm.Robots.perDomainCap(prioritized, "url", cap = 2,
            priorityCol = Some("priority"))
          .orderBy("doc_id")
      },
      Some(s"""WITH u AS (
              |  SELECT doc_id,
              |    CASE CAST(doc_id % 3 AS INT)
              |      WHEN 0 THEN 'http://a.' WHEN 1 THEN 'http://b.'
              |      ELSE 'http://' END
              |    || 'site' || (doc_id % 10) || '.example/p/' || doc_id AS url
              |  FROM documents),
              |h AS (SELECT doc_id, url,
              |    lower(nullif(regexp_extract(url,
              |      ${graft.llm.UrlOps.sqlLit(graft.llm.UrlOps.hostRegex)}, 1), '')) AS host
              |  FROM u),
              |p AS (SELECT doc_id, url, host,
              |    CASE WHEN host LIKE 'b.%' THEN CAST(100 + (doc_id % 10) AS BIGINT)
              |         WHEN host LIKE 'a.%' THEN NULL
              |         ELSE CAST(50 + (doc_id % 10) AS BIGINT) END AS priority
              |  FROM h),
              |r AS (SELECT doc_id, url, priority, row_number() OVER (
              |    PARTITION BY ${graft.llm.UrlOps.registeredDomainSql("host")}
              |    ORDER BY priority DESC NULLS LAST, url) AS rn
              |  FROM p)
              |SELECT doc_id, url, priority FROM r WHERE rn <= 2
              |ORDER BY doc_id""".stripMargin)),

    // ---- Relative-reference resolution (UrlOps.resolveUrl): every
    // pinned arm — absolute ref, protocol-relative, root-relative,
    // query-only, fragment-only, empty, relative path, non-http scheme
    // — against bases with directories/query/fragment, no path,
    // userinfo+port, and an invalid base (NULL arms). The oracle
    // replays resolveUrlSql over the same synthesized pairs.
    "q310_url_resolve" -> QueryDef(
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val base = expr("""CASE CAST(doc_id % 4 AS INT)
                         |  WHEN 0 THEN 'https://www.ex' || (doc_id % 7)
                         |    || '.example/a/b/c.html?q=1#top'
                         |  WHEN 1 THEN 'http://site' || (doc_id % 7) || '.example'
                         |  WHEN 2 THEN 'https://u:p@h' || (doc_id % 7)
                         |    || '.example:8443/d/'
                         |  ELSE 'not a url' END""".stripMargin)
        val ref = expr("""CASE CAST(doc_id % 8 AS INT)
                        |  WHEN 0 THEN 'https://abs.example/x'
                        |  WHEN 1 THEN '//cdn.example/lib.js'
                        |  WHEN 2 THEN '/root/p' || doc_id
                        |  WHEN 3 THEN '?page=' || doc_id
                        |  WHEN 4 THEN '#sec'
                        |  WHEN 5 THEN ''
                        |  WHEN 6 THEN 'img/' || doc_id || '.png'
                        |  ELSE 'mailto:a@b.example' END""".stripMargin)
        docs.select(col("doc_id"), base.as("base"), ref.as("ref"))
          .withColumn("resolved",
            graft.llm.UrlOps.resolveUrl(col("base"), col("ref")))
          .orderBy("doc_id")
      },
      Some(s"""WITH p AS (
              |  SELECT doc_id,
              |    CASE CAST(doc_id % 4 AS INT)
              |      WHEN 0 THEN 'https://www.ex' || (doc_id % 7)
              |        || '.example/a/b/c.html?q=1#top'
              |      WHEN 1 THEN 'http://site' || (doc_id % 7) || '.example'
              |      WHEN 2 THEN 'https://u:p@h' || (doc_id % 7)
              |        || '.example:8443/d/'
              |      ELSE 'not a url' END AS base,
              |    CASE CAST(doc_id % 8 AS INT)
              |      WHEN 0 THEN 'https://abs.example/x'
              |      WHEN 1 THEN '//cdn.example/lib.js'
              |      WHEN 2 THEN '/root/p' || doc_id
              |      WHEN 3 THEN '?page=' || doc_id
              |      WHEN 4 THEN '#sec'
              |      WHEN 5 THEN ''
              |      WHEN 6 THEN 'img/' || doc_id || '.png'
              |      ELSE 'mailto:a@b.example' END AS ref
              |  FROM documents)
              |SELECT doc_id, base, ref,
              |  ${graft.llm.UrlOps.resolveUrlSql("base", "ref")} AS resolved
              |FROM p ORDER BY doc_id""".stripMargin)),

    // ---- Generic-string bridge over a NON-text carve type: one pdf per
    // slot whose body mixes printable lines, binary junk, and
    // under-minLen fragments; the carve runs end-to-end and
    // CarvedText.stringDocuments must recover exactly the >= 6-char
    // printable runs in offset order — the strings/mod.rs artefact path
    // extended so every carved type feeds the curation corpus.
    "q175_carved_strings" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val nDocs = Registry.table(s, dir, "documents").agg(count(lit(1))).as[Long].head()
        val (cfg0, _) = EngineConfig.filterFileTypes(
          EngineConfig(chunkSize = 512 * 1024, overlap = 4096),
          Some(Seq("pdf")), disableZip = false)
        val cfg = cfg0.copy(fileTypes = cfg0.fileTypes.map(_.copy(minSize = 0)))
        val payloadDir = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft-bridge-pdf-v1-$nDocs")
        val complete = payloadDir.isDirectory && {
          val counts = payloadDir.listFiles()
          counts != null && counts.iterator.flatMap(d =>
            Option(d.listFiles()).map(_.length).iterator).sum == nDocs
        }
        if (!complete) {
          val run = CarvePipeline.run(s, PdfSlotsRef(Stride, nDocs), cfg, "bridge-pdf",
            enableStrings = false, enableEntropy = false,
            payloadDir = Some(payloadDir.toString))
          run.carvedFiles.count()
          run.release()
        }
        CarvedText.stringDocuments(s, payloadDir.toString)
          .select((col("global_start") / Stride).cast("long").as("doc_id"),
            col("file_type"), col("text"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, 'pdf' AS file_type,
             |'%PDF-1.4' || chr(10) || '1 0 obj' || chr(10) ||
             |'(report ' || doc_id || ' about the stone town harbor)' ||
             |chr(10) || 'endobj' AS text
             |FROM documents ORDER BY doc_id""".stripMargin)))

  /** Per-slot pdf sample: printable lines a string scan must keep, plus
    * binary junk and an under-minLen fragment it must drop. Ends at
    * `%%EOF` (itself 5 chars — under the default minLen, so the span
    * set is stable whether or not the carver includes the footer).
    */
  private[graft] def pdfSlotSample(slot: Long): Array[Byte] =
    ascii(s"%PDF-1.4\n1 0 obj\n(report $slot about the stone town harbor)\nendobj\n") ++
      Array[Byte](1, 2, 3) ++ ascii("tiny\n%%EOF")

  private[graft] final case class PdfSlotsRef(stride: Long, slots: Long)
      extends EvidenceRef {
    override def open(): EvidenceReader = new EvidenceReader {
      override val length: Long = stride * slots
      override def readAt(offset: Long, buf: Array[Byte], bufOff: Int, len: Int): Int = {
        if (offset >= length) 0
        else {
          val n = math.min(len.toLong, length - offset).toInt
          java.util.Arrays.fill(buf, bufOff, bufOff + n, 0.toByte)
          var slot = offset / stride
          while (slot < slots && slot * stride < offset + n) {
            val sample = pdfSlotSample(slot)
            val sStart = slot * stride
            val from = math.max(offset, sStart)
            val to = math.min(offset + n, sStart + sample.length)
            if (to > from)
              System.arraycopy(sample, (from - sStart).toInt,
                buf, bufOff + (from - offset).toInt, (to - from).toInt)
            slot += 1
          }
          n
        }
      }
    }
  }
}
