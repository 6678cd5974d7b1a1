package graft

import java.nio.charset.StandardCharsets

import graft.sources.WarcCorpus
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The WARC crawl-archive reader: anchor-scan parsing, overlap
  * ownership across chunk boundaries, quarantine semantics for every
  * documented corruption class, and the resync property a sequential
  * reader cannot offer.
  */
class WarcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-warc-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def record(id: Long, payload: String, clen: Option[String] = None,
                     warcType: String = "conversion"): Array[Byte] =
    graft.fixtures.FixtureBytes.warcRecord(s"http://host$id/doc/$id",
      payload.getBytes(StandardCharsets.UTF_8), contentLength = clen,
      warcType = warcType, recordId = Some(s"<urn:test:$id>"))

  private def writeTemp(bytes: Array[Byte]): java.io.File = {
    val f = java.io.File.createTempFile("graft-warc-spec", ".warc")
    f.deleteOnExit()
    val out = new java.io.FileOutputStream(f)
    try out.write(bytes) finally out.close()
    f
  }

  private def decodeRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("record_offset")
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)).orNull, Option(r.getString(2)).orNull,
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) null
        else new String(r.getAs[Array[Byte]](5), StandardCharsets.UTF_8),
        Option(r.getString(6)).orNull))

  private def rows(f: java.io.File, chunkSize: Long = 64,
                   maxPayloadBytes: Int = 4 * 1024 * 1024) =
    decodeRows(WarcCorpus.read(spark, f.toString, chunkSize = chunkSize,
      maxPayloadBytes = maxPayloadBytes))

  private def gzRows(f: java.io.File, chunkSize: Long = 64,
                     maxPayloadBytes: Int = 4 * 1024 * 1024) =
    decodeRows(WarcCorpus.readGz(spark, f.toString, chunkSize = chunkSize,
      maxPayloadBytes = maxPayloadBytes))

  test("round-trips records exactly, across chunk boundaries, parsed once each") {
    val payloads = (0L until 8L).map(i => s"payload $i " + ("x" * i.toInt * 7))
    val bytes = payloads.zipWithIndex
      .flatMap { case (p, i) => record(i.toLong, p) }.toArray
    // 64-byte chunks: every record straddles several chunks — the
    // ownership predicate and cross-chunk header/payload reads do the
    // work; each record must appear EXACTLY once
    val got = rows(writeTemp(bytes), chunkSize = 64)
    assert(got.length === 8)
    assert(got.forall(_._6 == null), s"unexpected errors: ${got.toSeq}")
    assert(got.map(_._5).toSeq === payloads)
    assert(got.map(_._3).toSeq === (0L until 8L).map(i => s"http://host$i/doc/$i"))
    // offsets are the real anchor positions, strictly increasing
    assert(got.map(_._1).toSeq === got.map(_._1).sorted.toSeq)
    // UTF-8 payloads byte-measured, char-decoded
    val utf = "héllo wörld ✓"
    val g2 = rows(writeTemp(record(0L, utf)), chunkSize = 32)
    assert(g2.head._5 === utf)
    assert(g2.head._4 === utf.getBytes(StandardCharsets.UTF_8).length.toLong)
  }

  test("corrupt Content-Length quarantines the record and RESYNCS at the next") {
    val bytes = record(0L, "good zero") ++
      record(1L, "broken one", clen = Some("XX")) ++
      record(2L, "good two")
    val got = rows(writeTemp(bytes))
    assert(got.length === 3)
    assert(got(0)._6 == null && got(0)._5 == "good zero")
    assert(got(1)._6 != null && got(1)._6.contains("Content-Length") &&
      got(1)._5 == null && got(1)._3 == "http://host1/doc/1")
    // the record AFTER the unusable length still parses — anchor scan,
    // not length chaining
    assert(got(2)._6 == null && got(2)._5 == "good two")
    assert(WarcCorpus.quarantine(WarcCorpus.read(spark, writeTemp(bytes).toString,
      chunkSize = 64)).count() === 1L)
  }

  test("truncated payload, unterminated header, and oversized payload quarantine") {
    // payload claims 100 bytes but the file ends first
    val t1 = record(0L, "short", clen = Some("100"))
    val g1 = rows(writeTemp(t1))
    assert(g1.length === 1 && g1.head._6 != null && g1.head._6.contains("truncated"))
    // header block never terminates (no CRLFCRLF before EOF)
    val t2 = "WARC/1.0\r\nWARC-Type: conversion\r\n".getBytes(StandardCharsets.ISO_8859_1)
    val g2 = rows(writeTemp(t2))
    assert(g2.length === 1 && g2.head._6 != null && g2.head._6.contains("unterminated"))
    // a record over the payload cap quarantines instead of buffering it
    val t3 = record(0L, "z" * 2048) ++ record(1L, "fits")
    val g3 = rows(writeTemp(t3), maxPayloadBytes = 1024)
    assert(g3.length === 2)
    assert(g3(0)._6 != null && g3(0)._6.contains("cap") && g3(0)._4 === 2048L)
    assert(g3(1)._6 == null && g3(1)._5 == "fits")
    // negative length is a parse error, not an allocation
    val t4 = record(0L, "neg", clen = Some("-5"))
    val g4 = rows(writeTemp(t4))
    assert(g4.length === 1 && g4.head._6 != null && g4.head._6.contains("negative"))
  }

  test("payload-embedded anchors surface as extra parse attempts (documented)") {
    // a WARC archived inside a WARC: the embedded anchor yields a
    // second (spurious or nested, depending on framing) row — the
    // price of the resync property; callers with nested corpora dedup
    // by offset containment
    val inner = new String(record(7L, "nested"), StandardCharsets.ISO_8859_1)
    val bytes = record(0L, inner)
    val got = rows(writeTemp(bytes))
    assert(got.length === 2)
    assert(got(0)._6 == null && got(0)._5 == inner)
    // the embedded record parses as its own (well-formed) record too
    assert(got(1)._6 == null && got(1)._5 == "nested")
  }

  test("payload bytes containing CRLFCRLF or header-like text do not confuse framing") {
    val tricky = "looks\r\n\r\nlike a header\r\nContent-Length: 9\r\n\r\nbody"
    val bytes = record(0L, tricky) ++ record(1L, "after")
    val got = rows(writeTemp(bytes), chunkSize = 48)
    assert(got.length === 2)
    assert(got(0)._5 === tricky)
    assert(got(1)._5 === "after")
  }

  test("WARC/1.1 parses; other 1.x minors quarantine with an explicit error") {
    def vrec(id: Long, payload: String, version: String) =
      graft.fixtures.FixtureBytes.warcRecord(s"http://host$id/doc/$id",
        payload.getBytes(StandardCharsets.UTF_8), version = version)
    val bytes = vrec(0L, "one point one", "1.1") ++
      vrec(1L, "one point two", "1.2") ++
      vrec(2L, "one point zero", "1.0")
    val got = rows(writeTemp(bytes))
    assert(got.length === 3)
    assert(got(0)._6 == null && got(0)._5 == "one point one")
    assert(got(1)._6 != null && got(1)._6.contains("unsupported WARC version") &&
      got(1)._5 == null)
    // resync works across the unsupported record too
    assert(got(2)._6 == null && got(2)._5 == "one point zero")
  }

  test("a 4-9 digit minor version quarantines mid-file instead of vanishing") {
    def vrec(id: Long, payload: String, version: String) =
      graft.fixtures.FixtureBytes.warcRecord(s"http://host$id/doc/$id",
        payload.getBytes(StandardCharsets.UTF_8), version = version)
    // WARC/1.0000 is a well-shaped-but-unsupported version line: it
    // must anchor at scan and quarantine at parse (the documented
    // contract), not slip past the digit bound invisibly
    val bytes = vrec(0L, "first", "1.0") ++
      vrec(1L, "four digit minor", "1.0000") ++
      vrec(2L, "last", "1.0")
    val got = rows(writeTemp(bytes))
    assert(got.length === 3)
    assert(got(0)._6 == null && got(0)._5 == "first")
    assert(got(1)._6 != null && got(1)._6.contains("unsupported WARC version"))
    assert(got(2)._6 == null && got(2)._5 == "last")
    // the one documented exception: a minor wider than NINE digits is
    // not a credible version line and stays invisible (bounded overlap)
    val bytes2 = vrec(0L, "first", "1.0") ++
      vrec(1L, "ten digit minor", "1.0123456789") ++
      vrec(2L, "last", "1.0")
    assert(rows(writeTemp(bytes2)).length === 2)
  }

  test("hostile CRLF in exported URI/id percent-encodes; framing survives round-trip") {
    import spark.implicits._
    // a crawl-harvested href can capture across newlines — unencoded,
    // this value injects a forged WARC-Target-URI line and an early
    // header terminator into the export
    val evil = "http://evil.example/a\r\nWARC-Target-URI: http://trusted.example/\r\n"
    val df = Seq((evil, "body bytes", "<urn:x:\r\n1>")).toDF("uri", "text", "rid")
    val out = java.nio.file.Files.createTempDirectory("graft-wexp-crlf").toString
    assert(WarcCorpus.write(df, out, "uri", "text", idCol = Some("rid")) === 1L)
    val parsed = WarcCorpus.readGzMany(spark, new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).map(_.toString).toSeq).collect()
    assert(parsed.length === 1, "forged framing must not split the record")
    assert(parsed.head.getAs[String]("error") == null)
    val uri = parsed.head.getAs[String]("target_uri")
    assert(uri === "http://evil.example/a%0D%0A" +
      "WARC-Target-URI: http://trusted.example/%0D%0A")
    val rid = parsed.head.getAs[String]("record_id")
    assert(rid.contains("%0D%0A") && !rid.contains("\r") && !rid.contains("\n"))
    assert(new String(parsed.head.getAs[Array[Byte]]("payload"),
      StandardCharsets.UTF_8) === "body bytes")
  }

  test("a non-WARC archive quarantines at offset 0 instead of parsing as zero records") {
    val junk = writeTemp(("not a warc archive at all " * 8).getBytes("UTF-8"))
    val g1 = rows(junk)
    assert(g1.length === 1 && g1.head._1 === 0L &&
      g1.head._6 != null && g1.head._6.contains("does not begin with a WARC/1.x"))
    // legacy WARC/0.18 is an unsupported-version shape, not silence
    val legacy = writeTemp(("WARC/0.18\r\nWARC-Type: response\r\n\r\n" +
      "body").getBytes("UTF-8"))
    val g2 = rows(legacy)
    assert(g2.length === 1 && g2.head._6.contains("does not begin with a WARC/1.x"))
    // a .warc.gz handed to the plain reader names the right front door
    val gz = writeTemp(graft.fixtures.FixtureBytes.gzMember(record(0L, "zipped")))
    val g3 = rows(gz)
    assert(g3.length === 1 && g3.head._6.contains("use readGz"))
    // and a plain archive handed to readGz does the same in reverse
    val g4 = gzRows(writeTemp(record(0L, "plain")))
    assert(g4.length === 1 && g4.head._6.contains("use read"))
  }

  test("per-record-gzip archive round-trips, across chunk boundaries") {
    val payloads = (0L until 8L).map(i => s"payload $i " + ("y" * i.toInt * 11))
    val members = payloads.zipWithIndex.map { case (p, i) =>
      graft.fixtures.FixtureBytes.gzMember(record(i.toLong, p)) }
    val offsets = members.scanLeft(0L)(_ + _.length).dropRight(1)
    // 96-byte chunks: members straddle boundaries — the ownership
    // predicate and the cross-chunk member inflate do the work
    val got = gzRows(writeTemp(members.flatten.toArray), chunkSize = 96)
    assert(got.length === 8)
    assert(got.forall(_._6 == null), s"unexpected errors: ${got.toSeq}")
    assert(got.map(_._5).toSeq === payloads)
    // record_offset is the member's COMPRESSED start — the refetchable
    // address in the archive
    assert(got.map(_._1).toSeq === offsets)
    // UTF-8 payloads byte-measured, char-decoded, through the inflate
    val utf = "héllo wörld ✓"
    val g2 = gzRows(writeTemp(
      graft.fixtures.FixtureBytes.gzMember(record(0L, utf))), chunkSize = 64)
    assert(g2.head._5 === utf)
    assert(g2.head._4 === utf.getBytes(StandardCharsets.UTF_8).length.toLong)
  }

  test("corrupt gzip member quarantines; the NEXT member still parses") {
    val members = Seq(
      graft.fixtures.FixtureBytes.gzMember(record(0L, "good zero")),
      graft.fixtures.FixtureBytes.gzMember(record(1L, "broken one"), corrupt = true),
      graft.fixtures.FixtureBytes.gzMember(record(2L, "good two")))
    val got = gzRows(writeTemp(members.flatten.toArray))
    assert(got.length === 3, s"got: ${got.toSeq}")
    assert(got(0)._6 == null && got(0)._5 == "good zero")
    assert(got(1)._6 != null && got(1)._5 == null,
      s"corrupt member should quarantine: ${got(1)}")
    // members are found by magic scan, not length chaining — the
    // archive resyncs unaided
    assert(got(2)._6 == null && got(2)._5 == "good two")
    // a record-level corruption INSIDE a valid member also quarantines
    val m2 = Seq(
      graft.fixtures.FixtureBytes.gzMember(record(0L, "fine")),
      graft.fixtures.FixtureBytes.gzMember(record(1L, "bad len", clen = Some("XX"))))
    val g2 = gzRows(writeTemp(m2.flatten.toArray))
    assert(g2.length === 2)
    assert(g2(0)._6 == null && g2(1)._6 != null &&
      g2(1)._6.contains("Content-Length"))
  }

  test("false-positive gzip magic inside member bytes is skipped silently") {
    // plant the magic inside a payload: after compression it may or may
    // not survive literally, so plant it in a STORED-looking spot — use
    // an incompressible payload so deflate emits stored blocks carrying
    // the literal magic bytes
    val rnd = new scala.util.Random(7)
    val noise = Array.fill[Byte](600)((rnd.nextInt(256) - 128).toByte)
    noise(300) = 0x1f.toByte; noise(301) = 0x8b.toByte
    noise(302) = 0x08.toByte; noise(303) = 0x00.toByte
    val member = graft.fixtures.FixtureBytes.gzMember(
      graft.fixtures.FixtureBytes.warcRecord("http://h/doc/0", noise))
    // the literal magic really is in the compressed stream (stored
    // block) — otherwise this test exercises nothing
    assert(member.toSeq.containsSlice(
      Seq(0x1f, 0x8b, 0x08, 0x00).map(_.toByte)),
      "fixture: magic not literal in compressed bytes; adjust noise")
    val got = WarcCorpus.readGz(spark, writeTemp(member).toString, chunkSize = 256)
      .collect()
    assert(got.length === 1, s"false positive produced rows: ${got.toSeq}")
    assert(got.head.isNullAt(6))
    assert(got.head.getAs[Array[Byte]](5).toSeq === noise.toSeq)
  }

  test("a multi-record gzip member parses EVERY record (spec-legal, non-CC layout)") {
    // ISO 28500 allows several records per member; parsing only the
    // first would silently lose the rest. Both rows report the
    // member's compressed offset — the re-fetchable address.
    val member = graft.fixtures.FixtureBytes.gzMember(
      record(0L, "first record body") ++ record(1L, "second record body"))
    val single = graft.fixtures.FixtureBytes.gzMember(record(2L, "third"))
    val got = gzRows(writeTemp(member ++ single))
    assert(got.length === 3, s"got ${got.toSeq}")
    // the two inner records share the member offset, so their sort
    // order under orderBy(record_offset) is tie-unstable — compare
    // order-insensitively
    assert(got.map(_._5).sorted.toSeq ===
      Seq("first record body", "second record body", "third"))
    assert(got.groupBy(_._1).values.map(_.size).toSeq.sorted === Seq(1, 2),
      "inner records must share the member offset")
    assert(got.forall(_._6 == null))
  }

  test("every corrupt member quarantines — none silently skips (one-call inflate loss)") {
    // Inflater.inflate discards the output of the CALL that throws, so
    // a small member processed in one call can fail with zero
    // surviving bytes — no record evidence, silent skip (observed at
    // sf0.1 before the 64-byte-slice retry: 6/295 corrupt members
    // vanished). 40 differently-sized corrupt members must ALL surface.
    val members = (0 until 40).map(i => graft.fixtures.FixtureBytes.gzMember(
      record(i.toLong, s"text $i " + ("lorem ipsum " * (i % 7))),
      corrupt = true))
    val got = WarcCorpus.readGz(spark, writeTemp(members.flatten.toArray).toString,
      chunkSize = 1024).collect()
    assert(got.length === 40, s"expected 40 rows, got ${got.length}")
    assert(got.forall(!_.isNullAt(6)),
      s"every planted corruption must quarantine; clean rows: " +
        got.filter(_.isNullAt(6)).map(_.getLong(0)).mkString(","))
  }

  test("a truncated first gzip member surfaces instead of parsing as zero records") {
    // 5 junk bytes that happen to start with the member magic: too
    // short to even parse a gzip header — must quarantine, not vanish
    val junk = Array[Byte](0x1f.toByte, 0x8b.toByte, 0x08, 0x00, 0x42)
    val got = WarcCorpus.readGz(spark, writeTemp(junk).toString).collect()
    assert(got.length === 1)
    assert(got.head.getString(6).contains("offset 0"))
    // a member whose FIRST deflate bytes are damaged (header fine,
    // stream dead before any output) also surfaces when it is the
    // archive's first member
    val m = graft.fixtures.FixtureBytes.gzMember(record(0L, "body"))
    java.util.Arrays.fill(m, 10, math.min(m.length - 8, 14), 0x07.toByte)
    val g2 = WarcCorpus.readGz(spark, writeTemp(m).toString).collect()
    assert(g2.length >= 1 && g2.forall(!_.isNullAt(6)),
      s"damaged first member must quarantine, got ${g2.toSeq}")
  }

  test("binary payload bytes round-trip exactly (no UTF-8 mangling)") {
    // every byte value 0..255 — a response record carrying an image
    val bin = Array.tabulate[Byte](256)(_.toByte)
    val rec = graft.fixtures.FixtureBytes.warcRecord(
      "http://h/img/0", bin, warcType = "response")
    val plain = WarcCorpus.read(spark, writeTemp(rec).toString).collect()
    assert(plain.length === 1)
    assert(plain.head.getAs[Array[Byte]]("payload").toSeq === bin.toSeq)
    val gz = WarcCorpus.readGz(spark, writeTemp(
      graft.fixtures.FixtureBytes.gzMember(rec)).toString).collect()
    assert(gz.length === 1)
    assert(gz.head.getAs[Array[Byte]]("payload").toSeq === bin.toSeq)
  }

  test("write exports .warc.gz and .warc drops that round-trip through the readers") {
    import spark.implicits._
    val docs = (0L until 20L).map(i =>
      (i, s"http://h/doc/$i", s"text body $i " + ("w" * (i % 7).toInt)))
      .toDF("id", "uri", "text")
    val expect = docs.collect()
      .map(r => (r.getString(1), r.getString(2), s"<${r.getLong(0)}>")).sortBy(_._1).toSeq
    def readBack(dir: String, ext: String) = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(ext)).map(_.toString).toSeq.sorted
      assert(files.nonEmpty && files.size <= 3,
        s"one archive per non-empty partition, got $files")
      val parsed = WarcCorpus.text(
        if (ext == ".warc.gz") WarcCorpus.readGzMany(spark, files)
        else WarcCorpus.readMany(spark, files))
      assert(parsed.filter("error IS NOT NULL").count() === 0L)
      assert(parsed.select("warc_type").distinct().collect()
        .map(_.getString(0)).toSeq === Seq("conversion"))
      parsed.select("target_uri", "payload_text", "record_id").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    }
    // gz form (the Common Crawl layout)
    val outGz = java.nio.file.Files.createTempDirectory("graft-wexp-gz").toString
    assert(WarcCorpus.write(docs.repartition(3), outGz, "uri", "text",
      idCol = Some("id")) === 20L)
    assert(readBack(outGz, ".warc.gz") === expect)
    // plain form
    val outPl = java.nio.file.Files.createTempDirectory("graft-wexp-pl").toString
    assert(WarcCorpus.write(docs.repartition(3), outPl, "uri", "text",
      idCol = Some("id"), gz = false) === 20L)
    assert(readBack(outPl, ".warc") === expect)
    // binary payloads export byte-exact (every byte value)
    val bin = Array.tabulate[Byte](256)(_.toByte)
    val bdf = Seq(("http://h/bin/0", bin)).toDF("uri", "payload")
    val outB = java.nio.file.Files.createTempDirectory("graft-wexp-bin").toString
    assert(WarcCorpus.write(bdf, outB, "uri", "payload",
      warcType = "resource") === 1L)
    val b = WarcCorpus.readGzMany(spark, new java.io.File(outB).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).map(_.toString).toSeq).collect()
    assert(b.length === 1 && b.head.getAs[String]("warc_type") === "resource")
    assert(b.head.getAs[Array[Byte]]("payload").toSeq === bin.toSeq)
  }

  test("readAuto routes a mixed drop by magic, one relation") {
    val plain = writeTemp(record(0L, "plain record") ++ record(1L, "second"))
    val gz = writeTemp(graft.fixtures.FixtureBytes.gzMember(record(2L, "zipped")) ++
      graft.fixtures.FixtureBytes.gzMember(record(3L, "zipped too")))
    val got = WarcCorpus.readAuto(spark, Seq(plain.toString, gz.toString))
    assert(got.filter("error IS NULL").count() === 4L)
    assert(got.filter("error IS NOT NULL").count() === 0L)
    val byArchive = got.groupBy("archive").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byArchive === Map(plain.toString -> 2L, gz.toString -> 2L))
  }
}
