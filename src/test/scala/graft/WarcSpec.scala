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

  private def rows(f: java.io.File, chunkSize: Long = 64,
                   maxPayloadBytes: Int = 4 * 1024 * 1024) =
    WarcCorpus.read(spark, f.toString, chunkSize = chunkSize,
        maxPayloadBytes = maxPayloadBytes)
      .orderBy("record_offset")
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)).orNull, Option(r.getString(2)).orNull,
        if (r.isNullAt(4)) -1L else r.getLong(4),
        Option(r.getString(5)).orNull, Option(r.getString(6)).orNull))

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
}
