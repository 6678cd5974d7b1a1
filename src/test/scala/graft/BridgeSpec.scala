package graft

import graft.carve.EngineConfig
import graft.llm.CarvedText
import graft.pipeline.CarvePipeline
import graft.queries.BridgeQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Carve→curation bridge: byte-level extractor rules, the payload-store
  * round trip, and Curate.run consuming carved documents end-to-end.
  */
class BridgeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bridge-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ascii(s: String) = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  test("emlToText: subject + body, CRLF fold, header unfolding") {
    val eml = ascii(
      "From: a@example.com\r\nSubject: long\r\n subject line\r\nTo: b@example.com\r\n\r\n" +
        "first line\r\nsecond line\r\n")
    assert(CarvedText.emlToText(eml) == "long subject line\nfirst line\nsecond line")
    // no blank line → all headers, empty body; no subject → empty title
    assert(CarvedText.emlToText(ascii("From: a@b.c\r\nTo: d@e.f\r\n")) == "")
  }

  test("rtfToText: control words, escapes, destinations, bin skip") {
    assert(CarvedText.rtfToText(ascii("{\\rtf1\\ansi Hello {\\b world}}")) == "Hello world")
    // \par → newline, \tab → tab, \'e9 → é, escaped braces literal
    assert(CarvedText.rtfToText(ascii("{\\rtf1 a\\par b\\tab c\\'e9\\{x\\}}")) ==
      "a\nb\tcé{x}")
    // {\*\foo junk} and {\fonttbl...} destinations drop entirely
    assert(CarvedText.rtfToText(ascii(
      "{\\rtf1{\\*\\gen junk}{\\fonttbl{\\f0 Arial}}keep}")) == "keep")
    // \binN raw bytes skipped, the byte after the digits counting as raw
    // (the reference walker's quirk): \bin3 then " xyz" skips " xy"
    assert(CarvedText.rtfToText(ascii("{\\rtf1 a\\bin3 xyz}")) == "az")
    // raw CR/LF are not text; trailing whitespace trimmed
    assert(CarvedText.rtfToText(ascii("{\\rtf1 a\r\nb \\par }")) == "ab")
    // \uN unicode escapes: code unit emitted, '?' fallback suppressed
    assert(CarvedText.rtfToText(ascii(
      "{\\rtf1 \\u1055?\\u1088?\\u1080?\\u1074?\\u1077?\\u1090?}")) == "Привет")
    // \uc0 disables the fallback skip entirely
    assert(CarvedText.rtfToText(ascii("{\\rtf1\\uc0 \\u224 b}")) == "àb")
    // a corrupt 20-digit \bin parameter saturates instead of wrapping
    // negative (which would walk the raw payload as text)
    assert(CarvedText.rtfToText(ascii("{\\rtf1 a\\bin99999999999999999999 xyz}")) == "a")
  }

  test("fb2ToText: tags drop, entities decode, binary payloads skip") {
    assert(CarvedText.fb2ToText(ascii(
      "<?xml version=\"1.0\"?><FictionBook><body><p>one two</p>" +
        "<p>a &amp; b &lt;c&gt; &#65;&#x42;</p><empty-line/>" +
        "<binary id=\"cover\">QUJD</binary><p>tail</p></body></FictionBook>")) ==
      "one two\na & b <c> AB\n\ntail")
    // whitespace runs collapse, newlines from markup only
    assert(CarvedText.fb2ToText(ascii(
      "<FictionBook><body><p>x\n   y</p></body></FictionBook>")) == "x y")
    // comments with '>' inside don't leak text
    assert(CarvedText.fb2ToText(ascii(
      "<FictionBook><body><!-- a > b --><p>kept</p></body></FictionBook>")) == "kept")
    // '>' inside a quoted attribute value doesn't end the tag
    assert(CarvedText.fb2ToText(ascii(
      "<FictionBook><body><p note=\"x>y\">text</p></body></FictionBook>")) == "text")
    // a self-closing <binary/> doesn't latch skipping on
    assert(CarvedText.fb2ToText(ascii(
      "<FictionBook><body><binary id=\"c\"/><p>after</p></body></FictionBook>")) == "after")
    // astral refs emit surrogate pairs; surrogate refs stay literal text
    assert(CarvedText.fb2ToText(ascii(
      "<FictionBook><body><p>a&#x1F600;b</p></body></FictionBook>")) == "a😀b")
    assert(CarvedText.fb2ToText(ascii(
      "<FictionBook><body><p>a&#xD800;b</p></body></FictionBook>")) == "a&#xD800;b")
  }

  test("carved payload store round-trips into a documents frame") {
    val nSlots = 9L
    val (cfg0, _) = EngineConfig.filterFileTypes(
      EngineConfig(chunkSize = 64 * 1024, overlap = 4096),
      Some(Seq("eml", "rtf", "fb2")), disableZip = false)
    val cfg = cfg0.copy(fileTypes = cfg0.fileTypes.map(_.copy(minSize = 0)))
    val payloadDir = Files.createTempDirectory("graft-bridge-rt").toString
    val run = CarvePipeline.run(spark, BridgeQueries.DocSlotsRef(4096L, nSlots), cfg,
      "bridge-spec", enableStrings = false, enableEntropy = false,
      payloadDir = Some(payloadDir))
    run.carvedFiles.count()
    run.release()
    val docs = CarvedText.documents(spark, payloadDir)
      .select((col("global_start") / 4096L).cast("long").as("doc_id"),
        col("file_type"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(docs.length == nSlots)
    docs.foreach { case (id, tpe, text) =>
      (id % 3) match {
        case 0 =>
          assert(tpe == "eml")
          assert(text == s"note $id\n${BridgeQueries.EmlBody.format(id)}")
        case 1 =>
          assert(tpe == "rtf")
          assert(text == s"doc $id bold text")
        case _ =>
          assert(tpe == "fb2")
          assert(text == s"story $id goes here tonight")
      }
    }
  }

  test("Curate.run consumes a carved-payload documents frame end-to-end") {
    val nSlots = 42L
    val (cfg0, _) = EngineConfig.filterFileTypes(
      EngineConfig(chunkSize = 64 * 1024, overlap = 4096),
      Some(Seq("eml", "rtf", "fb2")), disableZip = false)
    val cfg = cfg0.copy(fileTypes = cfg0.fileTypes.map(_.copy(minSize = 0)))
    val payloadDir = Files.createTempDirectory("graft-bridge-curate").toString
    val run = CarvePipeline.run(spark, BridgeQueries.DocSlotsRef(4096L, nSlots), cfg,
      "bridge-curate", enableStrings = false, enableEntropy = false,
      payloadDir = Some(payloadDir))
    run.carvedFiles.count()
    run.release()
    val docsParquet = Files.createTempDirectory("graft-bridge-docs").toString + "/documents"
    // the realistic hand-off: language-ID the carved corpus to supply
    // the lang column Curate's document schema carries
    val bridged = CarvedText.documents(spark, payloadDir)
      .select((col("global_start") / 4096L).cast("long").as("doc_id"), col("text"))
    bridged
      .join(graft.llm.TextAnalysis.langId(bridged, "doc_id", "text")
        .select(col("id").as("doc_id"), col("lang_pred").as("lang")), Seq("doc_id"))
      .write.parquet(docsParquet)
    val outDir = Files.createTempDirectory("graft-bridge-out").toString
    val summary = Curate.run(spark, docsParquet, None, outDir, "graft").toMap
    assert(summary("n_raw") == nSlots)
    assert(summary("n_clean") > 0)
    val corpus = spark.read.parquet(s"$outDir/corpus")
    assert(corpus.count() == summary("n_clean"))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("stringDocuments recovers printable runs from non-text payloads; union covers the store") {
    val nSlots = 12L
    val (cfg0, _) = EngineConfig.filterFileTypes(
      EngineConfig(chunkSize = 64 * 1024, overlap = 4096),
      Some(Seq("pdf")), disableZip = false)
    val cfg = cfg0.copy(fileTypes = cfg0.fileTypes.map(_.copy(minSize = 0)))
    val payloadDir = Files.createTempDirectory("graft-bridge-str").toString
    val run = CarvePipeline.run(spark, BridgeQueries.PdfSlotsRef(4096L, nSlots), cfg,
      "bridge-str", enableStrings = false, enableEntropy = false,
      payloadDir = Some(payloadDir))
    run.carvedFiles.count()
    run.release()
    val got = CarvedText.stringDocuments(spark, payloadDir)
      .select((col("global_start") / 4096L).cast("long").as("doc_id"),
        col("file_type"), col("text"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.length == nSlots)
    got.foreach { case (id, ft, text) =>
      assert(ft == "pdf")
      // binary junk, the under-minLen 'tiny' fragment, and the 5-char
      // %%EOF are all dropped; the four >= 6-char runs survive in order
      assert(text ==
        s"%PDF-1.4\n1 0 obj\n(report $id about the stone town harbor)\nendobj")
    }
    // the union frame covers string docs and excludes nothing else here
    // (the store has only pdfs, none of the structured walker types)
    val all = CarvedText.documentsWithStrings(spark, payloadDir)
    assert(all.count() == nSlots)
  }

  test("contentTag rolls the fixture-cache key on tail-only content changes") {
    import spark.implicits._
    import graft.queries.Registry
    val base = (1L to 40L).map(i => (i, s"text $i"))
    val a = base.toDF("doc_id", "text")
    // same count, same first-10-by-key head, different TAIL content —
    // head-only fingerprints collide here; the whole-table digest must not
    val b = base.map { case (i, t) => (i, if (i == 40L) "changed" else t) }
      .toDF("doc_id", "text")
    assert(Registry.contentTag(a, "doc_id", "text") !=
      Registry.contentTag(b, "doc_id", "text"))
    // row order must not matter (xor digest is commutative)
    assert(Registry.contentTag(a.orderBy(col("doc_id").desc).repartition(3),
      "doc_id", "text") === Registry.contentTag(a, "doc_id", "text"))
  }
}
