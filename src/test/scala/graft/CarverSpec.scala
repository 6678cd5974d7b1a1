package graft

import graft.carve._
import graft.fixtures.FixtureBytes
import graft.evidence.InMemoryEvidence
import org.scalatest.funsuite.AnyFunSuite

/** Per-carver validation against synthesized minimal samples: exact size,
  * hashes, validated/truncated flags, min-size drops, and boundary cases
  * (mirrors the reference's per-carver unit tests).
  */
class CarverSpec extends AnyFunSuite {
  import FixtureBytes._

  private def carve(handler: CarveHandler, sample: Array[Byte], patternId: String = "p") = {
    val (evidence, off) = planted(sample)
    val ctx = ExtractionContext("t", new InMemoryEvidence(evidence))
    handler.processHit(CarveHit(off, handler.fileType, patternId), ctx)
  }

  private def assertExact(handler: CarveHandler, sample: Array[Byte], patternId: String = "p"): Unit = {
    val result = carve(handler, sample, patternId)
    assert(result.isDefined, s"${handler.fileType}: no carve")
    val c = result.get
    assert(c.size == sample.length, s"${handler.fileType}: size ${c.size} != ${sample.length}")
    assert(c.sha256 == sha256Hex(sample), s"${handler.fileType}: sha mismatch")
    assert(c.md5 == md5Hex(sample))
    assert(c.validated, s"${handler.fileType}: not validated")
    assert(!c.truncated)
    assert(c.globalEnd == c.globalStart + c.size - 1)
  }

  test("jpeg carves to EOI") { assertExact(new JpegCarver(0, 0), jpeg()) }
  test("jpeg honors min_size") {
    assert(carve(new JpegCarver(0, 500), jpeg()).isEmpty)
  }
  test("jpeg eof truncation") {
    val sample = jpeg().dropRight(2) // no EOI
    val ctx = ExtractionContext("t", new InMemoryEvidence(sample))
    val c = new JpegCarver(0, 0).processHit(CarveHit(0, "jpeg", "p"), ctx).get
    assert(c.truncated && !c.validated && c.errors.exists(_.contains("eof")))
  }
  test("jpeg max_size stops scan") {
    val sample = jpeg()
    val c = carve(new JpegCarver(8, 0), sample).get
    assert(c.truncated && c.size == 8 && c.errors.exists(_.contains("max_size")))
  }

  test("png walks chunks to IEND") { assertExact(new PngCarver(0, 0), png()) }
  test("png rejects bad signature") {
    val bad = png(); bad(1) = 'X'.toByte
    assert(carve(new PngCarver(0, 0), bad).isEmpty)
  }

  test("gif walks blocks to trailer") { assertExact(new GifCarver(0, 0), gif()) }
  test("sqlite exact size from header") { assertExact(new SqliteCarver(0, 0), sqlite()) }
  test("sqlite rejects bad page size") {
    val bad = sqlite()
    bad(16) = 1; bad(17) = 23 // page size 0x0117 — not a power of two
    assert(carve(new SqliteCarver(0, 0), bad).isEmpty)
  }
  test("pdf carves to %%EOF") { assertExact(new PdfCarver(0, 0), pdf()) }
  test("pdf includes trailing newline") {
    val sample = pdf() ++ "\r\n".getBytes
    val (ev, off) = planted(sample)
    val ctx = ExtractionContext("t", new InMemoryEvidence(ev))
    val c = new PdfCarver(0, 0).processHit(CarveHit(off, "pdf", "p"), ctx).get
    assert(c.size == sample.length)
  }
  test("webp declared size") { assertExact(new WebpCarver(0, 0), webp()) }
  test("avi declared size") { assertExact(new AviCarver(0, 0), avi()) }
  test("tiff ifd max extent") { assertExact(new TiffCarver(0, 0), tiff()) }
  test("tiff rejects bad signature") {
    val bad = tiff(); bad(2) = 0x2b
    assert(carve(new TiffCarver(0, 0), bad).isEmpty)
  }
  test("wav declared size") { assertExact(new WavCarver(0, 0), wav()) }
  test("bmp declared size + plausibility") { assertExact(new BmpCarver(0, 0), bmp()) }
  test("bmp rejects bad dib") {
    val bad = bmp(); bad(14) = 39 // invalid DIB size
    assert(carve(new BmpCarver(0, 0), bad).isEmpty)
  }
  test("7z start header size") { assertExact(new SevenZCarver(0, 0), sevenZ()) }
  test("gzip carve to EOF is validated") {
    val sample = gzip()
    val (ev, off) = planted(sample, after = 0)
    val ctx = ExtractionContext("t", new InMemoryEvidence(ev))
    val c = new GzipCarver(0, 0).processHit(CarveHit(off, "gzip", "p"), ctx).get
    assert(c.validated && c.size == sample.length)
  }
  test("gzip stops at next gzip magic") {
    val a = gzip(20)
    val b = gzip(10)
    val (ev, off) = planted(a ++ b, after = 0)
    val ctx = ExtractionContext("t", new InMemoryEvidence(ev))
    val c = new GzipCarver(0, 0).processHit(CarveHit(off, "gzip", "p"), ctx).get
    assert(c.size == a.length)
  }
  test("bzip2 end marker") { assertExact(new Bzip2Carver(0, 0), bzip2()) }
  test("xz footer crc") { assertExact(new XzCarver(0, 0), xz()) }
  test("rtf brace depth") { assertExact(new RtfCarver(0, 0), rtf()) }
  test("rtf bin skipping") {
    val sample = "{\\rtf1 \\bin5 }}}}}x more}".getBytes("ISO-8859-1")
    // \bin5 consumes ' }}}}' (the delimiter byte counts as the first raw
    // byte — reference quirk), so the next '}' closes the document at 18.
    val (ev, off) = planted(sample)
    val ctx = ExtractionContext("t", new InMemoryEvidence(ev))
    val c = new RtfCarver(0, 0).processHit(CarveHit(off, "rtf", "p"), ctx).get
    assert(c.validated && c.size == 18)
  }
  test("eml mbox boundary") {
    val sample = eml()
    val next = "\nFrom second@example.com\n".getBytes("ISO-8859-1")
    val (ev, off) = planted(sample ++ next, after = 0)
    val ctx = ExtractionContext("t", new InMemoryEvidence(ev))
    val c = new EmlCarver(0, 0).processHit(CarveHit(off, "eml", "p"), ctx).get
    // boundary "\nFrom " is the appended message's leading newline
    assert(c.size == sample.length)
    assert(c.validated)
  }
  test("eml rejects template strings") {
    val bad = "From: %s@example.com\nTo: x@y.zz\nSubject: %d\n".getBytes("ISO-8859-1")
    assert(carve(new EmlCarver(0, 0), bad).isEmpty)
  }
  test("elf section extent") { assertExact(new ElfCarver(0, 0), elf64()) }
  test("tar block walk") { assertExact(new TarCarver(0, 0), tar(), "tar_magic") }
  test("tar ustar-rebased hit") {
    val sample = tar()
    val (ev, off) = planted(sample)
    val ctx = ExtractionContext("t", new InMemoryEvidence(ev))
    val c = new TarCarver(0, 0).processHit(CarveHit(off + 257, "tar", "tar_ustar"), ctx).get
    assert(c.globalStart == off && c.size == sample.length)
  }
  test("ogg page walk to EOS") { assertExact(new OggCarver(0, 0), ogg()) }
  test("mp3 id3 + frame walk") { assertExact(new Mp3Carver(0, 0), mp3()) }
  test("mp3 bare sync with <3 frames rejected") {
    val single = mp3().drop(30) // strip ID3, single frame only
    assert(carve(new Mp3Carver(0, 0), single).isEmpty)
  }
  test("ico with embedded png") { assertExact(new IcoCarver(0, 0), ico()) }
  test("mp4 box walk") { assertExact(new Mp4Carver(0, 0), mp4()) }
  test("mp4 rejects qt brand by default") {
    assert(carve(new Mp4Carver(0, 0), mov()).isEmpty)
  }
  test("mp4 allows qt brand in quicktime mode") {
    assert(carve(new Mp4Carver(0, 0, "mp4", allowQuicktime = true), mov()).isDefined)
  }
  test("mov requires qt brand") {
    assertExact(new MovCarver(0, 0), mov())
    assert(carve(new MovCarver(0, 0), mp4()).isEmpty)
  }
  test("webm ebml + segment size") { assertExact(new WebmCarver(0, 0), webm()) }
  test("wmv file properties size") { assertExact(new WmvCarver(0, 0), wmv()) }
  test("lrf declared size") { assertExact(new LrfCarver(0, 0), lrf()) }
  test("mobi record directory") {
    val sample = mobi()
    val (ev, off) = planted(sample)
    val ctx = ExtractionContext("t", new InMemoryEvidence(ev))
    // hit lands on BOOKMOBI at +60, rebased back
    val c = new MobiCarver(0, 0).processHit(CarveHit(off + 60, "mobi", "mobi_pdb"), ctx).get
    assert(c.globalStart == off && c.size == sample.length)
  }
  test("fb2 end tag") { assertExact(new Fb2Carver(0, 0), fb2()) }
  test("rar4 end block") { assertExact(new RarCarver(0, 0), rar4()) }

  test("zip carves to EOCD and classifies docx") {
    val sample = zipWithEntry("word/document.xml")
    val result = carve(new ZipCarver(0, 0), sample)
    assert(result.isDefined)
    val c = result.get
    assert(c.size == sample.length)
    assert(c.fileType == "docx" && c.extension == "docx")
    assert(c.validated)
  }
  test("zip classifies xlsx and plain zip") {
    assert(carve(new ZipCarver(0, 0), zipWithEntry("xl/workbook.xml")).get.fileType == "xlsx")
    assert(carve(new ZipCarver(0, 0), zipWithEntry("data.txt")).get.fileType == "zip")
  }
  test("zip classifies odt by mimetype") {
    val sample = zipWithEntry("mimetype", "application/vnd.oasis.opendocument.text".getBytes)
    assert(carve(new ZipCarver(0, 0), sample).get.fileType == "odt")
  }
  test("zip require_eocd rejects bare header") {
    val junk = "PK\u0003\u0004 not a real zip at all".getBytes("ISO-8859-1")
    assert(carve(new ZipCarver(1024, 0), junk).isEmpty)
  }
  test("zip allowed kinds filter") {
    val docx = zipWithEntry("word/document.xml")
    assert(carve(new ZipCarver(0, 0, "zip", true, Some(Set("xlsx"))), docx).isEmpty)
    assert(carve(new ZipCarver(0, 0, "zip", true, Some(Set("docx"))), docx).isDefined)
  }

  test("ole carves and classifies doc") {
    val sample = ole("WordDocument")
    val c = carve(new OleCarver(0, 0), sample).get
    assert(c.fileType == "doc")
    assert(c.size == sample.length)
    assert(c.validated)
  }
  test("ole classifies xls and ppt") {
    assert(carve(new OleCarver(0, 0), ole("Workbook")).get.fileType == "xls")
    assert(carve(new OleCarver(0, 0), ole("PowerPoint Document")).get.fileType == "ppt")
  }
  test("ole rejects bad byte order") {
    val bad = ole(); bad(28) = 0; bad(29) = 0
    assert(carve(new OleCarver(0, 0), bad).isEmpty)
  }

  test("registry covers all 31 file types") {
    val reg = EngineConfig.buildRegistry(EngineConfig())
    assert(reg.size == 31)
    assert(reg.keySet.contains("jpeg") && reg.keySet.contains("ole") && reg.keySet.contains("lrf"))
  }
  test("registry quicktime mode replaces mov with mp4 handler") {
    val reg = EngineConfig.buildRegistry(EngineConfig(quicktimeMode = "mp4"))
    assert(!reg.contains("mov")) // covered by mp4 handler
    assert(reg.contains("mp4"))
  }
  test("type filter with zip family expansion") {
    val (cfg, unknown) = EngineConfig.filterFileTypes(EngineConfig(), Some(Seq("docx", "jpeg")), disableZip = false)
    assert(unknown.isEmpty)
    assert(cfg.fileTypes.map(_.id).toSet == Set("jpeg", "zip"))
    assert(cfg.zipAllowedKinds.contains(Seq("docx")))
  }
  test("disable_zip removes zip") {
    val (cfg, _) = EngineConfig.filterFileTypes(EngineConfig(), None, disableZip = true)
    assert(!cfg.fileTypes.exists(_.id == "zip"))
  }
  test("unknown types reported") {
    val (_, unknown) = EngineConfig.filterFileTypes(EngineConfig(), Some(Seq("nope", "jpeg")), disableZip = false)
    assert(unknown == Seq("nope"))
  }

  test("custom footer-validator type flows through the registry") {
    val custom = FileTypeConfig("dat", Seq("dat"),
      Seq(HeaderPattern("dat_hdr", "44415448")), // "DATH"
      Seq(HeaderPattern("dat_end", "454E4444")), // "ENDD"
      maxSize = 1 << 20, minSize = 0, validator = "footer")
    val reg = EngineConfig.buildRegistry(EngineConfig(fileTypes = Seq(custom)))
    val handler = reg("dat")
    val sample = "DATHsome payload hereENDD".getBytes("ISO-8859-1")
    val (ev, off) = planted(sample)
    val ctx = ExtractionContext("t", new InMemoryEvidence(ev))
    val c = handler.processHit(CarveHit(off, "dat", "dat_hdr"), ctx).get
    assert(c.size == sample.length && c.validated && c.fileType == "dat")
  }
}
