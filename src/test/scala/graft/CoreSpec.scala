package graft

import graft.artefacts.Artefacts
import graft.carve.Naming
import graft.core.ChunkPlanner
import graft.functions.Entropy
import graft.scan.{AhoCorasick, StringScan}
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the pure operator cores (mirrors the reference's
  * colocated module tests — chunk.rs, strings/cpu.rs, strings/mod.rs,
  * entropy.rs, carve/mod.rs sanitization).
  */
class CoreSpec extends AnyFunSuite {

  test("chunk planning covers the byte space with overlap") {
    val chunks = ChunkPlanner.planLocal(1000, 300, 50)
    assert(chunks.length == 4)
    assert(chunks.map(_.start) == Seq(0L, 300L, 600L, 900L))
    assert(chunks.map(_.length) == Seq(350L, 350L, 350L, 100L))
    assert(chunks.map(_.validLength) == Seq(300L, 300L, 300L, 100L))
    assert(ChunkPlanner.planLocal(0, 300, 50).isEmpty)
    assert(ChunkPlanner.planLocal(100, 0, 50).isEmpty)
    // exact multiple: no tail chunk
    assert(ChunkPlanner.planLocal(600, 300, 50).length == 2)
  }

  test("strided synthetic evidence is byte-identical to the materialized layout") {
    import graft.evidence.{StridedSamplesRef, ZerosRef}
    val samples = IndexedSeq(
      Array.tabulate(7)(i => (i + 1).toByte),
      Array.tabulate(13)(i => (i + 100).toByte),
      Array.tabulate(5)(i => (i + 50).toByte))
    val stride = 16L
    val slots = 10L
    val expected = new Array[Byte]((stride * slots).toInt)
    (0L until slots).foreach { s =>
      val sm = samples((s % 3).toInt)
      System.arraycopy(sm, 0, expected, (s * stride).toInt, sm.length)
    }
    val r = StridedSamplesRef(samples, stride, slots).open()
    assert(r.length == expected.length.toLong)
    // every (offset, len) window, including slot-straddling and EOF-clipped
    for (off <- 0 until expected.length; len <- Seq(1, 3, 16, 33, 200)) {
      val buf = new Array[Byte](len)
      val n = r.readAt(off.toLong, buf, 0, len)
      assert(n == math.min(len, expected.length - off), s"n at $off/$len")
      assert(buf.take(n).sameElements(expected.slice(off, off + n)), s"bytes at $off/$len")
    }
    assert(r.readAt(expected.length.toLong, new Array[Byte](4), 0, 4) == 0)
    val z = ZerosRef(32L).open()
    val zb = Array.fill[Byte](8)(9)
    assert(z.readAt(28L, zb, 0, 8) == 4 && zb.take(4).forall(_ == 0))
  }

  test("aho-corasick finds all overlapping matches") {
    val ac = AhoCorasick.buildFromStrings(Seq("abc", "bcd", "cd", "x"))
    val hits = ac.findAll("zabcdx".getBytes).sorted
    assert(hits == Seq((1, 0), (2, 1), (3, 2), (5, 3)))
  }

  test("aho-corasick handles binary patterns and repeats") {
    val ac = AhoCorasick.build(Seq(Array[Byte](0, 0, 1), Array[Byte](0, 1)))
    val hits = ac.findAll(Array[Byte](0, 0, 0, 1, 2)).sorted
    assert(hits == Seq((1, 0), (2, 1)))
  }

  test("ascii span scan: min length and splitting") {
    val scanner = new StringScan(4, 6, false)
    val data = "abc\u0000defgh\nxy".getBytes("ISO-8859-1")
    val spans = scanner.scanChunk(0, data)
    // NUL breaks the run: "abc" (3) is under min length, "defgh" (5)
    // is a span, \n breaks again, "xy" (2) is dropped
    assert(spans.map(s => (s.localStart, s.length)) == Seq((4L, 5)))
  }

  test("long runs split at max length") {
    val scanner = new StringScan(2, 4, false)
    val data = "abcdefghij".getBytes
    val spans = scanner.scanChunk(0, data)
    assert(spans.map(s => (s.localStart, s.length)) == Seq((0L, 4), (4L, 4), (8L, 2)))
  }

  test("utf16le span scan both phases") {
    val scanner = new StringScan(3, 1024, true)
    val data = "h\u0000e\u0000l\u0000l\u0000o\u0000".getBytes("ISO-8859-1")
    val spans = scanner.scanChunk(0, data)
    val utf16 = spans.filter(s => (s.flags & graft.core.StringFlags.Utf16Le) != 0)
    assert(utf16.nonEmpty && utf16.head.length == 10)
  }

  test("span hint flags") {
    val scanner = new StringScan(4, 1024, false)
    val url = scanner.scanChunk(0, "see http://x.com now".getBytes).head
    assert((url.flags & graft.core.StringFlags.UrlLike) != 0)
    val email = scanner.scanChunk(0, "mail a@b.com now".getBytes).head
    assert((email.flags & graft.core.StringFlags.EmailLike) != 0)
    val phone = scanner.scanChunk(0, "call 12345678901 now".getBytes).head
    assert((phone.flags & graft.core.StringFlags.PhoneLike) != 0)
  }

  test("url normalization parity") {
    assert(Artefacts.normalizeUrl("https://example.com/x.").contains("https://example.com/x"))
    assert(Artefacts.normalizeUrl("http://nohost").isEmpty) // no dot
    assert(Artefacts.normalizeUrl("www.a.b").isEmpty) // too short (<8)
    assert(Artefacts.normalizeUrl("https://.bad.com").isEmpty) // empty label
    assert(Artefacts.normalizeUrl("https://" + "a" * 254 + ".com").isEmpty) // host too long
    assert(Artefacts.normalizeUrl("HTTPS://Example.COM/Path").contains("HTTPS://Example.COM/Path"))
  }

  test("email normalization parity") {
    assert(Artefacts.normalizeEmail("test@example.com,").contains("test@example.com"))
    assert(Artefacts.normalizeEmail("a@b.c").isEmpty) // <6 chars
    assert(Artefacts.normalizeEmail("x@999.111").isEmpty) // no alpha in domain
    assert(Artefacts.normalizeEmail(("x" * 65) + "@example.com").isEmpty) // local >64
  }

  test("phone plausibility") {
    assert(Artefacts.isPlausiblePhone("+1 (415) 555-1234"))
    assert(!Artefacts.isPlausiblePhone("0000000000")) // 1 unique digit
    assert(!Artefacts.isPlausiblePhone("123456789")) // 9 digits
    assert(!Artefacts.isPlausiblePhone("7676766773")) // 3 unique
  }

  test("extractAll finds url email phone in order") {
    val found = Artefacts.extractAll("visit https://example.com and mail test@example.com or +1 415 555 0042")
    assert(found.map(_.kind) == Seq("Url", "Email", "Phone"))
    assert(found.head.content == "https://example.com")
  }

  test("url parts split parity") {
    val p = Artefacts.parseUrlParts("https://h.example.com:8080/p/q?x=1&y=2#frag")
    assert(p == Artefacts.UrlParts("https", "h.example.com", Some(8080), Some("/p/q"), Some("x=1&y=2"), Some("frag")))
    val www = Artefacts.parseUrlParts("www.plain.org")
    assert(www.scheme == "http" && www.host == "www.plain.org" && www.port.isEmpty)
    val bare = Artefacts.parseUrlParts("https://x.y")
    assert(bare.path.isEmpty && bare.query.isEmpty && bare.fragment.isEmpty)
  }

  test("email split at first @") {
    assert(Artefacts.splitEmail("a@b@c") == ("a", "b@c"))
    assert(Artefacts.splitEmail("nope") == ("", ""))
  }

  test("entropy: 0..255 ramp is one 8-bit region") {
    val data = Array.tabulate[Byte](256)(_.toByte)
    val regions = Entropy.detectRegions(0, data, 256, 7.5)
    assert(regions == Seq((0L, 255L, 8.0)))
  }

  test("entropy: zeros produce no region") {
    assert(Entropy.detectRegions(0, new Array[Byte](1024), 256, 7.0).isEmpty)
  }

  test("entropy: adjacent windows merge keeping max") {
    // two adjacent random-ish windows + one zero window
    val rnd = Array.tabulate[Byte](512)(i => ((i * 37 + 11) % 256).toByte)
    val data = rnd ++ new Array[Byte](256)
    val regions = Entropy.detectRegions(100, data, 256, 7.0)
    assert(regions.length == 1)
    assert(regions.head._1 == 100L && regions.head._2 == 100L + 511L)
  }

  test("path sanitization parity") {
    assert(Naming.sanitizeComponent("a/b\\c:d") == "a_b_c_d")
    assert(Naming.sanitizeComponent("..") == "_")
    assert(Naming.sanitizeComponent("...") == "_") // ".." -> "_" leaves "_."; dots trimmed
    assert(Naming.sanitizeComponent(".hidden.") == "hidden")
    assert(Naming.sanitizeComponent("???") == "___") // chars replaced, not dropped
    assert(Naming.sanitizeComponent("") == "unknown")
    assert(Naming.sanitizeExtension(".JPG") == "jpg")
  }

  test("output naming format") {
    assert(Naming.relPath("jpeg", "jpg", 0x14000) == "jpeg/jpeg_000000014000.jpg")
    // empty extension sanitizes to "unknown" (reference sanitize_component("") behavior)
    assert(Naming.relPath("x", "", 1) == "x/x_000000000001.unknown")
  }
}
