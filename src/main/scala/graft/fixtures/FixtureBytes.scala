package graft.fixtures

import java.io.ByteArrayOutputStream
import java.security.MessageDigest

/** Minimal synthetic format samples (shapes from the reference's
  * integration fixtures, tests/integration_basic.rs:19-227 and per-carver
  * unit tests — see FIXTURES.md §2). Builders are byte-exact so carve
  * sizes/hashes can be asserted.
  */
object FixtureBytes {

  def sha256Hex(data: Array[Byte]): String =
    graft.carve.Hex.lower(MessageDigest.getInstance("SHA-256").digest(data))
  def md5Hex(data: Array[Byte]): String =
    graft.carve.Hex.lower(MessageDigest.getInstance("MD5").digest(data))

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def ascii(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  /** One serialized WARC record (version line, typed headers,
    * Content-Length framing, trailing CRLFCRLF) — the single fixture
    * serializer behind every WarcCorpus spec/bench/query (six hand-
    * rolled copies drifted before this). Pass `contentLength` to plant
    * a corrupt length field; `recordId` adds the optional
    * WARC-Record-ID header.
    */
  def warcRecord(targetUri: String, payload: Array[Byte],
                 contentLength: Option[String] = None,
                 warcType: String = "conversion",
                 recordId: Option[String] = None,
                 version: String = "1.0"): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(s"WARC/$version\r\n")
    sb.append(s"WARC-Type: $warcType\r\n")
    sb.append(s"WARC-Target-URI: $targetUri\r\n")
    recordId.foreach(r => sb.append(s"WARC-Record-ID: $r\r\n"))
    sb.append(s"Content-Length: ${contentLength.getOrElse(payload.length.toString)}\r\n\r\n")
    ascii(sb.toString) ++ payload ++ ascii("\r\n\r\n")
  }

  /** One per-record-gzip member (the `.warc.gz` layout: each record its
    * own gzip member, members concatenated): `record` deflated via the
    * JDK's GZIPOutputStream (all-zero MTIME/XFL/OS header — byte-
    * deterministic). `corrupt = true` flips one byte near the END of
    * the deflate stream — by then the record's head has inflated, so
    * the reader can SEE a record was there and must QUARANTINE (an
    * early-stream flip is indistinguishable from a false-positive magic
    * and is documented as silently skipped).
    */
  def gzMember(record: Array[Byte], corrupt: Boolean = false): Array[Byte] = {
    val bos = new ByteArrayOutputStream
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(record); gz.close()
    val out = bos.toByteArray
    if (corrupt) {
      val at = out.length - 10 // 2 bytes before the 8-byte trailer
      out(at) = (out(at) ^ 0x5a).toByte
    }
    out
  }

  def beU32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  def leU32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  def leU16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  def beU16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** 32-byte JPEG: SOI + APP0 JFIF + padding + EOI. */
  def jpeg(): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(bytes(0xff, 0xd8, 0xff, 0xe0))
    out.write(ascii("JFIF")); out.write(0)
    out.write(new Array[Byte](23))
    out.write(bytes(0xff, 0xd9))
    out.toByteArray
  }

  /** PNG: signature + IHDR + zero-len IDAT + IEND (CRCs arbitrary — the
    * reference walker doesn't verify CRCs).
    */
  def png(): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    out.write(beU32(13)); out.write(ascii("IHDR")); out.write(new Array[Byte](13)); out.write(beU32(0))
    out.write(beU32(0)); out.write(ascii("IDAT")); out.write(beU32(0))
    out.write(beU32(0)); out.write(ascii("IEND")); out.write(beU32(0))
    out.toByteArray
  }

  /** GIF89a: header + LSD (no GCT) + trailer. */
  def gif(): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(ascii("GIF89a"))
    out.write(bytes(1, 0, 1, 0, 0x00, 0, 0)) // LSD, no GCT
    out.write(0x3b)
    out.toByteArray
  }

  /** Genuinely decodable still image: a w×h solid-rgb bitmap encoded by
    * the JDK's ImageIO (`fmt` ∈ png | bmp | jpg | gif). Unlike the
    * minimal header samples above (which exercise the carvers'
    * structural validation), these are complete images a real codec
    * round-trips — the decode side of the multimodal operators reads
    * them back with `javax.imageio` and must recover the planted
    * dimensions and (for lossless formats) the exact color.
    */
  def solidImage(fmt: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream
    require(javax.imageio.ImageIO.write(img, fmt, out), s"no ImageIO writer for $fmt")
    out.toByteArray
  }

  /** Deterministic gradient image for perceptual-hash tests: pixel
    * (x, y) has r = (seed + 11x + 23y) % 256, g = (seed + 7x + 31y)
    * % 256, b = (seed + 13x + 17y) % 256 — linear ramps with modular
    * wrap, so every pixel (and anything derived from sampled pixels)
    * is predictable by arithmetic on (seed, w, h) without touching
    * bytes. Encode via ImageIO; png/bmp are lossless so a decoder
    * must reproduce the formula exactly.
    */
  def gradientImage(fmt: String, w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (seed + 11 * x + 23 * y) % 256
        val g = (seed + 7 * x + 31 * y) % 256
        val b = (seed + 13 * x + 17 * y) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream
    require(javax.imageio.ImageIO.write(img, fmt, out), s"no ImageIO writer for $fmt")
    out.toByteArray
  }

  /** SQLite: 100-byte header + pages; page_size@16 BE, page_count@28 BE. */
  def sqlite(pageSize: Int = 512, pageCount: Int = 2): Array[Byte] = {
    val total = pageSize * pageCount
    val data = new Array[Byte](total)
    System.arraycopy(ascii("SQLite format 3").padTo(16, 0.toByte).toArray, 0, data, 0, 16)
    data(15) = 0 // "SQLite format 3\0"
    System.arraycopy(ascii("SQLite format 3\u0000"), 0, data, 0, 16)
    System.arraycopy(beU16(pageSize), 0, data, 16, 2)
    System.arraycopy(beU32(pageCount.toLong), 0, data, 28, 4)
    data
  }

  def pdf(): Array[Byte] = ascii("%PDF-1.4\n1 0 obj\n<< >>\nendobj\ntrailer\n%%EOF")

  def webp(payload: Int = 20): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(ascii("RIFF"))
    out.write(leU32(4 + payload)) // size after this field
    out.write(ascii("WEBP"))
    out.write(new Array[Byte](payload))
    out.toByteArray
  }

  def wav(payload: Int = 100): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(ascii("RIFF")); out.write(leU32(4 + payload)); out.write(ascii("WAVE"))
    out.write(new Array[Byte](payload))
    out.toByteArray
  }

  /** Complete playable PCM16 WAV: RIFF header + canonical `fmt ` chunk +
    * interleaved little-endian `data` chunk. Byte-exact so audio decode
    * tests can assert every recovered sample.
    */
  def pcmWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new ByteArrayOutputStream
    out.write(ascii("RIFF")); out.write(leU32(36L + dataLen)); out.write(ascii("WAVE"))
    out.write(ascii("fmt ")); out.write(leU32(16))
    out.write(leU16(1)) // PCM
    out.write(leU16(channels))
    out.write(leU32(sampleRate.toLong))
    out.write(leU32(sampleRate.toLong * channels * 2)) // byte rate
    out.write(leU16(channels * 2)) // block align
    out.write(leU16(16)) // bits per sample
    out.write(ascii("data")); out.write(leU32(dataLen.toLong))
    samples.foreach(v => out.write(leU16(v & 0xffff)))
    out.toByteArray
  }

  def bmp(width: Int = 4, height: Int = 4): Array[Byte] = {
    val rowSize = ((width * 24 + 31) / 32) * 4
    val pixelData = rowSize * height
    val pixelOffset = 14 + 40
    val fileSize = pixelOffset + pixelData
    val out = new ByteArrayOutputStream
    out.write(ascii("BM")); out.write(leU32(fileSize)); out.write(leU32(0)); out.write(leU32(pixelOffset))
    out.write(leU32(40)); out.write(leU32(width)); out.write(leU32(height))
    out.write(leU16(1)); out.write(leU16(24))
    out.write(new Array[Byte](40 - 16)) // rest of DIB header
    out.write(new Array[Byte](pixelData))
    out.toByteArray
  }

  def sevenZ(body: Int = 64): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(bytes(0x37, 0x7a, 0xbc, 0xaf, 0x27, 0x1c))
    out.write(bytes(0, 4)) // version
    out.write(leU32(0)) // start header CRC
    // next_header_offset (u64 le), next_header_size (u64 le)
    out.write(leU32(body)); out.write(leU32(0))
    out.write(leU32(8)); out.write(leU32(0))
    out.write(leU32(0)) // next header CRC
    out.write(new Array[Byte](body + 8))
    out.toByteArray
  }

  def gzip(deflateLen: Int = 40): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(bytes(0x1f, 0x8b, 0x08, 0x00)) // magic + method + no flags
    out.write(new Array[Byte](6)) // mtime, xfl, os
    out.write(new Array[Byte](deflateLen)) // opaque deflate data
    out.toByteArray
  }

  def bzip2(body: Int = 32): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(ascii("BZh9"))
    out.write(new Array[Byte](body))
    out.write(bytes(0x17, 0x72, 0x45, 0x38, 0x50, 0x90))
    out.toByteArray
  }

  def rtf(): Array[Byte] = ascii("{\\rtf1\\ansi Hello {\\b world}}")

  def eml(): Array[Byte] = ascii(
    "From: alice@example.com\r\nTo: bob@example.com\r\nSubject: hi\r\nDate: Mon\r\n\r\nbody text\r\n")

  def elf64(): Array[Byte] = {
    val data = new Array[Byte](128)
    System.arraycopy(bytes(0x7f, 'E', 'L', 'F', 2, 1, 1, 0), 0, data, 0, 8)
    // e_shoff = 64 (u64 le @40), e_shentsize = 64 (@58), e_shnum = 1 (@60)
    data(40) = 64
    data(58) = 64
    data(60) = 1
    data
  }

  def tar(fileContent: Array[Byte] = ascii("hello tar\n")): Array[Byte] = {
    val header = new Array[Byte](512)
    System.arraycopy(ascii("file.txt"), 0, header, 0, 8)
    val sizeOctal = fileContent.length.toOctalString.reverse.padTo(11, '0').reverse + "\u0000"
    System.arraycopy(ascii(sizeOctal), 0, header, 124, 12)
    System.arraycopy(ascii("ustar"), 0, header, 257, 5)
    // checksum: field treated as spaces
    java.util.Arrays.fill(header, 148, 156, ' '.toByte)
    var sum = 0
    header.foreach(b => sum += (b & 0xff))
    val chk = sum.toOctalString.reverse.padTo(6, '0').reverse + "\u0000 "
    System.arraycopy(ascii(chk), 0, header, 148, 8)
    val out = new ByteArrayOutputStream
    out.write(header)
    val blocks = (fileContent.length + 511) / 512
    val data = java.util.Arrays.copyOf(fileContent, blocks * 512)
    out.write(data)
    out.write(new Array[Byte](1024)) // two zero blocks
    out.toByteArray
  }

  def oggPage(eos: Boolean, segments: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(ascii("OggS"))
    out.write(0) // version
    out.write(if (eos) 0x04 else 0x02) // header type
    out.write(new Array[Byte](20)) // granule, serial, seq, crc
    out.write(1) // one segment
    out.write(segments.length) // segment length
    out.write(segments)
    out.toByteArray
  }

  def ogg(): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(oggPage(eos = false, ascii("vorbis-head")))
    out.write(oggPage(eos = true, ascii("tail")))
    out.toByteArray
  }

  /** MP3 with ID3v2 tag + one MPEG1 Layer III frame @128kbps 44100Hz. */
  def mp3(): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(ascii("ID3")); out.write(bytes(3, 0, 0)) // version + flags
    out.write(bytes(0, 0, 0, 20)) // syncsafe size 20
    out.write(new Array[Byte](20))
    // frame: FF FB 90 00 -> v1 L3 128kbps 44100 no padding => 417 bytes
    out.write(bytes(0xff, 0xfb, 0x90, 0x00))
    out.write(new Array[Byte](417 - 4))
    out.toByteArray
  }

  def ico(): Array[Byte] = {
    val png0 = png()
    val out = new ByteArrayOutputStream
    out.write(bytes(0, 0, 1, 0)); out.write(leU16(1)) // ICO, 1 entry
    out.write(bytes(16, 16, 0, 0)); out.write(leU16(1)); out.write(leU16(32))
    out.write(leU32(png0.length)); out.write(leU32(6 + 16))
    out.write(png0)
    out.toByteArray
  }

  def mp4(): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(beU32(0x14)); out.write(ascii("ftyp")); out.write(ascii("isom")); out.write(beU32(0)); out.write(ascii("iso2"))
    out.write(beU32(16)); out.write(ascii("moov")); out.write(new Array[Byte](8))
    out.toByteArray
  }

  def mov(): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(beU32(0x14)); out.write(ascii("ftyp")); out.write(ascii("qt  ")); out.write(beU32(0)); out.write(ascii("qt  "))
    out.write(beU32(16)); out.write(ascii("moov")); out.write(new Array[Byte](8))
    out.toByteArray
  }

  def webm(): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(bytes(0x1a, 0x45, 0xdf, 0xa3)) // EBML id
    out.write(0x87) // header size 7
    out.write(bytes(0x42, 0x82)) // DocType id
    out.write(0x84) // size 4
    out.write(ascii("webm"))
    out.write(bytes(0x18, 0x53, 0x80, 0x67)) // Segment id
    out.write(0x85) // size 5
    out.write(new Array[Byte](5))
    out.toByteArray
  }

  def wmv(dataLen: Int = 40): Array[Byte] = {
    val out = new ByteArrayOutputStream
    val headerObjs = new ByteArrayOutputStream
    // File Properties object: guid + size(104) + 16B file id + file size @+40
    headerObjs.write(graft.carve.Hex.decode("A1DCAB8C47A9CF118EE400C00C205365"))
    headerObjs.write(leU32(104)); headerObjs.write(leU32(0))
    headerObjs.write(new Array[Byte](16))
    val fileSize = 30 + 104 + dataLen
    headerObjs.write(leU32(fileSize.toLong)); headerObjs.write(leU32(0))
    headerObjs.write(new Array[Byte](104 - 24 - 16 - 8))
    val objs = headerObjs.toByteArray
    out.write(graft.carve.Hex.decode("3026B2758E66CF11A6D900AA0062CE6C"))
    out.write(leU32(30 + objs.length)); out.write(leU32(0)) // header size u64
    out.write(leU32(1)); out.write(bytes(1, 2)) // object count + reserved
    out.write(objs)
    out.write(new Array[Byte](dataLen))
    out.toByteArray
  }

  def lrf(total: Int = 96): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(bytes('L', 'R', 'F', 0))
    out.write(leU32(0)) // version etc.
    out.write(leU32(total.toLong))
    out.write(new Array[Byte](total - 12))
    out.toByteArray
  }

  def xz(): Array[Byte] = {
    val out = new ByteArrayOutputStream
    val header = new ByteArrayOutputStream
    header.write(bytes(0xfd, '7', 'z', 'X', 'Z', 0x00))
    val flags = bytes(0x00, 0x04) // stream flags
    header.write(flags)
    val crc = new java.util.zip.CRC32; crc.update(flags)
    header.write(leU32(crc.getValue))
    out.write(header.toByteArray)
    out.write(new Array[Byte](24)) // opaque block data
    // footer: crc32(backward_size+flags) + backward_size(4) + flags(2) + "YZ"
    val backward = leU32(1)
    val footerBody = backward ++ flags
    val fcrc = new java.util.zip.CRC32; fcrc.update(footerBody)
    out.write(leU32(fcrc.getValue))
    out.write(footerBody)
    out.write(ascii("YZ"))
    out.toByteArray
  }

  /** Stored-entry ZIP with one central-directory entry named `name`. */
  def zipWithEntry(name: String, content: Array[Byte] = ascii("zip-content")): Array[Byte] = {
    val out = new ByteArrayOutputStream
    val nameB = ascii(name)
    val crc = new java.util.zip.CRC32; crc.update(content)
    // local file header
    out.write(graft.carve.Hex.decode("504B0304"))
    out.write(leU16(20)); out.write(leU16(0)); out.write(leU16(0)) // version, flags, method=0
    out.write(leU32(0)) // time/date
    out.write(leU32(crc.getValue)); out.write(leU32(content.length)); out.write(leU32(content.length))
    out.write(leU16(nameB.length)); out.write(leU16(0))
    out.write(nameB); out.write(content)
    val cdOffset = out.size()
    // central directory entry
    out.write(graft.carve.Hex.decode("504B0102"))
    out.write(leU16(20)); out.write(leU16(20)); out.write(leU16(0)); out.write(leU16(0))
    out.write(leU32(0))
    out.write(leU32(crc.getValue)); out.write(leU32(content.length)); out.write(leU32(content.length))
    out.write(leU16(nameB.length)); out.write(leU16(0)); out.write(leU16(0))
    out.write(leU16(0)); out.write(leU16(0)); out.write(leU32(0))
    out.write(leU32(0)) // local header offset
    out.write(nameB)
    val cdSize = out.size() - cdOffset
    // EOCD
    out.write(graft.carve.Hex.decode("504B0506"))
    out.write(leU16(0)); out.write(leU16(0)); out.write(leU16(1)); out.write(leU16(1))
    out.write(leU32(cdSize.toLong)); out.write(leU32(cdOffset.toLong))
    out.write(leU16(0))
    out.toByteArray
  }

  /** Minimal OLE/CFB v3 with a directory entry named via UTF-16LE. */
  def ole(streamName: String = "WordDocument"): Array[Byte] = {
    val sectorSize = 512
    // sectors: 0 = FAT, 1 = directory
    val data = new Array[Byte](512 + 2 * sectorSize)
    System.arraycopy(graft.carve.Hex.decode("D0CF11E0A1B11AE1"), 0, data, 0, 8)
    System.arraycopy(leU16(3), 0, data, 26, 2) // major version 3
    System.arraycopy(leU16(0xfffe), 0, data, 28, 2) // byte order
    System.arraycopy(leU16(9), 0, data, 30, 2) // sector power
    System.arraycopy(leU32(1), 0, data, 44, 4) // num FAT sectors
    System.arraycopy(leU32(1), 0, data, 48, 4) // first dir sector = 1
    // DIFAT[0] = sector 0 (the FAT), rest = 0xFFFFFFFF
    System.arraycopy(leU32(0), 0, data, 76, 4)
    var i = 1
    while (i < 109) {
      System.arraycopy(leU32(0xffffffffL), 0, data, 76 + i * 4, 4)
      i += 1
    }
    // FAT sector (sector 0): entry0 = FATSECT marker, entry1 = ENDOFCHAIN
    val fatBase = 512
    System.arraycopy(leU32(0xfffffffdL), 0, data, fatBase, 4)
    System.arraycopy(leU32(0xfffffffeL), 0, data, fatBase + 4, 4)
    i = 2
    while (i < sectorSize / 4) {
      System.arraycopy(leU32(0xffffffffL), 0, data, fatBase + i * 4, 4)
      i += 1
    }
    // directory sector (sector 1): one 128-byte entry, type 2 (stream)
    val dirBase = 512 + sectorSize
    val utf16 = streamName.flatMap(c => Seq((c & 0xff).toByte, 0.toByte)).toArray
    System.arraycopy(utf16, 0, data, dirBase, utf16.length)
    System.arraycopy(leU16(utf16.length + 2), 0, data, dirBase + 64, 2) // name len incl. terminator
    data(dirBase + 66) = 2 // stream type
    data
  }

  def mobi(recordCount: Int = 2): Array[Byte] = {
    val headerLen = 78
    val listLen = recordCount * 8
    val firstData = headerLen + listLen
    val recSize = 64
    val total = firstData + recordCount * recSize
    val data = new Array[Byte](total)
    System.arraycopy(ascii("BOOKMOBI"), 0, data, 60, 8)
    System.arraycopy(beU16(recordCount), 0, data, 76, 2)
    var i = 0
    while (i < recordCount) {
      System.arraycopy(beU32((firstData + i * recSize).toLong), 0, data, headerLen + i * 8, 4)
      i += 1
    }
    data
  }

  def fb2(): Array[Byte] = ascii(
    "<?xml version=\"1.0\"?>\n<FictionBook xmlns=\"x\">\n<body>text here</body>\n</FictionBook>")

  def rar4(): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(graft.carve.Hex.decode("526172211A0700"))
    // main header: crc(2) type(1)=0x73 flags(2) size(2)=13, then 6 more bytes
    out.write(leU16(0)); out.write(0x73); out.write(leU16(0)); out.write(leU16(13)); out.write(new Array[Byte](6))
    // end block: type 0x7B size 7
    out.write(leU16(0)); out.write(0x7b); out.write(leU16(0)); out.write(leU16(7))
    out.toByteArray
  }


  def avi(payload: Int = 200): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(ascii("RIFF")); out.write(leU32(4 + payload)); out.write(ascii("AVI "))
    out.write(new Array[Byte](payload))
    out.toByteArray
  }

  /** Complete MJPEG-in-AVI container: a RIFF with the standard
    * hdrl (avih + one vids/MJPG stream) and a movi LIST whose 00dc
    * chunks are REAL ImageIO-encoded JPEG frames — every parser field a
    * video tool reads (frame count, dimensions, fourcc) is populated
    * from the actual frames. Solid-color frames keep the decode
    * deterministic.
    */
  def mjpegAvi(frames: Seq[(Int, Int, Int)]): Array[Byte] = {
    require(frames.nonEmpty, "an AVI needs at least one frame")
    val (w0, h0, _) = frames.head
    framesAvi(frames.map { case (w, h, rgb) => solidImage("jpeg", w, h, rgb) }, w0, h0)
  }

  /** AVI container around arbitrary pre-encoded frame payloads (the
    * [[mjpegAvi]] RIFF layout with the frame codec left to the caller —
    * e.g. lossless BMP frames keep a perceptual-hash pipeline
    * pixel-exact where JPEG quantization would not).
    */
  def framesAvi(framePayloads: Seq[Array[Byte]], w0: Int, h0: Int): Array[Byte] = {
    require(framePayloads.nonEmpty, "an AVI needs at least one frame")
    def chunk(fcc: String, body: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream
      out.write(ascii(fcc)); out.write(leU32(body.length)); out.write(body)
      if (body.length % 2 == 1) out.write(0) // RIFF chunks are word-aligned
      out.toByteArray
    }
    def list(fcc: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", ascii(fcc) ++ body)
    val avih = chunk("avih",
      leU32(33333) ++ leU32(0) ++ leU32(0) ++ leU32(0) ++ // usPerFrame, maxBps, pad, flags
        leU32(framePayloads.length.toLong) ++ leU32(0) ++ leU32(1) ++ leU32(0) ++ // total, initial, streams, bufSize
        leU32(w0.toLong) ++ leU32(h0.toLong) ++ new Array[Byte](16)) // width, height, reserved
    val strh = chunk("strh",
      ascii("vids") ++ ascii("MJPG") ++ new Array[Byte](12) ++ // type, handler, flags/prio/initial
        leU32(1) ++ leU32(30) ++ leU32(0) ++ // scale, rate, start
        leU32(framePayloads.length.toLong) ++ leU32(0) ++ leU32(0xffffffffL) ++ leU32(0) ++ // length, bufSize, quality, sampleSize
        leU16(0) ++ leU16(0) ++ leU16(w0) ++ leU16(h0)) // rcFrame
    val strf = chunk("strf",
      leU32(40) ++ leU32(w0.toLong) ++ leU32(h0.toLong) ++ leU16(1) ++ leU16(24) ++
        ascii("MJPG") ++ leU32((w0.toLong * h0 * 3)) ++ new Array[Byte](16))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", framePayloads.map(j => chunk("00dc", j)).reduce(_ ++ _))
    val body = ascii("AVI ") ++ hdrl ++ movi
    ascii("RIFF") ++ leU32(body.length.toLong) ++ body
  }

  /** Little-endian TIFF: header + one IFD with one strip. */
  def tiff(): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(bytes(0x49, 0x49, 0x2a, 0x00)) // II*\0
    out.write(leU32(8)) // first IFD at offset 8
    // IFD: 3 entries
    out.write(leU16(3))
    // entry: ImageWidth (256), SHORT, count 1, value 4
    out.write(leU16(256)); out.write(leU16(3)); out.write(leU32(1)); out.write(leU16(4)); out.write(leU16(0))
    // entry: StripOffsets (273), LONG, count 1, value = 50
    out.write(leU16(273)); out.write(leU16(4)); out.write(leU32(1)); out.write(leU32(50))
    // entry: StripByteCounts (279), LONG, count 1, value = 30
    out.write(leU16(279)); out.write(leU16(4)); out.write(leU32(1)); out.write(leU32(30))
    out.write(leU32(0)) // next IFD = none
    // pad to strip offset 50, then 30 bytes of pixel data
    while (out.size() < 50) out.write(0)
    out.write(new Array[Byte](30))
    out.toByteArray // 80 bytes; max extent = 50 + 30
  }

  def leU64(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  /** Minimal single-segment EWF-E01 image over `data` (the golden-image
    * analog for the EWF reader). See [[e01Segments]].
    */
  def e01(data: Array[Byte], sectorsPerChunk: Int = 8, bytesPerSector: Int = 512,
          compressEvery: Int = 2): Array[Byte] =
    e01Segments(data, sectorsPerChunk, bytesPerSector, compressEvery, 1).head

  /** Spec-shaped EWF-E01 image over `data`, split into `segments` files:
    * per-segment header (running segment number), volume section in the
    * first segment, sectors+table sections with adler32-checksummed
    * descriptors, every `compressEvery`-th chunk zlib-compressed (the
    * rest raw with the trailing adler32), `next` terminator on non-final
    * segments and `done` on the last. `data.length` must be a multiple
    * of `bytesPerSector` (EWF media is sector-granular).
    */
  def e01Segments(data: Array[Byte], sectorsPerChunk: Int = 8, bytesPerSector: Int = 512,
                  compressEvery: Int = 2, segments: Int = 1): Seq[Array[Byte]] = {
    require(data.length % bytesPerSector == 0, "EWF media must be sector-granular")
    require(segments >= 1, "need at least one segment")
    val chunkSize = sectorsPerChunk * bytesPerSector
    val nChunks = (data.length + chunkSize - 1) / chunkSize
    require(segments <= math.max(nChunks, 1), "more segments than chunks")
    def adler(b: Array[Byte], off: Int, len: Int): Long = {
      val a = new java.util.zip.Adler32; a.update(b, off, len); a.getValue
    }
    val perSeg = (nChunks + segments - 1) / math.max(segments, 1)
    (0 until segments).map { seg =>
      val out = new ByteArrayOutputStream
      def section(tpe: String, body: Array[Byte], selfNext: Boolean = false): Unit = {
        val off = out.size().toLong
        val desc = new Array[Byte](76)
        val t = ascii(tpe)
        System.arraycopy(t, 0, desc, 0, t.length)
        System.arraycopy(leU64(if (selfNext) off else off + 76 + body.length), 0, desc, 16, 8)
        System.arraycopy(leU64(76L + body.length), 0, desc, 24, 8)
        System.arraycopy(leU32(adler(desc, 0, 72)), 0, desc, 72, 4)
        out.write(desc); out.write(body)
      }
      // segment header: signature, fields_start=1, segment number, fields_end=0
      out.write(Array(0x45, 0x56, 0x46, 0x09, 0x0d, 0x0a, 0xff, 0x00).map(_.toByte))
      out.write(1); out.write(leU16(seg + 1)); out.write(leU16(0))
      if (seg == 0) {
        // volume: chunk_count@4, sectors_per_chunk@8, bytes_per_sector@12,
        // sector_count (u64)@16 — EnCase-style 1052-byte section
        val vol = new Array[Byte](1052)
        vol(0) = 1 // media type: fixed disk
        System.arraycopy(leU32(nChunks.toLong), 0, vol, 4, 4)
        System.arraycopy(leU32(sectorsPerChunk.toLong), 0, vol, 8, 4)
        System.arraycopy(leU32(bytesPerSector.toLong), 0, vol, 12, 4)
        System.arraycopy(leU64(data.length.toLong / bytesPerSector), 0, vol, 16, 8)
        section("volume", vol)
      }
      // this segment's contiguous chunk slice
      val firstChunk = seg * perSeg
      val lastChunk = math.min(nChunks, firstChunk + perSeg)
      val payloads = (firstChunk until lastChunk).map { i =>
        val logical = math.min(chunkSize, data.length - i * chunkSize)
        val chunk = java.util.Arrays.copyOfRange(data, i * chunkSize, i * chunkSize + logical)
        val compressed = compressEvery > 0 && i % compressEvery == 0
        val stored =
          if (compressed) {
            val d = new java.util.zip.Deflater()
            d.setInput(chunk); d.finish()
            val buf = new Array[Byte](chunk.length + 64)
            val n = d.deflate(buf); d.end()
            java.util.Arrays.copyOf(buf, n)
          } else chunk ++ leU32(adler(chunk, 0, chunk.length))
        (stored, compressed)
      }
      val sectorsBody = new ByteArrayOutputStream
      val base = out.size().toLong + 76
      val entries = payloads.map { case (stored, compressed) =>
        val abs = base + sectorsBody.size()
        sectorsBody.write(stored)
        (abs, compressed)
      }
      section("sectors", sectorsBody.toByteArray)
      // table: u32 n, pad4, u64 base=0, pad4, u32 header-adler; entries; adler
      val tbl = new ByteArrayOutputStream
      val th = new Array[Byte](24)
      System.arraycopy(leU32(entries.length.toLong), 0, th, 0, 4)
      System.arraycopy(leU32(adler(th, 0, 20)), 0, th, 20, 4)
      tbl.write(th)
      val entBytes = new ByteArrayOutputStream
      entries.foreach { case (abs, compressed) =>
        require(abs <= 0x7fffffffL, "fixture table offsets are 31-bit")
        entBytes.write(leU32(abs | (if (compressed) 0x80000000L else 0L)))
      }
      tbl.write(entBytes.toByteArray)
      tbl.write(leU32(adler(entBytes.toByteArray, 0, entBytes.size())))
      section("table", tbl.toByteArray)
      if (seg == segments - 1) section("done", Array.emptyByteArray, selfNext = true)
      else section("next", Array.emptyByteArray, selfNext = true)
      out.toByteArray
    }
  }

  /** Surround `sample` with junk and return (evidence, offset). */
  def planted(sample: Array[Byte], before: Int = 64, after: Int = 64): (Array[Byte], Long) = {
    val out = new ByteArrayOutputStream
    val junk = Array.tabulate[Byte](before)(i => ((i * 7 + 3) % 251).toByte)
    // avoid accidental magics: zero every byte that could start a pattern
    out.write(junk.map(b => if ((b & 0xff) > 0x20) (b % 0x20).toByte else b))
    val off = out.size()
    out.write(sample)
    out.write(new Array[Byte](after))
    (out.toByteArray, off.toLong)
  }
}
