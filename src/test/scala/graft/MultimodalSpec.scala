package graft

import graft.fixtures.FixtureBytes
import graft.llm.Multimodal
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Real-codec tests for the multimodal operators: the decode path must
  * read ACTUAL bitmaps through javax.imageio (dimensions, exact colors
  * for lossless formats, near-exact for JPEG), fall back to the stub
  * only for undecodable payloads, and the resize stage must scale the
  * real raster.
  */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-multimodal-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("decodeImage reads a real JPEG's actual dimensions and near-exact color") {
    val payload = FixtureBytes.solidImage("jpg", 17, 9, 0x406080)
    assert(Multimodal.sniffImageFormat(payload).contains("jpeg"))
    val m = Multimodal.decodeImage(7L, payload).get
    assert(m.width == 17 && m.height == 9 && m.format == "jpeg" && m.nPixels == 153L)
    // JPEG is lossy: a solid block survives as DC-only coefficients, so
    // the decoded mean sits within quantization error of the planted color
    assert(math.abs(m.avgR - 0x40) <= 8 && math.abs(m.avgG - 0x60) <= 8 &&
      math.abs(m.avgB - 0x80) <= 8, s"jpeg color drifted: $m")
  }

  test("decodeImage round-trips PNG, BMP and GIF dimensions; lossless colors exact") {
    for (fmt <- Seq("png", "bmp", "gif")) {
      val m = Multimodal.decodeImage(1L, FixtureBytes.solidImage(fmt, 12, 5, 0x102030)).get
      assert(m.width == 12 && m.height == 5, s"$fmt dims: $m")
    }
    // PNG and BMP are lossless: channel means equal the planted color
    for (fmt <- Seq("png", "bmp")) {
      val m = Multimodal.decodeImage(1L, FixtureBytes.solidImage(fmt, 12, 5, 0x102030)).get
      assert((m.avgR, m.avgG, m.avgB) == ((0x10, 0x20, 0x30)), s"$fmt color: $m")
    }
  }

  test("decode dispatches: real images via ImageIO, opaque payloads via the stub") {
    import spark.implicits._
    val png = FixtureBytes.solidImage("png", 21, 6, 0xaabbcc)
    val text = "not an image at all, just bytes".getBytes("UTF-8")
    // the carve fixtures' minimal JPEG sniffs as an image but has no scan
    // data — the codec rejects it and the row must fall back to the stub
    val headerOnly = FixtureBytes.jpeg()
    val media = Seq((1L, png), (2L, text), (3L, headerOnly)).toDF("id", "payload")
    val out = Multimodal.decode(spark, media, "id", "payload")
      .collect().map(m => m.id -> m).toMap
    assert(out(1L).width == 21 && out(1L).height == 6 &&
      out(1L).kind == "png" && out(1L).nFrames == 1)
    assert(out(2L).kind == "opaque" &&
      out(2L).width == ((text.head & 0xff) % 64) + 1)
    assert(out(3L).kind == "opaque", s"undecodable jpeg must fall back: ${out(3L)}")
  }

  test("decodeImages drops undecodable rows and keeps real bitmap stats") {
    import spark.implicits._
    val media = Seq(
      (10L, FixtureBytes.solidImage("png", 8, 4, 0x010203)),
      (11L, "garbage".getBytes("UTF-8"))).toDF("id", "payload")
    val out = Multimodal.decodeImages(spark, media, "id", "payload").collect()
    assert(out.map(_.id).toSeq == Seq(10L))
    assert(out.head.nPixels == 32L && (out.head.avgR, out.head.avgG, out.head.avgB) == ((1, 2, 3)))
  }

  test("resizeImages halves the real raster and preserves a solid color") {
    import spark.implicits._
    val media = Seq(
      (5L, FixtureBytes.solidImage("png", 15, 7, 0x405060)),
      (6L, FixtureBytes.solidImage("bmp", 4, 3, 0x708090))).toDF("id", "payload")
    val out = Multimodal.resizeImages(spark, media, "id", "payload", 2)
      .collect().map(r => r.id -> r).toMap
    assert(out(5L).width == 7 && out(5L).height == 3)
    assert((out(5L).avgR, out(5L).avgG, out(5L).avgB) == ((0x40, 0x50, 0x60)))
    assert(out(6L).width == 2 && out(6L).height == 1)
    assert((out(6L).avgR, out(6L).avgG, out(6L).avgB) == ((0x70, 0x80, 0x90)))
  }

  test("embedImages derives the documented k/256-exact components from real pixels") {
    import spark.implicits._
    val media = Seq((9L, FixtureBytes.solidImage("png", 10, 6, 0x203040))).toDF("id", "payload")
    val out = Multimodal.embedImages(spark, media, "id", "payload").collect()
    assert(out.length == 1)
    val e = out.head.embedding
    val want = Array(
      0x20 / 256.0 - 0.5, 0x30 / 256.0 - 0.5, 0x40 / 256.0 - 0.5,
      10 / 256.0, 6 / 256.0, (10 * 6 % 256) / 256.0,
      ((0x20 + 0x30 + 0x40) % 256) / 256.0 - 0.5, (9 % 256) / 256.0 - 0.5
    ).map(_.toFloat)
    assert(e.toSeq == want.toSeq, s"embedding off: ${e.toSeq} vs ${want.toSeq}")
  }

  test("mjpegAvi builds a container whose RIFF walk recovers every real JPEG frame") {
    val frames = Seq((12, 8, 0xff0000), (12, 8, 0x00ff00), (12, 8, 0x0000ff))
    val avi = FixtureBytes.mjpegAvi(frames)
    assert(Multimodal.isAvi(avi))
    val payloads = Multimodal.aviFramePayloads(avi)
    assert(payloads.length == 3, s"expected 3 movi frames, got ${payloads.length}")
    payloads.zip(frames).foreach { case (bytes, (w, h, _)) =>
      assert(Multimodal.sniffImageFormat(bytes).contains("jpeg"),
        "movi chunk body is not a JPEG")
      val m = Multimodal.decodeImage(0L, bytes).get
      assert(m.width == w && m.height == h, s"frame decoded ${m.width}x${m.height}")
    }
    // dominant channel survives JPEG quantization on solid frames
    val reds = Multimodal.decodeImage(0L, payloads(0)).get
    assert(reds.avgR > 200 && reds.avgG < 60 && reds.avgB < 60,
      s"red frame decoded to ($reds)")
  }

  test("sampleAviFrames decodes every stride-th frame; junk payloads drop") {
    import spark.implicits._
    val media = Seq(
      (1L, FixtureBytes.mjpegAvi(Seq((8, 6, 0x102030), (8, 6, 0x405060),
        (8, 6, 0x708090), (8, 6, 0xa0b0c0), (8, 6, 0xd0e0f0)))),
      (2L, FixtureBytes.mjpegAvi(Seq((10, 4, 0x111111)))),
      (3L, "not a video at all".getBytes("UTF-8")),
      (4L, FixtureBytes.avi()) // RIFF-AVI shell with no movi frames
    ).toDF("id", "payload")
    val out = Multimodal.sampleAviFrames(spark, media, "id", "payload", stride = 2)
      .collect().map(f => (f.id, f.frame_idx, f.width, f.height)).sorted.toSeq
    assert(out == Seq((1L, 0L, 8, 6), (1L, 2L, 8, 6), (1L, 4L, 8, 6), (2L, 0L, 10, 4)))
  }

  test("decodeWavSamples round-trips a pcmWav byte-exactly; rejects non-PCM") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 7)
    val wav = FixtureBytes.pcmWav(16000, 2, samples)
    assert(Multimodal.isWav(wav))
    val (rate, ch, got) = Multimodal.decodeWavSamples(wav).get
    assert(rate == 16000 && ch == 2)
    assert(got.toSeq == samples.toSeq)
    // fmt-less shell (the carve fixture) and non-WAV bytes must both reject
    assert(Multimodal.decodeWavSamples(FixtureBytes.wav()).isEmpty)
    assert(Multimodal.decodeWavSamples("not audio".getBytes("UTF-8")).isEmpty)
  }

  test("decodeAudio computes integer-exact clip features; junk rows drop") {
    import spark.implicits._
    val s1 = Array[Short](3, -4, 5)
    val media = Seq(
      (1L, FixtureBytes.pcmWav(8000, 1, s1)),
      (2L, "garbage".getBytes("UTF-8"))).toDF("id", "payload")
    val out = Multimodal.decodeAudio(spark, media, "id", "payload").collect()
    assert(out.map(_.id).toSeq == Seq(1L))
    val m = out.head
    assert(m.sampleRate == 8000 && m.channels == 1 && m.nSamples == 3L)
    assert(m.sumAmp == 4L && m.sumSq == 50L && m.maxAbs == 5)
  }

  test("audioFrameEnergy windows the sample stream, keeping the partial tail") {
    import spark.implicits._
    // 5 samples at frameLen=2: frames (2, 2, 1)
    val media = Seq((9L, FixtureBytes.pcmWav(8000, 1,
      Array[Short](1, 2, 3, 4, 5)))).toDF("id", "payload")
    val out = Multimodal.audioFrameEnergy(spark, media, "id", "payload", frameLen = 2)
      .collect().map(f => (f.frameId, f.nInFrame, f.energy)).sorted.toSeq
    assert(out == Seq((0L, 2L, 5L), (1L, 2L, 25L), (2L, 1L, 25L)))
  }

  test("aviFramePayloads salvages a truncated container instead of throwing") {
    val full = FixtureBytes.mjpegAvi(Seq((8, 6, 0x123456), (8, 6, 0x654321)))
    // cut inside the second frame's chunk body
    val cut = java.util.Arrays.copyOf(full, full.length - 10)
    val got = Multimodal.aviFramePayloads(cut)
    assert(got.length == 1, s"expected the intact first frame only, got ${got.length}")
    assert(Multimodal.decodeImage(0L, got.head).isDefined)
  }

  /** The dHash formula computed independently from the gradient pixel
    * function (no image bytes) — what the DuckDB oracle runs.
    */
  private def expectedDhash(w: Int, h: Int, seed: Int): (Long, Long) = {
    def gray(x: Int, y: Int): Int = {
      val px = x * w / 9
      val py = y * h / 8
      (299 * ((seed + 11 * px + 23 * py) % 256) +
        587 * ((seed + 7 * px + 31 * py) % 256) +
        114 * ((seed + 13 * px + 17 * py) % 256)) / 1000
    }
    var a = 0L; var b = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (gray(x + 1, y) > gray(x, y)) {
        if (y < 4) a |= 1L << (y * 8 + x) else b |= 1L << ((y - 4) * 8 + x)
      }
    (a, b)
  }

  test("dHash through a REAL png/bmp encode-decode equals the analytic formula") {
    for ((fmt, w, h, seed) <- Seq(("png", 17, 13, 87), ("bmp", 16, 12, 203),
        ("png", 18, 12, 0))) {
      val payload = FixtureBytes.gradientImage(fmt, w, h, seed)
      val got = Multimodal.dHash(42L, payload).get
      val (ea, eb) = expectedDhash(w, h, seed)
      assert((got.dhashA, got.dhashB) == (ea, eb),
        s"$fmt $w x $h seed=$seed: got (${got.dhashA}, ${got.dhashB}), want ($ea, $eb)")
      assert(got.width == w && got.height == h)
    }
    assert(Multimodal.dHash(1L, Array[Byte](1, 2, 3)).isEmpty,
      "undecodable payloads must drop")
  }

  test("audioFingerprint through a REAL WAV encode-decode equals the analytic formula") {
    def expectedFp(n: Int, seed: Long): Long = {
      val energy = new Array[Long](33)
      for (i <- 0 until n) {
        val s = ((seed + i.toLong * 104729L) % 65536L) - 32768L
        energy(((i.toLong * 33L) / n).toInt) += s * s
      }
      (0 until 32).foldLeft(0L)((acc, f) =>
        if (energy(f + 1) > energy(f)) acc | (1L << f) else acc)
    }
    for ((n, seed) <- Seq((198, 0L), (214, 7919L * 31L), (230, 5 * 7919L * 31L))) {
      val samples = Array.tabulate(n)(i =>
        (((seed + i.toLong * 104729L) % 65536L) - 32768L).toShort)
      val wav = FixtureBytes.pcmWav(8000, 1, samples)
      val got = Multimodal.audioFingerprint(9L, wav).get
      assert(got.fp == expectedFp(n, seed), s"n=$n seed=$seed")
      assert(got.nSamples == n.toLong)
    }
    // too-short clips drop (an empty frame would make the bits undefined)
    assert(Multimodal.audioFingerprint(1L,
      FixtureBytes.pcmWav(8000, 1, Array.fill(32)(5.toShort))).isEmpty)
  }

  test("fp32NearDupPairs band join is lossless vs brute force at maxHamming 3") {
    import spark.implicits._
    val media = (0L until 12L).map { id =>
      val cls = (id % 6).toInt
      val n = 198 + (cls % 3) * 16
      val seed = (cls / 3) * 7919L * 31L
      val samples = Array.tabulate(n)(i =>
        (((seed + i.toLong * 104729L) % 65536L) - 32768L).toShort)
      (id, FixtureBytes.pcmWav(8000, 1, samples))
    }.toDF("doc_id", "payload")
    val hashes = Multimodal.audioFingerprints(spark, media, "doc_id", "payload").toDF()
    val got = Multimodal.fp32NearDupPairs(hashes, "id", "fp", maxHamming = 3)
      .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect().toSeq
    val hs = hashes.as[Multimodal.AudioFp].collect().sortBy(_.id)
    val expect = (for {
      a <- hs; b <- hs if a.id < b.id
      ham = java.lang.Long.bitCount(a.fp ^ b.fp)
      if ham <= 3
    } yield (a.id, b.id, ham.toLong)).toSeq.sorted
    assert(expect.nonEmpty, "fixture must produce near-dup pairs")
    assert(got == expect)
  }

  test("fp32NearDupPairs masks sign-extended fingerprints: negative fps still pair") {
    import spark.implicits._
    // bit 31 set → sign-extended negative BIGINT when packed from an
    // Int. -16777216 vs -16777215 differ in ONE low bit; truncating
    // %/DIV banding would split their high bands apart and silently
    // drop the pair — the masked shiftrightunsigned banding must not.
    val hashes = Seq(
      (1L, 0xFF000000L | 0xFFFFFFFF00000000L), // sign-extended 0xFF000000
      (2L, 0xFF000001L | 0xFFFFFFFF00000000L), // hamming 1 from the above
      (3L, 0x00000F00L)).toDF("id", "fp")
    val got = Multimodal.fp32NearDupPairs(hashes, "id", "fp", maxHamming = 2)
      .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L)))
  }

  test("dhashNearDupPairs band join is lossless vs brute force at maxHamming 2") {
    import spark.implicits._
    // 12 images cycling 6 parameter classes (2 seeds × 3 sizes): ids i
    // and i+6 are pixel-identical → guaranteed hamming-0 pairs; cross-
    // size same-seed pairs land wherever the sampling puts them; brute
    // force is ground truth either way
    val media = (0L until 12L).map { id =>
      val cls = (id % 6).toInt
      val w = (cls % 3) + 16
      val seed = (cls / 3) * 61
      (id, FixtureBytes.gradientImage("png", w, 12, seed))
    }.toDF("doc_id", "payload")
    val hashes = Multimodal.dHashImages(spark, media, "doc_id", "payload").toDF()
    val got = Multimodal.dhashNearDupPairs(hashes, "id", maxHamming = 2)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSeq
    val hs = hashes.as[Multimodal.ImageDHash].collect().sortBy(_.id)
    val expect = (for {
      a <- hs; b <- hs if a.id < b.id
      ham = java.lang.Long.bitCount(a.dhashA ^ b.dhashA) +
        java.lang.Long.bitCount(a.dhashB ^ b.dhashB)
      if ham <= 2
    } yield (a.id, b.id, ham.toLong)).toSeq.sorted
    assert(expect.nonEmpty, "fixture must produce near-dup pairs")
    assert(got == expect)
  }

  test("videoFingerprints min-folds sampled-frame dHashes through a real AVI walk") {
    import spark.implicits._
    // 4 frames, stride 2 -> sampled j = 0, 2; lossless BMP frames keep
    // every sampled pixel (and so the analytic dHash) exact
    val seeds = Seq(40, 90, 140, 190)
    val frames = seeds.map(sd => FixtureBytes.gradientImage("bmp", 17, 13, sd))
    val media = Seq((7L, FixtureBytes.framesAvi(frames, 17, 13)),
      (8L, Array[Byte](1, 2, 3))).toDF("id", "payload")
    val got = Multimodal.videoFingerprints(spark, media, "id", "payload", stride = 2)
      .collect().toSeq
    val sampled = Seq(0, 2).map(j => expectedDhash(17, 13, seeds(j)))
    assert(got == Seq(Multimodal.VideoFp(7L, 4L, 2L,
      sampled.map(_._1).min, sampled.map(_._2).min)))
  }

  test("videoNearDupPairs band join is lossless vs brute force on fingerprint words") {
    import spark.implicits._
    // same dimension class, seed varies slowly -> planted near-dups
    val media = (1L to 24L).map { id =>
      val nf = (id % 3).toInt + 2
      val frames = (0 until nf).map(j =>
        FixtureBytes.gradientImage("bmp", 16, 12, (((id % 4) * 29).toInt + j) % 256))
      (id, FixtureBytes.framesAvi(frames, 16, 12))
    }.toDF("id", "payload")
    val fps = Multimodal.videoFingerprints(spark, media, "id", "payload", stride = 2).toDF()
    val got = Multimodal.videoNearDupPairs(fps, "id", maxHamming = 3)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSeq
    val hs = fps.as[Multimodal.VideoFp].collect().sortBy(_.id)
    val expect = (for {
      a <- hs; b <- hs if a.id < b.id
      ham = java.lang.Long.bitCount(a.fpA ^ b.fpA) +
        java.lang.Long.bitCount(a.fpB ^ b.fpB)
      if ham <= 3
    } yield (a.id, b.id, ham.toLong)).toSeq.sorted
    assert(expect.nonEmpty, "fixture must produce video near-dup pairs")
    assert(got == expect)
  }

  test("audioSilenceTrim recovers planted dead air and empties all-silent clips") {
    import spark.implicits._
    // clip 1: 4 leading + 2 trailing zero samples around voice, frame=2
    //   frames: [0,0] [v,v] [v,v] [0,0] -> voiced 1..2, trim [2,6), kept 4
    val s1 = Array[Short](0, 0, 7, -7, 9, 3, 0, 0)
    // clip 2: all silence -> trim to empty
    val s2 = Array.fill(6)(0.toShort)
    // clip 3: voice everywhere incl the partial tail frame
    val s3 = Array[Short](4, 4, 4, 4, 4)
    val media = Seq(
      (1L, FixtureBytes.pcmWav(8000, 1, s1)),
      (2L, FixtureBytes.pcmWav(8000, 1, s2)),
      (3L, FixtureBytes.pcmWav(8000, 1, s3))).toDF("id", "payload")
    val got = Multimodal.audioSilenceTrim(spark, media, "id", "payload",
        frameLen = 2, thrPerSample = 0L)
      .orderBy("id")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 8L, 4L, 1L, 2L, 2L, 6L, 4L),
      (2L, 6L, 3L, -1L, -1L, 6L, 6L, 0L),
      (3L, 5L, 3L, 0L, 2L, 0L, 5L, 5L)))
  }
}
