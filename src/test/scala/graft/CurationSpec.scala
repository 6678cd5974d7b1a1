package graft

import graft.llm.Curation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the corpus-curation operators (PII redaction,
  * repetition stats, hash sampling, sequence packing) against
  * hand-computed expectations.
  */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-curation-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("redactPii replaces emails, phones, IPs and counts each on the original text") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.b@x.io and c@y.org call +1 415 555 0001 from 10.1.2.3"),
      (2L, "nothing sensitive here"),
      (3L, "ip only 192.168.0.1 and 8.8.8.8")
    ).toDF("id", "text")
    val out = Curation.redactPii(df, "id", "text").orderBy("id").collect()
    assert(out(0).getString(1) ==
      "mail [EMAIL] and [EMAIL] call [PHONE] from [IP]")
    assert((out(0).getLong(2), out(0).getLong(3), out(0).getLong(4)) == ((2L, 1L, 1L)))
    assert(out(1).getString(1) == "nothing sensitive here")
    assert((out(1).getLong(2), out(1).getLong(3), out(1).getLong(4)) == ((0L, 0L, 0L)))
    assert(out(2).getString(1) == "ip only [IP] and [IP]")
    assert(out(2).getLong(4) == 2L)
  }

  test("repetitionStats computes word totals and the lexicographically-tied top bigram") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b c"),       // bigrams: "a b"x2, "b a", "b c" -> top ("a b", 2)
      (2L, "x y z")            // all bigrams count 1 -> tie broken to "x y"
    ).toDF("id", "text")
    val out = Curation.repetitionStats(df, "id", "text").orderBy("id").collect()
    assert((out(0).getLong(1), out(0).getLong(2)) == ((5L, 3L)))
    assert((out(0).getString(3), out(0).getLong(4)) == (("a b", 2L)))
    assert((out(1).getString(3), out(1).getLong(4)) == (("x y", 1L)))
  }

  test("hashSample is deterministic and respects per-stratum thresholds") {
    import spark.implicits._
    val df = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    def run() = Curation.hashSample(df, col("id"), col("lang"),
      Map("en" -> "10"), "80").select("id").as[Long].collect().sorted.toSeq
    val a = run()
    assert(a == run(), "same input must sample identically")
    val langs = Curation.hashSample(df, col("id"), col("lang"), Map("en" -> "10"), "80")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // en keeps ~0x10/0x100 = 6.25% of 1000; de keeps ~0x80/0x100 = 50%
    assert(langs("en") > 20 && langs("en") < 120, s"en=${langs("en")}")
    assert(langs("de") > 400 && langs("de") < 600, s"de=${langs("de")}")
  }

  test("qualityGate evaluates every rule and joins failed reasons in stable order") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over a lazy dog while of crows watch " +
        "to see in morning and evening light today"), // 21 distinct words, 6 stopwords
      (2L, "x y z"),                                              // short + stopword_poor
      (3L, "w w w w w w w w w w w w w w w w w w w w w w w w")     // dup + bigram + stopword
    ).toDF("id", "text")
    val out = Curation.qualityGate(df.select(col("id"), trim(col("text")).as("text")), "id", "text")
      .orderBy("id").select("reasons", "keep").as[(String, Boolean)].collect().toSeq
    assert(out(0) == ("" -> true))
    // 3 words: too_short; any bigram covers >1/8 of 3 words; no stopwords
    assert(out(1) == ("too_short,bigram_repeat,stopword_poor" -> false))
    // 24 identical words: every repetition rule, but not too_short
    assert(out(2) == ("high_dup,bigram_repeat,stopword_poor" -> false))
    // NULL text must be flagged, not silently kept (null comparisons
    // feed concat_ws, which skips them); 1-word docs have no bigram so
    // bigram_repeat cannot fire spuriously
    val edge = Seq((4L, null: String), (5L, "solitary")).toDF("id", "text")
    val eo = Curation.qualityGate(edge, "id", "text")
      .orderBy("id").select("reasons", "keep").as[(String, Boolean)].collect().toSeq
    assert(eo(0)._1 == "null_text" && !eo(0)._2)
    assert(!eo(1)._1.contains("bigram_repeat") && !eo(1)._2) // too_short etc., no bigram flag
  }

  test("topNgrams counts across documents with deterministic tie-break") {
    import spark.implicits._
    val df = Seq("a b a b", "a b c", "z").toDF("text")
    val out = Curation.topNgrams(df, "text", 2, 3)
      .as[(String, Long)].collect().toSeq
    // "a b" x3 (twice in doc1, once in doc2); then "b a" and "b c" tie at 1 -> asc
    assert(out == Seq("a b" -> 3L, "b a" -> 1L, "b c" -> 1L))
  }

  test("connectedComponents labels chains, cliques, and isolated pairs with the min id") {
    import spark.implicits._
    // chain 1-2-3-4-5, clique {10,11,12}, pair {20,21}, bridge 5-10
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L),
      (5L, 10L)
    ).toDF("a", "b")
    val want = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 1L, 11L -> 1L, 12L -> 1L, 20L -> 20L, 21L -> 20L)
    // driver union-find path (small graph) and distributed min-label
    // propagation path (threshold 0) must produce identical labels
    val out = graft.llm.Dedup.connectedComponents(edges, "a", "b")
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(out == want)
    val dist = graft.llm.Dedup.connectedComponents(edges, "a", "b", smallGraphThreshold = 0L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(dist == want)
  }

  test("connectedComponents contraction: near-clique and path graphs, all cutoff regimes") {
    import spark.implicits._
    // near-clique blowup (the dedup mega-cluster shape: 50 nodes, all
    // pairs = 1225 edges) + a 60-node path (the contraction-adversarial
    // shape: partition-local union-find barely shrinks it) + a far loner
    // pair; labels must agree across the driver path, the
    // contraction→driver path, and the contraction→propagation path
    val clique = for (i <- 1 to 50; j <- (i + 1) to 50) yield (i.toLong, j.toLong)
    val path = (100 until 159).map(i => (i.toLong, i.toLong + 1))
    val edges = (clique ++ path ++ Seq((1000L, 1001L))).toDF("a", "b")
    def run(cutoff: Long) =
      graft.llm.Dedup.connectedComponents(edges, "a", "b", smallGraphThreshold = cutoff)
        .orderBy("id").as[(Long, Long)].collect().toSeq
    val driver = run(10000L) // pure driver union-find, no contraction
    assert(driver.filter(_._1 <= 50L).forall(_._2 == 1L))
    assert(driver.filter(p => p._1 >= 100L && p._1 <= 159L).forall(_._2 == 100L))
    assert(driver.filter(_._1 >= 1000L).forall(_._2 == 1000L))
    // cutoff below the edge count but above the contracted size:
    // contraction rounds land it on the driver
    assert(run(600L) == driver)
    // cutoff 0: contraction can never reach the driver; the label
    // propagation fallback runs on the contracted graph
    assert(run(0L) == driver)
  }

  test("lshCandidatePairs hot-band cap bounds a degenerate bucket's candidates") {
    import spark.implicits._
    // adversarial corpus: 30 docs share one boilerplate text (one band
    // bucket of 30 → 435 pairs), plus one genuine near-dup pair
    val docs = ((1L to 30L).map(i => (i, "the same boilerplate text everywhere")) ++
      Seq((100L, "alpha beta gamma delta epsilon zeta"),
          (101L, "alpha beta gamma delta epsilon zeta"))).toDF("doc_id", "text")
    val sh = graft.llm.Dedup.shingles(docs, "doc_id", "text", 3)
    val bands = graft.llm.Dedup.bandKeys(
      graft.llm.Dedup.minHashSignatures(sh, 8), rowsPerBand = 2)
    val uncapped = graft.llm.Dedup.lshCandidatePairs(bands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size == 30 * 29 / 2 + 1, s"expected 436 pairs, got ${uncapped.size}")
    // cap 10: the 30-member boilerplate buckets drop whole, the genuine
    // 2-member buckets survive untouched
    val capped = graft.llm.Dedup.lshCandidatePairs(bands, maxBandMembers = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)), s"cap should keep only the genuine pair: $capped")
    // degenerate cap rejected
    intercept[IllegalArgumentException] {
      graft.llm.Dedup.lshCandidatePairs(bands, maxBandMembers = Some(1))
    }
    graft.llm.CacheRegistry.releaseAll(spark) // capped path persists its frame
  }

  test("quantizeInt8 scales to max|x| and zero vectors quantize to zeros") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, -2.0f, 0.5f)),
      (2L, Seq(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = graft.llm.Similarity.quantizeInt8(df, "vec_id", "embedding")
      .orderBy("id").select("l2_norm", "scale", "q8")
      .as[(Double, Double, String)].collect().toSeq
    // scale 2.0; round(63.5)=64 (half-up), -127, round(31.75)=32
    assert(out(0) == ((2.2913, 2.0, "64,-127,32")))
    assert(out(1) == ((0.0, 0.0, "0,0,0")))
  }

  test("concatChunk matches the unpartitioned-window replica and is partition-invariant") {
    import spark.implicits._
    // 30 docs, token counts 1..13 cycling — several seqLen=16 boundary
    // crossings, one doc spanning >1 full sequence
    val docs = (0L until 30L).map(i => (i, i % 13 + 1)).toDF("doc_id", "toks")
    def run(parts: Int) =
      Curation.concatChunk(docs, "doc_id", "toks", seqLen = 16L,
          seed = "s1", numParts = parts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .sortBy(x => (x._1, x._3)).toSeq
    val got = run(4)
    // ---- driver replica: md5 shuffle order, a plain running sum, the
    // same segment arithmetic — what a single-box window would compute
    def sk(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"s1:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(6).map("%02x".format(_)).mkString, 16)
    }
    val ordered = (0L until 30L).map(i => (i, i % 13 + 1)).sortBy(x => (sk(x._1), x._1))
    var s = 0L
    val want = ordered.flatMap { case (id, toks) =>
      val segs = (s / 16 to (s + toks - 1) / 16).map { k =>
        val lo = math.max(s, k * 16); val hi = math.min(s + toks, (k + 1) * 16)
        (k, id, lo - k * 16, lo - s, hi - lo)
      }
      s += toks
      segs
    }.sortBy(x => (x._1, x._3)).toSeq
    assert(got === want, "two-phase prefix sum must equal the window layout")
    // partition-invariance: the offsets must not depend on the plan
    assert(run(1) === got && run(7) === got)
    // structural properties: segments tile each sequence end to end
    // (full 16 slots except the global tail), and every doc's segments
    // reassemble it exactly
    val total = ordered.map(_._2).sum
    got.groupBy(_._1).foreach { case (seqId, segs) =>
      val sorted = segs.sortBy(_._3)
      assert(sorted.head._3 === 0L)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 + a._5 === b._3); case _ =>
      }
      val filled = sorted.last._3 + sorted.last._5
      if (seqId < (total - 1) / 16) assert(filled === 16L)
      else assert(filled === total - seqId * 16)
    }
    got.groupBy(_._2).foreach { case (id, segs) =>
      val inOrder = segs.sortBy(_._4)
      assert(inOrder.head._4 === 0L)
      assert(inOrder.map(_._5).sum === id % 13 + 1)
    }
    // zero-token docs are skipped, not zero-length segments
    val withEmpty = docs.union(Seq((99L, 0L)).toDF("doc_id", "toks"))
    val g2 = Curation.concatChunk(withEmpty, "doc_id", "toks", 16L, "s1")
      .collect()
    assert(!g2.exists(_.getLong(1) == 99L))
  }

  test("packGreedy fills bins sequentially, oversized docs get their own bin") {
    import spark.implicits._
    val df = Seq(
      ("en", 1L, 300L), ("en", 2L, 150L), // bin 0 (fill 450)
      ("en", 3L, 100L),                   // 450+100>500 -> bin 1
      ("en", 4L, 900L),                   // oversized -> bin 2 alone
      ("en", 5L, 10L),                    // 900+10>500 -> bin 3
      ("de", 6L, 500L),                   // exact fit -> bin 0
      ("de", 7L, 1L)                      // 500+1>500 -> bin 1
    ).toDF("lang", "doc_id", "toks")
    val out = Curation.packGreedy(df, "lang", "doc_id", "toks", 500L)
      .orderBy("lang", "doc_id")
      .select("lang", "doc_id", "bin", "fill_after")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("de", 6L, 0L, 500L), ("de", 7L, 1L, 1L),
      ("en", 1L, 0L, 300L), ("en", 2L, 0L, 450L), ("en", 3L, 1L, 100L),
      ("en", 4L, 2L, 900L), ("en", 5L, 3L, 10L)))
  }
  test("assignSplit is disjoint, exhaustive, deterministic, and near the requested proportions") {
    import spark.implicits._
    val docs = (1L to 2000L).toDF("doc_id")
    val out = graft.llm.Curation.assignSplit(docs, "doc_id", "s1", 80, 10)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(out.length == 2000 && out.map(_._1).distinct.length == 2000)
    val byS = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byS.keySet == Set("train", "val", "test"))
    // md5 buckets: expect 80/10/10 within a few percent at n=2000
    assert(math.abs(byS("train") - 1600) < 100, s"train ${byS("train")}")
    assert(math.abs(byS("val") - 200) < 60, s"val ${byS("val")}")
    assert(math.abs(byS("test") - 200) < 60, s"test ${byS("test")}")
    // deterministic: same seed -> same assignment; new seed -> different
    val again = graft.llm.Curation.assignSplit(docs, "doc_id", "s1", 80, 10)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
    val other = graft.llm.Curation.assignSplit(docs, "doc_id", "s2", 80, 10)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(!out.sortBy(_._1).sameElements(other.sortBy(_._1)))
  }

  test("shuffleKey reorders uniformly and replays exactly") {
    import spark.implicits._
    val docs = (1L to 500L).toDF("doc_id")
    def order(seed: String) = graft.llm.Curation.shuffleKey(docs, "doc_id", seed)
      .orderBy("shuffle_key", "doc_id").collect().map(_.getLong(0)).toSeq
    val e1 = order("epoch1")
    assert(e1.toSet == (1L to 500L).toSet)
    assert(e1 != (1L to 500L).toSeq, "shuffle left the corpus in id order")
    assert(order("epoch1") == e1, "same seed must replay the exact order")
    assert(order("epoch2") != e1, "different seed must give a different order")
  }

  test("normalizeText lowercases ASCII, strips control chars, collapses and trims spaces") {
    import spark.implicits._
    val df = Seq(
      (1L, "  Hello\tWORLD  x  "),
      (2L, "already clean"),
      (3L, "A\u0000B\u007fC"),
      (4L, "")).toDF("doc_id", "text")
    val out = graft.llm.Curation.normalizeText(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(out(1L) == (("hello world x", 13L)))
    assert(out(2L) == (("already clean", 13L)))
    assert(out(3L) == (("a b c", 5L)))
    assert(out(4L) == (("", 0L)))
  }

  test("segmentDedup keeps first occurrences in (doc, position) order and reassembles") {
    import spark.implicits._
    // 2-word segments: doc 1 = [a b][c d], doc 2 = [c d][a b][e f] (both
    // earlier segments repeat), doc 3 = [a b] only (fully deduped),
    // doc 4 = odd tail segment [g].
    val df = Seq(
      (1L, "a b c d"),
      (2L, "c d a b e f"),
      (3L, "a b"),
      (4L, "e f g")).toDF("doc_id", "text")
    val out = graft.llm.Dedup.segmentDedup(df, "doc_id", "text", 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), Option(r.getString(3)))))
      .toMap
    assert(out(1L) == ((2L, 2L, Some("a b c d"))))
    assert(out(2L) == ((3L, 1L, Some("e f"))))
    assert(out(3L) == ((1L, 0L, None)))
    // "e f" was first seen at doc 2 position 2, so doc 4 keeps only "g".
    assert(out(4L) == ((2L, 1L, Some("g"))))
  }

  test("crossGroupSegmentOverlap counts distinct shared segments per source pair") {
    import spark.implicits._
    // 2-word segments: a={w1 w2}, b={w1 w2, x1 x2} (the repeat inside b
    // dedups per-doc), c={w1 w2, x1 x2} → (a,b)=1, (a,c)=1, (b,c)=2.
    val df = Seq(
      ("a", "w1 w2"),
      ("b", "w1 w2"),
      ("b", "x1 x2 x1 x2"),
      ("c", "w1 w2 x1 x2")).toDF("source", "text")
    val out = graft.llm.Dedup.crossGroupSegmentOverlap(df, "source", "text", 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("a", "b") -> 1L, ("a", "c") -> 1L, ("b", "c") -> 2L))
  }

  test("frequencySpectrum counts distinct tokens per occurrence count") {
    import spark.implicits._
    // a×3, b×2, c×2, d×1 → spectrum {1→1, 2→2, 3→1}; empty tokens from
    // double spaces are dropped.
    val df = Seq((1L, "a a b  c"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = graft.llm.Profiling.frequencySpectrum(df, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("largestRemainderSample hits the exact total with Hare apportionment") {
    import spark.implicits._
    // sizes 3 and 2, total 3: floors (9//5, 6//5) = (1, 1), remainders
    // (4, 1) → the one leftover slot goes to s1 → quotas (2, 1).
    val docs = Seq((1L, "s1"), (2L, "s1"), (3L, "s1"), (4L, "s2"), (5L, "s2"))
      .toDF("doc_id", "source")
    def hash12(seed: String, id: Long): Long =
      java.lang.Long.parseLong(java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$id".getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString, 16)
    def takeK(ids: Seq[Long], k: Int): Seq[Long] =
      ids.sortBy(id => (hash12("z", id), id)).take(k)
    val expect = (takeK(Seq(1L, 2L, 3L), 2) ++ takeK(Seq(4L, 5L), 1)).sorted
    val got = graft.llm.Curation.largestRemainderSample(docs, "doc_id", "source",
        total = 3L, seed = "z")
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == expect)
  }

  test("largestRemainderSample keeps a NULL stratum and fails loudly when total > N") {
    import spark.implicits._
    val docs = Seq((1L, Some("s1")), (2L, Some("s1")), (3L, None), (4L, None))
      .toDF("doc_id", "source")
    // null stratum holds half the mass -> gets half the quota
    val got = graft.llm.Curation.largestRemainderSample(docs, "doc_id", "source",
        total = 2L, seed = "n")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(got.length == 2)
    assert(got.count(_._2.isEmpty) == 1 && got.count(_._2.contains("s1")) == 1)
    // total beyond the population must raise, not silently undershoot
    val e = intercept[Exception] {
      graft.llm.Curation.largestRemainderSample(docs, "doc_id", "source",
        total = 9L, seed = "n").collect()
    }
    assert(e.getMessage.contains("largestRemainderSample") ||
      Option(e.getCause).exists(_.getMessage.contains("largestRemainderSample")))
  }

  test("largestRemainderSample overselect pre-filter returns the identical sample") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    val exact = graft.llm.Curation.largestRemainderSample(docs, "doc_id", "source",
        total = 12L, seed = "os")
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val fast = graft.llm.Curation.largestRemainderSample(docs, "doc_id", "source",
        total = 12L, seed = "os", overselect = 3.0)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(exact.size == 12 && fast == exact)
  }

  test("greedyCover picks max-gain docs, ties to lowest id, cumulative coverage exact") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c"),
      (1L, "a b"),
      (2L, "c d e f"),
      (3L, "f g")).toDF("doc_id", "text")
    val got = Curation.greedyCover(docs, "doc_id", "text", k = 3)
      .orderBy("pick_rank").as[(Long, Long, Long, Long)].collect().toSeq
    // pick1: d2 covers {c,d,e,f} (gain 4); pick2: d0 and d1 both add
    // {a,b} (gain 2) → lowest id d0; pick3: only g left → d3 gain 1
    assert(got == Seq((1L, 2L, 4L, 4L), (2L, 0L, 2L, 6L), (3L, 3L, 1L, 7L)))
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("greedyCover stops when documents run out and keeps zero-gain picks") {
    import spark.implicits._
    val docs = Seq((5L, "x y"), (7L, "x y"), (9L, "x")).toDF("doc_id", "text")
    val got = Curation.greedyCover(docs, "doc_id", "text", k = 10)
      .orderBy("pick_rank").as[(Long, Long, Long, Long)].collect().toSeq
    // d5 covers everything; d7/d9 add nothing but remain pickable at
    // gain 0 (lowest id first); then the corpus is exhausted at 3 < k
    assert(got == Seq((1L, 5L, 2L, 2L), (2L, 7L, 0L, 2L), (3L, 9L, 0L, 2L)))
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("paddingWaste buckets to the smallest fit and measures pad share exactly") {
    import spark.implicits._
    // lens: 3,4 -> bucket 4; 5 -> bucket 8; 20 -> overflow (-1, no pad)
    val docs = Seq(3L, 4L, 5L, 20L).toDF("n")
    val got = Curation.paddingWaste(docs, "n", Seq(4L, 8L))
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // bucket 4: 2 docs, 7 real, 8 padded -> waste 1/8 = 1250 bp
    // bucket 8: 1 doc, 5 real, 8 padded -> waste 3/8 = 3750 bp
    // overflow: padded = real -> 0 bp
    assert(got == Seq(
      (-1L, 1L, 20L, 20L, 0L),
      (4L, 2L, 7L, 8L, 1250L),
      (8L, 1L, 5L, 8L, 3750L)))
  }

  test("paddingWaste rejects an unsorted or non-positive bucket ladder") {
    import spark.implicits._
    val docs = Seq(3L).toDF("n")
    intercept[IllegalArgumentException] {
      Curation.paddingWaste(docs, "n", Seq(8L, 4L))
    }
    intercept[IllegalArgumentException] {
      Curation.paddingWaste(docs, "n", Seq(0L, 4L))
    }
  }

  test("aucFromScores: perfect, inverted, tied, and single-class orderings") {
    import spark.implicits._
    def auc(rows: Seq[(Long, Long)]): (Long, Long, Long) =
      Curation.aucFromScores(rows.toDF("score", "label"), "score", "label")
        .as[(Long, Long, Long)].collect().head
    // perfect separation -> AUC 1.0
    assert(auc(Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L))) == (2L, 2L, 10000L))
    // perfectly inverted -> AUC 0.0
    assert(auc(Seq((4L, 0L), (3L, 0L), (2L, 1L), (1L, 1L))) == (2L, 2L, 0L))
    // all scores tied -> midranks make AUC exactly 0.5
    assert(auc(Seq((7L, 0L), (7L, 1L), (7L, 0L), (7L, 1L))) == (2L, 2L, 5000L))
    // one positive between two negatives: U = 1 of 2 -> 0.5
    assert(auc(Seq((1L, 0L), (2L, 1L), (3L, 0L))) == (1L, 2L, 5000L))
    // single-class degenerate -> -1 sentinel
    assert(auc(Seq((1L, 1L), (2L, 1L))) == (2L, 0L, -1L))
  }

  test("hardNegatives: same-bucket, dup-free, deterministic, at most k per anchor") {
    import spark.implicits._
    val docs = ((1L to 12L).map(i => (i, s"text $i", s"b${i % 2}")) ++
      Seq((20L, "text 1", "b1"))) // exact dup of doc 1's content, same bucket
      .toDF("doc_id", "text", "lang")
    val content = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bucket = docs.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val got = Curation.hardNegatives(docs, "doc_id", "text", "lang", k = 3)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (a, b, _, n) =>
      assert(a != n, s"self-negative $a")
      assert(bucket(a) == b && bucket(n) == b, s"cross-bucket pair $a/$n")
      assert(content(a) != content(n), s"exact dup leaked as negative: $a/$n")
    }
    assert(got.groupBy(_._1).values.forall(_.size <= 3))
    val again = Curation.hardNegatives(docs, "doc_id", "text", "lang", k = 3)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got.sorted == again.sorted)
    // a bucket of identical content yields no negatives at all
    val same = Seq((1L, "x", "b"), (2L, "x", "b"), (3L, "x", "b")).toDF("doc_id", "text", "lang")
    assert(Curation.hardNegatives(same, "doc_id", "text", "lang", k = 2).count() == 0L)
  }

  test("temperatureMixture: isqrt weights, largest-remainder allocation sums to budget") {
    import spark.implicits._
    val docs = Seq(("A", 100L), ("B", 25L), ("C", 1L)).toDF("source", "toks")
    val got = Curation.temperatureMixture(docs, "source", "toks", budget = 33L)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // weights 10,5,1 (tw=16); bases 20,10,2; A wins the leftover token
    assert(got == Seq(
      ("A", 100L, 10L, 6250L, 21L),
      ("B", 25L, 5L, 3125L, 10L),
      ("C", 1L, 1L, 625L, 2L)))
    assert(got.map(_._5).sum == 33L)
  }

  test("temperatureMixture: all-zero-weight corpus degenerates to the documented no-op plan") {
    import spark.implicits._
    // every source empty (incl. a NULL token count, which coalesces to
    // 0): weights all 0, so the plan sums to min(|sources|, budget) —
    // one remainder token to each of the first `budget` sources in
    // name order — not to the budget (the docstring's carve-out)
    val docs = Seq(("A", Some(0L)), ("B", None), ("C", Some(0L)))
      .toDF("source", "toks")
    val got = Curation.temperatureMixture(docs, "source", "toks", budget = 2L)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 0L, 0L, 0L, 1L),
      ("B", 0L, 0L, 0L, 1L),
      ("C", 0L, 0L, 0L, 0L)), s"got $got")
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("shardPlan cuts each source at start offsets and reports fill vs budget") {
    import spark.implicits._
    val docs = Seq(
      ("A", 1L, 3L), ("A", 2L, 4L), ("A", 3L, 2L), // starts 0,3,7 -> shards 0,0,1
      ("B", 10L, 6L)                               // start 0 -> shard 0 (overfull)
    ).toDF("source", "doc_id", "toks")
    val got = Curation.shardPlan(docs, "source", "doc_id", "toks", 5L)
      .orderBy("source", "shard_ix")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 0L, 2L, 7L, 1L, 2L, 14000L),
      ("A", 1L, 1L, 2L, 3L, 3L, 4000L),
      ("B", 0L, 1L, 6L, 10L, 10L, 12000L)))
  }
}
