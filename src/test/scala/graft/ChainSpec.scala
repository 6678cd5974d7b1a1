package graft

import java.nio.file.Files

import graft.llm.CarvedText
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end acceptance chain over the golden slot fixture: the four
  * product mains' run bodies composed the way a real user composes them
  * — `Carve` an evidence image, bridge the carved payload store back
  * into a documents table, `Curate` it, and `Search` the curated
  * corpus. A regression anywhere in that path (scanner, walkers,
  * payload naming, text extraction, quality gate, dedup, split write,
  * tokenization, BM25) fails this one obvious test.
  */
class ChainSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-chain-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  // the Html chains carry graft_decode_* codec calls that resolve in
  // the analyzing session
  locally { graft.functions.TextFunctions.register(spark); () }

  override def afterAll(): Unit = spark.stop()

  test("Carve → carved-text bridge → Curate → Search, end to end") {
    val stride = 4096
    val nSlots = 48L
    // 1. evidence on disk: the bridge fixture's per-slot documents
    // (eml / rtf / fb2 cycling), zero-padded to the stride
    val img = Files.createTempFile("graft-chain", ".dd")
    val out = new java.io.BufferedOutputStream(Files.newOutputStream(img))
    var slot = 0L
    while (slot < nSlots) {
      val sample = graft.queries.BridgeQueries.slotSample(slot)
      out.write(sample)
      out.write(new Array[Byte](stride - sample.length))
      slot += 1
    }
    out.close()

    // 2. the Carve main's whole run body (scan → dedup → carve →
    // payload store), against the caller-owned session
    val carveOut = Files.createTempDirectory("graft-chain-carve").toString
    Carve.runJob(Array(img.toString, carveOut),
      Map("GRAFT_RUN_ID" -> "chain"), stopSession = false)

    // 3. bridge: payload store → documents table. One doc per slot,
    // typed by the slot cycle.
    val docs = CarvedText.documents(spark, s"$carveOut/carved")
      .select((col("global_start") / stride).cast("long").as("doc_id"),
        col("file_type"), col("text"))
    val byType = docs.groupBy("file_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("eml" -> 16L, "rtf" -> 16L, "fb2" -> 16L),
      s"bridge recovered $byType")
    val docsPath = Files.createTempDirectory("graft-chain-docs").toString + "/documents.parquet"
    docs.select(col("doc_id"), col("text"), lit("en").as("lang"))
      .write.parquet(docsPath)

    // 4. the Curate main's run body. Only the eml docs carry enough
    // text to clear the quality gate (the fixture's design); their
    // bodies are near-identical by construction, so the near-dup stage
    // must collapse them to a small survivor set — deterministic, but
    // pinned structurally rather than by exact count.
    val curateOut = Files.createTempDirectory("graft-chain-curate").toString
    val summary = Curate.run(spark, docsPath, None, curateOut, seed = "chain").toMap
    assert(summary("n_raw") == nSlots, s"summary $summary")
    assert(summary("n_quality") == 16L, s"summary $summary")
    assert(summary("n_deduped") >= 1L && summary("n_deduped") <= 16L, s"summary $summary")
    val corpus = spark.read.parquet(s"$curateOut/corpus")
    assert(corpus.count() == summary("n_clean"), "written corpus != n_clean")

    // 5. the Search main's run body over the CURATED corpus: a body
    // term must retrieve an eml document at rank 1
    val hits = Search.run(spark, s"$curateOut/corpus",
        Seq(Seq("fox", "dog")), k = 3)
      .collect()
    assert(hits.nonEmpty, "retrieval over the curated corpus came back empty")
    val top = hits.head
    assert(top.getLong(1) == 1L)
    assert(top.getLong(2) % 3 == 0, s"rank-1 doc ${top.getLong(2)} is not an eml slot")
    assert(top.getString(5).contains("fox"), s"rank-1 text: ${top.getString(5)}")
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("ImportWarc → Tokenize → loadVocab (crawl-archive train/serve chain)") {
    import graft.llm.TextAnalysis
    // 1. a WARC drop: two archives, one corrupt record
    def record(id: Long, payload: String, clen: Option[String] = None) =
      graft.fixtures.FixtureBytes.warcRecord(s"http://crawl/doc/$id",
        payload.getBytes("UTF-8"), contentLength = clen)
    val corpus = Seq(
      "walker walked walking talker", "talked talking walk talk",
      "walker talker walking", "walked talk walking walker",
      "talking walker talked walk")
    val drop = Files.createTempDirectory("graft-warc-chain").toFile
    def archive(name: String, recs: Seq[Array[Byte]]): Unit = {
      val out = new java.io.FileOutputStream(new java.io.File(drop, name))
      try recs.foreach(out.write) finally out.close()
    }
    archive("a.warc", corpus.take(3).zipWithIndex.map { case (t, i) =>
      record(i.toLong, t) } :+ record(90L, "broken", clen = Some("XX")))
    // archive b ships PER-RECORD-GZIP (.warc.gz — the Common Crawl
    // layout): the import must route it by magic to the gz plan
    archive("b.warc.gz", corpus.drop(3).zipWithIndex.map { case (t, i) =>
      graft.fixtures.FixtureBytes.gzMember(record(i.toLong + 3L, t)) })
    // a stray non-archive file in the drop is SKIPPED VISIBLY, not
    // silently imported or silently dropped
    archive("README.txt", Seq("not an archive".getBytes("UTF-8")))

    // 2. import: clean records land typed, the corrupt one quarantines
    val imp = Files.createTempDirectory("graft-warc-imp").toString
    val (nClean, nBad, skipped) = ImportWarc.run(spark, drop.toString, imp)
    assert(nClean === 5L && nBad === 1L)
    assert(skipped.map(new java.io.File(_).getName) === Seq("README.txt"))
    val docs = spark.read.parquet(s"$imp/documents")
      .selectExpr(
        "CAST(regexp_extract(target_uri, '/doc/([0-9]+)$', 1) AS BIGINT) AS doc_id",
        "payload_text AS text")
    val corpusDir = Files.createTempDirectory("graft-warc-corpus").toString + "/d"
    docs.write.parquet(corpusDir)

    // 3. train + persist the tokenizer artifact
    val vocabDir = Files.createTempDirectory("graft-warc-vocab").toString
    val n = Tokenize.run(spark, corpusDir, vocabDir,
      vocabSize = 16, trainer = "hard", maxPiece = 4, iters = 2)
    assert(n === 16L)

    // 4. serve: the LOADED artifact encodes exactly like the in-memory
    // trained vocabulary (the artifact is the contract, not a copy)
    val (loaded, maxPiece) = TextAnalysis.loadVocab(spark, vocabDir)
    assert(maxPiece === 4)
    val direct = TextAnalysis.unigramTrainVocab(docs, "text",
      vocabSize = 16, maxPiece = 4, iters = 2)
    def enc(v: org.apache.spark.sql.DataFrame) =
      TextAnalysis.unigramEncode(docs, "doc_id", "text", v, maxPiece = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .sortBy(x => (x._1, x._2, x._3)).toSeq
    assert(enc(loaded) === enc(direct),
      "artifact round-trip must preserve the encode bit for bit")

    // 5. the artifact contracts hold: an undersized maxPiece is
    // refused at SAVE time, a torn artifact at LOAD time
    val e1 = intercept[IllegalArgumentException] {
      TextAnalysis.saveVocab(direct,
        Files.createTempDirectory("graft-warc-v2").toString, 2, "hard")
    }
    assert(e1.getMessage.contains("maxPiece"))
    assert(new java.io.File(vocabDir, "_graft_vocab_manifest").delete())
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.loadVocab(spark, vocabDir)
    }
    assert(e2.getMessage.contains("manifest"))
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("WARC responses → httpBody → htmlToText → gopherReport (raw-crawl quality chain)") {
    import spark.implicits._
    import graft.sources.WarcCorpus
    // raw crawl captures: HTTP response messages wrapping HTML — the
    // shape a real (non-WET) WARC delivers. Doc 4 is a 404 the chain
    // must drop BEFORE the quality battery sees it.
    val texts = Seq(
      (1L, "srca", "the quick brown fox jumps over the lazy dog and keeps running onward"),
      (2L, "srca", "!!! ### $$$"),
      (3L, "srcb", "one two three four five six seven eight nine ten eleven twelve"))
    val notFound = (4L, "srcb", "page gone")
    val drop = Files.createTempDirectory("graft-respchain").toFile
    val arc = new java.io.File(drop, "r.warc.gz")
    val out = new java.io.FileOutputStream(arc)
    try (texts :+ notFound).foreach { case (id, src, t) =>
      val st = if (id == 4L) 404 else 200
      val msg = s"HTTP/1.1 $st X\r\nContent-Type: text/html\r\n\r\n" +
        s"<html><body><p>$t</p></body></html>"
      out.write(graft.fixtures.FixtureBytes.gzMember(
        graft.fixtures.FixtureBytes.warcRecord(s"http://$src/doc/$id",
          msg.getBytes("UTF-8"), warcType = "response")))
    } finally out.close()
    val msg = WarcCorpus.payloadText
    val extracted = WarcCorpus.clean(WarcCorpus.readGz(spark, arc.toString))
      .filter(graft.llm.Html.httpStatus(msg) === 200)
      .select(
        expr("CAST(regexp_extract(target_uri, '/doc/([0-9]+)$', 1) AS BIGINT)")
          .as("doc_id"),
        expr("regexp_extract(target_uri, '^http://([^/]+)/', 1)").as("source"),
        graft.llm.Html.htmlToText(graft.llm.Html.httpBody(msg)).as("text"))
    // the extraction is EXACT here: the wrapper tags become whitespace
    // and collapse away, so the chained corpus equals the original
    val got = extracted.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got === texts)
    // the quality battery runs UNCHANGED on the extracted corpus and
    // reports exactly what it reports on the in-memory original — the
    // upstream q111-q113 machinery now has raw crawl data to eat
    def report(df: org.apache.spark.sql.DataFrame) =
      graft.llm.Curation.gopherReport(df, "doc_id", "source", "text",
          minWords = 10L)
        .orderBy("source").collect().map(_.toSeq).toSeq
    assert(report(extracted) === report(texts.toDF("doc_id", "source", "text")))
  }

  test("ImportJsonl → Quality gate → SnapshotMaintainer → Diff (write-audit-publish)") {
    import spark.implicits._
    // 1. a JSONL drop with one malformed line
    val drop = Files.createTempDirectory("graft-wap-drop")
    val lines = (1L to 30L).map(i =>
      s"""{"doc_id": $i, "text": "document number $i body", "lang": "en", "source": "web"}""") :+
      """{"doc_id": 31, TRUNCATED"""
    Files.write(drop.resolve("d.jsonl"),
      scala.jdk.CollectionConverters.SeqHasAsJava(lines).asJava)
    val imp = Files.createTempDirectory("graft-wap-import").toString
    val (nClean, nBad) = ImportJsonl.run(spark, drop.toString, imp)
    assert(nClean === 30L && nBad === 1L)

    // 2. audit: the imported snapshot passes the documents contract
    // (n_chars is derived here — the manifest column the gate checks)
    val docs = spark.read.parquet(s"$imp/documents")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val audited = Files.createTempDirectory("graft-wap-docs").toString + "/d"
    docs.write.parquet(audited)
    val (report, _) = Quality.run(spark, audited,
      Files.createTempDirectory("graft-wap-q").toString)
    assert(report.filter(col("passed") === 0L).count() === 0L,
      "imported drop must pass the contract gate before publishing")

    // 3. publish: init the versioned store, then fold a CDC batch
    val store = Files.createTempDirectory("graft-wap-store").toString
    graft.streaming.SnapshotMaintainer.init(
      spark.read.parquet(audited), store)
    val changes = Seq(
      (5L, "document number 5 REVISED", "en", "web", 24L, 1L, "U"),
      (7L, "", "en", "web", 0L, 1L, "D"))
      .toDF("doc_id", "text", "lang", "source", "n_chars", "graft_seq",
        "graft_op")
    assert(graft.streaming.SnapshotMaintainer.processBatch(
      changes, 0L, store, Seq("doc_id"), "graft_seq", "graft_op") === 1L)

    // 4. the Diff main explains the publish: 1 changed, 1 removed,
    // 28 unchanged — and time travel still reads v0
    val diffOut = Files.createTempDirectory("graft-wap-diff").toString
    val summary = Diff.run(spark, s"$store/v0", s"$store/v1", diffOut)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary === Map("changed" -> 1L, "removed" -> 1L,
      "unchanged" -> 28L))
    assert(spark.read.parquet(s"$store/v0").count() === 30L)
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("crawl-loop soak: export → parse-index + discover → next manifest → repeat, replayed at every ledger") {
    // The production composition: each batch's fetch set exports as a
    // .warc.gz drop, the SAME parsed batch feeds processWarcBatch
    // (dedup + BM25 index) AND processDiscoveryBatch (frontier + next
    // fetch manifest), and the next batch fetches exactly the emitted
    // manifest. Crash injections land on three of the loop's ledger
    // lines (bm25, dedup, frontier after-ledger) plus one BEFORE-ledger
    // frontier crash with its documented recovery — across the whole
    // matrix no URL is lost, none is double-fetched, and no doc is
    // double-indexed. Synthetic web: page i links to 10+2i and 11+2i
    // within [10, 40), seeds {0, 1, 2} → batch fetch sets {0,1,2},
    // {10..15}, {30..39}, then the manifest runs dry.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("graft-soak").toString
    val (didx, bidx) = (s"$base/didx", s"$base/bidx")
    val (fdir, mdir) = (s"$base/frontier", s"$base/manifests")
    def u(i: Long) = s"https://web.example/p/$i"
    def html(i: Long): String = {
      val links = Seq(10 + 2 * i, 11 + 2 * i).filter(j => j >= 10 && j < 40)
        .map(j => s"""<a href="${u(j)}">n</a>""").mkString
      s"<html><body><p>soak page body w$i marker${i * 7}</p>$links</body></html>"
    }
    graft.llm.Dedup.buildDedupIndex(
      Seq((9000L, "seed doc alpha"), (9001L, "seed doc beta"))
        .toDF("doc_id", "text"),
      "doc_id", "text", didx, numBuckets = 2, shingleN = 3, numHashes = 8,
      rowsPerBand = 2)
    graft.llm.Retrieval.buildIndex(
      Seq((9000L, "seed doc alpha")).toDF("doc_id", "text"),
      "doc_id", "text", bidx, numBuckets = 2)
    // the frontier starts EMPTY (the zero-file keys shape): batch 0's
    // seeds are its first members
    graft.llm.Frontier.buildFrontier(Seq.empty[String].toDF("url"), "url",
      fdir, numBuckets = 2)
    val idExpr = "CAST(regexp_extract(target_uri, '/p/([0-9]+)$', 1) AS BIGINT)"

    // a crash at an INDEX sub-ledger point lands before the batch's
    // MAIN ledger line: the replay re-runs end to end and must land the
    // same docs exactly once (`expect` — the final no-double-index
    // invariant is the cross-batch proof). A crash at the FRONTIER's
    // after-ledger point is past its only ledger: the replay must be a
    // ledger no-op (-1).
    def replayAfterCrash(point: String, expect: Long)(f: => Long): Unit = {
      spark.conf.set("graft.test.crashPoint", point)
      intercept[RuntimeException] { f }
      spark.conf.set("graft.test.crashPoint", "")
      assert(f === expect, s"replay after $point must return $expect")
    }
    def index(b: Long, paths: Seq[String]): Long =
      graft.streaming.IndexIngest.processWarcBatch(
        paths.toDF("path"), b, "path", idExpr, "decode(payload, 'utf-8')",
        didx, Some(bidx), dropNear = false, warcChunkSize = 256)
    def discover(b: Long, pages: org.apache.spark.sql.DataFrame): Long =
      graft.streaming.IndexIngest.processDiscoveryBatch(
        pages, b, "url", "html", fdir, Some(mdir))

    var fetched = Vector.empty[Long]
    def runBatch(b: Long, ids: Seq[Long]): Long = {
      assert(ids.intersect(fetched).isEmpty,
        s"batch $b would double-fetch ${ids.intersect(fetched)}")
      fetched ++= ids
      val pages = ids.map(i => (u(i), html(i))).toDF("url", "html")
      val drop = s"$base/drop$b"
      assert(graft.sources.WarcCorpus.write(pages, drop, "url", "html")
        === ids.size.toLong)
      val paths = new java.io.File(drop).listFiles()
        .filter(_.getName.endsWith(".warc.gz")).map(_.toString).toSeq
      b match {
        case 0L =>
          replayAfterCrash("bm25_append_after_ledger", expect = ids.size.toLong) {
            index(b, paths) }
          // frontier BEFORE-ledger crash: keys landed but the commit
          // record didn't — documented recovery is fence-clear + rerun
          // (duplicate key files are harmless to membership); the
          // manifest overwrite makes the retry emission identical
          spark.conf.set("graft.test.crashPoint", "frontier_append_before_ledger")
          intercept[RuntimeException] { discover(b, pages) }
          spark.conf.set("graft.test.crashPoint", "")
          assert(new java.io.File(fdir, "_graft_frontier_pending").delete())
          discover(b, pages)
        case 1L =>
          // the crashed run's dedup append COMMITTED (its sub-ledger
          // line precedes the crash), so the replay's probe sees the
          // batch as already-ingested duplicates: 0 docs — and the
          // final exactly-once invariant proves nothing doubled
          replayAfterCrash("dedup_append_after_ledger", expect = 0L) {
            index(b, paths) }
          replayAfterCrash("frontier_append_after_ledger", expect = -1L) {
            discover(b, pages) }
          0L
        case _ =>
          index(b, paths)
          discover(b, pages)
      }
    }
    def manifestIds(b: Long): Seq[Long] =
      spark.read.parquet(s"$mdir/batch_id=$b").collect()
        .map(r => r.getString(0).split("/").last.toLong).toSeq.sorted

    runBatch(0L, Seq(0L, 1L, 2L))
    assert(manifestIds(0L) === (10L to 15L))
    runBatch(1L, manifestIds(0L))
    assert(manifestIds(1L) === (30L to 39L))
    val n2 = runBatch(2L, manifestIds(1L))
    assert(n2 === 0L, "the synthetic web must run dry at batch 2")
    assert(fetched.distinct.size === 19 && fetched.size === 19)

    // no URL lost: everything fetched or manifested is frontier-seen
    val known = fetched.map(u).toDF("url")
    assert(graft.llm.Frontier.probeNew(known, "url", fdir).count() === 0L,
      "every fetched URL must be frontier-seen after the soak")
    // no doc double-indexed: the common token returns exactly the 19
    // crawl pages (plus no seed — the seed text lacks it), once each.
    // "page" is whitespace-delimited in every body ("<p>soak page
    // body…" — the tag-glued "soak" is not a standalone token under
    // the index's whitespace tokenization)
    val hits = graft.llm.Retrieval.bm25TopKIndexed(spark, bidx,
        Seq(Seq("page")), k = 25)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(hits.sorted === fetched.sorted,
      s"index must hold each fetched page exactly once: $hits")
    graft.llm.CacheRegistry.releaseAll(spark)
  }
}
