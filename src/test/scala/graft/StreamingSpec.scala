package graft

import graft.llm.{Dedup, Retrieval}
import graft.streaming.EventStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming operators driven through MemoryStream batches. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-stream-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(minute: Int) = new java.sql.Timestamp(minute * 60L * 1000)

  test("streaming sessionization emits watermark-closed gap sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val sessions = EventStreams.sessionize(
      in.toDF().toDF("user_id", "ts", "value"), gap = "30 minutes", watermark = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // user 7: events at t=0 and t=10 (one session), then t=60 (a new
      // session) — the t=100 event advances the watermark past both
      in.addData((7L, ts(0), 1.0), (7L, ts(10), 2.5))
      q.processAllAvailable()
      in.addData((7L, ts(60), 4.0))
      q.processAllAvailable()
      in.addData((7L, ts(100), 0.0))
      q.processAllAvailable()
      val done = spark.table("sess")
        .select("user_id", "n_events", "total_cents")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(done.contains((7L, 2L, 350L))) // 100 + 250 cents
      assert(done.contains((7L, 1L, 400L)))
    } finally q.stop()
  }

  test("streaming first-seen dedup drops later duplicates across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventStreams.Doc]
    val out = EventStreams.dedupFirstSeen(in.toDS(), idleTimeout = None)
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      in.addData(EventStreams.Doc("h1", 5L), EventStreams.Doc("h1", 3L), EventStreams.Doc("h2", 9L))
      q.processAllAvailable()
      in.addData(EventStreams.Doc("h1", 1L), EventStreams.Doc("h3", 7L))
      q.processAllAvailable()
      val seen = spark.table("dedup").as[EventStreams.Doc]
        .collect().map(d => d.contentHash -> d.docId).toMap
      // h1 keeps the batch-1 minimum (3), h1 in batch 2 is suppressed
      assert(seen == Map("h1" -> 3L, "h2" -> 9L, "h3" -> 7L))
    } finally q.stop()
  }

  test("streaming curation gates quality then dedups by fingerprint across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clean = "the quick brown fox jumps over a lazy dog while of crows " +
      "watch to see in morning and evening light today"
    val in = MemoryStream[(Long, String)]
    val out = graft.streaming.DocStreams.curate(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      // batch 1: one clean doc and one too-short doc
      in.addData((10L, clean), (11L, "too short"))
      q.processAllAvailable()
      // batch 2: an exact duplicate of the clean doc (same fingerprint)
      // and a different clean doc
      in.addData((12L, clean), (13L, clean.replace("today", "tomorrow")))
      q.processAllAvailable()
      val kept = spark.table("curated").as[EventStreams.Doc]
        .collect().map(_.docId).toSet
      assert(kept == Set(10L, 13L), s"got $kept")
    } finally q.stop()
  }

  test("gopher rule batteries run on a stream unchanged (narrow expression pipelines)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clean = "the cat and the dog have fun with all of that every single day"
    val in = MemoryStream[(Long, String)]
    val out = graft.llm.Curation.gopherRules(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", minWords = 10L)
      .select("id", "keep")
    val q = out.writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append").start()
    try {
      in.addData((1L, clean), (2L, "tiny doc"))
      q.processAllAvailable()
      val got = spark.table("gopher_stream")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 1L, 2L -> 0L), s"got $got")
    } finally q.stop()
  }

  test("hashed classifier and chunk windows run on a stream unchanged (stateless narrow ops)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val scored = graft.llm.TextAnalysis.hashedClassifier(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val chunked = graft.llm.Curation.chunkWindows(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", width = 3, stride = 2)
    val q1 = scored.writeStream.format("memory").queryName("hc_stream")
      .outputMode("append").start()
    val q2 = chunked.writeStream.format("memory").queryName("cw_stream")
      .outputMode("append").start()
    try {
      in.addData((1L, "a b c d e"))
      q1.processAllAvailable(); q2.processAllAvailable()
      // classifier emits one scored row; batch result must equal stream result
      val batchScore = graft.llm.TextAnalysis.hashedClassifier(
        Seq((1L, "a b c d e")).toDF("doc_id", "text"), "doc_id", "text")
        .collect().head.getLong(1)
      assert(spark.table("hc_stream").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        == Seq((1L, batchScore)))
      // 5 words, width 3 stride 2 -> chunks at 0 ("a b c"), 1 ("c d e")
      val chunks = spark.table("cw_stream").collect()
        .map(r => (r.getLong(1), r.getString(3))).sortBy(_._1)
      assert(chunks.toSeq == Seq((0L, "a b c"), (1L, "c d e")))
    } finally { q1.stop(); q2.stop() }
  }

  test("tumbling window counts emit watermark-closed windows with late data applied") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val out = EventStreams.tumblingTypeCounts(
      in.toDF().toDF("ts", "event_type", "value"), width = "10 minutes", watermark = "5 minutes")
    val q = out.writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    try {
      in.addData((ts(1), "click", 1.0), (ts(4), "click", 2.0), (ts(7), "view", 3.0))
      q.processAllAvailable()
      // late click at t=8 arrives within the 5-minute watermark and must
      // land in the [0,10) window; the t=30 event closes it
      in.addData((ts(8), "click", 4.0), (ts(30), "view", 0.5))
      q.processAllAvailable()
      in.addData((ts(50), "click", 0.0)) // push the watermark past [30,40)
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .select("win_start", "event_type", "n_events", "total_cents")
        .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(rows.contains((0L, "click", 3L, 700L)), s"got $rows")
      assert(rows.contains((0L, "view", 1L, 300L)), s"got $rows")
      assert(rows.contains((30L, "view", 1L, 50L)), s"got $rows")
    } finally q.stop()
  }

  test("streaming funnel advances stages across batches with batch-walk semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.{FunnelEvent, StageAdvance}
    val in = MemoryStream[FunnelEvent]
    val out = EventStreams.funnelAdvances(in.toDS(), Seq("view", "click", "purchase"))
    val q = out.writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    try {
      // u1 arrives out of order WITHIN the batch (click before view) —
      // the in-batch event-time sort still records both stages;
      // u2's click strictly precedes its view, so only the view counts
      in.addData(
        FunnelEvent(1L, 2000000L, "click"), FunnelEvent(1L, 1000000L, "view"),
        FunnelEvent(2L, 1000000L, "click"), FunnelEvent(2L, 2000000L, "view"))
      q.processAllAvailable()
      // u1 completes in a later batch; u2's second click is after its
      // view, so it advances now
      in.addData(FunnelEvent(1L, 3000000L, "purchase"), FunnelEvent(2L, 3000000L, "click"))
      q.processAllAvailable()
      val got = spark.table("funnel").as[StageAdvance].collect().toSet
      assert(got == Set(
        StageAdvance(1L, 1L, 1000000L), StageAdvance(1L, 2L, 2000000L),
        StageAdvance(1L, 3L, 3000000L),
        StageAdvance(2L, 1L, 2000000L), StageAdvance(2L, 2L, 3000000L)), s"got $got")
    } finally q.stop()
  }

  test("stream-stream interval join attributes follows within the horizon only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val buys = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val joined = EventStreams.attributeWithin(
      views.toDF().toDF("user_id", "ts", "value"),
      buys.toDF().toDF("user_id", "ts", "value"),
      "user_id", within = "15 minutes", watermark = "0 seconds")
    val q = joined.writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      // u1: view at t=60 → purchase at t=70 joins; purchase at t=100 is
      // past the 15-minute horizon. u2: purchase with no view — dropped
      // by the inner join. The purchase arrives a batch LATER than the
      // view, exercising the buffered-state path. (Timestamps sit well
      // above epoch 0: a row at exactly the initial watermark is late.)
      views.addData((1L, ts(60), 0.0))
      q.processAllAvailable()
      buys.addData((1L, ts(70), 9.5), (1L, ts(100), 3.0), (2L, ts(70), 1.0))
      q.processAllAvailable()
      val got = spark.table("attr")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getDouble(3))).toSet
      assert(got == Set((1L, ts(60), ts(70), 9.5)), s"got $got")
    } finally q.stop()
  }

  test("sliding-window distinct users chain dedup state into the windowed count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val out = EventStreams.slidingActiveUsers(
      in.toDF().toDF("user_id", "ts"),
      width = "20 minutes", slide = "10 minutes", watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sau")
      .outputMode("append").start()
    try {
      // user 1 twice inside [60,70), user 2 once at t=75; the t=200
      // event pushes the watermark far past every earlier window
      in.addData((1L, ts(61)), (1L, ts(65)), (2L, ts(75)))
      q.processAllAvailable()
      in.addData((9L, ts(200)))
      q.processAllAvailable()
      val got = spark.table("sau")
        .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(2))).toMap
      // window [50,70): u1; [60,80): u1+u2; [70,90): u2
      assert(got.get(50L).contains(1L), s"got $got")
      assert(got.get(60L).contains(2L), s"got $got")
      assert(got.get(70L).contains(1L), s"got $got")
    } finally q.stop()
  }

  test("stream-static broadcast join enriches events without stream-side state") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, col}
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((0L, "search"), (1L, "social")).toDF("src_id", "src_name")
    val in = MemoryStream[(Long, Long)] // (event_id, src_id)
    val joined = in.toDF().toDF("event_id", "src_id")
      .join(broadcast(dim), Seq("src_id"))
    val q = joined.writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    try {
      in.addData((100L, 0L), (101L, 1L), (102L, 9L)) // 9 has no dim row
      q.processAllAvailable()
      val got = spark.table("enrich")
        .collect().map(r => (r.getLong(1), r.getString(2))).toSet
      assert(got == Set((100L, "search"), (101L, "social")), s"got $got")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark keeps the first row per key across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, java.sql.Timestamp, Long)]
    val out = EventStreams.dedupWithinWatermark(
      in.toDF().toDF("content_hash", "ts", "doc_id"), "content_hash",
      watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("wmdedup")
      .outputMode("append").start()
    try {
      in.addData(("h1", ts(60), 5L), ("h2", ts(61), 9L))
      q.processAllAvailable()
      // h1 again within the watermark horizon — dropped even though it
      // arrives in a later micro-batch
      in.addData(("h1", ts(65), 1L), ("h3", ts(66), 7L))
      q.processAllAvailable()
      val got = spark.table("wmdedup")
        .collect().map(r => (r.getString(0), r.getLong(2))).toSet
      assert(got == Set(("h1", 5L), ("h2", 9L), ("h3", 7L)), s"got $got")
    } finally q.stop()
  }

  test("streaming JSONL ingest tags arriving lines clean/quarantined per micro-batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sjsonl")
    java.nio.file.Files.write(dir.resolve("drop1.jsonl"),
      java.util.Arrays.asList(
        """{"doc_id": 1, "text": "a", "lang": "en", "source": "s"}""",
        """{"broken"""))
    val q = graft.sources.JsonlCorpus.readStreamTagged(spark, dir.toString)
      .writeStream.format("memory").queryName("jsonl_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // a second drop landing later is picked up incrementally
      java.nio.file.Files.write(dir.resolve("drop2.jsonl"),
        java.util.Arrays.asList(
          """{"doc_id": 2, "text": "b", "lang": "de", "source": "s"}"""))
      q.processAllAvailable()
      val got = spark.table("jsonl_stream")
        .collect().map(r => (r.getAs[Any]("doc_id"), r.getAs[String]("ingest_status")))
        .toSet
      assert(got == Set((1L, "clean"), (2L, "clean"), (null, "quarantined")),
        s"got $got")
    } finally q.stop()
  }

  test("skew monitor surfaces an injected hot key per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-skewmon").toString
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.SkewMonitor.monitor(
        in.toDF().toDF("id", "join_key"), "join_key", topN = 2, out)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-skewmon-ck").toString)
      .start()
    try {
      // batch 0: balanced keys — no dominant entry
      in.addData((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      q.processAllAvailable()
      // batch 1: key "hot" floods in (6 of 8 rows) plus a NULL key row
      in.addData((5L, "hot"), (6L, "hot"), (7L, "hot"), (8L, "hot"),
        (9L, "hot"), (10L, "hot"), (11L, null), (12L, "b"))
      q.processAllAvailable()
      val got = spark.read.parquet(out)
        .orderBy("batch_id", "rank")
        .collect().map(r => (r.getLong(4), r.getLong(3), r.getString(0),
          r.getLong(1), r.getLong(2))).toSeq
      val byBatch = got.groupBy(_._1)
      // batch 0: top-2 of four singleton keys, share 2500 bp each
      assert(byBatch(0L) == Seq((0L, 1L, "a", 1L, 2500L), (0L, 2L, "b", 1L, 2500L)),
        s"batch 0: $got")
      // batch 1: the injected hot key dominates at 7500 bp; the NULL
      // key surfaces as the literal "(null)" bucket in the tail
      assert(byBatch(1L).head == ((1L, 1L, "hot", 6L, 7500L)), s"batch 1: $got")
      assert(byBatch(1L)(1) == ((1L, 2L, "(null)", 1L, 1250L)), s"batch 1: $got")
    } finally q.stop()
  }

  test("dedupAgainstReference drops reference-known content per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq((100L, "known text"), (101L, "other known")).toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val out = graft.streaming.DocStreams.dedupAgainstReference(
      in.toDF().toDF("doc_id", "text"), ref, "text", "text")
    val q = out.writeStream.format("memory").queryName("refdedup")
      .outputMode("append").start()
    try {
      in.addData((1L, "known text"), (2L, "novel one"))
      q.processAllAvailable()
      // the stream-side dup is dropped; the novel doc passes
      in.addData((3L, "other known"), (4L, "novel two"))
      q.processAllAvailable()
      val got = spark.table("refdedup")
        .collect().map(_.getLong(0)).toSet
      assert(got == Set(2L, 4L), s"got $got")
    } finally q.stop()
  }

  test("streaming index ingest dedups against and appends to the persisted indexes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toFile
    dir.deleteOnExit()
    val (didx, bidx, ck) = (s"$dir/didx", s"$dir/bidx", s"$dir/ck")
    // seed corpus: both indexes pre-built, retrieval queryable from t0
    val seed = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "one two three four five six")).toDF("doc_id", "text")
    graft.llm.Dedup.buildDedupIndex(seed, "doc_id", "text", didx,
      numBuckets = 4, shingleN = 3, numHashes = 8, rowsPerBand = 2)
    graft.llm.Retrieval.buildIndex(seed, "doc_id", "text", bidx, numBuckets = 4)
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.IndexIngest.start(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text",
      didx, Some(bidx), ck)
    try {
      // batch 0: one exact dup of seed doc 0 (dropped) + one new doc
      in.addData((10L, "alpha beta gamma delta epsilon zeta"),
        (11L, "seven eight nine ten eleven twelve"))
      q.processAllAvailable()
      // batch 1: dup of the batch-0 ingest (the index already learned
      // doc 11's keys) + one new doc
      in.addData((12L, "seven eight nine ten eleven twelve"),
        (13L, "unique thirteen sentence appears here now"))
      q.processAllAvailable()
    } finally q.stop()
    // retrieval sees exactly the survivors: 13 for its unique term,
    // and ONLY 11 for the term both 11 and the dropped 12 carried
    def ids(term: String) =
      graft.llm.Retrieval.bm25TopKIndexed(spark, bidx, Seq(Seq(term)), k = 3)
        .collect().map(_.getAs[Long]("id")).toSet
    assert(ids("thirteen") === Set(13L))
    assert(ids("seven") === Set(11L))
    assert(ids("alpha") === Set(0L)) // the dup never re-entered
    // replayed batch ids are ledger no-ops (crash-restart semantics)
    assert(graft.streaming.IndexIngest.processBatch(
      seed, 0L, "doc_id", "text", didx, Some(bidx)) === -1L)
    assert(graft.streaming.IndexIngest.processBatch(
      seed, 1L, "doc_id", "text", didx, Some(bidx)) === -1L)
    // WITHIN-batch duplicates: two copies of the same new text in ONE
    // batch must collapse to the min-id copy before ingesting — the
    // index probe alone can't see them (neither is committed yet)
    val dupBatch = Seq(
      (21L, "fresh words never indexed before today"),
      (20L, "fresh words never indexed before today"),
      (22L, "another brand new unique document body")).toDF("doc_id", "text")
    assert(graft.streaming.IndexIngest.processBatch(
      dupBatch, 9L, "doc_id", "text", didx, Some(bidx)) === 2L)
    assert(ids("fresh") === Set(20L))
    assert(ids("brand") === Set(22L))
  }

  test("WARC archive-manifest ingest parses, quarantines, dedups, and indexes per batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-ingest").toFile
    dir.deleteOnExit()
    val (didx, bidx, qdir) = (s"$dir/didx", s"$dir/bidx", s"$dir/quarantine")
    val seed = Seq((0L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    graft.llm.Dedup.buildDedupIndex(seed, "doc_id", "text", didx,
      numBuckets = 4, shingleN = 3, numHashes = 8, rowsPerBand = 2)
    graft.llm.Retrieval.buildIndex(seed, "doc_id", "text", bidx, numBuckets = 4)
    def record(id: Long, payload: String, clen: Option[String] = None) =
      graft.fixtures.FixtureBytes.warcRecord(s"http://crawl/doc/$id",
        payload.getBytes("UTF-8"), contentLength = clen)
    def archive(name: String, recs: Array[Byte]*): String = {
      val f = new java.io.File(dir, name)
      val out = new java.io.FileOutputStream(f)
      try recs.foreach(out.write) finally out.close()
      f.toString
    }
    // archive A: two clean docs + one corrupt record; archive B
    // (PER-RECORD-GZIP — processWarcBatch must route it by magic, not
    // name): one new doc + an exact copy of doc 11's text under a new
    // id
    val a = archive("a.warc",
      record(10L, "seven eight nine ten eleven twelve"),
      record(11L, "unique sentence appears here right now"),
      record(12L, "broken record body", clen = Some("XX")))
    val b = archive("b.wgz", // deliberately NOT named .warc.gz
      graft.fixtures.FixtureBytes.gzMember(
        record(13L, "thirteen fresh words never seen before")),
      graft.fixtures.FixtureBytes.gzMember(
        record(14L, "unique sentence appears here right now")))
    val idExpr = "CAST(regexp_extract(target_uri, '/doc/([0-9]+)$', 1) AS BIGINT)"
    def ingest(paths: Seq[String], batchId: Long) =
      graft.streaming.IndexIngest.processWarcBatch(
        paths.toDF("path"), batchId, "path", idExpr, "decode(payload, 'utf-8')",
        didx, Some(bidx), quarantineDir = Some(qdir), warcChunkSize = 64)
    // batch 0: archive A — 2 clean docs land, the corrupt record
    // quarantines with its archive path
    assert(ingest(Seq(a), 0L) === 2L)
    val quarantined = spark.read.parquet(s"$qdir/batch_id=0")
      .collect().map(r => (r.getAs[String]("archive"), r.getAs[String]("error")))
    assert(quarantined.length === 1)
    assert(quarantined.head._1 === a &&
      quarantined.head._2.contains("Content-Length"))
    // batch 1: archive B — 13 lands; 14 is an exact dup of the
    // batch-0 ingest and the index probe drops it
    assert(ingest(Seq(b), 1L) === 1L)
    def ids(term: String) =
      graft.llm.Retrieval.bm25TopKIndexed(spark, bidx, Seq(Seq(term)), k = 3)
        .collect().map(_.getAs[Long]("id")).toSet
    assert(ids("thirteen") === Set(13L))
    assert(ids("unique") === Set(11L)) // the cross-archive dup never entered
    assert(ids("alpha") === Set(0L))   // the seed untouched
    // a replayed batch id is a ledger no-op and leaves its audit rows
    assert(ingest(Seq(a), 0L) === -1L)
    assert(spark.read.parquet(s"$qdir/batch_id=0").count() === 1L)
    // an empty manifest batch still commits (replay semantics hold)
    assert(ingest(Seq.empty, 5L) === 0L)
    assert(ingest(Seq.empty, 5L) === -1L)
  }

  test("index ingest replay after a post-postings crash does not double BM25 postings") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest-replay").toFile
    dir.deleteOnExit()
    val (didx, bidx) = (s"$dir/didx", s"$dir/bidx")
    val seed = Seq((0L, "alpha beta gamma")).toDF("doc_id", "text")
    graft.llm.Dedup.buildDedupIndex(seed, "doc_id", "text", didx,
      numBuckets = 2, shingleN = 3, numHashes = 8, rowsPerBand = 2)
    graft.llm.Retrieval.buildIndex(seed, "doc_id", "text", bidx, numBuckets = 2)
    val batch = Seq((5L, "replay target document body words")).toDF("doc_id", "text")
    assert(graft.streaming.IndexIngest.processBatch(
      batch, 7L, "doc_id", "text", didx, Some(bidx)) === 1L)
    def score() = graft.llm.Retrieval
      .bm25TopKIndexed(spark, bidx, Seq(Seq("replay")), k = 3)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("score_bp"))).toSeq
    val before = score()
    assert(before.map(_._1) === Seq(5L))
    // simulate the crash window: postings + BM25 sub-ledger landed, but
    // the MAIN ledger write never happened → foreachBatch replays 7
    val ledger = new java.io.File(didx, "_graft_ingest_ledger")
    val lines = scala.io.Source.fromFile(ledger).getLines().toSeq
    java.nio.file.Files.write(ledger.toPath,
      lines.filterNot(_ == "7").mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // replay: dedup probe now flags doc 5 as known → 0 survivors; even
    // if it had survivors, the BM25 sub-ledger skips the postings step
    val n = graft.streaming.IndexIngest.processBatch(
      batch, 7L, "doc_id", "text", didx, Some(bidx))
    assert(n === 0L, s"replayed batch re-ingested $n docs")
    assert(score() === before, "replay must not change BM25 postings/stats")
  }

  test("append crash AFTER the sub-ledger commit replays without double-counting") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-crash-after").toFile
    dir.deleteOnExit()
    val (didx, bidx, ctrl) = (s"$dir/didx", s"$dir/bidx", s"$dir/ctrl")
    val seed = Seq((0L, "alpha beta gamma")).toDF("doc_id", "text")
    val batch = Seq((5L, "crashy document body words here")).toDF("doc_id", "text")
    graft.llm.Dedup.buildDedupIndex(seed, "doc_id", "text", didx,
      numBuckets = 2, shingleN = 3, numHashes = 8, rowsPerBand = 2)
    graft.llm.Retrieval.buildIndex(seed, "doc_id", "text", bidx, numBuckets = 2)
    // crash in the instant between the sub-ledger line landing and the
    // pending fence clearing — under the old ledger-after-return
    // ordering this exact window double-appended the batch's postings
    // on replay
    spark.conf.set("graft.test.crashPoint", "bm25_append_after_ledger")
    val e = intercept[RuntimeException] {
      graft.streaming.IndexIngest.processBatch(
        batch, 3L, "doc_id", "text", didx, Some(bidx))
    }
    assert(e.getMessage.contains("injected crash"), s"got $e")
    spark.conf.set("graft.test.crashPoint", "")
    // the fence is still up (crash before its clear) but the ledger
    // proves the append completed — the replay must clear it, skip the
    // postings, and commit the batch exactly once
    assert(!graft.llm.Retrieval.indexExists(bidx), "fence must be up after the crash")
    val n = graft.streaming.IndexIngest.processBatch(
      batch, 3L, "doc_id", "text", didx, Some(bidx))
    assert(n === 1L, s"replay committed $n docs")
    assert(graft.llm.Retrieval.indexExists(bidx), "replay must clear the stale fence")
    // postings/stats equal an index built once over seed ∪ batch
    graft.llm.Retrieval.buildIndex(seed.unionAll(batch), "doc_id", "text",
      ctrl, numBuckets = 2)
    def probe(d: String) = graft.llm.Retrieval
      .bm25TopKIndexed(spark, d, Seq(Seq("crashy"), Seq("alpha")), k = 3)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"),
        r.getAs[Long]("score_bp"))).sortBy(x => (x._1, x._2)).toSeq
    assert(probe(bidx) === probe(ctrl),
      "post-replay index must equal a single-append build (no double counts)")
  }

  test("append crash BEFORE the sub-ledger commit is a detectable stop, not a double count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-crash-before").toFile
    dir.deleteOnExit()
    val (didx, bidx) = (s"$dir/didx", s"$dir/bidx")
    val seed = Seq((0L, "alpha beta gamma")).toDF("doc_id", "text")
    val batch = Seq((5L, "torn append document body")).toDF("doc_id", "text")
    graft.llm.Dedup.buildDedupIndex(seed, "doc_id", "text", didx,
      numBuckets = 2, shingleN = 3, numHashes = 8, rowsPerBand = 2)
    graft.llm.Retrieval.buildIndex(seed, "doc_id", "text", bidx, numBuckets = 2)
    spark.conf.set("graft.test.crashPoint", "bm25_append_before_ledger")
    intercept[RuntimeException] {
      graft.streaming.IndexIngest.processBatch(
        batch, 4L, "doc_id", "text", didx, Some(bidx))
    }
    spark.conf.set("graft.test.crashPoint", "")
    // data steps landed but the commit record didn't: the replay cannot
    // prove the append completed, so it must fail LOUDLY on the fence
    // (rebuild the index) — never silently re-append the postings
    assert(!graft.llm.Retrieval.indexExists(bidx))
    val e = intercept[Exception] {
      graft.streaming.IndexIngest.processBatch(
        batch, 4L, "doc_id", "text", didx, Some(bidx))
    }
    assert(e.getMessage.contains("interrupted append"),
      s"expected the torn-index fence error, got $e")
  }

  // deterministic 8-dim embedding per doc id (m=8 → dsub=1)
  private def testVec(i: Long): Array[Float] =
    Array.tabulate(8)(d => ((i * 7 + d * 3) % 11).toFloat)

  private def annFixture(dirTag: String) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(dirTag).toFile
    dir.deleteOnExit()
    val (didx, aidx) = (s"$dir/didx", s"$dir/aidx")
    val seed = Seq((0L, "alpha beta gamma", testVec(0)),
      (1L, "delta epsilon zeta", testVec(1))).toDF("doc_id", "text", "vec")
    val quant = Seq((0L, testVec(100)), (1L, testVec(101)))
      .toDF("doc_id", "vec")
    val codebook = (0L until 4L).map(c => (c, testVec(200 + c)))
      .toDF("doc_id", "vec")
    graft.llm.Dedup.buildDedupIndex(seed, "doc_id", "text", didx,
      numBuckets = 2, shingleN = 3, numHashes = 8, rowsPerBand = 2)
    graft.llm.VectorIndex.buildIndex(seed, "doc_id", "vec", quant, codebook,
      aidx, numBuckets = 2)
    (dir, didx, aidx, seed, quant, codebook)
  }

  test("ANN append crash AFTER the sub-ledger commit replays without double-appending") {
    import spark.implicits._
    val (dir, didx, aidx, seed, quant, codebook) = annFixture("graft-ann-after")
    val batch = Seq((5L, "crashy vector document body", testVec(5)))
      .toDF("doc_id", "text", "vec")
    // crash between the ANN sub-ledger line landing and the fence
    // clearing — without the in-append ledger this exact window
    // double-appended the batch's PQ codes on replay
    spark.conf.set("graft.test.crashPoint", "ann_append_after_ledger")
    val e = intercept[RuntimeException] {
      graft.streaming.IndexIngest.processBatch(batch, 3L, "doc_id", "text",
        didx, None, annIndexDir = Some(aidx), vecCol = Some("vec"))
    }
    assert(e.getMessage.contains("injected crash"), s"got $e")
    spark.conf.set("graft.test.crashPoint", "")
    assert(!graft.llm.VectorIndex.indexExists(aidx),
      "fence must be up after the crash")
    // replay: ledger proves the append completed — clear the fence,
    // skip the lists append, commit the batch exactly once
    val n = graft.streaming.IndexIngest.processBatch(batch, 3L, "doc_id",
      "text", didx, None, annIndexDir = Some(aidx), vecCol = Some("vec"))
    assert(n === 0L || n === 1L, s"replay committed $n docs")
    assert(graft.llm.VectorIndex.indexExists(aidx),
      "replay must clear the stale fence")
    // lists equal an index built once over seed ∪ batch — a double
    // append would duplicate doc 5's candidate rows
    val ctrl = s"$dir/ctrl"
    graft.llm.VectorIndex.buildIndex(seed.unionAll(batch.select(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.col("vec"))),
      "doc_id", "vec", quant, codebook, ctrl, numBuckets = 2)
    val probes = Seq((90L, testVec(5)), (91L, testVec(0)))
    def probe(d: String) = graft.llm.VectorIndex
      .annTopKIndexed(spark, d, probes, k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sortBy(x => (x._1, x._3)).toSeq
    assert(probe(aidx) === probe(ctrl),
      "post-replay ANN index must equal a single-append build")
  }

  test("undeletable completed-append fence fails the ANN batch loudly, naming the fence") {
    import spark.implicits._
    val (_, didx, aidx, _, _, _) = annFixture("graft-ann-fencefail")
    val batch = Seq((5L, "crashy vector document body", testVec(5)))
      .toDF("doc_id", "text", "vec")
    def run() = graft.streaming.IndexIngest.processBatch(batch, 3L,
      "doc_id", "text", didx, None, annIndexDir = Some(aidx),
      vecCol = Some("vec"))
    // crash after the ANN sub-ledger line → fence up, append COMPLETED
    spark.conf.set("graft.test.crashPoint", "ann_append_after_ledger")
    intercept[RuntimeException] { run() }
    spark.conf.set("graft.test.crashPoint", "")
    val fence = new java.io.File(aidx, "_graft_compact_pending")
    assert(fence.isFile, "fence must be up after the crash")
    // replay against a fence the process cannot delete (filesystem
    // fault injected — the suite runs with delete rights, so the
    // failure is simulated by path): the batch must DIE with the
    // fence-naming error, not swallow it into a silently skipped
    // clear that leaves every later batch behind a torn-index message
    sys.props("graft.test.undeletableFence") = fence.getAbsolutePath
    try {
      val e = intercept[IllegalStateException] { run() }
      assert(e.getMessage.contains(fence.getName) &&
        e.getMessage.contains("COMPLETED"), s"got $e")
      assert(fence.isFile, "failed clear must leave the fence in place")
    } finally sys.props -= "graft.test.undeletableFence"
    // filesystem healthy again: the replay clears the fence and commits
    val n = run()
    assert(n === 0L || n === 1L, s"replay committed $n docs")
    assert(graft.llm.VectorIndex.indexExists(aidx),
      "healthy replay must clear the stale fence")
  }

  test("ANN append crash BEFORE the sub-ledger commit is a detectable stop") {
    import spark.implicits._
    val (_, didx, aidx, _, _, _) = annFixture("graft-ann-before")
    val batch = Seq((5L, "torn vector append body", testVec(5)))
      .toDF("doc_id", "text", "vec")
    spark.conf.set("graft.test.crashPoint", "ann_append_before_ledger")
    intercept[RuntimeException] {
      graft.streaming.IndexIngest.processBatch(batch, 4L, "doc_id", "text",
        didx, None, annIndexDir = Some(aidx), vecCol = Some("vec"))
    }
    spark.conf.set("graft.test.crashPoint", "")
    // lists rows landed but the commit record didn't: the replay cannot
    // prove the append completed — it must fail LOUDLY on the fence
    // (rebuild the index), never silently re-append the PQ codes
    assert(!graft.llm.VectorIndex.indexExists(aidx))
    val e = intercept[Exception] {
      graft.streaming.IndexIngest.processBatch(batch, 4L, "doc_id", "text",
        didx, None, annIndexDir = Some(aidx), vecCol = Some("vec"))
    }
    assert(e.getMessage.contains("interrupted append"),
      s"expected the torn-index fence error, got $e")
  }

  test("staged dedup append: no kill point drops or double-serves content") {
    import spark.implicits._
    val seedRows = Seq((0L, "seed alpha beta gamma delta epsilon"))
    val batchRows = Seq((5L, "novel zeta eta theta iota kappa"))
    // probe: an exact copy of each doc (must flag exact_dup=1 iff the
    // content is served) plus a never-seen text (must stay clean)
    val probeRows = Seq((90L, seedRows.head._2), (91L, batchRows.head._2),
      (92L, "unrelated lambda mu nu xi omicron"))
    def flags(idx: String) =
      Dedup.dedupAgainstIndex(probeRows.toDF("doc_id", "text"),
          "doc_id", "text", idx)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    // control: the index a crash-free ingest of the batch produces
    val ctrlDir = java.nio.file.Files.createTempDirectory("graft-dsa-ctrl").toFile
    ctrlDir.deleteOnExit()
    val ctrl = s"$ctrlDir/idx"
    Dedup.buildDedupIndex((seedRows ++ batchRows).toDF("doc_id", "text"),
      "doc_id", "text", ctrl, numBuckets = 2,
      shingleN = 3, numHashes = 8, rowsPerBand = 2)
    val want = flags(ctrl)
    assert(want === Seq((90L, 1L, 1L), (91L, 1L, 1L), (92L, 0L, 0L)))
    for (point <- Seq("dedup_append_before_fence", "dedup_append_mid_move",
        "dedup_append_before_ledger", "dedup_append_after_ledger")) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-dsa").toFile
      dir.deleteOnExit()
      val didx = s"$dir/didx"
      Dedup.buildDedupIndex(seedRows.toDF("doc_id", "text"), "doc_id", "text",
        didx, numBuckets = 2, shingleN = 3, numHashes = 8, rowsPerBand = 2)
      spark.conf.set("graft.test.crashPoint", point)
      val e = intercept[RuntimeException] {
        graft.streaming.IndexIngest.processBatch(
          batchRows.toDF("doc_id", "text"), 7L, "doc_id", "text", didx, None)
      }
      assert(e.getMessage.contains("injected crash"), s"[$point] got $e")
      spark.conf.set("graft.test.crashPoint", "")
      // pre-fence crash leaves a VALID index (staging is invisible);
      // the fenced windows leave a detectably-pending one
      if (point == "dedup_append_before_fence")
        assert(Dedup.dedupIndexExists(didx), s"[$point] index must stay valid")
      else
        assert(!Dedup.dedupIndexExists(didx), s"[$point] fence must be up")
      // the replay must converge to exactly the crash-free outcome:
      // content served once — never dropped, never doubled
      val n = graft.streaming.IndexIngest.processBatch(
        batchRows.toDF("doc_id", "text"), 7L, "doc_id", "text", didx, None)
      assert(n >= 0L, s"[$point] replay must commit, got $n")
      assert(Dedup.dedupIndexExists(didx), s"[$point] replay must clear the fence")
      assert(flags(didx) === want, s"[$point] probe != crash-free control")
      // key tables keep the distinct-keys invariant (no doubled rows)
      val h = spark.read.parquet(s"$didx/exact")
      assert(h.count() === h.distinct().count(), s"[$point] doubled exact keys")
      val b = spark.read.parquet(s"$didx/bands")
      assert(b.count() === b.distinct().count(), s"[$point] doubled band keys")
      // a third run is a main-ledger no-op
      assert(graft.streaming.IndexIngest.processBatch(
        batchRows.toDF("doc_id", "text"), 7L, "doc_id", "text", didx, None) === -1L)
    }
  }

  test("index ingest self-compacts every N batches; probes unchanged") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest-compact").toFile
    dir.deleteOnExit()
    val (didx, bidx) = (s"$dir/didx", s"$dir/bidx")
    val nb = 2
    graft.llm.Dedup.buildDedupIndex(
      Seq((0L, "seed words alpha beta gamma")).toDF("doc_id", "text"),
      "doc_id", "text", didx, nb, shingleN = 3, numHashes = 8, rowsPerBand = 2)
    graft.llm.Retrieval.buildIndex(
      Seq((0L, "seed words alpha beta gamma")).toDF("doc_id", "text"),
      "doc_id", "text", bidx, nb)
    def files(d: String) = graft.Compact.dataFileCount(d)
    (1 to 4).foreach { b =>
      val batch = Seq((b * 10L, s"unique batch $b body text number$b"))
        .toDF("doc_id", "text")
      graft.streaming.IndexIngest.processBatch(batch, b.toLong, "doc_id",
        "text", didx, Some(bidx), dropNear = true, compactEvery = 2)
      // after each EVEN committed batch the tables are back to one file
      // per (non-empty) bucket; odd batches leave the appended files
      if (b % 2 == 0) {
        assert(files(s"$bidx/postings") <= nb, s"batch $b left ${files(s"$bidx/postings")} postings files")
        assert(files(s"$didx/exact") <= nb)
      }
    }
    // everything ingested exactly once and queryable after compactions
    (1 to 4).foreach { b =>
      val got = graft.llm.Retrieval.bm25TopKIndexed(spark, bidx,
          Seq(Seq(s"number$b")), k = 3)
        .collect().map(_.getAs[Long]("id")).toSet
      assert(got === Set(b * 10L), s"batch $b content lost: $got")
    }
  }

  test("streaming takedown batches tombstone the indexes, ledger makes replays no-ops") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-takedown").toFile
    dir.deleteOnExit()
    val bidx = s"$dir/bidx"
    val docs = Seq((1L, "apple banana"), (2L, "apple cherry"),
      (3L, "apple dates")).toDF("doc_id", "text")
    graft.llm.Retrieval.buildIndex(docs, "doc_id", "text", bidx, numBuckets = 2)
    def hits() = graft.llm.Retrieval
      .bm25TopKIndexed(spark, bidx, Seq(Seq("apple")), k = 3)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(hits() === Set(1L, 2L, 3L))
    val b0 = Seq(2L).toDF("doc_id")
    assert(graft.streaming.IndexIngest.processDeleteBatch(
      b0, 0L, "doc_id", bidx) === 1L)
    assert(hits() === Set(1L, 3L))
    // replayed batch id → ledger no-op
    assert(graft.streaming.IndexIngest.processDeleteBatch(
      b0, 0L, "doc_id", bidx) === -1L)
    // compactEvery=1: the next batch's merge makes deletes physical
    assert(graft.streaming.IndexIngest.processDeleteBatch(
      Seq(3L).toDF("doc_id"), 1L, "doc_id", bidx, compactEvery = 1) === 1L)
    assert(!new java.io.File(bidx, "tombstones").exists(),
      "compaction must clear tombstones")
    assert(hits() === Set(1L))
  }

  test("100k-id takedown batch: probes stay broadcast-bounded before and after compaction") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-takedown-100k").toFile
    dir.deleteOnExit()
    val (bidx, didx, aidx) = (s"$dir/bidx", s"$dir/didx", s"$dir/aidx")
    // 200 docs; ids offset to 1e6 so most of the 100k takedown ids are
    // absent (the realistic compliance-list shape: a global purge list
    // intersected with one index's corpus)
    val docs = (0L until 200L)
      .map(i => (1000000L + i, s"tok$i common filler words body", testVec(i)))
      .toDF("doc_id", "text", "vec")
    Retrieval.buildIndex(docs, "doc_id", "text", bidx, numBuckets = 4)
    Dedup.buildDedupIndex(docs, "doc_id", "text", didx, numBuckets = 4,
      shingleN = 3, numHashes = 8, rowsPerBand = 2)
    graft.llm.VectorIndex.buildIndex(docs, "doc_id", "vec",
      Seq((0L, testVec(100)), (1L, testVec(101))).toDF("doc_id", "vec"),
      (0L until 4L).map(c => (c, testVec(200 + c))).toDF("doc_id", "vec"),
      aidx, numBuckets = 4)
    // the batch: 99,950 absent ids + the first 50 corpus docs
    val ids = ((0L until 99950L) ++ (1000000L until 1000050L)).toDF("doc_id")
    assert(graft.streaming.IndexIngest.processDeleteBatch(
      ids, 0L, "doc_id", bidx, Some(aidx), 0, Some(didx)) === 100000L)
    def bm25Probe() = Retrieval.bm25TopKIndexed(spark, bidx,
      Seq(Seq("common")), k = 200)
    def annProbe() = graft.llm.VectorIndex.annTopKIndexed(spark, aidx,
      Seq((1L, testVec(60))), k = 5, nProbe = 2)
    // PENDING stage: the 100k-row tombstone table rides as a BROADCAST
    // anti-join — the corpus-sized postings/lists never reshuffle for it
    val bp = bm25Probe()
    val bm25Pending = bp.collect().map(_.getAs[Long]("id")).toSet
    val bpPlan = bp.queryExecution.executedPlan.toString
    assert(bpPlan.contains("BroadcastHashJoin") && bpPlan.contains("LeftAnti"),
      s"tombstone exclusion must be a broadcast anti-join:\n$bpPlan")
    assert(!bpPlan.contains("SortMergeJoin"),
      s"takedown probe acquired a corpus reshuffle:\n$bpPlan")
    // the postings scan stays bucket-pruned UNDER the anti-join — the
    // 100k tombstones shuffle only themselves (their own distinct),
    // never the corpus-sized postings
    assert(bpPlan.contains("SelectedBucketsCount: 1 out of 4"),
      s"postings scan lost bucket pruning under the tombstone join:\n$bpPlan")
    assert(bm25Pending === (1000050L until 1000200L).toSet,
      "pending-stage probe must exclude exactly the deleted docs")
    val ap = annProbe()
    val apPlan = ap.queryExecution.executedPlan.toString
    assert(apPlan.contains("BroadcastHashJoin") && apPlan.contains("LeftAnti"),
      s"ANN tombstone exclusion must be a broadcast anti-join:\n$apPlan")
    assert(ap.collect().map(_.getLong(1)).toSet
        .intersect((1000000L until 1000050L).toSet).isEmpty,
      "ANN probe served a deleted vector")
    // dedup probe: purged docs' keys die via the sidecar refcount; an
    // exact copy of deleted content must come back clean
    val probeDocs = Seq((5L, "tok0 common filler words body"),
      (6L, "tok60 common filler words body")).toDF("doc_id", "text")
    val dFlags = Dedup.dedupAgainstIndex(probeDocs, "doc_id", "text", didx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dFlags === Map(5L -> 0L, 6L -> 1L),
      s"dedup dead-key exclusion wrong at 100k ids: $dFlags")
    // COMPACTED stage: deletes physical, tombstones cleared, same rows
    Retrieval.compactIndex(spark, bidx)
    graft.llm.VectorIndex.compactIndex(spark, aidx)
    Dedup.compactDedupIndex(spark, didx)
    assert(!new java.io.File(bidx, "tombstones").exists())
    val bpc = bm25Probe()
    assert(bpc.collect().map(_.getAs[Long]("id")).toSet ===
      (1000050L until 1000200L).toSet, "compacted probe changed the answer")
    assert(!bpc.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
    assert(Dedup.dedupAgainstIndex(probeDocs, "doc_id", "text", didx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap ===
      Map(5L -> 0L, 6L -> 1L))
  }

  test("soak: interleaved ingest + takedown + self-compaction equals rebuilds over survivors") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-soak").toFile
    dir.deleteOnExit()
    val (didx, bidx, aidx) = (s"$dir/didx", s"$dir/bidx", s"$dir/aidx")
    // every doc gets a globally-unique lead token so BM25 probes can
    // target it; every token is parameterized by i, so distinct docs
    // share ZERO shingles (mutually non-near-dup except where planted);
    // every doc ALSO carries a deterministic embedding of its doc id so
    // the ANN index stages through the same ingest/takedown/compaction
    def text(i: Long) = s"tok$i alpha$i beta$i gamma$i delta$i epsilon$i"
    def full(rows: (Long, String)*) =
      rows.map { case (i, t) => (i, t, testVec(i)) }.toDF("doc_id", "text", "vec")
    val corpus = scala.collection.mutable.LinkedHashMap(
      0L -> text(0), 1L -> text(1))
    val quant = Seq((0L, testVec(100)), (1L, testVec(101)))
      .toDF("doc_id", "vec")
    val codebook = (0L until 4L).map(c => (c, testVec(200 + c)))
      .toDF("doc_id", "vec")
    Dedup.buildDedupIndex(corpus.toSeq.toDF("doc_id", "text"),
      "doc_id", "text", didx, numBuckets = 2,
      shingleN = 3, numHashes = 8, rowsPerBand = 2)
    Retrieval.buildIndex(corpus.toSeq.toDF("doc_id", "text"),
      "doc_id", "text", bidx, numBuckets = 2)
    graft.llm.VectorIndex.buildIndex(full(corpus.toSeq: _*), "doc_id", "vec",
      quant, codebook, aidx, numBuckets = 2)
    var ingestBatch = 0L
    var takedownBatch = 0L
    def ingest(rows: (Long, String)*): Long = {
      ingestBatch += 1
      graft.streaming.IndexIngest.processBatch(full(rows: _*),
        ingestBatch, "doc_id", "text", didx, Some(bidx), dropNear = true,
        compactEvery = 2, annIndexDir = Some(aidx), vecCol = Some("vec"))
    }
    def takedown(ids: Long*): Long = {
      takedownBatch += 1
      ids.foreach(corpus.remove)
      graft.streaming.IndexIngest.processDeleteBatch(ids.toDF("doc_id"),
        takedownBatch, "doc_id", bidx, Some(aidx), compactEvery = 2, Some(didx))
    }
    // the q279/q281 equivalences, LOOPED: after every step the dedup
    // probe must equal dedupAgainst over the survivors (precise at all
    // times); after every compaction the BM25 probes must equal a
    // from-scratch rebuild (between takedown and compaction BM25 stats
    // are Lucene-stale — only exclusion is checked there)
    val probeTexts = (0L to 8L).map(i => (100L + i, text(i))).toDF("doc_id", "text")
    def assertDedup(tag: String): Unit = {
      val got = Dedup.dedupAgainstIndex(probeTexts, "doc_id", "text", didx)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      val want = Dedup.dedupAgainst(probeTexts,
          corpus.toSeq.toDF("doc_id", "text"), "doc_id", "text",
          shingleN = 3, numHashes = 8, rowsPerBand = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(got === want, s"[$tag] dedup probe != survivors recompute")
    }
    def assertBm25Rebuild(tag: String): Unit = {
      val ctrl = s"$dir/ctrl-$tag"
      Retrieval.buildIndex(corpus.toSeq.toDF("doc_id", "text"),
        "doc_id", "text", ctrl, numBuckets = 2)
      val terms = corpus.keys.map(i => Seq(s"tok$i")).toSeq
      def probe(d: String) = Retrieval.bm25TopKIndexed(spark, d, terms, k = 3)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"),
          r.getAs[Long]("score_bp"))).sortBy(x => (x._1, x._2)).toSeq
      assert(probe(bidx) === probe(ctrl), s"[$tag] BM25 probe != rebuild")
    }
    // ANN has no corpus statistics, so (unlike BM25 between takedown
    // and merge) the probe must equal a from-scratch rebuild over the
    // survivors at EVERY step, tombstones pending or compacted
    def assertAnnRebuild(tag: String): Unit = {
      val ctrl = s"$dir/actrl-$tag"
      graft.llm.VectorIndex.buildIndex(full(corpus.toSeq: _*), "doc_id",
        "vec", quant, codebook, ctrl, numBuckets = 2)
      val probes = (0L to 8L).map(i => (500L + i, testVec(i)))
      def probe(d: String) = graft.llm.VectorIndex
        .annTopKIndexed(spark, d, probes, k = 3, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        .sortBy(x => (x._1, x._3)).toSeq
      assert(probe(aidx) === probe(ctrl), s"[$tag] ANN probe != rebuild")
    }
    def record(rows: (Long, String)*): Unit =
      rows.foreach { case (i, t) => corpus(i) = t }

    assert(ingest(10L -> text(10), 11L -> text(11)) === 2L)
    record(10L -> text(10), 11L -> text(11))
    assertDedup("b1"); assertAnnRebuild("b1")
    // b2: one dup of committed content dropped, one novel kept;
    // ingest count hits 2 → self-compaction of all three indexes
    assert(ingest(12L -> text(10), 13L -> text(13)) === 1L)
    record(13L -> text(13))
    assertDedup("b2"); assertBm25Rebuild("b2"); assertAnnRebuild("b2")
    // t1: take down doc 10 — BM25 and ANN exclude it immediately; the
    // dedup index forgets its content (no surviving referent)
    assert(takedown(10L) === 1L)
    assertDedup("t1"); assertAnnRebuild("t1")
    assert(!Retrieval.bm25TopKIndexed(spark, bidx, Seq(Seq("tok10")), k = 3)
      .collect().map(_.getAs[Long]("id")).contains(10L))
    // b3: RE-INGEST the taken-down content — must survive precisely
    // because the takedown reached the dedup index
    assert(ingest(14L -> text(10), 15L -> text(15)) === 2L,
      "re-ingest of purged content must pass the dedup probe")
    record(14L -> text(10), 15L -> text(15))
    assertDedup("b3"); assertAnnRebuild("b3")
    // t2: second takedown → takedown count hits 2 → compaction makes
    // every pending delete physical; BM25 equals a rebuild again
    assert(takedown(13L) === 1L)
    assertDedup("t2"); assertBm25Rebuild("t2"); assertAnnRebuild("t2")
    // b4: ingest count hits 4 → another self-compaction cycle
    assert(ingest(16L -> text(16), 17L -> text(17)) === 2L)
    record(16L -> text(16), 17L -> text(17))
    assertDedup("b4"); assertBm25Rebuild("b4"); assertAnnRebuild("b4")
    // b5: a WARC ARCHIVE batch through the same triangle — one record
    // duplicates live content (dropped by the persisted probe), one is
    // novel; the embed hook attaches the deterministic test vectors, so
    // every invariant holds over the crawl front door too
    def warcRec(id: Long, t: String) =
      graft.fixtures.FixtureBytes.warcRecord(s"http://soak/doc/$id",
        t.getBytes("UTF-8"))
    val arc = new java.io.File(dir, "soak.warc")
    val aout = new java.io.FileOutputStream(arc)
    try { aout.write(warcRec(18L, text(16))); aout.write(warcRec(19L, text(19))) }
    finally aout.close()
    ingestBatch += 1
    // testVec as a pure expression (a closure-based udf would drag the
    // spec instance into the task closure — not serializable)
    val vecExpr = org.apache.spark.sql.functions.expr(
      "transform(sequence(0, 7), d -> CAST((graft_wid * 7 + d * 3) % 11 AS FLOAT))")
    assert(graft.streaming.IndexIngest.processWarcBatch(
      Seq(arc.toString).toDF("path"), ingestBatch, "path",
      "CAST(regexp_extract(target_uri, '/doc/([0-9]+)$', 1) AS BIGINT)",
      "decode(payload, 'utf-8')", didx, Some(bidx), dropNear = true, compactEvery = 2,
      annIndexDir = Some(aidx), vecCol = Some("vec"),
      embed = b => b.withColumn("vec", vecExpr)) === 1L)
    record(19L -> text(19))
    assertDedup("b5"); assertBm25Rebuild("b5"); assertAnnRebuild("b5")
  }

  test("streaming snapshot maintainer folds CDC batches into versioned parquet") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.SnapshotMaintainer
    val dir = java.nio.file.Files.createTempDirectory("graft-snap").toString
    SnapshotMaintainer.init(
      Seq((1L, "a"), (2L, "b")).toDF("k", "payload"), dir)
    assert(SnapshotMaintainer.currentVersion(dir) === 0L)
    val in = MemoryStream[(Long, String, Long, String)]
    val q = SnapshotMaintainer.start(
      in.toDF().toDF("k", "payload", "seq", "op"), dir, Seq("k"),
      "seq", "op",
      java.nio.file.Files.createTempDirectory("graft-snap-ckpt").toString)
    try {
      in.addData((1L, "a2", 1L, "U"), (3L, "c", 1L, "I"))
      q.processAllAvailable()
      assert(SnapshotMaintainer.currentVersion(dir) === 1L)
      val v1 = SnapshotMaintainer.snapshot(spark, dir)
        .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(v1 === Seq((1L, "a2"), (2L, "b"), (3L, "c")))
      in.addData((2L, "b", 2L, "D"))
      q.processAllAvailable()
      assert(SnapshotMaintainer.currentVersion(dir) === 2L)
      val v2 = SnapshotMaintainer.snapshot(spark, dir)
        .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(v2 === Seq((1L, "a2"), (3L, "c")))
      // time travel: v1 still intact on disk
      val old = spark.read.parquet(s"$dir/v1")
        .orderBy("k").collect().map(_.getLong(0)).toSeq
      assert(old === Seq(1L, 2L, 3L))
      // replayed committed batch is a ledger no-op
      assert(SnapshotMaintainer.processBatch(
        Seq((9L, "x", 9L, "I")).toDF("k", "payload", "seq", "op"),
        0L, dir, Seq("k"), "seq", "op") === -1L)
      assert(SnapshotMaintainer.currentVersion(dir) === 2L)
    } finally q.stop()
  }

  test("partitioned snapshot rewrites ONLY touched partitions per batch") {
    import spark.implicits._
    import graft.streaming.PartitionedSnapshot
    val dir = java.nio.file.Files.createTempDirectory("graft-psnap").toString
    val base = (1L to 20L).map(k => (k, s"p$k")).toDF("k", "payload")
    PartitionedSnapshot.init(base, dir, Seq("k"), parts = 4)
    assert(PartitionedSnapshot.partCount(dir) === 4)
    assert(PartitionedSnapshot.snapshot(spark, dir).count() === 20L)
    // one updated key → exactly ONE partition rewritten; the other
    // three keep their v0 directories as the current version
    val b0 = Seq((7L, "p7x", 1L, "U")).toDF("k", "payload", "seq", "op")
    assert(PartitionedSnapshot.processBatch(b0, 0L, dir,
      Seq("k"), "seq", "op") === 1)
    val vs = PartitionedSnapshot.currentVersions(dir)
    assert(vs.values.count(_ == 1L) === 1 && vs.values.count(_ == 0L) === 3,
      s"expected one bumped partition: $vs")
    val snap = PartitionedSnapshot.snapshot(spark, dir)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(snap.length === 20 && snap.contains((7L, "p7x")))
    assert(!snap.contains((7L, "p7")))
    // replayed batch: per-partition ledger makes it a no-op
    assert(PartitionedSnapshot.processBatch(b0, 0L, dir,
      Seq("k"), "seq", "op") === 0)
    // delete + insert in one batch across partitions
    val b1 = Seq((3L, "p3", 2L, "D"), (99L, "new", 2L, "I"))
      .toDF("k", "payload", "seq", "op")
    assert(PartitionedSnapshot.processBatch(b1, 1L, dir,
      Seq("k"), "seq", "op") >= 1)
    val snap2 = PartitionedSnapshot.snapshot(spark, dir)
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(!snap2.contains(3L) && snap2.contains(99L))
    assert(snap2.length === 20) // 20 − deleted + inserted
    // no phantom partition-inference column from the multi-path read
    assert(PartitionedSnapshot.snapshot(spark, dir).columns.toSeq ===
      Seq("k", "payload"))
    // empty partitions (3 keys over 8 parts) still init readable v0 dirs
    val dir2 = java.nio.file.Files.createTempDirectory("graft-psnap2").toString
    PartitionedSnapshot.init(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "payload"),
      dir2, Seq("k"), parts = 8)
    assert(PartitionedSnapshot.snapshot(spark, dir2).count() === 3L)
    assert(PartitionedSnapshot.currentVersions(dir2).size === 8)
  }

  test("streaming quantile monitor tracks per-key medians across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.QuantileMonitor
    val in = MemoryStream[(String, Long)]
    val mon = QuantileMonitor.quantiles(
      in.toDF().toDF("k", "v"), "k", "v", probesBp = Seq(5000L), k = 128)
    val q = mon.toDF().writeStream.format("memory").queryName("qmon")
      .outputMode("update").start()
    try {
      // under k values → no compaction → the ladder holds every value
      // and the probe is the EXACT HALF_UP-rank median
      in.addData((1L to 50L).map(v => ("a", v)): _*)
      q.processAllAvailable()
      val after1 = spark.table("qmon")
        .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSet
      assert(after1 === Set(("a", 25L, 50L)))
      in.addData(((51L to 100L).map(v => ("a", v)) :+ ("b", 7L)): _*)
      q.processAllAvailable()
      val latest = spark.table("qmon")
        .groupBy("key").agg(org.apache.spark.sql.functions.max("n_rows"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(latest === Map("a" -> 100L, "b" -> 1L))
      val aRows = spark.table("qmon").filter($"n_rows" === 100L)
        .collect().map(r => (r.getString(0), r.getLong(2))).toSet
      assert(aRows === Set(("a", 50L))) // exact: still under k, all retained
    } finally q.stop()
  }

  test("streaming quantile monitor compacts yet conserves count and rank bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.QuantileMonitor
    val in = MemoryStream[(String, Long)]
    val mon = QuantileMonitor.quantiles(
      in.toDF().toDF("k", "v"), "k", "v", probesBp = Seq(5000L), k = 8)
    val q = mon.toDF().writeStream.format("memory").queryName("qmon2")
      .outputMode("update").start()
    try {
      in.addData((1L to 60L).map(v => ("a", v)): _*)
      q.processAllAvailable()
      in.addData((61L to 120L).map(v => ("a", v)): _*)
      q.processAllAvailable()
      val last = spark.table("qmon2").filter($"n_rows" === 120L)
        .collect().map(_.getLong(2))
      assert(last.length === 1)
      // weight conservation is exact (n_rows = 120 above); the k=8
      // deterministic ladder's even-half bias bounds the median
      // estimate within a levels·n/k rank envelope of 60
      assert(last.head >= 20L && last.head <= 100L, s"median est ${last.head}")
    } finally q.stop()
  }
}
