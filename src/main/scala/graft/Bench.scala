package graft

import graft.carve.EngineConfig
import graft.evidence.{StridedSamplesRef, ZerosRef}
import graft.pipeline.CarvePipeline
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query on the configured
  * sf directory, plus the reference's two carving benchmark shapes
  * (benches/throughput.rs): `scan_only` — signature scan over a
  * zero-filled image, reported as MiB/s — and `jpeg_dense` — many small
  * JPEGs with a max_files stop.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Host-speed calibration anchor, FIRST (before any Spark work can
    // heat the JVM or contend): a fixed single-threaded CPU-bound
    // kernel — the signature-scan automaton over an in-memory 256 MiB
    // pseudorandom buffer — whose work is identical every round, so
    // cross-round per-query ratios can be divided by the calibration
    // ratio to separate host drift (this machine is shared; scan_only
    // swung 16.5k→2.3k MiB/s across rounds on identical code) from
    // real regressions. Best-of-3 after one untimed JIT pass.
    val (calibrationSec, calibrationParSec) = locally {
      val patterns = EngineConfig.defaultFileTypes
        .flatMap(ft => ft.headerPatterns.map(_.bytes) ++ ft.footerPatterns.map(_.bytes))
      val ac = graft.scan.AhoCorasick.build(patterns)
      val buf = new Array[Byte](256 * 1024 * 1024)
      var x = 0x9e3779b97f4a7c15L // splitmix64 — deterministic filler
      var i = 0
      while (i < buf.length) {
        x += 0x9e3779b97f4a7c15L
        var z = x
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        buf(i) = (z ^ (z >>> 31)).toByte
        i += 1
      }
      var sink = 0L
      def once(): Double = {
        val t0 = System.nanoTime()
        ac.scan(buf)((_, _) => sink += 1)
        (System.nanoTime() - t0) / 1e9
      }
      once() // JIT
      val best = Seq(once(), once(), once()).min
      // PARALLEL calibration: the same kernel on all cores at once.
      // Single-thread calibration alone cannot separate "the host got
      // slower" from "the host lost parallel capacity" — this round
      // measured single-thread 1.28× FASTER while the byte-identical
      // 32-thread scan kernel ran 2.2× slower (a co-tenant stealing
      // physical cores under the same vCPU count). The pair
      // (calibration_sec, calibration_par_sec) lets bench_report-style
      // comparisons normalize each query by the dimension it actually
      // stresses.
      val nThreads = Runtime.getRuntime.availableProcessors()
      def oncePar(): Double = {
        val t0 = System.nanoTime()
        val ts = (0 until nThreads).map { _ =>
          val t = new Thread(() => {
            var s = 0L
            ac.scan(buf)((_, _) => s += 1)
            if (s == Long.MinValue) println(s)
          })
          t.start(); t
        }
        ts.foreach(_.join())
        (System.nanoTime() - t0) / 1e9
      }
      oncePar() // JIT/warm
      val bestPar = Seq(oncePar(), oncePar()).min
      if (sink == Long.MinValue) println(sink) // keep the loop unelidable
      (best, bestPar)
    }

    // Untimed warm-up (criterion-style): JIT, codegen compiler, parquet
    // reader and shuffle machinery all initialize here instead of inside
    // the first timed query.
    locally {
      import org.apache.spark.sql.functions._
      val r = spark.range(100000).toDF("i")
      r.join(broadcast(spark.range(100).toDF("i")), "i")
        .groupBy((col("i") % 7).as("k")).agg(count(lit(1)), sum("i"))
        .orderBy("k").count()
      SparkEntry.queries.get("q17_file_naming")
        .foreach(f => try f(spark, sfDir).count() catch { case _: Throwable => () })
      // carve-DAG warm-up: a 50-slot version of the dense bench
      val wu = CarvePipeline.run(spark,
        StridedSamplesRef(IndexedSeq(graft.fixtures.FixtureBytes.jpeg()), 4096L, 50L),
        EngineConfig(chunkSize = 64 * 1024, overlap = 4096),
        "bench-warmup", enableStrings = false, enableEntropy = false)
      wu.carvedFiles.count()
      wu.release()
    }

    // Dev loop: SPARK_GRAFT_ONLY=q31,q33 times just those queries (prefix
    // match) and skips the carving benches; SPARK_GRAFT_ONLY= (empty)
    // skips all queries and runs just the carving benches. The driver
    // never sets either.
    // The contract's "sf" field is the SCALE FACTOR — a number. Through
    // round 14 the bench emitted the sf DIRECTORY PATH there, and the
    // driver's bench capture recorded `parsed: null` every round (a
    // numeric-"sf" validation would fail on the string): a measurement
    // bug, fixed this round per the OPTIMIZATION_r15.md note. The raw
    // directory still ships, under "sf_dir".
    val sfNum: String = {
      val m = java.util.regex.Pattern.compile("sf([0-9]*\\.?[0-9]+)")
        .matcher(new java.io.File(sfDir).getName)
      if (m.find()) m.group(1) else "0"
    }
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").filter(_.nonEmpty).toSeq)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith))
    }

    // Throughput shapes run FIRST (before the multi-minute query sweep):
    // rounds 5-7 measured scan_only AFTER a 600 s suite and watched it
    // halve three rounds running with zero scan-kernel change — heap
    // fragmentation, codegen-cache pressure, and background GC from 160
    // queries all land inside the "steady-state" scan. Fresh-JVM-adjacent
    // placement plus per-sample capture (scan_only_samples) makes the
    // next slide attributable instead of mysterious.
    val (denseSec, denseCarved, scanSamples) = if (!only.exists(_.nonEmpty)) {
      // jpeg_dense: 500 × 34-byte JPEGs at 4 KiB stride, max_files 200 —
      // best-of-3 like every query (single-shot samples swung 0.27→2.55 s
      // across rounds on pure host noise)
      val denseRef = StridedSamplesRef(IndexedSeq(graft.fixtures.FixtureBytes.jpeg()), 4096L, 500L)
      val denseCfg = EngineConfig(
        fileTypes = EngineConfig.defaultFileTypes.filter(_.id == "jpeg").map(_.copy(minSize = 0)),
        chunkSize = 256 * 1024, overlap = 65536, maxFiles = Some(200))
      def denseOnce(): (Double, Long) = {
        val t0 = System.nanoTime()
        val r = CarvePipeline.run(spark, denseRef, denseCfg, "bench-dense",
          enableStrings = false, enableEntropy = false)
        val n = r.carvedFiles.count()
        r.release()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      denseOnce() // warm-up beyond the 50-slot pass above (full 200-file shape)
      val denseRuns = Seq(denseOnce(), denseOnce(), denseOnce())

      // scan_only: 8 GiB zero-filled evidence, full 43-pattern set
      // (reference shape: zero image scan, scaled up so the measurement
      // amortizes Spark's fixed job overhead — at 512 MiB the job
      // finishes in ~0.3 s and scheduling dominates). The zeros are
      // generated at read time — no driver allocation or broadcast; the
      // measurement is the scan automaton, as intended. 32 MiB chunks:
      // 256 tasks over the local cores (at cluster scale the default
      // 512 MiB chunk gives ~200k tasks at 100 TB).
      val scanBytes = 8L * 1024 * 1024 * 1024
      val zeroRef = ZerosRef(scanBytes)
      val scanCfg = EngineConfig(chunkSize = 32L * 1024 * 1024, overlap = 65536)
      def scanOnce(): Double = {
        val t0 = System.nanoTime()
        val r = CarvePipeline.run(spark, zeroRef, scanCfg, "bench-scan",
          enableStrings = false, enableEntropy = false)
        r.carvedFiles.count()
        r.release()
        (System.nanoTime() - t0) / 1e9
      }
      scanOnce(); scanOnce() // warm-up (JIT + codegen)
      (denseRuns.map(_._1).min, denseRuns.head._2,
        Seq(scanOnce(), scanOnce(), scanOnce()))
    } else (0.0, 0L, Nil)

    // Z-order payoff pair: the SAME two-predicate window count against
    // the events table written (a) in insertion order and (b) z-ordered
    // on (user bucket, cents) — the relayout's whole point is that (b)
    // skips most row groups on parquet min/max footer stats while (a)
    // reads everything. Layouts are built untimed; the timed region is
    // the filtered count, best of 3 (the BucketingSpec footer-stats
    // test proves the pruning; this measures what it buys).
    // bench fixtures land in temp dirs that MUST be removed afterwards —
    // the z-order pair alone writes ~2×5M rows of parquet, and repeated
    // bench runs would otherwise leak disk without bound
    def deleteRecursively(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
      f.delete()
    }
    val (zPlainSec, zOrderSec, zPlainSamples, zOrderSamples) = if (!only.exists(_.nonEmpty)) {
      import org.apache.spark.sql.functions._
      val zDir = java.nio.file.Files.createTempDirectory("graft-bench-zorder").toString
      // 50x-replicated events (~5M rows): at sf0.1 the raw table is 2 MB
      // and task scheduling dominates any layout effect; the amplified
      // shape gives min/max skipping real row groups to skip (the
      // scan_only precedent — the bench synthesizes its measurement
      // shape at a size where the operator, not overhead, is measured)
      val ev = graft.queries.Registry.table(spark, sfDir, "events")
        .crossJoin(spark.range(50).toDF("graft_rep"))
        .select(pmod(col("user_id") * 50 + col("graft_rep"), lit(4096)).as("x"),
          expr("CAST(round(value * 100) AS BIGINT)").as("y"),
          col("event_id"))
      ev.repartition(64).write.mode("overwrite").parquet(s"$zDir/plain")
      graft.sources.ZOrderLayout.writeZOrdered(ev, s"$zDir/zorder", "x", "y",
        bits = 15, numFiles = 64)
      // per-sample capture (the scan_only_samples rule, extended to
      // every pair anchor this round): a shipped window outlier must be
      // diagnosable from the artifact alone
      def timeWindow(path: String): Seq[Double] = {
        def once(): Double = {
          val t0 = System.nanoTime()
          spark.read.parquet(path)
            .filter(col("x").between(100L, 160L) && col("y").between(5000L, 5800L))
            .count()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warm-up (codegen + footer cache)
        Seq(once(), once(), once())
      }
      try {
        val (p, z) = (timeWindow(s"$zDir/plain"), timeWindow(s"$zDir/zorder"))
        (p.min, z.min, p, z)
      } finally deleteRecursively(new java.io.File(zDir))
    } else (0.0, 0.0, Seq.empty[Double], Seq.empty[Double])

    // Compaction payoff pair: the SAME indexed BM25 probe against a
    // BM25 index grown by 8 appends (9 files per bucket) and after
    // graft.Compact rewrites it to 1 file per bucket — measures the
    // read-side latency an appended index bleeds and compaction
    // restores. Build/append/compact are untimed; results are
    // row-identical by the OpsSpec pin, so only layout is measured.
    val (cmpAppendedSec, cmpCompactedSec, cmpAppendedSamples, cmpCompactedSamples) = if (!only.exists(_.nonEmpty)) {
      import org.apache.spark.sql.functions._
      val cmpRoot = java.nio.file.Files.createTempDirectory("graft-bench-compact")
        .toString
      val idxDir = cmpRoot + "/bidx"
      val docs = graft.queries.Registry.table(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      graft.llm.Retrieval.buildIndex(docs.filter(col("doc_id") % 9 === 0),
        "doc_id", "text", idxDir, numBuckets = 8)
      (1 to 8).foreach { k =>
        graft.llm.Retrieval.appendToIndex(docs.filter(col("doc_id") % 9 === k),
          "doc_id", "text", idxDir)
      }
      def timeProbe(): Seq[Double] = {
        def once(): Double = {
          val t0 = System.nanoTime()
          graft.llm.Retrieval.bm25TopKIndexed(spark, idxDir,
            Seq(Seq("the", "data"), Seq("a", "of", "query")), k = 10).count()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warm-up
        Seq(once(), once(), once())
      }
      try {
        val before = timeProbe()
        graft.llm.Retrieval.compactIndex(spark, idxDir)
        val after = timeProbe()
        (before.min, after.min, before, after)
      } finally deleteRecursively(new java.io.File(cmpRoot))
    } else (0.0, 0.0, Seq.empty[Double], Seq.empty[Double])

    // Mega-cluster skew pair: thresholdSweep and clusterProvenance on a
    // synthetic where ONE boilerplate text covers 30% of the documents
    // table — the duplication shape a crawl-heavy corpus actually has.
    // The sweep's CC input is duplication-invariant (copy-weighted text
    // reps, PlanSpec pin), so this measures that the pair/CC family
    // degrades gracefully instead of paying n²/2 same-text edges; the
    // provenance pass exercises the maxPerGroup output cap on the same
    // skew. Best of 3 after one warm-up, caches released per run.
    val (skewSweepSec, skewProvSec, skewSweepSamples, skewProvSamples) = if (!only.exists(_.nonEmpty)) {
      import org.apache.spark.sql.functions._
      val mega = "the mega cluster boilerplate text that floods a " +
        "crawl heavy corpus with identical copies"
      val skewed = graft.queries.Registry.table(spark, sfDir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 10 < 3, lit(mega))
            .otherwise(col("text")).as("text"))
      def time(f: () => Unit): Seq[Double] = {
        def once(): Double = {
          val t0 = System.nanoTime()
          f()
          val sec = (System.nanoTime() - t0) / 1e9
          graft.llm.CacheRegistry.releaseAll(spark)
          spark.catalog.clearCache()
          sec
        }
        once() // warm-up
        Seq(once(), once(), once())
      }
      val sweep = time { () =>
        graft.llm.Dedup.thresholdSweep(skewed, "doc_id", "text",
          Seq(8000L, 9600L)).count(); ()
      }
      val prov = time { () =>
        graft.llm.Dedup.clusterProvenance(
          skewed.select(col("doc_id").as("id"), md5(col("text")).as("comp")),
          "id", "comp", maxPerGroup = 5).count(); ()
      }
      (sweep.min, prov.min, sweep, prov)
    } else (0.0, 0.0, Seq.empty[Double], Seq.empty[Double])

    // WARC parse throughput: a 512 MiB synthetic archive (8,192 records
    // of 64 KiB payload — the WET-conversion shape), parsed by the
    // chunk-parallel anchor scan at 32 MiB chunks; the timed region is
    // parse + (count, Σcontent_length), best of 3 after one warm-up.
    // The archive is a content-independent fixture cached in /tmp (the
    // plantedImage discipline) so repeated bench runs pay the write
    // once. Measures the reader the crawl front door runs on.
    val (warcSec, warcMibps, warcSamples) = if (!only.exists(_.nonEmpty)) {
      import org.apache.spark.sql.functions._
      val nRecs = 8192
      val payload = ("lorem ipsum dolor sit amet " * 2520).substring(0, 65536)
      val body = payload.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val fixture = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft-bench-warc-v1-$nRecs.warc")
      def recordBytes(id: Int): Array[Byte] =
        graft.fixtures.FixtureBytes.warcRecord(s"http://bench/doc/$id", body)
      // expected fixture size WITHOUT serializing 8k × 64 KiB records
      // on every run (~540 MB of driver garbage before timed sections):
      // record length = the id-0 template plus the id's extra digits
      val baseLen = recordBytes(0).length.toLong
      val expectLen = (0 until nRecs).map(i =>
        baseLen + (i.toString.length - 1)).sum
      if (!(fixture.isFile && fixture.length() == expectLen)) {
        val tmp = new java.io.File(fixture.getParentFile, fixture.getName + ".tmp")
        val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(tmp))
        try (0 until nRecs).foreach(i => out.write(recordBytes(i)))
        finally out.close()
        java.nio.file.Files.move(tmp.toPath, fixture.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      def once(): Double = {
        val t0 = System.nanoTime()
        val parsed = graft.sources.WarcCorpus.read(spark, fixture.toString,
          chunkSize = 32L * 1024 * 1024)
        parsed.agg(count(lit(1)), sum(col("content_length"))).head()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val xs = Seq(once(), once(), once())
      val sec = xs.min
      (sec, fixture.length() / (1024.0 * 1024.0) / sec, xs)
    } else (0.0, 0.0, Seq.empty[Double])

    // Per-record-gzip WARC parse throughput: the SAME 8,192 records as
    // warc_parse above but each deflated into its own gzip member (the
    // Common Crawl layout); the timed region is magic-scan + member-
    // wise inflate + CRC verify + parse. Reported both ways: MiB/s
    // over the COMPRESSED archive (the crawl-ops unit) and over the
    // inflated payload mass (comparable to warc_parse_mibps).
    val (warcGzSec, warcGzMibps, warcGzInflMibps, warcGzSamples) = if (!only.exists(_.nonEmpty)) {
      import org.apache.spark.sql.functions._
      val nRecs = 8192
      // half repeated text, half seeded-PRNG bytes → the member
      // deflates ~2x, a realistic crawl ratio (pure lorem compresses
      // 260x and turns the compressed-MiB/s anchor into noise)
      val lorem = ("lorem ipsum dolor sit amet " * 1260).substring(0, 32768)
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val noise = new Array[Byte](32768)
      new java.util.Random(20260816L).nextBytes(noise)
      val body = lorem ++ noise
      val fixture = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft-bench-warcgz-v2-$nRecs.warc.gz")
      if (!fixture.isFile) {
        val tmp = new java.io.File(fixture.getParentFile, fixture.getName + ".tmp")
        val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(tmp))
        try (0 until nRecs).foreach { i =>
          out.write(graft.fixtures.FixtureBytes.gzMember(
            graft.fixtures.FixtureBytes.warcRecord(s"http://bench/doc/$i", body)))
        } finally out.close()
        java.nio.file.Files.move(tmp.toPath, fixture.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      var inflated = 0L
      def once(): Double = {
        val t0 = System.nanoTime()
        val parsed = graft.sources.WarcCorpus.readGz(spark, fixture.toString,
          chunkSize = 32L * 1024 * 1024)
        val r = parsed.agg(count(lit(1)), sum(col("content_length"))).head()
        inflated = r.getLong(1)
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val xs = Seq(once(), once(), once())
      val sec = xs.min
      (sec, fixture.length() / (1024.0 * 1024.0) / sec,
        inflated / (1024.0 * 1024.0) / sec, xs)
    } else (0.0, 0.0, 0.0, Seq.empty[Double])

    // Production-shape tokenizer cost curve: the oracle chain pins the
    // unigram trainer/encoder exact at vocabSize=48 and the boundary
    // spec proves 65,536 compiles — NEITHER measures the real cost
    // shape. Train an 8k-piece vocab on the corpus, then encode the
    // corpus with it. Single timed run each: these are multi-second
    // cost-CURVE anchors (how train/encode scale with vocab), not
    // noise-floor regression pins, and a best-of-3 would add minutes
    // of wall clock for no added signal.
    val (tok8kTrainSec, tok8kEncodeSec) = if (!only.exists(_.nonEmpty)) {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val docs = graft.queries.Registry.table(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      val t0 = System.nanoTime()
      // the collect IS part of the train cost: the artifact a serving
      // path loads is the materialized piece table
      val pieces = graft.llm.TextAnalysis.unigramTrainVocab(docs, "text",
          vocabSize = 8192, maxPiece = 4, iters = 2)
        .select(col("piece"), col("cnt"), col("cost_micro"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val trainSec = (System.nanoTime() - t0) / 1e9
      graft.llm.CacheRegistry.releaseAll(spark)
      spark.catalog.clearCache()
      val vocabDf = pieces.toSeq.toDF("piece", "cnt", "cost_micro")
      val t1 = System.nanoTime()
      graft.llm.TextAnalysis.unigramEncode(docs, "doc_id", "text", vocabDf,
        maxPiece = 4, unkCostMicro = Some(20000000L)).count()
      val encSec = (System.nanoTime() - t1) / 1e9
      graft.llm.CacheRegistry.releaseAll(spark)
      spark.catalog.clearCache()
      (trainSec, encSec)
    } else (0.0, 0.0)

    // Re-rank payoff pair at the PRODUCTION PQ shape (m=16 subspaces,
    // 256-entry codebook — q285 sizes recall over kCand; this measures
    // what the refine stage costs): plain ADC top-5 vs ADC+exact
    // re-rank at the kCand=25 recall-saturation point from the q285
    // table, 10 queries, best of 3.
    val (rrAdcSec, rrRerankSec, rrAdcSamples, rrRerankSamples) = if (!only.exists(_.nonEmpty)) {
      import org.apache.spark.sql.functions._
      val emb = graft.queries.Registry.table(spark, sfDir, "embeddings")
      val cb = emb.filter(col("vec_id") < 256)
      val qs = emb.filter(col("vec_id").between(300, 309))
      def time(f: () => Long): Seq[Double] = {
        def once(): Double = {
          val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
        }
        once() // warm-up
        Seq(once(), once(), once())
      }
      val adc = time(() => graft.llm.Pq.adcTopK(
        emb, "vec_id", "embedding", cb, qs, k = 5, m = 16).count())
      val rr = time(() => graft.llm.Pq.adcTopKReranked(
        emb, "vec_id", "embedding", cb, qs, k = 5, kCand = 25, m = 16).count())
      (adc.min, rr.min, adc, rr)
    } else (0.0, 0.0, Seq.empty[Double], Seq.empty[Double])
    // Each query runs N times and reports the min (criterion-style
    // steady state): run 1 absorbs first-touch costs the sf0.001 warm-up
    // cannot — page-cache-cold sf0.1 parquet reads and AQE-replanned
    // codegen (plan shape at sf0.1 can differ from sf0.001, e.g. a join
    // crossing the broadcast threshold) — run 2 measures the operator.
    // SPARK_GRAFT_REPEAT overrides for dev loops.
    // 3 timed runs per query: with 2, one host-contention window lands in
    // both and the reported min is inflated severalfold (observed: a
    // 1.9 s-steady query printing 7.2 s); the third sample costs ~15 s
    // over the whole sweep and restores a usable noise floor.
    val repeat = sys.env.get("SPARK_GRAFT_REPEAT").map(_.toInt).getOrElse(3)

    // Per-query codegen/JIT warm-up at the smallest SF (criterion-style,
    // untimed): the generated-code cache is keyed by plan shape, not
    // data, so a sf0.001 pass compiles exactly the classes the timed run
    // reuses — the timed region then measures the operator, not janino.
    locally {
      val sib = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      val wuDir = if (sib.isDirectory) sib.toString else sfDir
      selected.foreach { case (_, fn) =>
        try fn(spark, wuDir).count() catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
    }

    // INTERLEAVED repeats: `repeat` full passes over the suite, min per
    // query across passes. Back-to-back per-query repeats share any
    // multi-second host-contention window, poisoning every sample of
    // that query (round 4 recorded q20 at 9× its steady time); with the
    // whole suite between a query's samples, a stall lands in one pass
    // and the other passes restore the steady-state min.
    val times = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to repeat) {
      selected.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        // cache hygiene between queries (outside the timed region): each
        // query is self-contained, so its persisted intermediates are dead
        graft.llm.CacheRegistry.releaseAll(spark)
        spark.catalog.clearCache()
        times(name) = math.min(times.getOrElse(name, Double.MaxValue), sec)
      }
    }
    val results = selected.map { case (name, _) => name -> times(name) }
    if (only.exists(_.nonEmpty)) {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      emit(s"""{"metric":"total","value":${results.values.sum},"unit":"sec","queries":$qs,""" +
        s""""calibration_sec":$calibrationSec,"calibration_par_sec":$calibrationParSec,""" +
        s""""sf":$sfNum,"sf_dir":"$sfDir"}""")
      spark.stop()
      return
    }

    def sj(xs: Seq[Double]): String = xs.mkString("[", ",", "]")
    val scanBytes = 8L * 1024 * 1024 * 1024
    val scanSec = scanSamples.min
    val scanMibps = scanBytes / (1024.0 * 1024.0) / scanSec
    val samplesJson = scanSamples.mkString("[", ",", "]")
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    emit(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""calibration_sec":$calibrationSec,"calibration_par_sec":$calibrationParSec,""" +
      s""""scan_only_mibps":$scanMibps,"scan_only_sec":$scanSec,""" +
      s""""scan_only_samples":$samplesJson,""" +
      s""""zorder_plain_sec":$zPlainSec,"zorder_zorder_sec":$zOrderSec,""" +
      s""""zorder_plain_samples":${sj(zPlainSamples)},"zorder_zorder_samples":${sj(zOrderSamples)},""" +
      s""""bm25_appended_sec":$cmpAppendedSec,"bm25_compacted_sec":$cmpCompactedSec,""" +
      s""""bm25_appended_samples":${sj(cmpAppendedSamples)},"bm25_compacted_samples":${sj(cmpCompactedSamples)},""" +
      s""""rerank_adc_sec":$rrAdcSec,"rerank_refined_sec":$rrRerankSec,""" +
      s""""rerank_adc_samples":${sj(rrAdcSamples)},"rerank_refined_samples":${sj(rrRerankSamples)},""" +
      s""""skew_sweep_sec":$skewSweepSec,"skew_provenance_sec":$skewProvSec,""" +
      s""""skew_sweep_samples":${sj(skewSweepSamples)},"skew_provenance_samples":${sj(skewProvSamples)},""" +
      s""""warc_parse_sec":$warcSec,"warc_parse_mibps":$warcMibps,""" +
      s""""warc_parse_samples":${sj(warcSamples)},"warc_gz_parse_samples":${sj(warcGzSamples)},""" +
      s""""warc_gz_parse_sec":$warcGzSec,"warc_gz_parse_mibps":$warcGzMibps,""" +
      s""""warc_gz_inflated_mibps":$warcGzInflMibps,""" +
      s""""tokenizer_8k_train_sec":$tok8kTrainSec,"tokenizer_8k_encode_sec":$tok8kEncodeSec,""" +
      s""""jpeg_dense_sec":$denseSec,"jpeg_dense_files":$denseCarved,""" +
      s""""sf":$sfNum,"sf_dir":"$sfDir"}""")
    spark.stop()
  }

  /** Print the one-line JSON contract to stdout AND persist it to a file
    * (SPARK_GRAFT_BENCH_OUT, default BENCH_FULL.json in the CWD): the
    * driver's stdout tail-capture has truncated the per-query map to the
    * last ~55 of 140 entries; the file carries all of them.
    */
  private def emit(json: String): Unit = {
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"bench: could not write $out: $e") }
  }
}
