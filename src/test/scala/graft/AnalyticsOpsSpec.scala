package graft

import graft.llm.{Dedup, Profiling, Similarity, TextAnalysis}
import graft.operators.EventAnalytics
import graft.sources.ZOrderLayout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 analytics batch: burst/CUSUM detectors, blocked fuzzy
  * linkage, readability, k-anonymity, matryoshka recall, z-order
  * layout — unit/property pins beyond the DuckDB oracle gate.
  */
class AnalyticsOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-analytics-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import scala.jdk.CollectionConverters._

  private def eventsDf(rows: Seq[(String, String)]) = {
    import spark.implicits._
    rows.toDF("event_type", "d")
      .select(col("event_type"), to_timestamp(col("d")).as("ts"))
  }

  test("burstDays flags a planted 4x spike and nothing else") {
    // 8 quiet days at 10/day, then day 9 at 40
    val rows = (1 to 8).flatMap(d =>
      Seq.fill(10)(("a", f"2024-01-$d%02d 12:00:00"))) ++
      Seq.fill(40)(("a", "2024-01-09 12:00:00"))
    val out = EventAnalytics.burstDays(eventsDf(rows), "event_type", "ts",
        trail = 7, thresholdBp = 30000L)
      .orderBy("day").collect()
    assert(out.length === 9)
    assert(out.count(_.getAs[Boolean]("is_burst")) === 1)
    val spike = out.last
    assert(spike.getAs[Boolean]("is_burst"))
    assert(spike.getAs[Long]("rate_ratio_bp") === 40000L) // 40 vs mean 10
    assert(out.head.isNullAt(out.head.fieldIndex("rate_ratio_bp"))) // no baseline
  }

  test("cusumChangePoint lands on a planted level shift") {
    // 10 days at 5/day then 10 days at 15/day: |cusum| of D·c−T peaks
    // at the boundary (day 10)
    val rows = (1 to 10).flatMap(d => Seq.fill(5)(("a", f"2024-01-$d%02d 08:00:00"))) ++
      (11 to 20).flatMap(d => Seq.fill(15)(("a", f"2024-01-$d%02d 08:00:00")))
    val out = EventAnalytics.cusumChangePoint(eventsDf(rows), "event_type", "ts")
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[java.sql.Date]("cp_day").toString === "2024-01-10")
    assert(out.head.getAs[Long]("n_days") === 20L)
    // at the boundary: 10 days of 20·5−200 = −100 each
    assert(out.head.getAs[Long]("cusum_at_cp") === -1000L)
  }

  test("fuzzyBlockedPairs equals the unblocked within-token formulation") {
    import spark.implicits._
    // adversarial lengths around band boundaries: maxDist=2 → band
    // width 5, so ("red bolt", len 8, band 1) vs ("red boltxy", len 10,
    // band 2) is a true lev-2 pair that only the NEIGHBOR probe reaches
    val names = Seq("red bolt", "red bolt", "red boltxy", "red colt",
      "red wrench", "blue gear", "blue gears", "blue g", "zz zz", "w")
    val df = names.toDF("name")
    val blocked = Dedup.fuzzyBlockedPairs(df, "name", maxDist = 2)
      .select("val_a", "val_b", "dist", "n_a", "n_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(t => (t._1, t._2)).toSeq
    // reference: all pairs of distinct values sharing the first token
    val counts = names.groupBy(identity).map { case (v, g) => (v, g.size.toLong) }
    val distinct = counts.keys.toSeq.sorted
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      a <- distinct; b <- distinct
      if a < b && a.split(" ").head == b.split(" ").head
      d = lev(a, b) if d <= 2
    } yield (a, b, d.toLong, counts(a), counts(b))).sortBy(t => (t._1, t._2))
    assert(blocked === expected)
    assert(expected.nonEmpty) // the fixture must actually exercise matches
  }

  test("readability: punctuated path vs 15-word fallback, exact values") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat. the dog ran!"),        // 6 words, 2 sentences
      (2L, Seq.fill(30)("go").mkString(" ")),   // no punct → 2 units
      (3L, "   ")                               // zero words → dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readability(df, "doc_id", "text")
      .orderBy("id").collect()
    assert(out.length === 2)
    val r1 = out.head
    assert(r1.getAs[Long]("n_words") === 6L)
    assert(r1.getAs[Long]("n_sentences") === 2L)
    // syllables: e,a,a,e,o,a vowel groups = 6
    assert(r1.getAs[Long]("n_syllables") === 6L)
    // 206835 − HALF_UP(1015·6/2) − HALF_UP(84600·6/6) = 206835−3045−84600
    assert(r1.getAs[Long]("fre_milli") === 206835L - 3045L - 84600L)
    val r2 = out(1)
    assert(r2.getAs[Long]("n_sentences") === 2L) // ceil(30/15)
  }

  test("kAnonymity returns exactly the sub-k classes") {
    import spark.implicits._
    val df = (Seq.fill(5)(("a", 1)) ++ Seq.fill(2)(("a", 2)) ++
      Seq.fill(1)(("b", 1))).toDF("seg", "band")
    val out = Profiling.kAnonymity(df, k = 5, Seq("seg", "band"))
      .orderBy("seg", "band").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(out === Seq(("a", 2, 2L), ("b", 1, 1L)))
  }

  test("matryoshkaRecall is 10000 bp at the full dimension") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.matryoshkaRecall(emb, "vec_id", "embedding",
        queries = emb.filter(col("vec_id") < 5), k = 3, dims = Seq(16, 64))
      .orderBy("m_dims").collect()
    assert(out.length === 2)
    assert(out.last.getAs[Long]("m_dims") === 64L)
    assert(out.last.getAs[Long]("mean_recall_bp") === 10000L)
    assert(out.head.getAs[Long]("mean_recall_bp") <= 10000L)
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  private def dedupCorpusDf = {
    import spark.implicits._
    // 40 docs over 8 templates → plenty of cross-slice dups
    (0L until 40L).map(i =>
      (i, s"tpl ${i % 8} alpha beta gamma delta tail ${i % 2}"))
      .toDF("doc_id", "text")
  }

  test("dedupAgainstIndex equals dedupAgainst row for row") {
    val docs = dedupCorpusDf
    val ref = docs.filter(col("doc_id") % 3 === 0)
    val batch = docs.filter(col("doc_id") % 3 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-didx").toFile
    dir.deleteOnExit()
    val idx = s"$dir/idx"
    Dedup.buildDedupIndex(ref, "doc_id", "text", idx, numBuckets = 4,
      shingleN = 3, numHashes = 8, rowsPerBand = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val indexed = rows(Dedup.dedupAgainstIndex(batch, "doc_id", "text", idx))
    val perCall = rows(Dedup.dedupAgainst(batch, ref, "doc_id", "text",
      shingleN = 3, numHashes = 8, rowsPerBand = 2))
    assert(indexed === perCall)
    assert(indexed.exists(_._2 == 1L), "fixture must plant exact dups")
  }

  test("appendToDedupIndex is idempotent and equals a full build") {
    val docs = dedupCorpusDf
    val ref = docs.filter(col("doc_id") % 3 === 0)
    val batch = docs.filter(col("doc_id") % 3 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-didx2").toFile
    dir.deleteOnExit()
    val (full, inc) = (s"$dir/full", s"$dir/inc")
    Dedup.buildDedupIndex(ref, "doc_id", "text", full, 4, 3, 8, 2)
    Dedup.buildDedupIndex(ref.filter(col("doc_id") % 6 === 0),
      "doc_id", "text", inc, 4, 3, 8, 2)
    Dedup.appendToDedupIndex(ref.filter(col("doc_id") % 6 === 3),
      "doc_id", "text", inc)
    // re-sending the same batch must be a no-op (anti-join fold)
    Dedup.appendToDedupIndex(ref.filter(col("doc_id") % 6 === 3),
      "doc_id", "text", inc)
    def rows(idx: String) =
      Dedup.dedupAgainstIndex(batch, "doc_id", "text", idx)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    assert(rows(full) === rows(inc))
    // distinct-keys invariant: no duplicate hash rows after re-append
    val h = spark.read.parquet(s"$inc/exact")
    assert(h.count() === h.distinct().count())
  }

  test("deleteFromDedupIndex: dead keys stop matching, shared keys survive, compact equals rebuild") {
    import spark.implicits._
    // reference: docs 0/1 share one exact text (shared key must SURVIVE
    // deleting doc 0); doc 2 is the sole owner of its content (its keys
    // must die); doc 3 stays untouched
    val ref = Seq(
      (0L, "shared body alpha beta gamma delta epsilon"),
      (1L, "shared body alpha beta gamma delta epsilon"),
      (2L, "solitary content zeta eta theta iota kappa"),
      (3L, "untouched words lambda mu nu xi omicron pi"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "shared body alpha beta gamma delta epsilon"), // dup of survivor 1
      (11L, "solitary content zeta eta theta iota kappa"), // dup of DELETED 2
      (12L, "novel text rho sigma tau upsilon phi chi"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-didxdel").toFile
    dir.deleteOnExit()
    val (idx, rebuilt) = (s"$dir/idx", s"$dir/rebuilt")
    Dedup.buildDedupIndex(ref, "doc_id", "text", idx, numBuckets = 4,
      shingleN = 3, numHashes = 8, rowsPerBand = 2)
    Dedup.deleteFromDedupIndex(spark, idx, Seq(0L, 2L))
    def rows(d: String) =
      Dedup.dedupAgainstIndex(batch, "doc_id", "text", d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    // PENDING stage: doc 1 still owns the shared key → 10 stays a dup;
    // doc 2's keys are dead → 11 is clean; novel doc unaffected
    val expected = Seq((10L, 1L, 1L), (11L, 0L, 0L), (12L, 0L, 0L))
    assert(rows(idx) === expected, "pending-tombstone probe")
    // COMPACTED stage: physical merge equals a rebuild over survivors
    Dedup.compactDedupIndex(spark, idx)
    assert(rows(idx) === expected, "compacted probe")
    Dedup.buildDedupIndex(ref.filter(col("doc_id").isin(1L, 3L)),
      "doc_id", "text", rebuilt, numBuckets = 4,
      shingleN = 3, numHashes = 8, rowsPerBand = 2)
    assert(rows(idx) === rows(rebuilt), "compact must equal rebuild over survivors")
    // the tombstone list cleared and the key tables physically shrank
    assert(!new java.io.File(idx, "tombstones").exists())
    val exact = spark.read.parquet(s"$idx/exact").collect().map(_.getString(0)).toSet
    val rebuiltExact = spark.read.parquet(s"$rebuilt/exact").collect().map(_.getString(0)).toSet
    assert(exact === rebuiltExact, "exact key set must equal the rebuild's")
    // tombstoning EVERY surviving doc: compaction refuses loudly BEFORE
    // the fence goes up — the index stays valid and keeps serving
    Dedup.deleteFromDedupIndex(spark, idx, Seq(1L, 3L))
    val e = intercept[IllegalArgumentException] { Dedup.compactDedupIndex(spark, idx) }
    assert(e.getMessage.contains("zero surviving docs"), s"got $e")
    assert(Dedup.dedupIndexExists(idx), "refused compact must leave the index valid")
    rows(idx) // still probe-able (all keys now dead → all clean)
  }

  test("dedup index fails fast on NULL doc ids instead of collapsing groups") {
    import spark.implicits._
    // a NULL id would silently merge every doc into ONE minhash group
    // (band keys over the union of all shingles) and write sidecar rows
    // no takedown can match — the in-plan guard must raise instead
    val bad = Seq((java.lang.Long.valueOf(1L), "alpha beta gamma delta"),
      (null.asInstanceOf[java.lang.Long], "epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-didx-null").toFile
    dir.deleteOnExit()
    val e = intercept[Exception] {
      Dedup.buildDedupIndex(bad, "doc_id", "text", s"$dir/idx",
        numBuckets = 2, shingleN = 3, numHashes = 8, rowsPerBand = 2)
    }
    assert(e.getMessage.contains("castable to BIGINT") ||
      Option(e.getCause).exists(_.getMessage.contains("castable to BIGINT")),
      s"expected the id-contract error, got $e")
    // append path carries the same guard
    val ok = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    Dedup.buildDedupIndex(ok, "doc_id", "text", s"$dir/idx2",
      numBuckets = 2, shingleN = 3, numHashes = 8, rowsPerBand = 2)
    val e2 = intercept[Exception] {
      Dedup.appendToDedupIndex(bad, "doc_id", "text", s"$dir/idx2")
    }
    assert(e2.getMessage.contains("castable to BIGINT") ||
      Option(e2.getCause).exists(_.getMessage.contains("castable to BIGINT")),
      s"expected the id-contract error, got $e2")
  }

  test("appendToDedupIndex rejects re-used ids with pending tombstones") {
    import spark.implicits._
    val ref = Seq((0L, "original content alpha beta gamma"),
      (1L, "second document delta epsilon zeta")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-didx-reuse").toFile
    dir.deleteOnExit()
    val idx = s"$dir/idx"
    Dedup.buildDedupIndex(ref, "doc_id", "text", idx, numBuckets = 2,
      shingleN = 3, numHashes = 8, rowsPerBand = 2)
    Dedup.deleteFromDedupIndex(spark, idx, Seq(0L))
    // re-using the tombstoned id would retro-tombstone the NEW content
    // (its sidecar rows read as dead, compaction drops them) — reject
    val reuse = Seq((0L, "brand new replacement text eta theta"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.appendToDedupIndex(reuse, "doc_id", "text", idx)
    }
    assert(e.getMessage.contains("pending tombstones"), s"got $e")
    // fresh ids append fine while the tombstone is pending
    Dedup.appendToDedupIndex(
      Seq((5L, "fresh id content iota kappa lambda")).toDF("doc_id", "text"),
      "doc_id", "text", idx)
    // after compaction the deletes are physical and the id is free again
    Dedup.compactDedupIndex(spark, idx)
    Dedup.appendToDedupIndex(reuse, "doc_id", "text", idx)
    val flags = Dedup.dedupAgainstIndex(
        Seq((90L, "brand new replacement text eta theta")).toDF("doc_id", "text"),
        "doc_id", "text", idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(flags === Seq((90L, 1L)), "re-ingested content must match after compact")
  }

  test("interleaveSchedule keeps every prefix near the target mixture") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (s"s${i % 3}", i)).toDF("src", "id")
    val out = graft.llm.Curation.interleaveSchedule(docs, "src", "id",
        Map("s0" -> 5000L, "s1" -> 3000L, "s2" -> 2000L))
      .orderBy("vt", "src", "src_rank")
      .collect().map(r => (r.getString(0), r.getLong(3)))
    assert(out.length === 300)
    // vt formula: row i of source s lands at ceil(i*1e6/w)
    assert(out.find(_._1 == "s2").get._2 === 500L) // 1e6/2000
    // stride property: any prefix holds each source within ±2 of its
    // target share (the whole point vs batch-level sampling)
    val running = scala.collection.mutable.Map("s0" -> 0L, "s1" -> 0L, "s2" -> 0L)
    val target = Map("s0" -> 0.5, "s1" -> 0.3, "s2" -> 0.2)
    out.zipWithIndex.foreach { case ((src, _), k) =>
      running(src) += 1
      // sources exhaust at different times (100 docs each); only check
      // while all three still have supply
      if (k < 199) target.foreach { case (s0, share) =>
        val dev = math.abs(running(s0) - (k + 1) * share)
        assert(dev <= 2.0, s"prefix ${k + 1}: $s0 at ${running(s0)} vs target ${(k + 1) * share}")
      }
    }
  }

  test("trimmedMean removes planted outliers exactly") {
    import spark.implicits._
    // 18 values of 100 + outliers 0 and 100000 → 5%·20 = 1 cut each side
    val df = ((1L to 18L).map(i => ("a", 100L, i)) ++
      Seq(("a", 0L, 19L), ("a", 100000L, 20L))).toDF("g", "v", "id")
    val out = graft.llm.Profiling.trimmedMean(df, "g", "v", "id", trimBp = 500L)
      .collect().head
    assert(out.getAs[Long]("n_total") === 20L)
    assert(out.getAs[Long]("n_kept") === 18L)
    assert(out.getAs[Long]("kept_sum") === 1800L)
    assert(out.getAs[Long]("trimmed_mean_milli") === 100000L) // 100.000
  }

  test("qualityBlend: singleton source is neutral, ranks are exact") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", "x y z"),          // src a: len rank by doc id
      (2L, "a", "x x x x x"),
      (3L, "b", "lone doc here")   // singleton source
    ).toDF("doc_id", "src", "text2").select(col("doc_id"),
      col("src"), col("text2").as("text"))
    val out = graft.llm.TextAnalysis.qualityBlend(df, "doc_id", "text", "src")
      .orderBy("id").collect()
    val byId = out.map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(3L).getAs[Long]("len_bp") === 5000L)
    assert(byId(3L).getAs[Long]("ttr_bp") === 5000L)
    assert(byId(3L).getAs[Long]("blend_bp") === 5000L)
    // src a: doc 1 len 5 < doc 2 len 9 → len_bp 0 / 10000; ttr: doc 2
    // (1 distinct of 5 → 2000bp) < doc 1 (3 of 3 → 10000bp)
    assert(byId(1L).getAs[Long]("len_bp") === 0L)
    assert(byId(2L).getAs[Long]("len_bp") === 10000L)
    assert(byId(1L).getAs[Long]("ttr_bp") === 10000L)
    assert(byId(2L).getAs[Long]("ttr_bp") === 0L)
    assert(byId(1L).getAs[Long]("blend_bp") === 5000L)
  }

  test("zValue interleaves bits exactly") {
    import spark.implicits._
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (63L, 63L))
      .toDF("x", "y")
      .select(col("x"), col("y"), ZOrderLayout.zValue(col("x"), col("y"), 6).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    def ref(x: Long, y: Long) = (0 until 6).map(i =>
      (((x >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))).sum
    out.foreach { case (x, y, z) => assert(z === ref(x, y), s"($x,$y)") }
    assert(ref(63L, 63L) === 4095L)
  }

  test("writeZOrdered bounds every file's rectangle in BOTH dimensions") {
    import spark.implicits._
    // 64×64 grid, one row each — uniform worst case for a 1-D sort
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
    val df = grid.toDF("x", "y").repartition(8)
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toFile
    dir.deleteOnExit()
    val path = s"$dir/z"
    ZOrderLayout.writeZOrdered(df, path, "x", "y", bits = 6, numFiles = 16)
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg((max(col("x")) - min(col("x"))).as("xr"),
        (max(col("y")) - min(col("y"))).as("yr"))
      .collect()
    assert(perFile.length === 16)
    // a 1-D x-sort at 16 files gives yr = 63 in every file; z-order
    // must bound BOTH ranges well below the full extent in every file
    perFile.foreach { r =>
      assert(r.getAs[Long]("xr") <= 31, s"file x-range too wide: $r")
      assert(r.getAs[Long]("yr") <= 31, s"file y-range too wide: $r")
    }
  }

  test("benfordProfile: all-digit-1 group hits 10000 bp with 9 rows") {
    import spark.implicits._
    val df = Seq.fill(7)(("a", 123L)).toDF("g", "v")
    val out = EventAnalytics.benfordProfile(df, "g", "v")
      .orderBy("digit").collect()
    assert(out.length === 9) // zero-count digits present via the grid
    val d1 = out.head
    assert(d1.getAs[Long]("digit") === 1L)
    assert(d1.getAs[Long]("n") === 7L)
    assert(d1.getAs[Long]("obs_bp") === 10000L)
    assert(d1.getAs[Long]("dev_bp") === 10000L - 3010L)
    out.tail.foreach(r => assert(r.getAs[Long]("obs_bp") === 0L))
    // negatives use |v|; zero carries no significant digit
    val neg = EventAnalytics.benfordProfile(
      Seq(("a", -9L), ("a", 0L)).toDF("g", "v"), "g", "v").collect()
    assert(neg.map(r => (r.getAs[Long]("digit"), r.getAs[Long]("n")))
      .toMap.apply(9L) === 1L)
    assert(neg.map(_.getAs[Long]("n")).sum === 1L)
  }

  test("madOutlierReport: exact lower medians, MAD, planted outlier") {
    import spark.implicits._
    val df = (Seq(1L, 1L, 2L, 3L, 100L).map(("a", _)) ++
      Seq(1L, 2L, 3L, 4L).map(("b", _))).toDF("g", "v")
    val out = Profiling.madOutlierReport(df, "g", "v", kNum = 3L)
      .orderBy("g").collect()
    val a = out.head
    // median of {1,1,2,3,100} = 2; devs {1,1,0,1,98} → MAD 1; 100 flagged
    assert(a.getAs[Long]("n_rows") === 5L)
    assert(a.getAs[Long]("median") === 2L)
    assert(a.getAs[Long]("mad") === 1L)
    assert(a.getAs[Long]("n_outliers") === 1L)
    val b = out.last
    // even count: lower median of {1,2,3,4} = 2; devs {1,0,1,2} → MAD 1
    assert(b.getAs[Long]("median") === 2L)
    assert(b.getAs[Long]("mad") === 1L)
    assert(b.getAs[Long]("n_outliers") === 0L)
  }

  test("madOutlierReport: MAD 0 flags every value off the median") {
    import spark.implicits._
    val df = Seq(5L, 5L, 5L, 9L).map(("a", _)).toDF("g", "v")
    val r = Profiling.madOutlierReport(df, "g", "v").collect().head
    assert(r.getAs[Long]("mad") === 0L)
    assert(r.getAs[Long]("n_outliers") === 1L)
  }

  test("fdProfile: holds/violations with NULL semantics") {
    import spark.implicits._
    val df = Seq(
      (Some("k1"), Some("x")), (Some("k1"), Some("x")),
      (Some("k2"), Some("y")), (Some("k2"), Some("z")), // violation
      (Some("k3"), None), // all-NULL dep → 0 branches, not a violation
      (None, Some("w"))   // NULL det excluded entirely
    ).toDF("det", "dep")
    val out = Profiling.fdProfile(df, Seq(("det", "dep"))).collect().head
    assert(out.getAs[Long]("n_dets") === 3L)
    assert(out.getAs[Long]("n_violating") === 1L)
    assert(out.getAs[Long]("max_branch") === 2L)
    assert(out.getAs[Long]("holds") === 0L)
    val key = Profiling.fdProfile(
      Seq(("a", 1L), ("b", 2L), ("a", 1L)).toDF("det", "dep"),
      Seq(("det", "dep"))).collect().head
    assert(key.getAs[Long]("holds") === 1L)
    assert(key.getAs[Long]("n_violating") === 0L)
  }

  test("lDiversity reports exactly the sub-l classes with sizes") {
    import spark.implicits._
    val df = Seq(
      ("q1", "s1"), ("q1", "s1"), ("q1", "s2"), // 2 distinct → fails l=3
      ("q2", "s1"), ("q2", "s2"), ("q2", "s3")  // 3 distinct → passes
    ).toDF("q", "s")
    val out = Profiling.lDiversity(df, l = 3, Seq("q"), "s").collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("q") === "q1")
    assert(out.head.getAs[Long]("class_size") === 3L)
    assert(out.head.getAs[Long]("n_sensitive") === 2L)
  }

  test("seasonalNaiveBacktest: lag-7 alignment with a zero-filled gap") {
    // days 1..14 at 2/day, except day 3 absent (gap → 0) and day 10 at 5
    val rows = (1 to 14).filterNot(_ == 3).flatMap { d =>
      val k = if (d == 10) 5 else 2
      Seq.fill(k)(("a", f"2024-01-$d%02d 09:00:00"))
    }
    val out = EventAnalytics.seasonalNaiveBacktest(
        eventsDf(rows), "event_type", "ts", season = 7)
      .orderBy("day").collect()
    assert(out.length === 7) // days 8..14 evaluable
    val byDay = out.map(r =>
      r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("n"), r.getAs[Long]("forecast"),
          r.getAs[Long]("abs_err"))).toMap
    // day 10's forecast is day 3's count — absent, so the DENSE grid
    // supplies a real zero
    assert(byDay("2024-01-10") === ((5L, 0L, 5L)))
    assert(byDay("2024-01-08") === ((2L, 2L, 0L)))
    assert(byDay("2024-01-14") === ((2L, 2L, 0L)))
  }

  test("linkPrediction: path and square graphs, hub cap semantics") {
    import spark.implicits._
    import graft.operators.GraphOps
    // path a-b-c: only non-adjacent pair (a,c), one common neighbor b
    val path = Seq(("a", "b"), ("b", "c")).toDF("s", "d")
    val p = GraphOps.linkPrediction(path, "s", "d", topK = 10).collect()
    assert(p.length === 1)
    assert(p.head.getAs[String]("node_a") === "a")
    assert(p.head.getAs[String]("node_b") === "c")
    assert(p.head.getAs[Long]("common_neighbors") === 1L)
    assert(p.head.getAs[Long]("pref_attachment") === 1L)
    // square a-b-c-d-a: diagonals (a,c) and (b,d), two common neighbors
    val sq = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")).toDF("s", "d")
    val q = GraphOps.linkPrediction(sq, "s", "d", topK = 10)
      .orderBy("node_a").collect()
    assert(q.map(r => (r.getAs[String]("node_a"), r.getAs[String]("node_b"),
      r.getAs[Long]("common_neighbors"))).toSeq ===
      Seq(("a", "c", 2L), ("b", "d", 2L)))
    // star: capping the hub center removes every wedge through it
    val star = Seq(("h", "x"), ("h", "y"), ("h", "z")).toDF("s", "d")
    assert(GraphOps.linkPrediction(star, "s", "d", 10, maxDegree = 2L)
      .count() === 0L)
    assert(GraphOps.linkPrediction(star, "s", "d", 10).count() === 3L)
  }

  test("applyChangelog: latest-wins, delete, same-seq tie, insert, untouched") {
    import spark.implicits._
    import graft.operators.CdcApply
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "payload")
    val changes = Seq(
      (1L, "a1", 1L, "U"), (1L, "a2", 3L, "U"), // double update → a2
      (2L, "b", 2L, "D"),                       // delete
      (3L, "c9", 5L, "U"), (3L, "c9", 5L, "D"), // tie → delete wins
      (9L, "new", 1L, "I")                      // insert
    ).toDF("k", "payload", "graft_seq", "graft_op")
    val out = CdcApply.applyChangelog(base, changes, Seq("k"),
        "graft_seq", "graft_op")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out === Seq((1L, "a2"), (4L, "d"), (9L, "new")))
    // idempotence: applying an empty changelog is the identity
    val empty = changes.filter(col("k") < 0)
    val same = CdcApply.applyChangelog(base, empty, Seq("k"),
        "graft_seq", "graft_op")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(same === Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("applyChangelog same-(key,seq) upsert tie resolves by payload hash, plan-independently") {
    import spark.implicits._
    import graft.operators.CdcApply
    val base = Seq((0L, "z")).toDF("k", "payload")
    val changes = Seq((1L, "p", 4L, "U"), (1L, "q", 4L, "U"))
      .toDF("k", "payload", "graft_seq", "graft_op")
    def run(c: org.apache.spark.sql.DataFrame) =
      CdcApply.applyChangelog(base, c, Seq("k"), "graft_seq", "graft_op")
        .filter(col("k") === 1L).collect().map(_.getString(1)).toSeq
    val a = run(changes)
    // different physical plan (reversed input order, one partition) must
    // surface the SAME winner: the max-xxhash64 payload
    val b = run(changes.orderBy(col("payload").desc).repartition(1))
    assert(a.length === 1 && a === b, s"tie winner plan-dependent: $a vs $b")
    val expected = Seq("p", "q").maxBy(p =>
      Seq((1L, p, 4L, "U")).toDF("k", "payload", "graft_seq", "graft_op")
        .select(xxhash64(col("k"), col("payload"))).head().getLong(0))
    assert(a.head === expected)
  }

  test("Checks.InRange counts unparseable non-NULL values as violations") {
    import spark.implicits._
    import graft.llm.Checks
    val df = Seq(Some("5"), Some("oops"), None, Some("99")).toDF("v")
    val out = Checks.run(df, Seq(Checks.InRange("v", 0L, 10L)))
      .collect().head
    // "oops" (cast-null) and "99" (out of range) violate; NULL passes
    assert(out.getLong(1) === 2L, s"got ${out.getLong(1)} violations")
  }

  test("Checks.run counts violations per constraint with Deequ NULL rules") {
    import spark.implicits._
    import graft.llm.Checks
    val df = Seq(
      (Some(1L), Some("x"), Some(5L)),
      (Some(1L), Some("x"), Some(50L)),  // dup key; 50 out of range
      (None, Some("zz"), None),          // null key; zz not in set; NULL range passes
      (Some(2L), None, Some(-1L))        // NULL set passes; -1 out of range
    ).toDF("id", "cat", "v")
    val out = Checks.run(df, Seq(
        Checks.NotNull("id"), Checks.Unique(Seq("id")),
        Checks.InSet("cat", Seq("x", "y")), Checks.InRange("v", 0L, 10L)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("not_null(id)") === ((1L, 0L)))
    assert(out("unique(id)") === ((1L, 0L)))   // one surplus duplicate of key 1
    assert(out("in_set(cat)") === ((1L, 0L)))  // only zz
    assert(out("in_range(v,0,10)") === ((2L, 0L))) // 50 and -1
    val clean = Checks.run(df.filter(col("id") === 2L),
      Seq(Checks.NotNull("id"))).collect().head
    assert(clean.getLong(1) === 0L && clean.getLong(2) === 1L)
  }

  test("columnProfile reports rows/nulls/distinct per column") {
    import spark.implicits._
    val df = Seq((Some(1L), "a"), (Some(1L), "b"), (None, "b"))
      .toDF("id", "s")
    val out = graft.llm.Checks.columnProfile(df, Seq("id", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("id") === ((3L, 1L, 1L)))
    assert(out("s") === ((3L, 0L, 2L)))
  }

  test("maxGapReport finds the widest silence and its earliest start") {
    import spark.implicits._
    def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq((0, 1L), (60, 2L), (300, 3L), (310, 4L), (550, 5L))
      .map { case (s, i) => ("a", t(s), i) }.toDF("g", "ts", "id")
    val r = EventAnalytics.maxGapReport(ev, "g", "ts", "id").collect().head
    // gaps 60, 240, 10, 240: max 240, tied — the EARLIEST start (t=60)
    assert(r.getAs[Long]("n_gaps") === 4L)
    assert(r.getAs[Long]("max_gap_s") === 240L)
    assert(r.getAs[java.sql.Timestamp]("gap_start") === t(60))
  }

  test("skyline2D keeps exactly the non-dominated points, duplicates intact") {
    import spark.implicits._
    val pts = Seq((1L, 10L, 1L), (2L, 5L, 5L), (3L, 1L, 10L),
      (4L, 5L, 4L), (5L, 10L, 1L)).toDF("id", "x", "y")
    val out = Profiling.skyline2D(pts, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    // (5,4) is dominated by (5,5); the duplicate (10,1) points both stay
    assert(out === Set(1L, 2L, 3L, 5L))
  }

  test("skyline prefrontier shrinks high-cardinality x and preserves the exact frontier") {
    import spark.implicits._
    // continuous-ish x: every x distinct (value compression is a no-op),
    // y mostly increasing with noise — frontier is small, mx is huge
    val pts = (1L to 4000L).map(i => (i, i, (i * 7 + (i * i) % 97) % 3000))
      .toDF("id", "x", "y").repartition(8)
    val base = pts.select(col("x"), col("y"))
    val mx = base.groupBy(col("x")).agg(max(col("y")).as("graft_my"))
    val kept = Profiling.skylinePrefrontier(mx, "x").count()
    assert(kept < 4000L / 4,
      s"pre-frontier kept $kept of 4000 distinct x — the block pass is not shrinking")
    // the full operator still matches the brute-force frontier
    val got = Profiling.skyline2D(pts, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    val rows = pts.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = rows.filter { case (_, x, y) =>
      !rows.exists { case (_, x2, y2) =>
        (x2 >= x && y2 >= y) && (x2 > x || y2 > y) }
    }.map(_._1).toSet
    assert(got === brute)
  }

  test("groupEntropy: zero for single-minded keys, ln2 for a 50/50 mix") {
    import spark.implicits._
    val df = (Seq.fill(5)((1L, "click")) ++
      Seq.fill(2)((2L, "click")) ++ Seq.fill(2)((2L, "buy"))).toDF("u", "c")
    val out = Profiling.groupEntropy(df, "u", "c")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === ((5L, 1L, 0L)))
    assert(out(2L) === ((4L, 2L, 693147L))) // ln 2 in micro-nats
  }

  test("interEventStats: metronomic CV2 is 0, planted burst is exact") {
    import spark.implicits._
    def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val even = Seq(0, 60, 120, 180).zipWithIndex
      .map { case (s, i) => ("m", t(s), i.toLong) }
    val burst = Seq(0, 0, 0, 180).zipWithIndex
      .map { case (s, i) => ("b", t(s), (10 + i).toLong) }
    val out = EventAnalytics.interEventStats(
        (even ++ burst).toDF("g", "ts", "id"), "g", "ts", "id")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("m") === ((3L, 60000L, 0L))) // 60/hour, zero variance
    // gaps {0,0,180}: CV² = (3·32400 − 32400)/32400 = 2 → 20000 bp
    assert(out("b") === ((3L, 60000L, 20000L)))
  }

  test("stickiness: exact DAU over windowed MAU with partial early windows") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-04-01 10:00:00"), (1L, "2024-04-03 10:00:00"),
      (2L, "2024-04-02 10:00:00"))
      .toDF("u", "d")
      .select(col("u"), to_timestamp(col("d")).as("ts"))
    val out = EventAnalytics.stickiness(ev, "u", "ts", windowDays = 3)
      .orderBy("day").collect()
      .map(r => (r.getAs[java.sql.Date](0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(out === Seq(
      ("2024-04-01", 1L, 1L, 10000L), // partial window: only itself
      ("2024-04-02", 1L, 2L, 5000L),
      ("2024-04-03", 1L, 2L, 5000L)))
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("sloBurn: two-window rule ignores a blip, fires on sustained burn") {
    import spark.implicits._
    // 6 quiet hours (20 ok events each), then 2 hours fully burning
    val rows = (0 to 5).flatMap(h => Seq.fill(20)(("svc", h, 0L))) ++
      (6 to 7).flatMap(h => Seq.fill(20)(("svc", h, 1L)))
    val df = rows.toDF("g", "h", "is_hi")
      .withColumn("ts", expr("timestamp_micros(h * 3600000000)"))
    val out = EventAnalytics.sloBurn(df, "g", "ts", "is_hi",
        budgetBp = 500L, longHours = 6)
      .orderBy("hour_idx").collect()
      .map(r => (r.getLong(1), r.getLong(4), r.getLong(5), r.getLong(6)))
    val byHour = out.map(t => t._1 -> t).toMap
    // first hot hour: fast burn 20x budget but the 6h window is still
    // diluted (20/120 errors → 3333 milli) → NO alert (it's a blip)
    assert(byHour(6L) === ((6L, 20000L, 3333L, 0L)))
    // second hot hour: 40/120 over the window → 6667 ≥ 6000 → alert
    assert(byHour(7L) === ((7L, 20000L, 6667L, 1L)))
    assert(byHour(5L)._4 === 0L)
  }

  test("autocorrelation: alternating series is -1000 at lag 1, +1000 at lag 2") {
    val rows = (1 to 8).flatMap { d =>
      val k = if (d % 2 == 1) 2 else 1
      Seq.fill(k)(("a", f"2024-03-$d%02d 10:00:00"))
    }
    val out = EventAnalytics.autocorrelation(eventsDf(rows), "event_type",
        "ts", maxLag = 2)
      .orderBy("lag").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out === Seq((1L, 7L, -1000L), (2L, 6L, 1000L)))
    // constant series: zero variance → NULL r
    val const = (1 to 5).flatMap(d =>
      Seq.fill(3)(("b", f"2024-03-$d%02d 10:00:00")))
    val c = EventAnalytics.autocorrelation(eventsDf(const), "event_type",
      "ts", maxLag = 1).collect().head
    assert(c.isNullAt(c.fieldIndex("r_milli")))
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("smoothedRates shrinks small keys toward the global rate exactly") {
    import spark.implicits._
    val df = (Seq.fill(2)(("a", 1L)) ++ Seq.fill(4)(("b", 0L)) ++
      Seq(("c", 1L), ("c", 0L), ("c", 1L), ("c", 0L))).toDF("k", "f")
    val out = Profiling.smoothedRates(df, "k", "f", priorStrength = 20L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // global: 4/10 → 4000 bp
    assert(out("a") === ((2L, 2L, 10000L, (2 * (20000 + 20 * 4000) + 22) / 44)))
    assert(out("b")._4 === (2 * (0 + 20 * 4000) + 24) / 48)
    assert(out("c")._3 === 5000L) // raw stays exact
    // shrinkage direction: a pulls DOWN toward 4000, b pulls UP
    assert(out("a")._4 < 10000L && out("a")._4 > 4000L)
    assert(out("b")._4 > 0L && out("b")._4 < 4000L)
  }

  test("affinityIndex: exact cross-multiplied over/under-representation") {
    import spark.implicits._
    val df = (Seq.fill(3)((1L, "x")) ++ Seq((1L, "y")) ++
      Seq((2L, "x")) ++ Seq.fill(3)((2L, "y"))).toDF("u", "c")
    val out = Profiling.affinityIndex(df, "u", "c")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        r.getAs[Long]("index_milli")).toMap
    // u1 is 75% x vs 50% global → 1500; y mirror → 500
    assert(out((1L, "x")) === 1500L)
    assert(out((1L, "y")) === 500L)
    assert(out((2L, "x")) === 500L)
    assert(out((2L, "y")) === 1500L)
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("chiSquareCells: zero under independence, exact under association") {
    import spark.implicits._
    val indep = Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val z = Profiling.chiSquareCells(indep.toDF("u", "v"), "u", "v")
      .collect()
    assert(z.length === 4)
    z.foreach(r => assert(r.getAs[Long]("contrib_micro") === 0L))
    // perfect association: O=20,T=40,R=C=20 → cell χ² = 400²/16000 = 10
    val dep = Seq.fill(20)(("a", "x")) ++ Seq.fill(20)(("b", "y"))
    val d = Profiling.chiSquareCells(dep.toDF("u", "v"), "u", "v")
      .collect()
    assert(d.length === 2)
    d.foreach(r => assert(r.getAs[Long]("contrib_micro") === 10000000L))
  }

  test("giniCoefficient: equality is 0, one-holder concentration is exact") {
    import spark.implicits._
    val df = (Seq.fill(4)(("eq", 7L)) ++
      Seq(("conc", 0L), ("conc", 0L), ("conc", 0L), ("conc", 100L)))
      .toDF("g", "v")
    val out = Profiling.giniCoefficient(df, "g", "v")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("eq") === 0L)
    assert(out("conc") === 7500L) // (2·4X − 5X)/(4X) = 3/4
  }

  test("ksStatistic: zero on identical samples, 10000 bp on disjoint ones") {
    import spark.implicits._
    val a = Seq(1L, 2L, 3L).toDF("v")
    val same = Profiling.ksStatistic(a, a, "v").collect().head
    assert(same.getAs[Long]("ks_bp") === 0L)
    val b = Seq(10L, 20L).toDF("v")
    val dis = Profiling.ksStatistic(a, b, "v").collect().head
    assert(dis.getAs[Long]("n_a") === 3L && dis.getAs[Long]("n_b") === 2L)
    assert(dis.getAs[Long]("ks_bp") === 10000L)
    assert(dis.getAs[Long]("at_value") === 3L) // CDFs fully apart at a's max
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("targetEncoding: leak-free LOO means, singleton NULL, signed math") {
    import spark.implicits._
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 7L), (5L, "c", 0L), (6L, "c", -10L))
      .toDF("id", "cat", "v")
    val out = Profiling.targetEncoding(df, "id", "cat", "v")
      .orderBy("id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out(1L) === Some(25000L)) // (20+30)/2
    assert(out(2L) === Some(20000L))
    assert(out(3L) === Some(15000L))
    assert(out(4L) === None)          // singleton: no other members
    assert(out(5L) === Some(-10000L)) // signed HALF_UP
    assert(out(6L) === Some(0L))
  }

  test("dailyTrend: exact unit slope on a planted linear ramp") {
    // counts 1..5 over five consecutive days → slope exactly 1/day
    val rows = (1 to 5).flatMap(d =>
      Seq.fill(d)(("a", f"2024-02-$d%02d 12:00:00")))
    val out = EventAnalytics.dailyTrend(eventsDf(rows), "event_type", "ts")
      .collect().head
    assert(out.getAs[Long]("n_days") === 5L)
    assert(out.getAs[Long]("slope_milli") === 1000L)
    // a single-day group has no slope and is omitted
    val one = EventAnalytics.dailyTrend(
      eventsDf(Seq(("b", "2024-02-01 09:00:00"))), "event_type", "ts")
    assert(one.count() === 0L)
  }

  test("mannKendall: rising ramp scores +n_pairs, flat scores zero") {
    val rise = (1 to 4).flatMap(d =>
      Seq.fill(d)(("a", f"2024-02-$d%02d 12:00:00")))
    val r = EventAnalytics.mannKendall(eventsDf(rise), "event_type", "ts")
      .collect().head
    assert(r.getAs[Long]("n_days") === 4L)
    assert(r.getAs[Long]("n_pairs") === 6L)
    assert(r.getAs[Long]("s_stat") === 6L) // strictly rising: every pair +1
    val flat = (1 to 4).flatMap(d =>
      Seq.fill(3)(("a", f"2024-02-$d%02d 12:00:00")))
    val f = EventAnalytics.mannKendall(eventsDf(flat), "event_type", "ts")
      .collect().head
    assert(f.getAs[Long]("s_stat") === 0L)
  }

  test("spearmanMatrix: monotone pair is +1000, anti-monotone is -1000") {
    import spark.implicits._
    val vecs = (1 to 6).map(k =>
      (k.toLong, Seq(k.toFloat, (k * k).toFloat, (-k).toFloat)))
      .toDF("vec_id", "embedding")
    val out = Similarity.spearmanMatrix(vecs, "vec_id", "embedding")
      .orderBy("di", "dj").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    // dim1 = k² is a monotone warp of dim0 → rank-perfect; dim2 = −k
    // reverses every rank
    assert(out((0L, 1L)) === 1000L)
    assert(out((0L, 2L)) === -1000L)
    assert(out((1L, 2L)) === -1000L)
  }

  test("graft_cov_cells matches a BigInt reference incl. >2^63 products and ragged rows") {
    import spark.implicits._
    graft.functions.TriCellFunctions.register(spark)
    // values whose pairwise products exceed Long.MaxValue (5e9² = 2.5e19)
    // — the regime the decimal(38,0) explode form was exact in — plus a
    // ragged short row and a NULL row (contributes nothing)
    val rows: Seq[Option[Seq[Long]]] = Seq(
      Some(Seq(5000000000L, -3L, 7L)),
      Some(Seq(-4000000000L, 11L, 2L)),
      Some(Seq(9L, -6000000000L)), // ragged: length 2
      None)
    val df = rows.toDF("sv")
    val got = df.agg(call_function("graft_cov_cells", col("sv")).as("c"))
      .select(explode(col("c")).as("p"))
      .select(col("p.di"), col("p.dj"), col("p.n"),
        col("p.graft_si").cast("string"), col("p.graft_sj").cast("string"),
        col("p.graft_sij").cast("string"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), BigInt(r.getString(3)), BigInt(r.getString(4)), BigInt(r.getString(5)))))
      .toMap
    val data = rows.flatten
    for (j <- 0 until 3; i <- 0 to j) {
      val contributing = data.filter(_.length > j)
      val expN = contributing.length.toLong
      val expSi = contributing.map(v => BigInt(v(i))).sum
      val expSj = contributing.map(v => BigInt(v(j))).sum
      val expSij = contributing.map(v => BigInt(v(i)) * BigInt(v(j))).sum
      assert(got((i.toLong, j.toLong)) === ((expN, expSi, expSj, expSij)),
        s"cell ($i,$j)")
    }
    assert(got.size === 6)
  }

  test("graft_d2_cells matches a BigInt reference on rank-like vectors") {
    import spark.implicits._
    graft.functions.TriCellFunctions.register(spark)
    val data = Seq(Seq(1L, 4L, 9L), Seq(2L, 2L, 1L), Seq(3L, 3000000000L, 5L))
    val got = data.toDF("rv")
      .agg(call_function("graft_d2_cells", col("rv")).as("c"))
      .select(explode(col("c")).as("p"))
      .select(col("p.di"), col("p.dj"), col("p.n"), col("p.graft_s").cast("string"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), BigInt(r.getString(3)))))
      .toMap
    for (j <- 0 until 3; i <- 0 until j) {
      val exp = data.map { v =>
        val d = BigInt(v(i) - v(j)); d * d
      }.sum
      assert(got((i.toLong, j.toLong)) === ((3L, exp)), s"cell ($i,$j)")
    }
    assert(got.size === 3)
  }

  test("embedCovariance fused aggregate equals the explode-form reference") {
    import spark.implicits._
    val vecs = (1 to 40).map(k =>
      (k.toLong, Seq(k * 0.01f, -k * 0.03f, (k % 7) * 0.11f, 0.5f - k * 0.002f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.embedCovariance(vecs, "embedding")
      .orderBy("di", "dj").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the pre-fusion plan shape, inlined as the reference
    graft.functions.VecFunctions.register(spark)
    val ref = vecs
      .select(call_function("graft_scale_q", col("embedding"), lit(10000.0)).as("graft_sv"))
      .select(explode(expr(
        """flatten(transform(sequence(1, size(graft_sv)), i ->
          |  transform(sequence(i, size(graft_sv)), j -> struct(
          |    CAST(i - 1 AS BIGINT) AS di, CAST(j - 1 AS BIGINT) AS dj,
          |    element_at(graft_sv, i) AS xi, element_at(graft_sv, j) AS xj))))"""
          .stripMargin)).as("p"))
      .select(col("p.di").as("di"), col("p.dj").as("dj"), col("p.xi").as("xi"),
        col("p.xj").as("xj"))
      .groupBy(col("di"), col("dj"))
      .agg(count(lit(1)).as("n"),
        sum(col("xi").cast("decimal(38,0)")).cast("decimal(38,0)").as("graft_si"),
        sum(col("xj").cast("decimal(38,0)")).cast("decimal(38,0)").as("graft_sj"),
        sum(col("xi").cast("decimal(38,0)") * col("xj").cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("graft_sij"))
      .select(col("di"), col("dj"), col("n"),
        expr(Similarity.covUExpr).as("cov_u"))
      .orderBy("di", "dj").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === ref.toSeq)
  }

  test("hillTailIndex replays the once-rounded log formula; short groups omitted") {
    import spark.implicits._
    val a = (1 to 21).map(i => ("a", (1000 / i).toLong, i.toLong)) // Pareto-ish
    val b = (1 to 20).map(i => ("b", 100L, 100L + i))              // only 20 rows
    val df = (a ++ b).toDF("g", "v", "id")
    val out = Profiling.hillTailIndex(df, "g", "v", "id", k = 20).collect()
    assert(out.length === 1 && out.head.getString(0) === "a")
    def lnr(x: Long) = math.round(math.log(x.toDouble) * 1000000.0)
    val sorted = a.map(_._2).sortBy(-_)
    val top = sorted.take(20).map(lnr).sum
    val ref = lnr(sorted(20))
    assert(out.head.getAs[Long]("hill_micro") ===
      (2 * (top - 20 * ref) + 20) / 40)
  }

  test("engagedTime caps idle gaps and never crosses the day boundary") {
    import spark.implicits._
    def t(day: Int, sec: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:${sec / 60}%02d:${sec % 60}%02d")
    val ev = Seq(
      (1L, t(1, 0), 1L), (1L, t(1, 100), 2L), (1L, t(1, 500), 3L),
      (1L, t(2, 0), 4L), // next day: no gap credit across midnight
      (2L, t(1, 0), 5L)  // singleton: zero engaged time
    ).toDF("u", "ts", "id")
    val out = EventAnalytics.engagedTime(ev, "u", "ts", "id", idleCapS = 300L)
      .orderBy("u", "day").collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1).toString,
        r.getLong(2), r.getLong(3))).toSeq
    // gaps 100 and 400→capped 300 → 400 engaged seconds on day 1
    assert(out === Seq(
      (1L, "2024-01-01", 3L, 400L),
      (1L, "2024-01-02", 1L, 0L),
      (2L, "2024-01-01", 1L, 0L)))
  }

  test("Scd2.lookup picks the valid-at version; no-match keeps NULLs") {
    import spark.implicits._
    import graft.operators.Scd2
    def t(min: Int) = new java.sql.Timestamp(min * 60000L)
    val fact = Seq((1L, "k", t(5)), (2L, "k", t(15)), (3L, "k", t(99)),
      (4L, "z", t(5))).toDF("id", "key", "ts")
    val dim = Seq(("k", t(0), t(10), 100L), ("k", t(10), t(20), 200L))
      .toDF("key", "vf", "vt", "rate")
    val out = Scd2.lookup(fact, dim, "key", "ts", "vf", "vt")
      .select("id", "rate").orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // boundary t(10) belongs to the SECOND interval (half-open); facts
    // past the last version and unknown keys survive with NULL payload
    assert(out.toSeq === Seq((1L, 100L), (2L, 200L), (3L, -1L), (4L, -1L)))
  }

  test("pathTrigrams counts ordered triples with deterministic top-k") {
    import spark.implicits._
    def t(min: Int) = new java.sql.Timestamp(min * 60000L)
    val ev = Seq(
      (1L, t(1), "a", 1L), (1L, t(2), "b", 2L), (1L, t(3), "c", 3L),
      (1L, t(4), "a", 4L), // user1: abc, bca
      (2L, t(1), "a", 5L), (2L, t(2), "b", 6L), (2L, t(3), "c", 7L)
    ).toDF("u", "ts", "s", "id")
    val out = EventAnalytics.pathTrigrams(ev, "u", "ts", "s", "id", topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(out === Set(("a", "b", "c", 2L), ("b", "c", "a", 1L)))
  }

  test("conversionLatency: exact rank quantiles over first-touch gaps") {
    import spark.implicits._
    def t(min: Int) = new java.sql.Timestamp(min * 60000L)
    // gaps (seconds): u1 60, u2 120, u3 300; u4 converts BEFORE first
    // view → excluded; u5 never converts
    val ev = Seq(
      (1L, t(0), "view"), (1L, t(1), "buy"),
      (2L, t(0), "view"), (2L, t(2), "buy"),
      (3L, t(0), "view"), (3L, t(5), "buy"),
      (4L, t(9), "view"), (4L, t(1), "buy"),
      (5L, t(0), "view")
    ).toDF("u", "ts", "s")
    val out = EventAnalytics.conversionLatency(ev, "u", "ts", "s",
        "view", "buy", probesBp = Seq(5000L, 10000L))
      .orderBy("q_bp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // n=3 gaps {60,120,300}: median target ⌈1.5⌉=2 → 120; max → 300
    assert(out === Seq((5000L, 120L, 3L), (10000L, 300L, 3L)))
  }

  test("ipwCalibration: estimator math exact, sampling deterministic") {
    import spark.implicits._
    val df = (1L to 512L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "g")
    val out = Profiling.ipwCalibration(df, "id", "g",
        Map("a" -> 64), defaultRate = 32)
      .orderBy("g").collect()
    out.foreach { r =>
      val (nTrue, nSmp, rate, est, err) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nTrue === 256L)
      assert(rate === (if (r.getString(0) == "a") 64L else 32L))
      assert(est === (2 * nSmp * 256 + rate) / (2 * rate)) // HALF_UP replay
      assert(err === (2 * 10000 * math.abs(est - nTrue) + nTrue) / (2 * nTrue))
      // md5-prefix sampling actually thins: kept strictly between 0 and all
      assert(nSmp > 0L && nSmp < nTrue)
    }
    // determinism: same input → same kept counts
    val again = Profiling.ipwCalibration(df, "id", "g",
        Map("a" -> 64), defaultRate = 32)
      .orderBy("g").collect().map(_.getLong(2)).toSeq
    assert(again === out.map(_.getLong(2)).toSeq)
  }

  test("equiDepthHistogram: exact ceil-rank boundaries on 1..10") {
    import spark.implicits._
    val df = (1L to 10L).map(("a", _)).toDF("g", "v")
    val out = Profiling.equiDepthHistogram(df, "g", "v", nBuckets = 4)
      .orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("upper_value"),
        r.getAs[Long]("target_rank"))).toSeq
    // targets ⌈b·10/4⌉ = 3,5,8,10 → boundaries 3,5,8,10
    assert(out === Seq((1L, 3L, 3L), (2L, 5L, 5L), (3L, 8L, 8L),
      (4L, 10L, 10L)))
  }

  test("joinSizeEstimate: exact total and tie-broken top keys") {
    import spark.implicits._
    val a = Seq(1L, 1L, 2L, 3L).toDF("ka")
    val b = Seq(1L, 2L, 2L, 9L).toDF("kb")
    val out = Profiling.joinSizeEstimate(a, "ka", b, "kb", topN = 1)
      .collect()
    assert(out.length === 1)
    val r = out.head
    // k1 and k2 both contribute 2; the tie breaks on the smaller key
    assert(r.getAs[Long]("join_key") === 1L)
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 1L)
    assert(r.getAs[Long]("contrib") === 2L)
    assert(r.getAs[Long]("est_total") === 4L) // k3/k9 never match
  }

  test("winsorizedMean clips at exact percentile values then averages") {
    import spark.implicits._
    val df = (1L to 10L).map(("a", _)).toDF("g", "v")
    val r = Profiling.winsorizedMean(df, "g", "v", loBp = 2500L,
      hiBp = 7500L).collect().head
    assert(r.getAs[Long]("lo_value") === 3L) // rank ⌈2.5⌉ = 3
    assert(r.getAs[Long]("hi_value") === 8L) // rank ⌈7.5⌉ = 8
    // clipped: 3,3,3,4,5,6,7,8,8,8 → sum 55 → mean 5.5 → 5500 milli
    assert(r.getAs[Long]("winsorized_mean_milli") === 5500L)
  }

  test("psiDrift: zero on identical distributions, signed on a shift") {
    import spark.implicits._
    import graft.llm.Profiling
    val a = (Seq.fill(6)(5L) ++ Seq.fill(4)(15L)).toDF("v")
    val same = Profiling.psiDrift(a, a, "v", 10L).collect()
    assert(same.length === 2)
    same.foreach(r => assert(r.getAs[Long]("psi_contrib") === 0L))
    // b shifts mass upward; bucket 0 over-represented in a (positive
    // delta, positive log-ratio → positive contribution), bucket 1
    // likewise positive (PSI contributions are non-negative when both
    // sides are present)
    val b = (Seq.fill(2)(5L) ++ Seq.fill(8)(15L)).toDF("v")
    val drift = Profiling.psiDrift(a, b, "v", 10L)
      .orderBy("bucket").collect()
    assert(drift.forall(_.getAs[Long]("psi_contrib") > 0L))
    // one-sided bucket → NULL contribution, counts still reported
    val c = Seq(25L).toDF("v")
    val oneSided = Profiling.psiDrift(a.union(c), a, "v", 10L)
      .orderBy("bucket").collect()
    val last = oneSided.last
    assert(last.getAs[Long]("n_b") === 0L)
    assert(last.isNullAt(last.fieldIndex("psi_contrib")))
  }
}
