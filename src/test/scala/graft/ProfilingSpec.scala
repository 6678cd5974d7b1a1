package graft

import graft.llm.{Profiling, Sketches, TextAnalysis, TopKSmallestAgg}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the profiling/membership operators: bounded top-k
  * aggregator semantics, stratified sample vs the window formulation,
  * quantile interpolation vs a naive sort, argmax tie-breaks, Bloom
  * filter no-false-negatives, doc frequency, and decontamination flags.
  */
class ProfilingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-profiling-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("TopKSmallestAgg buffers never exceed k and merge == global sort") {
    val agg = new TopKSmallestAgg(3)
    val xs = Seq((9L, 1L), (1L, 2L), (5L, 3L), (1L, 1L), (7L, 4L), (0L, 9L))
    val b = xs.foldLeft(agg.zero)(agg.reduce)
    assert(b.length == 3)
    // split arbitrarily, reduce halves, merge — same result as global
    val (l, r) = xs.splitAt(2)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged) == xs.sorted.take(3))
    assert(agg.finish(b) == xs.sorted.take(3))
  }

  test("stratifiedSample picks exactly min(k, |stratum|) smallest hashes per stratum") {
    import spark.implicits._
    val df = (1L to 40L).map(i => (if (i % 2 == 0) "even" else "odd", i))
      .toDF("lang", "doc_id")
      .union(Seq(("tiny", 100L)).toDF("lang", "doc_id"))
    val got = Profiling.stratifiedSample(df, "lang", "doc_id", 5)
    val bySize = got.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(bySize == Map("even" -> 5L, "odd" -> 5L, "tiny" -> 1L))
    // equivalence with the window formulation
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10).cast("long")
    val w = Window.partitionBy(col("stratum")).orderBy(col("sample_hash"), col("id"))
    val want = df.select(col("lang").as("stratum"), col("doc_id").as("id"), h.as("sample_hash"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5).drop("rn")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("groupQuantiles matches a naive sorted-array interpolation") {
    import spark.implicits._
    val vals = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L) // n=8
    val df = vals.map(("g", _)).toDF("g", "v")
    val got = Profiling.groupQuantiles(df, "g", "v", Seq(0.25, 0.5, 0.75))
      .orderBy("q_idx").select("q_value").as[Double].collect().toSeq
    val sorted = vals.sorted.map(_.toDouble)
    def q(p: Double) = {
      val rank = p * (sorted.length - 1)
      val lo = rank.toInt; val d = rank - lo
      sorted(lo) + (sorted(math.min(lo + 1, sorted.length - 1)) - sorted(lo)) * d
    }
    assert(got == Seq(q(0.25), q(0.5), q(0.75)))
  }

  test("argmaxPerGroup breaks ord ties on the smallest id") {
    import spark.implicits._
    val df = Seq(
      ("a", "s", 10L, 7L), ("a", "s", 10L, 3L), ("a", "s", 9L, 1L),
      ("b", "s", 5L, 2L)).toDF("lang", "source", "n_chars", "doc_id")
    val got = Profiling.argmaxPerGroup(df, Seq("lang", "source"), "n_chars", "doc_id")
      .orderBy("lang").select("best_id", "best_n_chars", "n_rows")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((3L, 10L, 3L), (2L, 5L, 1L)))
  }

  test("lengthHistogram buckets by bit length with zeros in bucket 0") {
    import spark.implicits._
    val df = Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L).toDF("n")
    val got = Profiling.lengthHistogram(df, "n")
      .orderBy("bucket").select("bucket", "n_docs")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L), (1L, 1L), (2L, 2L), (3L, 2L), (4L, 1L), (10L, 1L), (11L, 1L)))
  }

  test("bloom probe has no false negatives and matches a direct bit check") {
    import spark.implicits._
    val keys = (1 to 40).map(i => s"key$i").toDF("k")
    val words = Sketches.bloomBits(keys, "k", m = 256, kHashes = 3)
    val probe = (1 to 40).map(i => s"key$i").union((1 to 200).map(i => s"other$i")).toDF("k")
    val got = Sketches.bloomProbe(probe, "k", words, kHashes = 3)
    // every inserted key must hit
    assert(got.filter(col("k").startsWith("key") && col("bloom_hit") === 0).count() == 0)
    // some non-member should miss (256 bits, <=120 set, 3 hashes)
    assert(got.filter(col("k").startsWith("other") && col("bloom_hit") === 0).count() > 0)
  }

  test("docFrequency counts distinct docs and total occurrences per term") {
    import spark.implicits._
    val df = Seq((1L, "a b a"), (2L, "a c"), (3L, "c c c")).toDF("doc_id", "text")
    val got = TextAnalysis.docFrequency(df, "doc_id", "text", 10)
      .orderBy("term").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 2L, 3L), ("b", 1L, 1L), ("c", 2L, 4L)))
  }

  test("capPerKey keeps exactly min(k, |key|) rows per key, flagging the rest") {
    import spark.implicits._
    val df = (1L to 30L).map(i => (if (i % 3 == 0) "big" else "small", i))
      .toDF("source", "doc_id")
    val got = Profiling.capPerKey(df, "source", "doc_id", 7)
    assert(got.count() == 30) // every row present, flagged
    val keptBy = got.filter(col("kept") === 1L).groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(keptBy == Map("big" -> 7L, "small" -> 7L))
    // flags agree with the stratified pick set
    val picks = Profiling.stratifiedSample(df, "source", "doc_id", 7)
      .select("id").as[Long].collect().toSet
    val keptIds = got.filter(col("kept") === 1L).select("doc_id").as[Long].collect().toSet
    assert(keptIds == picks)
  }

  test("dedupAgainst flags exact and near duplicates of the reference corpus") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val ref = Seq((100L, base)).toDF("doc_id", "text")
    val fresh = Seq(
      (1L, base),                                   // exact + near
      (2L, base.replace("kappa", "lambda")),        // near only (shares bands)
      (3L, "totally different words with zero overlap here now")) // neither
      .toDF("doc_id", "text")
    val got = graft.llm.Dedup.dedupAgainst(fresh, ref, "doc_id", "text",
        shingleN = 3, numHashes = 8, rowsPerBand = 2)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 1L), (2L, 0L, 1L), (3L, 0L, 0L)), s"got $got")
  }

  test("simHashPairs finds identical docs at hamming 0 and skips unrelated text") {
    import spark.implicits._
    val same = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(
      (1L, same), (2L, same),
      (3L, "completely unrelated words about database engines and storage")).toDF("doc_id", "text")
    val got = graft.llm.Dedup.simHashPairs(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    graft.llm.CacheRegistry.releaseAll(spark)
    assert(got == Set((1L, 2L, 0L)), s"got $got")
  }

  test("decontaminate flags exactly the train docs sharing enough grams") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps high"), // shares 3 trigrams with bench
      (2L, "completely different words here now")).toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox jumps away")).toDF("doc_id", "text")
    val got = TextAnalysis.decontaminate(train, bench, "doc_id", "text", n = 3, minShared = 3L)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 0L), (2L, 0L, 1L)))
  }

  test("bootstrapMeans matches an md5-threshold reference and is deterministic") {
    import spark.implicits._
    val rows = (1L to 200L).map(i => (i, 10L + i % 7))
    val got = Profiling.bootstrapMeans(rows.toDF("doc_id", "v"), "doc_id", "v",
        replicates = 12, seed = "s1")
      .orderBy("replicate")
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    // independent reference: same md5 draw, same exact thresholds
    val md = java.security.MessageDigest.getInstance("MD5")
    def u48(b: Long, id: Long): Long = {
      val h = md.digest(s"s1:$b:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 12), 16)
    }
    val thresholds = Seq(103548857136060L, 207097714272121L,
      258872142840152L, 276130285696162L)
    def w(b: Long, id: Long): Long = {
      val u = u48(b, id)
      thresholds.indexWhere(u < _) match { case -1 => 4L; case k => k.toLong }
    }
    val want = (0L until 12L).map { b =>
      val ws = rows.map { case (id, v) => (w(b, id), v) }
      val nEff = ws.map(_._1).sum
      val swv = ws.map { case (wt, v) => wt * v }.sum
      (b, nEff, swv,
        if (nEff > 0) Some(math.signum(swv) * ((200 * math.abs(swv) + nEff) / (2 * nEff)))
        else None)
    }
    assert(got == want)
    // replicate weights must differ across replicates (it IS a resample)
    assert(got.map(_._2).distinct.size > 1)
    // and n_eff concentrates near n (Poisson(1) mean-1 weights)
    got.foreach { case (_, nEff, _, _) => assert(nEff > 140 && nEff < 260) }
  }

  test("keySkewReport buckets by md5, isolates NULL keys, attributes the heaviest key") {
    import spark.implicits._
    // 1 bucket => every non-null key lands in bucket 0; "b" dominates 3/5
    val df = Seq(Some("a"), Some("b"), Some("b"), Some("b"), Some("c"),
      None, None).toDF("k")
    val got = Profiling.keySkewReport(df, "k", 1)
      .orderBy("bucket")
      .as[(Long, Long, Long, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      // null bucket: 2 of 7 rows, load = 2/7 in bp (nBuckets=1)
      (-1L, 2L, 1L, null, 2L, 2857L, 10000L),
      (0L, 5L, 3L, "b", 3L, 7143L, 6000L)))
    spark.catalog.clearCache()
  }

  test("keySkewReport breaks heaviest-key ties on the greater key string") {
    import spark.implicits._
    val df = Seq("x", "x", "y", "y").toDF("k")
    val got = Profiling.keySkewReport(df, "k", 1).collect()
    assert(got.map(r => (r.getString(3), r.getLong(4))).toSeq == Seq(("y", 2L)))
    spark.catalog.clearCache()
  }
}
