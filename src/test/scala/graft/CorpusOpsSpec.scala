package graft

import graft.llm.{Curation, Dedup, Profiling, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the corpus-assembly operators added in round 5 —
  * duplicated-span extraction, bigram-LM scoring, mixture sampling, and
  * the vocabulary growth curve — against hand-computed expectations.
  */
class CorpusOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-corpus-op-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("duplicateSpans merges overlapping covered intervals and honors gaps") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e f"),  // 2-grams ab,bc,cd shared with doc 1 -> one span [0,4)
      (1L, "a b c d x y"),  // same prefix -> same span [0,4)
      (2L, "p q r s"),      // nothing shared -> no spans
      (3L, "a b z c d w"),  // ab at 0, cd at 3 -> two spans [0,2) and [3,5)
      (4L, "q a b q q c d") // ab at 1, cd at 5 -> [1,3) and [5,7)
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, "doc_id", "text", n = 2, minDocs = 2)
      .orderBy("id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (0L, 0L, 4L), (1L, 0L, 4L),
      (3L, 0L, 2L), (3L, 3L, 5L),
      (4L, 1L, 3L), (4L, 5L, 7L)))
  }

  test("duplicateSpans requires cross-document duplication, not within-doc repeats") {
    import spark.implicits._
    // "a b" twice in ONE doc only -> count(DISTINCT doc) = 1 -> no span
    val docs = Seq((0L, "a b c a b"), (1L, "x y z w v")).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, "doc_id", "text", n = 2, minDocs = 2).collect()
    assert(out.isEmpty, s"within-doc repeat must not create spans: ${out.toSeq}")
  }

  test("lmScore sums per-bigram integer micro-nats under add-one smoothing") {
    import spark.implicits._
    val docs = Seq((0L, "a b a b"), (1L, "a b"), (2L, "solo")).toDF("doc_id", "text")
    // corpus bigrams: doc0 (a,b),(b,a),(a,b); doc1 (a,b).
    // c2(a,b)=3, c2(b,a)=1; heads c1(a)=3, c1(b)=1; vocab {a,b,solo} V=3.
    val lpAB = math.round(math.log(4.0 / 6.0) * 1e6)  // (3+1)/(3+3)
    val lpBA = math.round(math.log(2.0 / 4.0) * 1e6)  // (1+1)/(1+3)
    val out = TextAnalysis.lmScore(docs, "doc_id", "text")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc2 has no bigrams and is absent (callers left-join kept docs)
    assert(out == Seq((0L, 3L, 2 * lpAB + lpBA), (1L, 1L, lpAB)))
  }

  test("mixtureSample fills quotas by md5-of-id rank, deterministically") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, if (i < 20) "s0" else "s1")).toDF("doc_id", "source")
    val quotas = Map("s0" -> 3L, "s1" -> 25L) // s1 quota exceeds the source
    val out = Curation.mixtureSample(docs, "doc_id", "source", quotas)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // s1 has only 20 docs: quota > size takes the whole source
    assert(bySrc("s1") == (20L until 40L).toSet)
    // s0 picks exactly the 3 lowest md5(id) ranks — replicate with JVM md5
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (0L until 20L).sortBy(id => (hex(id), id)).take(3).toSet
    assert(bySrc("s0") == expected, s"expected $expected got ${bySrc("s0")}")
    // a source with no quota contributes nothing
    val none = Curation.mixtureSample(docs, "doc_id", "source", Map("s0" -> 2L))
      .collect().map(_.getString(1)).toSet
    assert(none == Set("s0"))
  }

  test("vocabGrowth emits a complete cumulative curve over step buckets") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c"), // trigram "a b c" first at rank 0
      (1L, "a b c"), // nothing new
      (2L, "x y z"), // new type
      (3L, "a")      // too short: no trigram, but still advances the spine
    ).toDF("doc_id", "text")
    val out = Profiling.vocabGrowth(docs, "doc_id", "text", n = 3, step = 1)
      .orderBy("k_docs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L)))
    // coarser step folds ranks into buckets, tail bucket still emitted
    val out2 = Profiling.vocabGrowth(docs, "doc_id", "text", n = 3, step = 2)
      .orderBy("k_docs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out2 == Seq((2L, 1L), (4L, 2L)))
  }
}
