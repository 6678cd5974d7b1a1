package graft

import graft.llm.{Curation, Similarity, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the corpus-diagnostic operators: hashed-classifier
  * scoring, k-NN label propagation, split drift, LSH bucket histogram,
  * and chunk windowing edge cases (short docs, exact-width docs, last
  * window clipping).
  */
class DiagnosticsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-diagnostics-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("hashedClassifier score is the sum of md5-derived bucket weights") {
    import spark.implicits._
    val df = Seq((1L, "alpha alpha"), (2L, "alpha")).toDF("doc_id", "text")
    val got = TextAnalysis.hashedClassifier(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // score("alpha alpha") must be exactly 2 * score("alpha")
    assert(got(1L) == 2 * got(2L))
    // and the weight is the documented function of the md5 bucket
    val md = java.security.MessageDigest.getInstance("MD5")
    val bkt = java.lang.Long.parseLong(
      md.digest("alpha".getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString, 16) % 64
    val w = ((java.security.MessageDigest.getInstance("MD5")
      .digest(s"w:$bkt".getBytes("UTF-8"))(0) >> 4) & 0xf) - 8
    assert(got(2L) == w.toLong)
  }

  test("knnClassify majority-votes the top-k labels, ties to the lowest label") {
    import spark.implicits._
    // query 0 at origin-ish; neighbors: two label-7 vectors very close,
    // one label-3 vector close, others far
    val rows = Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 9),
      (1L, Seq(0.99f, 0.1f, 0f, 0f), 7),
      (2L, Seq(0.98f, 0.15f, 0f, 0f), 7),
      (3L, Seq(0.9f, 0.4f, 0f, 0f), 3),
      (4L, Seq(0f, 1f, 0f, 0f), 1),
      (5L, Seq(0f, 0f, 1f, 0f), 1))
    val df = rows.toDF("id", "v", "label")
    val got = Similarity.knnClassify(df, "id", "v", "label", df.filter(col("id") === 0L), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 7L, 2L)))
  }

  test("splitDrift means are integer HALF_UP over each split's scaled sums") {
    import spark.implicits._
    // ids chosen arbitrarily; verify invariants rather than the split:
    // n_train + n_val == N per dim, and drift == |meanA - meanB|
    val df = (0L until 50L).map(i => (i, Seq(i.toFloat / 100f, -1f)))
      .toDF("id", "v")
    val rows = Similarity.splitDrift(df, "id", "v", seed = "t", trainPct = 80).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_val") == 50L)
      assert(r.getAs[Long]("drift_sc") ==
        math.abs(r.getAs[Long]("mean_train_sc") - r.getAs[Long]("mean_val_sc")))
    }
    // dim 1 is the constant -1: both means must be exactly -10000, zero drift
    val d1 = rows.find(_.getAs[Long]("dim") == 1L).get
    assert(d1.getAs[Long]("mean_train_sc") == -10000L && d1.getAs[Long]("drift_sc") == 0L)
  }

  test("lshBucketHistogram sizes sum back to the corpus size") {
    import spark.implicits._
    val df = (0L until 40L).map(i => (i, Seq(math.sin(i * 1.7).toFloat,
      math.cos(i * 2.3).toFloat, math.sin(i * 0.9).toFloat, 1f))).toDF("id", "v")
    val got = Similarity.lshBucketHistogram(df, "id", "v", nPlanes = 4, dim = 4).collect()
    assert(got.map(r => r.getLong(0) * r.getLong(1)).sum == 40L)
    // a plane matrix that disagrees with the vector dimension fails
    // loudly (it used to bucket everything together silently)
    val e = intercept[Exception] {
      Similarity.lshBucketHistogram(df, "id", "v", nPlanes = 4).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("incompatible")), s"got: $e")
  }

  test("sourceDivergence is zero between identically-distributed sources") {
    import spark.implicits._
    val df = Seq(
      ("a", "x x y"), ("a", "z"),
      ("b", "x y x"), ("b", "z"),          // same unigram counts as a
      ("c", "q q q q")).toDF("source", "text")
    val got = graft.llm.TextAnalysis.sourceDivergence(df, "source", "text")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(3))).toMap
    assert(got(("a", "b")) == 0L && got(("b", "a")) == 0L)
    // divergent pair is nonzero in at least one direction
    assert(got(("a", "c")) != 0L || got(("c", "a")) != 0L)
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("winnowingMatches finds pairs sharing a long run and skips unrelated docs") {
    import spark.implicits._
    val shared = "one two three four five six seven eight"
    val df = Seq(
      (1L, s"$shared alpha beta"),
      (2L, s"gamma delta $shared"),
      (3L, "p q r s t u v w x y z aa bb cc")).toDF("doc_id", "text")
    val got = graft.llm.TextAnalysis.winnowingMatches(df, "doc_id", "text",
        k = 4, w = 4, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 8-word shared run (>= w+k-1 = 7 words) guarantees a shared
    // fingerprint for (1,2); doc 3 shares no 4-gram with anyone
    assert(got.contains((1L, 2L)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("silhouette assigns the argmin centroid and scores boundary vectors near zero") {
    import spark.implicits._
    val cents = Seq((0L, Seq(0f, 0f)), (1L, Seq(10f, 0f))).toDF("id", "v")
    val vecs = Seq(
      (10L, Seq(1f, 0f)),   // clearly cluster 0: a2 small, b2 big
      (11L, Seq(5f, 0f)),   // exact midpoint: a2 == b2 -> s_bp 0, ties to cluster 0
      (12L, Seq(9f, 0f))).toDF("id", "v")
    val got = graft.llm.Similarity.silhouette(vecs, "id", "v", cents)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(got(10L)._1 == 0L && got(10L)._2 > 9000L)
    assert(got(11L) == (0L, 0L))
    assert(got(12L)._1 == 1L)
    // s_bp formula check on vector 10: a2 = 1e8, b2 = 81e8 (scaled by 1e4)
    val a2 = 10000L * 10000L; val b2 = 90000L * 90000L
    val want = (20000L * (b2 - a2) + b2) / (2L * b2)
    assert(got(10L)._2 == want)
  }

  test("lshRecall is full when buckets keep the true neighbors together") {
    import spark.implicits._
    // two tight clusters far apart: the exact top-1 of each query is its
    // twin, which shares every sign projection -> recall 10000 bp
    val df = Seq(
      (0L, Seq(1f, 1f, 0.5f, 2f)), (1L, Seq(1.01f, 1f, 0.5f, 2f)),
      (2L, Seq(-3f, -1f, -2f, -1f)), (3L, Seq(-3f, -1.01f, -2f, -1f))).toDF("id", "v")
    val got = graft.llm.Similarity.lshRecall(df, "id", "v",
        df.filter(col("id") === 0L || col("id") === 2L), k = 1, nPlanes = 3, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == Map(0L -> 10000L, 2L -> 10000L), s"got $got")
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("clusterSizeHistogram counts clusters by size") {
    import spark.implicits._
    val clusters = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L), (6L, 30L))
      .toDF("id", "comp")
    val got = graft.llm.Dedup.clusterSizeHistogram(clusters, "comp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 1L, 2L -> 1L, 1L -> 1L))
  }

  test("chunkWindows clips the last window and yields one chunk for short docs") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 20).map(i => s"w$i").mkString(" ")), // 20 words: chunks [1..12],[9..20]
      (2L, "a b c"),                                  // short: itself
      (3L, (1 to 12).map(i => s"w$i").mkString(" "))  // exact width: one chunk
    ).toDF("doc_id", "text")
    val got = Curation.chunkWindows(df, "doc_id", "text", width = 12, stride = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byDoc = got.groupBy(_._1)
    assert(byDoc(2L).toSeq == Seq((2L, 0L, 3L, "a b c")))
    assert(byDoc(3L).length == 1 && byDoc(3L).head._3 == 12L)
    val d1 = byDoc(1L).sortBy(_._2)
    assert(d1.length == 2)
    assert(d1(0)._4 == (1 to 12).map(i => s"w$i").mkString(" "))
    assert(d1(1)._4 == (9 to 20).map(i => s"w$i").mkString(" ") && d1(1)._3 == 12L)
  }

  test("centroidAffinity: orthogonal, opposite, and degenerate centroids") {
    import spark.implicits._
    val df = Seq(
      (0, Array(1.0f, 0.0f)), (0, Array(1.0f, 0.0f)), // centroid (1000, 0)
      (1, Array(0.0f, 1.0f)),                         // centroid (0, 1000)
      (2, Array(-1.0f, 0.0f)),                        // centroid (-1000, 0)
      (3, Array(0.0f, 0.0f))                          // zero centroid
    ).toDF("label", "embedding")
    val got = graft.llm.Similarity.centroidAffinity(df, "label", "embedding")
      .orderBy("label_a", "label_b")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 1L, 0L, 0L),
      (0L, 2L, -1000000L, -10000L),
      (0L, 3L, 0L, 0L),
      (1L, 2L, 0L, 0L),
      (1L, 3L, 0L, 0L),
      (2L, 3L, 0L, 0L)))
    spark.catalog.clearCache()
  }

  test("jlReduce is linear and exact over the integer quantization") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 2.0f)),
      (2L, Array(1.0f, -2.0f, 4.0f)), // exactly 2x vector 1
      (3L, Array(0.0f, 0.0f, 0.0f)),
      (4L, Array.empty[Float])        // failed-embed record: zero vector, no crash
    ).toDF("vec_id", "embedding")
    val got = graft.llm.Similarity.jlReduce(df, "vec_id", "embedding", k = 4)
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    val v1 = got(0)._2.split(",").map(_.toLong)
    val v2 = got(1)._2.split(",").map(_.toLong)
    assert(v2.toSeq == v1.map(_ * 2).toSeq, s"projection must be linear: $got")
    assert(got(1)._3 == 4 * got(0)._3)
    assert(got(2)._2 == "0,0,0,0" && got(2)._3 == 0L)
    assert(got(3)._2 == "0,0,0,0" && got(3)._3 == 0L)
    // deterministic: same input -> identical projection
    val again = graft.llm.Similarity.jlReduce(df, "vec_id", "embedding", k = 4)
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(again == got)
  }

  test("embedOutliers ranks by exact distance to the signed-HALF_UP integer centroid") {
    import spark.implicits._
    // group 0: milli-quants 1000, 2000, 6000 -> sum 9000, centroid 3000
    //   dists: 4e6, 1e6, 9e6 -> farthest = id 3 (9e6), then id 1 (4e6)
    // group 1: -1000, -2000 -> sum -3000, signed centroid -1500
    //   dists: 250000 both -> tie breaks on id asc
    val df = Seq(
      (1L, 0, Array(1.0f)), (2L, 0, Array(2.0f)), (3L, 0, Array(6.0f)),
      (10L, 1, Array(-1.0f)), (11L, 1, Array(-2.0f))
    ).toDF("vec_id", "label", "embedding")
    val got = graft.llm.Similarity.embedOutliers(df, "vec_id", "label", "embedding", k = 2)
      .orderBy("grp", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 1L, 3L, 9000000L), (0L, 2L, 1L, 4000000L),
      (1L, 1L, 10L, 250000L), (1L, 2L, 11L, 250000L)))
    spark.catalog.clearCache()
  }
}
