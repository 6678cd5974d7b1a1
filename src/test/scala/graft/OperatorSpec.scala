package graft

import graft.operators.{AsOfJoin, Sessionize}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the event-stream operators (as-of join,
  * sessionization) against hand-computed expectations.
  */
class OperatorSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-op-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("as-of join picks the latest right row at or before the left time") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // event at t=100: orders at 50 and 100 precede -> 100 wins
      (2L, 10L, 75L),  // t=75 -> order at 50
      (3L, 10L, 49L),  // t=49 -> no order yet
      (4L, 20L, 500L), // key with no orders at all
      (5L, 30L, 200L)  // tie: two orders at t=200 -> max order id wins
    ).toDF("event_id", "key", "t")
    val right = Seq(
      (101L, 10L, 50L), (102L, 10L, 100L),
      (201L, 30L, 200L), (202L, 30L, 200L), (200L, 30L, 199L)
    ).toDF("order_id", "key", "ot")
    val out = AsOfJoin.lookupLatest(left, "key", "t", right, "key", "ot", Seq("order_id", "ot"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq == Seq((1L, 102L), (2L, 101L), (3L, -1L), (4L, -1L), (5L, 202L)))
  }

  test("sessionization splits on gaps and keeps keys independent") {
    import spark.implicits._
    val us = 1000000L
    val ev = Seq(
      // user 1: events at 0s, 60s, 2000s (gap>1800 -> new session), 2100s
      (1L, 1L, 0L), (2L, 1L, 60L * us), (3L, 1L, 2000L * us), (4L, 1L, 2100L * us),
      // user 2: single event
      (5L, 2L, 0L)
    ).map { case (id, u, t) => (id, u, new java.sql.Timestamp(t / 1000)) }
      .toDF("event_id", "user_id", "ts")
    val out = Sessionize.assign(ev, "user_id", "ts", "event_id", 1800L * us)
      .select("event_id", "session_seq")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
    val sums = Sessionize.summarize(ev, "user_id", "ts", "event_id", 1800L * us)
      .orderBy("user_id", "session_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sums.toSeq == Seq((1L, 1L, 2L), (1L, 2L, 2L), (2L, 1L, 1L)))
  }

  test("ivf top-k finds cluster neighbors through probed lists") {
    import spark.implicits._
    // two tight clusters around orthogonal axes; centroids = one member of
    // each. A query near cluster 0 must rank cluster-0 members on top.
    def vec(axis: Int, jitter: Float): Array[Float] = {
      val v = Array.fill(64)(jitter)
      v(axis) = 10f
      v
    }
    val corpus = (
      (0L until 5L).map(i => (i, vec(0, 0.01f * (i + 1)))) ++
      (10L until 15L).map(i => (i, vec(7, 0.01f * (i - 9))))
    ).toDF("vec_id", "embedding")
    val centroids = corpus.filter(col("vec_id").isin(0L, 10L))
    val queries = corpus.filter(col("vec_id") === 1L)
    val out = graft.llm.Similarity.ivfTopK(corpus, "vec_id", "embedding", centroids, queries, 3, 1)
      .orderBy("rank").collect().map(r => r.getLong(1))
    // 1-probe search: all neighbors come from cluster 0's inverted list
    assert(out.length == 3 && out.forall(_ < 5L) && !out.contains(1L))
  }

  test("embedding near-dup pairs find planted copies only") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val base = (0L until 40L).map(id => (id, Array.fill(64)(rng.nextFloat() * 2 - 1)))
    // plant near-copies of vectors 0 and 5
    val corpus = (base ++ Seq(
      (1000L, base(0)._2.map(x => x * 1.0004f)),
      (1005L, base(5)._2.map(x => x * 0.9996f))
    )).toDF("vec_id", "embedding")
    val pairs = graft.llm.Similarity.cosineNearDupPairs(corpus, "vec_id", "embedding", 8, 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1000L), (5L, 1005L)))
  }
}
