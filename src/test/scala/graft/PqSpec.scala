package graft

import graft.llm.Pq
import graft.llm.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for product quantization: encode argmin correctness on
  * hand-computable vectors, codebook-member self-encoding, ADC equals
  * the explicit table-lookup sum, recall bounds, and the BPE pair-count
  * and fertility operators' exact integer arithmetic.
  */
class PqSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-pq-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // 4-dim vectors, m=2 subspaces of 2 dims, 2-entry codebook
  private def vecs(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  test("encode picks the nearest codebook entry per subspace, ties to the lowest code") {
    val cb = vecs(0L -> Seq(0f, 0f, 10f, 10f), 1L -> Seq(1f, 1f, 20f, 20f))
    // sub0 of x is (0.4, 0.4): closer to (0,0)=code0? dist0=2*(0.4)^2 scaled; dist to (1,1) = 2*(0.6)^2 -> code 0
    // sub1 of x is (19, 19): closer to (20,20)=code1
    val x = vecs(7L -> Seq(0.4f, 0.4f, 19f, 19f))
    val got = Pq.encode(x, "id", "v", cb, m = 2)
      .orderBy("sub").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 0L), (1L, 1L)))
    // exact midpoint: (0.5, 0.5) is equidistant from (0,0) and (1,1) -> lowest code wins
    val mid = vecs(8L -> Seq(0.5f, 0.5f, 0f, 0f))
    val gotMid = Pq.encode(mid, "id", "v", cb, m = 2)
      .orderBy("sub").collect().map(_.getLong(2))
    assert(gotMid.head == 0L)
  }

  test("codebook members encode to themselves (zero distance to their own entry)") {
    val cb = vecs(0L -> Seq(1f, 2f, 3f, 4f), 1L -> Seq(5f, 6f, 7f, 8f))
    val got = Pq.encode(cb, "id", "v", cb, m = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 0L, 0L), (0L, 1L, 0L), (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("adcTopK distance equals the sum of per-subspace distances to the assigned entries") {
    val cb = vecs(0L -> Seq(0f, 0f, 0f, 0f), 1L -> Seq(1f, 1f, 1f, 1f))
    val corpus = vecs(10L -> Seq(0.1f, 0.1f, 0.9f, 0.9f), 11L -> Seq(1f, 1f, 0f, 0f))
    val queries = vecs(20L -> Seq(0f, 0f, 1f, 1f))
    val got = Pq.adcTopK(corpus, "id", "v", cb, queries, k = 2, m = 2)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getLong(3)))
    // corpus 10 encodes to (code0, code1): ADC = d(q_sub0, cb0) + d(q_sub1, cb1)
    //   = (0)^2*2 + 0 = 0  (q sub0 == (0,0), q sub1 == (1,1))
    // corpus 11 encodes to (code1, code0): ADC = 2*10000^2 + 2*10000^2
    val s = 10000L * 10000L
    assert(got.toSeq == Seq((10L, 0L), (11L, 4L * s)))
  }

  test("adcRecall is 10000 bp when codes separate the corpus perfectly, and counts overlap") {
    val cb = vecs(0L -> Seq(0f, 0f, 0f, 0f), 1L -> Seq(10f, 10f, 10f, 10f))
    val corpus = vecs(
      10L -> Seq(0.1f, 0f, 0f, 0.1f), 11L -> Seq(9.9f, 10f, 10f, 9.9f),
      12L -> Seq(0.2f, 0f, 0f, 0.2f))
    val queries = vecs(10L -> Seq(0.1f, 0f, 0f, 0.1f))
    val got = Pq.adcRecall(corpus, "id", "v", cb, queries, k = 1, m = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exact NN of 10 (excluding itself) is 12; 12 shares 10's codes while
    // 11 is in the far cell, so ADC also ranks 12 first -> full recall
    assert(got.toSeq == Seq((10L, 1L, 10000L)))
  }

  test("ivfAdcTopK only scores candidates from probed lists") {
    // coarse centroids split the space; corpus point 12 lives in an
    // unprobed list for query 20 (nProbe=1), so it must not appear even
    // though its ADC distance is finite
    val coarse = vecs(0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(0f, 0f, 1f, 0f))
    val cb = coarse
    val corpus = vecs(
      10L -> Seq(0.9f, 0.1f, 0f, 0f),  // list 0
      11L -> Seq(0.8f, 0.2f, 0f, 0f),  // list 0
      12L -> Seq(0f, 0f, 0.9f, 0.1f))  // list 1
    val queries = vecs(20L -> Seq(1f, 0f, 0f, 0f))
    val got = Pq.ivfAdcTopK(corpus, "id", "v", coarse, cb, queries,
        k = 3, nProbe = 1, m = 2)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(10L, 11L), s"expected only list-0 members, got $got")
  }

  test("adcTopKReranked surfaces the true neighbor ADC buried in a code-cell tie") {
    val cb = vecs(0L -> Seq(0f, 0f, 0f, 0f), 1L -> Seq(1f, 1f, 1f, 1f))
    // both corpus points land in code cell 0 → IDENTICAL ADC distance;
    // ADC ties break to the lower id (10), but the true NN of the query
    // (0.15,…) is 11 at (0.1,…) — only the exact re-rank can see that
    val corpus = vecs(10L -> Seq(0.4f, 0.4f, 0.4f, 0.4f),
      11L -> Seq(0.1f, 0.1f, 0.1f, 0.1f))
    val queries = vecs(20L -> Seq(0.15f, 0.15f, 0.15f, 0.15f))
    val adc = Pq.adcTopK(corpus, "id", "v", cb, queries, k = 1, m = 2)
      .collect().map(_.getLong(1))
    assert(adc.toSeq == Seq(10L), "precondition: ADC tie must pick the lower id")
    val rr = Pq.adcTopKReranked(corpus, "id", "v", cb, queries,
        k = 1, kCand = 2, m = 2)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    // exact d2 of (0.15 vs 0.1) per dim = (500)^2 scaled, 4 dims
    assert(rr.toSeq == Seq((11L, 4L * 500L * 500L)))
  }

  test("rerankRecall never reports re-rank recall below ADC recall") {
    val cb = vecs(0L -> Seq(0f, 0f, 0f, 0f), 1L -> Seq(1f, 1f, 1f, 1f))
    val corpus = vecs((10L to 19L).map(i =>
      i -> Seq.fill(4)((i % 7) * 0.13f + (i % 3) * 0.21f)): _*)
    val queries = vecs(30L -> Seq(0.2f, 0.2f, 0.2f, 0.2f),
      31L -> Seq(0.9f, 0.9f, 0.9f, 0.9f))
    val got = Pq.rerankRecall(corpus, "id", "v", cb, queries,
        k = 3, kCand = 8, m = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    got.foreach { case (q, adcBp, rrBp) =>
      assert(rrBp >= adcBp, s"query $q: rerank recall $rrBp < ADC $adcBp")
    }
    // kCand = |corpus| ⇒ the re-rank IS the exact ranking ⇒ recall 10000
    val full = Pq.rerankRecall(corpus, "id", "v", cb, queries,
        k = 3, kCand = 10, m = 2)
      .collect().map(_.getLong(4))
    assert(full.forall(_ == 10000L), s"full-candidate re-rank must be exact: ${full.toSeq}")
  }

  test("bpePairCounts weights pairs by word frequency and breaks count ties by pair") {
    import spark.implicits._
    val df = Seq("ab ab abc", "ab x").toDF("text") // 'ab' x3, 'abc' x1: ab->4, bc->1; 'x' filtered
    val got = TextAnalysis.bpePairCounts(df, "text", topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("ab", 4L), ("bc", 1L)))
  }

  test("tokenFertility computes HALF_UP integer ratios") {
    import spark.implicits._
    val df = Seq(("s1", "ab cd-ef"), ("s1", "gh")).toDF("source", "text")
    // ws_tokens = 2 + 1 = 3; pieces: 'ab','cd','-','ef' = 4 plus 'gh' = 5; chars = 8 + 2 = 10
    val r = TextAnalysis.tokenFertility(df, "source", "text").collect().head
    assert(r.getAs[Long]("ws_tokens") == 3L && r.getAs[Long]("bpe_pieces") == 5L)
    // fertility = 5/3 = 1.6667 -> 16667 bp HALF_UP: (20000*5+3) div 6 = 16667
    assert(r.getAs[Long]("fertility_bp") == 16667L)
    // chars/piece = 10/5 = 2.00 -> 200 centi
    assert(r.getAs[Long]("chars_per_piece_c") == 200L)
  }
}
