package graft

import graft.llm.{Sketches, Similarity, TextAnalysis}
import graft.operators.RangeJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the sketch/profiling operators: HLL accuracy bounds,
  * count-min over-count property, weighted-sample bias, range-join
  * equivalence with the naive formulation, and exact-sum dim stats.
  */
class SketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sketch-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("hllDistinct lands within 3 standard errors of the exact count") {
    import spark.implicits._
    // groups with true cardinalities 50, 500, 2000 (values disjoint per
    // group; duplicates injected so raw row counts differ from distinct)
    val rows = (1 to 50).map(i => ("a", s"a$i")) ++
      (1 to 500).flatMap(i => Seq(("b", s"b$i"), ("b", s"b$i"))) ++
      (1 to 2000).map(i => ("c", s"c$i"))
    val df = rows.toDF("g", "v")
    val got = Sketches.hllDistinct(df, "g", "v")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // m=64 -> se ~= 13%; 3*se = 39%. The operator emits the RAW
    // estimator (deterministic; no libm) plus empty_buckets, from which
    // the standard small-range linear-counting correction derives
    // client-side: raw <= 2.5m and V > 0 -> m*ln(m/V).
    for ((g, exact) <- Seq("a" -> 50.0, "b" -> 500.0, "c" -> 2000.0)) {
      val (raw, v) = got(g)
      val est = if (raw <= 2.5 * 64 && v > 0) 64.0 * math.log(64.0 / v) else raw
      assert(math.abs(est - exact) / exact < 0.39, s"$g: est $est (raw $raw) vs exact $exact")
    }
  }

  test("hllDistinct smallRangeCorrection lands within 2% on a 50-distinct group") {
    import spark.implicits._
    val df = (1 to 50).map(i => ("a", s"a$i")).toDF("g", "v")
    // p=14 (m=16384): linear counting at load 50/16384 has ~1/sqrt(2m)
    // ≈ 0.55% relative error — comfortably inside 2%. (At the default
    // p=6 the inherent LC error at load 50/64 is ~10%, so a 2% bound
    // there would be hash luck, not accuracy.)
    val est = Sketches.hllDistinct(df, "g", "v", smallRangeCorrection = true, p = 14)
      .collect()(0).getDouble(1)
    assert(math.abs(est - 50.0) / 50.0 <= 0.02, s"corrected estimate $est vs 50")
    // flag off must keep emitting the raw (libm-free, oracle-exact) value,
    // and the default-p raw path must be unchanged by the generalization
    val raw = Sketches.hllDistinct(df, "g", "v").collect()(0).getDouble(1)
    assert(raw != est)
  }

  test("hllDistinct is insensitive to duplication and row order") {
    import spark.implicits._
    val base = (1 to 300).map(i => ("g", s"v$i")).toDF("g", "v")
    val dup = base.union(base).union(base).orderBy(rand(7))
    val e1 = Sketches.hllDistinct(base, "g", "v").collect()(0).getDouble(1)
    val e2 = Sketches.hllDistinct(dup, "g", "v").collect()(0).getDouble(1)
    assert(e1 == e2)
  }

  test("cmsHeavyHitters: estimate >= exact, equality when sketch is sparse") {
    import spark.implicits._
    val toks = (Seq.fill(100)("hot") ++ (1 to 40).map(i => s"cold$i")).toDF("token")
    val out = Sketches.cmsHeavyHitters(toks, "token", d = 4, w = 256, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 5)
    out.foreach { case (t, exact, est) => assert(est >= exact, s"$t under-counted") }
    val hot = out.find(_._1 == "hot").get
    assert(hot._2 == 100L)
    // 41 distinct tokens into 4x256 cells: collisions possible but the
    // min over 4 rows must stay close; exact for the dominant token
    assert(hot._3 >= 100L && hot._3 <= 140L)
  }

  test("weightedSample selects k rows and favors heavy weights") {
    import spark.implicits._
    // 100 light rows (w=1) and 100 heavy rows (w=1000)
    val df = ((1 to 100).map(i => (i.toLong, 1L)) ++
      (101 to 200).map(i => (i.toLong, 1000L))).toDF("id", "w")
    val picked = Sketches.weightedSample(df, "id", "w", 40)
      .collect().map(_.getLong(0))
    assert(picked.length == 40)
    assert(picked.toSet.size == 40)
    val heavy = picked.count(_ > 100)
    assert(heavy > 30, s"heavy rows should dominate the sample, got $heavy/40")
    // deterministic: same input -> same sample
    val again = Sketches.weightedSample(df, "id", "w", 40).collect().map(_.getLong(0))
    assert(picked.sorted.sameElements(again.sorted))
  }

  test("weightedSample excludes non-positive weights") {
    import spark.implicits._
    val df = Seq((1L, 0L), (2L, -5L), (3L, 10L), (4L, 10L)).toDF("id", "w")
    val picked = Sketches.weightedSample(df, "id", "w", 10).collect().map(_.getLong(0))
    assert(picked.toSet == Set(3L, 4L))
  }

  test("RangeJoin.countNeighbors matches the naive quadratic join") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val ev = (1 to 400).map { i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong,
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(rnd.nextInt(3600).toLong)))
    }.toDF("event_id", "user_id", "ts")
    val got = RangeJoin.countNeighbors(ev, ev, "user_id", "ts", "event_id", 60L * 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val rows = ev.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    val want = rows.map { case (id, u, t) =>
      id -> rows.count { case (id2, u2, t2) =>
        id2 != id && u2 == u && math.abs(t2 - t) <= 60000L
      }.toLong
    }.toMap
    assert(got == want)
  }

  test("crossNgramOverlap counts shared distinct trigrams, small side broadcast") {
    import spark.implicits._
    val train = Seq(
      (1L, "a b c d e"),       // trigrams: "a b c","b c d","c d e"
      (2L, "x y z"),           // "x y z"
      (3L, "a b c a b c")      // distinct grams incl "a b c"
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d q")).toDF("doc_id", "text") // "a b c","b c d","c d q"
    val out = TextAnalysis.crossNgramOverlap(train, bench, "doc_id", "text", 3, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 100L, 2L), (3L, 100L, 1L)))
  }

  test("dimStats computes exact-sum mean/std per dimension") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(3.0f, 0.0f)),
      (3L, Seq(5.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.dimStats(df, "embedding")
      .orderBy("dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // dim 0: mean 3, std sqrt(8/3)=1.6330 ; dim 1: mean 0, std 0
    assert(out(0)._1 == 0L && out(0)._2 == 3L)
    assert(math.abs(out(0)._3 - 3.0) < 1e-9)
    assert(math.abs(out(0)._4 - 1.633) < 1e-3)
    assert(out(1)._3 == 0.0 && out(1)._4 == 0.0)
  }

  test("dimStats survives magnitudes whose squares overflow LONG") {
    import spark.implicits._
    // |x| = 400 -> scaled = 4e9, scaled^2 = 1.6e19 > Long.MaxValue: a
    // LONG accumulator would wrap silently (ANSI off); the decimal(38,0)
    // path must stay exact. mean 0, std 400.
    val df = Seq((1L, Seq(400.0f)), (2L, Seq(-400.0f))).toDF("vec_id", "embedding")
    val out = Similarity.dimStats(df, "embedding").collect()(0)
    assert(out.getLong(1) == 2L)
    assert(out.getDouble(2) == 0.0)
    assert(math.abs(out.getDouble(3) - 400.0) < 1e-6, s"std ${out.getDouble(3)}")
  }

  test("hllOverlap union equals the sketch of the concatenated groups (lossless merge)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val a = (1 to 250).map(_ => ("a", s"u${rnd.nextInt(400)}"))
    val b = (1 to 250).map(_ => ("b", s"v${rnd.nextInt(400)}"))
    val df = (a ++ b).toDF("grp", "uid")
    val union = graft.llm.Sketches.hllOverlap(df, "grp", "uid")
      .collect().head.getDouble(4)
    // one group holding BOTH datasets must sketch to the same estimate
    val direct = graft.llm.Sketches.hllDistinct(
        (a ++ b).map { case (_, u) => ("all", u) }.toDF("grp", "uid"), "grp", "uid")
      .collect().head.getDouble(1)
    assert(union == direct, s"register merge lost information: $union != $direct")
    spark.catalog.clearCache()
  }

  test("hllOverlap: identical groups intersect fully, disjoint groups clamp at zero") {
    import spark.implicits._
    val same = (1 to 300).flatMap(i => Seq(("a", s"u$i"), ("b", s"u$i")))
    val disj = (1 to 300).map(i => ("c", s"v$i"))
    val df = (same ++ disj).toDF("grp", "uid")
    val rows = graft.llm.Sketches.hllOverlap(df, "grp", "uid")
      .orderBy("ga", "gb").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(rows.map(p => (p._1, p._2)) == Seq(("a", "b"), ("a", "c"), ("b", "c")))
    val ab = rows(0)
    // identical registers: union == both sides, intersection == either
    assert(ab._3 == ab._4 && ab._4 == ab._5 && ab._5 == ab._6, s"ab: $ab")
    val ac = rows(1)
    // disjoint: union must exceed either side; intersection error-bounded
    // (HLL at p=6 has ~13% error; exact value is 0)
    assert(ac._5 > ac._3 && ac._5 > ac._4, s"ac: $ac")
    assert(ac._6 >= 0.0 && ac._6 < 0.35 * ac._5, s"ac inter too large: $ac")
    spark.catalog.clearCache()
  }
}
