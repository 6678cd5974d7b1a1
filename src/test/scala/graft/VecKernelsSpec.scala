package graft

import graft.functions.{VecFunctions, VecKernels}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd vector kernels: engine-parity of the scaling round,
  * argmin/tie semantics, and ADC arithmetic. These kernels exist to keep
  * PQ/IVF stages inside whole-stage codegen (the unrolled expression
  * form exceeded the JVM's 64 KB method limit and fell back to
  * interpreted eval) — so their outputs must be bit-identical to the
  * expression forms they replaced.
  */
class VecKernelsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-veckernels-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def longs(xs: Long*) = UnsafeArrayData.fromPrimitiveArray(xs.toArray)
  private def floats(xs: Float*) = UnsafeArrayData.fromPrimitiveArray(xs.toArray)

  test("scaleQ matches the engine's round(cast(x as double) * scale) expression bit-for-bit") {
    VecFunctions.register(spark)
    import spark.implicits._
    // half-ties both signs, tiny magnitudes, exact integers
    val vecs = Seq(
      Array(0.00005f, -0.00005f, 0.00015f, -0.00015f),
      Array(1.5e-4f, -2.5e-4f, 0.99995f, -0.99995f),
      Array(0f, 1f, -1f, 0.12345678f))
    val df = vecs.toDF("v")
    val got = df.select(
      transform(col("v"), x => round(x.cast("double") * 10000.0).cast("long")).as("a"),
      call_function("graft_scale_q", col("v"), lit(10000.0)).as("b"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"expression ${r.getSeq[Long](0)} != kernel ${r.getSeq[Long](1)}")
    }
  }

  test("pqCodes picks the argmin entry per subspace, ties to the lowest code") {
    // m=2, ksub=2, dsub=2; cb flat [s][c][dsub]
    val cb = Array[Long](0, 0, 10, 10, /* s=0: c0=(0,0), c1=(10,10) */
                         5, 5, 5, 5) /* s=1: c0=c1=(5,5) — tie */
    val codes = VecKernels.pqCodes(longs(9, 9, 5, 5), cb, 2).toLongArray()
    assert(codes(0) == 1L, "subspace 0 should pick the nearer (10,10)")
    assert(codes(1) == 0L, "exact tie must go to the lowest code")
  }

  test("adcDist sums the looked-up table cells; pqDistTable lays out [s][c]") {
    val cb = Array[Long](0, 0, 10, 10, 0, 0, 4, 4)
    val dt = VecKernels.pqDistTable(longs(1, 1, 2, 2), cb, 2).toLongArray()
    // s=0: d(c0)=1+1=2, d(c1)=81+81=162; s=1: d(c0)=4+4=8, d(c1)=4+4=8
    assert(dt.toSeq == Seq(2L, 162L, 8L, 8L))
    val adc = VecKernels.adcDist(longs(dt: _*), longs(1, 0), 2)
    assert(adc == 162L + 8L)
  }

  test("sqDistLong is the exact integer squared L2") {
    assert(VecKernels.sqDistLong(longs(3, -4, 0), longs(0, 0, 2)) == 9L + 16L + 4L)
  }

  test("simhash60 sets exactly the positive-vote bits") {
    // one hash: every set bit votes +1, every clear bit votes -1 -> sig = h (low 60 bits)
    assert(VecKernels.simhash60(longs(0b1011L)) == 0b1011L)
    // two hashes: bit agreement wins, disagreement (one +1, one -1) -> not positive -> 0
    assert(VecKernels.simhash60(longs(0b1100L, 0b1010L)) == 0b1000L)
    // empty token list: all votes 0 -> signature 0
    assert(VecKernels.simhash60(longs()) == 0L)
  }

  test("bitsToMask sets exactly the listed bits across word boundaries") {
    val m = VecKernels.bitsToMask(longs(0, 63, 64, 130, 130), 3).toLongArray()
    assert(m(0) == (1L | (1L << 63)))
    assert(m(1) == 1L)
    assert(m(2) == (1L << 2), "duplicate bit indices must OR idempotently")
    val e = intercept[IllegalArgumentException](VecKernels.bitsToMask(longs(192), 3))
    assert(e.getMessage.contains("outside"))
    assert(VecKernels.bitsToMask(longs(), 2).toLongArray().toSeq == Seq(0L, 0L))
  }

  test("maskIntersect is the popcount of the word-wise AND") {
    val a = longs(0xFFL, 1L << 40)
    val b = longs(0x0FL, (1L << 40) | 1L)
    assert(VecKernels.maskIntersect(a, b) == 5L)
    assert(VecKernels.maskIntersect(longs(0L), longs(-1L)) == 0L)
    val e = intercept[IllegalArgumentException](
      VecKernels.maskIntersect(longs(1L), longs(1L, 2L)))
    assert(e.getMessage.contains("widths differ"))
  }

  test("wisect sums a-side weights over the sorted-array intersection") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def strs(xs: String*) =
      ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray)
    // a: (ant,2) (bee,5) (cow,1); b: {bee, cow, dog} → 5 + 1
    assert(VecKernels.wisect(strs("ant", "bee", "cow"), longs(2, 5, 1),
      strs("bee", "cow", "dog")) == 6L)
    // disjoint and empty sides
    assert(VecKernels.wisect(strs("ant"), longs(2), strs("bee")) == 0L)
    assert(VecKernels.wisect(strs(), longs(), strs("bee")) == 0L)
    // matches the engine's own intersection on a random-ish case: the
    // kernel result equals a SQL aggregate over array_intersect
    val a = Seq("ap", "b", "ca", "dd", "z")
    val wa = Seq(3L, 7L, 11L, 13L, 17L)
    val b = Seq("b", "ca", "q", "z")
    val expected = a.zip(wa).filter(t => b.contains(t._1)).map(_._2).sum
    assert(VecKernels.wisect(strs(a: _*), longs(wa: _*), strs(b: _*)) == expected)
  }

  test("cosRank orders centroids by cosine descending, ties to the lowest id") {
    // v = (1,0); cents: id 7 = (0,1) cos 0, id 9 = (1,0) cos 1,
    // id 11 = (2,0) cos 1 (tie with 9 → 9 first)
    val cents = Array[Float](0, 1, 1, 0, 2, 0)
    val cids = Array[Long](7, 9, 11)
    val r = VecKernels.cosRank(floats(1, 0), cents, cids).toLongArray()
    assert(r.toSeq == Seq(9L, 11L, 7L))
  }
}
