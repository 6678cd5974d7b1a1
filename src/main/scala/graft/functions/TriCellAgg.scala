package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable accumulator for the upper-triangle cell aggregates: exact
  * 128-bit (hi/lo long pair) integer sums — the same value range as the
  * `decimal(38,0)` sums it replaces (2^127 ≈ 1.7e38), with none of the
  * per-row `Decimal` allocation.
  *
  * Ragged-input exactness: a row of length k contributes only to cells
  * (i, j) with j < k, and the per-cell count/per-dim sums must reflect
  * that (n(i,j) = #rows with length > j; si(i,j) = Σ x_i over those same
  * rows). Tracking one (count, dim-sum vector) entry PER DISTINCT LENGTH
  * reproduces the grouped explode's per-cell values exactly; uniform
  * corpora hold exactly one entry.
  *
  * Triangle index layout is append-only in j (prod: j(j+1)/2 + i for
  * i ≤ j; d2: j(j−1)/2 + i for i < j), so growing to a longer vector
  * never re-indexes existing cells.
  */
final class TriCellBuf(val squaredDiffs: Boolean) {
  var d: Int = 0
  // per distinct vector length: row count and (prod mode only) dim sums
  val lenCount = scala.collection.mutable.LongMap.empty[Long]
  val lenSumHi = scala.collection.mutable.LongMap.empty[Array[Long]]
  val lenSumLo = scala.collection.mutable.LongMap.empty[Array[Long]]
  var triHi: Array[Long] = Array.emptyLongArray
  var triLo: Array[Long] = Array.emptyLongArray

  private def triLen(k: Int): Int =
    if (squaredDiffs) k * (k - 1) / 2 else k * (k + 1) / 2

  private def grow(k: Int): Unit = if (k > d) {
    triHi = java.util.Arrays.copyOf(triHi, triLen(k))
    triLo = java.util.Arrays.copyOf(triLo, triLen(k))
    d = k
  }

  // 128-bit add of the signed 128-bit value (hi, lo) into slot idx
  @inline private def add128(hiA: Array[Long], loA: Array[Long], idx: Int,
      hi: Long, lo: Long): Unit = {
    val l = loA(idx) + lo
    // carry detection for the unsigned low-word add
    val carry = if (java.lang.Long.compareUnsigned(l, loA(idx)) < 0 ||
      (lo != 0 && java.lang.Long.compareUnsigned(l, lo) < 0)) 1L else 0L
    loA(idx) = l
    hiA(idx) = hiA(idx) + hi + carry
  }

  def update(v: Array[Long]): Unit = {
    val k = v.length
    if (k == 0) return
    grow(k)
    lenCount(k) = lenCount.getOrElse(k.toLong, 0L) + 1L
    if (!squaredDiffs) {
      val shi = lenSumHi.getOrElseUpdate(k, new Array[Long](k))
      val slo = lenSumLo.getOrElseUpdate(k, new Array[Long](k))
      var i = 0
      while (i < k) {
        add128(shi, slo, i, v(i) >> 63, v(i))
        i += 1
      }
      var j = 0
      while (j < k) {
        val base = j * (j + 1) / 2
        val xj = v(j)
        var i = 0
        while (i <= j) {
          val xi = v(i)
          add128(triHi, triLo, base + i, Math.multiplyHigh(xi, xj), xi * xj)
          i += 1
        }
        j += 1
      }
    } else {
      var j = 1
      while (j < k) {
        val base = j * (j - 1) / 2
        val xj = v(j)
        var i = 0
        while (i < j) {
          // diff in wrapping long arithmetic (the SQL `a - b` the explode
          // form used), square exact in 128-bit
          val diff = v(i) - xj
          add128(triHi, triLo, base + i, Math.multiplyHigh(diff, diff), diff * diff)
          i += 1
        }
        j += 1
      }
    }
  }

  def merge(o: TriCellBuf): Unit = {
    grow(o.d)
    o.lenCount.foreach { case (k, c) => lenCount(k) = lenCount.getOrElse(k, 0L) + c }
    if (!squaredDiffs) o.lenSumHi.foreach { case (k, ohi) =>
      val olo = o.lenSumLo(k)
      val shi = lenSumHi.getOrElseUpdate(k, new Array[Long](k.toInt))
      val slo = lenSumLo.getOrElseUpdate(k, new Array[Long](k.toInt))
      var i = 0
      while (i < ohi.length) { add128(shi, slo, i, ohi(i), olo(i)); i += 1 }
    }
    var idx = 0
    while (idx < o.triHi.length) {
      add128(triHi, triLo, idx, o.triHi(idx), o.triLo(idx))
      idx += 1
    }
  }

  def toDecimal(hi: Long, lo: Long): Decimal = {
    val bi = BigInt(hi).<<(64) + BigInt(java.lang.Long.toUnsignedString(lo))
    Decimal(BigDecimal(bi), 38, 0)
  }
}

/** Fused upper-triangle cell aggregate over `array<long>` rows — the
  * shuffle-light replacement for the "explode d(d+1)/2 structs per row,
  * hash-aggregate on (di, dj) with decimal sums" plan shape shared by
  * [[graft.llm.Similarity.embedCovariance]] (products mode) and
  * [[graft.llm.Similarity.spearmanMatrix]] (squared-differences mode).
  *
  * One call per row accumulates every cell into a partition-local
  * 128-bit integer buffer; the shuffle then carries ONE buffer per map
  * partition instead of n·d²/2 exploded rows, and no per-row Decimal or
  * struct allocation happens at all. Results are exactly the grouped
  * explode's: counts and per-dim sums are tracked per distinct vector
  * length (see [[TriCellBuf]]), products/squares are exact 128-bit
  * integers emitted as decimal(38,0) — the identical value domain.
  *
  * products mode output: array<struct<di, dj, n, graft_si, graft_sj,
  * graft_sij>> for i ≤ j; d2 mode: array<struct<di, dj, n, graft_s>>
  * for i < j. NULL rows contribute nothing (the explode of a NULL array
  * produced no rows); NULL elements are rejected by `toLongArray`.
  */
case class TriCellAgg(child: Expression, squaredDiffs: Boolean,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TriCellBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String =
    if (squaredDiffs) "graft_d2_cells" else "graft_cov_cells"

  private val cellType: StructType =
    if (squaredDiffs) StructType(Seq(
      StructField("di", LongType, nullable = false),
      StructField("dj", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("graft_s", DecimalType(38, 0), nullable = false)))
    else StructType(Seq(
      StructField("di", LongType, nullable = false),
      StructField("dj", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("graft_si", DecimalType(38, 0), nullable = false),
      StructField("graft_sj", DecimalType(38, 0), nullable = false),
      StructField("graft_sij", DecimalType(38, 0), nullable = false)))

  override def dataType: DataType = ArrayType(cellType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.sql}")
  }

  override def createAggregationBuffer(): TriCellBuf = new TriCellBuf(squaredDiffs)

  override def update(buf: TriCellBuf, input: InternalRow): TriCellBuf = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[ArrayData].toLongArray())
    buf
  }

  override def merge(buf: TriCellBuf, other: TriCellBuf): TriCellBuf = {
    buf.merge(other); buf
  }

  override def eval(buf: TriCellBuf): Any = {
    val d = buf.d
    if (d == 0) return new GenericArrayData(Array.empty[Any])
    // suffix accumulators over the distinct-length classes, walked from
    // the longest class down: after absorbing every class with length
    // > j, (nCum, sumHi/sumLo) are exactly n(·,j) and si(·,j)
    val lens = buf.lenCount.keys.toArray.sorted
    var li = lens.length - 1
    var nCum = 0L
    val sumHi = new Array[Long](d)
    val sumLo = new Array[Long](d)
    def absorbDownTo(minLen: Long): Unit = {
      while (li >= 0 && lens(li) >= minLen) {
        val k = lens(li)
        nCum += buf.lenCount(k)
        if (!squaredDiffs) {
          val shi = buf.lenSumHi(k); val slo = buf.lenSumLo(k)
          var i = 0
          while (i < shi.length) {
            val l = sumLo(i) + slo(i)
            val carry = if (java.lang.Long.compareUnsigned(l, sumLo(i)) < 0 ||
              (slo(i) != 0 && java.lang.Long.compareUnsigned(l, slo(i)) < 0)) 1L else 0L
            sumLo(i) = l
            sumHi(i) = sumHi(i) + shi(i) + carry
            i += 1
          }
        }
      li -= 1
      }
    }
    val out = Array.newBuilder[Any]
    var j = d - 1
    while (j >= 0) {
      absorbDownTo(j + 1L)
      var i = if (squaredDiffs) j - 1 else j
      while (i >= 0) {
        val idx = if (squaredDiffs) j * (j - 1) / 2 + i else j * (j + 1) / 2 + i
        if (squaredDiffs)
          out += InternalRow(i.toLong, j.toLong, nCum,
            buf.toDecimal(buf.triHi(idx), buf.triLo(idx)))
        else
          out += InternalRow(i.toLong, j.toLong, nCum,
            buf.toDecimal(sumHi(i), sumLo(i)),
            buf.toDecimal(sumHi(j), sumLo(j)),
            buf.toDecimal(buf.triHi(idx), buf.triLo(idx)))
        i -= 1
      }
      j -= 1
    }
    new GenericArrayData(out.result())
  }

  override def serialize(buf: TriCellBuf): Array[Byte] = {
    val lens = buf.lenCount.keys.toArray.sorted
    val dimWords = if (buf.squaredDiffs) 0 else lens.map(_.toInt).sum * 2
    val bb = ByteBuffer.allocate(8 + 8 + lens.length * 16 + dimWords * 8 +
      8 + buf.triHi.length * 16)
    bb.putInt(buf.d)
    bb.putInt(lens.length)
    lens.foreach { k =>
      bb.putLong(k)
      bb.putLong(buf.lenCount(k))
      if (!buf.squaredDiffs) {
        buf.lenSumHi(k).foreach(bb.putLong)
        buf.lenSumLo(k).foreach(bb.putLong)
      }
    }
    bb.putLong(buf.triHi.length.toLong)
    buf.triHi.foreach(bb.putLong)
    buf.triLo.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TriCellBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TriCellBuf(squaredDiffs)
    buf.d = bb.getInt
    val nLens = bb.getInt
    (0 until nLens).foreach { _ =>
      val k = bb.getLong
      buf.lenCount(k) = bb.getLong
      if (!squaredDiffs) {
        val hi = new Array[Long](k.toInt); val lo = new Array[Long](k.toInt)
        var i = 0
        while (i < k) { hi(i) = bb.getLong; i += 1 }
        i = 0
        while (i < k) { lo(i) = bb.getLong; i += 1 }
        buf.lenSumHi(k) = hi
        buf.lenSumLo(k) = lo
      }
    }
    val triN = bb.getLong.toInt
    buf.triHi = new Array[Long](triN)
    buf.triLo = new Array[Long](triN)
    var i = 0
    while (i < triN) { buf.triHi(i) = bb.getLong; i += 1 }
    i = 0
    while (i < triN) { buf.triLo(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TriCellAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TriCellAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): TriCellAgg =
    copy(child = nc(0))
}

/** Session registration for the tri-cell aggregates (idempotent). */
object TriCellFunctions {
  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cov_cells" -> (e => TriCellAgg(e.head, squaredDiffs = false)),
    "graft_d2_cells" -> (e => TriCellAgg(e.head, squaredDiffs = true)))

  def register(spark: SparkSession): Unit = fns.foreach { case (name, builder) =>
    val id = FunctionIdentifier(name)
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(
        id, new ExpressionInfo(classOf[TriCellBuf].getName, name), builder)
  }
}
