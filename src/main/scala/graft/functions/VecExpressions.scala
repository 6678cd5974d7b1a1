package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector expressions over the [[VecKernels]] static loops.
  *
  * Each expression's generated code is ONE static call, so a stage using
  * them compiles far below the JVM's 64 KB method limit no matter how
  * large the embedded codebook is — the alternative (unrolled scalar
  * terms or higher-order functions) either breaks whole-stage codegen or
  * never participates in it (see the VecKernels scaladoc for measured
  * costs). Bounded constants (codebooks, centroids) arrive as foldable
  * literal children — evaluated once at first use, embedded in generated
  * code as reference objects — so the constructing code stays on the
  * public `call_function` + `typedLit` surface.
  */
abstract class VecExpression extends Expression {
  /** The per-row children; the rest must be foldable constants. */
  protected def streamingArity: Int

  override def nullable: Boolean = children.take(streamingArity).exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.drop(streamingArity).filterNot(_.foldable)
    if (bad.nonEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: constant arguments must be foldable literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  protected def evalLongArray(e: Expression): Array[Long] =
    e.eval(null).asInstanceOf[ArrayData].toLongArray()
  protected def evalFloatArray(e: Expression): Array[Float] =
    e.eval(null).asInstanceOf[ArrayData].toFloatArray()
  protected def evalInt(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()

  /** Java snippet computing the result from the evaluated per-row
    * children's value variables.
    */
  protected def kernelCall(ctx: CodegenContext, vals: Seq[String]): String
  protected def kernelEval(vals: Seq[ArrayData]): Any

  override def eval(input: InternalRow): Any = {
    val vals = children.take(streamingArity).map(_.eval(input))
    if (vals.contains(null)) null
    else kernelEval(vals.map(_.asInstanceOf[ArrayData]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = children.take(streamingArity).map(_.genCode(ctx))
    val jt = CodeGenerator.javaType(dataType)
    val dv = CodeGenerator.defaultValue(dataType)
    val childCode = cs.map(_.code).foldLeft(code"")((acc, c) => code"$acc\n$c")
    val isNull = cs.map(_.isNull.toString).mkString(" || ")
    val call = kernelCall(ctx, cs.map(_.value.toString))
    ev.copy(code =
      code"""
      $childCode
      boolean ${ev.isNull} = $isNull;
      $jt ${ev.value} = $dv;
      if (!${ev.isNull}) {
        ${ev.value} = $call;
      }""")
  }
}

/** graft_scale_q(vec array<float>, scale double lit) → array<long>:
  * `round(x·scale)` per element, Spark Round(double) semantics.
  */
case class ScaleQ(vec: Expression, scaleE: Expression) extends VecExpression {
  override protected def streamingArity: Int = 1
  override def children: Seq[Expression] = Seq(vec, scaleE)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_scale_q"
  @transient private lazy val scale: Double =
    scaleE.eval(null).asInstanceOf[Number].doubleValue()
  override protected def kernelEval(v: Seq[ArrayData]): Any =
    VecKernels.scaleQ(v.head, scale)
  override protected def kernelCall(ctx: CodegenContext, vals: Seq[String]): String =
    s"graft.functions.VecKernels.scaleQ(${vals.head}, ${scale}D)"
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): ScaleQ =
    copy(vec = nc(0), scaleE = nc(1))
}

/** graft_pq_codes(sv array<long>, cb array<long> lit, m int lit) →
  * array<long> of m codes (argmin per subspace, ties → lowest).
  */
case class PqCodesExpr(vec: Expression, cbE: Expression, mE: Expression)
    extends VecExpression {
  override protected def streamingArity: Int = 1
  override def children: Seq[Expression] = Seq(vec, cbE, mE)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"
  @transient private lazy val cb = evalLongArray(cbE)
  @transient private lazy val m = evalInt(mE)
  override protected def kernelEval(v: Seq[ArrayData]): Any =
    VecKernels.pqCodes(v.head, cb, m)
  override protected def kernelCall(ctx: CodegenContext, vals: Seq[String]): String =
    s"graft.functions.VecKernels.pqCodes(${vals.head}, " +
      s"${ctx.addReferenceObj("cb", cb, "long[]")}, $m)"
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): PqCodesExpr =
    copy(vec = nc(0), cbE = nc(1), mE = nc(2))
}

/** graft_pq_dt(sv array<long>, cb array<long> lit, m int lit) →
  * array<long>, the flattened m×ksub ADC distance table.
  */
case class PqDistTableExpr(vec: Expression, cbE: Expression, mE: Expression)
    extends VecExpression {
  override protected def streamingArity: Int = 1
  override def children: Seq[Expression] = Seq(vec, cbE, mE)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_dt"
  @transient private lazy val cb = evalLongArray(cbE)
  @transient private lazy val m = evalInt(mE)
  override protected def kernelEval(v: Seq[ArrayData]): Any =
    VecKernels.pqDistTable(v.head, cb, m)
  override protected def kernelCall(ctx: CodegenContext, vals: Seq[String]): String =
    s"graft.functions.VecKernels.pqDistTable(${vals.head}, " +
      s"${ctx.addReferenceObj("cb", cb, "long[]")}, $m)"
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): PqDistTableExpr =
    copy(vec = nc(0), cbE = nc(1), mE = nc(2))
}

/** graft_adc(dt array<long>, codes array<long>, m int lit) → bigint:
  * Σ_s dt[s·ksub + codes[s]].
  */
case class AdcDistExpr(dt: Expression, codes: Expression, mE: Expression)
    extends VecExpression {
  override protected def streamingArity: Int = 2
  override def children: Seq[Expression] = Seq(dt, codes, mE)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_adc"
  @transient private lazy val m = evalInt(mE)
  override protected def kernelEval(v: Seq[ArrayData]): Any =
    VecKernels.adcDist(v(0), v(1), m)
  override protected def kernelCall(ctx: CodegenContext, vals: Seq[String]): String =
    s"graft.functions.VecKernels.adcDist(${vals(0)}, ${vals(1)}, $m)"
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): AdcDistExpr =
    copy(dt = nc(0), codes = nc(1), mE = nc(2))
}

/** graft_sqdist(a array<long>, b array<long>) → bigint: exact integer
  * squared L2.
  */
case class SqDistExpr(a: Expression, b: Expression) extends VecExpression {
  override protected def streamingArity: Int = 2
  override def children: Seq[Expression] = Seq(a, b)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sqdist"
  override protected def kernelEval(v: Seq[ArrayData]): Any =
    VecKernels.sqDistLong(v(0), v(1))
  override protected def kernelCall(ctx: CodegenContext, vals: Seq[String]): String =
    s"graft.functions.VecKernels.sqDistLong(${vals(0)}, ${vals(1)})"
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): SqDistExpr =
    copy(a = nc(0), b = nc(1))
}

/** graft_sqdist_top2(sv array<long>, cb array<long> lit, cids
  * array<long> lit) → array<long> [cid₁, d²₁, cid₂, d²₂]: nearest and
  * second-nearest centroid under exact integer squared L2, ties →
  * lowest id.
  */
case class SqDistTop2Expr(vec: Expression, cbE: Expression, cidsE: Expression)
    extends VecExpression {
  override protected def streamingArity: Int = 1
  override def children: Seq[Expression] = Seq(vec, cbE, cidsE)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sqdist_top2"
  @transient private lazy val cb = evalLongArray(cbE)
  @transient private lazy val cids = evalLongArray(cidsE)
  override protected def kernelEval(v: Seq[ArrayData]): Any =
    VecKernels.sqDistTop2(v.head, cb, cids)
  override protected def kernelCall(ctx: CodegenContext, vals: Seq[String]): String =
    s"graft.functions.VecKernels.sqDistTop2(${vals.head}, " +
      s"${ctx.addReferenceObj("cb", cb, "long[]")}, " +
      s"${ctx.addReferenceObj("cids", cids, "long[]")})"
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): SqDistTop2Expr =
    copy(vec = nc(0), cbE = nc(1), cidsE = nc(2))
}

/** graft_dot(a array<float>, b array<float>) → double: dot product
  * accumulated in index order from 0.0.
  */
case class DotExpr(a: Expression, b: Expression) extends VecExpression {
  override protected def streamingArity: Int = 2
  override def children: Seq[Expression] = Seq(a, b)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  override protected def kernelEval(v: Seq[ArrayData]): Any =
    VecKernels.dotF(v(0), v(1))
  override protected def kernelCall(ctx: CodegenContext, vals: Seq[String]): String =
    s"graft.functions.VecKernels.dotF(${vals(0)}, ${vals(1)})"
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): DotExpr =
    copy(a = nc(0), b = nc(1))
}

/** graft_wisect(aToks array<string> sorted, aWs array<long>,
  * bToks array<string> sorted) → bigint: Σ aWs[i] where aToks[i] ∈
  * bToks, one merge walk over the two token-sorted arrays.
  */
case class WIsectExpr(aT: Expression, aW: Expression, bT: Expression)
    extends VecExpression {
  override protected def streamingArity: Int = 3
  override def children: Seq[Expression] = Seq(aT, aW, bT)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_wisect"
  override protected def kernelEval(v: Seq[ArrayData]): Any =
    VecKernels.wisect(v(0), v(1), v(2))
  override protected def kernelCall(ctx: CodegenContext, vals: Seq[String]): String =
    s"graft.functions.VecKernels.wisect(${vals(0)}, ${vals(1)}, ${vals(2)})"
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): WIsectExpr =
    copy(aT = nc(0), aW = nc(1), bT = nc(2))
}

/** graft_norm(a array<float>) → double: sqrt of the index-order
  * self-dot.
  */
case class NormExpr(a: Expression) extends VecExpression {
  override protected def streamingArity: Int = 1
  override def children: Seq[Expression] = Seq(a)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm"
  override protected def kernelEval(v: Seq[ArrayData]): Any =
    VecKernels.normF(v.head)
  override protected def kernelCall(ctx: CodegenContext, vals: Seq[String]): String =
    s"graft.functions.VecKernels.normF(${vals.head})"
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): NormExpr =
    copy(a = nc(0))
}

/** graft_lsh_bucket(v array<float>, planes array<double> lit) → bigint:
  * bit j set iff the projection onto plane j is strictly positive.
  */
case class LshBucketExpr(vec: Expression, planesE: Expression) extends VecExpression {
  override protected def streamingArity: Int = 1
  override def children: Seq[Expression] = Seq(vec, planesE)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"
  @transient private lazy val planes: Array[Double] =
    planesE.eval(null).asInstanceOf[ArrayData].toDoubleArray()
  override protected def kernelEval(v: Seq[ArrayData]): Any =
    VecKernels.lshBucketK(v.head, planes)
  override protected def kernelCall(ctx: CodegenContext, vals: Seq[String]): String =
    s"graft.functions.VecKernels.lshBucketK(${vals.head}, " +
      s"${ctx.addReferenceObj("planes", planes, "double[]")})"
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): LshBucketExpr =
    copy(vec = nc(0), planesE = nc(1))
}

/** graft_simhash(hvs array<long>) → bigint: 60-bit SimHash signature
  * from the +1/−1 bit votes of the token hashes.
  */
case class SimHashExpr(hvs: Expression) extends VecExpression {
  override protected def streamingArity: Int = 1
  override def children: Seq[Expression] = Seq(hvs)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def kernelEval(v: Seq[ArrayData]): Any =
    VecKernels.simhash60(v.head)
  override protected def kernelCall(ctx: CodegenContext, vals: Seq[String]): String =
    s"graft.functions.VecKernels.simhash60(${vals.head})"
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): SimHashExpr =
    copy(hvs = nc(0))
}

/** graft_bits_mask(bits array<long>, width int lit) → array<long>:
  * bit-index list folded into a `width`-word bitmask (dense-vocabulary
  * set representation).
  */
case class BitsToMaskExpr(bits: Expression, widthE: Expression) extends VecExpression {
  override protected def streamingArity: Int = 1
  override def children: Seq[Expression] = Seq(bits, widthE)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bits_mask"
  @transient private lazy val width = evalInt(widthE)
  override protected def kernelEval(v: Seq[ArrayData]): Any =
    VecKernels.bitsToMask(v.head, width)
  override protected def kernelCall(ctx: CodegenContext, vals: Seq[String]): String =
    s"graft.functions.VecKernels.bitsToMask(${vals.head}, $width)"
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): BitsToMaskExpr =
    copy(bits = nc(0), widthE = nc(1))
}

/** graft_mask_inter(a array<long>, b array<long>) → bigint:
  * Σ popcount(a & b) — |A ∩ B| of two same-width bitmask sets.
  */
case class MaskIntersectExpr(a: Expression, b: Expression) extends VecExpression {
  override protected def streamingArity: Int = 2
  override def children: Seq[Expression] = Seq(a, b)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_mask_inter"
  override protected def kernelEval(v: Seq[ArrayData]): Any =
    VecKernels.maskIntersect(v(0), v(1))
  override protected def kernelCall(ctx: CodegenContext, vals: Seq[String]): String =
    s"graft.functions.VecKernels.maskIntersect(${vals(0)}, ${vals(1)})"
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): MaskIntersectExpr =
    copy(a = nc(0), b = nc(1))
}

/** graft_tok_mask(text string, vocab array<string> lit) → array<long>:
  * the text's single-space token set as a ⌈|vocab|/64⌉-word bitmask,
  * bit index = the token's position in the (sorted) vocabulary literal.
  */
case class TokMaskExpr(text: Expression, vocabE: Expression)
    extends VecExpression {
  override protected def streamingArity: Int = 1
  override def children: Seq[Expression] = Seq(text, vocabE)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_tok_mask"
  @transient private lazy val bits: java.util.HashMap[String, Integer] = {
    val toks = vocabE.eval(null).asInstanceOf[ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](StringType)
    val m = new java.util.HashMap[String, Integer](toks.length * 2)
    toks.zipWithIndex.foreach { case (t, i) => m.put(t.toString, i) }
    m
  }
  @transient private lazy val width: Int = math.max((bits.size() + 63) / 64, 1)
  override def eval(input: InternalRow): Any = {
    val v = text.eval(input)
    if (v == null) null
    else VecKernels.tokMask(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], bits, width)
  }
  override protected def kernelEval(v: Seq[ArrayData]): Any =
    throw new UnsupportedOperationException("string child — eval overridden")
  override protected def kernelCall(ctx: CodegenContext, vals: Seq[String]): String =
    s"graft.functions.VecKernels.tokMask(${vals.head}, " +
      s"${ctx.addReferenceObj("bits", bits, "java.util.HashMap")}, $width)"
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): TokMaskExpr =
    copy(text = nc(0), vocabE = nc(1))
}

/** graft_wmask_inter(a array<long>, b array<long>, w array<long> lit) →
  * bigint: Σ w(bit) over set bits of a & b — weighted dense-vocabulary
  * intersection with the weight table embedded as a vocab-bounded
  * literal.
  */
case class WMaskIntersectExpr(a: Expression, b: Expression, wE: Expression)
    extends VecExpression {
  override protected def streamingArity: Int = 2
  override def children: Seq[Expression] = Seq(a, b, wE)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_wmask_inter"
  @transient private lazy val w = evalLongArray(wE)
  override protected def kernelEval(v: Seq[ArrayData]): Any =
    VecKernels.wMaskIntersect(v(0), v(1), w)
  override protected def kernelCall(ctx: CodegenContext, vals: Seq[String]): String =
    s"graft.functions.VecKernels.wMaskIntersect(${vals(0)}, ${vals(1)}, " +
      s"${ctx.addReferenceObj("w", w, "long[]")})"
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): WMaskIntersectExpr =
    copy(a = nc(0), b = nc(1), wE = nc(2))
}

/** graft_cos_rank(v array<float>, cents array<float> lit, cids
  * array<long> lit) → array<long>: centroid ids by cosine desc, ties →
  * lowest id.
  */
case class CosRankExpr(vec: Expression, centsE: Expression, cidsE: Expression)
    extends VecExpression {
  override protected def streamingArity: Int = 1
  override def children: Seq[Expression] = Seq(vec, centsE, cidsE)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cos_rank"
  @transient private lazy val cents = evalFloatArray(centsE)
  @transient private lazy val cids = evalLongArray(cidsE)
  override protected def kernelEval(v: Seq[ArrayData]): Any =
    VecKernels.cosRank(v.head, cents, cids)
  override protected def kernelCall(ctx: CodegenContext, vals: Seq[String]): String =
    s"graft.functions.VecKernels.cosRank(${vals.head}, " +
      s"${ctx.addReferenceObj("cents", cents, "float[]")}, " +
      s"${ctx.addReferenceObj("cids", cids, "long[]")})"
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): CosRankExpr =
    copy(vec = nc(0), centsE = nc(1), cidsE = nc(2))
}

/** Session registration for the vector kernel functions (idempotent). */
object VecFunctions {
  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_scale_q" -> (e => ScaleQ(e(0), e(1))),
    "graft_pq_codes" -> (e => PqCodesExpr(e(0), e(1), e(2))),
    "graft_pq_dt" -> (e => PqDistTableExpr(e(0), e(1), e(2))),
    "graft_adc" -> (e => AdcDistExpr(e(0), e(1), e(2))),
    "graft_sqdist" -> (e => SqDistExpr(e(0), e(1))),
    "graft_sqdist_top2" -> (e => SqDistTop2Expr(e(0), e(1), e(2))),
    "graft_dot" -> (e => DotExpr(e(0), e(1))),
    "graft_wisect" -> (e => WIsectExpr(e(0), e(1), e(2))),
    "graft_norm" -> (e => NormExpr(e(0))),
    "graft_lsh_bucket" -> (e => LshBucketExpr(e(0), e(1))),
    "graft_simhash" -> (e => SimHashExpr(e(0))),
    "graft_bits_mask" -> (e => BitsToMaskExpr(e(0), e(1))),
    "graft_mask_inter" -> (e => MaskIntersectExpr(e(0), e(1))),
    "graft_wmask_inter" -> (e => WMaskIntersectExpr(e(0), e(1), e(2))),
    "graft_tok_mask" -> (e => TokMaskExpr(e(0), e(1))),
    "graft_cos_rank" -> (e => CosRankExpr(e(0), e(1), e(2))))

  def register(spark: SparkSession): Unit = fns.foreach { case (name, builder) =>
    val id = FunctionIdentifier(name)
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(
        id, new ExpressionInfo(classOf[VecKernels.type].getName, name), builder)
  }
}
