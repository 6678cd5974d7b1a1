package graft.functions

import graft.scan.AhoCorasick
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot scalar/table
  * functions — the tier above UDFs (SURVEY §2.9): `shannon_entropy`
  * participates in whole-stage codegen via a static call (no Row boxing,
  * null-safe branch generated inline); `scan_signatures` is a Generator
  * (UDTF shape) emitting one row per signature hit so the scan is usable
  * from SQL: `SELECT ... FROM t LATERAL VIEW scan_signatures(data, 'FFD8FF,89504E47')`.
  */
case class ShannonEntropy(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shannon_entropy requires BINARY input, got ${child.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "shannon_entropy"

  override protected def nullSafeEval(input: Any): Any =
    Entropy.shannon(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Entropy.shannon($c)")

  override protected def withNewChildInternal(newChild: Expression): ShannonEntropy =
    copy(child = newChild)
}

/** scan_signatures(data BINARY, patternsHex STRING) →
  * rows of (byte_offset BIGINT, pattern_idx INT). The automaton is built
  * once per (pattern-list, executor) and cached.
  */
case class ScanSignatures(data: Expression, patterns: Expression)
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(data, patterns)

  override def elementSchema: StructType = StructType(Seq(
    StructField("byte_offset", LongType, nullable = false),
    StructField("pattern_idx", IntegerType, nullable = false)))

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, AhoCorasick]()

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val bytes = data.eval(input).asInstanceOf[Array[Byte]]
    val patStr = patterns.eval(input).asInstanceOf[UTF8String]
    if (bytes == null || patStr == null) return Seq.empty
    val key = patStr.toString
    val ac = cache.computeIfAbsent(key, k =>
      AhoCorasick.build(k.split(",").toIndexedSeq.map(graft.carve.Hex.decode)))
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    ac.scan(bytes)((start, pat) => out += InternalRow(start.toLong, pat))
    out
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ScanSignatures =
    copy(data = newChildren(0), patterns = newChildren(1))

  override def nullable: Boolean = false
}

/** Registration: imperative (per-session) and via SparkSessionExtensions
  * (`--conf spark.sql.extensions=graft.functions.GraftExtensions`).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("shannon_entropy"),
      new ExpressionInfo(classOf[ShannonEntropy].getName, "shannon_entropy"),
      (exprs: Seq[Expression]) => ShannonEntropy(exprs.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("scan_signatures"),
      new ExpressionInfo(classOf[ScanSignatures].getName, "scan_signatures"),
      (exprs: Seq[Expression]) => ScanSignatures(exprs.head, exprs(1)))
  }
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("shannon_entropy"),
      new ExpressionInfo(classOf[ShannonEntropy].getName, "shannon_entropy"),
      (exprs: Seq[Expression]) => ShannonEntropy(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("scan_signatures"),
      new ExpressionInfo(classOf[ScanSignatures].getName, "scan_signatures"),
      (exprs: Seq[Expression]) => ScanSignatures(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_decode_charset"),
      new ExpressionInfo(classOf[TextCodecs.type].getName, "graft_decode_charset"),
      (exprs: Seq[Expression]) => DecodeCharsetExpr(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_decode_nrefs"),
      new ExpressionInfo(classOf[TextCodecs.type].getName, "graft_decode_nrefs"),
      (exprs: Seq[Expression]) => DecodeNumericRefsExpr(exprs.head)))
  }
}
