package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static text-codec kernels backing the two crawl-decode expressions —
  * plain JVM methods so whole-stage codegen calls them directly (the
  * [[Entropy]]/[[VecKernels]] discipline: no Row boxing, no UDF).
  *
  * [[decodeCharset]] exists because Spark 4's builtin `decode` pins its
  * charset whitelist to the UTF/latin1 family (everything else throws
  * INVALID_PARAMETER_VALUE unless a legacy conf flips) — but a real
  * multilingual crawl is full of shift_jis/euc-jp/gbk/big5/euc-kr
  * pages, and decoding them as UTF-8 mangles every multibyte sequence
  * to U+FFFD irreversibly. Semantics match builtin decode's lenient
  * mode: malformed/unmappable input → U+FFFD, never an error row.
  *
  * [[decodeNumericRefs]] decodes HTML numeric character references
  * (`&#NNN;` / `&#xHH;`, terminating semicolon REQUIRED — the exact,
  * replayable subset) under the HTML5 tokenizer's value rules:
  * the 0x80–0x9F block remaps through the windows-1252 table (what
  * every browser renders for `&#147;`-style legacy refs), and NUL,
  * surrogates, and > 0x10FFFF become U+FFFD. Anything that is not a
  * semicolon-terminated numeric reference passes through verbatim.
  */
object TextCodecs {

  private val charsets =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.charset.Charset]()

  /** Decode `bytes` under the JVM charset named `name` (case-insensitive,
    * aliases honored), malformed/unmappable sequences → U+FFFD. An
    * unknown charset name decodes as UTF-8 (the web default) rather
    * than failing the task — the caller's `when()` dispatch pins the
    * recognized label set, so this arm only sees names it chose.
    */
  def decodeCharset(bytes: Array[Byte], name: UTF8String): Array[Byte] = {
    if (bytes == null || name == null) return null
    // bounded cache: the SQL-exposed function accepts a data-derived
    // charset column, and an unbounded map keyed by hostile labels is
    // an executor-lifetime leak. Clear-on-overflow (not bypass): a
    // pathological feed costs one occasional re-resolve sweep, while a
    // bypass would pay Charset.forName (exception-throwing for unknown
    // labels) per ROW once the cap filled — the hot loop stays a map
    // hit either way
    def resolve(n: String) =
      try java.nio.charset.Charset.forName(n)
      catch { case _: Exception => java.nio.charset.StandardCharsets.UTF_8 }
    val key = name.toString.toLowerCase(java.util.Locale.ROOT)
    if (charsets.size >= 4096) charsets.clear()
    val cs = charsets.computeIfAbsent(key, resolve)
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    out.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The HTML5 numeric-reference remap for 0x80–0x9F (the windows-1252
    * table); identity-mapped entries (0x81, 0x8D, 0x8F, 0x90, 0x9D)
    * keep their code point.
    */
  private val C1Remap: Array[Int] = Array(
    0x20AC, 0x81, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x8D, 0x017D, 0x8F,
    0x90, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x9D, 0x017E, 0x0178)

  /** The core named entities [[decodeNumericRefs]] also decodes —
    * the [[graft.llm.Html]] step-4 set. Decoding them in the SAME
    * single left-to-right pass as the numeric refs is what makes the
    * ordering hazards structurally impossible: output is never
    * re-scanned, so `&amp;#65;` yields the literal `&#65;` and
    * `&#38;amp;` yields the literal `&amp;` — both exactly HTML5's
    * single-decode behavior, where any replace CHAIN gets one of the
    * two wrong.
    */
  private val Named: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** Decode the pinned named set and semicolon-terminated
    * `&#NNN;`/`&#xHH;` references in `s`, one left-to-right pass;
    * everything else (the long named tail, unterminated refs, bare
    * `&#`) passes through byte-identical.
    */
  def decodeNumericRefs(s: UTF8String): UTF8String = {
    if (s == null) return null
    val in = s.toString
    if (!in.contains("&")) return s
    val sb = new java.lang.StringBuilder(in.length)
    var i = 0
    val n = in.length
    while (i < n) {
      val c = in.charAt(i)
      if (c == '&' && i + 2 < n && in.charAt(i + 1) == '#') {
        val hex = in.charAt(i + 2) == 'x' || in.charAt(i + 2) == 'X'
        var j = i + (if (hex) 3 else 2)
        var v = 0L
        var digits = 0
        var cont = true
        while (cont && j < n) {
          val d = in.charAt(j)
          val dv =
            if (d >= '0' && d <= '9') d - '0'
            else if (hex && d >= 'a' && d <= 'f') d - 'a' + 10
            else if (hex && d >= 'A' && d <= 'F') d - 'A' + 10
            else -1
          if (dv < 0) cont = false
          else {
            // clamp instead of overflow: anything past 0x10FFFF is
            // U+FFFD regardless of how many more digits follow
            v = math.min(v * (if (hex) 16 else 10) + dv, 0x7FFFFFFFL)
            digits += 1
            j += 1
          }
        }
        if (digits > 0 && j < n && in.charAt(j) == ';') {
          val cp =
            if (v == 0 || v > 0x10FFFF || (v >= 0xD800 && v <= 0xDFFF)) 0xFFFD
            else if (v >= 0x80 && v <= 0x9F) C1Remap((v - 0x80).toInt)
            else v.toInt
          sb.appendCodePoint(cp)
          i = j + 1
        } else { sb.append(c); i += 1 }
      } else if (c == '&') {
        val hit = Named.find { case (e, _) => in.startsWith(e, i) }
        hit match {
          case Some((e, out)) => sb.append(out); i += e.length
          case None => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }
}

/** graft_decode_charset(payload BINARY, charset STRING) → STRING:
  * lenient any-JVM-charset decode (see [[TextCodecs.decodeCharset]]).
  * The kernel returns UTF-8 bytes; wrapping them as a UTF8String is
  * exact because the decode already replaced every invalid sequence.
  */
case class DecodeCharsetExpr(bin: Expression, cs: Expression)
    extends BinaryExpression {
  override def left: Expression = bin
  override def right: Expression = cs
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_decode_charset"

  override def checkInputDataTypes(): TypeCheckResult =
    if (bin.dataType == BinaryType && cs.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_decode_charset requires (BINARY, STRING), got " +
        s"(${bin.dataType}, ${cs.dataType})")

  override protected def nullSafeEval(b: Any, c: Any): Any =
    UTF8String.fromBytes(TextCodecs.decodeCharset(
      b.asInstanceOf[Array[Byte]], c.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, c) =>
      s"UTF8String.fromBytes(graft.functions.TextCodecs.decodeCharset($b, $c))")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DecodeCharsetExpr = copy(bin = l, cs = r)
}

/** graft_decode_nrefs(s STRING) → STRING: HTML numeric character
  * references decode (see [[TextCodecs.decodeNumericRefs]]).
  */
case class DecodeNumericRefsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_decode_nrefs"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_decode_nrefs requires STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    TextCodecs.decodeNumericRefs(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextCodecs.decodeNumericRefs($c)")

  override protected def withNewChildInternal(
      newChild: Expression): DecodeNumericRefsExpr = copy(child = newChild)
}

/** Session registration for the text-codec functions (idempotent) —
  * called by the session-bearing entry points ([[graft.queries.Registry]]
  * table reads, the WARC readers) so the pure-`Column` [[graft.llm.Html]]
  * chains resolve; cluster deployments get them via [[GraftExtensions]].
  */
object TextFunctions {
  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_decode_charset" -> (e => DecodeCharsetExpr(e(0), e(1))),
    "graft_decode_nrefs" -> (e => DecodeNumericRefsExpr(e(0))))

  def register(spark: SparkSession): Unit = fns.foreach { case (name, builder) =>
    val id = FunctionIdentifier(name)
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(
        id, new ExpressionInfo(classOf[TextCodecs.type].getName, name), builder)
  }
}
