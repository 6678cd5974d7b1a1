package graft.carve

/** Minimal YAML-subset parser for engine config files — block mappings,
  * block sequences (including `- key: value` inline-map items), flow
  * sequences (`[a, "b"]`), quoted/plain scalars, `#` comments, and empty
  * values as null. No external dependency: the sandbox resolves nothing
  * beyond Spark's jars, and the config grammar (reference
  * config/default.yml:1-331) needs exactly this subset — no anchors,
  * multi-line scalars, or nested flow collections.
  */
object YamlLite {

  sealed trait Node
  /** Raw scalar text, quotes stripped; empty string means YAML null. */
  final case class Scalar(raw: String) extends Node {
    def isNull: Boolean = raw.isEmpty || raw == "~" || raw == "null"
  }
  final case class Arr(items: Vector[Node]) extends Node
  final case class Obj(fields: Vector[(String, Node)]) extends Node {
    def get(key: String): Option[Node] = fields.collectFirst { case (`key`, n) => n }
  }

  private final case class Line(indent: Int, text: String, num: Int)

  def parse(text: String): Obj = {
    val lines = text.split("\n", -1).toVector.zipWithIndex
      .map { case (l, i) => (stripComment(l), i + 1) }
      .filter { case (l, _) => l.trim.nonEmpty }
      .map { case (l, i) => Line(l.takeWhile(_ == ' ').length, l.trim, i) }
    if (lines.isEmpty) Obj(Vector.empty)
    else {
      val (node, rest) = parseBlock(lines, lines.head.indent)
      require(rest.isEmpty, s"unparsed config content at line ${rest.head.num}")
      node match {
        case o: Obj => o
        case _ => throw new IllegalArgumentException("config root must be a mapping")
      }
    }
  }

  /** Drop a trailing comment: '#' at start or preceded by whitespace,
    * outside single/double quotes.
    */
  private def stripComment(line: String): String = {
    var inS = false; var inD = false
    var i = 0
    while (i < line.length) {
      line.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS => inD = !inD
        case '#' if !inS && !inD && (i == 0 || line.charAt(i - 1).isWhitespace) =>
          return line.substring(0, i)
        case _ => ()
      }
      i += 1
    }
    line
  }

  private def parseBlock(lines: Vector[Line], indent: Int): (Node, Vector[Line]) =
    if (lines.nonEmpty && lines.head.indent == indent && lines.head.text.startsWith("-"))
      parseSeq(lines, indent)
    else parseMap(lines, indent)

  private def parseSeq(lines: Vector[Line], indent: Int): (Node, Vector[Line]) = {
    var rest = lines
    val items = Vector.newBuilder[Node]
    while (rest.nonEmpty && rest.head.indent == indent && rest.head.text.startsWith("-")) {
      val head = rest.head
      val after = head.text.drop(1).trim
      val body = rest.tail.takeWhile(_.indent > indent)
      rest = rest.tail.drop(body.length)
      if (after.isEmpty) {
        if (body.isEmpty) items += Scalar("")
        else {
          val (n, rem) = parseBlock(body, body.head.indent)
          require(rem.isEmpty, s"misaligned block under '-' at line ${head.num}")
          items += n
        }
      } else if (isKeyLine(after)) {
        // `- key: value` starts an inline map; its keys sit at the column
        // where `key` begins on the dash line
        val virtualIndent = head.indent + (head.text.length - after.length)
        val (n, rem) = parseMap(Line(virtualIndent, after, head.num) +: body, virtualIndent)
        require(rem.isEmpty, s"misaligned map item at line ${head.num}")
        items += n
      } else items += scalarOrFlow(after, head.num)
    }
    (Arr(items.result()), rest)
  }

  private def parseMap(lines: Vector[Line], indent: Int): (Node, Vector[Line]) = {
    var rest = lines
    val fields = Vector.newBuilder[(String, Node)]
    while (rest.nonEmpty && rest.head.indent == indent && isKeyLine(rest.head.text)) {
      val head = rest.head
      val colon = head.text.indexOf(':')
      val key = unquote(head.text.substring(0, colon).trim)
      val value = head.text.substring(colon + 1).trim
      rest = rest.tail
      if (value.nonEmpty) fields += key -> scalarOrFlow(value, head.num)
      else {
        val body = rest.takeWhile(_.indent > indent)
        if (body.isEmpty) fields += key -> Scalar("")
        else {
          rest = rest.drop(body.length)
          val (n, rem) = parseBlock(body, body.head.indent)
          require(rem.isEmpty, s"misaligned block under '$key' at line ${head.num}")
          fields += key -> n
        }
      }
    }
    (Obj(fields.result()), rest)
  }

  private def isKeyLine(t: String): Boolean = {
    val colon = t.indexOf(':')
    colon > 0 && (colon == t.length - 1 || t.charAt(colon + 1) == ' ') &&
      !t.startsWith("-") && !t.substring(0, colon).exists(c => c == '[' || c == ']')
  }

  private def scalarOrFlow(v: String, num: Int): Node =
    if (v.startsWith("[")) {
      require(v.endsWith("]"), s"unterminated flow sequence at line $num")
      val inner = v.substring(1, v.length - 1).trim
      if (inner.isEmpty) Arr(Vector.empty)
      else Arr(splitFlow(inner).map(s => Scalar(unquote(s.trim))).toVector)
    } else Scalar(unquote(v))

  /** Split a flow-sequence body on commas outside quotes. */
  private def splitFlow(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var inS = false; var inD = false
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS => inD = !inD
        case ',' if !inS && !inD => out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s
}
