package graft.sqlite

import scala.collection.mutable

/** Pure-Scala reader for well-formed SQLite main files (format 3) — the
  * analog of the reference's embedded rusqlite usage (SURVEY §7.4 risk 2)
  * built directly on the public file-format spec: 100-byte header, table
  * b-trees (interior 0x05 / leaf 0x0D pages), varint record headers,
  * serial-type values, and overflow-page chains.
  *
  * Scope: read-only table scans + schema introspection — exactly what
  * browser-history extraction needs. No indexes, no WAL, no freelist.
  */
sealed trait SqlValue
case object SqlNull extends SqlValue
final case class SqlInt(value: Long) extends SqlValue
final case class SqlReal(value: Double) extends SqlValue
final case class SqlText(value: String) extends SqlValue
final case class SqlBlob(value: Array[Byte]) extends SqlValue

object SqlValue {
  def asLong(v: SqlValue): Option[Long] = v match {
    case SqlInt(x) => Some(x)
    case SqlReal(x) => Some(x.toLong)
    case _ => None
  }
  def asText(v: SqlValue): Option[String] = v match {
    case SqlText(s) => Some(s)
    case SqlInt(x) => Some(x.toString)
    case SqlReal(x) => Some(x.toString)
    case _ => None
  }
}

final class SqliteParseException(msg: String) extends Exception(msg)

final class SqliteFile(data: Array[Byte]) {
  require(data.length >= 100, "sqlite file too short")
  private val Magic = "SQLite format 3\u0000".getBytes("ISO-8859-1")
  require(data.take(16).sameElements(Magic), "sqlite magic mismatch")

  val pageSize: Int = {
    val raw = ((data(16) & 0xff) << 8) | (data(17) & 0xff)
    if (raw == 1) 65536 else raw
  }
  private val reservedPerPage: Int = data(20) & 0xff
  val usableSize: Int = pageSize - reservedPerPage
  val pageCount: Int = {
    // the in-header database size (bytes 28-31) is only trustworthy when
    // non-zero (old writers and zeroed headers are legal per the spec's
    // version-valid-for rule); fall back to the byte length
    val hdr = ((data(28) & 0xffL) << 24 | (data(29) & 0xffL) << 16 |
      (data(30) & 0xffL) << 8 | (data(31) & 0xffL)).toInt
    val byLen = data.length / pageSize
    if (hdr > 0) math.min(hdr, byLen) else byLen
  }

  @inline private def u8(off: Int): Int = data(off) & 0xff
  @inline private def u16(off: Int): Int = ((data(off) & 0xff) << 8) | (data(off + 1) & 0xff)
  @inline private def u32(off: Int): Long =
    ((data(off) & 0xffL) << 24) | ((data(off + 1) & 0xffL) << 16) | ((data(off + 2) & 0xffL) << 8) | (data(off + 3) & 0xffL)

  /** (value, bytesRead) big-endian varint, 1-9 bytes. */
  private def varint(off: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val b = u8(off + i)
      v = (v << 7) | (b & 0x7f)
      if ((b & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    ((v << 8) | u8(off + 8), 9)
  }

  private def pageOffset(page: Long): Int = ((page - 1) * pageSize).toInt

  /** Full cell payload, following overflow chains when spilled. */
  private def readPayload(localStart: Int, payloadLen: Long, localLen: Int): Array[Byte] = {
    if (payloadLen <= localLen) java.util.Arrays.copyOfRange(data, localStart, localStart + payloadLen.toInt)
    else {
      val out = new Array[Byte](payloadLen.toInt)
      System.arraycopy(data, localStart, out, 0, localLen)
      var got = localLen
      var nextPage = u32(localStart + localLen)
      while (got < payloadLen && nextPage != 0 && nextPage <= pageCount) {
        val base = pageOffset(nextPage)
        val chunk = math.min(usableSize - 4, (payloadLen - got).toInt)
        System.arraycopy(data, base + 4, out, got, chunk)
        got += chunk
        nextPage = u32(base)
      }
      if (got < payloadLen) throw new SqliteParseException("overflow chain truncated")
      out
    }
  }

  /** Decode one record: header varints → serial types → values. */
  private def decodeRecord(payload: Array[Byte]): IndexedSeq[SqlValue] = {
    def pvarint(off: Int): (Long, Int) = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val b = payload(off + i) & 0xff
        v = (v << 7) | (b & 0x7f)
        if ((b & 0x80) == 0) return (v, i + 1)
        i += 1
      }
      ((v << 8) | (payload(off + 8) & 0xff), 9)
    }
    val (headerLen, hl) = pvarint(0)
    if (headerLen < hl || headerLen > payload.length)
      throw new SqliteParseException("record header truncated")
    val types = mutable.ArrayBuffer.empty[Long]
    var off = hl
    while (off < headerLen) {
      // bounds-checked: a corrupt headerLen must raise the class's typed
      // parse error, not an ArrayIndexOutOfBoundsException
      if (off >= payload.length)
        throw new SqliteParseException("record header truncated")
      val (t, n) = pvarint(off)
      types += t
      off += n
    }
    var body = headerLen.toInt
    def need(n: Int): Unit =
      if (n < 0 || body + n > payload.length)
        throw new SqliteParseException("record truncated")
    types.map { t =>
      def beInt(n: Int): Long = {
        need(n)
        var v = if ((payload(body) & 0x80) != 0) -1L else 0L
        var i = 0
        while (i < n) { v = (v << 8) | (payload(body + i) & 0xff); i += 1 }
        body += n
        v
      }
      t match {
        case 0 => SqlNull
        case 1 => SqlInt(beInt(1))
        case 2 => SqlInt(beInt(2))
        case 3 => SqlInt(beInt(3))
        case 4 => SqlInt(beInt(4))
        case 5 => SqlInt(beInt(6))
        case 6 => SqlInt(beInt(8))
        case 7 =>
          need(8)
          var bits = 0L
          var i = 0
          while (i < 8) { bits = (bits << 8) | (payload(body + i) & 0xffL); i += 1 }
          body += 8
          SqlReal(java.lang.Double.longBitsToDouble(bits))
        case 8 => SqlInt(0)
        case 9 => SqlInt(1)
        case n if n >= 12 && n % 2 == 0 =>
          val len = ((n - 12) / 2).toInt
          need(len)
          val v = java.util.Arrays.copyOfRange(payload, body, body + len)
          body += len
          SqlBlob(v)
        case n if n >= 13 =>
          val len = ((n - 13) / 2).toInt
          need(len)
          val v = new String(payload, body, len, "UTF-8")
          body += len
          SqlText(v)
        case other => throw new SqliteParseException(s"serial type $other unsupported")
      }
    }.toIndexedSeq
  }

  /** Walk a table b-tree from its root page; emits (rowid, values). */
  def tableRows(rootPage: Long): Seq[(Long, IndexedSeq[SqlValue])] = {
    val out = mutable.ArrayBuffer.empty[(Long, IndexedSeq[SqlValue])]
    val visited = mutable.Set.empty[Long]

    def walk(page: Long): Unit = {
      if (page < 1 || page > pageCount || !visited.add(page)) return
      val base = pageOffset(page)
      val headerOff = if (page == 1) base + 100 else base
      val flag = u8(headerOff)
      val cellCount = u16(headerOff + 3)
      flag match {
        case 0x0d => // leaf table
          val ptrBase = headerOff + 8
          var c = 0
          while (c < cellCount) {
            val cellOff = base + u16(ptrBase + c * 2)
            val (payloadLen, n1) = varint(cellOff)
            val (rowid, n2) = varint(cellOff + n1)
            val maxLocal = usableSize - 35
            val localLen =
              if (payloadLen <= maxLocal) payloadLen.toInt
              else {
                val minLocal = (usableSize - 12) * 32 / 255 - 23
                val k = minLocal + ((payloadLen - minLocal) % (usableSize - 4)).toInt
                if (k > maxLocal) minLocal else k
              }
            val payload = readPayload(cellOff + n1 + n2, payloadLen, localLen)
            out += ((rowid, decodeRecord(payload)))
            c += 1
          }
        case 0x05 => // interior table
          val ptrBase = headerOff + 12
          var c = 0
          while (c < cellCount) {
            val cellOff = base + u16(ptrBase + c * 2)
            walk(u32(cellOff))
            c += 1
          }
          walk(u32(headerOff + 8)) // right-most pointer
        case other => throw new SqliteParseException(s"unexpected page flag $other on page $page")
      }
    }
    walk(rootPage)
    out.toSeq
  }

  /** sqlite_master rows: (type, name, tbl_name, rootpage, sql).
    * Memoized — hasTable/readTable/tableColumns all consult it, and a
    * def would re-walk the page-1 b-tree on every call.
    */
  lazy val masterRows: Seq[(String, String, String, Long, String)] =
    tableRows(1L).flatMap { case (_, vals) =>
      if (vals.length < 5) None
      else for {
        typ <- SqlValue.asText(vals(0))
        name <- SqlValue.asText(vals(1))
        tbl <- SqlValue.asText(vals(2))
        root <- SqlValue.asLong(vals(3))
      } yield (typ, name, tbl, root, SqlValue.asText(vals(4)).getOrElse(""))
    }

  def hasTable(name: String): Boolean =
    masterRows.exists(r => r._1 == "table" && r._2.equalsIgnoreCase(name))

  /** Column names (lowercased) parsed from CREATE TABLE, plus the index
    * of the INTEGER PRIMARY KEY column (rowid alias) if any.
    */
  def tableColumns(name: String): (IndexedSeq[String], Int) = {
    val sql = masterRows.find(r => r._1 == "table" && r._2.equalsIgnoreCase(name))
      .map(_._5).getOrElse(return (IndexedSeq.empty, -1))
    val open = sql.indexOf('(')
    if (open < 0) return (IndexedSeq.empty, -1)
    var depth = 0
    var end = -1
    var i = open
    while (end < 0 && i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) end = i
        case _ => ()
      }
      i += 1
    }
    if (end < 0) end = sql.length
    val defs = mutable.ArrayBuffer.empty[String]
    var d = 0
    val cur = new StringBuilder
    sql.substring(open + 1, end).foreach {
      case ',' if d == 0 => defs += cur.toString; cur.clear()
      case c =>
        if (c == '(') d += 1 else if (c == ')') d -= 1
        cur.append(c)
    }
    if (cur.nonEmpty) defs += cur.toString
    val constraintKw = Set("primary", "unique", "check", "foreign", "constraint")
    val cols = mutable.ArrayBuffer.empty[String]
    var pkIdx = -1
    defs.map(_.trim).filter(_.nonEmpty).foreach { d0 =>
      val first = d0.split("\\s+|\\(", 2).head.stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("`").stripSuffix("`").stripPrefix("[").stripSuffix("]")
      if (!constraintKw.contains(first.toLowerCase(java.util.Locale.ROOT))) {
        if (d0.toLowerCase(java.util.Locale.ROOT).matches("(?s).*integer\\s+primary\\s+key.*"))
          pkIdx = cols.length
        cols += first.toLowerCase(java.util.Locale.ROOT)
      }
    }
    (cols.toIndexedSeq, pkIdx)
  }

  /** Table scan as column-name → value maps; INTEGER PRIMARY KEY columns
    * (stored as NULL) are substituted with the rowid, matching SQLite's
    * rowid-alias semantics.
    */
  def readTable(name: String): Seq[Map[String, SqlValue]] = {
    val root = masterRows.find(r => r._1 == "table" && r._2.equalsIgnoreCase(name)).map(_._4)
      .getOrElse(return Seq.empty)
    val (cols, pkIdx) = tableColumns(name)
    tableRows(root).map { case (rowid, vals) =>
      cols.zipWithIndex.map { case (cn, i) =>
        val v =
          if (i == pkIdx && (i >= vals.length || vals(i) == SqlNull)) SqlInt(rowid)
          else if (i < vals.length) vals(i)
          else SqlNull
        cn -> v
      }.toMap
    }
  }
}
