package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Carve→curation bridge: turns carved document payloads (the payload
  * store written by [[graft.pipeline.CarvePipeline]] when `payloadDir`
  * is set) into a `documents` DataFrame the curation pipeline
  * ([[graft.Curate]]) consumes. The reference's own artefact path is
  * "text out of evidence" (/root/reference/src/strings/mod.rs:99-115,
  * string artefacts); this extends it from strings to whole recovered
  * documents, closing the forensic→training-data loop.
  *
  * Extraction rules — deterministic and engine-independent, so an
  * oracle can predict them arithmetically:
  *
  *  - `eml` (RFC-822 framing as carved per
  *    /root/reference/src/carve/eml.rs:25-208): headers end at the
  *    first blank line; continuation lines (leading whitespace) unfold
  *    into their header; text = the `Subject:` value, a newline, then
  *    the body with CRLF→LF; trailing whitespace trimmed.
  *
  *  - `rtf` (control-word grammar as carved per
  *    /root/reference/src/carve/rtf.rs:37-127): group braces dropped;
  *    a control word is consumed with its optional numeric parameter
  *    and single delimiting space; `\par`/`\line` emit '\n', `\tab`
  *    emits '\t', `\'hh` emits the latin-1 byte, `\{ \} \\` escape
  *    literally, `\~` is a space; `\uN` emits the signed-16-bit code
  *    unit and suppresses its `\ucN`-many fallback units (default 1);
  *    `\binN` skips N raw bytes (the byte after the digits counts as
  *    the first raw byte — the reference carver's quirk, kept so both
  *    walkers agree on extents); `{\*` destination groups and the
  *    fonttbl/colortbl/stylesheet/info/pict destinations are dropped
  *    whole; raw CR/LF are ignored; trailing whitespace trimmed.
  *
  * Scale shape: one `binaryFile` row per carved document, extraction is
  * a narrow per-row pass — no shuffle, no driver involvement. At 100 TB
  * the payload store is an object-store prefix and this stage is a pure
  * distributed scan; document-sized payloads (KB–MB) are row-local by
  * construction, so no single task ever holds more than a few payloads.
  */
object CarvedText {

  /** RFC-822 text extraction — see object doc for the rule. */
  def emlToText(bytes: Array[Byte]): String = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("\r\n", "\n")
    val split = s.indexOf("\n\n")
    val (head, body) = if (split >= 0) (s.substring(0, split), s.substring(split + 2)) else (s, "")
    val unfolded = head.replaceAll("\n[ \t]+", " ")
    val subject = unfolded.linesIterator
      .collectFirst { case l if l.regionMatches(true, 0, "Subject:", 0, 8) => l.substring(8).trim }
      .getOrElse("")
    dropTrailingWhitespace(subject + "\n" + body)
  }

  // destinations whose content is formatting machinery, not document text
  private val SkipDestinations =
    Set("fonttbl", "colortbl", "stylesheet", "info", "pict")

  /** RTF plain-text extraction — see object doc for the rule. */
  def rtfToText(bytes: Array[Byte]): String = {
    val out = new java.lang.StringBuilder
    val n = bytes.length
    var i = 0
    var depth = 0
    var skipAboveDepth = Int.MaxValue // skipping while depth >= this
    var ucSkip = 1       // \ucN: fallback units after each \uN (default 1)
    var skipFallback = 0 // pending fallback units to suppress after \uN
    while (i < n) {
      val b = bytes(i) & 0xff
      b match {
        case '{' =>
          depth += 1
          i += 1
          // {\* ...} → ignorable destination
          if (depth < skipAboveDepth && i + 1 < n &&
              bytes(i) == '\\' && bytes(i + 1) == '*')
            skipAboveDepth = depth
        case '}' =>
          depth -= 1
          if (depth < skipAboveDepth) skipAboveDepth = Int.MaxValue
          i += 1
        case '\\' if i + 1 < n =>
          val c = bytes(i + 1) & 0xff
          if (c == '{' || c == '}' || c == '\\') {
            if (depth < skipAboveDepth) out.append(c.toChar)
            i += 2
          } else if (c == '\'') {
            if (i + 3 < n) {
              val h1 = Character.digit(bytes(i + 2), 16)
              val h2 = Character.digit(bytes(i + 3), 16)
              if (h1 >= 0 && h2 >= 0) {
                // a hex escape counts as ONE fallback unit after \uN
                if (skipFallback > 0) skipFallback -= 1
                else if (depth < skipAboveDepth) out.append(((h1 << 4) | h2).toChar)
                i += 4
              } else i += 2 // malformed hex escape in a carved payload: drop
            } else i = n
          } else if (c == '~') {
            if (depth < skipAboveDepth) out.append(' ')
            i += 2
          } else if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) {
            // control word: letters, optional (signed) integer parameter,
            // optional single space delimiter
            var j = i + 1
            while (j < n && ((bytes(j) >= 'a' && bytes(j) <= 'z') ||
                (bytes(j) >= 'A' && bytes(j) <= 'Z'))) j += 1
            val word = new String(bytes, i + 1, j - i - 1,
              java.nio.charset.StandardCharsets.ISO_8859_1)
            var param = 0L
            var hasParam = false
            var neg = false
            if (j < n && bytes(j) == '-') { neg = true; j += 1 }
            while (j < n && bytes(j) >= '0' && bytes(j) <= '9') {
              // saturate instead of wrapping: a corrupt 19+-digit \binN
              // must not flip negative and walk its raw payload as text
              if (param < Long.MaxValue / 16) param = param * 10 + (bytes(j) - '0')
              hasParam = true; j += 1
            }
            if (neg) param = -param
            if (word == "bin" && hasParam && param > 0) {
              // reference quirk (RtfCarver, src/carve/rtf.rs:37-127): the
              // byte right after the digits — even a space delimiter —
              // counts as the first raw byte, so no delimiter consumption
              i = j + math.min(param, (n - j).toLong).toInt
            } else {
              if (j < n && bytes(j) == ' ') j += 1 // delimiter consumed
              word match {
                case "par" | "line" if depth < skipAboveDepth => out.append('\n')
                case "tab" if depth < skipAboveDepth => out.append('\t')
                case "uc" if hasParam && param >= 0 =>
                  ucSkip = math.min(param, 8L).toInt // spec default 1; clamp
                case "u" if hasParam =>
                  // \uN: signed 16-bit code unit (negatives wrap by 65536);
                  // emit it and suppress the next ucSkip fallback units
                  val cp = (if (param < 0) param + 65536 else param).toInt
                  if (depth < skipAboveDepth && cp >= 0 && cp <= 0xFFFF &&
                      !Character.isSurrogate(cp.toChar))
                    out.append(cp.toChar)
                  skipFallback = ucSkip
                case w if SkipDestinations.contains(w) =>
                  skipAboveDepth = math.min(skipAboveDepth, depth)
                case _ => ()
              }
              i = j
            }
          } else i += 2 // unknown control symbol: drop
        case '\\' => i += 1 // dangling escape at payload end: drop
        case '\r' | '\n' => i += 1 // raw newlines are not document text
        case _ =>
          // plain text byte = one fallback unit when pending after \uN
          if (skipFallback > 0) skipFallback -= 1
          else if (depth < skipAboveDepth && depth >= 1) out.append(b.toChar)
          i += 1
      }
    }
    dropTrailingWhitespace(out.toString)
  }

  /** FB2 (FictionBook XML, as carved per
    * /root/reference/src/carve/fb2.rs) plain-text extraction: tags
    * drop; the five XML named entities and decimal/hex character
    * references decode; `<p>`/`<v>`/`<title>`/`<subtitle>` closers and
    * `<empty-line/>` emit '\n'; whitespace runs inside text collapse to
    * one space; `<binary>` payloads (base64 cover art) drop whole;
    * trailing whitespace trimmed.
    */
  def fb2ToText(bytes: Array[Byte]): String = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.lang.StringBuilder
    val n = s.length
    var i = 0
    var inBinary = false
    var pendingSpace = false
    def emit(c: Char): Unit = {
      if (c == '\n') { out.append('\n'); pendingSpace = false }
      else {
        if (pendingSpace && out.length > 0 && out.charAt(out.length - 1) != '\n') out.append(' ')
        pendingSpace = false
        out.append(c)
      }
    }
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && s.startsWith("<!--", i)) {
        // comments may contain '>' — skip to the full terminator
        val e = s.indexOf("-->", i)
        i = if (e < 0) n else e + 3
      } else if (c == '<') {
        // quote-aware tag-end scan: '>' inside a quoted attribute value
        // is legal XML and must not terminate the tag
        var close = -1
        var q = 0.toChar
        var j = i + 1
        while (close < 0 && j < n) {
          val cj = s.charAt(j)
          if (q != 0) { if (cj == q) q = 0.toChar }
          else if (cj == '"' || cj == '\'') q = cj
          else if (cj == '>') close = j
          j += 1
        }
        if (close < 0) { i = n }
        else {
          val tag = s.substring(i + 1, close).trim.toLowerCase(java.util.Locale.ROOT)
          val name = tag.stripPrefix("/").takeWhile(ch => ch.isLetterOrDigit || ch == '-')
          // a self-closing <binary/> opens nothing — only a true opener
          // flips the skip on, only </binary> flips it off
          if (name == "binary")
            inBinary = !tag.startsWith("/") && !tag.endsWith("/")
          if (!inBinary) {
            // block-level closers and the self-closing empty-line break lines
            val isCloser = tag.startsWith("/") &&
              Set("p", "v", "title", "subtitle", "stanza", "annotation").contains(name)
            if (isCloser || name == "empty-line") emit('\n')
          }
          i = close + 1
        }
      } else if (inBinary) {
        i += 1
      } else if (c == '&') {
        val semi = s.indexOf(';', i)
        if (semi > i && semi - i <= 9) {
          val ent = s.substring(i + 1, semi)
          // decoded code point — may be astral, so emit via
          // Character.toChars (a bare .toChar truncates above U+FFFF)
          val decoded: Option[Int] = ent match {
            case "amp" => Some('&'); case "lt" => Some('<'); case "gt" => Some('>')
            case "quot" => Some('"'); case "apos" => Some('\'')
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              scala.util.Try(Integer.parseInt(e.drop(2), 16)).toOption
            case e if e.startsWith("#") =>
              scala.util.Try(e.drop(1).toInt).toOption
            case _ => None
          }
          decoded.filter(cp => Character.isValidCodePoint(cp) &&
              !(cp >= 0xD800 && cp <= 0xDFFF)) match {
            case Some(cp) =>
              Character.toChars(cp).foreach(emit)
              i = semi + 1
            case None => emit('&'); i += 1 // not an entity: literal ampersand
          }
        } else { emit('&'); i += 1 }
      } else if (Character.isWhitespace(c)) {
        pendingSpace = true
        i += 1
      } else {
        emit(c)
        i += 1
      }
    }
    dropTrailingWhitespace(out.toString)
  }

  private def dropTrailingWhitespace(s: String): String = {
    var e = s.length
    while (e > 0 && Character.isWhitespace(s.charAt(e - 1))) e -= 1
    s.substring(0, e)
  }

  // carve naming contract: {type}_{offset:012X}.{ext} (graft.carve.Naming)
  private val OffsetRe = "_([0-9A-Fa-f]{12,})\\.[A-Za-z0-9]+$".r

  /** Read a carve payload store into a documents frame:
    * (global_start BIGINT — the carve offset parsed from the payload
    * name, the stable provenance key; file_type; path; text). Only
    * text-bearing types are bridged; other carved payloads (images,
    * archives) stay in the store for the multimodal path.
    */
  def documents(spark: SparkSession, payloadDir: String,
                types: Seq[String] = Seq("eml", "rtf", "fb2")): DataFrame = {
    import spark.implicits._
    val known = Set("eml", "rtf", "fb2")
    require(types.nonEmpty && types.forall(known), s"bridgeable types are $known, got $types")
    val extRe = types.mkString("\\.(", "|", ")$")
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(payloadDir)
      .filter(col("path").rlike(extRe))
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, content) =>
        val text =
          if (path.endsWith(".eml")) emlToText(content)
          else if (path.endsWith(".fb2")) fb2ToText(content)
          else rtfToText(content)
        // fail loudly on a store entry that violates the carve naming
        // contract — a silent -1 would integer-divide to doc_id 0 and
        // collide with slot 0's provenance downstream
        val off = OffsetRe.findFirstMatchIn(path)
          .map(m => java.lang.Long.parseLong(m.group(1), 16))
          .getOrElse(sys.error(
            s"payload name violates the {type}_{offset:012X} contract: $path"))
        val fileType = path.substring(path.lastIndexOf('.') + 1)
        (off, fileType, path, text)
      }
      .toDF("global_start", "file_type", "path", "text")
  }

  /** Generic-string fallback for carved types with no structured walker
    * — the reference's string-artefact path
    * (/root/reference/src/strings/mod.rs:99-115) applied to the payload
    * store, so EVERY carved type contributes to the curation corpus,
    * not just the three text formats: printable ASCII runs of at least
    * `minLen` chars ([[graft.scan.StringScan]], the q21 semantics —
    * `\t` | 0x20-0x7E; UTF-8/16 runs excluded for engine parity) are
    * extracted per payload and joined in offset order into one
    * pseudo-document. Payloads with no qualifying span drop; the
    * structured walkers' types are excluded by default so the two
    * frames compose disjointly (see [[documentsWithStrings]]).
    *
    * Scale shape: identical to [[documents]] — one binaryFile row per
    * carved payload, the scan is a narrow per-row pass, no shuffle, no
    * driver involvement.
    */
  def stringDocuments(spark: SparkSession, payloadDir: String,
                      minLen: Int = 6,
                      excludeTypes: Seq[String] = Seq("eml", "rtf", "fb2")): DataFrame = {
    import spark.implicits._
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val scanner = new graft.scan.StringScan(minLen, 0, scanUtf16 = false)
    val nonAscii = graft.core.StringFlags.Utf8 |
      graft.core.StringFlags.Utf16Le | graft.core.StringFlags.Utf16Be
    val base = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(payloadDir)
    val files =
      if (excludeTypes.isEmpty) base
      else base.filter(!col("path").rlike(excludeTypes.mkString("\\.(", "|", ")$")))
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val spans = scanner.scanChunk(0L, content)
          .filter(sp => (sp.flags & nonAscii) == 0)
          .sortBy(_.localStart)
          .map(sp => new String(content, sp.localStart.toInt, sp.length, "ISO-8859-1"))
        if (spans.isEmpty) None
        else {
          val off = OffsetRe.findFirstMatchIn(path)
            .map(m => java.lang.Long.parseLong(m.group(1), 16))
            .getOrElse(sys.error(
              s"payload name violates the {type}_{offset:012X} contract: $path"))
          Some((off, path.substring(path.lastIndexOf('.') + 1), path,
            spans.mkString("\n")))
        }
      }
      .toDF("global_start", "file_type", "path", "text")
  }

  /** The full bridge: structured text extraction for the types with
    * walkers UNION the generic-string fallback for everything else —
    * one documents frame covering the whole payload store.
    */
  def documentsWithStrings(spark: SparkSession, payloadDir: String,
                           minLen: Int = 6,
                           types: Seq[String] = Seq("eml", "rtf", "fb2")): DataFrame =
    documents(spark, payloadDir, types)
      .unionByName(stringDocuments(spark, payloadDir, minLen, types))
}
