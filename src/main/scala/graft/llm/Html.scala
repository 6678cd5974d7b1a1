package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Raw-crawl text extraction: HTTP message splitting and HTML→text —
  * the bridge from a WARC `response` record (HTTP headers + HTML bytes)
  * to the text operators (boilerplate report q113, quality battery,
  * dedup, tokenizer). Until this module the crawl front door was
  * WET-only; with it, raw WARC response payloads feed the same
  * pipeline.
  *
  * Every function is a pure `Column` chain over codegen'd built-ins
  * (`regexp_replace`/`replace`/`substr` — no UDF in the hot path), and
  * the semantics are EXACT — a deterministic regex/replace sequence an
  * oracle replays verbatim — rather than a best-effort DOM walk:
  *
  *   1. `<script …>…</script>` and `<style …>…</style>` blocks drop
  *      whole (case-insensitive, dot-matches-newline, non-greedy).
  *   2. `<!-- … -->` comments drop.
  *   3. every remaining `<…>` tag becomes one space (attribute values
  *      containing a literal `>` end the tag early — documented
  *      regex-extraction semantics, identical on both engines).
  *   4. the core named entities decode: `&lt; &gt; &quot; &#39;
  *      &apos; &nbsp;` then `&amp;` LAST (so `&amp;lt;` yields the
  *      literal text `&lt;`, not `<`). The long tail of named/numeric
  *      entities passes through verbatim — decoding it needs a
  *      compute-from-capture the replace chain (and a SQL replay)
  *      cannot express; for quality scoring and dedup the rare
  *      residue is noise-level.
  *   5. whitespace runs (space/tab/CR/LF) collapse to one space; trim.
  *
  * At 100 TB this is the right shape: a narrow per-row expression
  * pipeline inside whole-stage codegen, no shuffle, no driver
  * involvement — extraction cost scales with payload bytes alone.
  */
object Html {

  private val Crlf2 = "\r\n\r\n"

  /** The body of an HTTP message (a WARC `response`/`request` payload):
    * everything after the first CRLFCRLF. NULL when the message has no
    * header terminator (a malformed or truncated capture — quarantine
    * shape, not silent empty text).
    */
  def httpBody(message: Column): Column = {
    val at = instr(message, Crlf2)
    when(at > lit(0), message.substr(at + lit(4), length(message)))
      .otherwise(lit(null))
  }

  /** The HTTP status code of a response message (the leading
    * `HTTP/x.y NNN` line), NULL when absent — filter crawl captures to
    * 200s before extraction.
    */
  def httpStatus(message: Column): Column =
    nullif(regexp_extract(message, "^HTTP/[0-9.]+ ([0-9]{3})", 1), lit(""))
      .cast("int")

  /** One HTTP header value (first occurrence, case-insensitive name
    * match) from the message's header block, NULL when absent. `name`
    * must be a literal header name (it is embedded in the regex —
    * regex metacharacters are quoted).
    */
  def httpHeader(message: Column, name: String): Column = {
    val at = instr(message, Crlf2)
    val block = when(at > lit(0), message.substr(lit(1), at + lit(1)))
      .otherwise(message)
    nullif(regexp_extract(block,
      "(?i)(?:^|\r\n)" + java.util.regex.Pattern.quote(name) +
        ":[ \t]*([^\r\n]*)", 1), lit(""))
  }

  /** HTML → text under the exact semantics documented on [[Html]]. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    // literal (non-regex) replaces; &amp; LAST — the standard ordering
    val decoded = replace(replace(replace(replace(replace(replace(
      noTags,
      lit("&lt;"), lit("<")),
      lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")),
      lit("&#39;"), lit("'")),
      lit("&apos;"), lit("'")),
      lit("&nbsp;"), lit(" "))
    val amp = replace(decoded, lit("&amp;"), lit("&"))
    trim(regexp_replace(amp, "[ \\t\\r\\n]+", " "))
  }

  /** The full response-record bridge: UTF-8 decode of the binary WARC
    * payload → HTTP body → HTML text. One expression, fully codegen'd.
    */
  def responseText(payload: Column): Column =
    htmlToText(httpBody(decode(payload, "UTF-8")))

  /** The page's robots meta directive (`<meta name="robots"
    * content="…">`, attributes in either order, quoted OR unquoted —
    * `<meta name=robots content=noindex>` is valid HTML5 and common
    * in the wild; a quoted-only pattern would wave those pages
    * through the compliance gate), lowercased; NULL when the page
    * declares none. Four RE2-compatible arms (no lookarounds): each
    * order × quoted/unquoted value; the name matches with an optional
    * quote and a required terminator so `name=robotsx` cannot match.
    */
  def metaRobots(html: Column): Column = {
    val name = "name\\s*=\\s*[\"']?robots[\"']?[\\s/>]"
    val arms = Seq(
      s"(?is)<meta\\s[^>]*$name[^>]*content\\s*=\\s*[\"']([^\"'>]*)[\"']",
      s"(?is)<meta\\s[^>]*${name}[^>]*content\\s*=\\s*([^\\s\"'>]+)",
      s"(?is)<meta\\s[^>]*content\\s*=\\s*[\"']([^\"'>]*)[\"'][^>]*$name",
      s"(?is)<meta\\s[^>]*content\\s*=\\s*([^\\s\"'>]+)[^>]*$name")
    lower(coalesce(arms.map(a =>
      nullif(regexp_extract(html, a, 1), lit(""))): _*))
  }

  /** True when the page opts out of indexing (`noindex` anywhere in
    * the robots directive) — the compliance filter a crawl-sourced
    * training corpus applies before anything else reads the text.
    * Pages with no directive are indexable (false), matching the
    * robots exclusion default.
    */
  def noindex(html: Column): Column =
    coalesce(instr(metaRobots(html), "noindex") > lit(0), lit(false))

  /** The equivalent DuckDB SQL chain for [[htmlToText]] applied to the
    * SQL expression `inner` — the single source the oracle queries
    * share, so the Spark semantics and the replay can never drift
    * apart. DuckDB's regexp_replace needs the explicit 'g' flag (Spark
    * is global by default); the patterns are RE2-and-Java-compatible
    * (no backreferences, inline (?is) flags only).
    */
  def htmlToTextSql(inner: String): String = {
    def rr(x: String, pat: String, flags: String): String =
      s"regexp_replace($x, '$pat', ' ', '$flags')"
    val noScript = rr(inner, "(?is)<script\\b[^>]*>.*?</script>", "gis")
    val noStyle = rr(noScript, "(?is)<style\\b[^>]*>.*?</style>", "gis")
    val noComment = rr(noStyle, "(?s)<!--.*?-->", "gs")
    val noTags = rr(noComment, "(?s)<[^>]*>", "gs")
    val decoded =
      s"""replace(replace(replace(replace(replace(replace($noTags,
         |  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
         |  '&apos;', chr(39)), '&nbsp;', ' ')""".stripMargin
    val amp = s"replace($decoded, '&amp;', '&')"
    s"trim(regexp_replace($amp, '[ \\t\\r\\n]+', ' ', 'g'))"
  }

  /** DuckDB SQL for [[httpBody]] over expression `inner`. */
  def httpBodySql(inner: String): String = {
    val crlf2 = "chr(13) || chr(10) || chr(13) || chr(10)"
    s"""CASE WHEN strpos($inner, $crlf2) > 0
       |THEN substr($inner, strpos($inner, $crlf2) + 4) ELSE NULL END""".stripMargin
  }
}
