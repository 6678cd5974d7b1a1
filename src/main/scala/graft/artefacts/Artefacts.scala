package graft.artefacts

import java.util.regex.Pattern

/** URL / email / phone artefact extraction + normalization with exact
  * reference parity (semantics from src/strings/mod.rs:117-123 regexes,
  * :261-322 normalizers, :194-210 phone plausibility, trailing-punct trim
  * :315-322; URL/email splitting from src/metadata/parquet.rs:1635-1699).
  *
  * Pure Scala — used from Spark via UDF registration (Functions.scala) and
  * from the distributed string pipeline via flatMap. Regexes are compiled
  * per-JVM (lazy vals serialize fine inside closures via the object).
  */
object Artefacts {

  val UrlRe: Pattern = Pattern.compile("(?i)\\b(?:https?://|www\\.)[^\\s\"'<>]+")
  val EmailRe: Pattern = Pattern.compile("(?i)\\b[A-Z0-9._%+-]+@[A-Z0-9.-]+\\.[A-Z]{2,}\\b")
  val PhoneRe: Pattern = Pattern.compile("\\b\\+?\\d[\\d\\s().-]{6,}\\d\\b")

  private val TrailingPunct = Set('.', ',', ';', ':', ')', ']', '}', '"', '\'', '>', '<')

  def trimTrailingPunct(value: String): String = {
    var end = value.length
    while (end > 0 && TrailingPunct.contains(value.charAt(end - 1))) end -= 1
    value.substring(0, end)
  }

  /** Length/host-shape validation; returns the trimmed URL or None. */
  def normalizeUrl(value: String): Option[String] = {
    val trimmed = trimTrailingPunct(value)
    if (trimmed.length < 8 || trimmed.length > 2048) return None
    val lower = trimmed.toLowerCase(java.util.Locale.ROOT)
    val rest =
      if (lower.startsWith("http://")) trimmed.substring(7)
      else if (lower.startsWith("https://")) trimmed.substring(8)
      else if (lower.startsWith("www.")) trimmed.substring(4)
      else return None
    val hostEnd = rest.indexOf('/') match { case -1 => rest.length; case i => i }
    val hostPort = rest.substring(0, hostEnd)
    val host = hostPort.split(":", -1).headOption.getOrElse("")
    if (host.isEmpty || host.length > 253 || !host.contains('.')) return None
    val parts = host.split("\\.", -1)
    if (parts.exists(p => p.isEmpty || p.length > 63)) return None
    Some(trimmed)
  }

  def normalizeEmail(value: String): Option[String] = {
    val trimmed = trimTrailingPunct(value)
    if (trimmed.length < 6 || trimmed.length > 254) return None
    val at = trimmed.indexOf('@')
    if (at < 0) return None
    val local = trimmed.substring(0, at)
    val domain = trimmed.substring(at + 1)
    if (local.isEmpty || local.length > 64) return None
    if (domain.length > 253 || !domain.contains('.')) return None
    if (!domain.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))) return None
    val parts = domain.split("\\.", -1)
    if (parts.exists(p => p.isEmpty || p.length > 63)) return None
    Some(trimmed)
  }

  /** 10–15 digits, at least 4 unique (filters low-entropy false hits). */
  def isPlausiblePhone(value: String): Boolean = {
    val digits = value.filter(_.isDigit)
    val len = digits.length
    len >= 10 && len <= 15 && digits.toSet.size >= 4
  }

  /** One extracted artefact relative to the input text. */
  final case class Found(kind: String, content: String, start: Int)

  /** Run all three extractors over decoded text; order: urls, emails,
    * phones (matching the reference's emit order).
    */
  def extractAll(text: String): Seq[Found] = {
    val out = Seq.newBuilder[Found]
    val um = UrlRe.matcher(text)
    while (um.find()) normalizeUrl(um.group()).foreach(v => out += Found("Url", v, um.start()))
    val em = EmailRe.matcher(text)
    while (em.find()) normalizeEmail(em.group()).foreach(v => out += Found("Email", v, em.start()))
    val pm = PhoneRe.matcher(text)
    while (pm.find()) if (isPlausiblePhone(pm.group())) out += Found("Phone", pm.group(), pm.start())
    out.result()
  }

  /** scheme/host/port/path/query/fragment split
    * (hand-parser parity; `www.`-prefixed bare hosts get scheme "http"
    * and keep the `www.` in the host — differs from Spark's parse_url).
    */
  final case class UrlParts(
      scheme: String,
      host: String,
      port: Option[Int],
      path: Option[String],
      query: Option[String],
      fragment: Option[String])

  def parseUrlParts(url: String): UrlParts = {
    var scheme = ""
    var rest = url
    if (url.startsWith("http://")) { scheme = "http"; rest = url.substring(7) }
    else if (url.startsWith("https://")) { scheme = "https"; rest = url.substring(8) }
    else if (url.startsWith("www.")) { scheme = "http"; rest = url }

    var fragment: Option[String] = None
    var query: Option[String] = None
    var path: Option[String] = None
    var base = rest
    val hashPos = base.indexOf('#')
    if (hashPos >= 0) { fragment = Some(base.substring(hashPos + 1)); base = base.substring(0, hashPos) }
    val qPos = base.indexOf('?')
    if (qPos >= 0) { query = Some(base.substring(qPos + 1)); base = base.substring(0, qPos) }
    val slashPos = base.indexOf('/')
    if (slashPos >= 0) { path = Some(base.substring(slashPos)); base = base.substring(0, slashPos) }

    var host = base
    var port: Option[Int] = None
    val colonPos = base.lastIndexOf(':')
    if (colonPos >= 0) {
      val candidate = base.substring(colonPos + 1)
      if (candidate.nonEmpty && candidate.forall(c => c >= '0' && c <= '9')) {
        try {
          port = Some(candidate.toInt)
          host = base.substring(0, colonPos)
        } catch { case _: NumberFormatException => () }
      }
    }
    UrlParts(scheme, host, port, path, query, fragment)
  }

  /** local/domain at the FIRST '@'; ("","") when absent. */
  def splitEmail(value: String): (String, String) = {
    val pos = value.indexOf('@')
    if (pos >= 0) (value.substring(0, pos), value.substring(pos + 1)) else ("", "")
  }
}
