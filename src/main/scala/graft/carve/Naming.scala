package graft.carve

/** Carved-output naming + path sanitization (semantics: reference
  * src/carve/mod.rs:141-196 — `{type}_{offset:012X}.{ext}` under a
  * per-type directory; components sanitized to `[A-Za-z0-9._-]`, `..`
  * collapsed, surrounding dots trimmed, empty → "unknown").
  *
  * Deterministic names keyed by global offset make carve retries (Spark
  * task re-attempts / speculative execution) idempotent — the reference
  * relies on the same property for its exactly-once story.
  */
object Naming {

  def sanitizeComponent(value: String): String = {
    val sb = new StringBuilder(value.length)
    value.foreach { ch =>
      if (ch.isLetterOrDigit && ch < 128 || ch == '_' || ch == '-' || ch == '.') sb.append(ch)
      else sb.append('_')
    }
    var out = sb.toString
    while (out.contains("..")) out = out.replace("..", "_")
    val trimmed = out.dropWhile(_ == '.').reverse.dropWhile(_ == '.').reverse
    if (trimmed.isEmpty) "unknown" else trimmed
  }

  def sanitizeExtension(ext: String): String =
    sanitizeComponent(ext).dropWhile(_ == '.').toLowerCase(java.util.Locale.ROOT)

  /** Relative path `safe_type/safe_type_OFFSETHEX[.ext]`. */
  def relPath(fileType: String, extension: String, globalStart: Long): String = {
    val safeType = sanitizeComponent(fileType)
    val safeExt = sanitizeExtension(extension)
    val base = f"${safeType}_$globalStart%012X"
    if (safeExt.isEmpty) s"$safeType/$base" else s"$safeType/$base.$safeExt"
  }
}
