package graft.core

/** Unsigned UTF-8 byte order for driver-side string comparisons.
  *
  * Driver fallback paths (LPA, BPE training) must break ties the way
  * the distributed path's `orderBy`/`min()` does — Spark compares
  * UTF8String by unsigned byte, i.e. code-point order — NOT Java's
  * UTF-16 code-unit order, which disagrees for BMP chars in
  * [U+E000, U+FFFF] vs supplementary-plane characters (surrogate
  * pairs start 0xD800–0xDBFF, below 0xE000). Using String's natural
  * ordering in a driver tie-break silently violates the
  * "spec pins both paths row-identical" contract on emoji-bearing
  * corpora.
  */
object Utf8Order {

  def less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Total order on String by unsigned UTF-8 bytes. */
  val stringOrdering: Ordering[String] =
    Ordering.fromLessThan(less)
}
