package graft.carve

/** RTF: `{\rtf` then a brace-depth counter with control-word and `\binN`
  * raw-byte skipping; end at depth 0 (reference src/carve/rtf.rs:37-127).
  * The byte after `\binN` digits counts as the first raw byte — ported
  * verbatim, including that quirk.
  */
final class RtfCarver(val maxSize: Long, val minSize: Long, val extension: String = "rtf")
    extends StreamCarver {
  override def fileType: String = "rtf"

  override protected def walk(stream: CarveStream, hit: CarveHit): Boolean = {
    val header = stream.readExact(5)
    if (!(header(0) == '{'.toByte && header(1) == '\\'.toByte && header(2) == 'r'.toByte &&
        header(3) == 't'.toByte && header(4) == 'f'.toByte))
      throw new CarveErrors.Invalid("rtf header mismatch")

    var depth = 1
    var inControl = false
    val controlBuf = new StringBuilder
    var binLen = 0L
    var pending = -1

    while (true) {
      val byte =
        if (pending >= 0) { val b = pending; pending = -1; b }
        else stream.readExact(1)(0) & 0xff

      if (binLen > 0) {
        binLen -= 1
      } else if (inControl) {
        if (controlBuf.isEmpty && (byte == '{'.toInt || byte == '}'.toInt || byte == '\\'.toInt)) {
          inControl = false
        } else if ((byte >= 'a'.toInt && byte <= 'z'.toInt) || (byte >= 'A'.toInt && byte <= 'Z'.toInt)) {
          controlBuf.append(byte.toChar)
        } else if (controlBuf.toString == "bin" && byte >= '0'.toInt && byte <= '9'.toInt) {
          binLen = binLen * 10 + (byte - '0'.toInt)
        } else {
          inControl = false
          controlBuf.clear()
          pending = byte
        }
      } else if (byte == '\\'.toInt) {
        inControl = true
        controlBuf.clear()
        binLen = 0
      } else if (byte == '{'.toInt) {
        depth += 1
      } else if (byte == '}'.toInt) {
        depth -= 1
        if (depth <= 0) return true
      }
    }
    true
  }
}
