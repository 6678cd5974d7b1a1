package graft.carve

import java.nio.charset.StandardCharsets.UTF_8

/** Config-file loading with the reference's semantics (src/config.rs:
  * 87-105): read the file if given, else fall back to the EMBEDDED
  * default document; parse into [[EngineConfig]]; and record
  * `configHash` = sha256 over the raw file bytes — the provenance value
  * that lands next to every sink row, so a run is attributable to the
  * exact configuration text that produced it (semantic equality is not
  * enough: two files differing only in comments hash differently, as in
  * the reference).
  *
  * Unknown keys are ignored (forward compatibility); absent keys keep
  * the [[EngineConfig]] default. The embedded default at
  * `resources/graft-default.yml` round-trips to exactly
  * `EngineConfig()` — ConfigSpec pins that, field for field, across all
  * 31 file types.
  */
object ConfigLoader {

  final case class Loaded(config: EngineConfig, configHash: String)

  /** The embedded default document (reference include_bytes! analog). */
  def loadDefault(): Loaded = {
    val in = getClass.getResourceAsStream("/graft-default.yml")
    require(in != null, "embedded default config resource missing")
    try fromBytes(in.readAllBytes())
    finally in.close()
  }

  def load(path: java.nio.file.Path): Loaded =
    fromBytes(java.nio.file.Files.readAllBytes(path))

  def load(path: Option[java.nio.file.Path]): Loaded =
    path.map(load).getOrElse(loadDefault())

  def fromBytes(bytes: Array[Byte]): Loaded = {
    val root = YamlLite.parse(new String(bytes, UTF_8))
    val base = EngineConfig()
    val cfg = EngineConfig(
      fileTypes = root.get("file_types") match {
        case Some(YamlLite.Arr(items)) => items.map(toFileType)
        case _ => base.fileTypes
      },
      chunkSize = longOr(root, "chunk_size", base.chunkSize),
      overlap = longOr(root, "overlap_bytes", base.overlap),
      stringMinLen = longOr(root, "string_min_len", base.stringMinLen).toInt,
      stringMaxLen = longOr(root, "string_max_len", base.stringMaxLen).toInt,
      stringScanUtf16 = boolOr(root, "string_scan_utf16", base.stringScanUtf16),
      enableUrlScan = boolOr(root, "enable_url_scan", base.enableUrlScan),
      enableEmailScan = boolOr(root, "enable_email_scan", base.enableEmailScan),
      enablePhoneScan = boolOr(root, "enable_phone_scan", base.enablePhoneScan),
      sqlitePageRecovery = boolOr(root, "enable_sqlite_page_recovery", base.sqlitePageRecovery),
      entropyWindowSize = longOr(root, "entropy_window_size", base.entropyWindowSize).toInt,
      entropyThreshold = doubleOr(root, "entropy_threshold", base.entropyThreshold),
      zipAllowedKinds = strListOpt(root, "zip_allowed_kinds"),
      oleAllowedKinds = strListOpt(root, "ole_allowed_kinds"),
      quicktimeMode = strOr(root, "quicktime_mode", base.quicktimeMode),
      maxFiles = longOpt(root, "max_files"),
      maxBytes = longOpt(root, "max_bytes"),
      maxChunks = longOpt(root, "max_chunks"))
    Loaded(cfg, Hex.lower(
      java.security.MessageDigest.getInstance("SHA-256").digest(bytes)))
  }

  private def toFileType(n: YamlLite.Node): FileTypeConfig = n match {
    case o: YamlLite.Obj =>
      val id = strOr(o, "id", "")
      require(id.nonEmpty, "file type entry missing id")
      FileTypeConfig(
        id = id,
        extensions = strList(o, "extensions"),
        headerPatterns = patterns(o, "header_patterns"),
        footerPatterns = patterns(o, "footer_patterns"),
        maxSize = longOr(o, "max_size", 100L * 1024 * 1024),
        minSize = longOr(o, "min_size", 0L),
        validator = strOr(o, "validator", id),
        requireEocd = boolOr(o, "require_eocd", default = false))
    case _ => throw new IllegalArgumentException("file_types entries must be mappings")
  }

  private def patterns(o: YamlLite.Obj, key: String): Seq[HeaderPattern] =
    o.get(key) match {
      case Some(YamlLite.Arr(items)) => items.map {
        case p: YamlLite.Obj =>
          val pat = HeaderPattern(strOr(p, "id", ""), strOr(p, "hex", ""))
          require(pat.id.nonEmpty && pat.hex.nonEmpty, s"pattern in $key missing id/hex")
          pat
        case _ => throw new IllegalArgumentException(s"$key entries must be mappings")
      }
      case _ => Seq.empty
    }

  private def scalar(o: YamlLite.Obj, key: String): Option[String] =
    o.get(key) match {
      case Some(s: YamlLite.Scalar) if !s.isNull => Some(s.raw)
      case _ => None
    }

  private def strOr(o: YamlLite.Obj, key: String, default: String): String =
    scalar(o, key).getOrElse(default)

  private def longOr(o: YamlLite.Obj, key: String, default: Long): Long =
    scalar(o, key).map(_.toLong).getOrElse(default)

  private def longOpt(o: YamlLite.Obj, key: String): Option[Long] =
    scalar(o, key).map(_.toLong)

  private def doubleOr(o: YamlLite.Obj, key: String, default: Double): Double =
    scalar(o, key).map(_.toDouble).getOrElse(default)

  private def boolOr(o: YamlLite.Obj, key: String, default: Boolean): Boolean =
    scalar(o, key).map(_.toBoolean).getOrElse(default)

  private def strList(o: YamlLite.Obj, key: String): Seq[String] =
    o.get(key) match {
      case Some(YamlLite.Arr(items)) => items.collect { case s: YamlLite.Scalar => s.raw }
      case _ => Seq.empty
    }

  private def strListOpt(o: YamlLite.Obj, key: String): Option[Seq[String]] =
    o.get(key) match {
      case Some(YamlLite.Arr(items)) if items.nonEmpty =>
        Some(items.collect { case s: YamlLite.Scalar => s.raw })
      case _ => None
    }
}
