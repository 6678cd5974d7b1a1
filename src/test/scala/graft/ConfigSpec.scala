package graft

import graft.carve.{ConfigLoader, EngineConfig, FileTypeConfig, HeaderPattern, YamlLite}
import org.scalatest.funsuite.AnyFunSuite

/** Config-file loading parity (reference src/config.rs:87-105 +
  * config/default.yml): embedded default fallback reproduces the
  * compiled-in defaults exactly, configHash is sha256 over the raw file
  * bytes, and user files override field-by-field.
  */
class ConfigSpec extends AnyFunSuite {

  test("embedded default reproduces EngineConfig() exactly, all 31 file types") {
    val loaded = ConfigLoader.loadDefault()
    val want = EngineConfig()
    assert(loaded.config.fileTypes.length == 31)
    assert(loaded.config.fileTypes == want.fileTypes)
    assert(loaded.config == want)
    // the zip entry must carry require_eocd through the parse
    val zip = loaded.config.fileTypes.find(_.id == "zip").get
    assert(zip.requireEocd)
    assert(loaded.config.fileTypes.count(_.requireEocd) == 1)
  }

  test("configHash is sha256 over the raw bytes — comments change it, semantics don't") {
    val in = getClass.getResourceAsStream("/graft-default.yml")
    val bytes = try in.readAllBytes() finally in.close()
    val want = graft.carve.Hex.lower(
      java.security.MessageDigest.getInstance("SHA-256").digest(bytes))
    assert(ConfigLoader.loadDefault().configHash == want)
    // a comment-only edit: same parsed config, different hash
    val commented = ("# extra comment\n" + new String(bytes, "UTF-8")).getBytes("UTF-8")
    val reloaded = ConfigLoader.fromBytes(commented)
    assert(reloaded.config == ConfigLoader.loadDefault().config)
    assert(reloaded.configHash != want)
  }

  test("user file overrides scalars, lists, and file_types; unknown keys ignored") {
    val yml =
      """# trimmed engine config
        |chunk_size: 1048576
        |overlap_bytes: 4096   # inline comment
        |quicktime_mode: "mp4"
        |max_files: 25
        |zip_allowed_kinds: [docx, "xlsx"]
        |some_future_knob: 42
        |entropy_threshold: 6.5
        |file_types:
        |  - id: "jpeg"
        |    extensions: ["jpg", "jpeg"]
        |    header_patterns:
        |      - id: "jpeg_soi"
        |        hex: "FFD8FF"
        |    footer_patterns: []
        |    max_size: 1000000
        |    min_size: 500
        |    validator: "jpeg"
        |  - id: "frame"
        |    extensions:
        |      - bin
        |    header_patterns:
        |      - id: "frame_hdr"
        |        hex: "AA55"
        |    footer_patterns:
        |      - id: "frame_ftr"
        |        hex: "55AA"
        |    max_size: 4096
        |    min_size: 8
        |    validator: "footer"
        |""".stripMargin
    val loaded = ConfigLoader.fromBytes(yml.getBytes("UTF-8"))
    val c = loaded.config
    assert(c.chunkSize == 1048576L && c.overlap == 4096L)
    assert(c.quicktimeMode == "mp4" && c.maxFiles.contains(25L))
    assert(c.zipAllowedKinds.contains(Seq("docx", "xlsx")))
    assert(c.entropyThreshold == 6.5)
    // untouched keys keep defaults
    assert(c.stringMinLen == EngineConfig().stringMinLen)
    assert(c.maxBytes.isEmpty && c.oleAllowedKinds.isEmpty)
    assert(c.fileTypes == Seq(
      FileTypeConfig("jpeg", Seq("jpg", "jpeg"), Seq(HeaderPattern("jpeg_soi", "FFD8FF")),
        Seq.empty, 1000000L, 500L, "jpeg"),
      FileTypeConfig("frame", Seq("bin"), Seq(HeaderPattern("frame_hdr", "AA55")),
        Seq(HeaderPattern("frame_ftr", "55AA")), 4096L, 8L, "footer")))
    // the parsed config drives a working registry (footer carver included)
    val reg = EngineConfig.buildRegistry(c)
    assert(reg.keySet == Set("jpeg", "frame"))
  }

  test("YamlLite rejects malformed documents instead of guessing") {
    intercept[IllegalArgumentException] {
      YamlLite.parse("file_types:\n  - id: \"x\"\n bad_dedent: 1")
    }
    intercept[IllegalArgumentException] {
      ConfigLoader.fromBytes("file_types:\n  - 42\n".getBytes("UTF-8"))
    }
  }

  test("load(None) falls back to the embedded default; load(path) reads the file") {
    val tmp = java.nio.file.Files.createTempFile("graft-config", ".yml")
    try {
      java.nio.file.Files.writeString(tmp, "chunk_size: 2097152\n")
      assert(ConfigLoader.load(Some(tmp)).config.chunkSize == 2097152L)
      assert(ConfigLoader.load(None).config == EngineConfig())
    } finally java.nio.file.Files.delete(tmp)
  }
}
