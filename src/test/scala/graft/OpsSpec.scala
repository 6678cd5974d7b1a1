package graft

import graft.carve.EngineConfig
import graft.core.CheckpointState
import graft.evidence.InMemoryRef
import graft.fixtures.FixtureBytes
import graft.pipeline.{CarvePipeline, Checkpoint}
import graft.sinks.{MetadataSinks, RunInfo}
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Sinks, checkpoint/resume, and the Structured Streaming variant. */
class OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ops-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(): String = Files.createTempDirectory("graft-ops").toString

  private val cfg = EngineConfig(
    fileTypes = EngineConfig.defaultFileTypes.map(_.copy(minSize = 0)),
    chunkSize = 8192, overlap = 1024)

  test("metadata sinks write reference layouts") {
    val msg = "visit https://sink.example.com/x mail sink@example.org now".getBytes("ISO-8859-1")
    val evidence = new Array[Byte](16384)
    System.arraycopy(FixtureBytes.jpeg(), 0, evidence, 0, FixtureBytes.jpeg().length)
    System.arraycopy(msg, 0, evidence, 4096, msg.length)
    val result = CarvePipeline.run(spark, InMemoryRef(evidence), cfg, "sinkrun")
    val info = RunInfo("sinkrun", "0.1.0", "cfg-hash", "mem://evidence", "sha")
    val out = tmp()
    MetadataSinks.writeAll(spark, out, "parquet", result.carvedFiles, result.artefacts, result.entropyRegions, info)
    val files = spark.read.parquet(s"$out/files")
    assert(files.columns.contains("carved_path") && files.columns.contains("file_type"))
    assert(files.count() == 1)
    val urls = spark.read.parquet(s"$out/artefacts_urls")
    val row = urls.collect().head
    assert(row.getAs[String]("url") == "https://sink.example.com/x")
    assert(row.getAs[String]("host") == "sink.example.com")
    val emails = spark.read.parquet(s"$out/artefacts_emails")
    assert(emails.collect().head.getAs[String]("domain") == "example.org")
    // jsonl + csv backends also produce readable output
    val out2 = tmp()
    MetadataSinks.writeAll(spark, out2, "jsonl", result.carvedFiles, result.artefacts, result.entropyRegions, info)
    assert(spark.read.json(s"$out2/carved_files").count() == 1)
  }

  test("checkpoint roundtrip and validation") {
    val path = tmp() + "/cp.json"
    val state = CheckpointState(1, "run \"x\"", 8192, 1024, 16384, 1 << 20, "2026-08-12T00:00:00Z")
    Checkpoint.save(path, state)
    val loaded = Checkpoint.load(path)
    assert(loaded == state)
    assert(Checkpoint.validate(loaded, 8192, 1024, 1 << 20) == Right(16384L))
    assert(Checkpoint.validate(loaded, 4096, 1024, 1 << 20).isLeft)
    assert(Checkpoint.validate(loaded, 8192, 512, 1 << 20).isLeft)
    assert(Checkpoint.validate(loaded.copy(nextOffset = 1 << 21), 8192, 1024, 1 << 20).isLeft)
  }

  test("streaming variant carves announced chunk ranges exactly once") {
    val sample = FixtureBytes.jpeg()
    val evidence = new Array[Byte](3 * 8192)
    System.arraycopy(sample, 0, evidence, 100, sample.length)
    System.arraycopy(sample, 0, evidence, 16500, sample.length)
    val manifestDir = tmp()
    val outDir = tmp()
    val cpDir = tmp()
    Files.write(java.nio.file.Paths.get(s"$manifestDir/m0.json"),
      """{"start": 0, "length": 8192}
        |{"start": 16384, "length": 8192}""".stripMargin.getBytes)
    val q = StreamingPipeline.run(spark, manifestDir, InMemoryRef(evidence), cfg,
      "stream-run", outDir, cpDir)
    q.awaitTermination(60000)
    val batches = new java.io.File(outDir).listFiles().filter(_.getName.startsWith("batch_"))
    assert(batches.nonEmpty)
    val carved = spark.read.parquet(batches.map(_.getPath): _*)
    assert(carved.count() == 2)
    assert(carved.select("globalStart").collect().map(_.getLong(0)).toSet == Set(100L, 16500L))
  }

  test("payload writing produces byte-exact carved files with classified paths") {
    val jpeg = FixtureBytes.jpeg()
    val docx = FixtureBytes.zipWithEntry("word/document.xml")
    val evidence = new Array[Byte](3 * 8192)
    System.arraycopy(jpeg, 0, evidence, 256, jpeg.length)
    System.arraycopy(docx, 0, evidence, 8192, docx.length)
    val outDir = tmp()
    val result = CarvePipeline.run(spark, InMemoryRef(evidence), cfg, "payrun",
      enableStrings = false, enableEntropy = false, payloadDir = Some(outDir))
    val carved = result.carvedFiles.collect()
    assert(carved.length == 2)
    carved.foreach { c =>
      val bytes = Files.readAllBytes(java.nio.file.Paths.get(outDir, c.path))
      assert(bytes.length == c.size)
      assert(FixtureBytes.sha256Hex(bytes) == c.sha256)
    }
    assert(carved.exists(_.path.startsWith("docx/")))
    assert(Files.exists(java.nio.file.Paths.get(outDir, "docx")))
  }

  test("carve re-validation detects payload tampering") {
    val jpeg = FixtureBytes.jpeg()
    val evidence = new Array[Byte](8192)
    System.arraycopy(jpeg, 0, evidence, 64, jpeg.length)
    val ref = InMemoryRef(evidence)
    val result = CarvePipeline.run(spark, ref, cfg, "v", enableStrings = false, enableEntropy = false)
    val ok = CarvePipeline.validateCarved(spark, ref, result.carvedFiles)
    assert(ok.collect().forall(_._2))
    // tampered evidence: same records, different bytes
    val tampered = evidence.clone(); tampered(70) = 0x55
    val bad = CarvePipeline.validateCarved(spark, InMemoryRef(tampered), result.carvedFiles)
    assert(bad.collect().exists(!_._2))
  }

  test("config hash is stable and sensitive") {
    val a = EngineConfig()
    val b = EngineConfig()
    assert(a.configHash == b.configHash)
    assert(a.configHash.length == 64)
    assert(a.copy(overlap = 1234).configHash != a.configHash)
    assert(a.copy(fileTypes = a.fileTypes.filterNot(_.id == "zip")).configHash != a.configHash)
  }
}
