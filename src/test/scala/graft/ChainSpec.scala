package graft

import java.nio.file.Files

import graft.llm.CarvedText
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end acceptance chain over the golden slot fixture: the four
  * product mains' run bodies composed the way a real user composes them
  * — `Carve` an evidence image, bridge the carved payload store back
  * into a documents table, `Curate` it, and `Search` the curated
  * corpus. A regression anywhere in that path (scanner, walkers,
  * payload naming, text extraction, quality gate, dedup, split write,
  * tokenization, BM25) fails this one obvious test.
  */
class ChainSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-chain-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("Carve → carved-text bridge → Curate → Search, end to end") {
    val stride = 4096
    val nSlots = 48L
    // 1. evidence on disk: the bridge fixture's per-slot documents
    // (eml / rtf / fb2 cycling), zero-padded to the stride
    val img = Files.createTempFile("graft-chain", ".dd")
    val out = new java.io.BufferedOutputStream(Files.newOutputStream(img))
    var slot = 0L
    while (slot < nSlots) {
      val sample = graft.queries.BridgeQueries.slotSample(slot)
      out.write(sample)
      out.write(new Array[Byte](stride - sample.length))
      slot += 1
    }
    out.close()

    // 2. the Carve main's whole run body (scan → dedup → carve →
    // payload store), against the caller-owned session
    val carveOut = Files.createTempDirectory("graft-chain-carve").toString
    Carve.runJob(Array(img.toString, carveOut),
      Map("GRAFT_RUN_ID" -> "chain"), stopSession = false)

    // 3. bridge: payload store → documents table. One doc per slot,
    // typed by the slot cycle.
    val docs = CarvedText.documents(spark, s"$carveOut/carved")
      .select((col("global_start") / stride).cast("long").as("doc_id"),
        col("file_type"), col("text"))
    val byType = docs.groupBy("file_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("eml" -> 16L, "rtf" -> 16L, "fb2" -> 16L),
      s"bridge recovered $byType")
    val docsPath = Files.createTempDirectory("graft-chain-docs").toString + "/documents.parquet"
    docs.select(col("doc_id"), col("text"), lit("en").as("lang"))
      .write.parquet(docsPath)

    // 4. the Curate main's run body. Only the eml docs carry enough
    // text to clear the quality gate (the fixture's design); their
    // bodies are near-identical by construction, so the near-dup stage
    // must collapse them to a small survivor set — deterministic, but
    // pinned structurally rather than by exact count.
    val curateOut = Files.createTempDirectory("graft-chain-curate").toString
    val summary = Curate.run(spark, docsPath, None, curateOut, seed = "chain").toMap
    assert(summary("n_raw") == nSlots, s"summary $summary")
    assert(summary("n_quality") == 16L, s"summary $summary")
    assert(summary("n_deduped") >= 1L && summary("n_deduped") <= 16L, s"summary $summary")
    val corpus = spark.read.parquet(s"$curateOut/corpus")
    assert(corpus.count() == summary("n_clean"), "written corpus != n_clean")

    // 5. the Search main's run body over the CURATED corpus: a body
    // term must retrieve an eml document at rank 1
    val hits = Search.run(spark, s"$curateOut/corpus",
        Seq(Seq("fox", "dog")), k = 3)
      .collect()
    assert(hits.nonEmpty, "retrieval over the curated corpus came back empty")
    val top = hits.head
    assert(top.getLong(1) == 1L)
    assert(top.getLong(2) % 3 == 0, s"rank-1 doc ${top.getLong(2)} is not an eml slot")
    assert(top.getString(5).contains("fox"), s"rank-1 text: ${top.getString(5)}")
    graft.llm.CacheRegistry.releaseAll(spark)
  }
}
