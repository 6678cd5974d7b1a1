package graft

import graft.carve.ConfigLoader
import graft.evidence.EvidenceOpen
import graft.pipeline.{CarvePipeline, ProgressListener}
import graft.sinks.{MetadataSinks, RunInfo}
import graft.sqlite.SqliteArtefacts
import org.apache.spark.sql.SparkSession

/** End-to-end carve run — the reference binary's main path, Spark-shaped:
  * load the engine config (YAML file or embedded default, sha256
  * config-hash provenance), open the evidence (raw `.dd` or EWF `.E01`,
  * auto-detected), run the scan→carve→extract DAG with live progress
  * reporting, pull browser history/cookies/downloads out of carved
  * SQLite databases, and write every metadata stream plus the one-row
  * run summary in the reference's documented layouts.
  *
  * Usage: runMain graft.Carve <image> <outDir> [configYml]
  * Env:   SPARK_GRAFT_CPUS (default 4), GRAFT_BACKEND (parquet|jsonl|csv),
  *        GRAFT_RUN_ID (default: derived from the image name + media size),
  *        and the reference binary's run toggles (src/cli.rs):
  *        GRAFT_TYPES=jpeg,png,... (allow-list with zip/ole family
  *        expansion), GRAFT_DISABLE_ZIP=true, GRAFT_MAX_BYTES /
  *        GRAFT_MAX_FILES / GRAFT_CHUNK_MIB numeric overrides,
  *        GRAFT_RESUME_OFFSET (skip chunks before the offset),
  *        GRAFT_SCAN_STRINGS / GRAFT_SCAN_ENTROPY =false to disable the
  *        string-artefact / entropy stages.
  */
object Carve {
  def main(args: Array[String]): Unit = runJob(args, sys.env)

  /** The whole run, parameterized on the environment so tests can drive
    * the toggle surface; `stopSession = false` leaves a caller-owned
    * SparkSession running.
    */
  private[graft] def runJob(args: Array[String], env: Map[String, String],
                            stopSession: Boolean = true): Unit = {
    require(args.length >= 2, "usage: Carve <image> <outDir> [configYml]")
    val image = args(0)
    val outDir = args(1)
    val loaded = ConfigLoader.load(args.lift(2).map(java.nio.file.Paths.get(_)))
    val backend = env.getOrElse("GRAFT_BACKEND", "parquet")
    val cpus = env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The reference binary's run toggles, env-mapped onto the config the
    // file/default already produced (CLI precedence: flag > file).
    var cfg0 = loaded.config
    env.get("GRAFT_CHUNK_MIB").foreach(m =>
      cfg0 = cfg0.copy(chunkSize = m.toLong * 1024 * 1024))
    env.get("GRAFT_MAX_BYTES").foreach(b => cfg0 = cfg0.copy(maxBytes = Some(b.toLong)))
    env.get("GRAFT_MAX_FILES").foreach(n => cfg0 = cfg0.copy(maxFiles = Some(n.toLong)))
    val (cfg, unknownTypes) = graft.carve.EngineConfig.filterFileTypes(cfg0,
      env.get("GRAFT_TYPES").map(_.split(",").toSeq),
      disableZip = env.get("GRAFT_DISABLE_ZIP").exists(_.toBoolean))
    unknownTypes.foreach(t => System.err.println(s"[carve] ignoring unknown type: $t"))
    val enableStrings = env.get("GRAFT_SCAN_STRINGS").forall(_.toBoolean)
    val enableEntropy = env.get("GRAFT_SCAN_ENTROPY").forall(_.toBoolean)
    val resumeOffset = env.get("GRAFT_RESUME_OFFSET").map(_.toLong).getOrElse(0L)

    val ref = EvidenceOpen.ref(image)
    val (evidenceLen, evidenceSha) = hashEvidence(ref)
    val runId = env.getOrElse("GRAFT_RUN_ID",
      s"${new java.io.File(image).getName}-$evidenceLen")
    val listener = new ProgressListener(runId, evidenceLen)
    spark.sparkContext.addSparkListener(listener)
    try {
      val result = CarvePipeline.run(spark, ref, cfg, runId,
        enableStrings = enableStrings, enableEntropy = enableEntropy,
        resumeOffset = resumeOffset,
        payloadDir = Some(s"$outDir/carved"))
      val info = RunInfo(runId, ToolVersion, loaded.configHash, image, evidenceSha)
      MetadataSinks.writeAll(spark, outDir, backend,
        result.carvedFiles, result.artefacts, result.entropyRegions, info)
      val history = MetadataSinks.browserHistoryDf(spark,
        SqliteArtefacts.history(spark, ref, result.carvedFiles, runId), info)
      val cookies = MetadataSinks.browserCookiesDf(spark,
        SqliteArtefacts.cookies(spark, ref, result.carvedFiles, runId), info)
      val downloads = MetadataSinks.browserDownloadsDf(spark,
        SqliteArtefacts.downloads(spark, ref, result.carvedFiles, runId), info)
      import spark.implicits._
      val summary = MetadataSinks.runSummaryDf(spark,
        Seq(CarvePipeline.summarize(spark, runId, result)).toDS(), info)
      backend match {
        case "parquet" =>
          history.write.mode("overwrite").parquet(s"$outDir/browser_history")
          cookies.write.mode("overwrite").parquet(s"$outDir/browser_cookies")
          downloads.write.mode("overwrite").parquet(s"$outDir/browser_downloads")
          summary.write.mode("overwrite").parquet(s"$outDir/run_summary")
        case _ =>
          history.write.mode("overwrite").json(s"$outDir/browser_history")
          cookies.write.mode("overwrite").json(s"$outDir/browser_cookies")
          downloads.write.mode("overwrite").json(s"$outDir/browser_downloads")
          summary.write.mode("overwrite").json(s"$outDir/run_summary")
      }
      result.scanned.unpersist()
    } finally spark.sparkContext.removeSparkListener(listener)
    if (stopSession) spark.stop()
  }

  val ToolVersion = "0.4.0"

  /** Stream the evidence once on the driver for (length, sha256) —
    * the reference's compute_sha256 provenance pass.
    */
  private def hashEvidence(ref: graft.evidence.EvidenceRef): (Long, String) = {
    val r = ref.open()
    try {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val buf = new Array[Byte](1 << 20)
      var off = 0L
      var n = 1
      while (n > 0) {
        n = r.readAt(off, buf, 0, buf.length)
        if (n > 0) { md.update(buf, 0, n); off += n }
      }
      (r.length, graft.carve.Hex.lower(md.digest()))
    } finally r.close()
  }
}
