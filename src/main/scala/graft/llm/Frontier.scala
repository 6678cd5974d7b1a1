package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crawl frontier — the persisted SEEN-URL set that closes the crawl
  * loop: fetch → parse ([[graft.sources.WarcCorpus]]) → extract
  * outlinks ([[UrlOps.extractLinks]]) → probe here → the unseen URLs
  * become the next fetch manifest, and the frontier grows by exactly
  * those URLs. The fourth instantiation of the [[PersistedIndex]]
  * lifecycle (manifest + fence + fsync'd ledger + crash points), so a
  * crawling stream gets the same crash-window guarantees as the
  * dedup/BM25/ANN ingest triangle.
  *
  * Keys are two 60-bit halves of the URL's md5 (`k1`,`k2` — the
  * [[Dedup]] canonical-text key trick: BIGINT join keys, no 32-char
  * string shuffles, collision odds ≈ 2⁻¹²⁰ · |pairs|). The key table
  * is bucketed by `k1` so growth stays co-located (appends add one
  * file per bucket; [[compactFrontier]] merges and dedups them).
  *
  * Scale shape: probes and appends are BATCH-bounded (one crawl
  * round's outlinks), the frontier is CORPUS-sized. [[probeNew]]
  * therefore scans the frontier ONCE with the probe keys broadcast
  * (inner join → the seen subset, itself probe-bounded), then
  * anti-joins the batch against that small seen set — the frontier is
  * never shuffled, never collected, never rebuilt per batch.
  */
object Frontier extends PersistedIndex {
  override protected def manifestName: String = "_graft_frontier_manifest"
  override protected def indexVersion: Int = 1
  override protected def pendingName: String = "_graft_frontier_pending"
  override protected def indexKind: String = "crawl frontier"
  override protected def buildHint: String = "run Frontier.buildFrontier first"

  /** The (k1, k2) BIGINT key pair of a URL column. */
  def urlKeys(url: Column): (Column, Column) = {
    val h = md5(url)
    (conv(substring(h, 1, 15), 16, 10).cast("long"),
      conv(substring(h, 16, 15), 16, 10).cast("long"))
  }

  private def keyed(df: DataFrame, urlCol: String): DataFrame = {
    val (k1, k2) = urlKeys(col(urlCol))
    df.withColumn("graft_k1", k1).withColumn("graft_k2", k2)
  }

  private def keysName(dir: String): String =
    s"graft_frontier_${tableTag(dir)}_keys"

  /** Persist the frontier from the already-seen URL set (the crawl's
    * seed list, or every URL a historical corpus holds).
    */
  def buildFrontier(df: DataFrame, urlCol: String, frontierDir: String,
                    numBuckets: Int = 64): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    graft.sources.BucketedWarehouse.writeBucketedPath(
      keyed(df, urlCol).select(col("graft_k1"), col("graft_k2")).distinct(),
      keysName(frontierDir), s"$frontierDir/keys", Seq("graft_k1"), numBuckets)
    // a rebuild over an old incarnation's dir must not inherit its
    // pending forgets OR its tripped fence — a rebuild IS the
    // documented recovery for a torn frontier, so it supersedes
    // whatever mutation the fence guarded (the fresh keys table just
    // replaced the mutated one whole)
    deleteRecursively(new java.io.File(frontierDir, forgottenDirName))
    // a crash in the forget-swap window leaves a populated staging dir
    // the rebuild must also supersede
    deleteRecursively(new java.io.File(frontierDir, forgottenDirName + "_staging"))
    pendingFile(frontierDir).delete()
    writeManifest(frontierDir, Seq("numBuckets" -> numBuckets.toString))
  }

  /** The pending-forget sidecar: (graft_k1, graft_k2) key pairs whose
    * URLs should probe as UNSEEN again — the trait's tombstone idea
    * with the frontier's two-long key (the single-`id` helpers don't
    * fit a 120-bit key). Bounded by nature (re-crawl/compliance
    * lists), so probes broadcast it.
    */
  private val forgottenDirName = "forgotten"

  private def forgottenKeys(spark: SparkSession,
      frontierDir: String): Option[DataFrame] = {
    val dir = new java.io.File(frontierDir, forgottenDirName)
    if (dir.isDirectory &&
        Option(dir.listFiles()).exists(_.exists(_.getName.endsWith(".parquet"))))
      Some(spark.read.parquet(dir.toString)
        .select(col("graft_k1"), col("graft_k2")).distinct())
    else None
  }

  /** FORGET URLs — the re-crawl path: a forgotten URL probes as NEW
    * again immediately (the seen set anti-joins the forget sidecar),
    * so the next discovery batch re-emits it to the fetch manifest;
    * [[compactFrontier]] applies forgets physically and
    * [[appendToFrontier]] cancels a forget when its URL is re-learned
    * (otherwise a re-discovered URL would re-emit on EVERY later
    * batch — forgotten-yet-present must flip back to seen on append).
    * Returns the forget-key count appended.
    */
  def forgetUrls(df: DataFrame, urlCol: String, frontierDir: String): Long = {
    val spark = df.sparkSession
    openKeys(spark, frontierDir)
    // persisted around write+count: unpersisted, the count would
    // recompute the whole keyed/distinct plan (a second input scan),
    // and a non-deterministic input frame could return a count that
    // doesn't match the sidecar contents just written
    val ks = keyed(df, urlCol)
      .select(col("graft_k1"), col("graft_k2")).distinct().persist()
    try {
      ks.write.mode("append").parquet(s"$frontierDir/$forgottenDirName")
      ks.count()
    } finally ks.unpersist()
  }

  /** Path read of the key table under its EXPLICIT schema: a frontier
    * built from an empty seed frame (legal — a first discovery batch
    * over an empty pages drop) writes a keys dir with zero part-files,
    * and schema inference over it throws, wedging every later probe
    * until a manual rebuild. The schema is two BIGINTs by construction.
    */
  private def readKeys(spark: SparkSession, frontierDir: String): DataFrame =
    spark.read.schema("graft_k1 BIGINT, graft_k2 BIGINT")
      .parquet(s"$frontierDir/keys")

  /** Re-attach the bucketed key table in this session (a fresh session
    * re-registers the same external bucket spec) and return its frame.
    */
  private def openKeys(spark: SparkSession, frontierDir: String): DataFrame = {
    val nb = readManifestProps(frontierDir).getProperty("numBuckets").toInt
    require(indexExists(frontierDir),
      s"$indexKind at $frontierDir has an interrupted mutation — rebuild it")
    graft.sources.BucketedWarehouse.registerExternal(spark,
      keysName(frontierDir), s"$frontierDir/keys",
      "`graft_k1` BIGINT, `graft_k2` BIGINT", Seq("graft_k1"), nb)
    readKeys(spark, frontierDir)
  }

  /** The rows of `df` whose `urlCol` the frontier has NOT seen.
    * Batch-bounded both ways: the frontier scans once against the
    * broadcast probe keys; the resulting seen subset (≤ probe size)
    * broadcasts back against the batch.
    */
  def probeNew(df: DataFrame, urlCol: String, frontierDir: String): DataFrame = {
    val spark = df.sparkSession
    val probed = keyed(df, urlCol)
    val probeKeys = probed.select(col("graft_k1"), col("graft_k2")).distinct()
    val seen0 = openKeys(spark, frontierDir)
      .join(broadcast(probeKeys), Seq("graft_k1", "graft_k2"))
      .select(col("graft_k1"), col("graft_k2")).distinct()
    // pending forgets flip membership off immediately (re-crawl);
    // bounded list → broadcast anti-join
    val seen = forgottenKeys(spark, frontierDir) match {
      case Some(fk) =>
        seen0.join(broadcast(fk), Seq("graft_k1", "graft_k2"), "left_anti")
      case None => seen0
    }
    probed.join(broadcast(seen), Seq("graft_k1", "graft_k2"), "left_anti")
      .drop("graft_k1", "graft_k2")
  }

  /** Mark a batch of URLs seen — fenced, and with
    * `commitLedger = Some((ledgerFile, batchId))` committed under the
    * data → fsync'd ledger line → fence clear ordering, so a replayed
    * micro-batch never re-appends (the [[PersistedIndex]] streaming
    * contract; `clearCompletedAppendFence` clears the stale fence a
    * post-ledger crash leaves). Keys append one file per bucket;
    * duplicate keys across appends are harmless to probes (membership
    * is membership) and [[compactFrontier]] dedups them physically.
    */
  def appendToFrontier(df: DataFrame, urlCol: String, frontierDir: String,
      commitLedger: Option[(java.io.File, Long)] = None): Unit = {
    val spark = df.sparkSession
    // register + fence-check BEFORE mutating (openKeys also refuses a
    // torn frontier, so an append cannot stack on an interrupted one)
    openKeys(spark, frontierDir)
    val nb = readManifestProps(frontierDir).getProperty("numBuckets").toInt
    requireNoFence(frontierDir, "append")
    raiseFence(frontierDir, commitLedger.map(_._2.toString).getOrElse(""))
    val batchKeys = keyed(df, urlCol)
      .select(col("graft_k1"), col("graft_k2")).distinct()
    graft.sources.BucketedWarehouse.appendBucketedPath(
      batchKeys, keysName(frontierDir), s"$frontierDir/keys",
      Seq("graft_k1"), nb)
    // a re-learned URL cancels its pending forget (inside the fence:
    // a crash between the keys append and this rewrite is detectably
    // torn, never a URL that re-emits on every later batch). A parquet
    // dir cannot be overwritten from a plan that reads it, so the
    // survivors STAGE to a sibling dir and atomically swap in —
    // distributed end to end, no driver materialization, so a bulk
    // re-crawl forget (tens of millions of keys) costs a task write,
    // not a driver collect. The crash window between delete and move
    // sits inside the raised fence: a crash there is a detectably torn
    // frontier (rebuild recovers), never a silent forget-loss.
    forgottenKeys(spark, frontierDir).foreach { fk =>
      val staging = new java.io.File(frontierDir, forgottenDirName + "_staging")
      deleteRecursively(staging)
      fk.join(batchKeys, Seq("graft_k1", "graft_k2"), "left_anti")
        .write.mode("overwrite").parquet(staging.toString)
      // all forgets cancelled → REMOVE the sidecar instead of swapping
      // in an empty one: an empty-but-present dir would make every
      // later append pay this whole stage/swap cycle and every probe
      // an extra anti-join, forever
      val empty = spark.read.schema("graft_k1 BIGINT, graft_k2 BIGINT")
        .parquet(staging.toString).isEmpty
      deleteRecursively(new java.io.File(frontierDir, forgottenDirName))
      crashPoint(spark, "frontier_forget_swap")
      if (empty) deleteRecursively(staging)
      else java.nio.file.Files.move(staging.toPath,
        new java.io.File(frontierDir, forgottenDirName).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    crashPoint(spark, "frontier_append_before_ledger")
    commitLedger.foreach { case (ledger, batchId) =>
      appendLineSync(ledger, batchId) }
    crashPoint(spark, "frontier_append_after_ledger")
    clearFence(frontierDir)
  }

  /** Physically merge + dedup the key buckets (one file per bucket
    * after; probe answers identical — spec-pinned).
    */
  def compactFrontier(spark: SparkSession, frontierDir: String): Unit = {
    openKeys(spark, frontierDir)
    val nb = readManifestProps(frontierDir).getProperty("numBuckets").toInt
    requireNoFence(frontierDir, "append/compact")
    raiseFence(frontierDir, "")
    val live = forgottenKeys(spark, frontierDir) match {
      case Some(fk) =>
        // forgets go physical here (the delete-then-merge pattern the
        // other three indexes share)
        readKeys(spark, frontierDir).distinct()
          .join(broadcast(fk), Seq("graft_k1", "graft_k2"), "left_anti")
      case None => readKeys(spark, frontierDir).distinct()
    }
    graft.sources.BucketedWarehouse.rewriteBucketedPath(
      live, spark, keysName(frontierDir), s"$frontierDir/keys",
      Seq("graft_k1"), nb)
    deleteRecursively(new java.io.File(frontierDir, forgottenDirName))
    clearFence(frontierDir)
  }
}
