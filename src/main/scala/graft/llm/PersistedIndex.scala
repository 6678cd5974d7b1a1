package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The lifecycle contract every persisted index directory shares —
  * the BM25 inverted index ([[Retrieval]]), the IVF-PQ vector index
  * ([[VectorIndex]]) and the LSH dedup index ([[Dedup]]) each persist
  * bucketed tables plus:
  *
  *  - a **manifest** pinning (layout version, bucket count, geometry),
  *    so a fresh session re-attaches the same bucket spec and the same
  *    encoding parameters — reading with different geometry than the
  *    index was written with would be silently wrong, so a version
  *    mismatch reads as ABSENT (rebuild), never as servable;
  *  - a **pending fence** raised across every multi-step mutation
  *    (append, compact): a crash mid-mutation leaves a DETECTABLY
  *    invalid index ([[indexExists]] false → rebuild) instead of one
  *    that serves silently wrong answers. A ledger-committed append
  *    writes its batch id INTO the fence file, so a replay that finds
  *    the id in its ledger can prove the fence guards a COMPLETED
  *    append and clear it ([[clearCompletedAppendFence]]);
  *  - a **sub-ledger commit ordering** for streaming appends: data
  *    steps → ledger line (fsync'd, [[appendLineSync]]) → fence clear.
  *    No crash point double-applies: before the line the fence trips
  *    (detectable stop), after it the replay skips the append;
  *  - a **tombstone table** of deleted doc ids (the Lucene
  *    delete-then-merge pattern): serving paths anti-join candidates
  *    against it (bounded between compactions → broadcast), and the
  *    next compaction makes the deletes physical;
  *  - a **zero-survivor refusal**: a compaction that would tombstone
  *    every doc fails BEFORE the fence goes up (an empty index is not
  *    a servable state), so the index stays valid and serving.
  *
  * Extracted in round 12 so the streaming ANN append lands as an
  * instantiation of this contract rather than a third copy of the
  * fence/ledger/tombstone idioms.
  */
private[graft] trait PersistedIndex {

  /** Manifest file name inside the index dir. */
  protected def manifestName: String

  /** Current layout version — a mismatch reads as absent (rebuild). */
  protected def indexVersion: Int

  /** Pending-fence file name raised across multi-step mutations. */
  protected def pendingName: String

  /** Human label for error messages ("index", "vector index", …). */
  protected def indexKind: String

  /** Build-entry hint for the missing-manifest error. */
  protected def buildHint: String

  /** Tombstone subdirectory name. */
  protected def tombstoneDirName: String = "tombstones"

  // ---- manifest ----------------------------------------------------

  final protected def manifestFile(indexDir: String): java.io.File =
    new java.io.File(indexDir, manifestName)

  final protected def loadProps(mf: java.io.File): java.util.Properties = {
    val props = new java.util.Properties()
    val in = new java.io.FileInputStream(mf)
    try props.load(in) finally in.close()
    props
  }

  /** Write the manifest with a leading version line plus `pairs`. */
  final protected def writeManifest(indexDir: String,
                                    pairs: Seq[(String, String)]): Unit = {
    val body = (("version" -> indexVersion.toString) +: pairs)
      .map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n")
    java.nio.file.Files.write(manifestFile(indexDir).toPath,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** The manifest properties, requiring presence + current version. */
  final protected def readManifestProps(indexDir: String): java.util.Properties = {
    val mf = manifestFile(indexDir)
    require(mf.isFile, s"no $indexKind manifest at $indexDir — $buildHint")
    val props = loadProps(mf)
    require(props.getProperty("version") == indexVersion.toString,
      s"index version ${props.getProperty("version")} != $indexVersion — rebuild")
    props
  }

  /** True when `indexDir` holds a complete CURRENT-version index (a
    * tripped mutation fence or a stale layout version reads as absent,
    * so cached fixtures and ingest loops rebuild instead of erroring
    * or serving from a torn index).
    */
  def indexExists(indexDir: String): Boolean = {
    val mf = manifestFile(indexDir)
    mf.isFile && !pendingFile(indexDir).exists() &&
      loadProps(mf).getProperty("version") == indexVersion.toString
  }

  // ---- pending fence -----------------------------------------------

  final protected def pendingFile(indexDir: String): java.io.File =
    new java.io.File(indexDir, pendingName)

  /** Refuse to start a mutation over a tripped fence. `what` names the
    * mutation family for the error ("append", "compact",
    * "append/compact").
    */
  final protected def requireNoFence(indexDir: String, what: String): Unit =
    require(!pendingFile(indexDir).exists(),
      s"$indexKind at $indexDir has an interrupted $what — rebuild it")

  /** Raise the fence. `content` is the committing batch id when the
    * mutation is ledger-committed (so [[clearCompletedAppendFence]]
    * can later prove whose completed mutation it guards), empty
    * otherwise.
    */
  final protected def raiseFence(indexDir: String, content: String): Unit =
    java.nio.file.Files.write(pendingFile(indexDir).toPath,
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  final protected def clearFence(indexDir: String): Unit =
    java.nio.file.Files.delete(pendingFile(indexDir).toPath)

  /** Clear a pending fence that a crash AFTER the ledger commit left
    * behind: the fence file carries the batch id of the append that
    * wrote it, so a fence whose content equals `batchId` — which the
    * caller has already found in its ledger — fences a COMPLETED
    * append and is safe to remove. Any other fence (empty, or another
    * batch's id) marks a genuinely torn index and is left in place.
    * Returns true when a fence was cleared; a fence that provably
    * SHOULD clear but cannot be deleted throws (silently returning
    * false would leave a healthy index behind a permanent fence, every
    * later batch dying with the misleading torn-index error).
    */
  def clearCompletedAppendFence(indexDir: String, batchId: Long): Boolean = {
    val pending = pendingFile(indexDir)
    pending.isFile && {
      val content = new String(
        java.nio.file.Files.readAllBytes(pending.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim
      content == batchId.toString && {
        // test-only filesystem-failure injection (the crashPoint
        // family): the suite runs as a user who can delete anything,
        // so an undeletable fence is simulated by naming its absolute
        // path in this system property. Production never sets it.
        val cleared =
          !sys.props.get("graft.test.undeletableFence")
            .contains(pending.getAbsolutePath) &&
          pending.delete()
        if (!cleared && pending.exists())
          throw new IllegalStateException(
            s"cannot delete the stale append fence $pending of COMPLETED " +
              s"batch $batchId; the index data is intact, so fix filesystem " +
              "permissions and remove the fence file manually")
        cleared || !pending.exists()
      }
    }
  }

  // ---- ledger ------------------------------------------------------

  /** Append one ledger line and fsync — the durability the
    * data-steps → ledger → fence-clear commit ordering depends on.
    * Format: one decimal batch id per line (the
    * [[graft.streaming.IndexIngest]] ledger convention).
    */
  final protected def appendLineSync(ledger: java.io.File, id: Long): Unit = {
    val out = new java.io.FileOutputStream(ledger, true)
    try {
      out.write(s"$id\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.flush()
      out.getFD.sync()
    } finally out.close()
  }

  /** Test-only crash injection: throws when the session conf
    * `graft.test.crashPoint` names this point. Production sessions
    * never set it; the streaming crash-window specs do.
    */
  final protected def crashPoint(spark: SparkSession, point: String): Unit =
    if (spark.conf.get("graft.test.crashPoint", "") == point)
      throw new RuntimeException(s"injected crash at $point")

  // ---- tombstones --------------------------------------------------

  /** Append delete ids to the tombstone table (the takedown path —
    * serving stops immediately via the read-side anti-join; the next
    * compaction makes the deletes physical). Idempotent at read time.
    */
  final protected def appendTombstoneIds(spark: SparkSession,
                                         indexDir: String,
                                         ids: Seq[Long]): Unit = {
    require(ids.nonEmpty, "at least one id to delete")
    import spark.implicits._
    ids.toDF("id").write.mode("append")
      .parquet(s"$indexDir/$tombstoneDirName")
  }

  /** The pending tombstone id table, when any deletes await merge. */
  final protected def tombstoneIds(spark: SparkSession,
                                   indexDir: String): Option[DataFrame] = {
    val dir = new java.io.File(indexDir, tombstoneDirName)
    if (dir.isDirectory &&
        Option(dir.listFiles()).exists(_.exists(_.getName.endsWith(".parquet"))))
      Some(spark.read.parquet(dir.toString).select(col("id")).distinct())
    else None
  }

  /** Anti-join `df` against the pending tombstones, if any — bounded
    * compliance lists between compactions, so always a broadcast.
    */
  final protected def withoutTombstoned(spark: SparkSession, indexDir: String,
                                        df: DataFrame): DataFrame =
    tombstoneIds(spark, indexDir) match {
      case Some(ts) => df.join(broadcast(ts), Seq("id"), "left_anti")
      case None => df
    }

  final protected def clearTombstones(indexDir: String): Unit =
    deleteRecursively(new java.io.File(indexDir, tombstoneDirName))

  /** Zero-survivor refusal: a compaction whose tombstones cover EVERY
    * doc would leave an unservable empty index (or divide-by-zero
    * corpus stats) — fail BEFORE the fence goes up, so nothing is
    * mutated and the index stays valid and serving. `docIds` is any
    * frame carrying the live `id` column (one row per doc reference is
    * enough — only existence is probed).
    */
  final protected def requireSurvivors(spark: SparkSession, indexDir: String,
                                       docIds: => DataFrame,
                                       refusal: String): Unit =
    tombstoneIds(spark, indexDir).foreach { ts =>
      val anySurvivor = docIds
        .join(broadcast(ts), Seq("id"), "left_anti").limit(1).count()
      require(anySurvivor > 0, refusal)
    }

  // ---- misc --------------------------------------------------------

  final protected def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  /** Deterministic per-path catalog-name tag (two indexes coexist; a
    * fresh session re-attaches by path).
    */
  final protected def tableTag(indexDir: String): String = {
    val canon = new java.io.File(indexDir).getAbsolutePath
    java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(6).map(b => f"$b%02x").mkString
  }
}
