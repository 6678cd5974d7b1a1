package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for shuffle-amortized pipelines.
  *
  * Dedup / provenance / chunk pipelines at 100 TB re-join the same
  * corpus on the same key many times (tf table ⋈ doc lengths, cluster
  * map ⋈ payloads, chunk ⋈ parent doc). Each sort-merge join pays a
  * full shuffle of both sides — unless the tables are written bucketed
  * on the join key, in which case Spark's scan reports the bucket
  * partitioning and Catalyst plans the join (and any groupBy on the
  * key) with ZERO exchanges: the shuffle is paid once at write time and
  * amortized over every downstream pass.
  *
  * Rules the layout must follow for the exchange to disappear:
  *  - both sides bucketed by the SAME columns into the SAME bucket
  *    count (or a divisor — Spark 3.1+ coalesces compatible counts);
  *  - `sortBy` the key so the sort-merge join also skips per-task
  *    sorts;
  *  - bucket count sized so one bucket of the BIG side fits an
  *    executor's memory (at 100 TB that is thousands of buckets; the
  *    count is the caller's scale knob, never hardcoded).
  */
object BucketedWarehouse {

  /** Write `df` as a bucketed, bucket-sorted parquet table in the
    * session catalog (`spark.sql.warehouse.dir`). Overwrites.
    *
    * The pre-write `repartition` on the bucket key uses the same
    * Murmur3 `pmod` hash as the bucket-id assignment, so every task
    * holds exactly one bucket's rows and each bucket lands in ONE file
    * — without it an N-task write emits up to N×numBuckets files (the
    * small-files explosion at 100 TB), and a one-file bucket is also
    * what lets the scan report its `sortBy` ordering when
    * `spark.sql.legacy.bucketedTableScan.outputOrdering` is enabled,
    * dropping the sort-merge join's per-task sorts too.
    */
  def writeBucketed(df: DataFrame, name: String, keyCols: Seq[String],
                    numBuckets: Int): Unit = {
    require(keyCols.nonEmpty, "at least one bucket column")
    require(numBuckets > 0, "numBuckets must be positive")
    val keys = keyCols.map(org.apache.spark.sql.functions.col)
    df.repartition(numBuckets, keys: _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(name)
  }

  /** [[writeBucketed]], but as an EXTERNAL table at an explicit `path`
    * — the layout a persisted index directory uses so its data files
    * outlive the session. The catalog entry (which is what carries the
    * bucket spec — parquet files alone don't) is session-scoped under
    * the default in-memory catalog; a later session recovers it with
    * [[registerExternal]], which re-attaches the same bucket spec to
    * the same files (bucket ids are encoded in the part-file names, so
    * the mapping survives).
    */
  def writeBucketedPath(df: DataFrame, name: String, path: String,
                        keyCols: Seq[String], numBuckets: Int): Unit = {
    require(keyCols.nonEmpty, "at least one bucket column")
    require(numBuckets > 0, "numBuckets must be positive")
    val spark = df.sparkSession
    // a stale catalog entry for `name` may point at another path; the
    // external data files are replaced by the overwrite-mode write
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val keys = keyCols.map(org.apache.spark.sql.functions.col)
    df.repartition(numBuckets, keys: _*)
      .write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(name)
  }

  /** Append a batch to an EXISTING external bucketed table (same spec
    * required — Spark verifies bucket columns/count against the
    * catalog entry). Each append lands one new file per bucket thanks
    * to the same pre-write repartition; scans union a bucket's files
    * and still prune/co-locate on the key. Compact periodically (read
    * + writeBucketedPath) if append count grows into many-files
    * territory.
    */
  def appendBucketedPath(df: DataFrame, name: String, path: String,
                         keyCols: Seq[String], numBuckets: Int): Unit = {
    require(keyCols.nonEmpty && numBuckets > 0, "bucket spec required")
    require(df.sparkSession.catalog.tableExists(name),
      s"append target $name not registered — openIndex/registerExternal first")
    val keys = keyCols.map(org.apache.spark.sql.functions.col)
    df.repartition(numBuckets, keys: _*)
      .write.mode("append").format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(name)
  }

  /** Rewrite an external bucketed table so each bucket holds ONE file
    * again — the maintenance pass for append-grown indexes (every
    * [[appendBucketedPath]] adds a file per bucket; under continuous
    * ingest the read-side file count grows without bound, the first
    * operational cliff a real deployment hits). The rewrite stages into
    * `<path>_compact` (a full bucketed write of the CURRENT table —
    * same key columns, same bucket count, so reads are row-identical),
    * then swaps directories; the caller must have the table registered
    * (openIndex / registerExternal) and should fence the swap window
    * with its index's pending marker. The staged dir from an earlier
    * interrupted attempt is discarded — it may be partial.
    */
  def compactBucketedPath(spark: SparkSession, name: String, path: String,
                          keyCols: Seq[String], numBuckets: Int): Unit =
    // read the FILES, not the catalog table: reading the bucketed table
    // makes the planner drop writeBucketedPath's repartition as
    // redundant ("Bucketed: false (disabled by query planner)", no
    // Exchange), so write tasks fall on FILE-SPLIT boundaries and a
    // task holding two buckets' rows emits two files — the exact
    // many-files state compaction exists to undo. A plain parquet scan
    // reports unknown partitioning, the repartition survives, and each
    // bucket lands in ONE file.
    rewriteBucketedPath(spark.read.parquet(path), spark, name, path,
      keyCols, numBuckets)

  /** [[compactBucketedPath]]'s stage-write + directory-swap core for an
    * ARBITRARY source frame — what a compaction that also APPLIES a
    * filter (tombstoned deletes) feeds. `df` must not read the catalog
    * table `name` itself (read the parquet files — see above), and
    * must be derivable after the swap only from what it materializes:
    * the staged write is eager, so by swap time the old files are no
    * longer needed.
    */
  def rewriteBucketedPath(df: DataFrame, spark: SparkSession, name: String,
                          path: String, keyCols: Seq[String],
                          numBuckets: Int): Unit = {
    require(spark.catalog.tableExists(name),
      s"compact target $name not registered — open the index first")
    val stagedName = s"${name}_compact"
    val stagedPath = s"${path}_compact"
    deleteRecursively(new java.io.File(stagedPath))
    writeBucketedPath(df, stagedName, stagedPath, keyCols, numBuckets)
    spark.sql(s"DROP TABLE IF EXISTS `$stagedName`")
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    deleteRecursively(new java.io.File(path))
    java.nio.file.Files.move(new java.io.File(stagedPath).toPath,
      new java.io.File(path).toPath)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  /** Re-register an external bucketed table written by
    * [[writeBucketedPath]] in a NEW session: a `CREATE TABLE ... USING
    * parquet CLUSTERED BY ... LOCATION` DDL carrying the original
    * bucket spec. `schemaDdl` is the column list (e.g.
    * `"tok STRING, id BIGINT"`); it must match the written schema —
    * the caller persists it alongside the data (manifest file). No-op
    * when the table already exists in this session's catalog.
    */
  def registerExternal(spark: SparkSession, name: String, path: String,
                       schemaDdl: String, keyCols: Seq[String],
                       numBuckets: Int): Unit = {
    require(keyCols.nonEmpty && numBuckets > 0, "bucket spec required")
    if (!spark.catalog.tableExists(name)) {
      val keys = keyCols.map(k => s"`$k`").mkString(", ")
      spark.sql(
        s"""CREATE TABLE `$name` ($schemaDdl) USING parquet
           |CLUSTERED BY ($keys) SORTED BY ($keys) INTO $numBuckets BUCKETS
           |LOCATION '$path'""".stripMargin)
    }
  }

  /** Equi-join two co-bucketed tables on their bucket key — planned
    * with no exchange when both were written via [[writeBucketed]]
    * with compatible bucket counts.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    keyCols: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keyCols)

  /** Key-grouped aggregation over a bucketed table — the scan's bucket
    * partitioning satisfies the aggregation's distribution, so the
    * groupBy runs exchange-free.
    */
  def colocatedAgg(spark: SparkSession, name: String, keyCols: Seq[String],
                   aggs: Seq[org.apache.spark.sql.Column]): DataFrame =
    spark.table(name)
      .groupBy(keyCols.map(org.apache.spark.sql.functions.col): _*)
      .agg(aggs.head, aggs.tail: _*)
}
