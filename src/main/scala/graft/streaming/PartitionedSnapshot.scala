package graft.streaming

import graft.operators.CdcApply
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The 100-TB form of [[SnapshotMaintainer]]: the snapshot lives as P
  * hash partitions (`part=<p>/v<k>/`), each versioned independently,
  * and a CDC batch rewrites ONLY the partitions its keys touch — a
  * batch updating 0.1% of keys rewrites ~0.1% of a well-sized layout
  * instead of the whole table (the copy-on-write partition story of
  * Delta/Hudi, as plain parquet + a ledger).
  *
  * Ledger lines are `batchId partition version`, appended AFTER each
  * partition's new version lands — so a crash mid-batch resumes on
  * replay with only the UN-committed partitions redone (per-partition
  * idempotence), and readers always see each partition's last
  * committed version (never a torn one). Partition routing is
  * `pmod(hash(keys), P)` — Spark's own hash, purely an internal layout
  * choice. The partition count is fixed at [[init]] and recorded in
  * the ledger header; changing it is a full rewrite (as everywhere).
  */
object PartitionedSnapshot {

  private val LedgerName = "_graft_part_ledger"

  private def ledgerFile(dir: String) = new java.io.File(dir, LedgerName)

  private def partExpr(keyCols: Seq[String], parts: Int) =
    pmod(hash(keyCols.map(col): _*), lit(parts))

  /** Initialize: split the base into P partition dirs at version 0 —
    * ONE pass over the base (a partitionBy write into staging, then a
    * directory move per partition), not a filter-scan per partition;
    * row-less partitions get an explicit empty v0 so every partition
    * path always exists.
    */
  def init(base: DataFrame, dir: String, keyCols: Seq[String],
           parts: Int): Unit = {
    require(parts >= 1 && parts <= 65536, s"parts must be in [1, 65536]")
    val spark = base.sparkSession
    val staging = s"$dir/_graft_init_staging"
    base.withColumn("graft_part", partExpr(keyCols, parts))
      .write.mode("overwrite").partitionBy("graft_part").parquet(staging)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], base.schema)
    (0 until parts).foreach { p =>
      val src = new java.io.File(s"$staging/graft_part=$p")
      val dst = new java.io.File(s"$dir/part=$p/v0")
      if (src.isDirectory) {
        dst.getParentFile.mkdirs()
        java.nio.file.Files.move(src.toPath, dst.toPath)
      } else empty.write.mode("overwrite").parquet(dst.toString)
    }
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(staging))
    val out = new java.io.FileWriter(ledgerFile(dir), false)
    try out.write(s"# parts $parts\n") finally out.close()
  }

  private def ledgerLines(dir: String): Seq[String] = {
    val f = ledgerFile(dir)
    if (!f.exists()) return Seq.empty
    val src = scala.io.Source.fromFile(f)
    try src.getLines().filter(_.nonEmpty).toSeq finally src.close()
  }

  /** The fixed partition count recorded at init. */
  def partCount(dir: String): Int =
    ledgerLines(dir).headOption match {
      case Some(h) if h.startsWith("# parts ") => h.drop(8).trim.toInt
      case other => sys.error(s"no ledger header in $dir: $other")
    }

  /** Latest committed version per partition (0 = initial). */
  def currentVersions(dir: String): Map[Int, Long] = {
    val committed = ledgerLines(dir).filterNot(_.startsWith("#"))
      .map(_.split(" ")).map(a => (a(1).toInt, a(2).toLong))
      .groupBy(_._1).map { case (p, vs) => p -> vs.map(_._2).max }
    (0 until partCount(dir)).map(p => p -> committed.getOrElse(p, 0L)).toMap
  }

  /** The current snapshot: union of every partition's latest version.
    * Each leaf dir is read separately (unionByName) — a multi-path
    * read would base-path-infer `part=` as a phantom partition column.
    */
  def snapshot(spark: SparkSession, dir: String): DataFrame =
    currentVersions(dir).toSeq.sortBy(_._1)
      .map { case (p, v) => spark.read.parquet(s"$dir/part=$p/v$v") }
      .reduce(_ unionByName _)

  /** Apply one changelog batch; rewrites only touched, un-committed
    * partitions. Returns the number of partitions rewritten (0 on a
    * fully-replayed batch).
    */
  def processBatch(batch: DataFrame, batchId: Long, dir: String,
                   keyCols: Seq[String], seqCol: String,
                   opCol: String): Int = {
    val spark = batch.sparkSession
    val parts = partCount(dir)
    val withPart = batch.withColumn("graft_part", partExpr(keyCols, parts))
    // touched partitions: a parts-bounded collect, never key-bounded
    val touched = withPart.select(col("graft_part")).distinct()
      .collect().map(_.getInt(0)).sorted
    val done = ledgerLines(dir).filterNot(_.startsWith("#"))
      .map(_.split(" ")).filter(_(0).toLong == batchId)
      .map(_(1).toInt).toSet
    val versions = currentVersions(dir)
    var rewritten = 0
    touched.filterNot(done).foreach { p =>
      val cur = spark.read.parquet(s"$dir/part=$p/v${versions(p)}")
      val slice = withPart.filter(col("graft_part") === p)
        .drop("graft_part")
      CdcApply.applyChangelog(cur, slice, keyCols, seqCol, opCol)
        .write.mode("overwrite").parquet(s"$dir/part=$p/v${versions(p) + 1}")
      // partition committed only once its ledger line lands
      val out = new java.io.FileWriter(ledgerFile(dir), true)
      try out.write(s"$batchId $p ${versions(p) + 1}\n") finally out.close()
      rewritten += 1
    }
    rewritten
  }

  /** Attach to a streaming changelog frame (payload + seqCol + opCol). */
  def start(changes: DataFrame, dir: String, keyCols: Seq[String],
            seqCol: String, opCol: String,
            checkpoint: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, dir, keyCols, seqCol, opCol)
        ()
      }
      .start()
}
