package graft

import graft.llm.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-diff CLI — the crawl-refresh audit between two documents
  * drops ([[graft.llm.Dedup.snapshotDiff]]): writes the per-document
  * added/removed/changed/unchanged classification and a status-count
  * summary, and prints the summary. The classification is the input to
  * incremental reprocessing (only added+changed re-enter the pipeline)
  * and deletion-compliance checks.
  *
  * Usage: runMain graft.Diff <snapshotA.parquet> <snapshotB.parquet> <outDir>
  * Env:   SPARK_GRAFT_CPUS (default 4)
  */
object Diff {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Diff <snapshotA> <snapshotB> <outDir>")
    val (aPath, bPath, outDir) = (args(0), args(1), args(2))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val summary = run(spark, aPath, bPath, outDir)
      summary.show(truncate = false)
    } finally spark.stop()
  }

  /** Runs the diff; package-visible for the spec. Returns the
    * status-count summary frame.
    */
  def run(spark: SparkSession, aPath: String, bPath: String,
          outDir: String): DataFrame = {
    val a = spark.read.parquet(aPath)
    val b = spark.read.parquet(bPath)
    val diff = Dedup.snapshotDiff(a, b, "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
    diff.write.mode("overwrite").parquet(s"$outDir/diff")
    // summarize from the WRITTEN diff — the shuffle-heavy full-outer
    // join over both snapshots runs once, not once per consumer
    val summary = spark.read.parquet(s"$outDir/diff")
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("status")
    summary.write.mode("overwrite").parquet(s"$outDir/summary")
    summary
  }
}
