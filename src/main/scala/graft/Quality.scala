package graft

import graft.llm.Checks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality gate CLI — the promotion check a pipeline runs before
  * publishing a snapshot: the documents-contract constraint suite
  * ([[graft.llm.Checks.run]]) plus the per-column profile
  * ([[graft.llm.Checks.columnProfile]]), written as parquet reports,
  * printed, and folded into the EXIT CODE (non-zero when any check
  * fails) so a scheduler can gate the downstream job on it.
  *
  * The contract checked is the documents-table shape every operator in
  * this library assumes: doc_id present and unique, text/lang/source
  * present, n_chars within sane bounds.
  *
  * Usage: runMain graft.Quality <documents.parquet> <outDir>
  * Env:   SPARK_GRAFT_CPUS (default 4)
  */
object Quality {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Quality <documents.parquet> <outDir>")
    val (inPath, outDir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val failures =
      try {
        val (report, _) = run(spark, inPath, outDir)
        report.show(truncate = false)
        report.filter(col("passed") === 0L).count()
      } finally spark.stop()
    if (failures > 0) {
      System.err.println(s"[quality] $failures check(s) failed")
      sys.exit(1)
    }
  }

  /** The documents-table contract. Package-visible for the spec. */
  private[graft] def documentChecks: Seq[Checks.Check] = Seq(
    Checks.NotNull("doc_id"),
    Checks.Unique(Seq("doc_id")),
    Checks.NotNull("text"),
    Checks.NotNull("lang"),
    Checks.NotNull("source"),
    Checks.InRange("n_chars", 0L, 100000000L))

  /** Runs the gate; returns (constraint report, column profile). */
  def run(spark: SparkSession, inPath: String,
          outDir: String): (DataFrame, DataFrame) = {
    val docs = spark.read.parquet(inPath)
    val report = Checks.run(docs, documentChecks).orderBy("check_name")
    report.write.mode("overwrite").parquet(s"$outDir/checks")
    val profile = Checks
      .columnProfile(docs, Seq("doc_id", "text", "lang", "source", "n_chars"))
      .orderBy("column_name")
    profile.write.mode("overwrite").parquet(s"$outDir/profile")
    (spark.read.parquet(s"$outDir/checks").orderBy("check_name"),
      spark.read.parquet(s"$outDir/profile").orderBy("column_name"))
  }
}
