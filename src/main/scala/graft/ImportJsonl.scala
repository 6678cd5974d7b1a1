package graft

import graft.llm.CacheRegistry
import graft.sources.JsonlCorpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JSONL → parquet import CLI: parse a corpus drop (file, directory,
  * or glob; gzip transparent) with corrupt-record quarantine, write
  * the typed documents and the quarantined raw lines as separate
  * parquet tables, and print the split. The front door from a crawl
  * drop into every other `graft` operator.
  *
  * Usage: runMain graft.ImportJsonl <jsonlPath> <outDir>
  * Env:   SPARK_GRAFT_CPUS (default 4)
  */
object ImportJsonl {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ImportJsonl <jsonlPath> <outDir>")
    val (inPath, outDir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val (nClean, nBad) = run(spark, inPath, outDir)
      println(s"[import] clean=$nClean quarantined=$nBad -> $outDir")
    } finally {
      CacheRegistry.releaseAll(spark)
      spark.stop()
    }
  }

  /** Runs the import; package-visible for the spec. Returns
    * (clean rows, quarantined rows).
    */
  def run(spark: SparkSession, inPath: String, outDir: String): (Long, Long) = {
    val parsed = JsonlCorpus.read(spark, inPath)
    val clean = JsonlCorpus.clean(parsed)
    clean.write.mode("overwrite").parquet(s"$outDir/documents")
    val bad = JsonlCorpus.quarantine(parsed)
    bad.write.mode("overwrite").parquet(s"$outDir/quarantine")
    // count from the persisted parse (materialized by the writes), not
    // by re-scanning the freshly written parquet
    (clean.count(), bad.count())
  }
}
