package graft

import graft.llm.{CacheRegistry, Curation}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical shard writer CLI — materializes the corpus as packed
  * training shards ([[graft.llm.Curation.writeShards]]): per source in
  * doc-id order, documents cut into ~`budget`-token shards, one parquet
  * file per shard under `<outDir>/data/`, and an integrity manifest
  * (source, shard_ix, n_docs, shard_tokens, content_sum) under
  * `<outDir>/manifest/` — the artifact a training job consumes and the
  * checksum record a later audit verifies it against.
  *
  * Usage: runMain graft.Shard <documentsParquet> <outDir> [budgetTokens]
  *        (budget defaults to 100000 tokens per shard)
  * Env:   SPARK_GRAFT_CPUS (default 4)
  */
object Shard {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Shard <documentsParquet> <outDir> [budgetTokens]")
    val (docsPath, outDir) = (args(0), args(1))
    val budget = if (args.length > 2) args(2).toLong else 100000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val manifest = run(spark, docsPath, outDir, budget)
      manifest.orderBy("source", "shard_ix").show(50, truncate = false)
    } finally {
      CacheRegistry.releaseAll(spark)
      spark.stop()
    }
  }

  /** Runs the shard write; package-visible for the spec. Returns the
    * manifest as read back from disk.
    */
  def run(spark: SparkSession, docsPath: String, outDir: String,
          budget: Long): DataFrame = {
    val docs = spark.read.parquet(docsPath)
      .select(col("source"), col("doc_id"), col("text"),
        size(split(col("text"), " ")).cast("long").as("toks"))
    Curation.writeShards(docs, "source", "doc_id", "toks", "text",
      budget, outDir)
  }
}
