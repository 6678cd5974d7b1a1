package graft.sources

import graft.llm.CacheRegistry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus ingest with corrupt-record quarantine — the standard
  * web-scale corpus interchange format (one JSON document per line,
  * usually compressed). A 100-TB crawl drop always carries some
  * malformed lines (truncated uploads, encoding damage, mid-write
  * snapshots); dropping them silently biases the corpus and aborting
  * on them loses the batch. This reader parses PERMISSIVE with an
  * explicit corrupt-record column, so every input line lands in
  * exactly one of two frames: [[clean]] (typed documents) or
  * [[quarantine]] (the raw offending line, for triage/reprocessing).
  *
  * Scale notes: the scan parallelizes per file split; gzip inputs are
  * NOT splittable (one task per .gz file — shard the drop into many
  * files, or use zstd/bzip2/uncompressed for TB-scale files). The
  * parsed frame is persisted because clean and quarantine both read
  * it — and because Spark refuses plans that project ONLY the
  * internal corrupt column from a raw file scan (SPARK-21610); the
  * cache materializes the full parse first.
  */
object JsonlCorpus {

  val CorruptCol = "graft_corrupt"

  /** The documents-table schema plus the corrupt-record column. */
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField(CorruptCol, StringType)))

  /** Parse a JSONL path (file, directory, or glob; .gz transparent). */
  def read(spark: SparkSession, path: String): DataFrame =
    CacheRegistry.persist(spark.read
      .schema(Schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path))

  /** Typed documents: every line that parsed. */
  def clean(parsed: DataFrame): DataFrame =
    parsed.filter(col(CorruptCol).isNull)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))

  /** The raw text of every line that did NOT parse. */
  def quarantine(parsed: DataFrame): DataFrame =
    parsed.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))

  /** STREAMING ingest of a JSONL drop directory: every arriving line
    * tagged `clean` or `quarantined` in one output stream (route with
    * a filter). A single tagged stream instead of two helpers because
    * a streaming scan cannot be cached, and Spark refuses raw-file
    * queries whose referenced columns are ONLY the corrupt column
    * (SPARK-21610) — the full-width tag projection sidesteps both.
    * File-source semantics: new files under `path` are picked up per
    * micro-batch, which is exactly how crawl drops land.
    */
  def readStreamTagged(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(Schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .withColumn("ingest_status",
        when(col(CorruptCol).isNull, lit("clean")).otherwise(lit("quarantined")))
}
