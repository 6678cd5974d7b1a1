package graft.sources

import graft.llm.CacheRegistry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV metadata-manifest ingest with corrupt-record quarantine — the
  * other interchange format every corpus drop carries (per-document
  * metadata sidecars, crawl manifests, labeling exports). Same
  * contract as [[JsonlCorpus]]: PERMISSIVE parse with an explicit
  * corrupt-record column, so every input line lands in exactly one of
  * [[clean]] (typed rows) or [[quarantine]] (the raw line). A row is
  * quarantined when its token count is wrong OR a field fails its
  * schema cast (univocity flags both) — silently nulling a broken
  * doc_id would orphan the document it describes.
  *
  * Scale notes: per-split parallel scan; gzip is not splittable (one
  * task per .gz — shard drops into many files). The parse persists via
  * [[CacheRegistry]] because clean and quarantine both read it, and
  * because Spark refuses plans projecting ONLY the internal corrupt
  * column from a raw scan (SPARK-21610). Multiline quoted fields are
  * intentionally NOT enabled: multiline CSV forces whole-file parsing
  * (unsplittable); manifests must keep one record per line.
  */
object CsvCorpus {

  val CorruptCol = "graft_corrupt"

  /** Manifest schema (documents metadata, no text body) plus the
    * corrupt-record column.
    */
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField(CorruptCol, StringType)))

  /** Parse a headerless CSV path (file, directory, or glob; .gz
    * transparent) against [[Schema]].
    */
  def read(spark: SparkSession, path: String): DataFrame =
    CacheRegistry.persist(spark.read
      .schema(Schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", "false")
      .csv(path))

  /** Typed manifest rows: every line that parsed cleanly. */
  def clean(parsed: DataFrame): DataFrame =
    parsed.filter(col(CorruptCol).isNull)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

  /** The raw text of every line that did NOT parse. */
  def quarantine(parsed: DataFrame): DataFrame =
    parsed.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
}
