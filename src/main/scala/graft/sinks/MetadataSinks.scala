package graft.sinks

import graft.artefacts.Artefacts
import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Metadata sinks with the reference's output layouts
  * (docs/metadata_jsonl.md, metadata_csv.md, metadata_parquet.md):
  * carved-file records with run provenance columns, per-type parquet
  * categories (the reference's `files_<type>.parquet` switch becomes
  * `partitionBy("file_type")` — same physical layout, handled by the
  * parallel-safe DataFrameWriter instead of a single writer thread),
  * URL/email artefact part-splitting, and `errors` joined with "; " for
  * the flat formats.
  */
final case class RunInfo(
    runId: String,
    toolVersion: String,
    configHash: String,
    evidencePath: String,
    evidenceSha256: String)

object MetadataSinks {

  /** Carved-file records + provenance, parquet-layout column names. */
  def carvedFilesDf(spark: SparkSession, carved: Dataset[CarvedFile], info: RunInfo): DataFrame =
    carved.toDF()
      .select(
        col("runId").as("run_id"),
        lit(info.toolVersion).as("tool_version"),
        lit(info.configHash).as("config_hash"),
        lit(info.evidencePath).as("evidence_path"),
        lit(info.evidenceSha256).as("evidence_sha256"),
        col("fileType").as("file_type"),
        col("path").as("carved_path"),
        col("extension"),
        col("globalStart").as("global_start"),
        col("globalEnd").as("global_end"),
        col("size"),
        col("md5"),
        col("sha256"),
        col("patternId").as("pattern_id"),
        col("validated"),
        col("truncated"),
        when(size(col("errors")) > 0, array_join(col("errors"), "; ")).as("error"))

  /** URL artefacts with scheme/host/port/path/query/fragment split
    * (reference parse_url_parts, metadata/parquet.rs:1635-1689).
    */
  def urlArtefactsDf(spark: SparkSession, artefacts: Dataset[StringArtefact], info: RunInfo): DataFrame = {
    val partsUdf = udf((u: String) => Artefacts.parseUrlParts(u))
    artefacts.toDF().filter(col("artefactKind") === "Url")
      .withColumn("p", partsUdf(col("content")))
      .select(
        col("runId").as("run_id"),
        lit(info.toolVersion).as("tool_version"),
        lit(info.configHash).as("config_hash"),
        col("globalStart").as("global_start"),
        col("globalEnd").as("global_end"),
        col("content").as("url"),
        col("p.scheme").as("scheme"),
        col("p.host").as("host"),
        col("p.port").as("port"),
        col("p.path").as("path"),
        col("p.query").as("query"),
        col("p.fragment").as("fragment"),
        col("encoding"))
  }

  /** Email artefacts with local/domain split at the first '@'. */
  def emailArtefactsDf(spark: SparkSession, artefacts: Dataset[StringArtefact], info: RunInfo): DataFrame =
    artefacts.toDF().filter(col("artefactKind") === "Email")
      .select(
        col("runId").as("run_id"),
        col("globalStart").as("global_start"),
        col("globalEnd").as("global_end"),
        col("content").as("email"),
        substring_index(col("content"), "@", 1).as("local_part"),
        expr("substring(content, instr(content, '@') + 1)").as("domain"),
        col("encoding"))

  def phoneArtefactsDf(spark: SparkSession, artefacts: Dataset[StringArtefact], info: RunInfo): DataFrame =
    artefacts.toDF().filter(col("artefactKind") === "Phone")
      .select(
        col("runId").as("run_id"),
        col("globalStart").as("global_start"),
        col("globalEnd").as("global_end"),
        col("content").as("phone_raw"),
        col("encoding"))

  /** Write all streams to `outDir` in the chosen backend. Parquet gets
    * the per-type category layout via partitionBy; jsonl/csv are single
    * logical tables like the reference's line-oriented sinks.
    */
  def writeAll(
      spark: SparkSession,
      outDir: String,
      backend: String, // parquet | jsonl | csv
      carved: Dataset[CarvedFile],
      artefacts: Dataset[StringArtefact],
      entropy: Dataset[EntropyRegion],
      info: RunInfo): Unit = {
    val files = carvedFilesDf(spark, carved, info)
    val urls = urlArtefactsDf(spark, artefacts, info)
    val emails = emailArtefactsDf(spark, artefacts, info)
    val phones = phoneArtefactsDf(spark, artefacts, info)
    val regions = entropy.toDF()
      .select(col("runId").as("run_id"), col("globalStart").as("global_start"),
        col("globalEnd").as("global_end"), col("entropy"), col("windowSize").as("window_size"))

    backend match {
      case "parquet" =>
        files.write.mode("overwrite").partitionBy("file_type").parquet(s"$outDir/files")
        urls.write.mode("overwrite").parquet(s"$outDir/artefacts_urls")
        emails.write.mode("overwrite").parquet(s"$outDir/artefacts_emails")
        phones.write.mode("overwrite").parquet(s"$outDir/artefacts_phones")
        regions.write.mode("overwrite").parquet(s"$outDir/entropy_regions")
      case "jsonl" =>
        files.write.mode("overwrite").json(s"$outDir/carved_files")
        urls.write.mode("overwrite").json(s"$outDir/artefacts_urls")
        emails.write.mode("overwrite").json(s"$outDir/artefacts_emails")
        phones.write.mode("overwrite").json(s"$outDir/artefacts_phones")
        regions.write.mode("overwrite").json(s"$outDir/entropy_regions")
      case "csv" =>
        def csv(df: DataFrame, path: String): Unit =
          df.write.mode("overwrite").option("header", "true").csv(path)
        csv(files, s"$outDir/carved_files")
        csv(urls, s"$outDir/artefacts_urls")
        csv(emails, s"$outDir/artefacts_emails")
        csv(phones, s"$outDir/artefacts_phones")
        csv(regions, s"$outDir/entropy_regions")
      case other => throw new IllegalArgumentException(s"unknown backend $other")
    }
  }
}
