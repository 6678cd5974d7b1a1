package graft.sinks

import graft.artefacts.Artefacts
import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}

/** Metadata sinks with the reference's output layouts, column for column
  * (docs/metadata_parquet.md, metadata/parquet.rs:878-989): every stream
  * carries the five provenance columns (run_id, tool_version,
  * config_hash, evidence_path, evidence_sha256); carved files add
  * handler_id (zip-family collapse, parquet.rs:871-877) and the nullable
  * `magic_bytes` binary column (always null in the reference too,
  * parquet.rs:715); artefacts add source_kind/source_detail/certainty
  * (constant "string_span"/"strings_artefacts"/1.0,
  * parquet.rs:1590-1633); history adds the nullable row_id/table_name
  * pair. The reference's `files_<type>.parquet` category switch becomes
  * `partitionBy("file_type")` — same physical layout, handled by the
  * parallel-safe DataFrameWriter instead of a single writer thread.
  */
final case class RunInfo(
    runId: String,
    toolVersion: String,
    configHash: String,
    evidencePath: String,
    evidenceSha256: String)

object MetadataSinks {

  private def provenance(info: RunInfo): Seq[Column] = Seq(
    col("runId").as("run_id"),
    lit(info.toolVersion).as("tool_version"),
    lit(info.configHash).as("config_hash"),
    lit(info.evidencePath).as("evidence_path"),
    lit(info.evidenceSha256).as("evidence_sha256"))

  /** Carved-file records + provenance, parquet-layout column names. */
  def carvedFilesDf(spark: SparkSession, carved: Dataset[CarvedFile], info: RunInfo): DataFrame =
    carved.toDF()
      .select(provenance(info) ++ Seq[Column](
        // zip-family members share the zip handler (parquet.rs:871-877)
        when(col("fileType").isin("docx", "xlsx", "pptx", "zip"), lit("zip"))
          .otherwise(col("fileType")).as("handler_id"),
        col("fileType").as("file_type"),
        col("path").as("carved_path"),
        col("globalStart").as("global_start"),
        col("globalEnd").as("global_end"),
        col("size"),
        col("md5"),
        col("sha256"),
        col("patternId").as("pattern_id"),
        lit(null).cast("binary").as("magic_bytes"),
        col("validated"),
        col("truncated"),
        when(size(col("errors")) > 0, array_join(col("errors"), "; ")).as("error")): _*)

  /** URL artefacts with scheme/host/port/path/query/fragment split
    * (reference parse_url_parts, metadata/parquet.rs:1635-1689).
    */
  def urlArtefactsDf(spark: SparkSession, artefacts: Dataset[StringArtefact], info: RunInfo): DataFrame = {
    val partsUdf = udf((u: String) => Artefacts.parseUrlParts(u))
    artefacts.toDF().filter(col("artefactKind") === "Url")
      .withColumn("p", partsUdf(col("content")))
      .select(provenance(info) ++ Seq[Column](
        col("globalStart").as("global_start"),
        col("globalEnd").as("global_end"),
        col("content").as("url"),
        col("p.scheme").as("scheme"),
        col("p.host").as("host"),
        col("p.port").cast("int").as("port"),
        col("p.path").as("path"),
        col("p.query").as("query"),
        col("p.fragment").as("fragment"),
        lit("string_span").as("source_kind"),
        lit("strings_artefacts").as("source_detail"),
        lit(1.0).as("certainty")): _*)
  }

  /** Email artefacts with local/domain split at the first '@'. */
  def emailArtefactsDf(spark: SparkSession, artefacts: Dataset[StringArtefact], info: RunInfo): DataFrame =
    artefacts.toDF().filter(col("artefactKind") === "Email")
      .select(provenance(info) ++ Seq[Column](
        col("globalStart").as("global_start"),
        col("globalEnd").as("global_end"),
        col("content").as("email"),
        substring_index(col("content"), "@", 1).as("local_part"),
        expr("substring(content, instr(content, '@') + 1)").as("domain"),
        lit("string_span").as("source_kind"),
        lit("strings_artefacts").as("source_detail"),
        lit(1.0).as("certainty")): _*)

  /** Phone artefacts. phone_e164/country stay null like the reference
    * (parquet.rs:1626-1627: no normalizer behind the columns yet).
    */
  def phoneArtefactsDf(spark: SparkSession, artefacts: Dataset[StringArtefact], info: RunInfo): DataFrame =
    artefacts.toDF().filter(col("artefactKind") === "Phone")
      .select(provenance(info) ++ Seq[Column](
        col("globalStart").as("global_start"),
        col("globalEnd").as("global_end"),
        col("content").as("phone_raw"),
        lit(null).cast("string").as("phone_e164"),
        lit(null).cast("string").as("country"),
        lit("string_span").as("source_kind"),
        lit("strings_artefacts").as("source_detail"),
        lit(1.0).as("certainty")): _*)

  /** Entropy regions + provenance. */
  def entropyRegionsDf(spark: SparkSession, entropy: Dataset[EntropyRegion], info: RunInfo): DataFrame =
    entropy.toDF()
      .select(provenance(info) ++ Seq[Column](
        col("globalStart").as("global_start"),
        col("globalEnd").as("global_end"),
        col("entropy"),
        col("windowSize").as("window_size")): _*)

  /** Browser history rows. `visit_source` carries the transition label
    * (the reference parser's visit_source analog); row_id/table_name are
    * emitted null exactly like the reference (parquet.rs:757-758).
    */
  def browserHistoryDf(spark: SparkSession, history: Dataset[BrowserHistoryRecord], info: RunInfo): DataFrame =
    history.toDF()
      .select(provenance(info) ++ Seq[Column](
        col("sourceFile").as("source_file"),
        col("browser"),
        col("profile"),
        col("url"),
        col("title"),
        col("visitTime").as("visit_time_utc"),
        col("transition").as("visit_source"),
        lit(null).cast("long").as("row_id"),
        lit(null).cast("string").as("table_name")): _*)

  def browserCookiesDf(spark: SparkSession, cookies: Dataset[BrowserCookieRecord], info: RunInfo): DataFrame =
    cookies.toDF()
      .select(provenance(info) ++ Seq[Column](
        col("sourceFile").as("source_file"),
        col("browser"),
        col("profile"),
        col("host"),
        col("name"),
        col("value"),
        col("path"),
        col("expiresUtc").as("expires_utc"),
        col("lastAccessUtc").as("last_access_utc"),
        col("creationUtc").as("creation_utc"),
        col("secure").as("is_secure"),
        col("httpOnly").as("is_http_only")): _*)

  def browserDownloadsDf(spark: SparkSession, downloads: Dataset[BrowserDownloadRecord], info: RunInfo): DataFrame =
    downloads.toDF()
      .select(provenance(info) ++ Seq[Column](
        col("sourceFile").as("source_file"),
        col("browser"),
        col("profile"),
        col("url"),
        col("targetPath").as("target_path"),
        col("startTime").as("start_time_utc"),
        col("endTime").as("end_time_utc"),
        col("totalBytes").as("total_bytes"),
        col("state")): _*)

  /** One-row run summary (docs/metadata_parquet.md "Run summary"). */
  def runSummaryDf(spark: SparkSession, summary: Dataset[RunSummary], info: RunInfo): DataFrame =
    summary.toDF()
      .select(provenance(info) ++ Seq[Column](
        col("bytesScanned").as("bytes_scanned"),
        col("chunksProcessed").as("chunks_processed"),
        col("hitsFound").as("hits_found"),
        col("filesCarved").as("files_carved"),
        col("stringSpans").as("string_spans"),
        col("artefactsExtracted").as("artefacts_extracted")): _*)

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
    val regions = entropyRegionsDf(spark, entropy, info)

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
