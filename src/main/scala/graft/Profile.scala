package graft

import graft.llm.{Curation, Profiling, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-command corpus profile — the "describe" a data engineer runs
  * before curating: document-length histogram and per-language
  * quartiles, language and source distributions, quality-gate outcome
  * counts, token frequency spectrum, corpus-wide top n-grams, and the
  * cross-source duplication matrix, each written as a parquet table
  * under `outDir`. Every stage is one of the library's oracle-checked
  * operators, so the report inherits their scale shapes (bounded
  * aggregates, no corpus self-joins) and their engine-independent
  * determinism.
  *
  * Usage: runMain graft.Profile <documentsParquet> <outDir>
  * Env:   SPARK_GRAFT_CPUS (default 4)
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Profile <documentsParquet> <outDir>")
    val (docsPath, outDir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, docsPath, outDir)
    finally spark.stop()
  }

  /** Runs the report; package-visible for the spec. */
  def run(spark: SparkSession, docsPath: String, outDir: String): Unit = {
    val docs = spark.read.parquet(docsPath)
    def write(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")

    write(Profiling.lengthHistogram(docs, "n_chars").orderBy("bucket"),
      "length_histogram")
    write(Profiling.groupQuantiles(docs, "lang", "n_chars", Seq(0.25, 0.5, 0.75))
      .orderBy("lang", "q_idx"), "length_quantiles")
    write(docs.groupBy("lang").agg(count(lit(1)).as("n_docs"),
      sum("n_chars").as("sum_chars")).orderBy("lang"), "lang_counts")
    write(docs.groupBy("source").agg(count(lit(1)).as("n_docs")).orderBy("source"),
      "source_counts")
    write(Curation.qualityGate(docs, "doc_id", "text")
      .groupBy("keep", "reasons").agg(count(lit(1)).as("n_docs"))
      .orderBy("keep", "reasons"), "quality_buckets")
    write(Profiling.frequencySpectrum(docs, "text").orderBy("occurrences"),
      "frequency_spectrum")
    write(Curation.topNgrams(docs, "text", n = 2, k = 50)
      .orderBy(col("n").desc, col("gram")), "top_ngrams")
    write(graft.llm.Dedup.crossGroupSegmentOverlap(docs, "source", "text", 10)
      .orderBy("src_a", "src_b"), "source_overlap")
    // pre-shuffle skew diagnostics for the keys downstream pipelines
    // group/join on, and the writer's shard manifest at a 2k-token
    // budget — both new round-8 operators on the standard report
    write(Profiling.keySkewReport(docs, "source", 16).orderBy("bucket"),
      "key_skew")
    write(Curation.shardPlan(
        docs.select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("toks")),
        "source", "doc_id", "toks", 2000L)
      .orderBy("source", "shard_ix"), "shard_plan")
  }
}
