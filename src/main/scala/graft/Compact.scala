package graft

import org.apache.spark.sql.SparkSession

/** Persisted-index compaction CLI: rewrite each bucket of an
  * append-grown index into one file per bucket, restoring indexed-read
  * latency. Every append ([[graft.llm.Retrieval.appendToIndex]],
  * [[graft.llm.Dedup.appendToDedupIndex]],
  * [[graft.llm.VectorIndex.appendToIndex]], and the streaming
  * [[graft.streaming.IndexIngest]] loop) adds one file per bucket;
  * under continuous ingest the scan-side file count grows without
  * bound. This is the OPTIMIZE pass — query results are row-identical
  * before and after (pinned by OpsSpec); only the file layout changes.
  * Prints per-table data-file counts before/after so the win is
  * visible in the run log.
  *
  * Usage: runMain graft.Compact <bm25|dedup|ann> <indexDir>
  * Env:   SPARK_GRAFT_CPUS (default 4)
  */
object Compact {

  /** Parquet data files under an index subdirectory (buckets only —
    * _SUCCESS markers and manifests excluded).
    */
  def dataFileCount(dir: String): Int = {
    val f = new java.io.File(dir)
    Option(f.listFiles()).map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: Compact <bm25|dedup|ann> <indexDir>")
    val Array(kind, indexDir) = args
    val tables: Seq[String] = kind match {
      case "bm25"  => Seq("postings", "terms")
      case "dedup" => Seq("exact", "bands")
      case "ann"   => Seq("lists")
      case other   => sys.error(s"unknown index kind '$other' (bm25|dedup|ann)")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val before = tables.map(t => t -> dataFileCount(s"$indexDir/$t"))
      kind match {
        case "bm25"  => graft.llm.Retrieval.compactIndex(spark, indexDir)
        case "dedup" => graft.llm.Dedup.compactDedupIndex(spark, indexDir)
        case "ann"   => graft.llm.VectorIndex.compactIndex(spark, indexDir)
      }
      val after = tables.map(t => t -> dataFileCount(s"$indexDir/$t"))
      before.zip(after).foreach { case ((t, b), (_, a)) =>
        println(s"$t: $b data files -> $a")
      }
    } finally spark.stop()
  }
}
