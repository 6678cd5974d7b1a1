package graft

import org.apache.spark.sql.SparkSession

/** Ingest main: convert an evidence image — raw `.dd` or EWF `.E01`
  * (auto-detected by signature via [[graft.evidence.EvidenceOpen]]; the
  * pure-JVM [[graft.evidence.EwfReader]] decompresses chunks in-task) —
  * into the parquet evidence-chunk table `(chunk_id, start,
  * valid_length, data)` via the DSv2 evidence source. At cluster scale
  * this runs once and downstream jobs read the columnar table with
  * pruning/pushdown.
  *
  * Usage: runMain graft.Ingest <image> <outParquetDir> [chunkSize] [overlap]
  */
object Ingest {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Ingest <rawImage> <outDir> [chunkSize] [overlap]")
    val Array(image, outDir) = args.take(2)
    val chunkSize = if (args.length > 2) args(2).toLong else 512L * 1024 * 1024
    val overlap = if (args.length > 3) args(3).toLong else 65536L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.format("graft.sources.EvidenceSource")
      .option("path", image)
      .option("chunkSize", chunkSize.toString)
      .option("overlap", overlap.toString)
      .load()
      .write.mode("overwrite").parquet(outDir)
    spark.stop()
  }
}
