package graft

import graft.sources.ZOrderLayout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Parquet re-layout CLI: rewrite a table z-ordered on two integer
  * columns so file-level min/max footer stats bound every file in BOTH
  * dimensions (the compaction step Delta/Iceberg call OPTIMIZE ZORDER,
  * as a plain parquet rewrite). Prints the before/after per-file
  * rectangle report so the locality win is visible in the run log.
  *
  * Usage: runMain graft.Relayout <inParquet> <outDir> <xCol> <yCol> [bits] [numFiles]
  * Env:   SPARK_GRAFT_CPUS (default 4)
  */
object Relayout {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: Relayout <inParquet> <outDir> <xCol> <yCol> [bits] [numFiles]")
    val Array(in, out, xCol, yCol) = args.take(4)
    val bits = if (args.length > 4) args(4).toInt else 16
    val numFiles = if (args.length > 5) args(5).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = spark.read.parquet(in)
      ZOrderLayout.writeZOrdered(df, out, xCol, yCol, bits, numFiles)
      def rectangles(path: String) = spark.read.parquet(path)
        .groupBy(input_file_name().as("file"))
        .agg(count(lit(1)).as("n_rows"),
          (max(col(xCol)) - min(col(xCol))).as("x_range"),
          (max(col(yCol)) - min(col(yCol))).as("y_range"))
        .agg(count(lit(1)).as("n_files"),
          avg(col("x_range")).as("avg_x_range"),
          avg(col("y_range")).as("avg_y_range"))
      println("input layout:")
      rectangles(in).show(truncate = false)
      println("z-ordered layout:")
      rectangles(out).show(truncate = false)
    } finally spark.stop()
  }
}
