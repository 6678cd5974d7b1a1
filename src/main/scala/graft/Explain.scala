package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one SparkEntry query and print its wall time, row
  * count, and final (post-AQE) physical plan — the `.explain` loop the
  * performance work iterates on.
  *
  *   java -cp ... graft.Explain q118_pq_adc_topk /root/testdata/sf0.1
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Explain <queryName> [sfDir]")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val df = fn(spark, dir)
    df.count() // warm: codegen + AQE final plan
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[explain] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.3f s (second run)")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
