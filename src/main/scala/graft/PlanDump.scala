package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` for the named queries to
  * files — the before/after plan evidence the optimization rounds
  * commit under plans/rNN/.
  *
  *   sbt "runMain graft.PlanDump plans/r14 before q136_embed_covariance,q156_threshold_sweep [sfDir]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <q1,q2,...> [sfDir]")
    val outDir = new java.io.File(args(0))
    outDir.mkdirs()
    val tag = args(1)
    val names = args(2).split(",").filter(_.nonEmpty).toSeq
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      val df = fn(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val f = new java.io.File(outDir, s"${name}_$tag.txt")
      java.nio.file.Files.write(f.toPath,
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $f")
      graft.llm.CacheRegistry.releaseAll(spark)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
