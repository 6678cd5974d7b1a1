package graft

import java.nio.file.Files

import graft.sources.BucketedWarehouse
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the bucketed-table layout: a join and a groupBy on the
  * bucket key of co-bucketed tables must run with ZERO exchanges — the
  * write-once-shuffle-never contract the 100 TB re-join pipelines rely
  * on.
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val warehouse = Files.createTempDirectory("graft-wh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bucketing-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", warehouse)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def exchanges(p: String): Int =
    "Exchange hashpartitioning".r.findAllIn(p).size

  test("co-bucketed join and key groupBy plan with zero exchanges") {
    import spark.implicits._
    val docs = (0L until 1000L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val meta = (0L until 1000L).map(i => (i, i % 7)).toDF("doc_id", "grp")
    BucketedWarehouse.writeBucketed(docs, "b_docs", Seq("doc_id"), 8)
    BucketedWarehouse.writeBucketed(meta, "b_meta", Seq("doc_id"), 8)

    // force the sort-merge path so the assertion tests bucketing, not a
    // broadcast that would hide a missing co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = BucketedWarehouse.colocatedJoin(spark, "b_docs", "b_meta", Seq("doc_id"))
      // value-level correctness, not just cardinality: a write/scan
      // hash mismatch that mis-assigns rows would keep count==1000
      val got = j.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == (0L until 1000L).map(i => (i, s"text $i", i % 7)).toSet)
      val jp = j.queryExecution.executedPlan.toString
      assert(exchanges(jp) == 0, s"co-bucketed join acquired a shuffle:\n$jp")
      assert(jp.contains("SortMergeJoin"), s"expected sort-merge join:\n$jp")

      val a = BucketedWarehouse.colocatedAgg(spark, "b_docs", Seq("doc_id"),
        Seq(count(lit(1)).as("n")))
      assert(a.count() == 1000L)
      val ap = a.queryExecution.executedPlan.toString
      assert(exchanges(ap) == 0, s"bucket-key groupBy acquired a shuffle:\n$ap")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_meta")
    }
  }

  test("point lookups prune to a single bucket; buckets land one file each") {
    import spark.implicits._
    val l = (0L until 500L).map(i => (i, i * 2)).toDF("doc_id", "a")
    BucketedWarehouse.writeBucketed(l, "b_l", Seq("doc_id"), 4)
    // the auto-bucketed-scan heuristic turns bucketing off for plans
    // with no exchange to save — pin pruning with the scan forced on
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      // bucket pruning: an equality predicate on the bucket key must
      // read 1 of 4 buckets, not scan the table
      val q = spark.table("b_l").filter(col("doc_id") === 123L)
      assert(q.count() == 1L)
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount: 1 out of 4"),
        s"point lookup did not prune buckets:\n$p")
      // one file per bucket: the pre-write repartition collapsed the
      // nTasks x nBuckets file explosion
      val files = spark.table("b_l").inputFiles
      assert(files.length == 4, s"expected 4 bucket files, got ${files.toSeq}")
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS b_l")
    }
  }

  /** Per-row-group [min, max] of a BIGINT column straight from the
    * parquet footers — what min/max data skipping actually reads.
    */
  private def rowGroupRanges(dir: String, column: String): Seq[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).toSeq.flatMap { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.toURI), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.toSeq.map { b =>
          val c = b.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .getOrElse(sys.error(s"no column $column in ${f.getName}"))
          val st = c.getStatistics
          (st.genericGetMin.asInstanceOf[Number].longValue(),
            st.genericGetMax.asInstanceOf[Number].longValue())
        } finally r.close()
      }
  }

  test("z-order relayout tightens parquet row-group min/max stats and prunes windows") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-zorder-proof").toString
    // 60k points on a 512x512 grid in insertion order: each written file
    // spans nearly the whole y range, so footer stats prune nothing
    val df = (0L until 60000L)
      .map(i => (i, i % 512L, (i * 131) % 512L))
      .toDF("id", "x", "y")
    df.repartition(16).write.parquet(s"$tmp/plain")
    graft.sources.ZOrderLayout.writeZOrdered(df, s"$tmp/zorder", "x", "y",
      bits = 9, numFiles = 16)
    // same rows both ways (the relayout is a permutation)
    val window = (d: org.apache.spark.sql.DataFrame) => d
      .filter(col("x").between(100L, 131L) && col("y").between(200L, 231L))
    val plainDf = spark.read.parquet(s"$tmp/plain")
    val zDf = spark.read.parquet(s"$tmp/zorder")
    assert(window(zDf).count() === window(plainDf).count())
    def avgSpan(rs: Seq[(Long, Long)]): Double =
      rs.map { case (lo, hi) => (hi - lo).toDouble }.sum / rs.size
    // footer proof: the z-ordered row groups bound BOTH dimensions;
    // the insertion order bounds neither (x cycles through 0..511 in
    // every file slice)
    val plainY = rowGroupRanges(s"$tmp/plain", "y")
    val zY = rowGroupRanges(s"$tmp/zorder", "y")
    val zX = rowGroupRanges(s"$tmp/zorder", "x")
    assert(avgSpan(zY) < avgSpan(plainY) / 2,
      s"y spans did not tighten: plain ${avgSpan(plainY)}, z ${avgSpan(zY)}")
    assert(avgSpan(zX) < 512 / 2, s"x spans unbounded: ${avgSpan(zX)}")
    // pruning proof: row groups whose [min,max] intersects the window
    // in BOTH dims — what a min/max-skipping reader must touch
    def touches(xs: Seq[(Long, Long)], ys: Seq[(Long, Long)]): Int =
      xs.zip(ys).count { case ((xlo, xhi), (ylo, yhi)) =>
        xhi >= 100L && xlo <= 131L && yhi >= 200L && ylo <= 231L }
    val plainTouch = touches(rowGroupRanges(s"$tmp/plain", "x"), plainY)
    val zTouch = touches(zX, zY)
    assert(plainTouch == plainY.size,
      s"precondition: insertion order should prune nothing, touched $plainTouch/${plainY.size}")
    assert(zTouch * 4 <= zY.size,
      s"z-order should prune >= 3/4 of row groups, touched $zTouch/${zY.size}")
  }
}
