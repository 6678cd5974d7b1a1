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
}
