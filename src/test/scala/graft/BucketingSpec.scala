package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Co-located joins via bucketing — the pre-shuffle strategy for repeated
  * large-table joins (orders⋈lineitem at 100 TB): both sides bucketed on
  * the join key join WITHOUT a shuffle exchange on either side.
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val warehouse = Files.createTempDirectory("graft-wh").toString
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bucketed tables join without exchanges") {
    val dir = "/root/testdata/sf0.001"
    spark.read.parquet(s"$dir/orders.parquet")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")

    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // bucketed scan feeds the sort-merge join directly: no shuffle of
    // either fact table (the only exchange is the tiny final groupBy)
    assert(plan.contains("SortMergeJoin"))
    val exchangesBeforeAgg = "Exchange hashpartitioning\\((o_orderkey|l_orderkey)".r
      .findAllIn(plan).size
    assert(exchangesBeforeAgg == 0, s"join sides were shuffled:\n$plan")

    // and the result is correct vs the plain join
    val expected = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val actual = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(actual == expected)
  }
}
