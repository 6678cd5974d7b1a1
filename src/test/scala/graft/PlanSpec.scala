package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the headline queries — pins the
  * properties the 100 TB scale story depends on, so a refactor that
  * silently introduces a shuffle, loses a broadcast, or widens a scan
  * fails CI rather than a cluster run.
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-plan-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Final (post-AQE) physical plan string of a SparkEntry query. */
  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // drive AQE to its final plan
    df.queryExecution.executedPlan.toString
  }

  test("dim joins broadcast the small side (no sort-merge shuffle)") {
    val p = planOf("q07_join_customer_nation_region")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join degraded to SMJ:\n$p")
  }

  test("group-by aggregation is partial (map-side combine) before the exchange") {
    val p = planOf("q02_agg_flag_status")
    assert(p.contains("partial_"), s"no map-side partial aggregation:\n$p")
  }

  test("per-document repetition stats run with no exchange at all") {
    val p = planOf("q53_repetition_stats")
    // the only allowed exchange is the final presentation orderBy
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 0, s"narrow per-doc scan acquired a shuffle:\n$p")
  }

  test("deterministic sampling is a scan-level filter with no exchange") {
    val p = planOf("q54_hash_sample")
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
      s"sampling should not shuffle:\n$p")
    assert(p.contains("Filter"), s"expected a filter over the scan:\n$p")
  }

  test("top-k uses TakeOrderedAndProject, not a global sort") {
    val p = planOf("q19_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), s"top-k did a full sort:\n$p")
  }

  test("quality gate is a shuffle-free narrow pass") {
    val p = planOf("q57_quality_gate")
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
      s"quality gate acquired a shuffle:\n$p")
  }

  test("corpus top-ngrams partially aggregates and take-orders the top k") {
    val p = planOf("q58_top_ngrams")
    assert(p.contains("partial_"), s"no map-side partial aggregation:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k did a full sort:\n$p")
  }

  test("token counting prunes the documents scan to the needed columns") {
    val df = SparkEntry.queries("q38_token_counts")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val schemas = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(schemas.nonEmpty, s"no parquet scan found:\n$p")
    schemas.foreach { s =>
      assert(!s.contains("source") && !s.contains("n_chars"),
        s"documents scan reads unused columns: $s")
    }
  }
}
