package graft

import graft.llm.{Pq, VectorIndex}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Persisted IVF-PQ index: row-identity with the per-call path,
  * append-equals-rebuild, manifest guards, and the bucket-pruned scan.
  */
class VectorIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-vindex-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-vidx-$tag").toFile
    d.deleteOnExit()
    d.toString + "/idx" // buildIndex creates the leaf dir itself
  }

  private def probes(df: DataFrame): Seq[(Long, Array[Float])] =
    df.filter(col("vec_id") >= 10 && col("vec_id") < 20)
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq

  private def rows(df: DataFrame): Seq[(Long, Long, Int, Long)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._3)).toSeq

  test("indexed ANN is row-identical to the per-call IVF-ADC path") {
    val e = emb
    val dir = tmpDir("parity")
    VectorIndex.buildIndex(e, "vec_id", "embedding",
      coarse = e.filter(col("vec_id") < 8),
      codebook = e.filter(col("vec_id") < 16),
      dir, numBuckets = 8)
    val indexed = rows(
      VectorIndex.annTopKIndexed(spark, dir, probes(e), k = 5, nProbe = 2))
    val perCall = rows(
      Pq.ivfAdcTopK(e, "vec_id", "embedding",
        coarse = e.filter(col("vec_id") < 8),
        codebook = e.filter(col("vec_id") < 16),
        queries = e.filter(col("vec_id") >= 10 && col("vec_id") < 20),
        k = 5, nProbe = 2))
    assert(indexed.nonEmpty)
    assert(indexed === perCall)
  }

  test("append batch equals a full rebuild (disjoint ids)") {
    val e = emb
    val full = tmpDir("full")
    val inc = tmpDir("inc")
    val coarse = e.filter(col("vec_id") < 8)
    val cb = e.filter(col("vec_id") < 16)
    VectorIndex.buildIndex(e, "vec_id", "embedding", coarse, cb, full, 8)
    VectorIndex.buildIndex(e.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", coarse, cb, inc, 8)
    VectorIndex.appendToIndex(e.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding", inc)
    // the persisted lists rows themselves must agree...
    def lists(d: String) = VectorIndex.openLists(spark, d)
      .select(col("cent_id"), col("id"), col("codes").cast("string"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(lists(full) === lists(inc))
    // ...and so must the search results
    val p = probes(e)
    assert(rows(VectorIndex.annTopKIndexed(spark, full, p, 5, 2)) ===
      rows(VectorIndex.annTopKIndexed(spark, inc, p, 5, 2)))
  }

  test("search scans prune to the probed buckets, corpus side never shuffles") {
    val e = emb
    val dir = tmpDir("plan")
    VectorIndex.buildIndex(e, "vec_id", "embedding",
      coarse = e.filter(col("vec_id") < 8),
      codebook = e.filter(col("vec_id") < 16),
      dir, numBuckets = 8)
    val df = VectorIndex.annTopKIndexed(spark, dir, probes(e).take(3), 5, 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SelectedBucketsCount"),
      s"lists scan lost bucket pruning:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"probes must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"indexed ANN degraded to SMJ:\n$p")
  }

  test("indexed re-rank matches exact within-probe ranking; plain search never reads sv") {
    val e = emb
    val dir = tmpDir("rerank")
    VectorIndex.buildIndex(e, "vec_id", "embedding",
      coarse = e.filter(col("vec_id") < 8),
      codebook = e.filter(col("vec_id") < 16),
      dir, numBuckets = 8)
    val p = probes(e)
    // kCand large enough to cover every candidate in the probed lists:
    // the re-rank IS the exact ranking over the probe set, so it must
    // equal brute-force exact top-k RESTRICTED to the probed candidates
    val rr = rows(VectorIndex.annTopKRerankedIndexed(spark, dir, p,
      k = 5, kCand = 1000, nProbe = 8))
    import spark.implicits._
    graft.functions.VecFunctions.register(spark)
    val qdf = p.toDF("query_id", "qvec")
    val exact = rows(e.select(col("vec_id").as("neighbor_id"),
        call_function("graft_scale_q", col("embedding"), lit(10000.0)).as("nv"))
      .crossJoin(broadcast(qdf.select(col("query_id"),
        call_function("graft_scale_q", col("qvec"), lit(10000.0)).as("qv"))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        call_function("graft_sqdist", col("qv"), col("nv")).as("d2"))
      .withColumn("rnk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("d2"), col("neighbor_id"))).cast("int"))
      .filter(col("rnk") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("d2")))
    assert(rr === exact, "nProbe=8 (all lists) + unbounded kCand must equal exact top-k")
    // column pruning: the NON-refined path must not read the sv sidecar
    val plain = VectorIndex.annTopKIndexed(spark, dir, p, 5, 2)
    plain.collect()
    val plan = plain.queryExecution.executedPlan.toString
    val readSchemas = "ReadSchema: [^\\n]*".r.findAllIn(plan).toSeq
    assert(readSchemas.nonEmpty && readSchemas.forall(!_.contains("sv")),
      s"plain indexed search reads the refine sidecar:\n$plan")
  }

  test("manifest and probe-batch guards") {
    val e = emb
    val missing = intercept[IllegalArgumentException] {
      VectorIndex.annTopKIndexed(spark, tmpDir("absent"),
        Seq((1L, Array(1.0f))), 5, 1)
    }
    assert(missing.getMessage.contains("manifest"))
    val dir = tmpDir("guards")
    VectorIndex.buildIndex(e, "vec_id", "embedding",
      coarse = e.filter(col("vec_id") < 8),
      codebook = e.filter(col("vec_id") < 16),
      dir, numBuckets = 4)
    val p = probes(e)
    assert(intercept[IllegalArgumentException] {
      VectorIndex.annTopKIndexed(spark, dir, p, k = 0, nProbe = 1)
    }.getMessage.contains("k must be positive"))
    assert(intercept[IllegalArgumentException] {
      VectorIndex.annTopKIndexed(spark, dir, Seq.empty, k = 5, nProbe = 1)
    }.getMessage.contains("bounded"))
  }
}
