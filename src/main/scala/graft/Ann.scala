package graft

import graft.llm.{CacheRegistry, VectorIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Vector-index operations CLI — [[graft.Search]]'s ANN twin: build a
  * persisted IVF-PQ index over an embeddings table once, append later
  * batches, and serve top-k probes from it with zero corpus passes.
  *
  * Usage:
  *   runMain graft.Ann --build-index <embParquet> <indexDir> <nLists> [numBuckets]
  *     k-means (`nLists` centroids, 5 rounds) trains the coarse
  *     quantizer and the first ≤256 vectors by id seed the PQ codebook
  *     (any bounded vector table works — swap in a trained one by
  *     building through the library API instead).
  *   runMain graft.Ann --append <embParquet> <indexDir>
  *     encode ONLY the batch against the persisted quantizers (ids
  *     must be new).
  *   runMain graft.Ann --query <embParquet> <indexDir> <outDir> <k> <nprobe> <id1> [id2 ...]
  *     probe with the embeddings of the given vec_ids; top-k per query
  *     written as parquet and echoed.
  *
  * Env: SPARK_GRAFT_CPUS (default 4)
  */
object Ann {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: Ann --build-index <embParquet> <indexDir> <nLists> [numBuckets]\n" +
      "   or: Ann --append <embParquet> <indexDir>\n" +
      "   or: Ann --query <embParquet> <indexDir> <outDir> <k> <nprobe> <id1> [id2 ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      args(0) match {
        case "--build-index" =>
          require(args.length >= 4,
            "usage: Ann --build-index <embParquet> <indexDir> <nLists> [numBuckets]")
          val emb = spark.read.parquet(args(1))
          val nLists = args(3).toInt
          val numBuckets = if (args.length > 4) args(4).toInt else 32
          // coarse quantizer: the library's deterministic k-means
          // (md5-seeded init, integer-exact assignment)
          val coarse = graft.llm.Similarity.kmeans(
            emb, "vec_id", "embedding", k = nLists, iters = 5)
          val codebook = emb.orderBy("vec_id").limit(256)
          VectorIndex.buildIndex(emb, "vec_id", "embedding",
            coarse.withColumnRenamed("cluster_id", "vec_id"),
            codebook, args(2), numBuckets)
          println(s"index written: ${args(2)} ($nLists lists, $numBuckets buckets)")
        case "--append" =>
          VectorIndex.appendToIndex(spark.read.parquet(args(1)),
            "vec_id", "embedding", args(2))
          println(s"appended to: ${args(2)}")
        case "--query" =>
          require(args.length >= 7,
            "usage: Ann --query <embParquet> <indexDir> <outDir> <k> <nprobe> <id1> [id2 ...]")
          val (indexDir, outDir) = (args(2), args(3))
          val (k, nProbe) = (args(4).toInt, args(5).toInt)
          val ids = args.drop(6).map(_.toLong).toSeq
          val probes = spark.read.parquet(args(1))
            .filter(col("vec_id").isin(ids: _*))
            .select(col("vec_id").cast("long"), col("embedding"))
            .collect()
            .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
            .sortBy(_._1).toSeq
          require(probes.nonEmpty, s"no embeddings found for ids $ids")
          VectorIndex.annTopKIndexed(spark, indexDir, probes, k, nProbe)
            .orderBy("query_id", "rnk")
            .write.mode("overwrite").parquet(outDir)
          spark.read.parquet(outDir).orderBy("query_id", "rnk")
            .show(probes.size * k, truncate = false)
        case other =>
          sys.error(s"unknown mode $other")
      }
    } finally {
      CacheRegistry.releaseAll(spark)
      spark.stop()
    }
  }
}
