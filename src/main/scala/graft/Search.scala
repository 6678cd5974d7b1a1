package graft

import graft.llm.{CacheRegistry, Retrieval}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc BM25 retrieval over a documents table — the seed-expansion /
  * domain-probe CLI: each positional query is a comma-separated term
  * list, scored with the library's integer-exact Okapi BM25
  * ([[graft.llm.Retrieval.bm25TopKFor]]) against the corpus token
  * index, top-k per query written as one parquet table and echoed to
  * stdout with the matched documents' text heads.
  *
  * Usage: runMain graft.Search <documentsParquet> <outDir> <k> <q1> [q2 ...]
  *        (each qN like "spark,table,join")
  *
  * A corpus probed more than once should pay the tokenize+shuffle ONCE:
  *   runMain graft.Search --build-index <documentsParquet> <indexDir> [numBuckets]
  *   runMain graft.Search --index <indexDir> <outDir> <k> <q1> [q2 ...]
  * The indexed mode scores from the persisted bucketed postings
  * (bucket-pruned scan, zero corpus passes) and emits
  * (qid, rnk, doc_id, n_terms, score_bp) — no text echo, the index
  * stores postings only.
  * Env:   SPARK_GRAFT_CPUS (default 4)
  */
object Search {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: Search <documentsParquet> <outDir> <k> <terms,terms,...>+\n" +
      "   or: Search --build-index <documentsParquet> <indexDir> [numBuckets]\n" +
      "   or: Search --index <indexDir> <outDir> <k> <terms,terms,...>+")
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
          val numBuckets = if (args.length > 3) args(3).toInt else 32
          Retrieval.buildIndex(spark.read.parquet(args(1)), "doc_id", "text",
            args(2), numBuckets)
          println(s"index written: ${args(2)} ($numBuckets buckets)")
        case "--index" =>
          require(args.length >= 5,
            "usage: Search --index <indexDir> <outDir> <k> <terms,terms,...>+")
          val (outDir, k) = (args(2), args(3).toInt)
          val queries = args.drop(4).toSeq.map(parseTerms)
          val out = Retrieval.bm25TopKIndexed(spark, args(1), queries, k)
            .withColumnRenamed("id", "doc_id")
            .orderBy("qid", "rnk")
          out.write.mode("overwrite").parquet(outDir)
          spark.read.parquet(outDir).orderBy("qid", "rnk")
            .show(queries.size * k, truncate = 60)
        case docsPath =>
          require(args.length >= 4,
            "usage: Search <documentsParquet> <outDir> <k> <terms,terms,...>+")
          val (outDir, k) = (args(1), args(2).toInt)
          val queries = args.drop(3).toSeq.map(parseTerms)
          val out = run(spark, docsPath, queries, k)
          out.write.mode("overwrite").parquet(outDir)
          // echo from the WRITTEN result — don't re-run the scoring plan
          spark.read.parquet(outDir).orderBy("qid", "rnk")
            .show(queries.size * k, truncate = 60)
      }
    } finally {
      CacheRegistry.releaseAll(spark)
      spark.stop()
    }
  }

  private def parseTerms(q: String): Seq[String] =
    q.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** Runs the retrieval; package-visible for the spec. Returns
    * (qid, rnk, doc_id, n_terms, score_bp, text).
    */
  def run(spark: SparkSession, docsPath: String,
          queries: Seq[Seq[String]], k: Int): DataFrame = {
    import spark.implicits._
    require(queries.nonEmpty && queries.forall(_.nonEmpty),
      "every query needs at least one term")
    val docs = spark.read.parquet(docsPath)
    val terms = queries.zipWithIndex
      .flatMap { case (ts, i) => ts.distinct.map(t => (i.toLong, t)) }
      .toDF("qid", "tok")
    Retrieval.bm25TopKFor(docs, "doc_id", "text", terms, k)
      .withColumnRenamed("id", "doc_id")
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .select(col("qid"), col("rnk"), col("doc_id"), col("n_terms"),
        col("score_bp"), col("text"))
      .orderBy("qid", "rnk")
  }
}
