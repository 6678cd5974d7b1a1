package graft

import graft.llm.{CacheRegistry, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Tokenizer-training CLI: train a unigram-LM vocabulary over a
  * documents parquet table (hard-EM Viterbi counts or soft-EM
  * forward-backward posteriors) and persist it as a serving artifact
  * ([[graft.llm.TextAnalysis.saveVocab]] — parquet pieces + a pinned
  * manifest). Encode jobs then
  * [[graft.llm.TextAnalysis.loadVocab]] and run
  * `unigramEncode`/`unigramEncodeSampled` under exactly the trained
  * costs — the train-once/serve-everywhere split a production
  * tokenizer needs.
  *
  * Usage: runMain graft.Tokenize <documentsParquet> <outVocabDir>
  *        [vocabSize=48] [trainer=hard|soft] [maxPiece=4] [iters=2]
  * Env:   SPARK_GRAFT_CPUS (default 4)
  */
object Tokenize {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: Tokenize <documentsParquet> <outVocabDir> [vocabSize] [trainer] [maxPiece] [iters]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val n = run(spark, args(0), args(1),
        vocabSize = if (args.length > 2) args(2).toInt else 48,
        trainer = if (args.length > 3) args(3) else "hard",
        maxPiece = if (args.length > 4) args(4).toInt else 4,
        iters = if (args.length > 5) args(5).toInt else 2)
      println(s"[tokenize] trained and saved $n pieces -> ${args(1)}")
    } finally {
      CacheRegistry.releaseAll(spark)
      spark.stop()
    }
  }

  /** Runs the training + save; package-visible for the spec. Words
    * longer than 12 chars are excluded from TRAINING (the oracle-depth
    * convention every unigram query shares) — encoding stays total via
    * the byte-fallback escape when callers pass `unkCostMicro`.
    */
  def run(spark: SparkSession, docsParquet: String, outDir: String,
          vocabSize: Int, trainer: String, maxPiece: Int, iters: Int): Long = {
    val docs = spark.read.parquet(docsParquet)
      .select(array_join(filter(split(col("text"), " "),
        w => w =!= lit("") && length(w) <= 12), " ").as("text"))
    val vocab = trainer match {
      case "hard" => TextAnalysis.unigramTrainVocab(docs, "text",
        vocabSize = vocabSize, maxPiece = maxPiece, iters = iters)
      case "soft" => TextAnalysis.unigramTrainVocabSoft(docs, "text",
        vocabSize = vocabSize, maxPiece = maxPiece, iters = iters)
      case other => sys.error(s"trainer must be hard|soft, got '$other'")
    }
    TextAnalysis.saveVocab(vocab, outDir, maxPiece, trainer)
  }
}
