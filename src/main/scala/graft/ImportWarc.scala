package graft

import graft.llm.CacheRegistry
import graft.sources.WarcCorpus
import org.apache.spark.sql.SparkSession

/** WARC → parquet import CLI: parse a crawl-archive drop (one `.warc`
  * file or a directory of them) with the chunk-parallel anchor scan,
  * write the clean records and the quarantined ones as separate parquet
  * tables, and print the split — the crawl-side front door into every
  * other `graft` operator ([[ImportJsonl]]'s twin for the archive
  * format crawls actually deliver). Uncompressed archives only: the
  * anchor scan needs random access, which a whole-file gzip stream
  * cannot give (per-record-gzip crawls must be decompressed on the way
  * into the drop directory).
  *
  * Usage: runMain graft.ImportWarc <warcFileOrDir> <outDir>
  * Env:   SPARK_GRAFT_CPUS (default 4)
  */
object ImportWarc {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ImportWarc <warcFileOrDir> <outDir>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val (nClean, nBad) = run(spark, args(0), args(1))
      println(s"[import] clean=$nClean quarantined=$nBad -> ${args(1)}")
    } finally {
      CacheRegistry.releaseAll(spark)
      spark.stop()
    }
  }

  /** Runs the import; package-visible for the spec. Returns
    * (clean records, quarantined records). The archive LIST is driver
    * metadata (bounded, required); each archive's bytes stay
    * distributed via the chunked scan.
    */
  def run(spark: SparkSession, inPath: String, outDir: String): (Long, Long) = {
    val f = new java.io.File(inPath)
    val archives =
      if (f.isDirectory) {
        val fs = Option(f.listFiles()).getOrElse(Array.empty)
          .filter(x => x.isFile && x.getName.endsWith(".warc"))
          .map(_.toString).sorted.toSeq
        require(fs.nonEmpty, s"no .warc files under $inPath")
        require(fs.length <= 100000,
          s"${fs.length} archives exceed the 100k manifest bound — shard the drop")
        fs
      } else Seq(inPath)
    // ONE relation over every archive (readMany's distributed chunk
    // plan — never a per-archive union, whose left-nested plan
    // overflows the analyzer far below the 100k bound), persisted so
    // the clean write, quarantine write, and both counts pay the
    // anchor-scan parse once
    val parsed = WarcCorpus.readMany(spark, archives).persist()
    try {
      val clean = WarcCorpus.clean(parsed)
      clean.write.mode("overwrite").parquet(s"$outDir/documents")
      val bad = WarcCorpus.quarantine(parsed)
      bad.write.mode("overwrite").parquet(s"$outDir/quarantine")
      (clean.count(), bad.count())
    } finally parsed.unpersist()
  }
}
