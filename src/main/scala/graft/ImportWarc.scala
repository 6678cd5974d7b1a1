package graft

import graft.llm.CacheRegistry
import graft.sources.WarcCorpus
import org.apache.spark.sql.SparkSession

/** WARC → parquet import CLI: parse a crawl-archive drop (one archive
  * file or a directory of them) with the chunk-parallel anchor scan,
  * write the clean records and the quarantined ones as separate parquet
  * tables, and print the split — the crawl-side front door into every
  * other `graft` operator ([[ImportJsonl]]'s twin for the archive
  * format crawls actually deliver). Both physical layouts import:
  * uncompressed `.warc` and per-record-gzip `.warc.gz` (the Common
  * Crawl layout), routed per file by magic sniff — and any file in the
  * drop that is NEITHER is counted and named on stderr, so a partial
  * import is visible, never silent.
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
      val (nClean, nBad, skipped) = run(spark, args(0), args(1))
      println(s"[import] clean=$nClean quarantined=$nBad " +
        s"skipped_files=${skipped.length} -> ${args(1)}")
    } finally {
      CacheRegistry.releaseAll(spark)
      spark.stop()
    }
  }

  /** Runs the import; package-visible for the spec. Returns
    * (clean records, quarantined records, skipped file names). The
    * archive LIST is driver metadata (bounded, required); each
    * archive's bytes stay distributed via the chunked scan. Skipped =
    * directory entries matching neither `.warc` nor `.warc.gz`/`.gz` —
    * printed (first 20 by name) so a drop that mixes in unexpected
    * files imports PARTIALLY in plain sight, not silently.
    */
  def run(spark: SparkSession, inPath: String,
          outDir: String): (Long, Long, Seq[String]) = {
    val f = new java.io.File(inPath)
    val (archives, skipped) =
      if (f.isDirectory) {
        val all = Option(f.listFiles()).getOrElse(Array.empty)
          .filter(_.isFile).map(_.toString).sorted.toSeq
        val (keep, skip) = all.partition(p =>
          p.endsWith(".warc") || p.endsWith(".warc.gz") || p.endsWith(".gz"))
        require(keep.nonEmpty, s"no .warc / .warc.gz files under $inPath")
        require(keep.length <= 100000,
          s"${keep.length} archives exceed the 100k manifest bound — shard the drop")
        if (skip.nonEmpty) {
          System.err.println(s"[import] WARNING: skipping ${skip.length} " +
            s"non-archive file(s) in $inPath (not .warc/.warc.gz):")
          skip.take(20).foreach(p => System.err.println(s"[import]   $p"))
          if (skip.length > 20)
            System.err.println(s"[import]   ... and ${skip.length - 20} more")
        }
        (keep, skip)
      } else (Seq(inPath), Seq.empty[String])
    // ONE relation over every archive (readAuto routes plain vs gz by
    // magic into at most two distributed chunk plans — never a
    // per-archive union, whose left-nested plan overflows the analyzer
    // far below the 100k bound), persisted so the clean write,
    // quarantine write, and both counts pay the anchor-scan parse once
    val parsed = WarcCorpus.readAuto(spark, archives).persist()
    try {
      val clean = WarcCorpus.text(WarcCorpus.clean(parsed))
      clean.write.mode("overwrite").parquet(s"$outDir/documents")
      val bad = WarcCorpus.quarantine(parsed)
      bad.write.mode("overwrite").parquet(s"$outDir/quarantine")
      (clean.count(), bad.count(), skipped)
    } finally parsed.unpersist()
  }
}
