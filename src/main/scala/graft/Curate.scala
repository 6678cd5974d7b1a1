package graft

import graft.llm.{CacheRegistry, Curation, Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end training-data curation run — the LLM-pipeline counterpart
  * of [[Carve]]: normalize → quality gate → near-duplicate removal
  * (LSH + connected components, [[Dedup.dedupCorpus]]) → benchmark
  * decontamination → train/val/test split → deterministic shuffle key,
  * written as partitioned parquet with per-stage counts in a one-row
  * summary.
  *
  * Every stage is one of the library operators, so the run inherits
  * their scale shapes: the narrow stages (normalize/gate/split/shuffle
  * key) cost one scan; dedup collapses to canonical texts before any
  * pairwise work; decontamination broadcasts the benchmark n-grams.
  * All keys are md5-derived — a re-run (or another engine) reproduces
  * the same corpus bit-for-bit.
  *
  * Usage: runMain graft.Curate <documentsParquet> <benchParquet|-> <outDir>
  *            [--split-seed=S] [--segment-words=N] [--band-cap=N]
  * Flags (first-class config — env-var-only knobs get lost at deploy
  * time; the env vars below remain as fallbacks):
  *   --split-seed=S     split/shuffle hash seed (default "graft";
  *                      env GRAFT_SPLIT_SEED)
  *   --segment-words=N  enable the exact-substring (segment) dedup stage
  *                      at N-word granularity between the gate and the
  *                      near-dup pass (0/unset = off;
  *                      env GRAFT_SEGMENT_WORDS)
  *   --band-cap=N       drop LSH band buckets with more than N members
  *                      whole — the boilerplate guard for corpora where
  *                      one degenerate band key would emit quadratic
  *                      candidates (unset = no cap;
  *                      env GRAFT_LSH_BAND_CAP)
  * Env:   SPARK_GRAFT_CPUS (default 4).
  */
object Curate {
  def main(args: Array[String]): Unit = {
    val pos = args.filterNot(_.startsWith("--"))
    val flags = args.filter(_.startsWith("--"))
    require(pos.length >= 3,
      "usage: Curate <documentsParquet> <benchParquet|-> <outDir> " +
        "[--split-seed=S] [--segment-words=N] [--band-cap=N]")
    def flag(name: String): Option[String] =
      flags.collectFirst { case a if a.startsWith(s"--$name=") =>
        a.substring(name.length + 3) }
    val known = Set("split-seed", "segment-words", "band-cap")
    flags.foreach { f =>
      require(known.exists(k => f.startsWith(s"--$k=")),
        s"unknown flag $f (known: ${known.map("--" + _).mkString(", ")})")
    }
    val (docsPath, benchPath, outDir) = (pos(0), pos(1), pos(2))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val seed = flag("split-seed")
      .orElse(sys.env.get("GRAFT_SPLIT_SEED")).getOrElse("graft")
    val segWords = flag("segment-words")
      .orElse(sys.env.get("GRAFT_SEGMENT_WORDS")).map(_.toInt).filter(_ > 0)
    val bandCap = flag("band-cap")
      .orElse(sys.env.get("GRAFT_LSH_BAND_CAP")).map(_.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val summary = run(spark, docsPath,
        Option(benchPath).filter(_ != "-"), outDir, seed, segWords, bandCap)
      println(summary.mkString("{", ", ", "}"))
    } finally spark.stop()
  }

  /** Runs the pipeline; returns the stage-count summary (also written to
    * `outDir/summary`). Package-visible for the spec.
    */
  def run(spark: SparkSession, docsPath: String, benchPath: Option[String],
          outDir: String, seed: String,
          segmentWords: Option[Int] = None,
          bandCap: Option[Int] = None): Seq[(String, Long)] = {
    // validate config BEFORE any stage persists (a mid-pipeline abort
    // would otherwise leave stage caches behind); >= 2 is
    // lshCandidatePairs' own contract
    bandCap.foreach(c => require(c >= 2, s"band cap must be >= 2, got $c"))
    val raw = spark.read.parquet(docsPath)
    val nRaw = raw.count()

    // 1. normalize + quality gate — narrow, one scan. The gated frame
    // feeds the dedup keep-decisions AND the join back AND its stage
    // count, so persist it (shared subtrees re-execute otherwise).
    val normed = Curation.normalizeText(raw, "doc_id", "text")
      .select(col("doc_id"), col("norm_text").as("text"), col("lang"))
    val gated = CacheRegistry.persist(
      Curation.qualityGate(normed, "doc_id", "text")
        .filter(col("keep"))
        .select("doc_id", "text", "lang"))
    val nGated = gated.count()

    // 2. optional exact-substring (segment) dedup — rewrite every doc to
    // its corpus-first segments before the near-dup pass (the Lee et al.
    // ordering: substring-level first, then document-level)
    val preDedup = segmentWords match {
      case Some(w) =>
        CacheRegistry.persist(
          Dedup.segmentDedup(gated, "doc_id", "text", w)
            .filter(col("n_kept") > 0)
            .select(col("id").as("doc_id"), col("deduped_text").as("text"))
            .join(gated.select("doc_id", "lang"), Seq("doc_id")))
      case None => gated
    }
    val nSegment = preDedup.count()

    // 3. near-duplicate removal: cluster keep-decisions joined back.
    // bandCap (--band-cap / GRAFT_LSH_BAND_CAP) drops LSH band buckets
    // with > N members whole — the boilerplate-bucket guard for corpora
    // where one degenerate band key would emit quadratic candidates.
    val keep = Dedup.dedupCorpus(preDedup, "doc_id", "text",
        shingleN = 3, numHashes = 8, rowsPerBand = 2,
        maxBandMembers = bandCap)
      .filter(col("kept") === 1L)
      .select(col("doc_id"))
    val deduped = CacheRegistry.persist(preDedup.join(keep, Seq("doc_id")))
    val nDeduped = deduped.count()

    // 4. benchmark decontamination (skipped when no benchmark given)
    val clean = benchPath match {
      case Some(bp) =>
        val bench = spark.read.parquet(bp).select(col("doc_id"), col("text"))
        val flags = TextAnalysis.decontaminate(
          deduped.select(col("doc_id"), col("text")), bench,
          "doc_id", "text", n = 3, minShared = 3L)
        deduped.join(flags.filter(col("kept") === 1L).select("doc_id"), Seq("doc_id"))
      case None => deduped
    }
    val nClean = clean.count()

    // 5. split assignment + deterministic shuffle key, partitioned write
    val out = Curation.shuffleKey(
      Curation.assignSplit(clean, "doc_id", seed, trainPct = 90, valPct = 5),
      "doc_id", seed)
    out.write.mode("overwrite").partitionBy("split").parquet(s"$outDir/corpus")

    val summary = Seq("n_raw" -> nRaw, "n_quality" -> nGated) ++
      segmentWords.map(_ => "n_segment" -> nSegment).toSeq ++
      Seq("n_deduped" -> nDeduped, "n_clean" -> nClean)
    import spark.implicits._
    summary.toDF("stage", "n").coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/summary")
    CacheRegistry.releaseAll(spark)
    summary
  }
}
