package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end test of the Curate pipeline main over the sf0.001
  * documents table: stage counts are monotone, the written corpus is
  * readable and split-partitioned, no near-duplicate clusters survive,
  * and a re-run reproduces the identical corpus (determinism).
  */
class CurateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-curate-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("curate pipeline runs end-to-end, filters monotonically, and is deterministic") {
    val docs = "/root/testdata/sf0.001/documents.parquet"
    val out1 = Files.createTempDirectory("graft-curate1").toString
    val out2 = Files.createTempDirectory("graft-curate2").toString
    // benchmark side: the same synthetic corpus's doc_id % 97 == 0 slice,
    // staged to parquet (Curate reads bench from a path)
    val benchDir = Files.createTempDirectory("graft-bench").toString + "/bench"
    spark.read.parquet(docs).filter(col("doc_id") % 97 === 0)
      .select("doc_id", "text").write.parquet(benchDir)

    val s1 = Curate.run(spark, docs, Some(benchDir), out1, "graft")
    val counts = s1.toMap
    assert(counts("n_raw") > 0)
    assert(counts("n_raw") >= counts("n_quality"))
    assert(counts("n_quality") >= counts("n_deduped"))
    assert(counts("n_deduped") >= counts("n_clean"))
    assert(counts("n_clean") > 0)

    val corpus = spark.read.parquet(s"$out1/corpus")
    assert(corpus.count() == counts("n_clean"))
    // split partitioning exists and covers every row
    val splits = corpus.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet.subsetOf(Set("train", "val", "test")))
    assert(splits.values.sum == counts("n_clean"))
    assert(corpus.columns.contains("shuffle_key"))
    // the kept corpus has no remaining exact duplicates
    val dups = corpus.groupBy("text").count().filter(col("count") > 1).count()
    assert(dups == 0, "near-dup removal left exact duplicates")
    // no persisted RDDs leak out of the pipeline
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)

    // determinism: identical summary and identical kept doc_ids
    val s2 = Curate.run(spark, docs, Some(benchDir), out2, "graft")
    assert(s1 == s2)
    val ids1 = spark.read.parquet(s"$out1/corpus").select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = spark.read.parquet(s"$out2/corpus").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("profile report writes every table with sane totals") {
    val docs = "/root/testdata/sf0.001/documents.parquet"
    val out = Files.createTempDirectory("graft-profile").toString
    Profile.run(spark, docs, out)
    val nDocs = spark.read.parquet(docs).count()
    val hist = spark.read.parquet(s"$out/length_histogram")
    assert(hist.agg(sum("n_docs")).head().getLong(0) == nDocs)
    val langs = spark.read.parquet(s"$out/lang_counts")
    assert(langs.agg(sum("n_docs")).head().getLong(0) == nDocs)
    val quality = spark.read.parquet(s"$out/quality_buckets")
    assert(quality.agg(sum("n_docs")).head().getLong(0) == nDocs)
    assert(spark.read.parquet(s"$out/top_ngrams").count() == 50L)
    assert(spark.read.parquet(s"$out/frequency_spectrum").count() > 0L)
    assert(spark.read.parquet(s"$out/source_overlap").count() > 0L)
    assert(spark.read.parquet(s"$out/length_quantiles").count() > 0L)
    assert(spark.read.parquet(s"$out/source_counts")
      .agg(sum("n_docs")).head().getLong(0) == nDocs)
    assert(spark.read.parquet(s"$out/key_skew")
      .agg(sum("n_rows")).head().getLong(0) == nDocs)
    val shards = spark.read.parquet(s"$out/shard_plan")
    assert(shards.agg(sum("n_docs")).head().getLong(0) == nDocs)
  }

  test("jsonl import main splits a drop into documents and quarantine parquet") {
    val dir = Files.createTempDirectory("graft-import")
    Files.write(dir.resolve("drop.jsonl"), java.util.Arrays.asList(
      """{"doc_id": 1, "text": "a b", "lang": "en", "source": "s1"}""",
      """{"doc_id": 2, "text": "c", "lang": "de", "source": "s2"}""",
      """garbage line"""))
    val out = Files.createTempDirectory("graft-import-out").toString
    val (nClean, nBad) = ImportJsonl.run(spark, dir.toString, out)
    assert((nClean, nBad) == ((2L, 1L)))
    assert(spark.read.parquet(s"$out/documents")
      .columns.toSeq == Seq("doc_id", "text", "lang", "source"))
    assert(spark.read.parquet(s"$out/quarantine")
      .collect().map(_.getString(0)).toSeq == Seq("garbage line"))
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("diff main classifies a derived snapshot and writes both tables") {
    val docs = "/root/testdata/sf0.001/documents.parquet"
    val out = Files.createTempDirectory("graft-diff").toString
    // snapshot B: drop %7 docs, revise %5 docs
    val a = spark.read.parquet(docs)
    val bPath = s"$out/b.parquet"
    a.filter(col("doc_id") % 7 =!= 0)
      .withColumn("text", when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
      .write.mode("overwrite").parquet(bPath)
    val summary = Diff.run(spark, docs, bPath, out)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = a.count()
    val removed = a.filter(col("doc_id") % 7 === 0).count()
    val changed = a.filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 5 === 0).count()
    assert(summary.getOrElse("removed", 0L) == removed)
    assert(summary.getOrElse("changed", 0L) == changed)
    assert(summary.getOrElse("unchanged", 0L) == n - removed - changed)
    assert(!summary.contains("added"))
    assert(spark.read.parquet(s"$out/diff").count() == n)
  }

  test("segment-dedup stage rewrites texts to corpus-first segments before near-dup") {
    val docs = "/root/testdata/sf0.001/documents.parquet"
    val out = Files.createTempDirectory("graft-curate-seg").toString
    val s = Curate.run(spark, docs, None, out, "graft", segmentWords = Some(10))
    val counts = s.toMap
    assert(counts.contains("n_segment"))
    assert(counts("n_quality") >= counts("n_segment"))
    assert(counts("n_segment") >= counts("n_deduped"))
    assert(counts("n_clean") > 0)
    // every written text is segment-unique at 10-word granularity: no
    // 10-word-aligned segment appears twice in the whole output corpus
    val corpus = spark.read.parquet(s"$out/corpus")
    val dupSegs = corpus
      .select(explode(expr(
        """transform(sequence(0, (size(split(text, ' ')) - 1) div 10),
          |          i -> concat_ws(' ', slice(split(text, ' '), i * 10 + 1, 10)))"""
          .stripMargin)).as("seg"))
      .groupBy("seg").count().filter(col("count") > 1).count()
    assert(dupSegs == 0, "output corpus still contains duplicated segments")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("band cap runs end-to-end and a generous cap changes nothing") {
    val docs = "/root/testdata/sf0.001/documents.parquet"
    val out = Files.createTempDirectory("graft-curate-cap").toString
    val outRef = Files.createTempDirectory("graft-curate-capref").toString
    // a cap far above any honest bucket population must reproduce the
    // uncapped corpus exactly (the guard only drops degenerate buckets)
    val s = Curate.run(spark, docs, None, out, "graft", bandCap = Some(100000))
    val sRef = Curate.run(spark, docs, None, outRef, "graft")
    assert(s == sRef)
    val ids = spark.read.parquet(s"$out/corpus").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val idsRef = spark.read.parquet(s"$outRef/corpus").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == idsRef)
    // a nonsensical cap is rejected loudly, not silently ignored
    val err = intercept[IllegalArgumentException] {
      Curate.run(spark, docs, None, out, "graft", bandCap = Some(1))
    }
    assert(err.getMessage.contains("band cap"))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
