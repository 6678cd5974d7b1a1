package graft.llm

import graft.functions.{VecFunctions, VecKernels}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted IVF-PQ vector index — the serving-side counterpart of
  * [[Pq.ivfAdcTopK]], and the ANN twin of [[Retrieval.buildIndex]]'s
  * inverted text index.
  *
  * [[Pq.ivfAdcTopK]] re-assigns every corpus vector to its coarse list
  * and re-encodes its PQ codes on EVERY call — a full corpus scan per
  * probe batch. At 100 TB that scan is the entire cost of a query, paid
  * again by each one. This module materializes the scan's output ONCE:
  *
  *  - `lists` (cent_id, id, codes ARRAY<BIGINT>): one row per corpus
  *    vector — its coarse-list assignment and its m PQ codes (8 bytes of
  *    code per 64-float vector, the 32× PQ storage cut). Bucketed +
  *    sorted by `cent_id` over [[graft.sources.BucketedWarehouse]]: a
  *    query's probe set arrives as a `cent_id IN (…)` literal predicate,
  *    so the scan prunes to the buckets holding the probed lists — at
  *    thousands of lists the read touches a vanishing fraction of the
  *    corpus, which is exactly the inverted-list access pattern FAISS
  *    serves from RAM, expressed as bucket-pruned parquet.
  *  - `centroids` (cent_id, cv ARRAY<FLOAT>): the coarse quantizer —
  *    bounded by construction (≤ 2¹⁶ rows), re-collected at open.
  *  - `pqcodebook` (code, cv ARRAY<FLOAT>): the PQ codebook rows
  *    (≤ 256, one-byte codes), re-collected at open.
  *  - a manifest pinning (version, numBuckets, m, scale) so a fresh
  *    session re-attaches the same bucket spec and the same encoding
  *    geometry — scoring against codes produced under a different
  *    (m, scale) would be silent garbage.
  *
  * Search ([[annTopKIndexed]]) computes the query-side probes and ADC
  * distance tables on the DRIVER through the very same
  * [[graft.functions.VecKernels]] kernels the build used (one code path
  * — they cannot diverge), then runs: bucket-pruned lists scan →
  * broadcast probe join → `graft_adc` lookups → per-query top-k window.
  * Zero corpus-side vector math, zero corpus passes, one bounded
  * shuffle (the top-k window over candidates from ≤ nprobe lists per
  * query). Results are row-identical to [[Pq.ivfAdcTopK]] on the same
  * corpus + quantizers (pinned by the oracle gate and VectorIndexSpec).
  *
  * Appends ([[appendToIndex]]) encode ONLY the batch against the
  * PERSISTED quantizers and append bucket-aligned files — assignment
  * and codes are per-row pure functions of (vector, centroids,
  * codebook), so an appended index is bit-identical to a full rebuild
  * over the union (batch ids must be new; dedup upstream, e.g. via
  * snapshotDiff's `added` class). When [[Similarity.ivfIncrementalStats]]
  * flags codebook drift past threshold, rebuild instead.
  */
object VectorIndex extends PersistedIndex {

  override protected def manifestName: String = "_graft_vindex_manifest"
  override protected def indexKind: String = "vector index"
  override protected def buildHint: String = "run buildIndex first"
  // the compact fence predates the round-12 append fence; both
  // mutations share the one pending file (the BM25 convention)
  override protected def pendingName: String = "_graft_compact_pending"
  // v2 adds the refine sidecar: each lists row also carries its scaled
  // raw vector (`sv`), so the serving path can re-rank ADC candidates
  // with exact distances without a second store — FAISS's
  // IndexRefineFlat layout. Storage honesty: the sidecar costs what raw
  // vectors cost; the PQ codes still pay for themselves because plain
  // ADC search ([[annTopKIndexed]]) projects only (cent_id, id, codes)
  // — parquet column pruning never reads `sv` — and the re-rank path
  // reads it only for the PROBED buckets' rows.
  override protected def indexVersion: Int = 2

  /** Materialize the IVF-PQ index under `indexDir`. `coarse` and
    * `codebook` follow [[Pq.ivfAdcTopK]]'s contract: bounded vector
    * tables (id, vec) — at scale the output of k-means, persisted
    * verbatim so search and append re-derive the exact same geometry.
    * `numBuckets` is the scale knob: buckets ≈ corpus size /
    * executor-memory-sized chunk (thousands at 100 TB), and at least
    * one bucket per hot list keeps probe reads narrow.
    */
  def buildIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 coarse: DataFrame, codebook: DataFrame, indexDir: String,
                 numBuckets: Int, m: Int = 8, scale: Double = 10000.0): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    val spark = corpus.sparkSession
    val cents = collectVecTable(coarse, idCol, vecCol)
    require(cents.nonEmpty && cents.length <= (1 << 16),
      s"coarse quantizer must be bounded, got ${cents.length} entries")
    val cb = collectVecTable(codebook, idCol, vecCol)
    require(cb.nonEmpty && cb.length <= 256,
      s"PQ codebook must have 1..256 entries (one-byte codes), got ${cb.length}")
    // quantizers first: bounded frames, and their presence lets append
    // re-derive geometry without the caller re-supplying it
    import spark.implicits._
    cents.toSeq.toDF("cent_id", "cv")
      .write.mode("overwrite").parquet(s"$indexDir/centroids")
    cb.toSeq.toDF("code", "cv")
      .write.mode("overwrite").parquet(s"$indexDir/pqcodebook")
    graft.sources.BucketedWarehouse.writeBucketedPath(
      encodeLists(corpus, idCol, vecCol, cents, cb, m, scale),
      listsTableName(indexDir), s"$indexDir/lists", Seq("cent_id"), numBuckets)
    writeManifest(indexDir, Seq("numBuckets" -> numBuckets.toString,
      "m" -> m.toString, "scale" -> scale.toString))
  }

  /** Compact an append-grown IVF-PQ index: rewrite the lists table to
    * ONE file per bucket (each [[appendToIndex]] adds a file per
    * bucket, so probe-read file counts grow with every ingest batch).
    * With no pending deletes, search results are row-identical before
    * and after (OpsSpec); with tombstones ([[deleteFromIndex]]) the
    * rewrite also drops the deleted rows and clears the tombstone
    * table — unlike BM25, ADC carries no corpus statistics, so results
    * are already exact BEFORE the merge; compaction only reclaims
    * space and read latency. The swap window is fenced — a crash
    * mid-compact makes [[indexExists]] false instead of leaving a torn
    * lists table.
    */
  def compactIndex(spark: SparkSession, indexDir: String): Unit = {
    val (nb, _, _) = readManifest(indexDir)
    openLists(spark, indexDir)
    requireNoFence(indexDir, "append/compact")
    // tombstones covering EVERY vector would rewrite the lists empty —
    // not a servable state; refuse BEFORE the fence goes up (the BM25 /
    // dedup convention: nothing mutates, the index keeps serving)
    requireSurvivors(spark, indexDir,
      spark.read.parquet(s"$indexDir/lists"),
      s"compactIndex at $indexDir would leave zero surviving vectors — " +
        "drop the index dir and rebuild when content exists")
    raiseFence(indexDir, "")
    tombstoneIds(spark, indexDir) match {
      case None =>
        graft.sources.BucketedWarehouse.compactBucketedPath(
          spark, listsTableName(indexDir), s"$indexDir/lists", Seq("cent_id"), nb)
      case Some(ts) =>
        graft.sources.BucketedWarehouse.rewriteBucketedPath(
          spark.read.parquet(s"$indexDir/lists")
            .join(broadcast(ts), Seq("id"), "left_anti"),
          spark, listsTableName(indexDir), s"$indexDir/lists", Seq("cent_id"), nb)
        clearTombstones(indexDir)
    }
    clearFence(indexDir)
  }

  /** Delete vectors from the index without rewriting it — the takedown
    * path, [[graft.llm.Retrieval.deleteFromIndex]]'s twin. Ids append
    * to a tombstone table; both search paths anti-join candidates
    * against it, so deleted vectors stop being served immediately, and
    * — because ADC scoring has no corpus-level statistics — results
    * are EXACTLY those of a rebuild over the survivors even before
    * [[compactIndex]] makes the deletes physical.
    */
  def deleteFromIndex(spark: SparkSession, indexDir: String,
                      ids: Seq[Long]): Unit =
    appendTombstoneIds(spark, indexDir, ids)

  /** Encode an append batch against the PERSISTED quantizers and append
    * its rows bucket-aligned — batch-sized work, zero touches of the
    * already-indexed corpus. Batch ids MUST be new (see class doc).
    */
  def appendToIndex(batch: DataFrame, idCol: String, vecCol: String,
                    indexDir: String): Unit =
    appendToIndex(batch, idCol, vecCol, indexDir, None)

  /** [[appendToIndex]] with the append COMMITTED TO A LEDGER as part of
    * the fence-clear sequence — the streaming-ingest form, mirroring
    * [[Retrieval.appendToIndex]]'s contract exactly. The bucketed
    * append is NOT idempotent (a replayed batch would double-append its
    * PQ codes into the lists, silently duplicating every ANN candidate
    * it contributed), so the ordering is: data step → ledger line
    * (fsync'd) → fence clear. A replay that finds `batchId` in the
    * ledger KNOWS the rows landed exactly once and skips the append; a
    * crash before the line trips the fence (detectable stop → rebuild);
    * a crash after it leaves a provably-stale fence
    * [[clearCompletedAppendFence]] removes. The ledger-less form uses
    * the fence alone (commit point = the fence clear).
    */
  def appendToIndex(batch: DataFrame, idCol: String, vecCol: String,
                    indexDir: String,
                    commitLedger: Option[(java.io.File, Long)]): Unit = {
    val spark = batch.sparkSession
    val (nb, m, scale) = readManifest(indexDir)
    openLists(spark, indexDir) // re-registers the table in a fresh session
    val (cents, cb) = readQuantizers(spark, indexDir)
    requireNoFence(indexDir, "append/compact")
    raiseFence(indexDir, commitLedger.map(_._2.toString).getOrElse(""))
    graft.sources.BucketedWarehouse.appendBucketedPath(
      encodeLists(batch, idCol, vecCol, cents, cb, m, scale),
      listsTableName(indexDir), s"$indexDir/lists", Seq("cent_id"), nb)
    crashPoint(spark, "ann_append_before_ledger")
    commitLedger.foreach { case (ledger, id) => appendLineSync(ledger, id) }
    crashPoint(spark, "ann_append_after_ledger")
    clearFence(indexDir)
  }

  /** ANN top-k from the PERSISTED index — [[Pq.ivfAdcTopK]]'s scoring,
    * zero corpus passes. `queries` carries literal (id, vector) probes
    * (what a serving call is — bounded like the codebooks, ≤ 4096), so
    * the probe lists resolve on the driver through the same kernels the
    * build used and arrive at the scan as a `cent_id IN (…)` literal
    * the bucketed layout prunes on. Output (query_id, neighbor_id, rnk,
    * adc_dist), self-matches excluded, row-identical to ivfAdcTopK.
    */
  def annTopKIndexed(spark: SparkSession, indexDir: String,
                     queries: Seq[(Long, Array[Float])], k: Int,
                     nProbe: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(nProbe > 0, "nProbe must be positive")
    require(queries.nonEmpty && queries.length <= 4096,
      s"queries must be a bounded literal probe batch (1..4096), got ${queries.length}")
    VecFunctions.register(spark)
    val (_, m, scale) = readManifest(indexDir)
    val (cents, cb) = readQuantizers(spark, indexDir)
    val centsFlat = cents.flatMap(_._2)
    val cids = cents.map(_._1)
    val cbFlat = flattenCodebook(cb.map(_._2), m, scale)
    // query-side probe ranks + ADC tables, driver-computed through the
    // SAME VecKernels entry points the executors run — one code path
    val probeRows = queries.flatMap { case (qid, vec) =>
      val ranked = VecKernels.cosRank(
        new GenericArrayData(vec), centsFlat, cids).toLongArray()
      val dt = VecKernels.pqDistTable(
        VecKernels.scaleQ(new GenericArrayData(vec), scale), cbFlat, m)
        .toLongArray()
      ranked.take(nProbe).map(centId => (qid, centId, dt))
    }
    val probeCents = probeRows.map(_._2).distinct.sorted
    import spark.implicits._
    val qProbes = probeRows.toDF("query_id", "cent_id", "graft_dt")
    val lists = withoutTombstoned(spark, indexDir,
      openLists(spark, indexDir).filter(col("cent_id").isin(probeCents: _*)))
    val adc = call_function("graft_adc", col("graft_dt"), col("codes"), lit(m))
    val scored = broadcast(qProbes).join(lists, Seq("cent_id"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"), adc.as("adc_dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist"), col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("adc_dist"))
  }

  /** ANN top-k from the persisted index WITH the exact re-rank stage —
    * the full production serving path (FAISS IndexRefineFlat): ADC
    * lookups over the bucket-pruned lists scan nominate `kCand`
    * candidates per query, the `sv` refine vectors ride along from the
    * SAME pruned scan (read only for the probed buckets — the unprobed
    * corpus never touches the wide column), exact scaled-BIGINT
    * squared-L2 re-scores the kCand survivors, and the top `k` by the
    * true metric return. Recall@k ≥ the
    * plain [[annTopKIndexed]]@k by the candidate-superset argument.
    * Two per-query-bounded windows; zero corpus passes. Output:
    * (query_id, neighbor_id, rnk, d2).
    */
  def annTopKRerankedIndexed(spark: SparkSession, indexDir: String,
                             queries: Seq[(Long, Array[Float])], k: Int,
                             kCand: Int, nProbe: Int): DataFrame = {
    require(k > 0 && kCand >= k, s"need kCand >= k >= 1, got k=$k kCand=$kCand")
    require(nProbe > 0, "nProbe must be positive")
    require(queries.nonEmpty && queries.length <= 4096,
      s"queries must be a bounded literal probe batch (1..4096), got ${queries.length}")
    VecFunctions.register(spark)
    val (_, m, scale) = readManifest(indexDir)
    val (cents, cb) = readQuantizers(spark, indexDir)
    val centsFlat = cents.flatMap(_._2)
    val cids = cents.map(_._1)
    val cbFlat = flattenCodebook(cb.map(_._2), m, scale)
    val probeRows = queries.flatMap { case (qid, vec) =>
      val ranked = VecKernels.cosRank(
        new GenericArrayData(vec), centsFlat, cids).toLongArray()
      val dt = VecKernels.pqDistTable(
        VecKernels.scaleQ(new GenericArrayData(vec), scale), cbFlat, m)
        .toLongArray()
      val qv = VecKernels.scaleQ(new GenericArrayData(vec), scale).toLongArray()
      ranked.take(nProbe).map(centId => (qid, centId, dt, qv))
    }
    val probeCents = probeRows.map(_._2).distinct.sorted
    import spark.implicits._
    val qProbes = probeRows.toDF("query_id", "cent_id", "graft_dt", "graft_qv")
    val lists = withoutTombstoned(spark, indexDir,
      openLists(spark, indexDir).filter(col("cent_id").isin(probeCents: _*)))
    val adc = call_function("graft_adc", col("graft_dt"), col("codes"), lit(m))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist"), col("neighbor_id"))
    val cand = broadcast(qProbes).join(lists, Seq("cent_id"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        adc.as("adc_dist"), col("graft_qv"), col("sv"))
      .withColumn("graft_crnk", row_number().over(wAdc))
      .filter(col("graft_crnk") <= kCand)
    val wEx = Window.partitionBy(col("query_id"))
      .orderBy(col("d2"), col("neighbor_id"))
    cand.select(col("query_id"), col("neighbor_id"),
        call_function("graft_sqdist", col("graft_qv"), col("sv")).as("d2"))
      .withColumn("rnk", row_number().over(wEx).cast("int"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("d2"))
  }

  /** The bucket-spec-carrying lists frame (re-registering the external
    * table in this session's catalog if absent).
    */
  def openLists(spark: SparkSession, indexDir: String): DataFrame = {
    val (nb, _, _) = readManifest(indexDir)
    graft.sources.BucketedWarehouse.registerExternal(spark,
      listsTableName(indexDir), s"$indexDir/lists",
      "cent_id BIGINT, id BIGINT, codes ARRAY<BIGINT>, sv ARRAY<BIGINT>",
      Seq("cent_id"), nb)
    spark.table(listsTableName(indexDir))
  }

  // ------------------------------------------------------------------

  /** (cent_id, id, codes, sv): the one corpus pass — assignment,
    * encoding, and the scaled refine sidecar fused in a single narrow
    * codegen'd scan, exactly ivfAdcTopK's corpus side plus `sv`.
    */
  private def encodeLists(corpus: DataFrame, idCol: String, vecCol: String,
                          cents: Array[(Long, Array[Float])],
                          cb: Array[(Long, Array[Float])],
                          m: Int, scale: Double): DataFrame = {
    val spark = corpus.sparkSession
    VecFunctions.register(spark)
    val centsFlat = cents.flatMap(_._2)
    val cids = cents.map(_._1)
    val cbFlat = flattenCodebook(cb.map(_._2), m, scale)
    val sv = call_function("graft_scale_q", col(vecCol), lit(scale))
    corpus.select(
      element_at(call_function("graft_cos_rank", col(vecCol),
        typedLit(centsFlat), typedLit(cids)), 1).as("cent_id"),
      col(idCol).cast("long").as("id"),
      call_function("graft_pq_codes", sv, typedLit(cbFlat), lit(m)).as("codes"),
      sv.as("sv"))
  }

  /** Bounded (id, vec) table collected ascending-id — the quantizer
    * collection shape [[Pq]] uses (code/cent = rank position).
    */
  private def collectVecTable(df: DataFrame, idCol: String,
                              vecCol: String): Array[(Long, Array[Float])] =
    df.select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  private def readQuantizers(spark: SparkSession, indexDir: String)
      : (Array[(Long, Array[Float])], Array[(Long, Array[Float])]) = {
    def read(sub: String, id: String) =
      collectVecTable(spark.read.parquet(s"$indexDir/$sub"), id, "cv")
    (read("centroids", "cent_id"), read("pqcodebook", "code"))
  }

  /** [[Pq.collectCodebook]]'s flatten ([s][c][dsub], scaled through
    * scaleQLocal) on already-collected rows.
    */
  private def flattenCodebook(rows: Array[Array[Float]], m: Int,
                              scale: Double): Array[Long] = {
    val dim = rows.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    val scaled = VecKernels.scaleQLocal(rows, scale)
    val out = new Array[Long](m * rows.length * dsub)
    var o = 0
    for (s <- 0 until m; c <- rows.indices; i <- 0 until dsub) {
      out(o) = scaled(c)(s * dsub + i); o += 1
    }
    out
  }

  private def readManifest(indexDir: String): (Int, Int, Double) = {
    val props = readManifestProps(indexDir)
    (props.getProperty("numBuckets").toInt, props.getProperty("m").toInt,
      props.getProperty("scale").toDouble)
  }

  /** Deterministic per-path catalog name (two indexes coexist; a fresh
    * session re-attaches by path).
    */
  private def listsTableName(indexDir: String): String =
    s"graft_vidx_${tableTag(indexDir)}_lists"
}
