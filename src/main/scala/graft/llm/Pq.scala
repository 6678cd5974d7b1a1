package graft.llm

import graft.functions.{VecFunctions, VecKernels}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Product quantization (PQ) — the memory-compression path for
  * billion-vector ANN serving (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): split each
  * d-dim vector into `m` subspaces of d/m dims, quantize each subvector
  * against a small per-subspace codebook, and store the vector as m
  * one-byte codes. Search then runs against the codes with an asymmetric
  * distance computation (ADC): per query, precompute the m×ksub table of
  * query-subvector-to-centroid distances, then score any candidate with
  * m table lookups — no vector math on the corpus side at all.
  *
  * Scale shape: the codebook is bounded by construction (m·ksub·dsub
  * constants — at scale the output of per-subspace k-means, here any
  * ksub-row vector table) and rides into the plan as literals, so
  * ENCODING is a narrow codegen'd scan — ZERO shuffles at any corpus
  * size — that shrinks each 64-float vector to 8 bytes, a 32× storage
  * cut before any index structure. ADC broadcasts the (tiny) per-query
  * distance tables; the corpus side does m array lookups + a sum per
  * row, which is why PQ serves billion-vector indexes from RAM.
  *
  * PERF: all vector math runs through the [[graft.functions.VecKernels]]
  * codegen'd kernel expressions — static primitive-array loops called
  * from whole-stage codegen. The two alternatives both fail at this
  * expression size: higher-order functions (`aggregate(zip_with(...))`)
  * are CodegenFallback (measured ~1.3 ms/row), and unrolled scalar
  * `element_at` chains exceed the JVM's 64 KB method limit (m·ksub·dsub
  * ≈ 1000+ terms), which kills whole-stage codegen for the entire stage
  * and made the interpreted fallback the hot path (measured ~1.7 ms/row
  * before this form; ~2 µs/row after).
  *
  * Everything is computed on `round(x·scale)` BIGINTs (the q92/dimStats
  * quantization), so subspace distances, code argmins, ADC sums, and
  * ranks are integer-exact and engine-independent (ties → lowest code /
  * lowest neighbor id). Corpus rows and the codebook literals are scaled
  * by the SAME kernel ([[VecKernels.scaleQ]] per row,
  * [[VecKernels.scaleQLocal]] at plan build — one code path), which
  * ScaleSpec pins bit-identical to the engine's own
  * `round(cast(x as double) * scale)` expression over the full corpus.
  */
object Pq {

  /** The per-row scaled vector through the codegen'd kernel. */
  private def scaledVec(spark: SparkSession, vecCol: String, scale: Double): Column = {
    VecFunctions.register(spark)
    call_function("graft_scale_q", col(vecCol), lit(scale))
  }

  /** The per-subspace codebooks, collected and flattened [s][c][dsub]
    * in ascending id order (code = rank, 0-based). The codebook table is
    * driver-sized by definition (≤ 256 codes for one-byte storage).
    */
  private def collectCodebook(codebook: DataFrame, idCol: String, vecCol: String,
      m: Int, scale: Double): Array[Long] = {
    val rows = codebook
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .collect().sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).toArray)
    require(rows.nonEmpty && rows.length <= 256,
      s"PQ codebook must have 1..256 entries (one-byte codes), got ${rows.length}")
    val dim = rows.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    val scaled = VecKernels.scaleQLocal(rows, scale)
    // flatten [s][c][dsub]: subspace-major so ksub is derivable in-kernel
    val out = new Array[Long](m * rows.length * dsub)
    var o = 0
    for (s <- 0 until m; c <- rows.indices; i <- 0 until dsub) {
      out(o) = scaled(c)(s * dsub + i); o += 1
    }
    out
  }

  /** (neighbor side) the m codes as ONE array column. */
  private def codesCol(spark: SparkSession, vecCol: String, cbFlat: Array[Long],
      m: Int, scale: Double): Column =
    call_function("graft_pq_codes",
      scaledVec(spark, vecCol, scale), typedLit(cbFlat), lit(m))

  /** Encode the corpus: (id, code_0..code_{m-1}) — each code the argmin
    * (ties → lowest code) over that subspace's codebook. A narrow
    * codegen'd scan; nothing shuffles.
    */
  def encodeWide(corpus: DataFrame, idCol: String, vecCol: String, codebook: DataFrame,
      m: Int = 8, scale: Double = 10000.0): DataFrame = {
    val spark = corpus.sparkSession
    val cbFlat = collectCodebook(codebook, idCol, vecCol, m, scale)
    corpus
      .select(col(idCol).as("id"),
        codesCol(spark, vecCol, cbFlat, m, scale).as("graft_codes"))
      .select((col("id") +: (0 until m).map(s =>
        element_at(col("graft_codes"), s + 1).as(s"code_$s"))): _*)
  }

  /** Long-form encoding (id, sub, code) — the inspection/storage layout
    * the oracle checks row-by-row. In-row unpivot of [[encodeWide]].
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String, codebook: DataFrame,
      m: Int = 8, scale: Double = 10000.0): DataFrame = {
    val wide = encodeWide(corpus, idCol, vecCol, codebook, m, scale)
    val pairs = array((0 until m).map { s =>
      struct(lit(s.toLong).as("sub"), col(s"code_$s").as("code"))
    }: _*)
    wide.select(col("id"), explode(pairs).as("p"))
      .select(col("id"), col("p.sub").as("sub"), col("p.code").as("code"))
  }

  /** ADC top-k: every query precomputes its m×ksub distance table in-row
    * (bounded literals), the corpus side carries only its m codes, and a
    * candidate's distance is the sum of m table lookups. Queries are
    * broadcast; the only wide op is the per-query top-k window over
    * candidate scores. Compose with [[Similarity.ivfTopK]]'s coarse
    * lists to bound the candidate set at scale (IVF-ADC). Output:
    * (query_id, neighbor_id, rnk, adc_dist).
    */
  def adcTopK(corpus: DataFrame, idCol: String, vecCol: String, codebook: DataFrame,
      queries: DataFrame, k: Int, m: Int = 8, scale: Double = 10000.0): DataFrame = {
    val spark = corpus.sparkSession
    val cbFlat = collectCodebook(codebook, idCol, vecCol, m, scale)
    val codes = corpus.select(col(idCol).as("neighbor_id"),
      codesCol(spark, vecCol, cbFlat, m, scale).as("graft_codes"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      call_function("graft_pq_dt",
        scaledVec(spark, vecCol, scale), typedLit(cbFlat), lit(m)).as("graft_dt")))
    val adc = call_function("graft_adc", col("graft_dt"), col("graft_codes"), lit(m))
    val scored = q.join(codes, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), adc.as("adc_dist"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc_dist"), col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("int")).filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("adc_dist"))
  }

  /** ADC top-k with an exact re-rank stage — the standard serving path
    * every production ANN deployment runs (FAISS's refine step): ADC
    * lookups nominate `kCand` candidates per query (cheap, compressed,
    * lossy), then ONLY those candidates are scored with the exact
    * scaled-BIGINT squared-L2 against the raw vectors and the top `k`
    * by exact distance return. Recall@k is bounded below by plain
    * ADC@k (the re-rank permutes a SUPERSET of the ADC top-k by the
    * true metric: any true neighbor ADC put in its top-k is still in
    * the top-kCand, and re-ranking surfaces it — plus any it buried
    * between rank k and kCand).
    *
    * Scale shape: the candidate set is |queries|·kCand rows by
    * construction, so the join back to the raw vectors BROADCASTS the
    * candidates into the corpus scan — the corpus side never shuffles;
    * the only wide op is the per-query top-k window over ≤ kCand rows
    * per query. Ties → (d2, neighbor_id), same as the exact arm of
    * [[adcRecall]]. Output: (query_id, neighbor_id, rnk, d2).
    */
  def adcTopKReranked(corpus: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, queries: DataFrame, k: Int, kCand: Int,
      m: Int = 8, scale: Double = 10000.0): DataFrame = {
    require(k > 0 && kCand >= k,
      s"need kCand >= k >= 1, got k=$k kCand=$kCand")
    val spark = corpus.sparkSession
    val cand = adcTopK(corpus, idCol, vecCol, codebook, queries, kCand, m, scale)
      .select(col("query_id"), col("neighbor_id"))
    val qx = queries.select(col(idCol).as("query_id"),
      scaledVec(spark, vecCol, scale).as("qv"))
    val cx = corpus.select(col(idCol).as("neighbor_id"),
      scaledVec(spark, vecCol, scale).as("nv"))
    // candidates ⋈ query vectors is (|queries|·kCand)-bounded — ride it
    // into the corpus scan as a broadcast; the corpus never moves
    val probe = broadcast(cand.join(qx, Seq("query_id")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("d2"), col("neighbor_id"))
    cx.join(probe, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        call_function("graft_sqdist", col("qv"), col("nv")).as("d2"))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("d2"))
  }

  /** Side-by-side recall@k of plain ADC and ADC+exact-re-rank against
    * the exact ground truth — the table that justifies (or sizes) the
    * re-rank stage: per query, the overlap of each ranking's top-k with
    * the exact scaled-BIGINT top-k, in HALF_UP basis points. By the
    * superset argument on [[adcTopKReranked]], rr_recall_bp ≥
    * adc_recall_bp row-by-row. Output: (query_id, n_adc, n_rr,
    * adc_recall_bp, rr_recall_bp).
    */
  def rerankRecall(corpus: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, queries: DataFrame, k: Int, kCand: Int,
      m: Int = 8, scale: Double = 10000.0): DataFrame = {
    val spark = corpus.sparkSession
    val approx = adcTopK(corpus, idCol, vecCol, codebook, queries, k, m, scale)
      .select(col("query_id"), col("neighbor_id"))
    val rr = adcTopKReranked(corpus, idCol, vecCol, codebook, queries, k, kCand,
        m, scale)
      .select(col("query_id"), col("neighbor_id"))
    val qx = broadcast(queries.select(col(idCol).as("query_id"),
      scaledVec(spark, vecCol, scale).as("qv")))
    val cx = corpus.select(col(idCol).as("neighbor_id"),
      scaledVec(spark, vecCol, scale).as("nv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("d2"), col("neighbor_id"))
    val exact = qx.join(cx, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        call_function("graft_sqdist", col("qv"), col("nv")).as("d2"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"))
    def overlap(got: DataFrame, name: String) =
      exact.join(got, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as(name))
    queries.select(col(idCol).as("query_id"))
      .join(overlap(approx, "n_adc"), Seq("query_id"), "left")
      .join(overlap(rr, "n_rr"), Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_adc"), lit(0L)).as("n_adc"),
        coalesce(col("n_rr"), lit(0L)).as("n_rr"))
      .withColumn("adc_recall_bp", expr(s"(20000 * n_adc + $k) div (2 * $k)"))
      .withColumn("rr_recall_bp", expr(s"(20000 * n_rr + $k) div (2 * $k)"))
  }

  /** Recall@k of ADC against the exact integer squared-L2 top-k — the
    * evaluation every ANN deployment runs before trusting compressed
    * search. Both rankings use the same scaled-BIGINT metric and the
    * same (distance, neighbor_id) tie-break, so the overlap count is
    * engine-exact. recall_bp = overlap·10⁴/k (k divides exactly for the
    * usual k; HALF_UP otherwise). Output: (query_id, n_overlap,
    * recall_bp).
    */
  def adcRecall(corpus: DataFrame, idCol: String, vecCol: String, codebook: DataFrame,
      queries: DataFrame, k: Int, m: Int = 8, scale: Double = 10000.0): DataFrame = {
    val spark = corpus.sparkSession
    val approx = adcTopK(corpus, idCol, vecCol, codebook, queries, k, m, scale)
      .select(col("query_id"), col("neighbor_id"))
    val qx = broadcast(queries.select(col(idCol).as("query_id"),
      scaledVec(spark, vecCol, scale).as("qv")))
    val cx = corpus.select(col(idCol).as("neighbor_id"),
      scaledVec(spark, vecCol, scale).as("nv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("d2"), col("neighbor_id"))
    val exact = qx.join(cx, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        call_function("graft_sqdist", col("qv"), col("nv")).as("d2"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val overlap = exact.join(approx, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_overlap"))
    queries.select(col(idCol).as("query_id")).join(overlap, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("recall_bp", expr(s"(20000 * n_overlap + $k) div (2 * $k)"))
  }

  /** IVF-ADC — the production composition for billion-vector search:
    * the coarse quantizer (cosine rank against the bounded centroid
    * table, literal-embedded) routes every corpus vector into an
    * inverted list, PQ codes compress it to m bytes, and a query probes
    * only its `nProbe` nearest lists, scoring candidates with ADC
    * lookups. The corpus pays ONE narrow in-row scan (coarse assignment
    * + encoding — zero shuffles); the per-query candidate set is the
    * probed lists, not the corpus, and the only wide ops are the
    * cent_id-keyed candidate join (probe side broadcast) and the
    * per-query top-k window. This variant quantizes the full vector
    * (no residual codebooks — the IVFFlat-ADC layout); distances are
    * scaled-BIGINT exact, and the coarse cosines accumulate doubles in
    * index order — bit-identical to the oracles' sum-over-unnest
    * (ties → lowest centroid id). Output: (query_id, neighbor_id, rnk,
    * adc_dist).
    */
  def ivfAdcTopK(corpus: DataFrame, idCol: String, vecCol: String, coarse: DataFrame,
      codebook: DataFrame, queries: DataFrame, k: Int, nProbe: Int,
      m: Int = 8, scale: Double = 10000.0): DataFrame = {
    val spark = corpus.sparkSession
    VecFunctions.register(spark)
    val cents = coarse
      .select(col(idCol).cast("long").as("cent_id"), col(vecCol).as("cv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    require(cents.nonEmpty && cents.length <= (1 << 16),
      s"coarse quantizer must be bounded, got ${cents.length} entries")
    val centsFlat = cents.flatMap(_._2)
    val cids = cents.map(_._1)
    def cosRank(vecC: Column): Column =
      call_function("graft_cos_rank", vecC, typedLit(centsFlat), typedLit(cids))
    val cbFlat = collectCodebook(codebook, idCol, vecCol, m, scale)
    val lists = corpus.select(col(idCol).as("neighbor_id"),
      element_at(cosRank(col(vecCol)), 1).as("cent_id"),
      codesCol(spark, vecCol, cbFlat, m, scale).as("graft_codes"))
    val qProbes = queries
      .select(col(idCol).as("query_id"),
        explode(slice(cosRank(col(vecCol)), 1, nProbe)).as("cent_id"),
        call_function("graft_pq_dt",
          scaledVec(spark, vecCol, scale), typedLit(cbFlat), lit(m)).as("graft_dt"))
    val adc = call_function("graft_adc", col("graft_dt"), col("graft_codes"), lit(m))
    val scored = broadcast(qProbes).join(lists, Seq("cent_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), adc.as("adc_dist"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc_dist"), col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("int")).filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("adc_dist"))
  }

  /** Recall-vs-cost sweep over the IVF probe width — `nprobe` is the
    * first knob every real ANN deployment tunes, and this emits the
    * table that tuning reads: per nprobe, how many candidates were
    * scored (the cost) and the mean recall@k against the exact
    * scaled-BIGINT ground truth (the accuracy). One corpus pass
    * regardless of |nProbes|: candidates are generated ONCE at the
    * widest probe with their probe rank attached, and each narrower
    * setting is a rank filter against the bounded nprobe grid — never
    * a re-scan (candidates appear once per (query, neighbor): a corpus
    * vector lives in exactly one list). The exact ground truth is the
    * eval harness's all-pairs top-k — run it on SAMPLED queries, like
    * every recall eval.
    *
    * Output: (nprobe, n_candidates, n_hits, mean_recall_bp), where
    * mean_recall_bp = HALF_UP(10⁴ · Σ overlap / (k · |queries|)).
    */
  def ivfAdcRecallByNprobe(corpus: DataFrame, idCol: String, vecCol: String,
      coarse: DataFrame, codebook: DataFrame, queries: DataFrame, k: Int,
      nProbes: Seq[Int], m: Int = 8, scale: Double = 10000.0): DataFrame = {
    require(nProbes.nonEmpty && nProbes.forall(_ >= 1) &&
      nProbes == nProbes.sorted && nProbes.distinct == nProbes,
      s"nProbes must be a non-empty ascending distinct positive list, got $nProbes")
    val spark = corpus.sparkSession
    import spark.implicits._
    VecFunctions.register(spark)
    val cents = coarse
      .select(col(idCol).cast("long").as("cent_id"), col(vecCol).as("cv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    require(cents.nonEmpty && cents.length <= (1 << 16),
      s"coarse quantizer must be bounded, got ${cents.length} entries")
    val centsFlat = cents.flatMap(_._2)
    val cids = cents.map(_._1)
    def cosRank(vecC: Column): Column =
      call_function("graft_cos_rank", vecC, typedLit(centsFlat), typedLit(cids))
    val cbFlat = collectCodebook(codebook, idCol, vecCol, m, scale)
    val maxNp = math.min(nProbes.max, cents.length)
    val lists = corpus.select(col(idCol).as("neighbor_id"),
      element_at(cosRank(col(vecCol)), 1).as("cent_id"),
      codesCol(spark, vecCol, cbFlat, m, scale).as("graft_codes"))
    val qProbes = queries.select(col(idCol).as("query_id"),
      posexplode(slice(cosRank(col(vecCol)), 1, maxNp)).as(Seq("graft_pos", "cent_id")),
      call_function("graft_pq_dt",
        scaledVec(spark, vecCol, scale), typedLit(cbFlat), lit(m)).as("graft_dt"))
    val adc = call_function("graft_adc", col("graft_dt"), col("graft_codes"), lit(m))
    val grid = nProbes.map(_.toLong).toDF("nprobe")
    // bounded (candidates × |grid|), feeds the cost count AND the rank
    // window — persist so the probe join runs once
    val cand = CacheRegistry.persist(
      broadcast(qProbes).join(lists, Seq("cent_id"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), (col("graft_pos") + 1).as("probe_rank"),
          col("neighbor_id"), adc.as("adc_dist"))
        .join(broadcast(grid), col("probe_rank") <= col("nprobe")))
    val stats = cand.groupBy(col("nprobe"))
      .agg(count(lit(1)).as("n_candidates"))
    val wNp = Window.partitionBy(col("nprobe"), col("query_id"))
      .orderBy(col("adc_dist"), col("neighbor_id"))
    val topk = cand.withColumn("rnk", row_number().over(wNp))
      .filter(col("rnk") <= k)
      .select(col("nprobe"), col("query_id"), col("neighbor_id"))
    val qx = broadcast(queries.select(col(idCol).as("query_id"),
      scaledVec(spark, vecCol, scale).as("qv")))
    val cx = corpus.select(col(idCol).as("neighbor_id"),
      scaledVec(spark, vecCol, scale).as("nv"))
    val wEx = Window.partitionBy(col("query_id")).orderBy(col("d2"), col("neighbor_id"))
    val exact = qx.join(cx, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        call_function("graft_sqdist", col("qv"), col("nv")).as("d2"))
      .withColumn("rn", row_number().over(wEx)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"))
    // exact is ≤ k·|queries| rows and the sweep aggregates are ≤
    // |nProbes| rows — all provably bounded, so broadcast them rather
    // than letting the pre-AQE plan stage sort-merge joins
    val hits = topk.join(broadcast(exact), Seq("query_id", "neighbor_id"))
      .groupBy(col("nprobe")).agg(count(lit(1)).as("n_hits"))
    val nq = queries.agg(count(lit(1)).as("graft_nq"))
    grid.crossJoin(broadcast(nq))
      .join(broadcast(stats), Seq("nprobe"), "left")
      .join(broadcast(hits), Seq("nprobe"), "left")
      .select(col("nprobe"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr(s"(20000 * coalesce(n_hits, 0L) + $k * graft_nq) DIV (2 * $k * graft_nq)")
          .as("mean_recall_bp"))
  }
}
