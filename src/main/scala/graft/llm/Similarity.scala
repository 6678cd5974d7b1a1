package graft.llm

import graft.functions.VecFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - `cosineTopK`: brute-force exact top-k — the baseline. The query set
  *    is broadcast (small); the corpus side streams, so the plan is one
  *    broadcast join + per-query top-k window.
  *  - `lshTopK`: the scale path — md5-seeded random hyperplanes bucket
  *    the corpus; candidates share a bucket, so per-query work drops from
  *    O(N) to O(bucket). Planes are deterministic (seeded hashes), making
  *    results reproducible across engines and runs.
  *
  * All per-row/per-pair vector math goes through the
  * [[graft.functions.VecKernels]] codegen'd kernel expressions (static
  * primitive-array loops, one call in generated code). The
  * `aggregate(zip_with(...))` higher-order forms they replace are
  * CodegenFallback — interpreted per PAIR on the join hot paths, with
  * per-element lambda dispatch — and the k-way variants (assignment,
  * silhouette) either allocated per-row arrays in a UDF or blew the
  * 64 KB codegen method limit when unrolled. The kernels accumulate
  * doubles in the same index order from 0.0, so scores are bit-identical
  * to the old forms and to the DuckDB oracles' sum-over-unnest.
  */
object Similarity {

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    call_function("graft_dot", a, b)

  private def norm(a: org.apache.spark.sql.Column) =
    call_function("graft_norm", a)

  /** Exact top-k cosine neighbors for each query id. Output:
    * (query_id, neighbor_id, rank, score).
    *
    * Q×N by CONTRACT: the query side rides as a broadcast against one
    * corpus scan, which is the right brute-force shape only while Q is
    * bounded (eval probes, recall checks). `maxQueries` enforces that
    * contract INSIDE the plan: a limit-bounded count of the query
    * frame rides into the query-side norm column, which raises the
    * contract error at execution when the count exceeds the cap.
    * Construction stays lazy (no eager job; plan-only inspection is
    * side-effect-free), and because the guard lives in a column the
    * score NEEDS, column pruning cannot optimize it away (an unused
    * assert_true projection gets pruned — verified). For large query
    * sets use [[lshBucket]]/IVF ANN.
    */
  def cosineTopK(corpus: DataFrame, idCol: String, vecCol: String, queries: DataFrame,
                 k: Int, maxQueries: Long = 100000L): DataFrame = {
    require(maxQueries > 0 && maxQueries < Int.MaxValue,
      s"maxQueries must be in (0, Int.MaxValue), got $maxQueries")
    VecFunctions.register(corpus.sparkSession)
    val nq = broadcast(queries.limit(maxQueries.toInt + 1)
      .select(count(lit(1)).as("graft_nq")))
    // norms are computed ONCE per vector before the cross join (same
    // doubles — sqrt(dot(a,a)) is deterministic — but N+Q norm passes
    // instead of N*Q: at corpus scale this halves the FLOPs per pair)
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        norm(col(vecCol)).as("graft_qn0"))
      .crossJoin(nq)
      .select(col("query_id"), col("qv"),
        when(col("graft_nq") <= maxQueries, col("graft_qn0"))
          .otherwise(raise_error(lit(
            s"cosineTopK query side exceeds $maxQueries rows — brute force is Q×N " +
              "by contract; use the LSH/IVF ANN operators for large query sets"))
            .cast("double"))
          .as("qn")))
    // a zero-norm vector scores NaN against every query, and NaN
    // orders ABOVE every real score — one padding row would otherwise
    // consume a top-k slot for every query (oracles carry the same
    // nrm <> 0 guard)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
      norm(col(vecCol)).as("nn"))
      .filter(col("nn") =!= 0.0)
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Hard-negative mining for contrastive/embedding training: per
    * labeled query, the `k` most-similar corpus vectors whose label
    * DIFFERS — the near-the-margin negatives that make a triplet/
    * InfoNCE batch informative (random negatives are trivially far;
    * the hardest ones carry the gradient). Same Q×N brute-force
    * contract and (score desc, id) ordering as [[cosineTopK]], with
    * the label disagreement as an extra join predicate; at scale run
    * it over ANN candidates instead (compose with the IVF lists).
    * The contract is ENFORCED the same way cosineTopK enforces it: a
    * limit-bounded count of the query frame rides into the query-side
    * norm column and raises the contract error in-plan when the query
    * side exceeds `maxQueries` — an oversized frame errors instead of
    * OOMing the broadcast. Zero-norm corpus rows are excluded (NaN
    * guard, as everywhere). Output: (query_id, query_label,
    * neighbor_id, neighbor_label, rank, score).
    */
  def hardNegatives(corpus: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, queries: DataFrame, k: Int,
                    maxQueries: Long = 100000L): DataFrame = {
    require(maxQueries > 0 && maxQueries < Int.MaxValue,
      s"maxQueries must be in (0, Int.MaxValue), got $maxQueries")
    VecFunctions.register(corpus.sparkSession)
    val nq = broadcast(queries.limit(maxQueries.toInt + 1)
      .select(count(lit(1)).as("graft_nq")))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(labelCol).cast("long").as("query_label"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("graft_qn0"))
      .crossJoin(nq)
      .select(col("query_id"), col("query_label"), col("qv"),
        when(col("graft_nq") <= maxQueries, col("graft_qn0"))
          .otherwise(raise_error(lit(
            s"hardNegatives query side exceeds $maxQueries rows — brute force is " +
              "Q×N by contract; mine over ANN candidates for large query sets"))
            .cast("double"))
          .as("qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
        col(labelCol).cast("long").as("neighbor_label"), col(vecCol).as("nv"),
        norm(col(vecCol)).as("nn"))
      .filter(col("nn") =!= 0.0)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id") &&
        col("query_label") =!= col("neighbor_label"))
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"),
        (dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic ±1 hyperplane component for (plane j, dim i): the low
    * bit of md5(j || ':' || i) — computed on the driver (the plane
    * matrix is nPlanes×64 constants) with the same md5 the SQL engines
    * evaluate, so the embedded literals are bit-identical to the
    * expression form the oracles replicate.
    */
  private def planeComponent(j: Int, i: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (((d(0) >> 4) & 0xf) % 2 == 1) 1.0 else -1.0
  }

  /** Sign-random-projection bucket key over `nPlanes` hyperplanes. The
    * plane matrix rides into the plan as a literal and all nPlanes
    * projections run in ONE kernel call (doubles folded in index order —
    * the same summation order as the engines' sum-over-unnest), so
    * bucket assignment is a narrow codegen'd scan — ZERO shuffles, where
    * the posexplode + plane-join + two-groupBy form shuffled the
    * exploded corpus twice.
    */
  def lshBucket(df: DataFrame, idCol: String, vecCol: String, nPlanes: Int,
                dim: Int = 64): DataFrame = {
    require(nPlanes > 0 && nPlanes <= 60, s"nPlanes $nPlanes outside (0, 60]")
    require(dim > 0, s"dim must be positive, got $dim")
    VecFunctions.register(df.sparkSession)
    // the plane matrix must match the embedding dimensionality — the
    // kernel cross-checks the row length and fails loudly on mismatch
    // (a silently wrong nPlanes derivation would bucket everything
    // together and degrade the ANN joins to quadratic)
    val planesFlat =
      (0 until nPlanes).flatMap(j => (0 until dim).map(i => planeComponent(j, i))).toArray
    df.select(col(idCol).as("id"),
      call_function("graft_lsh_bucket", col(vecCol), typedLit(planesFlat)).as("bucket"))
  }

  /** Embedding-cosine near-duplicate pairs: (id_a, id_b, score) for all
    * pairs with cosine >= minScore that share a sign-LSH bucket. The
    * bucket join is the scale path — pairwise work is O(sum of bucket
    * sizes squared), not O(N^2); near-identical vectors project to
    * near-identical signs, so recall for true near-dups is high. The
    * threshold should sit far from the corpus similarity mass (e.g. 0.99
    * against a ~0.5 background) so float ordering can't flip membership.
    */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      nPlanes: Int, minScore: Double, dim: Int = 64): DataFrame = {
    VecFunctions.register(corpus.sparkSession)
    val buckets = lshBucket(corpus, idCol, vecCol, nPlanes, dim)
    // both sides of the pair join read this — persist or the whole
    // bucket computation (2 shuffles) runs twice. Cache lifecycle:
    // [[CacheRegistry]] — release after materializing.
    val withBucket = CacheRegistry.persist(
      corpus.join(buckets, corpus(idCol) === buckets("id"))
        // drop by REFERENCE: a plain drop("id") would also remove the
        // caller's id column when idCol itself is named "id"
        .drop(buckets("id")))
    val a = withBucket.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("va"),
      norm(col(vecCol)).as("na"))
    val b = withBucket.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("vb"),
      norm(col(vecCol)).as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("score"))
      .filter(col("score") >= minScore)
  }

  /** IVF (inverted-file) ANN: assign every corpus vector to its nearest
    * centroid (the coarse codebook — here any small centroid table; at
    * scale the output of a k-means job), then search a query only in the
    * lists of its `nProbe` nearest centroids.
    *
    * Scale shape: assignment is a broadcast of the codebook + one
    * map-side-combinable argmax groupBy (no window sort over the corpus);
    * probing broadcasts the (tiny) probe set so candidate generation is
    * shuffle-free on the corpus side. Output: (query_id, neighbor_id,
    * rank, score).
    */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, queries: DataFrame, k: Int, nProbe: Int): DataFrame = {
    VecFunctions.register(corpus.sparkSession)
    def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      dot(a, b) / (norm(a) * norm(b))
    // A coarse-quantizer codebook is bounded by construction (a k-means
    // output, 2^8..2^16 entries), so it rides into the plan as an array
    // literal and the inverted-list assignment is a PER-ROW cosine rank
    // in one kernel call — a narrow codegen'd scan. The groupBy-argmax
    // formulation this replaces shuffled the corpus twice (N×C-row
    // aggregate + re-join); at 100 TB the assignment pass now costs one
    // scan, zero exchanges.
    val cents = centroids
      .select(col(idCol).cast("long").as("cent_id"), col(vecCol).as("cv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    require(cents.nonEmpty && cents.length <= (1 << 16),
      s"codebook must be a bounded coarse quantizer, got ${cents.length} entries")
    // cosine rank: ids descending by score, ties -> lowest centroid id
    // (the same order as sorting (cs, -cent_id) structs)
    def rank(v: org.apache.spark.sql.Column) =
      call_function("graft_cos_rank", v,
        typedLit(cents.flatMap(_._2)), typedLit(cents.map(_._1)))
    val lists = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
      .withColumn("cent_id", element_at(rank(col("nv")), 1))
    // probe set: nProbe nearest centroids per query, in-row as well
    val qProbes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(slice(rank(col("qv")), 1, nProbe)).as("cent_id"))
    val scored = broadcast(qProbes).join(lists, Seq("cent_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cos(col("qv"), col("nv")).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Bucketed ANN: exact cosine top-k but only within the query's LSH
    * bucket. Output: (query_id, neighbor_id, rank, score).
    */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String, queries: DataFrame,
      k: Int, nPlanes: Int, dim: Int = 64): DataFrame = {
    VecFunctions.register(corpus.sparkSession)
    val buckets = lshBucket(corpus, idCol, vecCol, nPlanes, dim)
    // feeds both the broadcast query side and the candidate side. Cache
    // lifecycle: [[CacheRegistry]] — release after materializing.
    val withBucket = CacheRegistry.persist(
      corpus.join(buckets, corpus(idCol) === buckets("id"))
        // drop by REFERENCE: a plain drop("id") would also remove the
        // caller's id column when idCol itself is named "id"
        .drop(buckets("id")))
    val q = broadcast(withBucket
      .join(queries.select(col(idCol).as("qid")), col(idCol) === col("qid"))
      .select(col("qid").as("query_id"), col(vecCol).as("qv"), col("bucket"),
        norm(col(vecCol)).as("qn")))
    val c = withBucket.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"), col("bucket"),
      norm(col(vecCol)).as("nn"))
      .filter(col("nn") =!= 0.0) // zero-norm: NaN score would rank first
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic symmetric int8 quantization per vector (the storage/
    * bandwidth reduction step before ANN serving): scale = max |x|,
    * q_i = round(x_i * 127 / scale); a zero vector quantizes to zeros.
    * Emits the quantized codes as a comma-joined string alongside the
    * L2 norm and scale. Pure per-row array expressions — a shuffle-free
    * narrow pass at any corpus size.
    */
  /** Per-dimension corpus statistics (the normalization profile computed
    * before whitening/quantizing an embedding table): n, mean, std for
    * each vector position. Elements are scaled to integers
    * (round(x·10⁷)) at the scan, so the distributed sums are EXACT
    * (order-independent) — the float-sum nondeterminism of a naive
    * avg/stddev over doubles never enters; mean/std then derive from the
    * exact sums via IEEE-exactly-rounded double ops (+,−,·,/,sqrt only),
    * reproducible on any engine. One map-side-combinable aggregation of
    * (dim, scaled) pairs — shuffle width is the dimensionality.
    * Returns (dim 0-based, n, mean round-4, std round-4) in ORIGINAL
    * units.
    */
  def dimStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"),
        expr("CAST(round(CAST(x AS DOUBLE) * 10000000.0D) AS BIGINT)").as("scaled"))
      // accumulate in decimal(38,0), matching the oracle's hugeint-width
      // sums: squaring in LONG would wrap silently (ANSI off) once
      // |x| ≳ 303 (scaled² > 2⁶³), and s1 can overflow LONG at extreme n —
      // either would quietly break the exactness contract at scale
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("scaled").cast("decimal(38,0)")).cast("decimal(38,0)").as("s1"),
        sum(col("scaled").cast("decimal(38,0)") * col("scaled").cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("s2"))
      .select(col("dim"), col("n"),
        round(col("s1").cast("double") / col("n").cast("double") / lit(1.0e7), 4).as("mean"),
        // greatest(·, 0): exact-sum variance is mathematically ≥ 0 but
        // the double evaluation can land an ulp below zero → NaN sqrt
        round(
          sqrt(greatest(
            (col("s2").cast("double") / col("n").cast("double")) -
              (col("s1").cast("double") / col("n").cast("double")) *
                (col("s1").cast("double") / col("n").cast("double")),
            lit(0.0))) / lit(1.0e7),
          4).as("std"))

  /** Exact upper-triangle covariance of the embedding dimensions — the
    * input to whitening / PCA before quantization or ANN indexing (a
    * correlated embedding space wastes PQ codebook entropy; whitening
    * needs Σ). Elements are scaled to round(x·scale) BIGINTs at the scan
    * ([[graft.functions.VecKernels.scaleQ]]), every (i ≤ j) pair expands
    * IN-ROW, and one map-side-combinable aggregation accumulates
    * (n, Σxᵢ, Σxⱼ, Σxᵢxⱼ) in decimal(38,0) — exact at any corpus size,
    * order-free, matching DuckDB's hugeint sums. The covariance comes
    * out in integer micro-units via HALF_UP division: with scale=10⁴,
    * cov·10⁶ = (n·Σxᵢxⱼ − Σxᵢ·Σxⱼ) / (100·n²) exactly. Post-shuffle
    * volume is d(d+1)/2 cells — never corpus-shaped. Output:
    * (di, dj, n, cov_u).
    */
  /** HALF_UP micro-unit covariance over (n, graft_si, graft_sj,
    * graft_sij). The divisor 200·n² is computed in decimal(38,0): as
    * BIGINT it overflows above n ≈ 2.1e8 rows — well inside 100 TB
    * territory. Exposed for the overflow unit test.
    */
  private[graft] val covUExpr: String =
    """CAST(CASE WHEN n * graft_sij - graft_si * graft_sj < 0 THEN -1 ELSE 1 END *
      |  ((2 * abs(n * graft_sij - graft_si * graft_sj)
      |      + 100 * CAST(n AS DECIMAL(38,0)) * n)
      |    DIV (200 * CAST(n AS DECIMAL(38,0)) * n)) AS BIGINT)""".stripMargin

  def embedCovariance(df: DataFrame, vecCol: String, scale: Double = 10000.0): DataFrame = {
    VecFunctions.register(df.sparkSession)
    graft.functions.TriCellFunctions.register(df.sparkSession)
    // Fused cell aggregation ([[graft.functions.TriCellAgg]]): one call
    // per row accumulates all d(d+1)/2 cells into a partition-local
    // 128-bit integer buffer — replacing the explode of n·d(d+1)/2
    // four-field structs plus a (di, dj)-keyed decimal hash-aggregation
    // (measured 2.7 s → 0.16 s at sf0.1, d=64; the explode form's
    // per-row struct allocation dominated, and at one input file the
    // whole expansion ran inside a single scan task). Counts and
    // per-dim sums are tracked per distinct vector length, so ragged
    // inputs produce the exact grouped-explode values; products are
    // exact 128-bit integers emitted as decimal(38,0) — the identical
    // value domain as the decimal sums this replaces.
    df.select(call_function("graft_scale_q", col(vecCol), lit(scale)).as("graft_sv"))
      .agg(call_function("graft_cov_cells", col("graft_sv")).as("graft_cells"))
      .select(explode(col("graft_cells")).as("p"))
      .select(col("p.di").as("di"), col("p.dj").as("dj"), col("p.n").as("n"),
        col("p.graft_si").as("graft_si"), col("p.graft_sj").as("graft_sj"),
        col("p.graft_sij").as("graft_sij"))
      .select(col("di"), col("dj"), col("n"), expr(covUExpr).as("cov_u"))
  }

  /** Spearman rank-correlation matrix between embedding dimensions —
    * the MONOTONE-dependence companion to [[embedCovariance]] (Pearson
    * on ranks; robust to the heavy tails and nonlinear warps real
    * embedding dims carry). Fully integer and engine-reproducible:
    * values quantize through `graft_scale_q` and rank by (scaled
    * value, id) — a total order, so ties break identically on any
    * engine — then the tie-free formula ρ = 1 − 6·Σd²/(n(n²−1)) is an
    * exact rational, emitted as HALF_UP milli. (With the (v, id)
    * tie-break, equal values get consecutive distinct ranks instead of
    * averaged ranks — the deterministic convention; document, don't
    * average.)
    *
    * Scale shape: one per-dim rank window (a per-key sort, D keys —
    * the honest cost of ranks), one id-keyed collect of each row's
    * D-length rank vector, then the q136-style IN-ROW upper-triangle
    * expansion (×D(D−1)/2 row blowup) into a map-side-combinable sum.
    * Divisor n(n²−1) runs in decimal(38,0): BIGINT overflows at
    * n ≈ 2.1e6 rows. Output: (di, dj, n, spearman_milli) for i < j.
    */
  def spearmanMatrix(df: DataFrame, idCol: String, vecCol: String,
                     scale: Double = 10000.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    VecFunctions.register(df.sparkSession)
    val ex = df.select(col(idCol).as("graft_id"),
      posexplode(call_function("graft_scale_q", col(vecCol), lit(scale)))
        .as(Seq("graft_dim", "graft_x")))
    val w = Window.partitionBy(col("graft_dim"))
      .orderBy(col("graft_x"), col("graft_id"))
    val ranked = ex.withColumn("graft_r", row_number().over(w).cast("long"))
    val vecs = ranked.groupBy(col("graft_id"))
      .agg(array_sort(collect_list(struct(col("graft_dim"), col("graft_r"))))
        .as("graft_rv"))
      .select(expr("transform(graft_rv, e -> e.graft_r)").as("rv"))
    // Fused d² cell aggregation (the embedCovariance rewrite, squared-
    // differences mode): one [[graft.functions.TriCellAgg]] call per row
    // replaces the n·d(d−1)/2 struct explode + decimal hash-aggregation;
    // the per-pair difference stays wrapping long arithmetic (exactly
    // the SQL `a - b` the explode form computed) and the square/sum run
    // exact 128-bit, emitted as the same decimal(38,0).
    graft.functions.TriCellFunctions.register(df.sparkSession)
    vecs.agg(call_function("graft_d2_cells", col("rv")).as("graft_cells"))
      .select(explode(col("graft_cells")).as("p"))
      .select(col("p.di").as("di"), col("p.dj").as("dj"), col("p.n").as("n"),
        col("p.graft_s").as("graft_s"))
      .select(col("di"), col("dj"), col("n"), expr(
        """CAST(CASE WHEN CAST(n AS DECIMAL(38,0)) * n * n - n - 6 * graft_s < 0
          |  THEN -1 ELSE 1 END *
          |  ((2000 * abs(CAST(n AS DECIMAL(38,0)) * n * n - n - 6 * graft_s)
          |      + (CAST(n AS DECIMAL(38,0)) * n * n - n))
          |    DIV (2 * (CAST(n AS DECIMAL(38,0)) * n * n - n))) AS BIGINT)"""
          .stripMargin).as("spearman_milli"))
  }

  /** Top principal direction of the embedding cloud via deterministic
    * integer power iteration on the [[embedCovariance]] matrix — the
    * first PCA component, the thing you inspect before whitening /
    * dimensionality reduction (and the dominant-direction diagnostic
    * for anisotropic embedding spaces, Mu et al. 2018's "all-but-the-
    * top"). The distributed work is exactly the covariance pass (one
    * map-side-combinable d²-cell aggregation over the corpus); the
    * iteration itself runs on the driver over the d(d+1)/2-bounded
    * cell table in BigInt — the PageRank-driver precedent: collecting
    * a DIMENSIONALITY-bounded frame, never corpus rows.
    *
    * Determinism: start vector all-10000, `iters` fixed iterations of
    * u = C·v followed by HALF_UP rescale to max|u| = 10000 (if u = 0
    * the vector collapses to 0 and stays there), final global sign
    * fixed so the lowest-indexed nonzero loading is positive. Every
    * step is integer arithmetic an oracle replays bit-for-bit.
    * Output: (dim, loading_bp) — loadings in [-10000, 10000].
    */
  def topEigenvector(df: DataFrame, vecCol: String, iters: Int = 8,
                     scale: Double = 10000.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    eigenvectorChain(df, vecCol, 1, iters, scale).head
      .zipWithIndex.map { case (x, i) => (i.toLong, x) }.toSeq
      .toDF("dim", "loading_bp")
  }

  /** Top-r principal directions via power iteration WITH DEFLATION —
    * the subspace form of [[topEigenvector]] (Mu et al.'s
    * all-but-the-top removes the top r directions, not just one; PCA
    * whitening wants the same chain). After each component the
    * covariance is deflated by the classic Hotelling step
    * C' = C − (vᵀCv)·v·vᵀ/(vᵀv)², every entry once-rounded signed
    * HALF_UP — fully integer, so an oracle replays the chain
    * bit-for-bit (the rounded deflation makes later components exact
    * under REPLAY rather than exactly orthogonal; determinism is the
    * contract, orthogonality holds to rounding error). Distributed
    * work: the ONE covariance pass; the r·iters iteration runs on the
    * d²-bounded cell table in driver BigInt.
    * Output: (component 1..r, dim, loading_bp).
    */
  def topEigenvectors(df: DataFrame, vecCol: String, r: Int,
                      iters: Int = 8, scale: Double = 10000.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    eigenvectorChain(df, vecCol, r, iters, scale).zipWithIndex.flatMap {
      case (v, c) => v.zipWithIndex.map { case (x, i) =>
        ((c + 1).toLong, i.toLong, x) }
    }.toSeq.toDF("component", "dim", "loading_bp")
  }

  /** The shared driver core: collect the covariance cells once, then r
    * rounds of (power-iterate, sign-fix, deflate). Exposed package-
    * private so the projection operators reuse the exact same chain.
    */
  private[graft] def eigenvectorChain(df: DataFrame, vecCol: String, r: Int,
      iters: Int, scale: Double): Seq[Array[Long]] = {
    require(iters >= 1 && iters <= 64, s"iters must be in [1,64], got $iters")
    require(r >= 1 && r <= 64, s"r must be in [1,64], got $r")
    val cells = embedCovariance(df, vecCol, scale)
      .select(col("di"), col("dj"), col("cov_u")).collect()
      .map(row => (row.getLong(0).toInt, row.getLong(1).toInt, BigInt(row.getLong(2))))
    // dims²-bounded collect (d ≤ 1448 ⇒ ≤ ~1M cells), the assignClusters
    // codebook-guard pattern — never corpus-shaped
    require(cells.nonEmpty && cells.length <= (1 << 20),
      s"covariance must be dimension-bounded, got ${cells.length} cells")
    val d = cells.iterator.map(_._2).max + 1
    val C = Array.ofDim[BigInt](d, d)
    for (i <- 0 until d; j <- 0 until d) C(i)(j) = BigInt(0)
    cells.foreach { case (i, j, c) => C(i)(j) = c; C(j)(i) = c }
    val S = BigInt(10000)
    def halfUpSigned(x: BigInt, m: BigInt): BigInt =
      BigInt(x.signum) * ((2 * x.abs + m) / (2 * m))
    (1 to r).map { _ =>
      var v = Array.fill(d)(S)
      for (_ <- 1 to iters) {
        val u = Array.tabulate(d) { i =>
          var acc = BigInt(0); var j = 0
          while (j < d) { acc += C(i)(j) * v(j); j += 1 }
          acc
        }
        val m = u.iterator.map(_.abs).max
        v = if (m == 0) u
            else u.map(x => BigInt(x.signum) * ((2 * x.abs * S + m) / (2 * m)))
      }
      val firstNz = v.indexWhere(_ != 0)
      if (firstNz >= 0 && v(firstNz) < 0) v = v.map(x => -x)
      // Hotelling deflation: C -= (vᵀCv)·v·vᵀ/(vᵀv)², each cell signed
      // HALF_UP — den² and num·vᵢ·vⱼ are exact BigInt (HUGEINT-sized)
      val num = {
        var acc = BigInt(0)
        for (i <- 0 until d; j <- 0 until d) acc += v(i) * C(i)(j) * v(j)
        acc
      }
      val den = v.iterator.map(x => x * x).sum
      if (den != 0) {
        val den2 = den * den
        for (i <- 0 until d; j <- 0 until d)
          C(i)(j) -= halfUpSigned(num * v(i) * v(j), den2)
      }
      v.map(_.toLong)
    }
  }

  /** Project every embedding onto the [[topEigenvector]] direction and
    * report how much of its energy lies OFF that axis — the per-row
    * companion to the dominant-direction diagnostic (Mu et al.'s
    * all-but-the-top: rows with tiny residuals are "the common
    * direction" and carry little discriminative signal). Integer-exact
    * end to end: dot = Σ xᵢ·vᵢ over the scaled ints and the signed
    * loadings, norm² likewise, and residual_micro = HALF_UP(10⁶·
    * (norm²·|v|² − dot²)/(norm²·|v|²)) — the off-axis energy fraction
    * — computed in decimal(38,0) (norm²·|v|² overflows BIGINT at
    * realistic magnitudes). Zero-norm rows report NULL. The loading
    * vector rides as a literal in the task closure (the assignClusters
    * centroid-literal pattern): the projection pass is a narrow
    * codegen'd scan, zero shuffles. Output: (id, dot, norm2,
    * residual_micro).
    */
  def pcaProjection(df: DataFrame, idCol: String, vecCol: String,
                    iters: Int = 8, scale: Double = 10000.0): DataFrame = {
    val v = topEigenvector(df, vecCol, iters, scale)
      .orderBy("dim").collect().map(_.getLong(1))
    VecFunctions.register(df.sparkSession)
    val vLit = typedLit(v.toSeq)
    df.select(col(idCol).as("id"),
        call_function("graft_scale_q", col(vecCol), lit(scale)).as("graft_sv"))
      .withColumn("graft_v", vLit)
      .withColumn("dot", expr(
        """aggregate(zip_with(graft_sv, graft_v, (a, b) -> a * b),
          |CAST(0 AS BIGINT), (acc, e) -> acc + e)""".stripMargin))
      .withColumn("norm2", expr(
        """aggregate(graft_sv, CAST(0 AS BIGINT),
          |(acc, e) -> acc + e * e)""".stripMargin))
      .withColumn("graft_v2", expr(
        """aggregate(graft_v, CAST(0 AS BIGINT),
          |(acc, e) -> acc + e * e)""".stripMargin))
      .withColumn("residual_micro", expr(
        """CASE WHEN norm2 > 0 AND graft_v2 > 0 THEN
          |CAST((2000000 * (CAST(norm2 AS DECIMAL(38,0)) * graft_v2
          |                 - CAST(dot AS DECIMAL(38,0)) * dot)
          |      + (CAST(norm2 AS DECIMAL(38,0)) * graft_v2))
          |  DIV (2 * CAST(norm2 AS DECIMAL(38,0)) * graft_v2) AS BIGINT)
          |ELSE CAST(NULL AS BIGINT) END""".stripMargin))
      .select(col("id"), col("dot"), col("norm2"), col("residual_micro"))
  }

  /** Per-row energy decomposition over the top-r PCA SUBSPACE — the
    * r > 1 extension of [[pcaProjection]] (Mu et al.'s all-but-the-top
    * removes a subspace, so the diagnostic needs per-component
    * energies, not one axis). For each row: e_c = HALF_UP(10⁶ ·
    * dot_c² / (norm²·|v_c|²)) per component c of the
    * [[eigenvectorChain]], and off_micro = 10⁶ − Σ e_c — the energy
    * outside the subspace (up to per-component HALF_UP rounding and
    * the chain's rounded-deflation near-orthogonality; tiny negatives
    * are possible and documented rather than clamped). Zero-norm rows
    * report NULLs. The loading vectors ride as literals — the
    * projection pass is a narrow zero-shuffle scan. Output: (id,
    * e1_micro..e{r}_micro, off_micro).
    */
  def pcaSubspaceResidual(df: DataFrame, idCol: String, vecCol: String,
                          r: Int, iters: Int = 8,
                          scale: Double = 10000.0): DataFrame = {
    val chain = eigenvectorChain(df, vecCol, r, iters, scale)
    VecFunctions.register(df.sparkSession)
    var out = df.select(col(idCol).as("id"),
        call_function("graft_scale_q", col(vecCol), lit(scale)).as("graft_sv"))
      .withColumn("norm2", expr(
        "aggregate(graft_sv, CAST(0 AS BIGINT), (acc, e) -> acc + e * e)"))
    chain.zipWithIndex.foreach { case (v, ci) =>
      val c = ci + 1
      val v2 = v.iterator.map(x => x * x).sum // ≤ d·S² = 6.4e9 at d=64
      out = out
        .withColumn(s"graft_v$c", typedLit(v.toSeq))
        .withColumn(s"graft_dot$c", expr(
          s"""aggregate(zip_with(graft_sv, graft_v$c, (a, b) -> a * b),
             |CAST(0 AS BIGINT), (acc, e) -> acc + e)""".stripMargin))
        .withColumn(s"e${c}_micro", expr(
          s"""CASE WHEN norm2 > 0 AND ${v2}L > 0 THEN
             |CAST((2000000 * CAST(graft_dot$c AS DECIMAL(38,0)) * graft_dot$c
             |      + (CAST(norm2 AS DECIMAL(38,0)) * ${v2}L))
             |  DIV (2 * CAST(norm2 AS DECIMAL(38,0)) * ${v2}L) AS BIGINT)
             |ELSE CAST(NULL AS BIGINT) END""".stripMargin))
    }
    val off = (1 to r).map(c => col(s"e${c}_micro"))
      .foldLeft(lit(1000000L).cast("long"))(_ - _)
    out.withColumn("off_micro", off)
      .select((col("id") +: (1 to r).map(c => col(s"e${c}_micro"))) :+
        col("off_micro"): _*)
  }

  /** Apply per-dimension whitening — the normalization step between
    * [[dimStats]]/[[embedCovariance]] (which measure the embedding
    * space) and quantization/ANN indexing (which assume it is
    * standardized). The z-score reduces EXACTLY: with x_sc = round(x·s),
    * (x − mean)/std = (n·x_sc − Σx_sc) / √(n·Σx_sc² − (Σx_sc)²) — the
    * scale cancels, the numerator and radicand are exact integers
    * (decimal(38,0) ≡ hugeint), and only the final divide/sqrt/round-4
    * run in IEEE doubles (the q68 precedent; sqrt output makes decimal
    * half-ties unreachable). A zero-variance dimension whitens to 0.
    *
    * Scale shape: one (dim)-keyed map-side-combinable stats agg
    * (post-shuffle volume = dimensionality), stats broadcast back onto
    * the exploded corpus; the exploded stream feeds both — persisted via
    * [[CacheRegistry]]. Output: (id, dim, w_r4).
    */
  def whiten(df: DataFrame, idCol: String, vecCol: String,
      scale: Double = 10000.0): DataFrame = {
    VecFunctions.register(df.sparkSession)
    val ex = CacheRegistry.persist(
      df.select(col(idCol).as("id"),
        posexplode(call_function("graft_scale_q", col(vecCol), lit(scale)))
          .as(Seq("dim", "xsc")))
        .select(col("id"), col("dim").cast("long").as("dim"), col("xsc")))
    val stats = ex.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("xsc").cast("decimal(38,0)")).cast("decimal(38,0)").as("graft_s1"),
        sum(col("xsc").cast("decimal(38,0)") * col("xsc").cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("graft_s2"))
    ex.join(broadcast(stats), Seq("dim"))
      .select(col("id"), col("dim"),
        expr("""CASE WHEN n * graft_s2 - graft_s1 * graft_s1 <= 0 THEN 0.0D
               |  ELSE round(CAST(n * xsc - graft_s1 AS DOUBLE) /
               |             sqrt(CAST(n * graft_s2 - graft_s1 * graft_s1 AS DOUBLE)), 4)
               |END""".stripMargin).as("w_r4"))
  }

  /** Per-group embedding outlier quarantine: quantize each vector to
    * exact integer milli-units (round(x·10³) — the q59 parity idiom),
    * form each group's integer centroid (signed-HALF_UP per-dimension
    * mean), and emit the `k` vectors FARTHEST from their group centroid
    * by exact squared L2 — the mislabeled/garbage candidates a curation
    * pass quarantines for review before they poison a contrastive
    * objective. Precondition: vectors within a group share one
    * dimensionality — a ragged vector's distance to the centroid is
    * NULL (zip_with pads with null) and ranks last; filter such rows
    * upstream (they are exactly what [[jlReduce]]'s zero-vector guard
    * catches at the projection stage).
    *
    * Scale shape: one (group, dim) shuffle for the centroid sums (the
    * honest cost of an exact mean), then the bounded |groups|·d
    * centroid table is re-collected to per-group ARRAYS and broadcast,
    * so the distance pass is one in-row codegen'd `zip_with` scan —
    * the corpus is never exploded a second time. Top-k runs per group
    * (window over |groups| partitions).
    */
  def embedOutliers(df: DataFrame, idCol: String, groupCol: String,
                    vecCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val quant = CacheRegistry.persist(df.select(
      col(idCol).cast("long").as("id"), col(groupCol).cast("long").as("grp"),
      expr(s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
        .as("qv")))
    val cent = integerCentroidDims(quant)
      .groupBy(col("grp"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, c))), p -> p.c)")
        .as("cv"))
    val dist = quant.join(broadcast(cent), Seq("grp"))
      .withColumn("dist_sq", expr(
        "aggregate(zip_with(qv, cv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"))
    dist
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
          .orderBy(col("dist_sq").desc, col("id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("grp"), col("rnk"), col("id"), col("dist_sq"))
  }

  /** Per-(group, dimension) signed-HALF_UP integer centroid over a
    * frame carrying milli-quantized vectors in `qv` and group key
    * `grp` — the shared core of [[embedOutliers]] and
    * [[centroidAffinity]]. One (group, dim) shuffle.
    */
  private def integerCentroidDims(quant: DataFrame): DataFrame =
    quant
      .select(col("grp"), posexplode(col("qv")).as(Seq("dim", "q")))
      .groupBy(col("grp"), col("dim"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      .select(col("grp"), col("dim"),
        expr("CASE WHEN s >= 0 THEN (2 * s + n) DIV (2 * n) " +
          "ELSE -((2 * (-s) + n) DIV (2 * n)) END").as("c"))

  /** Pairwise cosine affinity between group centroids: exact integer
    * dot products over the signed-HALF_UP milli-quant centroids, norms
    * as ⌊√Σc²⌋ (engine-identical IEEE sqrt on exact integers), cosine
    * in signed-HALF_UP basis points. The label/source proximity matrix
    * that says which corpus slices are embedding-space neighbors —
    * mixture and contrast-pair planning input. Everything after the
    * one (group, dim) centroid shuffle runs on |groups|·d bounded
    * frames; degenerate zero-norm centroids report cos_bp = 0.
    */
  def centroidAffinity(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val quant = df.select(col(groupCol).cast("long").as("grp"),
      expr(s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
        .as("qv"))
    val cen = CacheRegistry.persist(integerCentroidDims(quant))
    val dots = cen.select(col("grp").as("la"), col("dim"), col("c").as("ca"))
      .join(cen.select(col("grp").as("lb"), col("dim"), col("c").as("cb")),
        Seq("dim"))
      .filter(col("la") < col("lb"))
      .groupBy(col("la"), col("lb"))
      .agg(sum(col("ca") * col("cb")).as("dot"))
    val norms = cen.groupBy(col("grp"))
      .agg(expr("CAST(floor(sqrt(CAST(sum(c * c) AS DOUBLE))) AS BIGINT)").as("nrm"))
    dots
      .join(norms.select(col("grp").as("la"), col("nrm").as("na")), Seq("la"))
      .join(norms.select(col("grp").as("lb"), col("nrm").as("nb")), Seq("lb"))
      .select(col("la").as("label_a"), col("lb").as("label_b"), col("dot"),
        expr("""CASE WHEN na = 0 OR nb = 0 THEN 0L
                |     WHEN dot >= 0 THEN (20000 * dot + na * nb) DIV (2 * na * nb)
                |     ELSE -((20000 * (-dot) + na * nb) DIV (2 * na * nb)) END"""
          .stripMargin).as("cos_bp"))
  }

  /** Johnson–Lindenstrauss reduction with a deterministic ±1 projection
    * matrix: each output coordinate j is Σ_i s(j,i)·q_i over the
    * milli-quantized input, where s(j,i) = ±1 from the first md5
    * nibble of "j:i" — the Achlioptas sign matrix, engine-reproducible
    * with no stored model. The cheap front-end that drops a 64-dim
    * embedding table to k dims before brute-force or LSH candidate
    * scoring (distances are preserved within the JL bound in
    * expectation; signs, sums, and the norm are exact integers).
    *
    * Entirely per-row codegen'd expressions — ZERO shuffles; the
    * projection matrix never materializes anywhere.
    */
  def jlReduce(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 256, s"k must be in [1, 256], got $k")
    df.select(col(idCol).as("id"),
        expr(s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
          .as("qv"))
      // empty embeddings (failed-embed records) project to the zero
      // vector — without the guard sequence(0, -1) infers step -1 and
      // element_at(qv, 0) aborts the job
      .withColumn("yv", expr(
        s"""IF(size(qv) = 0, array_repeat(0L, $k),
           |  transform(sequence(0, ${k - 1}), j ->
           |    aggregate(sequence(0, size(qv) - 1), 0L, (acc, i) ->
           |      acc + IF(substring(md5(concat(CAST(j AS STRING), ':',
           |                                    CAST(i AS STRING))), 1, 1) < '8',
           |               1L, -1L) * element_at(qv, CAST(i + 1 AS INT)))))""".stripMargin))
      .select(col("id"),
        expr("concat_ws(',', yv)").as("reduced"),
        expr("aggregate(yv, 0L, (acc, y) -> acc + y * y)").as("norm_sq"))
  }

  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    VecFunctions.register(df.sparkSession)
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("scale_raw",
        expr("array_max(transform(v, x -> abs(CAST(x AS DOUBLE))))"))
      .select(
        col("id"),
        round(norm(col("v")), 4).as("l2_norm"),
        round(col("scale_raw"), 4).as("scale"),
        expr("""concat_ws(',', transform(v, x -> CAST(round(
                |  CASE WHEN scale_raw = 0.0D THEN 0.0D
                |       ELSE CAST(x AS DOUBLE) * 127.0D / scale_raw END) AS BIGINT)))"""
          .stripMargin).as("q8"))
  }

  /** One Lloyd iteration of k-means — the step that TRAINS the coarse
    * codebook [[ivfTopK]] consumes. Seeds are the k vectors with the
    * smallest md5(id) (deterministic, engine-independent); every vector
    * assigns to the seed minimizing the EXACT integer squared-L2
    * distance over elements scaled to round(x·10⁴) (ties → lowest
    * cluster index); the update emits each cluster's exact per-dimension
    * mean. Iterate by feeding the means back as the next seed table.
    *
    * Scale shape: the seed pick is a bounded k-row collect; seeds embed
    * as array literals so assignment is a narrow codegen'd scan (zero
    * corpus shuffles — the [[ivfTopK]] codebook-literal judgment); the
    * update is ONE map-side-combinable (cluster, dim)-keyed aggregation
    * whose post-partial volume is k × dims. Fixed-point distances make
    * the argmin — and therefore the whole step — bit-reproducible on any
    * engine: float-sum order never enters. Returns
    * (cluster_id, dim, n, mean round-4 in original units).
    */
  def kmeansStep(df: DataFrame, idCol: String, vecCol: String,
                 k: Int = 8, scale: Double = 10000.0): DataFrame = {
    require(k > 0 && k <= (1 << 12), s"k must be a bounded codebook size, got $k")
    val seeds = df
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("h", md5(col("id").cast("string")))
      .orderBy(col("h"), col("id")).limit(k)
      .collect().map(_.getSeq[Float](1).toArray)
    require(seeds.nonEmpty, "empty corpus")
    assignStep(df, vecCol, seeds.toSeq, scale)
  }

  /** Full k-means training: `iters` Lloyd rounds, each one corpus scan
    * (assignment against the current centroids as literals) plus one
    * bounded (cluster, dim) aggregation collected to the driver
    * (k × dims rows — the codebook is driver-sized by definition).
    * Returns the final centroid table (cluster_id, embedding) ready to
    * feed [[ivfTopK]]. A cluster that loses every member keeps its
    * previous centroid. Deterministic end to end: md5 seeds, exact
    * integer distances, fixed-point means.
    */
  def kmeans(df: DataFrame, idCol: String, vecCol: String,
             k: Int = 8, iters: Int = 3, scale: Double = 10000.0): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = df.sparkSession
    var step = kmeansStep(df, idCol, vecCol, k, scale)
    var centroids: Map[Long, Array[Float]] = Map.empty
    for (_ <- 1 until iters) {
      centroids = collectCentroids(step, centroids)
      step = assignStep(df, vecCol, centroidArray(centroids, k), scale)
    }
    centroids = collectCentroids(step, centroids)
    import spark.implicits._
    centroidArray(centroids, k).zipWithIndex
      .map { case (v, j) => (j.toLong, v) }
      .toDF("cluster_id", "embedding")
  }

  private def collectCentroids(step: DataFrame,
                               prev: Map[Long, Array[Float]]): Map[Long, Array[Float]] = {
    val rows = step.collect()
    val byCluster = rows.groupBy(_.getLong(0)).map { case (c, rs) =>
      val dims = rs.map(r => r.getLong(1) -> r.getDouble(3)).sortBy(_._1)
      c -> dims.map(_._2.toFloat)
    }
    prev ++ byCluster // empty clusters keep their previous centroid
  }

  private def centroidArray(cents: Map[Long, Array[Float]], k: Int): Seq[Array[Float]] =
    // a never-seeded slot borrows the lowest-numbered centroid (a fixed
    // choice — Map iteration order would be nondeterministic)
    (0 until k).map(j => cents.getOrElse(j.toLong, cents(cents.keys.min)))

  /** Per-vector cluster assignment against an explicit centroid table —
    * the serving-side step between [[kmeans]] (which trains the
    * centroids) and [[ivfTopK]] (which probes them): each vector gets
    * the id of its nearest centroid under the same integer-exact
    * squared-L2 distance the trainer used (ties → lowest cluster id).
    * Centroids ride as literals in the task closure, so this is a
    * narrow codegen'd scan — zero shuffles at any corpus size. Returns
    * the input columns plus `cluster_id`.
    */
  def assignClusters(df: DataFrame, vecCol: String,
                     centroids: DataFrame, scale: Double = 10000.0): DataFrame = {
    // centroids carries (cluster_id, vecCol) — the [[kmeans]] output shape
    val centRows = centroids
      .select(col("cluster_id").cast("long").as("cid"), col(vecCol).as("cv"))
      .orderBy("cid")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(centRows.nonEmpty && centRows.length <= (1 << 12),
      s"centroid table must be a bounded codebook, got ${centRows.length} entries")
    // the argmin kernel returns a POSITION in the cid-sorted matrix; map
    // it back through the cid array so re-labeled / filtered codebooks
    // (ids not 0..n-1) emit the table's actual cluster_id, not the slot
    VecFunctions.register(df.sparkSession)
    val cids = centRows.map(_._1)
    val cbFlat = centRows.flatMap(_._2.map(quantLit(_, scale)))
    df.withColumn("cluster_id",
      element_at(typedLit(cids), element_at(
        call_function("graft_pq_codes",
          call_function("graft_scale_q", col(vecCol), lit(scale)),
          typedLit(cbFlat), lit(1)), 1).cast("int") + 1))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): assign
    * every vector to its nearest centroid — here the same md5-picked
    * deterministic seeds [[kmeansStep]] uses, integer-exact distances —
    * then compare pairs ONLY within a cluster; cosine at/above
    * `threshold` marks the higher id a duplicate of the lower. This is
    * the published 100 TB path for embedding-level dedup: the all-pairs
    * comparison never happens — candidate volume is the sum of
    * per-cluster squares, and k grows with the corpus so cluster
    * populations stay bounded. Like [[cosineNearDupPairs]] the threshold
    * must sit far from the corpus similarity mass so float ordering
    * can't flip membership; the CLUSTER decision is integer-exact on
    * both engines. Returns (cluster_id, keep_id, drop_id, score
    * round-4), one row per in-cluster pair over the threshold.
    *
    * Scale shape: the seed pick is a bounded k-row collect; assignment
    * is a narrow codegen'd scan (centroid literals — the [[ivfTopK]]
    * judgment); the pair join shuffles the corpus once per side on
    * cluster_id. Zero windows, zero driver collects past the codebook.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    k: Int = 16, threshold: Double = 0.99,
                    scale: Double = 10000.0): DataFrame = {
    VecFunctions.register(df.sparkSession)
    require(k > 0 && k <= (1 << 12), s"k must be a bounded codebook size, got $k")
    val spark = df.sparkSession
    val seeds = df
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("h", md5(col("id").cast("string")))
      .orderBy(col("h"), col("id")).limit(k)
      .collect().map(_.getSeq[Float](1).toArray)
    require(seeds.nonEmpty, "empty corpus")
    import spark.implicits._
    val cents = seeds.toSeq.zipWithIndex
      .map { case (v, j) => (j.toLong, v) }.toDF("cluster_id", vecCol)
    val assigned = assignClusters(
      df.select(col(idCol).cast("long").as("graft_vid"), col(vecCol)),
      vecCol, cents, scale)
    val a = assigned.select(col("cluster_id"), col("graft_vid").as("keep_id"),
      col(vecCol).as("va"), norm(col(vecCol)).as("na"))
    val b = assigned.select(col("cluster_id"), col("graft_vid").as("drop_id"),
      col(vecCol).as("vb"), norm(col(vecCol)).as("nb"))
    a.join(b, Seq("cluster_id"))
      .filter(col("keep_id") < col("drop_id"))
      .select(col("cluster_id"), col("keep_id"), col("drop_id"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("score"))
      .filter(col("score") >= threshold)
      .select(col("cluster_id"), col("keep_id"), col("drop_id"),
        round(col("score"), 4).as("score"))
  }

  /** Centroid-matrix quantization for the argmin kernels: the same
    * HALF_UP rounding the [[graft.functions.VecKernels.scaleQ]] scan
    * expression applies, so engine and driver agree bit-for-bit.
    */
  private def quantLit(x: Float, scale: Double): Long =
    new java.math.BigDecimal(x.toDouble * scale)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** One assignment + update round against explicit centroids (the inner
    * loop of [[kmeans]]; [[kmeansStep]] = this with md5-picked seeds).
    * Quantization and the k-way argmin are kernel expressions
    * (graft_scale_q + graft_pq_codes with m=1 — integer distances with
    * strict `<` keep the (min dist, lowest cluster) tie-break exact);
    * the typed-UDF closure this replaces boxed a Seq[Long] per row, and
    * the per-seed zip_with/aggregate forest before it evaluated
    * interpreted (~1 ms/row). Still a narrow scan — zero corpus
    * shuffles before the update agg.
    *
    * PERF: the cluster projection MUST sit in its own select BELOW the
    * posexplode. A single `select(nearest(q), posexplode(q))` plans the
    * non-generator expression in the Project ABOVE the Generate, so the
    * argmin re-evaluates once per exploded (row × dim) — a d× blowup
    * measured at 12 s vs 0.6 s here. As a child attribute it is
    * evaluated once per vector and carried through the generate.
    */
  private def assignStep(df: DataFrame, vecCol: String,
                         cents: Seq[Array[Float]], scale: Double): DataFrame = {
    VecFunctions.register(df.sparkSession)
    val cbFlat = cents.flatMap(_.map(quantLit(_, scale))).toArray
    df.select(call_function("graft_scale_q", col(vecCol), lit(scale)).as("graft_q"))
      .select(element_at(
        call_function("graft_pq_codes", col("graft_q"), typedLit(cbFlat), lit(1)),
        1).as("cluster_id"), col("graft_q"))
      .select(col("cluster_id"),
        posexplode(col("graft_q")).as(Seq("dim", "qv")))
      .groupBy(col("cluster_id"), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"), sum(col("qv")).as("graft_s"))
      .select(col("cluster_id"), col("dim"), col("n"),
        // HALF_UP mean in scaled units as PURE INTEGER arithmetic:
        // sign(s) · ((2|s| + n) DIV (2n)). With the output precision equal
        // to 1/scale this IS round(s/n/scale, 4) for scale=1e4 — but the
        // decimal half-tie (2s ≡ n (mod 2n)) is decided exactly, where the
        // previous double round(sum/n/1e4, 4) saw the binary expansion a
        // hair off the tie and Spark/DuckDB split on it (q98 precedent:
        // no float division on either engine). Numerator is kept
        // non-negative so truncating and floor division coincide — the
        // expression means the same thing under Spark's DIV and DuckDB's //.
        (expr("CAST(sign(graft_s) AS BIGINT) * ((2L * abs(graft_s) + n) DIV (2L * n))")
          .cast("double") / lit(scale)).as("mean"))
  }

  /** Centroid-based silhouette — the cluster-quality score that decides
    * whether a clustering (and hence an IVF codebook or SemDeDup
    * partition) actually separates the corpus: per vector, a² = squared
    * distance to its own (nearest) centroid, b² = squared distance to
    * the best OTHER centroid, s = (b²−a²)/b² in basis points (b² ≥ a²
    * by construction since assignment is the argmin; s→0 means the
    * vector sits on a cluster boundary). Distances are scaled-BIGINT
    * exact against literal-embedded centroids — a narrow zero-shuffle
    * corpus scan, like every serving-side assignment in this module.
    * Output: (id, cluster_id, a2, b2, s_bp).
    */
  def silhouette(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, scale: Double = 10000.0): DataFrame = {
    val cents = centroids
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cv"))
      .collect().sortBy(_.getLong(0)).map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(cents.nonEmpty && cents.length >= 2 && cents.length <= (1 << 12),
      s"need a bounded codebook of >= 2 centroids, got ${cents.length}")
    VecFunctions.register(df.sparkSession)
    // one kernel call: [cid₁, d²₁, cid₂, d²₂] — rank 1 = assignment,
    // rank 2 = best other cluster (ties → lowest cid). The centroid
    // matrix quantizes through the engine-parity HALF_UP round.
    val scored = call_function("graft_sqdist_top2",
      call_function("graft_scale_q", col(vecCol), lit(scale)),
      typedLit(cents.flatMap(_._2.map(quantLit(_, scale)))),
      typedLit(cents.map(_._1)))
    df.select(col(idCol).as("id"), scored.as("graft_sc"))
      .select(col("id"),
        col("graft_sc")(0).as("cluster_id"),
        col("graft_sc")(1).as("a2"),
        col("graft_sc")(3).as("b2"))
      .withColumn("s_bp",
        when(col("b2") === 0L, lit(0L))
          .otherwise(expr("(20000 * (b2 - a2) + b2) div (2 * b2)")))
  }

  /** Incremental IVF index maintenance: assign a NEW embedding batch to
    * the EXISTING centroid table — no retraining — and report, per
    * inverted list, the growth and residual drift that tell an index
    * operator when retraining is due (the [[graft.llm.Dedup]]
    * incremental-dedup analog for the ANN side). Per cluster:
    * (cluster_id, n_base, n_new, growth_bp, resid_base, resid_new,
    * drift_bp) where growth_bp = n_new/n_base in HALF_UP basis points,
    * resid_* are the HALF_UP mean squared distances (scaled-integer
    * units) of each side's members to their centroid, and drift_bp =
    * resid_new/resid_base in bp (10000 = the new batch fits the old
    * codebook exactly as well as the base did; sustained growth means
    * the centroids no longer describe the data). NULL where a
    * denominator side is empty. A list neither side touches still
    * reports (0, 0, NULL…) — shrinking lists are a retrain signal too.
    *
    * Scale shape: each side is ONE narrow zero-shuffle kernel scan (the
    * [[silhouette]] assignment — centroid literals, integer-exact
    * distances) followed by a map-side-combinable k-bounded aggregation;
    * the finishing joins are over codebook-sized frames. Residual sums
    * are decimal(38,0)-promoted — at 100 TB a list's Σa² exceeds BIGINT
    * long before its membership count is interesting.
    */
  def ivfIncrementalStats(base: DataFrame, batch: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame,
      scale: Double = 10000.0): DataFrame = {
    def sideStats(df: DataFrame, nName: String, sName: String): DataFrame =
      silhouette(df, idCol, vecCol, centroids, scale)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as(nName),
          sum(col("a2").cast("decimal(38,0)")).as(sName))
    val lists = centroids.select(col(idCol).cast("long").as("cluster_id"))
    lists
      .join(sideStats(base, "graft_nb", "graft_ssb"), Seq("cluster_id"), "left")
      .join(sideStats(batch, "graft_nn", "graft_ssn"), Seq("cluster_id"), "left")
      .select(col("cluster_id"),
        coalesce(col("graft_nb"), lit(0L)).as("n_base"),
        coalesce(col("graft_nn"), lit(0L)).as("n_new"),
        col("graft_ssb"), col("graft_ssn"))
      .withColumn("growth_bp", expr(
        "CASE WHEN n_base > 0 THEN (20000 * n_new + n_base) DIV (2 * n_base) END"))
      .withColumn("resid_base", expr(
        "CASE WHEN n_base > 0 THEN CAST((2 * graft_ssb + n_base) DIV (2 * n_base) AS BIGINT) END"))
      .withColumn("resid_new", expr(
        "CASE WHEN n_new > 0 THEN CAST((2 * graft_ssn + n_new) DIV (2 * n_new) AS BIGINT) END"))
      .withColumn("drift_bp", expr(
        "CASE WHEN resid_base > 0 AND resid_new IS NOT NULL " +
          "THEN (20000 * resid_new + resid_base) DIV (2 * resid_base) END"))
      .select(col("cluster_id"), col("n_base"), col("n_new"), col("growth_bp"),
        col("resid_base"), col("resid_new"), col("drift_bp"))
  }

  /** Recall@k of the LSH-bucketed ANN against the exact cosine top-k —
    * the evaluation that calibrates `nPlanes` (more planes = smaller
    * buckets = faster but lower recall). Both rankings use the same
    * (score desc, neighbor_id) tie-break; overlap and recall_bp are
    * integer-exact. Output: (query_id, n_overlap, recall_bp).
    */
  def lshRecall(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, k: Int, nPlanes: Int, dim: Int = 64): DataFrame = {
    val approx = lshTopK(corpus, idCol, vecCol, queries, k, nPlanes, dim)
      .select(col("query_id"), col("neighbor_id"))
    // exact feeds both the overlap join and the per-query denominator.
    // Cache lifecycle: [[CacheRegistry]] — release after materializing.
    val exact = CacheRegistry.persist(
      cosineTopK(corpus, idCol, vecCol, queries, k)
        .select(col("query_id"), col("neighbor_id")))
    val overlap = exact.join(approx, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_overlap"))
    // recall divides by what the EXACT search actually returned (≤ k) —
    // dividing by the parameter under-reports on small corpora where
    // fewer than k neighbors exist; zero exact neighbors = vacuous 100%
    val exactN = exact.groupBy("query_id").agg(count(lit(1)).as("graft_ne"))
    queries.select(col(idCol).as("query_id"))
      .join(overlap, Seq("query_id"), "left")
      .join(exactN, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        coalesce(col("graft_ne"), lit(0L)).as("graft_ne"))
      .withColumn("recall_bp", expr(
        "CASE WHEN graft_ne = 0 THEN CAST(10000 AS BIGINT) " +
          "ELSE (20000 * n_overlap + graft_ne) div (2 * graft_ne) END"))
      .drop("graft_ne")
  }

  /** Matryoshka truncation sweep (Kusupati et al. 2022): recall@k of
    * exact search on the FIRST m dimensions against full-dimension
    * ground truth, per m in `dims` — the table that tells you how few
    * dims an MRL-style embedding can serve at (truncating is the
    * cheapest ANN speedup there is: a prefix slice, no re-embedding,
    * m/d of the flops and storage). Distances are exact scaled-BIGINT
    * squared L2 through the codegen'd kernel; prefix distances come
    * from in-row slices of the SAME scaled vectors, so the full-dim
    * row of the output is recall 10000 by construction (a built-in
    * harness self-check). One pair materialization feeds every m and
    * the ground truth. Run on SAMPLED queries, like every recall eval.
    * Output: (m_dims, n_hits, mean_recall_bp).
    */
  def matryoshkaRecall(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, k: Int, dims: Seq[Int],
      scale: Double = 10000.0): DataFrame = {
    require(dims.nonEmpty && dims.forall(_ >= 1) &&
      dims == dims.sorted && dims.distinct == dims,
      s"dims must be a non-empty ascending distinct positive list, got $dims")
    require(k > 0, "k must be positive")
    val spark = corpus.sparkSession
    import spark.implicits._
    graft.functions.VecFunctions.register(spark)
    def scaled(c: org.apache.spark.sql.Column) =
      call_function("graft_scale_q", c, lit(scale))
    val qx = broadcast(queries.select(col(idCol).as("query_id"),
      scaled(col(vecCol)).as("qv")))
    val cx = corpus.select(col(idCol).as("neighbor_id"),
      scaled(col(vecCol)).as("nv"))
    // one pair materialization feeds |dims| prefix rankings + the
    // ground truth; release via CacheRegistry after the run
    val pairs = CacheRegistry.persist(
      qx.join(cx, col("query_id") =!= col("neighbor_id")))
    val grid = dims.map(_.toLong).toDF("m_dims")
    val wEx = Window.partitionBy(col("query_id"))
      .orderBy(col("d2"), col("neighbor_id"))
    val exact = pairs.select(col("query_id"), col("neighbor_id"),
        call_function("graft_sqdist", col("qv"), col("nv")).as("d2"))
      .withColumn("rn", row_number().over(wEx)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val wM = Window.partitionBy(col("m_dims"), col("query_id"))
      .orderBy(col("d2"), col("neighbor_id"))
    val topk = pairs.crossJoin(broadcast(grid))
      .select(col("m_dims"), col("query_id"), col("neighbor_id"),
        call_function("graft_sqdist",
          slice(col("qv"), lit(1), col("m_dims").cast("int")),
          slice(col("nv"), lit(1), col("m_dims").cast("int"))).as("d2"))
      .withColumn("rnk", row_number().over(wM)).filter(col("rnk") <= k)
      .select(col("m_dims"), col("query_id"), col("neighbor_id"))
    val hits = topk.join(broadcast(exact), Seq("query_id", "neighbor_id"))
      .groupBy(col("m_dims")).agg(count(lit(1)).as("n_hits"))
    val nq = queries.agg(count(lit(1)).as("graft_nq"))
    grid.crossJoin(broadcast(nq))
      .join(broadcast(hits), Seq("m_dims"), "left")
      .select(col("m_dims"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr(s"(20000 * coalesce(n_hits, 0L) + $k * graft_nq) DIV " +
          s"(2 * $k * graft_nq)").as("mean_recall_bp"))
  }

  /** k-NN label propagation — auto-labeling by majority vote over each
    * query's exact cosine top-k (the standard weak-supervision step for
    * stratifying or filtering an unlabeled slice against a labeled
    * seed set). The vote table is query-bounded (Q·k rows), so the
    * label join broadcasts it against the corpus labels and the
    * argmax is a window over Q·(distinct labels) rows — corpus-side
    * cost is exactly [[cosineTopK]]'s. Ties → lowest label. Output:
    * (query_id, pred_label, votes).
    */
  def knnClassify(corpus: DataFrame, idCol: String, vecCol: String, labelCol: String,
      queries: DataFrame, k: Int): DataFrame = {
    val nbrs = cosineTopK(corpus, idCol, vecCol, queries, k)
      .select(col("query_id"), col("neighbor_id"))
    val labels = corpus.select(col(idCol).as("neighbor_id"), col(labelCol).cast("long").as("label"))
    val votes = broadcast(nbrs).join(labels, Seq("neighbor_id"))
      .groupBy(col("query_id"), col("label")).agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("votes").desc, col("label"))
    votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("query_id"), col("label").as("pred_label"), col("votes"))
  }

  /** Bucket-size histogram of the sign-LSH partitioning — the
    * calibration diagnostic that catches degenerate bucketing before a
    * pair join runs (the boilerplate pathology: corpus-wide shared
    * structure collapses everything into one bucket and the candidate
    * join goes quadratic). Two bounded map-side-combinable
    * aggregations; post-shuffle volume is distinct buckets, then
    * distinct sizes. Output: (bucket_size, n_buckets).
    */
  def lshBucketHistogram(df: DataFrame, idCol: String, vecCol: String,
      nPlanes: Int, dim: Int = 64): DataFrame =
    lshBucket(df, idCol, vecCol, nPlanes, dim)
      .groupBy(col("bucket")).agg(count(lit(1)).as("bucket_size"))
      .groupBy(col("bucket_size")).agg(count(lit(1)).as("n_buckets"))

  /** Per-dimension mean drift between the md5-hash train/val splits —
    * the distribution-shift check run before trusting a held-out set
    * (a skewed split silently biases every eval). Reuses
    * [[Curation.assignSplit]]'s exact split predicate (seeded md5
    * bucket), accumulates scaled-BIGINT sums per (split, dim) in ONE
    * map-side-combinable aggregation (post-shuffle volume = the
    * dimensionality), and emits integer HALF_UP means in scaled units —
    * engine-exact, no float summation. Output per dim: (dim, n_train,
    * n_val, mean_train_sc, mean_val_sc, drift_sc).
    */
  def splitDrift(df: DataFrame, idCol: String, vecCol: String, seed: String,
      trainPct: Int, scale: Double = 10000.0): DataFrame = {
    val split = Curation.assignSplit(df.select(col(idCol), col(vecCol)), idCol,
      seed, trainPct, 100 - trainPct)
    val isTrain = (col("split") === "train").cast("long")
    val mean = (s: String, n: String) =>
      expr(s"CAST(sign($s) AS BIGINT) * ((2L * abs($s) + $n) DIV (2L * $n))")
    split
      .select(col("split"), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("split"), col("dim").cast("long").as("dim"),
        expr(s"CAST(round(CAST(x AS DOUBLE) * ${scale}D) AS BIGINT)").as("sc"))
      .groupBy(col("dim"))
      .agg(
        sum(isTrain).as("n_train"),
        sum(when(col("split") === "train", col("sc")).otherwise(0L)).as("s_train"),
        sum(lit(1L) - isTrain).as("n_val"),
        sum(when(col("split") =!= "train", col("sc")).otherwise(0L)).as("s_val"))
      .select(col("dim"), col("n_train"), col("n_val"),
        mean("s_train", "n_train").as("mean_train_sc"),
        mean("s_val", "n_val").as("mean_val_sc"))
      .withColumn("drift_sc", abs(col("mean_train_sc") - col("mean_val_sc")))
  }
}
