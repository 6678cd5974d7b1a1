package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

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
  * Everything is computed on `round(x·scale)` BIGINTs (the q92/dimStats
  * quantization), so subspace distances, code argmins, ADC sums, and
  * ranks are integer-exact and engine-independent (ties → lowest code /
  * lowest neighbor id).
  */
object Pq {

  /** round(x·scale) as BIGINT — the engine-side quantization both Spark
    * and the DuckDB oracles evaluate on the raw floats, so no driver
    * arithmetic has to reproduce either engine's rounding.
    */
  private def scaled(x: Column, scale: Double): Column =
    round(x.cast("double") * scale).cast("long")

  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)

  /** The per-subspace codebooks as driver-side float literals: entry
    * (s, c) is the s-th dsub-dim slice of the c-th codebook vector in
    * ascending id order (code = rank, 0-based). The codebook table is
    * driver-sized by definition (≤ 256 codes for one-byte storage).
    */
  private def collectCodebook(codebook: DataFrame, idCol: String, vecCol: String,
      m: Int): Array[Array[Array[Float]]] = {
    val rows = codebook
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .collect().sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).toArray)
    require(rows.nonEmpty && rows.length <= 256,
      s"PQ codebook must have 1..256 entries (one-byte codes), got ${rows.length}")
    val dim = rows.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    Array.tabulate(m, rows.length) { (s, c) => rows(c).slice(s * dsub, (s + 1) * dsub) }
  }

  /** dist(s, c) columns for one row's vector: integer squared L2 between
    * the row's s-th scaled subvector and codebook entry (s, c). The
    * codebook literals go through the SAME `scaled` expression as the
    * data (constant-folded by the engine), keeping both sides'
    * quantization semantics identical.
    */
  private def subDists(vec: Column, cb: Array[Array[Array[Float]]], s: Int,
      scale: Double): Column = {
    val dsub = cb(s)(0).length
    val sub = transform(slice(vec, s * dsub + 1, dsub), x => scaled(x, scale))
    array(cb(s).indices.map { c =>
      sqDist(sub, transform(typedLit(cb(s)(c)), x => scaled(x, scale)))
    }: _*)
  }

  /** The m per-subspace argmin code columns (ties → lowest code) for a
    * row's vector against the collected codebook — shared by
    * [[encodeWide]] and [[ivfAdcTopK]].
    */
  private def codeColumns(vecCol: String, cb: Array[Array[Array[Float]]],
      m: Int, scale: Double): Seq[Column] =
    (0 until m).map { s =>
      val d = subDists(col(vecCol), cb, s, scale)
      (array_position(d, array_min(d)) - 1L).as(s"code_$s")
    }

  /** Encode the corpus: (id, code_0..code_{m-1}) — each code the argmin
    * (ties → lowest code) over that subspace's codebook. A narrow
    * codegen'd scan; nothing shuffles.
    */
  def encodeWide(corpus: DataFrame, idCol: String, vecCol: String, codebook: DataFrame,
      m: Int = 8, scale: Double = 10000.0): DataFrame = {
    val cb = collectCodebook(codebook, idCol, vecCol, m)
    corpus.select((col(idCol).as("id") +: codeColumns(vecCol, cb, m, scale)): _*)
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
    val cb = collectCodebook(codebook, idCol, vecCol, m)
    val codes = encodeWide(corpus, idCol, vecCol, codebook, m, scale)
      .withColumnRenamed("id", "neighbor_id")
    val q = broadcast(queries.select(
      (col(idCol).as("query_id") +:
        (0 until m).map(s => subDists(col(vecCol), cb, s, scale).as(s"dt_$s"))): _*))
    val adc = (0 until m).map { s =>
      element_at(col(s"dt_$s"), col(s"code_$s").cast("int") + 1)
    }.reduce(_ + _)
    val scored = q.join(codes, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), adc.as("adc_dist"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc_dist"), col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("int")).filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("adc_dist"))
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
    val approx = adcTopK(corpus, idCol, vecCol, codebook, queries, k, m, scale)
      .select(col("query_id"), col("neighbor_id"))
    val sv = (c: Column) => transform(c, x => scaled(x, scale))
    val qx = broadcast(queries.select(col(idCol).as("query_id"), sv(col(vecCol)).as("qv")))
    val cx = corpus.select(col(idCol).as("neighbor_id"), sv(col(vecCol)).as("nv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("d2"), col("neighbor_id"))
    val exact = qx.join(cx, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), sqDist(col("qv"), col("nv")).as("d2"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val overlap = exact.join(approx, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_overlap"))
    queries.select(col(idCol).as("query_id")).join(overlap, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("recall_bp", expr(s"(20000 * n_overlap + $k) div (2 * $k)"))
  }

  /** IVF-ADC — the production composition for billion-vector search:
    * the coarse quantizer ([[Similarity.ivfTopK]]'s cosine argmax,
    * literal-embedded) routes every corpus vector into an inverted
    * list, PQ codes compress it to m bytes, and a query probes only its
    * `nProbe` nearest lists, scoring candidates with ADC lookups. The
    * corpus pays two narrow in-row passes fused into ONE scan (coarse
    * assignment + encoding — zero shuffles); the per-query candidate
    * set is the probed lists, not the corpus, and the only wide ops are
    * the cent_id-keyed candidate join (probe side broadcast) and the
    * per-query top-k window. This variant quantizes the full vector
    * (no residual codebooks — the IVFFlat-ADC layout); distances are
    * scaled-BIGINT exact. Output: (query_id, neighbor_id, rnk,
    * adc_dist).
    */
  def ivfAdcTopK(corpus: DataFrame, idCol: String, vecCol: String, coarse: DataFrame,
      codebook: DataFrame, queries: DataFrame, k: Int, nProbe: Int,
      m: Int = 8, scale: Double = 10000.0): DataFrame = {
    def dotD(a: Column, b: Column) = aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    def normD(a: Column) = sqrt(dotD(a, a))
    def cosD(a: Column, b: Column) = dotD(a, b) / (normD(a) * normD(b))
    val cents = coarse
      .select(col(idCol).cast("long").as("cent_id"), col(vecCol).as("cv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(cents.nonEmpty && cents.length <= (1 << 16),
      s"coarse quantizer must be bounded, got ${cents.length} entries")
    // (cs, -cent_id) structs — lexicographic max = best cosine, ties →
    // lowest centroid id (the q50 probe order)
    def scoredCents(v: Column) = transform(
      array(cents.sortBy(_._1).map { case (cid, cv) =>
        struct(lit(cid).as("cent_id"), typedLit(cv).as("cv"))
      }: _*),
      c => struct(cosD(v, c.getField("cv")).as("cs"), (-c.getField("cent_id")).as("nid")))
    val cb = collectCodebook(codebook, idCol, vecCol, m)
    val lists = corpus.select(
      (col(idCol).as("neighbor_id") +:
        (-array_max(scoredCents(col(vecCol))).getField("nid")).as("cent_id") +:
        codeColumns(vecCol, cb, m, scale)): _*)
    val qProbes = queries
      .select((col(idCol).as("query_id") +:
        explode(slice(reverse(array_sort(scoredCents(col(vecCol)))), 1, nProbe)).as("p") +:
        (0 until m).map(s => subDists(col(vecCol), cb, s, scale).as(s"dt_$s"))): _*)
      .withColumn("cent_id", -col("p.nid")).drop("p")
    val adc = (0 until m).map { s =>
      element_at(col(s"dt_$s"), col(s"code_$s").cast("int") + 1)
    }.reduce(_ + _)
    val scored = broadcast(qProbes).join(lists, Seq("cent_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), adc.as("adc_dist"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc_dist"), col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("int")).filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("adc_dist"))
  }
}
