package graft.llm

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Encoder}

/** Bounded grouped top-k as a typed [[Aggregator]]: keeps the k smallest
  * (priority, id) pairs per group with a size-k buffer at every stage,
  * so the partial aggregation is map-side combinable — the reduce side
  * sees at most k rows per (group × map partition), never the group's
  * data. This is the scale-correct alternative to a
  * `Window.partitionBy(group).orderBy(...)` row_number, which must
  * materialize and sort EVERY row of a stratum in one partition — the
  * shape that falls over when one stratum holds half of a 100 TB corpus.
  *
  * Ordering is the lexicographic (priority, id) tuple order, so ties
  * break deterministically on id.
  */
class TopKSmallestAgg(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0, s"k must be positive, got $k")
  private val ord = Ordering.Tuple2[Long, Long]
  override def zero: Seq[(Long, Long)] = Vector.empty
  private def bound(s: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val sorted = s.sorted(ord)
    if (sorted.length > k) sorted.take(k) else sorted
  }
  override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
    if (b.length >= k && ord.gteq(a, b.last)) b else bound(b :+ a)
  override def merge(b1: Seq[(Long, Long)], b2: Seq[(Long, Long)]): Seq[(Long, Long)] =
    bound(b1 ++ b2)
  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r.sorted(ord)
  override def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
}

/** Corpus-profiling operators: stratified fixed-size sampling, per-group
  * exact quantiles, grouped argmax, and log2 length histograms. Like the
  * sketches, every output is either pure-integer or built from
  * exactly-rounded double ops on exactly-representable values, so the
  * DuckDB oracles reproduce each number bit-for-bit.
  */
object Profiling {

  /** Deterministic fixed-size stratified sample: the k documents with the
    * smallest 48-bit md5(id) per stratum. Unlike threshold sampling
    * ([[Curation.hashSample]]) the per-stratum size is EXACT (min(k,
    * |stratum|)), and unlike a window row_number the selection is a
    * bounded map-side-combinable aggregate ([[TopKSmallestAgg]]) — no
    * stratum is ever sorted or collected whole. Returns
    * (stratum, id, sample_hash), k rows per stratum.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String, k: Int): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10).cast("long")
    val topk = udaf(new TopKSmallestAgg(k))
    df.select(col(strataCol).as("stratum"), h.as("sample_hash"), col(idCol).cast("long").as("id"))
      .groupBy(col("stratum"))
      .agg(topk(col("sample_hash"), col("id")).as("picks"))
      .select(col("stratum"), explode(col("picks")).as("p"))
      .select(col("stratum"), col("p._2").as("id"), col("p._1").as("sample_hash"))
  }

  /** Per-key document cap (domain/source rate limiting): every row gets
    * a `kept` flag, 1 for at most k rows per key — chosen
    * deterministically as the k smallest md5(id) (the
    * [[stratifiedSample]] pick set, so the selection is a bounded
    * aggregate, never a per-key window sort). The pick set (keys × k
    * ids) broadcasts back onto the corpus scan; for key cardinalities
    * where that outgrows the broadcast budget, drop the hint and join on
    * the id — the pick table is still ≪ corpus. Appends `kept` LONG to
    * the original columns.
    */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String, k: Int): DataFrame = {
    val picks = stratifiedSample(df, keyCol, idCol, k)
      .select(col("id").as("graft_keep_id"), lit(1L).as("graft_kept"))
    df.join(broadcast(picks), df(idCol).cast("long") === col("graft_keep_id"), "left")
      .withColumn("kept", coalesce(col("graft_kept"), lit(0L)))
      .drop("graft_keep_id", "graft_kept")
  }

  /** Exact per-group quantiles (linear interpolation on sorted values —
    * the percentile_cont definition) of an integer column, one row per
    * (group, quantile). Spark's exact `percentile` aggregate buffers a
    * value→count map, so the shuffle carries (group × distinct values)
    * entries, not rows — integer-valued columns (lengths, token counts)
    * keep that bounded at corpus scale. With probs stepping in 1/4s over
    * integer data every interpolation term is exactly representable, so
    * the doubles are engine-independent. Returns
    * (groupCol, q_idx, q_value, n).
    */
  def groupQuantiles(df: DataFrame, groupCol: String, valCol: String,
                     probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0), s"bad probs $probs")
    val arr = probs.map(p => s"CAST($p AS DOUBLE)").mkString(", ")
    df.groupBy(col(groupCol))
      .agg(
        expr(s"percentile($valCol, array($arr))").as("qs"),
        count(lit(1)).as("n"))
      .select(col(groupCol), col("n"), posexplode(col("qs")))
      .select(
        col(groupCol),
        col("pos").cast("long").as("q_idx"),
        round(col("col"), 4).as("q_value"),
        col("n"))
  }

  /** Grouped argmax without a window: the row with the maximum `ordCol`
    * per group (ties → smallest id) via `max_by` over a (ord, -id)
    * struct — one map-side-combinable aggregate carrying O(1) state per
    * group, where the row_number formulation sorts every group's rows.
    * Returns (groupCols..., best_id, best_<ordCol>, n_rows).
    */
  def argmaxPerGroup(df: DataFrame, groupCols: Seq[String],
                     ordCol: String, idCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        max_by(col(idCol).cast("long"), struct(col(ordCol), -col(idCol))).as("best_id"),
        max(col(ordCol)).as(s"best_$ordCol"),
        count(lit(1)).as("n_rows"))

  /** Power-of-two histogram of a non-negative integer column: bucket =
    * bit length (floor(log2)+1, 0 for values ≤ 0) — computed as
    * length(bin(v)), no libm. One map-side-combinable groupBy over at
    * most 64 buckets: corpus length profiles at scan speed. Returns
    * (bucket, n_docs, sum_chars, min_chars, max_chars).
    */
  def lengthHistogram(df: DataFrame, valCol: String): DataFrame =
    df.select(
        when(col(valCol) <= 0, 0L)
          .otherwise(length(bin(col(valCol))).cast("long")).as("bucket"),
        col(valCol))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(valCol)).as("sum_chars"),
        min(col(valCol)).as("min_chars"),
        max(col(valCol)).as("max_chars"))

  /** Shuffle-skew report for a prospective partitioning key: rows are
    * assigned to `nBuckets` engine-independent hash buckets (48-bit md5
    * of the key, the repo's cross-engine surrogate for Spark's Murmur3
    * `hashpartitioning`; NULL keys report under bucket −1 — exactly the
    * rows an equality join drops and a groupBy lumps into one task),
    * and each bucket reports its row load, distinct-key count, heaviest
    * key, and two HALF_UP ratios: `load_bp` (bucket load vs the
    * balanced 10000) and `top_share_bp` (the heaviest key's share of
    * its bucket). The read on the report: a hot bucket WITH a dominant
    * key needs salting or an AQE skew join; a hot bucket with many keys
    * just needs more partitions.
    *
    * Two map-side-combinable aggregations — (bucket, key) then bucket —
    * plus a bounded (`nBuckets`+1 row) self-join for the heaviest key;
    * nothing scales with corpus rows after the first partial agg.
    */
  def keySkewReport(df: DataFrame, keyCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && nBuckets <= 65536,
      s"nBuckets must be in [1, 65536], got $nBuckets")
    val keyN = CacheRegistry.persist(df
      .select(col(keyCol).cast("string").as("graft_key"))
      .withColumn("bucket",
        when(col("graft_key").isNull, lit(-1L))
          .otherwise(expr(
            s"CAST(conv(substring(md5(graft_key), 1, 12), 16, 10) AS BIGINT) % ${nBuckets}L")))
      .groupBy(col("bucket"), col("graft_key"))
      .agg(count(lit(1)).as("n")))
    val buckets = keyN.groupBy(col("bucket"))
      .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("n")).as("top_key_rows"))
    // heaviest key per bucket, ties broken on max key string — a join
    // over the bounded bucket table, not a corpus-wide window
    val topKeys = keyN.join(buckets.select(col("bucket"), col("top_key_rows")),
        Seq("bucket"))
      .filter(col("n") === col("top_key_rows"))
      .groupBy(col("bucket")).agg(max(col("graft_key")).as("top_key"))
    val total = buckets.agg(sum(col("n_rows")).as("graft_total"))
    buckets.join(topKeys, Seq("bucket"))
      .crossJoin(broadcast(total))
      .select(col("bucket"), col("n_rows"), col("n_keys"),
        col("top_key"), col("top_key_rows"),
        expr(s"(20000 * n_rows * $nBuckets + graft_total) DIV (2 * graft_total)")
          .as("load_bp"),
        expr("(20000 * top_key_rows + n_rows) DIV (2 * n_rows)").as("top_share_bp"))
  }

  /** Per-column categorical drift between two corpus snapshots — the
    * refresh-regression check a pipeline runs before swapping a new
    * crawl in: for each named column, the exact total-variation
    * distance between the two value distributions in HALF_UP basis
    * points, plus the single most-drifted value. NULLs report as the
    * literal "(null)" value (a drifting null rate IS drift).
    *
    * All arithmetic is integer-exact on the cross-multiplied counts
    * (|n_a·tot_b − n_b·tot_a| — no share rounding accumulates into
    * the sum); exact within BIGINT while tot_a·tot_b < 4.6e14·…, i.e.
    * snapshots up to ~3e9 rows each — beyond that, pre-aggregate to
    * sampled counts. Per column the cost is two value-count
    * aggregations (column-pruned scans) + a values-sized outer join;
    * nothing scales with row count after the partial aggs. Columns
    * must be CATEGORICAL — the per-column value list folds into one
    * driver-sized row (like every bounded sketch state here); don't
    * point this at a free-text column.
    *
    * Output: (column, n_values, tot_a, tot_b, tv_bp, top_value,
    * top_delta_bp), one row per requested column. NOTE the scale of
    * `top_delta_bp`: it is the top value's CONTRIBUTION to tv_bp —
    * HALF of its raw share delta (a value going 0% → 100% reports
    * 5000, matching tv_bp's half-sum convention) — so the two columns
    * are directly comparable; threshold accordingly.
    */
  def categoricalDrift(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.size <= 32,
      s"need 1..32 columns, got ${cols.size}")
    val perCol = cols.map { c =>
      def counts(df: DataFrame, out: String): DataFrame = df
        .select(coalesce(col(c).cast("string"), lit("(null)")).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as(out))
      val joined = counts(a, "n_a").join(counts(b, "n_b"), Seq("v"), "full_outer")
        .select(col("v"), coalesce(col("n_a"), lit(0L)).as("n_a"),
          coalesce(col("n_b"), lit(0L)).as("n_b"))
      joined
        .agg(
          count(lit(1)).as("n_values"),
          sum(col("n_a")).as("tot_a"), sum(col("n_b")).as("tot_b"),
          // recomputing the totals inside abs() keeps this a single
          // aggregation pass: sum-of-abs needs the totals per row, so
          // they ride in as grouped subaggregates via a window-free
          // two-level agg below instead
          collect_list(struct(col("v"), col("n_a"), col("n_b"))).as("graft_vals"))
        .select(col("n_values"), col("tot_a"), col("tot_b"),
          expr("""aggregate(graft_vals, 0L,
                 |  (acc, x) -> acc + abs(x.n_a * tot_b - x.n_b * tot_a))"""
            .stripMargin).as("graft_s"),
          expr("""array_sort(transform(graft_vals,
                 |  x -> struct(-abs(x.n_a * tot_b - x.n_b * tot_a) AS d, x.v AS v)))[0].v"""
            .stripMargin).as("top_value"),
          expr("""-array_sort(transform(graft_vals,
                 |  x -> struct(-abs(x.n_a * tot_b - x.n_b * tot_a) AS d, x.v AS v)))[0].d"""
            .stripMargin).as("graft_top"))
        .select(lit(c).as("col_name"), col("n_values"), col("tot_a"), col("tot_b"),
          expr("(20000 * graft_s + 2 * tot_a * tot_b) DIV (4 * tot_a * tot_b)")
            .as("tv_bp"),
          col("top_value"),
          expr("(20000 * graft_top + 2 * tot_a * tot_b) DIV (4 * tot_a * tot_b)")
            .as("top_delta_bp"))
    }
    perCol.reduce(_ unionAll _)
  }

  /** Token frequency spectrum (Zipf profile): for each corpus-wide token
    * occurrence count c, how many distinct tokens occur exactly c times.
    * The frequency-of-frequencies curve drives vocabulary-size and
    * dedup-threshold decisions in corpus curation (Good–Turing mass
    * estimates read straight off it). Two map-side-combinable groupBys:
    * the first shuffles one row per distinct token, the second one row
    * per distinct count (≪ tokens) — nothing here scales with corpus
    * row count after the partial aggregation. Returns
    * (occurrences, n_tokens).
    */
  def frequencySpectrum(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("occurrences"))
      .groupBy(col("occurrences")).agg(count(lit(1)).as("n_tokens"))

  /** Vocabulary growth curve (Heaps'-law profile): distinct word-`n`-gram
    * types seen within the first k documents, for k at every multiple of
    * `step` — the curve that predicts how much NEW text a corpus keeps
    * contributing as it grows (flat tail ⇒ more data adds no new types;
    * drives dedup and mixing decisions). `rankCol` must be a dense
    * 0-based document index (the driver tables' doc_id) — reusing an
    * existing dense id instead of ranking avoids a corpus-wide
    * single-partition row_number window.
    *
    * Scale shape: one gram-keyed groupBy (map-side combinable min) and a
    * bucket histogram; the cumulative sum runs on N/step rows — the
    * curve itself, not the corpus — so the final single-partition window
    * is bounded by construction. Returns (k_docs, vocab_size).
    */
  def vocabGrowth(df: DataFrame, rankCol: String, textCol: String,
                  n: Int, step: Int): DataFrame = {
    require(n > 0 && step > 0, s"need n>0, step>0; got n=$n step=$step")
    val grams = df
      .select(col(rankCol).as("graft_rank"), split(col(textCol), " ").as("graft_ws"))
      .filter(size(col("graft_ws")) >= n)
      .select(col("graft_rank"), explode(expr(
        s"transform(sequence(0, size(graft_ws) - $n), i -> concat_ws(' ', slice(graft_ws, i + 1, $n)))"
      )).as("graft_g"))
    val newPerBucket = grams
      .groupBy(col("graft_g")).agg(min(col("graft_rank")).as("graft_first"))
      .groupBy(expr(s"CAST(graft_first DIV $step AS BIGINT) + 1L").as("graft_bucket"))
      .agg(count(lit(1)).as("graft_new"))
    // spine: every step point the corpus reaches, even where nothing new
    // appears — the curve must be complete for downstream extrapolation
    // the rank projection feeds the spine AND the clamp total — persist
    // the 1-column frame so the corpus is scanned once for both, not
    // once per consumer. Cache lifecycle: [[CacheRegistry]].
    val ranks = CacheRegistry.persist(
      df.select(col(rankCol).cast("long").as("graft_rank3")))
    val spine = ranks.select(expr(s"CAST(graft_rank3 DIV $step AS BIGINT) + 1L")
      .as("graft_bucket")).distinct()
    // the final bucket may be partial — clamp its k_docs label to the
    // corpus size (max rank + 1; ranks are dense 0-based) instead of
    // overstating it as a full step. nTotal rides as a broadcast 1-row
    // agg, no driver action.
    val nTotal = ranks.select((max(col("graft_rank3")) + 1L).as("graft_ntotal"))
    spine.join(newPerBucket, Seq("graft_bucket"), "left")
      .withColumn("vocab_size",
        sum(coalesce(col("graft_new"), lit(0L))).over(Window.orderBy(col("graft_bucket"))))
      .crossJoin(broadcast(nTotal))
      .select(least(col("graft_bucket") * step, col("graft_ntotal"))
        .cast("long").as("k_docs"), col("vocab_size"))
  }

  // Deterministic Poisson(1) bootstrap weights: the cumulative pmf
  // (e⁻¹, 2e⁻¹, 2.5e⁻¹, 8e⁻¹/3) mapped onto the 48-bit space of the
  // md5-derived uniform draw, as EXACT integer thresholds so both
  // engines take identical branches (floor(cum · 2⁴⁸)).
  private val PoissonT0 = 103548857136060L
  private val PoissonT1 = 207097714272121L
  private val PoissonT2 = 258872142840152L
  private val PoissonT3 = 276130285696162L

  /** Deterministic multinomial bootstrap of a per-row metric — the
    * uncertainty quantification a pipeline eval needs before trusting a
    * single number (dedup rate moved 2 bp: noise or signal?). Each of
    * `replicates` resamples weights every row by a Poisson(1) count
    * (the standard large-n multinomial approximation, capped at 4 —
    * tail mass 0.4% folds into w=4) derived from
    * md5(seed:replicate:id), so the "randomness" is a pure function of
    * the data and both engines reproduce it bit-for-bit. Output per
    * replicate: (replicate, n_eff = Σw, sum_wv = Σw·v, mean_centi =
    * HALF_UP 100·Σwv/Σw, NULL for an empty resample) — the caller
    * reads the replicate spread (e.g. 2.5/97.5 percentiles) as the CI.
    *
    * Scale shape: ONE corpus scan; the per-row replicate expansion is
    * an in-row generate and the per-replicate aggregation is map-side
    * combinable, so post-shuffle volume is `replicates` rows per
    * partition regardless of corpus size. `replicates` is
    * require-bounded; the B× generate CPU cost is the honest price of
    * a bootstrap and is documented here rather than hidden.
    */
  def bootstrapMeans(df: DataFrame, idCol: String, valueCol: String,
                     replicates: Int, seed: String): DataFrame = {
    require(replicates >= 1 && replicates <= 256,
      s"replicates must be in [1, 256], got $replicates")
    require(!seed.contains("'"), s"seed must not contain quotes: $seed")
    df.select(col(idCol).cast("string").as("graft_id"),
        col(valueCol).cast("long").as("graft_v"))
      .select(col("graft_v"), explode(expr(
        s"""transform(sequence(0, ${replicates - 1}), b -> named_struct(
           |  'r', CAST(b AS BIGINT),
           |  'w', CASE
           |    WHEN CAST(conv(substring(md5(concat('$seed', ':', CAST(b AS STRING), ':', graft_id)), 1, 12), 16, 10) AS BIGINT) < ${PoissonT0}L THEN 0L
           |    WHEN CAST(conv(substring(md5(concat('$seed', ':', CAST(b AS STRING), ':', graft_id)), 1, 12), 16, 10) AS BIGINT) < ${PoissonT1}L THEN 1L
           |    WHEN CAST(conv(substring(md5(concat('$seed', ':', CAST(b AS STRING), ':', graft_id)), 1, 12), 16, 10) AS BIGINT) < ${PoissonT2}L THEN 2L
           |    WHEN CAST(conv(substring(md5(concat('$seed', ':', CAST(b AS STRING), ':', graft_id)), 1, 12), 16, 10) AS BIGINT) < ${PoissonT3}L THEN 3L
           |    ELSE 4L END))""".stripMargin)).as("graft_bw"))
      .groupBy(col("graft_bw.r").as("replicate"))
      .agg(sum(col("graft_bw.w")).as("n_eff"),
        sum(col("graft_bw.w") * col("graft_v")).as("sum_wv"))
      .withColumn("mean_centi", expr(
        """CASE WHEN n_eff > 0 THEN
          |  CAST(sign(sum_wv) AS BIGINT) * ((200 * abs(sum_wv) + n_eff) DIV (2 * n_eff))
          |END""".stripMargin))
  }

  /** Trimmed mean per group — the robust center monitoring dashboards
    * want when a metric has fat tails: drop the lowest and highest
    * `trimBp` (basis points, floor) of rows by value rank and average
    * the rest, all in exact integers (values arrive as an integer
    * column, e.g. cents; mean reported in milli-units, HALF_UP; rank
    * ties broken by `idCol` so both engines agree). Output:
    * (group, n_total, n_kept, kept_sum, trimmed_mean_milli).
    *
    * One per-group rank window (per-key sort) + one aggregation —
    * never a global sort. Values may be negative: the mean uses the
    * signed HALF_UP form.
    */
  def trimmedMean(df: DataFrame, groupCol: String, valCol: String,
                  idCol: String, trimBp: Long): DataFrame = {
    require(trimBp >= 0 && trimBp < 5000,
      s"trimBp must be in [0, 5000), got $trimBp")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("graft_v"), col(idCol))
    val wn = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    df.select(col(groupCol), col(valCol).cast("long").as("graft_v"), col(idCol))
      .withColumn("graft_rn", row_number().over(w).cast("long"))
      .withColumn("n_total", count(lit(1)).over(wn))
      .withColumn("graft_cut", expr(s"n_total * $trimBp DIV 10000"))
      .filter(col("graft_rn") > col("graft_cut") &&
        col("graft_rn") <= col("n_total") - col("graft_cut"))
      .groupBy(col(groupCol))
      .agg(first(col("n_total")).as("n_total"),
        count(lit(1)).as("n_kept"),
        sum(col("graft_v")).as("kept_sum"))
      .withColumn("trimmed_mean_milli", expr(
        "CAST(sign(kept_sum) AS BIGINT) * " +
          "((2000 * abs(kept_sum) + n_kept) DIV (2 * n_kept))"))
  }

  /** k-anonymity audit over quasi-identifier columns (the release gate
    * privacy reviews run before publishing microdata — Sweeney 2002):
    * rows grouped into equivalence classes on the quasi identifiers;
    * any class smaller than `k` re-identifies its members and must be
    * suppressed or generalized. Returns the RISKY classes only
    * (quasi cols + class_size < k). Derived identifiers (banded
    * balances, truncated zips) are the caller's withColumn upstream.
    *
    * One map-side-combinable count aggregation; output bounded by the
    * quasi-identifier domain, not the row count.
    */
  def kAnonymity(df: DataFrame, k: Int, quasiCols: Seq[String]): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)
  }

  /** l-diversity audit — the companion check to [[kAnonymity]]: a
    * k-anonymous equivalence class is still re-identifiable when every
    * member shares the same sensitive value (Machanavajjhala et al.
    * 2007). Reports each quasi-identifier class whose count of DISTINCT
    * sensitive values falls below `l`, with the class size alongside.
    * One hash aggregation over (quasi..., sensitive) then a
    * classes-bounded rollup — no windows, no per-class sorts; NULL
    * sensitive values are not counted as a diversity value (standard
    * count-distinct semantics on both engines).
    */
  def lDiversity(df: DataFrame, l: Int, quasiCols: Seq[String],
                 sensitiveCol: String): DataFrame = {
    require(l >= 2, s"l must be >= 2, got $l")
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("graft_n"))
      .groupBy(quasiCols.map(col): _*)
      .agg(sum(col("graft_n")).as("class_size"),
        sum(when(col(sensitiveCol).isNotNull, 1L).otherwise(0L))
          .as("n_sensitive"))
      .select((quasiCols.map(col) :+
        col("class_size").cast("long").as("class_size") :+
        col("n_sensitive").cast("long").as("n_sensitive")): _*)
      .filter(col("n_sensitive") < l)
  }

  /** Approximate functional-dependency profile over a fixed list of
    * candidate (determinant → dependent) column pairs — the schema-
    * inference primitive (Huhtala et al.'s TANE measures the same
    * per-pair violation counts): for each pair, the number of distinct
    * non-NULL determinant values, how many of them map to MORE than one
    * distinct dependent value (FD violations), the worst fan-out, and
    * whether the dependency holds exactly. Each pair costs one
    * map-side-combinable (det, dep) aggregation plus a det-keyed
    * rollup; pairs are independent, so Spark runs the |pairs| branches
    * of the union concurrently. NULL dependents are ignored (count-
    * distinct semantics), NULL determinants are excluded — identical
    * on DuckDB.
    */
  def fdProfile(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "at least one candidate pair")
    pairs.map { case (det, dep) =>
      df.filter(col(det).isNotNull)
        .groupBy(col(det), col(dep))
        .agg(count(lit(1)).as("graft_n"))
        .groupBy(col(det))
        .agg(sum(when(col(dep).isNotNull, 1L).otherwise(0L)).as("graft_nb"))
        .agg(count(lit(1)).as("n_dets"),
          coalesce(sum(when(col("graft_nb") > 1L, 1L).otherwise(0L)), lit(0L))
            .as("n_violating"),
          coalesce(max(col("graft_nb")), lit(0L)).as("max_branch"))
        .select(lit(det).as("det_col"), lit(dep).as("dep_col"),
          col("n_dets"), col("n_violating"), col("max_branch"),
          (col("n_violating") === 0L).cast("long").as("holds"))
    }.reduce(_ unionAll _)
  }

  /** Population Stability Index drift table between two populations of
    * an integer metric — the model-monitoring standard (Σ (p_a−p_b)·
    * ln(p_a/p_b) over fixed-width buckets), emitted per bucket so the
    * drifting REGION is visible, not just the scalar. Deterministic
    * engine-reproducible arithmetic: shares in HALF_UP basis points;
    * the log-ratio expands to ln(n_a)+ln(N_b)−ln(n_b)−ln(N_a) with
    * each ln once-rounded to integer micro-nats (the wordEntropy
    * precedent), so the per-bucket contribution is an exact product
    * delta_bp·lnratio_micro. Buckets empty on either side get a NULL
    * contribution (the standard smoothing decision is the caller's;
    * the bucket row still reports both counts so the mass is visible).
    * Both inputs must be non-empty. Cost: one map-side-combinable
    * bucket count per side; everything after runs on |buckets|-bounded
    * frames. Bucketing floors (negative-safe via the explicit CASE —
    * Spark DIV truncates, DuckDB // floors; the CASE makes them agree).
    */
  def psiDrift(a: DataFrame, b: DataFrame, valCol: String,
               bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1L, s"bucketWidth must be >= 1, got $bucketWidth")
    val bucketExpr =
      s"""CASE WHEN $valCol >= 0 THEN $valCol DIV $bucketWidth
         |ELSE -((-$valCol + $bucketWidth - 1) DIV $bucketWidth) END"""
        .stripMargin
    def hist(df: DataFrame, out: String) = df
      .filter(col(valCol).isNotNull)
      .select(expr(bucketExpr).cast("long").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as(out))
    def lnr(x: String) =
      s"CAST(round(ln(CAST($x AS DOUBLE)) * 1000000.0) AS BIGINT)"
    val ha = hist(a, "n_a")
    val hb = hist(b, "n_b")
    val tots = ha.agg(sum(col("n_a")).as("graft_ta"))
      .crossJoin(hb.agg(sum(col("n_b")).as("graft_tb")))
    ha.join(hb, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .crossJoin(broadcast(tots))
      .withColumn("pa_bp",
        expr("(20000 * n_a + graft_ta) DIV (2 * graft_ta)"))
      .withColumn("pb_bp",
        expr("(20000 * n_b + graft_tb) DIV (2 * graft_tb)"))
      .withColumn("psi_contrib", expr(
        s"""CASE WHEN n_a > 0 AND n_b > 0 THEN
           |  (pa_bp - pb_bp) * (${lnr("n_a")} + ${lnr("graft_tb")}
           |                     - ${lnr("n_b")} - ${lnr("graft_ta")})
           |ELSE CAST(NULL AS BIGINT) END""".stripMargin))
      .select("bucket", "n_a", "n_b", "pa_bp", "pb_bp", "psi_contrib")
  }

  /** Per-group equi-depth histogram boundaries — the optimizer
    * statistic (equal-POPULATION buckets, where [[lengthHistogram]]'s
    * equal-width buckets mislead on skew): bucket b's upper boundary
    * is the smallest value whose cumulative count reaches ⌈b·n/B⌉.
    * Exact, over the value-compressed histogram: the row-scale work is
    * one map-side-combinable (group, value) count; the prefix-sum
    * window runs per group over DISTINCT values only (for unbounded-
    * cardinality columns at 100 TB use the KLL sketch instead — this
    * is the exact-report path). Output per (group, bucket 1..B):
    * (upper_value, target_rank, n_rows).
    */
  def equiDepthHistogram(df: DataFrame, groupCol: String, valCol: String,
                         nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && nBuckets <= 4096,
      s"nBuckets must be in [1, 4096], got $nBuckets")
    val hist = df.filter(col(valCol).isNotNull)
      .groupBy(col(groupCol), col(valCol).cast("long").as("graft_v"))
      .agg(count(lit(1)).as("graft_n"))
    val wv = Window.partitionBy(col(groupCol)).orderBy(col("graft_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("graft_cum", sum(col("graft_n")).over(wv))
    val tot = hist.groupBy(col(groupCol))
      .agg(sum(col("graft_n")).as("n_rows"))
    val spark = df.sparkSession
    import spark.implicits._
    val buckets = (1 to nBuckets).map(_.toLong).toDF("bucket")
    // target rank ⌈b·n/B⌉; boundary = min v with cum ≥ target — all on
    // |groups|·B- and |groups|·|distinct|-bounded frames
    tot.crossJoin(broadcast(buckets))
      .withColumn("target_rank",
        // ⌈b·n/B⌉ with POSITIVE operands only: Spark DIV truncates
        // where DuckDB // floors, so the -(-x DIV B) ceil idiom is not
        // portable — (x + B − 1) DIV B is, and is what the oracle uses
        expr(s"(bucket * n_rows + ${nBuckets - 1}) DIV $nBuckets"))
      .join(cum, Seq(groupCol))
      .filter(col("graft_cum") >= col("target_rank"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(min(col("graft_v")).as("upper_value"),
        first(col("target_rank")).as("target_rank"),
        first(col("n_rows")).as("n_rows"))
  }

  /** Join-cardinality estimate WITHOUT running the join — the planning
    * probe you run before committing a 100-TB shuffle: per-key count
    * histograms on both sides meet on the key (a |distinct-keys|-sized
    * join, not a row join), the exact output size is Σ n_a·n_b, and
    * the top contributing keys show WHERE the explosion lives (the
    * salting targets). Output: the `topN` keys by contribution
    * (ties → smaller key) with the grand total riding on every row.
    */
  def joinSizeEstimate(a: DataFrame, keyColA: String,
                       b: DataFrame, keyColB: String,
                       topN: Int): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val ca = a.filter(col(keyColA).isNotNull)
      .groupBy(col(keyColA).as("join_key"))
      .agg(count(lit(1)).as("n_a"))
    val cb = b.filter(col(keyColB).isNotNull)
      .groupBy(col(keyColB).as("join_key"))
      .agg(count(lit(1)).as("n_b"))
    val contrib = ca.join(cb, Seq("join_key"))
      .withColumn("contrib", col("n_a") * col("n_b"))
    val total = contrib.agg(
      coalesce(sum(col("contrib")), lit(0L)).as("est_total"))
    contrib.crossJoin(broadcast(total))
      .orderBy(col("contrib").desc, col("join_key"))
      .limit(topN)
  }

  /** Empirical-Bayes smoothed per-key rates — the CTR-smoothing
    * standard: a key with 2 trials shouldn't report 0 bp or 10000 bp,
    * so each key's rate shrinks toward the GLOBAL rate with prior
    * strength `s` pseudo-trials: smoothed = (x·10⁴ + s·global_bp)
    * /(n + s), all HALF_UP integers (the global rate is itself a
    * once-rounded bp — documented, deterministic). Two aggregations
    * (global 1-row + per-key, both map-side combinable), the global
    * riding as a broadcast. Output per key:
    * (key, n, x, raw_bp, smoothed_bp).
    */
  def smoothedRates(df: DataFrame, keyCol: String, flagCol: String,
                    priorStrength: Long): DataFrame = {
    require(priorStrength >= 1L, s"priorStrength >= 1, got $priorStrength")
    val base = df.filter(col(flagCol).isNotNull)
      .select(col(keyCol), col(flagCol).cast("long").as("graft_f"))
    val global = base.agg(count(lit(1)).as("graft_t"),
        sum(col("graft_f")).as("graft_x"))
      .select(expr("(20000 * graft_x + graft_t) DIV (2 * graft_t)")
        .as("graft_gbp"))
    base.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("graft_f")).as("x"))
      .crossJoin(broadcast(global))
      .select(col(keyCol), col("n"), col("x"),
        expr("(20000 * x + n) DIV (2 * n)").as("raw_bp"),
        expr(s"""(2 * (10000 * x + $priorStrength * graft_gbp)
                |   + (n + $priorStrength))
                |DIV (2 * (n + $priorStrength))""".stripMargin)
          .as("smoothed_bp"))
  }

  /** Affinity index per (key, category) — the "index vs population"
    * number marketing/segmentation reports lead with: how over- or
    * under-represented category c is within key k's rows vs the whole
    * population, index = (share within key)/(global share), in HALF_UP
    * milli (1000 = neutral). Cross-multiplied — x_kc·T·1000 /
    * (n_k·X_c) — so the only rounding is the final HALF_UP. One
    * (key, cat) count; marginals broadcast back. Output:
    * (key, cat, n_key, x, index_milli).
    */
  def affinityIndex(df: DataFrame, keyCol: String,
                    catCol: String): DataFrame = {
    val cells = CacheRegistry.persist(df
      .filter(col(keyCol).isNotNull && col(catCol).isNotNull)
      .groupBy(col(keyCol), col(catCol))
      .agg(count(lit(1)).as("x")))
    val perKey = cells.groupBy(col(keyCol)).agg(sum(col("x")).as("n_key"))
    val perCat = cells.groupBy(col(catCol)).agg(sum(col("x")).as("graft_xc"))
    val tot = cells.agg(sum(col("x")).as("graft_t"))
    // perKey is KEY-cardinality (unbounded at scale) → plain key join;
    // only the category marginals and the 1-row total broadcast
    cells.join(perKey, Seq(keyCol))
      .join(broadcast(perCat), Seq(catCol))
      .crossJoin(broadcast(tot))
      .select(col(keyCol), col(catCol), col("n_key"), col("x"),
        expr("""(2000 * x * graft_t + n_key * graft_xc)
                | DIV (2 * n_key * graft_xc)""".stripMargin)
          .as("index_milli"))
  }

  /** 2-D skyline (Pareto frontier, both dimensions MAXIMIZED) — the
    * classic database operator (Börzsönyi et al. 2001) for "best
    * tradeoff" queries: a row survives iff no other row is ≥ in both
    * dimensions and > in at least one. Equal-point duplicates all
    * survive (neither dominates). The sweep runs entirely on the
    * VALUE-COMPRESSED x table: per distinct x keep max y, then a
    * partition-local pre-frontier (the block pass of the classic
    * block-nested-loop skyline) before the global prefix-max over x
    * descending — a point is on the frontier iff its y equals its
    * x-group's max AND strictly exceeds every greater-x group's max.
    * The pre-frontier makes the one unpartitioned window safe even for
    * CONTINUOUS-valued x (where value compression alone would funnel
    * ~n distinct values into a single task): each partition first drops
    * its internally-dominated x-groups — sound because a locally
    * dominated group is dominated by the same witness globally, and a
    * global frontier point beats every greater-x group everywhere, so
    * it survives its own partition's pass — and only the surviving
    * per-partition frontiers (≤ frontier size × partitions rows) reach
    * the global sweep. The row-scale work is one (x) max aggregation
    * and one semi-join back.
    */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val mx = base.groupBy(col(xCol)).agg(max(col(yCol)).as("graft_my"))
    val w = Window.orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = skylinePrefrontier(mx, xCol)
      .withColumn("graft_prev", max(col("graft_my")).over(w))
      .filter(col("graft_prev").isNull ||
        col("graft_my") > col("graft_prev"))
      .select(col(xCol), col("graft_my").as(yCol))
    base.join(frontier, Seq(xCol, yCol), "left_semi")
  }

  /** The partition-local block pass: within each partition (pinned via
    * spark_partition_id so the filter is reproducible on the plan's
    * actual layout), drop every x-group whose max-y is ≤ some
    * greater-x group's max-y IN THE SAME PARTITION — the same strict
    * dominance test the global sweep applies, on a subset of the
    * witnesses, so the survivors are a superset of the true frontier.
    * The pid-keyed window is perfectly balanced by construction.
    */
  private[graft] def skylinePrefrontier(mx: DataFrame,
                                        xCol: String): DataFrame = {
    val wLocal = Window.partitionBy(col("graft_pid"))
      .orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    mx.withColumn("graft_pid", spark_partition_id())
      .withColumn("graft_lprev", max(col("graft_my")).over(wLocal))
      .filter(col("graft_lprev").isNull ||
        col("graft_my") > col("graft_lprev"))
      .drop("graft_pid", "graft_lprev")
  }

  /** Shannon entropy of a categorical distribution per key, in integer
    * micro-nats — the behavioral-diversity score (a user who only ever
    * clicks scores 0; one spread over every event type scores ln K):
    * H = ln n − (1/n)·Σ c·ln c with each ln once-rounded to micro-nats
    * (the wordEntropy idiom) and the division HALF_UP — deterministic
    * on both engines. One (key, cat) count then a key rollup, both
    * map-side combinable. Output: (key, n_rows, n_distinct,
    * entropy_micro).
    */
  def groupEntropy(df: DataFrame, keyCol: String,
                   catCol: String): DataFrame = {
    def lnr(x: String) =
      s"CAST(round(ln(CAST($x AS DOUBLE)) * 1000000.0) AS BIGINT)"
    df.filter(col(keyCol).isNotNull && col(catCol).isNotNull)
      .groupBy(col(keyCol), col(catCol))
      .agg(count(lit(1)).as("graft_c"))
      .groupBy(col(keyCol))
      .agg(sum(col("graft_c")).as("n_rows"),
        count(lit(1)).as("n_distinct"),
        sum(col("graft_c") * expr(lnr("graft_c"))).as("graft_s"))
      .select(col(keyCol), col("n_rows"), col("n_distinct"),
        (expr(lnr("n_rows")) -
          expr("(2 * graft_s + n_rows) DIV (2 * n_rows)"))
          .as("entropy_micro"))
  }

  /** Chi-square independence table between two categoricals — the
    * "are these associated" test behind every segmentation claim.
    * Per cell: observed O, and the contribution (O·T − R·C)²/(T·R·C)
    * in HALF_UP micro-units (χ² = the sum; per-cell once-rounded like
    * every *_micro column in this library) — emitted PER CELL so the
    * driving cells are visible, not just the statistic. All products
    * run in decimal(38,0): (O·T − R·C)² alone passes BIGINT at modest
    * corpus sizes. One (a, b) count aggregation; marginals and cells
    * are |A|·|B|-bounded.
    */
  def chiSquareCells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = CacheRegistry.persist(df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("o")))
    val ra = cells.groupBy(col(aCol)).agg(sum(col("o")).as("graft_r"))
    val cb = cells.groupBy(col(bCol)).agg(sum(col("o")).as("graft_c"))
    val tot = cells.agg(sum(col("o")).as("graft_t"))
    cells.join(broadcast(ra), Seq(aCol))
      .join(broadcast(cb), Seq(bCol))
      .crossJoin(broadcast(tot))
      .withColumn("contrib_micro", expr(
        """CAST(((2000000 * (CAST(o AS DECIMAL(38,0)) * graft_t - CAST(graft_r AS DECIMAL(38,0)) * graft_c)
          |        * (CAST(o AS DECIMAL(38,0)) * graft_t - CAST(graft_r AS DECIMAL(38,0)) * graft_c))
          |       + (CAST(graft_t AS DECIMAL(38,0)) * graft_r * graft_c))
          |  DIV (2 * CAST(graft_t AS DECIMAL(38,0)) * graft_r * graft_c) AS BIGINT)"""
          .stripMargin))
      .select(col(aCol), col(bCol), col("o"), col("contrib_micro"))
  }

  /** Gini coefficient of a non-negative integer metric per group —
    * the inequality number for corpus-balance reports ("80% of tokens
    * come from 3% of sources"): G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx)/(n·Σx)
    * over ascending-sorted values, exact over the VALUE-COMPRESSED
    * histogram (a run of c equal values v after P predecessors
    * contributes v·(c·P + c(c+1)/2) to Σ i·x₍ᵢ₎ — no row-scale sort).
    * HALF_UP basis points; zero-sum groups are omitted (inequality of
    * nothing). decimal(38,0) throughout: i·x reaches n·max(x).
    */
  def giniCoefficient(df: DataFrame, groupCol: String,
                      valCol: String): DataFrame = {
    val hist = df
      .filter(col(valCol).isNotNull && col(valCol) >= 0)
      .groupBy(col(groupCol), col(valCol).cast("long").as("graft_v"))
      .agg(count(lit(1)).as("graft_c"))
    val wv = Window.partitionBy(col(groupCol)).orderBy(col("graft_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("graft_p",
        sum(col("graft_c")).over(wv) - col("graft_c"))
      // triangular number in INTEGER division (exact: c(c+1) is even) —
      // decimal "/" would go fractional on Spark and float on DuckDB
      .withColumn("graft_tri", expr("(graft_c * (graft_c + 1)) DIV 2"))
      .groupBy(col(groupCol))
      .agg(sum(col("graft_c")).as("n_rows"),
        sum(col("graft_v").cast("decimal(38,0)") * col("graft_c"))
          .cast("decimal(38,0)").as("graft_sx"),
        sum(col("graft_v").cast("decimal(38,0)") *
          (col("graft_c").cast("decimal(38,0)") * col("graft_p") +
            col("graft_tri")))
          .cast("decimal(38,0)").as("graft_si"))
      .filter(col("graft_sx") > 0)
      .select(col(groupCol), col("n_rows"), expr(
        """CAST((20000 * abs(2 * graft_si - (n_rows + 1) * graft_sx)
          |       + (CAST(n_rows AS DECIMAL(38,0)) * graft_sx))
          |  DIV (2 * CAST(n_rows AS DECIMAL(38,0)) * graft_sx) AS BIGINT)"""
          .stripMargin).as("gini_bp"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic — the
    * distribution-shift test that needs no bucketing choice (the PSI
    * companion): D = max over values of |F_a − F_b|, computed on the
    * merged value-compressed histograms by cross-multiplication
    * (|cumA·n_b − cumB·n_a| — no division until the final HALF_UP bp),
    * so it is exact at any size. Reports D and the value where the
    * CDFs diverge most (ties → smallest value) — the split point worth
    * inspecting. Both inputs must be non-empty. One count aggregation
    * per side; the merge and prefix sums run over distinct values.
    */
  def ksStatistic(a: DataFrame, b: DataFrame, valCol: String): DataFrame = {
    def hist(df: DataFrame, out: String) = df
      .filter(col(valCol).isNotNull)
      .groupBy(col(valCol).cast("long").as("graft_v"))
      .agg(count(lit(1)).as(out))
    val merged = hist(a, "graft_ca").join(hist(b, "graft_cb"),
        Seq("graft_v"), "full_outer")
      .select(col("graft_v"),
        coalesce(col("graft_ca"), lit(0L)).as("graft_ca"),
        coalesce(col("graft_cb"), lit(0L)).as("graft_cb"))
    val wv = Window.orderBy(col("graft_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = merged
      .withColumn("graft_cuma", sum(col("graft_ca")).over(wv))
      .withColumn("graft_cumb", sum(col("graft_cb")).over(wv))
    val tots = merged.agg(sum(col("graft_ca")).as("n_a"),
      sum(col("graft_cb")).as("n_b"))
    val scored = CacheRegistry.persist(cum.crossJoin(broadcast(tots))
      .withColumn("graft_d", abs(
        col("graft_cuma").cast("decimal(38,0)") * col("n_b") -
          col("graft_cumb").cast("decimal(38,0)") * col("n_a"))
        .cast("decimal(38,0)")))
    val dm = scored.agg(max(col("graft_d")).as("graft_dm"))
    scored.crossJoin(broadcast(dm))
      .filter(col("graft_d") === col("graft_dm"))
      .groupBy(col("n_a"), col("n_b"), col("graft_dm"))
      .agg(min(col("graft_v")).as("at_value"))
      .select(col("n_a"), col("n_b"),
        expr("""CAST((20000 * graft_dm + CAST(n_a AS DECIMAL(38,0)) * n_b)
                |  DIV (2 * CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"""
          .stripMargin).as("ks_bp"),
        col("at_value"))
  }

  /** Leave-one-out target encoding — the ML feature that replaces a
    * categorical with the mean target of its OTHER members, the
    * standard leak-free form ((Σ_cat − own)/(n_cat − 1)): computing it
    * WITH self-inclusion leaks the row's own label into its feature.
    * Exact HALF_UP milli; singleton categories encode NULL (no other
    * members — impute downstream, don't fabricate). One category
    * aggregation broadcast-joined back onto the rows: no window, no
    * per-category sort, category cardinality-bounded stats frame.
    * Output: input row id + category + (n_cat, loo_mean_milli).
    */
  def targetEncoding(df: DataFrame, idCol: String, catCol: String,
                     valCol: String): DataFrame = {
    val stats = df.filter(col(valCol).isNotNull)
      .groupBy(col(catCol))
      .agg(sum(col(valCol).cast("long")).as("graft_sum"),
        count(lit(1)).as("n_cat"))
    df.join(broadcast(stats), Seq(catCol), "left")
      .select(col(idCol), col(catCol), col("n_cat"),
        when(col("n_cat") > 1L and col(valCol).isNotNull, expr(
          s"""CAST(sign(graft_sum - CAST($valCol AS BIGINT)) AS BIGINT) *
             |((2000 * abs(graft_sum - CAST($valCol AS BIGINT)) + (n_cat - 1))
             |  DIV (2 * (n_cat - 1)))""".stripMargin))
          .as("loo_mean_milli"))
  }

  /** Hill tail-index estimate per group — the power-law heaviness
    * gauge for size distributions (document lengths, file sizes, key
    * frequencies): over the top k order statistics x₍₁₎ ≥ … ≥ x₍ₖ₎,
    * Hill = (1/k)·Σ ln(x₍ᵢ₎/x₍ₖ₊₁₎); small Hill ⇒ light tail, and
    * 1/Hill estimates the Pareto α (the "how bad can the biggest shard
    * get" number). Deterministic integers: each ln once-rounded to
    * micro-nats (the wordEntropy idiom) on values ranked by
    * (value desc, id) — total order, engine-identical — and the mean
    * HALF_UP. Groups with fewer than k+1 positive values are omitted
    * (no tail to estimate). One per-group rank window (per-key sort)
    * over positive values only; everything after runs on k-bounded
    * frames. Output: (group, k, hill_micro).
    */
  def hillTailIndex(df: DataFrame, groupCol: String, valCol: String,
                    idCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valCol).desc, col(idCol))
    def lnr(x: String) =
      s"CAST(round(ln(CAST($x AS DOUBLE)) * 1000000.0) AS BIGINT)"
    val ranked = df
      .filter(col(valCol).isNotNull && col(valCol) > 0)
      .withColumn("graft_rk", row_number().over(w).cast("long"))
      .filter(col("graft_rk") <= k + 1)
      .withColumn("graft_ln", expr(lnr(valCol)))
    ranked.groupBy(col(groupCol))
      .agg(sum(when(col("graft_rk") <= k, col("graft_ln")).otherwise(0L))
          .as("graft_top"),
        sum(when(col("graft_rk") === k + 1, col("graft_ln")).otherwise(0L))
          .as("graft_ref"),
        max(col("graft_rk")).as("graft_maxrk"))
      .filter(col("graft_maxrk") === k + 1)
      .select(col(groupCol), lit(k.toLong).as("k"),
        expr(s"(2 * (graft_top - $k * graft_ref) + $k) DIV (2 * $k)")
          .as("hill_micro"))
  }

  /** Inverse-probability-weighting calibration for hash-sampled
    * telemetry: rows are "kept" when the first md5 hex byte of their id
    * is below the stratum's threshold (the q54 deterministic-sampling
    * idiom, rate = r/256), the IPW estimator scales the kept count
    * back up (HALF_UP n_kept·256/r), and — because this is the
    * CALIBRATION report — the estimate sits next to the true count
    * with its relative error in basis points. Run it on a full drop
    * before committing to a sampling rate; at steady state you ship
    * only the sampled stream and the estimator column. One map-side-
    * combinable aggregation; rates are per-stratum with a default,
    * each in [1, 255] (256 = keep everything = nothing to estimate).
    */
  def ipwCalibration(df: DataFrame, idCol: String, strataCol: String,
                     rates: Map[String, Int], defaultRate: Int): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 1 && r <= 255),
      s"rates must be in [1, 255] (n/256ths), got $rates default $defaultRate")
    val thr = rates.foldLeft(lit(f"$defaultRate%02x")) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(f"$v%02x"))
        .otherwise(acc)
    }
    val rateN = rates.foldLeft(lit(defaultRate.toLong)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v.toLong))
        .otherwise(acc)
    }
    df.select(col(strataCol),
        when(substring(md5(col(idCol).cast("string")), 1, 2) < thr, 1L)
          .otherwise(0L).as("graft_smp"),
        rateN.as("graft_r"))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_true"),
        sum(col("graft_smp")).as("n_sampled"),
        min(col("graft_r")).as("rate_n256"))
      .withColumn("est_total", expr(
        "(2 * n_sampled * 256 + rate_n256) DIV (2 * rate_n256)"))
      .withColumn("err_bp", expr(
        "(2 * 10000 * abs(est_total - n_true) + n_true) DIV (2 * n_true)"))
  }

  /** Winsorized mean per group — clip to the [loBp, hiBp] percentile
    * values, then average: the robust center that (unlike
    * [[trimmedMean]]) keeps every row's vote, just bounded. Exact and
    * fully integer over the value-compressed histogram (the
    * [[madOutlierReport]] machinery): percentile values at rank
    * ⌈φ·n⌉, clipped sum assembled from the histogram, mean in
    * HALF_UP milli-units. Output per group:
    * (n_rows, lo_value, hi_value, winsorized_mean_milli).
    */
  def winsorizedMean(df: DataFrame, groupCol: String, valCol: String,
                     loBp: Long, hiBp: Long): DataFrame = {
    require(loBp >= 0 && hiBp <= 10000 && loBp < hiBp,
      s"need 0 <= loBp < hiBp <= 10000, got ($loBp, $hiBp)")
    val hist = df.filter(col(valCol).isNotNull)
      .groupBy(col(groupCol), col(valCol).cast("long").as("graft_v"))
      .agg(count(lit(1)).as("graft_n"))
    val wv = Window.partitionBy(col(groupCol)).orderBy(col("graft_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("graft_cum", sum(col("graft_n")).over(wv))
      .join(hist.groupBy(col(groupCol)).agg(sum(col("graft_n")).as("n_rows")),
        Seq(groupCol))
    def rankValue(bp: Long, out: String) = cum
      .filter(col("graft_cum") * 10000 >= lit(bp) * col("n_rows"))
      .groupBy(col(groupCol))
      .agg(min(col("graft_v")).as(out))
    val bounds = rankValue(loBp, "lo_value")
      .join(rankValue(hiBp, "hi_value"), Seq(groupCol))
    hist.join(broadcast(bounds), Seq(groupCol))
      .withColumn("graft_c",
        greatest(col("lo_value"), least(col("hi_value"), col("graft_v"))))
      .groupBy(col(groupCol))
      .agg(sum(col("graft_n")).as("n_rows"),
        first(col("lo_value")).as("lo_value"),
        first(col("hi_value")).as("hi_value"),
        sum(col("graft_c") * col("graft_n")).as("graft_s"))
      .withColumn("winsorized_mean_milli", expr(
        """CAST(sign(graft_s) AS BIGINT) *
          |((2000 * abs(graft_s) + n_rows) DIV (2 * n_rows))""".stripMargin))
      .drop("graft_s")
  }

  /** Median/MAD robust-outlier report per group, exact and fully
    * integer, over a VALUE-COMPRESSED histogram: the only row-scale
    * work is one map-side-combinable (group, value) count; the medians
    * come from prefix sums over the |distinct values|-bounded histogram
    * (cum ≥ ⌈n/2⌉ → lower median), so no per-row window ever sorts the
    * raw table — the shape that survives a 100 TB group where
    * `percentile` would shuffle every row into one reducer's sort.
    * MAD = median of |v − median|; a row is an outlier when
    * |v − median| > kNum · MAD (with MAD 0 that flags every value ≠
    * median, the conventional degenerate reading). Returns per group:
    * (n_rows, median, mad, n_outliers).
    */
  def madOutlierReport(df: DataFrame, groupCol: String, valCol: String,
                       kNum: Long = 3L): DataFrame = {
    require(kNum >= 1L, s"kNum must be >= 1, got $kNum")
    // the value histogram feeds four branches, but they are identical
    // exchange subtrees — ReusedExchange already deduplicates the
    // corpus scan + histogram shuffle, and an explicit persist measured
    // SLOWER (1.26 s → 1.91 s at sf0.1: the cache build costs more
    // than it saves). Checked r14; leave uncached.
    val hist = df.filter(col(valCol).isNotNull)
      .groupBy(col(groupCol), col(valCol).cast("long").as("graft_v"))
      .agg(count(lit(1)).as("graft_n"))
    val tot = hist.groupBy(col(groupCol))
      .agg(sum(col("graft_n")).as("graft_tot"))
    val wv = Window.partitionBy(col(groupCol)).orderBy(col("graft_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // lower median: smallest v whose cumulative count reaches ⌈n/2⌉
    // (for integer cum, 2·cum ≥ n ⟺ cum ≥ ⌈n/2⌉ on both parities)
    val med = hist.withColumn("graft_cum", sum(col("graft_n")).over(wv))
      .join(tot, Seq(groupCol))
      .filter(col("graft_cum") * 2 >= col("graft_tot"))
      .groupBy(col(groupCol))
      .agg(min(col("graft_v")).as("median"), first(col("graft_tot")).as("n_rows"))
    val dev = hist.join(broadcast(med), Seq(groupCol))
      .groupBy(col(groupCol),
        abs(col("graft_v") - col("median")).as("graft_d"))
      .agg(sum(col("graft_n")).as("graft_n"))
    val wd = Window.partitionBy(col(groupCol)).orderBy(col("graft_d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mad = dev.withColumn("graft_cum", sum(col("graft_n")).over(wd))
      .join(broadcast(med.select(col(groupCol), col("n_rows"))), Seq(groupCol))
      .filter(col("graft_cum") * 2 >= col("n_rows"))
      .groupBy(col(groupCol))
      .agg(min(col("graft_d")).as("mad"))
    val stats = med.join(broadcast(mad), Seq(groupCol))
    hist.join(broadcast(stats), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(first(col("n_rows")).as("n_rows"),
        first(col("median")).as("median"),
        first(col("mad")).as("mad"),
        coalesce(sum(when(
          abs(col("graft_v") - col("median")) > lit(kNum) * col("mad"),
          col("graft_n")).otherwise(0L)), lit(0L)).as("n_outliers"))
  }
}
