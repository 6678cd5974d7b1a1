package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: PII redaction,
  * repetition/quality signals (Gopher-style), deterministic stratified
  * sampling, and greedy sequence packing.
  *
  * Everything here is either a pure column expression (whole-stage
  * codegen, pushdown-friendly) or — for the inherently sequential packing
  * step — a single-shuffle per-stratum pass. All randomness is replaced by
  * md5-derived keys so results are engine-independent and replayable.
  */
object Curation {

  // Redaction regexes — RE2-compatible (no lookaround/backrefs) so the
  // same pattern string runs identically under Spark (java.util.regex)
  // and any RE2-based engine. Application order is email → phone → ipv4
  // and must be preserved by callers re-deriving the semantics.
  val EmailRe  = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe  = "\\+[0-9]{1,2} [0-9]{3} [0-9]{3} [0-9]{4}"
  val Ipv4Re   = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redact emails, phone numbers, and IPv4 addresses from `textCol`,
    * returning the cleaned text plus per-category match counts (counted
    * on the ORIGINAL text, before any replacement). Pure expressions —
    * no UDF, stays inside whole-stage codegen.
    */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    def n(re: String) = size(regexp_extract_all(t, lit(re), lit(0))).cast("long")
    df.select(
      col(idCol).as("id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "[EMAIL]"),
          PhoneRe, "[PHONE]"),
        Ipv4Re, "[IP]").as("clean"),
      n(EmailRe).as("n_emails"),
      n(PhoneRe).as("n_phones"),
      n(Ipv4Re).as("n_ips"))
  }

  /** Gopher-style repetition signals per document over whitespace words:
    * total words, distinct words (dup fraction = 1 - distinct/total), and
    * the most frequent word bigram with its count (ties break on bigram
    * asc, so the result is deterministic). Documents with fewer than two
    * words have no bigrams and are dropped.
    *
    * Entirely per-row expressions — the bigram array is sorted and the
    * top run found in one `aggregate` pass, so the operator is a narrow
    * codegen'd scan with NO shuffle: at corpus scale it runs at parquet
    * read speed regardless of document count.
    */
  // Most frequent bigram of the `ws` word array and its count, as one
  // aggregate() pass over the sorted bigram array. Strictly-greater keeps
  // the FIRST maximal run of the asc-sorted array, which is exactly the
  // (count desc, bigram asc) tie-break. Empty/1-word arrays yield
  // ('', 0).
  private val topRun =
    """aggregate(
      |  array_sort(transform(sequence(0, size(ws) - 2), i -> concat(ws[i], ' ', ws[i + 1]))),
      |  struct(CAST('' AS STRING) AS prev, CAST(0 AS BIGINT) AS run,
      |         CAST('' AS STRING) AS best, CAST(0 AS BIGINT) AS bestn),
      |  (acc, x) -> struct(
      |    x AS prev,
      |    CASE WHEN x = acc.prev THEN acc.run + 1 ELSE CAST(1 AS BIGINT) END AS run,
      |    CASE WHEN (CASE WHEN x = acc.prev THEN acc.run + 1 ELSE CAST(1 AS BIGINT) END) > acc.bestn
      |         THEN x ELSE acc.best END AS best,
      |    CASE WHEN (CASE WHEN x = acc.prev THEN acc.run + 1 ELSE CAST(1 AS BIGINT) END) > acc.bestn
      |         THEN (CASE WHEN x = acc.prev THEN acc.run + 1 ELSE CAST(1 AS BIGINT) END)
      |         ELSE acc.bestn END AS bestn),
      |  acc -> struct(acc.best AS top_bigram, acc.bestn AS top_bigram_n))""".stripMargin

  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("id"),
        size(col("ws")).cast("long").as("total_words"),
        size(array_distinct(col("ws"))).cast("long").as("distinct_words"),
        expr(topRun).as("tr"))
      .select(col("id"), col("total_words"), col("distinct_words"),
        col("tr.top_bigram").as("top_bigram"), col("tr.top_bigram_n").as("top_bigram_n"))
  }

  /** Composite quality gate: evaluates every rule, emits the failed-rule
    * list (stable order, comma-joined) and a keep flag, appended to the
    * ORIGINAL columns (so it composes — including over streams — without
    * a join). One narrow codegen'd pass — no joins, no shuffle; at corpus
    * scale this is the filter stage in front of dedup, running at scan
    * speed.
    *
    * Rules (all integer arithmetic — no float thresholds to drift):
    *  - null_text:      the text column is NULL (otherwise every other
    *                    rule's comparison is NULL and concat_ws would
    *                    silently pass the row)
    *  - too_short:      fewer than `minTokens` whitespace tokens
    *  - high_dup:       duplicate words are more than half of all words
    *  - bigram_repeat:  the top bigram covers more than 1/8 of the words
    *                    (a doc with fewer than two words has no bigram —
    *                    top_bigram_n = 0, never a spurious flag)
    *  - stopword_poor:  stopwords are less than 1/10 of the words
    */
  def qualityGate(df: DataFrame, idCol: String, textCol: String,
                  minTokens: Long = 20L): DataFrame = {
    val stop = "'the','a','and','of','to','in'"
    df.withColumn("ws", split(col(textCol), " "))
      .withColumn("total", size(col("ws")).cast("long"))
      .withColumn("dst", size(array_distinct(col("ws"))).cast("long"))
      .withColumn("stop_n", expr(s"CAST(size(filter(ws, x -> x IN ($stop))) AS BIGINT)"))
      .withColumn("top_n",
        when(size(col("ws")) >= 2, expr(topRun).getField("top_bigram_n"))
          .otherwise(lit(0L)))
      .withColumn("reasons", concat_ws(",",
        when(col(textCol).isNull, lit("null_text")),
        when(col("total") < minTokens, lit("too_short")),
        when((col("total") - col("dst")) * 2 > col("total"), lit("high_dup")),
        when(col("top_n") * 8 > col("total"), lit("bigram_repeat")),
        when(col("stop_n") * 10 < col("total"), lit("stopword_poor"))))
      .withColumn("keep", (col("reasons") === "").cast("boolean"))
      .withColumn("n_tokens", col("total"))
      .withColumn("dup_words", col("total") - col("dst"))
      .withColumn("top_bigram_n", col("top_n"))
      .withColumn("n_stopwords", col("stop_n"))
      .drop("ws", "total", "dst", "stop_n", "top_n")
  }

  /** Corpus-wide top-k word n-grams: explode per-document n-gram arrays,
    * count globally, keep the k most frequent (ties break on the gram
    * asc). The groupBy does map-side partial aggregation and the top-k is
    * TakeOrderedAndProject — no global sort — so the reduce side only
    * ever sees (distinct grams, then k) rows regardless of corpus size.
    */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    val grams = expr(
      s"""transform(sequence(0, size(ws) - $n),
         |  i -> array_join(slice(ws, i + 1, $n), ' '))""".stripMargin)
    df.select(split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= n)
      .select(explode(grams).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram").asc)
      .limit(k)
  }

  /** Deterministic stratified sampling: keep a row iff the first two hex
    * chars of md5(saltless key) sort below the stratum's threshold. A
    * threshold of "29" keeps ~16% (0x29/0x100); per-stratum thresholds
    * implement training-mix reweighting. No RNG, so the sample is stable
    * under retries, resumes, and engine swaps; the filter is a scan-level
    * predicate (no shuffle at all).
    */
  def hashSample(df: DataFrame, keyCol: Column, strataCol: Column,
                 thresholds: Map[String, String], defaultThreshold: String): DataFrame = {
    val prefix = substring(md5(keyCol.cast("string")), 1, 2)
    val thr = thresholds.foldLeft(lit(defaultThreshold)) { case (acc, (stratum, t)) =>
      when(strataCol === stratum, lit(t)).otherwise(acc)
    }
    df.filter(prefix < thr).withColumn("sample_key", prefix)
  }

  /** Deterministic source-mixture sampling — build a training mix with
    * fixed per-source document quotas (the "data mixing" step of corpus
    * assembly: N_s docs from each source s, chosen reproducibly). Docs
    * within a source are ranked by md5 of their id (id as tiebreak), so
    * the pick is stable under retries and engine swaps; a source absent
    * from `quotas` contributes nothing; a quota larger than the source
    * takes the whole source. Returns the input columns of the picked
    * rows.
    *
    * Scale shape: one rank-within-source window (a single shuffle on the
    * source key). Sources are few and large, so for skewed mixes
    * pre-filter with [[hashSample]]'s scan-level threshold to cut each
    * source near its quota before the exact window ranks the remainder.
    */
  def mixtureSample(df: DataFrame, idCol: String, srcCol: String,
                    quotas: Map[String, Long]): DataFrame = {
    require(quotas.nonEmpty, "quotas must name at least one source")
    require(quotas.values.forall(_ >= 0L), s"quotas must be >= 0: $quotas")
    val w = Window.partitionBy(col(srcCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("graft_rn", row_number().over(w))
      .withColumn("graft_quota",
        element_at(typedLit(quotas), col(srcCol).cast("string")))
      .filter(col("graft_quota").isNotNull && col("graft_rn") <= col("graft_quota"))
      .drop("graft_rn", "graft_quota")
  }

  /** Greedy sequential sequence packing: within each stratum, walk docs in
    * `idCol` order and start a new bin whenever adding the next doc would
    * exceed `capacity` tokens (an oversized doc gets a bin of its own).
    * Packing is inherently sequential, so this is one shuffle
    * (groupByKey on the stratum) + a linear per-group pass with O(1)
    * state. At corpus scale, pre-shard each stratum (e.g. stratum =
    * (lang, pmod(hash(id), shards))) so groups stay bounded; bins are
    * then unique per (stratum, shard).
    */
  def packGreedy(df: DataFrame, groupCol: String, idCol: String, tokCol: String,
                 capacity: Long): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(groupCol).cast("string"), col(idCol).cast("long"), col(tokCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val sorted = it.toArray.sortBy(_._2)
        var bin = 0L
        var fill = 0L
        sorted.iterator.map { case (_, id, t) =>
          if (fill + t > capacity && fill > 0L) { bin += 1; fill = t } else fill += t
          (g, id, t, bin, fill)
        }
      }
      .toDF(groupCol, idCol, "toks", "bin", "fill_after")
  }

  /** Concat-and-chunk sequence layout — the GPT-style packing mode
    * [[packGreedy]] does NOT express: documents are laid end to end in
    * the deterministic training order (the [[shuffleKey]] md5 ordering,
    * ties by id) and the concatenated token stream is sliced into
    * fixed-length training sequences, SPLITTING a document that crosses
    * a boundary (packGreedy bins whole docs and pads; this wastes zero
    * slots and is what decoder-LM pipelines actually ship). Emits one
    * row per (sequence, document-segment): `seq_id`, `id`, `seg_start`
    * (the segment's first slot within its sequence), `doc_off` (the
    * first document token the segment carries), `n_toks` — segments
    * tile every sequence except the last's tail, and concatenating a
    * doc's segments in seq order reconstructs it exactly.
    *
    * Scale shape: the global token offsets come from a TWO-PHASE prefix
    * sum — range-partition by (shuffle_key, id), one pass for
    * per-partition totals (a partition-count-bounded driver array), one
    * pass adding the broadcast partition offsets to a running local
    * sum — never a window over an unpartitioned frame (the q231
    * discipline; a naive `sum() OVER (ORDER BY …)` single-partitions
    * the corpus, the thing a 100 TB layout cannot do). The segment
    * explode adds ≤ ⌈toks/seqLen⌉+1 rows per doc. Zero-token docs are
    * skipped on both engines.
    */
  def concatChunk(df: DataFrame, idCol: String, tokCol: String,
                  seqLen: Long, seed: String, numParts: Int = 0): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val spark = df.sparkSession
    val base = shuffleKey(
      df.select(col(idCol).cast("long").as("graft_id"),
        col(tokCol).cast("long").as("graft_toks"))
        .filter(col("graft_toks") > 0), "graft_id", seed)
    val parts =
      if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    // both passes read the SAME cached partitioning, so phase-1 totals
    // index the exact partitions phase 2 walks. Cache lifecycle:
    // [[CacheRegistry]] — release after materializing.
    val sorted = CacheRegistry.persist(
      base.repartitionByRange(parts, col("shuffle_key"), col("graft_id"))
        .sortWithinPartitions(col("shuffle_key"), col("graft_id")))
    val totals = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      Iterator.single(i -> it.map(_.getAs[Long]("graft_toks")).sum)
    }.collect().toMap
    val offsets = (0 until parts).scanLeft(0L) {
      (acc, i) => acc + totals.getOrElse(i, 0L)
    }.toArray
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = sorted.schema.add("graft_s",
      org.apache.spark.sql.types.LongType, nullable = false)
    val withOff = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var run = bc.value(i)
      it.map { r =>
        val s = run
        run += r.getAs[Long]("graft_toks")
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ s)
      }
    }
    spark.createDataFrame(withOff, schema)
      .withColumn("seq_id", explode(expr(
        s"sequence(graft_s DIV ${seqLen}L, (graft_s + graft_toks - 1) DIV ${seqLen}L)")))
      .select(col("seq_id"), col("graft_id").as("id"),
        (greatest(col("graft_s"), col("seq_id") * seqLen) -
          col("seq_id") * seqLen).as("seg_start"),
        (greatest(col("graft_s"), col("seq_id") * seqLen) -
          col("graft_s")).as("doc_off"),
        (least(col("graft_s") + col("graft_toks"), (col("seq_id") + 1) * seqLen) -
          greatest(col("graft_s"), col("seq_id") * seqLen)).as("n_toks"))
  }

  /** Stride-scheduled weighted interleave — the deterministic
    * data-loader ORDER for a multi-source mixture (lottery/stride
    * scheduling, Waldspurger 1995; what weighted interleaving in
    * training loaders implements): each source's rows get a
    * deterministic within-source shuffle rank (md5 of the id — the
    * corpus-shuffle convention), and row i of source s is scheduled at
    * integer virtual time vt = ⌈i·10⁶ / w_s⌉ (computed as
    * (i·10⁶ + w_s − 1) DIV w_s — exact, no floats). Reading the output
    * in (vt, source, src_rank) order yields the weighted round-robin:
    * over any prefix, source s contributes ≈ w_s/Σw of the rows, with
    * bounded (±1 per source) deviation — the property batch-level
    * mixture sampling (q103) does NOT give you.
    *
    * Scale shape: one per-source rank window (per-key sort, no global
    * window) + narrow arithmetic. The OUTPUT ORDER is the schedule;
    * materializing it globally is an ordinary repartitionByRange sort
    * on (vt, source) — scalable, unlike a global row_number.
    * Sources missing from `weightsBp` are dropped (declare your
    * mixture); weights must be positive.
    */
  def interleaveSchedule(df: DataFrame, srcCol: String, idCol: String,
                         weightsBp: Map[String, Long]): DataFrame = {
    require(weightsBp.nonEmpty && weightsBp.values.forall(_ > 0),
      s"weightsBp must be non-empty positive, got $weightsBp")
    val s = df.sparkSession
    import s.implicits._
    val w = weightsBp.toSeq.toDF(srcCol, "graft_w")
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.select(col(srcCol), col(idCol))
      .join(broadcast(w), Seq(srcCol))
      .withColumn("src_rank", row_number().over(rankW).cast("long"))
      .withColumn("vt", expr("(src_rank * 1000000 + graft_w - 1) DIV graft_w"))
      .select(col(srcCol), col(idCol), col("src_rank"), col("vt"))
  }

  /** Padding-waste report for length-bucketed batching: each document
    * lands in the smallest bucket that fits its token count (the
    * standard fixed-shape batching scheme), and the report says what
    * that costs — per bucket: document count, real tokens, padded
    * tokens (n·bucket size), and the waste share in HALF_UP basis
    * points. Documents longer than every bucket report under bucket −1
    * with zero padding (they get split/truncated upstream — this
    * operator measures PADDING, not truncation). The number that
    * decides whether a bucket ladder is worth retuning before a
    * training run burns 10% of its FLOPs on pad tokens.
    *
    * One narrow in-row bucket assignment (a ≤ |buckets| literal array
    * probe) + one map-side-combinable groupBy over at most
    * |buckets|+1 rows. Scales at scan speed.
    */
  def paddingWaste(df: DataFrame, tokCol: String, buckets: Seq[Long]): DataFrame = {
    require(buckets.nonEmpty && buckets.size <= 64 &&
      buckets.forall(_ > 0) && buckets == buckets.sorted && buckets.distinct == buckets,
      s"buckets must be a non-empty ascending distinct positive ladder, got $buckets")
    val arr = buckets.map(b => s"${b}L").mkString(", ")
    df.select(col(tokCol).cast("long").as("graft_n"))
      .withColumn("bucket", expr(
        // try_element_at: the filtered array is EMPTY for overflow docs
        // and ANSI element_at would abort the job on them
        s"coalesce(try_element_at(filter(array($arr), b -> b >= graft_n), 1), -1L)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("graft_n")).as("sum_tokens"))
      .withColumn("padded_tokens",
        when(col("bucket") === -1L, col("sum_tokens"))
          .otherwise(col("bucket") * col("n_docs")))
      .withColumn("waste_bp", expr(
        """CASE WHEN padded_tokens > 0
          |  THEN (20000 * (padded_tokens - sum_tokens) + padded_tokens)
          |       DIV (2 * padded_tokens)
          |  ELSE 0L END""".stripMargin))
  }

  /** Deterministic hard-negative sampling for contrastive training:
    * within each bucket (e.g. language — same-bucket negatives are
    * HARD negatives), documents are laid on a deterministic md5 ring
    * and each anchor takes the next `k` ring neighbors as negatives,
    * skipping any whose content digest equals the anchor's (an exact
    * duplicate is a false negative that poisons the objective). Ring
    * order is md5("neg:" + id), so the pairing is reproducible across
    * runs/engines and uncorrelated with ingestion order. Documents at
    * the ring tail yield fewer than `k` negatives (no wraparound —
    * keeps the op one window pass, no union stitch).
    *
    * One bucket-partitioned window over a narrow (id, digest) frame —
    * a single shuffle of two digests per row, never the text.
    */
  def hardNegatives(df: DataFrame, idCol: String, textCol: String,
                    bucketCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64], got $k")
    val w = Window.partitionBy(col(bucketCol))
      .orderBy(col("graft_sk"), col(idCol))
    val base = df.select(col(idCol), col(bucketCol),
      md5(coalesce(col(textCol), lit(""))).as("graft_h"),
      md5(concat(lit("neg:"), col(idCol).cast("string"))).as("graft_sk"))
    val withLeads = (1 to k).foldLeft(base) { (d, j) =>
      d.withColumn(s"graft_n$j", lead(col(idCol), j).over(w))
        .withColumn(s"graft_hn$j", lead(col("graft_h"), j).over(w))
    }
    val pairs = expr(
      (1 to k).map(j => s"struct(${j}L AS neg_rank, graft_n$j AS neg_id, " +
        s"graft_hn$j AS neg_h)").mkString("array(", ", ", ")"))
    withLeads
      .select(col(idCol), col(bucketCol), col("graft_h"), explode(pairs).as("p"))
      .filter(col("p.neg_id").isNotNull && col("p.neg_h") =!= col("graft_h"))
      .select(col(idCol), col(bucketCol), col("p.neg_rank").as("neg_rank"),
        col("p.neg_id").as("neg_id"))
  }

  /** Temperature-rebalanced mixture plan at α = 1/2: per-source weights
    * w_i = ⌊√(token count)⌋ — the square-root temperature sampling that
    * multilingual corpus builds use to lift low-resource sources
    * without letting the head dominate (α = 1 is proportional, α = 0
    * uniform; 1/2 is the standard compromise, and the ONE temperature
    * whose weight is integer-exact: isqrt needs no libm pow). The
    * token `budget` is allocated by largest remainder, so planned
    * token counts are integers summing EXACTLY to the budget —
    * provided at least one source has a positive token count. In the
    * degenerate all-zero-weight corpus (every source empty; NULL token
    * counts coalesce to 0) there is nothing to weight by: bases are 0
    * and the remainder pass hands one token to each of the first
    * `budget` sources in name order, so the plan sums to
    * min(|sources|, budget) — a deliberate no-op plan for a no-data
    * corpus rather than an arbitrary uniform split.
    *
    * One corpus aggregation to per-source token counts (persisted —
    * it feeds the weight total, the bases, and the final select);
    * everything after runs on the bounded |sources| frame (its rank
    * window is single-partition by construction). `floor(sqrt(·))` on
    * an exact integer double is engine-identical: IEEE sqrt is
    * correctly rounded, and perfect squares land exactly. Exact
    * within BIGINT while budget·max(weight) < 9.2e18 — e.g. a
    * 10^13-token budget against sources up to ~8·10^10 tokens
    * (weight ≤ ~2.8·10^5); beyond that, allocate in larger units
    * (budget in kilotokens) rather than letting the product wrap.
    */
  def temperatureMixture(df: DataFrame, srcCol: String, tokCol: String,
                         budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val n = CacheRegistry.persist(df.groupBy(col(srcCol))
      .agg(coalesce(sum(col(tokCol)), lit(0L)).as("n_tokens"))
      .withColumn("weight", expr(
        "CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)")))
    val tot = n.agg(sum(col("weight")).as("graft_tw"))
    val based = n.crossJoin(broadcast(tot))
      .withColumn("graft_tw", greatest(col("graft_tw"), lit(1L)))
      .withColumn("base", expr(s"(${budget}L * weight) DIV graft_tw"))
      .withColumn("rem", expr(s"(${budget}L * weight) % graft_tw"))
    val leftover = based.agg((lit(budget) - sum(col("base"))).as("graft_left"))
    based
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col(srcCol))).cast("long"))
      .crossJoin(broadcast(leftover))
      .select(col(srcCol), col("n_tokens"), col("weight"),
        expr("(20000 * weight + graft_tw) DIV (2 * graft_tw)").as("share_bp"),
        expr("base + IF(rk <= graft_left, 1L, 0L)").as("planned_tokens"))
  }

  /** Neyman (minimum-variance) sample allocation across strata: the
    * statistically optimal budget split n_h ∝ N_h·σ_h — sample noisy
    * strata more, uniform strata barely — the design step before a
    * stratified quality-eval or labeling run. Integer-deterministic
    * via the [[temperatureMixture]] machinery: N_h·σ_h = √(N·Σx² −
    * (Σx)²) exactly, taken as floor-sqrt (the q191 isqrt precedent;
    * exact while the discriminant < 2^52 — eval-scale, hash-sample
    * upstream beyond that), then largest-remainder rounding so the
    * allocations sum EXACTLY to the budget. Zero-variance strata get
    * weight 0 (nothing to learn from more of the same); all-zero
    * weights degrade to the guarded divisor like the mixture plan.
    * Output: (stratum, n_rows, neyman_weight, share_bp, allocated).
    */
  def neymanAllocation(df: DataFrame, strataCol: String, valCol: String,
                       budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val n = CacheRegistry.persist(df
      .filter(col(valCol).isNotNull)
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valCol).cast("long")).as("graft_sx"),
        sum(col(valCol).cast("long") * col(valCol).cast("long"))
          .as("graft_sxx"))
      .withColumn("neyman_weight", expr(
        """CAST(floor(sqrt(CAST(n_rows * graft_sxx -
          |  graft_sx * graft_sx AS DOUBLE))) AS BIGINT)""".stripMargin)))
    val tot = n.agg(sum(col("neyman_weight")).as("graft_tw"))
    val based = n.crossJoin(broadcast(tot))
      .withColumn("graft_tw", greatest(col("graft_tw"), lit(1L)))
      .withColumn("base", expr(s"(${budget}L * neyman_weight) DIV graft_tw"))
      .withColumn("rem", expr(s"(${budget}L * neyman_weight) % graft_tw"))
    val leftover = based.agg((lit(budget) - sum(col("base"))).as("graft_left"))
    based
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col(strataCol))).cast("long"))
      .crossJoin(broadcast(leftover))
      .select(col(strataCol), col("n_rows"), col("neyman_weight"),
        expr("(20000 * neyman_weight + graft_tw) DIV (2 * graft_tw)")
          .as("share_bp"),
        expr("base + IF(rk <= graft_left, 1L, 0L)").as("allocated"))
  }

  /** Exact ROC-AUC of the hashed quality classifier against the Gopher
    * rule battery: the Mann–Whitney U statistic over integer scores
    * with midrank tie handling, in HALF_UP basis points — the one-
    * number answer to "is the cheap classifier ordering documents the
    * way the rules would" before a 100-TB routing decision (the
    * threshold-free companion to [[classifierCalibration]]).
    *
    * Doubled midranks keep everything integer: for a tied score block
    * of size c after C lower-ranked rows, midrank·2 = 2C + c + 1; then
    * 2U = Σ_pos midrank·2 − nPos·(nPos+1) and
    * AUC = 2U / (2·nPos·nNeg), exactly.
    *
    * The rank window runs over the DISTINCT-SCORE table, which is
    * bounded by the score range (|score| ≤ 8·max tokens), not the
    * corpus. Exact within BIGINT while nPos·nNeg < 4.6e14 — AUC is an
    * eval-set metric; hash-sample upstream for larger labeled sets.
    */
  def classifierAuc(df: DataFrame, idCol: String, textCol: String,
                    minWords: Long = 50L): DataFrame = {
    val scores = TextAnalysis.hashedClassifier(df, idCol, textCol)
      .select(col("id"), col("score"))
    val labels = gopherRules(df, idCol, textCol, minWords)
      .select(col("id"), col("keep"))
    aucFromScores(scores.join(labels, Seq("id")), "score", "keep")
  }

  /** The Mann–Whitney core of [[classifierAuc]] over an arbitrary
    * (score, 0/1 label) frame: (n_pos, n_neg, auc_bp), −1 when a class
    * is empty.
    */
  def aucFromScores(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byScore = df
      .groupBy(col(scoreCol).as("graft_s"))
      .agg(count(lit(1)).as("c"), sum(col(labelCol)).as("p"))
    val w = Window.orderBy(col("graft_s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("cum", coalesce(sum(col("c")).over(w), lit(0L)))
      .withColumn("mr2", lit(2L) * col("cum") + col("c") + 1L)
      .agg(sum(col("p")).as("n_pos"), sum(col("c") - col("p")).as("n_neg"),
        sum(col("p") * col("mr2")).as("r2"))
      .select(col("n_pos"), col("n_neg"),
        expr("""CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(-1 AS BIGINT)
                |ELSE (20000 * (r2 - n_pos * (n_pos + 1)) + 2 * n_pos * n_neg)
                |     DIV (4 * n_pos * n_neg) END""".stripMargin).as("auc_bp"))
  }

  /** Shard manifest for the corpus writer: within each source (in id
    * order), documents are laid out sequentially and cut into shards of
    * `budget` tokens — a document belongs to the shard its START offset
    * falls in. Emits one manifest row per shard: document count, real
    * token load, the id range (what the writer needs to seek), and the
    * fill ratio vs budget in HALF_UP basis points. The planning step
    * before a 100-TB corpus is written out as ~even training shards —
    * uneven shards are stragglers at read time.
    *
    * The running offset is a window prefix sum PARTITIONED BY SOURCE
    * (distributed across sources; within one source the prefix sum is
    * inherently sequential — for a corpus dominated by a single giant
    * source, pre-split it with a salt column upstream), then one
    * map-side-combinable groupBy over (source, shard).
    */
  def shardPlan(df: DataFrame, srcCol: String, idCol: String,
                tokCol: String, budget: Long): DataFrame =
    shardAssign(df, srcCol, idCol, tokCol, Nil, budget)
      .groupBy(col(srcCol), col("shard_ix"))
      .agg(count(lit(1)).as("n_docs"), sum(col("graft_toks")).as("shard_tokens"),
        min(col(idCol)).as("first_id"), max(col(idCol)).as("last_id"))
      .withColumn("fill_bp",
        expr(s"(20000 * shard_tokens + ${budget}L) DIV (2 * ${budget}L)"))

  /** Per-document shard assignment shared by [[shardPlan]] and
    * [[shardChecksums]]: the per-source prefix-sum window plus
    * `shard_ix` by start offset, carrying any `extraCols` through.
    */
  private def shardAssign(df: DataFrame, srcCol: String, idCol: String,
                          tokCol: String, extraCols: Seq[String],
                          budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(srcCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select((Seq(srcCol, idCol).map(col) :+
        col(tokCol).cast("long").as("graft_toks")) ++ extraCols.map(col): _*)
      .withColumn("graft_cum", sum(col("graft_toks")).over(w))
      .withColumn("shard_ix", expr(s"(graft_cum - graft_toks) DIV ${budget}L"))
  }

  /** Shard integrity manifest: the [[shardPlan]] layout with a
    * commutative per-shard content checksum — the sum of each member
    * document's 48-bit md5 — so a writer (or a later audit) can verify
    * a shard's contents without ordering guarantees: any dropped,
    * duplicated, or substituted document moves the sum. One window +
    * one map-side-combinable groupBy, same cost as the plan itself.
    */
  def shardChecksums(df: DataFrame, srcCol: String, idCol: String,
                     tokCol: String, textCol: String, budget: Long): DataFrame =
    // digest BEFORE the window: the prefix-sum exchange then ships ~8
    // bytes per row, not the document text
    shardAssign(
        df.withColumn("graft_h",
          conv(substring(md5(coalesce(col(textCol), lit(""))), 1, 12), 16, 10)
            .cast("long")),
        srcCol, idCol, tokCol, Seq("graft_h"), budget)
      .groupBy(col(srcCol), col("shard_ix"))
      .agg(count(lit(1)).as("n_docs"), sum(col("graft_toks")).as("shard_tokens"),
        sum(col("graft_h")).as("content_sum"))

  /** PHYSICALLY write the [[shardPlan]] layout: the per-source
    * budget-cut shard assignment materialized as one parquet file per
    * shard under `outDir/data/<src>=…/shard_ix=N/`, plus the
    * [[shardChecksums]] manifest (source, shard_ix, n_docs,
    * shard_tokens, content_sum) under `outDir/manifest/` — the packed
    * artifact + integrity record a training job actually consumes.
    * Returns the manifest as read back from disk.
    *
    * Layout contract: rows within a shard are sorted by `idCol`, and
    * the pre-write repartition on (source, shard_ix) puts each shard
    * wholly in one task, so each shard directory holds exactly ONE
    * file with a deterministic byte-for-byte content — a re-run over
    * the same corpus rewrites identical shards (file NAMES carry a
    * task uuid; content is what the checksums pin).
    *
    * Scale shape: one prefix-sum window per source (the text column
    * rides through that one exchange — the writer must move the bytes
    * to their shard exactly once; the md5 is computed BEFORE the
    * window so the manifest agg ships no text) + one repartition =
    * the minimum two data movements any physical shard writer pays.
    * The assignment frame is persisted because it feeds both the data
    * write and the manifest agg.
    */
  def writeShards(df: DataFrame, srcCol: String, idCol: String,
                  tokCol: String, textCol: String, budget: Long,
                  outDir: String): DataFrame = {
    val spark = df.sparkSession
    val withH = df.withColumn("graft_h",
      conv(substring(md5(coalesce(col(textCol), lit(""))), 1, 12), 16, 10)
        .cast("long"))
    val assigned = CacheRegistry.persist(
      shardAssign(withH, srcCol, idCol, tokCol, Seq("graft_h", textCol), budget))
    assigned
      .select(col(srcCol), col("shard_ix"), col(idCol),
        col("graft_toks").as("n_tokens"), col(textCol))
      .repartition(col(srcCol), col("shard_ix"))
      .sortWithinPartitions(col(srcCol), col("shard_ix"), col(idCol))
      .write.mode("overwrite").partitionBy(srcCol, "shard_ix")
      .parquet(s"$outDir/data")
    assigned
      .groupBy(col(srcCol), col("shard_ix"))
      .agg(count(lit(1)).as("n_docs"), sum(col("graft_toks")).as("shard_tokens"),
        sum(col("graft_h")).as("content_sum"))
      .repartition(1)
      .sortWithinPartitions(col(srcCol), col("shard_ix"))
      .write.mode("overwrite").parquet(s"$outDir/manifest")
    spark.read.parquet(s"$outDir/manifest")
  }

  /** Deterministic training-order shuffle key: a 48-bit md5 of
    * (seed, id). Globally ordering by (shuffle_key, id) is a uniform
    * reshuffle of the corpus that any engine reproduces bit-for-bit and
    * that re-runs replay exactly — the property training pipelines need
    * for resumable epoch ordering. The operator emits only the KEY (a
    * narrow codegen'd pass); the materializing writer does the
    * range-partitioned sort, which is Spark's scalable global sort —
    * no window over an unpartitioned frame anywhere.
    */
  def shuffleKey(df: DataFrame, idCol: String, seed: String): DataFrame =
    df.withColumn("shuffle_key",
      conv(substring(md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))), 1, 12), 16, 10)
        .cast("long"))

  /** Deterministic train/validation/test split assignment: bucket =
    * md5(seed, id) mod 100; [0, trainPct) → "train", [trainPct,
    * trainPct+valPct) → "val", rest → "test". Stable across runs and
    * engines, disjoint and exhaustive by construction, and a pure
    * narrow pass — the split of a 100 TB corpus costs one scan.
    */
  def assignSplit(df: DataFrame, idCol: String, seed: String,
                  trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100, "invalid split percentages")
    val bucket =
      conv(substring(md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))), 1, 12), 16, 10)
        .cast("long") % 100
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Text normalization for dedup/tokenization pre-passes: ASCII
    * lowercase (A-Z only — locale-independent, so every engine agrees;
    * full Unicode case folding is intentionally out of scope), control
    * characters stripped, space runs collapsed, ends trimmed. Pure
    * expressions, shuffle-free.
    */
  def normalizeText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val upperAz = ('A' to 'Z').mkString
    val lowerAz = ('a' to 'z').mkString
    val cleaned =
      trim(regexp_replace(
        regexp_replace(
          translate(col(textCol), upperAz, lowerAz),
          "[\\x00-\\x1f\\x7f]", " "),
        " +", " "))
    df.withColumn("norm_text", cleaned)
      .withColumn("norm_len", length(col("norm_text")).cast("long"))
  }

  /** Source-level blocklist generation — the domain-filtering decision a
    * crawl pipeline makes ABOVE the document level (drop whole feeds
    * whose content is copied or low-quality, CCNet/RefinedWeb style).
    * Per source: document count, documents that are exact duplicates of
    * an earlier document ANYWHERE in the corpus (same text, not the
    * minimum id — the [[Dedup.exactGroups]] survivor rule), their rate
    * in basis points, the mean whitespace-token count (both integer
    * HALF_UP — no float on either engine), and the block verdict:
    * `dup_bp > maxDupBp OR mean_tokens < minMeanTokens`.
    *
    * Scale shape: one text-keyed aggregation computes each text group's
    * minimum id (map-side combinable, distinct-texts-sized output), the
    * corpus picks up its dup flag through a text-keyed join, and the
    * source rollup is a second bounded aggregation — no windows, no
    * driver collects, volume never exceeds one corpus pass per stage.
    * Returns (source, n_docs, n_dups, dup_bp, mean_tokens, blocked).
    */
  def sourceBlocklist(df: DataFrame, idCol: String, textCol: String,
                      srcCol: String, maxDupBp: Long = 1000L,
                      minMeanTokens: Long = 10L): DataFrame = {
    val base = df.select(
      col(idCol).cast("long").as("graft_id"), col(srcCol).as("source"),
      col(textCol).as("graft_t"),
      size(split(col(textCol), " ")).cast("long").as("graft_tok"))
    val firstIds = base.groupBy(col("graft_t"))
      .agg(min(col("graft_id")).as("graft_first"))
    base.join(firstIds, Seq("graft_t"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("graft_id") =!= col("graft_first"), 1L).otherwise(0L)).as("n_dups"),
        sum(col("graft_tok")).as("graft_tok_sum"))
      .select(col("source"), col("n_docs"), col("n_dups"),
        expr("(20000 * n_dups + n_docs) div (2 * n_docs)").as("dup_bp"),
        expr("(2 * graft_tok_sum + n_docs) div (2 * n_docs)").as("mean_tokens"))
      .withColumn("blocked",
        (col("dup_bp") > maxDupBp || col("mean_tokens") < minMeanTokens).cast("long"))
  }

  /** The Gopher quality-rule battery (Rae et al. 2021, App. A1 —
    * the published heuristic filter most large text pipelines start
    * from), each rule an independent integer-exact flag so downstream
    * analysis can attribute removals per rule:
    *
    *   - word count outside [minWords, maxWords]
    *   - mean word length outside [3, 10] characters (×100 HALF_UP)
    *   - symbol-to-word ratio over 10% ('#' and '...' per Gopher, bp)
    *   - under 80% of words containing an alphabetic character (bp)
    *   - fewer than 2 of the 8 Gopher stopwords present
    *
    * Every ratio is integer basis points / centi-chars with HALF_UP
    * rounding — no float on any engine. `keep` = no rule fired. One
    * narrow zero-shuffle scan (all rules are per-row array
    * expressions); at 100 TB this runs at parquet-read speed. Returns
    * (id, n_words, mean_wlen_c, symbol_bp, alpha_bp, n_stop,
    *  f_word_count, f_word_len, f_symbol, f_alpha, f_stop, keep).
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
                  minWords: Long = 50L, maxWords: Long = 100000L,
                  carryCols: Seq[String] = Nil): DataFrame = {
    val stops = "'the','be','to','of','and','that','have','with'"
    df.select(col(idCol).as("id") +: col(textCol).as("graft_t") +:
        carryCols.map(col): _*)
      .withColumn("ws", split(col("graft_t"), " "))
      .withColumn("n_words", size(col("ws")).cast("long"))
      // character mass of the words = text length minus the separators
      .withColumn("graft_chars",
        (length(col("graft_t")) - (col("n_words") - 1)).cast("long"))
      .withColumn("mean_wlen_c",
        expr("(200 * graft_chars + n_words) div (2 * n_words)"))
      .withColumn("graft_sym", expr(
        """CAST(length(graft_t) - length(replace(graft_t, '#', ''))
          |  + (length(graft_t) - length(replace(graft_t, '...', ''))) div 3
          |  AS BIGINT)""".stripMargin))
      .withColumn("symbol_bp",
        expr("(20000 * graft_sym + n_words) div (2 * n_words)"))
      .withColumn("graft_alpha",
        expr("CAST(size(filter(ws, x -> x rlike '[a-zA-Z]')) AS BIGINT)"))
      .withColumn("alpha_bp",
        expr("(20000 * graft_alpha + n_words) div (2 * n_words)"))
      .withColumn("n_stop",
        expr(s"CAST(size(filter(array($stops), s -> array_contains(ws, s))) AS BIGINT)"))
      .withColumn("f_word_count",
        (col("n_words") < minWords || col("n_words") > maxWords).cast("long"))
      .withColumn("f_word_len",
        (col("mean_wlen_c") < 300L || col("mean_wlen_c") > 1000L).cast("long"))
      .withColumn("f_symbol", (col("symbol_bp") > 1000L).cast("long"))
      .withColumn("f_alpha", (col("alpha_bp") < 8000L).cast("long"))
      .withColumn("f_stop", (col("n_stop") < 2L).cast("long"))
      .withColumn("keep",
        (col("f_word_count") + col("f_word_len") + col("f_symbol") +
          col("f_alpha") + col("f_stop") === 0L).cast("long"))
      .drop("graft_t", "ws", "graft_chars", "graft_sym", "graft_alpha")
  }

  /** Classifier reliability curve — does the cheap hashed-n-gram
    * quality classifier's score actually track the expensive rule
    * battery's verdict? Bucket [[TextAnalysis.hashedClassifier]] scores
    * into fixed-width bins and report each bin's [[gopherRules]] keep
    * rate: a monotone curve means the classifier threshold is tunable,
    * a flat one means it learned nothing — the check to run BEFORE
    * replacing rule filtering with classifier filtering at 100 TB
    * (where the rules' regex battery is the expensive pass). Bins use
    * explicit floor semantics (`-((w−1−s) div w)` for s<0) so both
    * engines bin negatives identically. Two narrow per-doc passes and
    * one id-keyed join, then a bin-bounded agg. Output: (score_bin,
    * n_docs, n_keep, keep_bp HALF_UP).
    */
  def classifierCalibration(df: DataFrame, idCol: String, textCol: String,
      binWidth: Long = 8L, minWords: Long = 50L): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val scores = TextAnalysis.hashedClassifier(df, idCol, textCol)
      .select(col("id"), col("score"))
    val labels = gopherRules(df, idCol, textCol, minWords)
      .select(col("id"), col("keep"))
    scores.join(labels, Seq("id"))
      .withColumn("score_bin", expr(
        s"""CASE WHEN score >= 0 THEN score DIV $binWidth
           |     ELSE -((${binWidth - 1} - score) DIV $binWidth) END""".stripMargin))
      .groupBy(col("score_bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_keep"))
      .withColumn("keep_bp", expr("(20000 * n_keep + n_docs) DIV (2 * n_docs)"))
  }

  /** Cross-document chunk dedup — the RAG-prep step after
    * [[chunkWindows]]: overlapping windows cut from near-identical
    * documents flood a retrieval index with duplicate chunks; this
    * reports every chunk text that occurs more than once, with its
    * occurrence/document counts and the canonical first occurrence
    * (min (doc, idx)). Feed the survivors to the index; drop the rest.
    * One map-side-combinable aggregation over the in-row chunk
    * expansion — no joins, no corpus pairing. Output: (chunk_hash,
    * n_chunks, n_docs, first_doc, first_idx).
    */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
      width: Int, stride: Int): DataFrame =
    chunkWindows(df, idCol, textCol, width, stride)
      .groupBy(md5(col("chunk_text")).as("chunk_hash"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("id")).as("n_docs"),
        min(struct(col("id"), col("chunk_idx"))).as("graft_f"))
      .filter(col("n_chunks") >= 2)
      .select(col("chunk_hash"), col("n_chunks"), col("n_docs"),
        col("graft_f.id").as("first_doc"), col("graft_f.chunk_idx").as("first_idx"))

  /** Corpus report card — the per-source Gopher quality rollup every
    * curation run prints before filtering: how many documents each rule
    * flags and the keep rate, per source. Rule semantics are EXACTLY
    * [[gopherRules]]' (same flags, same integer thresholds); this adds
    * one source-keyed map-side-combinable aggregation with HALF_UP
    * keep_bp. Output: (source, n_docs, n_word_count, n_word_len,
    * n_symbol, n_alpha, n_stop, n_keep, keep_bp).
    */
  def gopherReport(df: DataFrame, idCol: String, srcCol: String, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    // the source column rides THROUGH the rules projection (narrow) —
    // joining flags back on id would shuffle the whole corpus twice
    // before this source-sized rollup
    val flags = gopherRules(df, idCol, textCol, minWords, maxWords,
      carryCols = Seq(srcCol))
    flags.withColumnRenamed(srcCol, "source")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("f_word_count")).as("n_word_count"),
        sum(col("f_word_len")).as("n_word_len"),
        sum(col("f_symbol")).as("n_symbol"),
        sum(col("f_alpha")).as("n_alpha"),
        sum(col("f_stop")).as("n_stop"),
        sum(col("keep")).as("n_keep"))
      .withColumn("keep_bp", expr("(20000 * n_keep + n_docs) DIV (2 * n_docs)"))
  }

  /** Token-budget mixture planning — the arithmetic a data-mixing run
    * does before sampling (the planning half of [[mixtureSample]]):
    * per source, the corpus token supply, the token demand implied by
    * the target mixture weight (ppm of `tokenBudget`), the sampling
    * rate that meets demand (capped at 10000 bp — you cannot sample
    * more than once without repeating), and the epoch count in
    * centi-epochs when demand exceeds supply (oversampling ×1.00+).
    * All integer HALF_UP — the plan is bit-identical on any engine.
    * Sources absent from `targetPpm` get weight 0. Returns
    * (source, n_docs, n_tokens, target_ppm, required_tokens,
    *  sample_bp, epochs_c).
    *
    * Scale shape: ONE source-keyed map-side-combinable aggregation;
    * the weight map rides as a literal map expression. Output is
    * sources-sized; nothing else touches the corpus.
    */
  def mixturePlan(df: DataFrame, srcCol: String, textCol: String,
                  targetPpm: Map[String, Long],
                  tokenBudget: Long): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    val entries = targetPpm.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    val ppmMap =
      if (entries.isEmpty) typedLit(Map.empty[String, Long]) else map(entries: _*)
    df.select(col(srcCol).as("source"),
        size(split(col(textCol), " ")).cast("long").as("graft_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("graft_tok")).as("n_tokens"))
      .withColumn("target_ppm",
        coalesce(ppmMap(col("source")), lit(0L)).cast("long"))
      // decimal-promoted: 2·ppm·budget overflows BIGINT past
      // ppm·budget ≈ 4.6e18 — i.e. any multi-trillion-token budget;
      // the quotient (≤ budget) fits BIGINT again
      .withColumn("required_tokens",
        expr(s"CAST((2 * CAST(target_ppm AS DECIMAL(38,0)) * ${tokenBudget}L" +
          " + 1000000) DIV 2000000 AS BIGINT)"))
      .withColumn("sample_bp",
        least(lit(10000L),
          expr("(20000 * required_tokens + n_tokens) div (2 * n_tokens)")))
      .withColumn("epochs_c",
        expr("(200 * required_tokens + n_tokens) div (2 * n_tokens)"))
  }

  /** One sorted-run aggregate over the document's word n-grams computing
    * BOTH repetition masses in a single pass (same idiom as [[topRun]]):
    * `best` = the largest count×strlen over any single gram (top-gram
    * char mass), `dups` = Σ count×strlen over grams occurring ≥ 2 times
    * (duplicated-gram char mass; the +2·len / +len steps accumulate
    * exactly c·len for every run of length c ≥ 2).
    */
  private def runMass(n: Int): String =
    s"""CASE WHEN size(ws) >= $n THEN aggregate(
       |  array_sort(transform(sequence(0, size(ws) - $n),
       |    i -> concat_ws(' ', slice(ws, i + 1, $n)))),
       |  struct(CAST('' AS STRING) AS prev, CAST(0 AS BIGINT) AS run,
       |         CAST(0 AS BIGINT) AS best, CAST(0 AS BIGINT) AS dups),
       |  (acc, x) -> struct(
       |    x AS prev,
       |    CASE WHEN x = acc.prev THEN acc.run + 1 ELSE CAST(1 AS BIGINT) END AS run,
       |    greatest(acc.best,
       |      (CASE WHEN x = acc.prev THEN acc.run + 1 ELSE CAST(1 AS BIGINT) END)
       |        * length(x)) AS best,
       |    acc.dups + CASE
       |      WHEN x = acc.prev AND acc.run = 1 THEN 2 * length(x)
       |      WHEN x = acc.prev THEN length(x)
       |      ELSE CAST(0 AS BIGINT) END AS dups),
       |  acc -> struct(acc.best AS best, acc.dups AS dups))
       |ELSE struct(CAST(0 AS BIGINT) AS best, CAST(0 AS BIGINT) AS dups) END"""
      .stripMargin

  /** Gopher repetition-rule battery (Rae et al. 2021 App. A1, the
    * n-gram half): per document, the character mass of the single most
    * frequent word n-gram for n = 2..4 (`top{n}_bp`) and of all
    * duplicated word n-grams for n = 5..10 (`dup{n}_bp`), each in
    * integer basis points of the document's word-character mass with
    * HALF_UP rounding, plus the published per-n threshold flags and the
    * combined keep. Char mass = count × gram length (words + internal
    * separators) — a documented deterministic proxy for the paper's
    * "fraction of characters".
    *
    * Scale shape: every measure is ONE in-row pass over the document's
    * sorted gram array ([[runMass]]) — no explode, no groupBy, zero
    * shuffles at any corpus size; the 9 measures widen the row, not the
    * plan.
    */
  def gopherRepetitionRules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val topBp = Map(2 -> 2000L, 3 -> 1800L, 4 -> 1600L)
    val dupBp = Map(5 -> 1500L, 6 -> 1400L, 7 -> 1300L, 8 -> 1200L,
      9 -> 1100L, 10 -> 1000L)
    val base = df.select(col(idCol).as("id"), col(textCol).as("graft_t"))
      .withColumn("ws", split(col("graft_t"), " "))
      .withColumn("graft_chars",
        (length(col("graft_t")) - (size(col("ws")) - 1)).cast("long"))
    val withMeasures = (2 to 10).foldLeft(base) { (d, n) =>
      val mass = if (n <= 4) s"(${runMass(n)}).best" else s"(${runMass(n)}).dups"
      val cName = if (n <= 4) s"top${n}_bp" else s"dup${n}_bp"
      d.withColumn(cName,
        expr(s"(20000 * ($mass) + graft_chars) div (2 * graft_chars)"))
    }
    val flagged = (2 to 10).foldLeft(withMeasures) { (d, n) =>
      val (cName, fName, thr) =
        if (n <= 4) (s"top${n}_bp", s"f_top$n", topBp(n))
        else (s"dup${n}_bp", s"f_dup$n", dupBp(n))
      d.withColumn(fName, (col(cName) > thr).cast("long"))
    }
    val flagSum = (2 to 10).map(n =>
      col(if (n <= 4) s"f_top$n" else s"f_dup$n")).reduce(_ + _)
    flagged.withColumn("keep", (flagSum === 0L).cast("long"))
      .drop("graft_t", "ws", "graft_chars")
  }

  /** Leakage-free train/val/test split: assign by DUPLICATE CLUSTER,
    * not by document, so two copies of the same text can never land in
    * different splits (the subtle eval-contamination bug a per-doc hash
    * split ships silently — q95 audits it, this prevents it). Cluster
    * key = min doc id per exact canonical text; the split hash runs on
    * the cluster id through the same seeded md5 bucket as
    * [[assignSplit]]. Scale shape: one text-keyed min agg (map-side
    * combinable) + one text-keyed join — both on the canonical-text
    * key, the exact-dedup shape. For near-dup-safe splits feed
    * [[Dedup.connectedComponents]] output as the cluster instead.
    * Output: (id, cluster_id, split).
    */
  def clusterSplit(df: DataFrame, idCol: String, textCol: String, seed: String,
      trainPct: Int, valPct: Int): DataFrame = {
    val canon = df.groupBy(col(textCol).as("graft_t"))
      .agg(min(col(idCol)).as("cluster_id"))
    val joined = df.select(col(idCol).as("id"), col(textCol).as("graft_t"))
      .join(canon, Seq("graft_t"))
    assignSplit(joined, "cluster_id", seed, trainPct, valPct)
      .select(col("id"), col("cluster_id"), col("split"))
  }

  /** Cut each document into overlapping fixed-width word windows — the
    * sequence-windowing step that turns long documents into training
    * rows (and RAG corpora into retrieval chunks): windows of `width`
    * words every `stride` words, the last window clipped to the text.
    * Chunk count is ceil((len − width)/stride) + 1, minimum one (a
    * short document yields itself). Pure in-row array expansion —
    * output volume is ~len/stride rows per doc and the scan stays
    * narrow, zero shuffles at any corpus size. Output: (id, chunk_idx,
    * n_words, chunk_text).
    */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
      width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0 && stride <= width,
      s"need 0 < stride <= width, got width=$width stride=$stride")
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("graft_ws"))
      .withColumn("graft_len", size(col("graft_ws")).cast("long"))
      // truncating DIV and floor // agree here: for len < width the
      // greatest(1, ...) floor takes over on both engines
      .withColumn("graft_nc", greatest(lit(1L),
        expr(s"((graft_len - $width + $stride - 1) DIV $stride) + 1")))
      .select(col("id"), explode(expr(
        s"""transform(sequence(0L, graft_nc - 1), i -> struct(
           |  i AS chunk_idx,
           |  least(CAST($width AS BIGINT), graft_len - i * $stride) AS n_words,
           |  array_join(slice(graft_ws, CAST(i * $stride + 1 AS INT), $width), ' ') AS chunk_text))"""
          .stripMargin)).as("c"))
      .select(col("id"), col("c.chunk_idx").as("chunk_idx"),
        col("c.n_words").as("n_words"), col("c.chunk_text").as("chunk_text"))
  }

  /** Exact-count proportional stratified sample, largest-remainder
    * (Hare) apportionment: allocate EXACTLY `total` slots across strata
    * proportionally to their sizes — ⌊total·nᵢ/N⌋ each, the leftover
    * slots to the largest fractional remainders (ties → stratum asc) —
    * then take each stratum's quota in md5(seed:id) order. Unlike
    * [[hashSample]]'s per-row Bernoulli (binomially-distributed output
    * size) this hits the requested count exactly, which is what a fixed
    * token-budget mixture needs; it stays deterministic across engines
    * and runs.
    *
    * Scale shape: the allocation table is one map-side-combinable
    * groupBy (|strata| rows, all driver-free: the remainder ranking is
    * a window over |strata| rows). The per-stratum quota take needs a
    * rank within stratum — a sort-by-hash window partitioned by
    * stratum. At 100 TB a single giant stratum makes that window's
    * partition the straggler, so when quota ≪ stratum size, pre-filter
    * by hash prefix first (keep rows whose 12-hex-digit hash value <
    * ~2·quota/n fraction of the space — a superset of the final take,
    * since the take IS the quota smallest hashes) and rank only the
    * survivors; the pre-filter is a narrow pass. `overselect` controls
    * that safety factor; 0 (the default) disables the pre-filter (exact
    * rank over the full stratum). The pre-filter is a superset of the
    * final take only with high probability — an under-filled stratum is
    * OBSERVABLE (output count < total), never silent; re-run with a
    * larger factor or 0. A NULL stratum is a real stratum (null-safe
    * expansion join), and `total` > population fails loudly at run time
    * rather than silently undershooting. Output: (idCol, strataCol) of
    * the selected rows.
    */
  def largestRemainderSample(df: DataFrame, idCol: String, strataCol: String,
                             total: Long, seed: String,
                             overselect: Double = 0.0): DataFrame = {
    require(total >= 0, s"total must be >= 0, got $total")
    val sizes = df.groupBy(col(strataCol)).agg(count(lit(1)).as("graft_n"))
    val nTot = sizes.agg(sum(col("graft_n")).as("graft_nt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("graft_rem").desc, col(strataCol))
    // |strata| rows: the single-reducer window is bounded and fine
    val alloc = sizes.crossJoin(broadcast(nTot))
      .select(col(strataCol),
        col("graft_n"),
        expr(s"($total * graft_n) DIV graft_nt").as("graft_fl"),
        expr(s"($total * graft_n) % graft_nt").as("graft_rem"),
        expr(s"$total - sum(($total * graft_n) DIV graft_nt) OVER ()").as("graft_extra"))
      .withColumn("graft_rk", row_number().over(w))
      .select(col(strataCol),
        (col("graft_fl") +
          when(col("graft_rk") <= col("graft_extra"), lit(1L)).otherwise(lit(0L)))
          .as("graft_k0"),
        col("graft_n"))
      // total > N makes some quota exceed its stratum — the 'EXACTLY
      // total' contract is unsatisfiable, so fail LOUDLY at run time
      // (the sizes are unknowable at plan time), not by silently
      // returning fewer rows
      .withColumn("graft_k", expr(
        s"""CASE WHEN graft_k0 > graft_n THEN
           |  CAST(raise_error(concat('largestRemainderSample: total $total ',
           |    'exceeds the population; stratum quota ', CAST(graft_k0 AS STRING),
           |    ' > stratum size ', CAST(graft_n AS STRING))) AS BIGINT)
           |ELSE graft_k0 END""".stripMargin))
      .drop("graft_k0")
    val hashed = df.select(col(idCol), col(strataCol),
      conv(substring(md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))), 1, 12), 16, 10)
        .cast("long").as("graft_h"))
    // null-safe equi-join: groupBy above keeps a NULL stratum as a real
    // group with a real quota, so the expansion join must match it too
    // (a plain equi-join drops every null-stratum row and silently
    // undershoots the total)
    val joined = hashed.join(broadcast(alloc),
      hashed(strataCol) <=> alloc(strataCol), "inner")
      .drop(alloc(strataCol))
    val candidates =
      if (overselect <= 0.0) joined
      else joined.filter(
        // hash space is [0, 16^12); keep a ~overselect·k/n slice — a
        // superset of the k smallest hashes w.h.p.; rank() below stays
        // exact because selection only ever takes the k smallest
        col("graft_h").cast("double") <
          lit(overselect * 281474976710656.0) * col("graft_k") / col("graft_n"))
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("graft_h"), col(idCol))
    candidates.withColumn("graft_rn", row_number().over(ws))
      .filter(col("graft_rn") <= col("graft_k"))
      .select(col(idCol), col(strataCol))
  }

  /** Greedy maximum-coverage document selection — the classic (1−1/e)
    * greedy: pick `k` documents one at a time, each the one adding the
    * most not-yet-covered distinct tokens (ties → lowest id). The
    * diversity-first seed-set / eval-set picker: k documents that
    * jointly cover as much of the corpus vocabulary as greedily
    * possible.
    *
    * Scale shape: the exploded token table is persisted once
    * ([[CacheRegistry]]); each of the k steps is one left-anti join
    * against the winners' (bounded: ≤ k documents') token set plus one
    * map-side-combinable count aggregate, finished by a
    * TakeOrderedAndProject argmax — a SINGLE-ROW driver action per
    * step, the bounded-collect shape [[Dedup.connectedComponents]]'s
    * probe established (k ≤ 100 by `require`). Greedy selection is
    * inherently sequential in k; each step stays fully distributed.
    *
    * Output: (pick_rank, `idCol`, gain, covered_total), pick_rank
    * 1-based, covered_total the cumulative distinct-token coverage
    * (= Σ gains, since each gain counts newly covered tokens). Fewer
    * than k rows when the corpus runs out of documents.
    */
  def greedyCover(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 100, s"k must be in [1, 100], got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = CacheRegistry.persist(
      df.select(col(idCol).cast("long").as("graft_id"),
        explode(array_distinct(split(col(textCol), " "))).as("graft_tok")))
    val ids = toks.select(col("graft_id")).distinct()
    var winners = Vector.empty[Long]
    var results = Vector.empty[(Long, Long, Long, Long)]
    var covTot = 0L
    var exhausted = false
    var rank = 1
    while (rank <= k && !exhausted) {
      val remainingIds =
        if (winners.isEmpty) ids else ids.filter(!col("graft_id").isin(winners: _*))
      val uncovered =
        if (winners.isEmpty) toks
        else toks.join(
          toks.filter(col("graft_id").isin(winners: _*))
            .select(col("graft_tok")).distinct(),
          Seq("graft_tok"), "left_anti")
      val gains = remainingIds
        .join(uncovered.groupBy(col("graft_id")).agg(count(lit(1)).as("graft_gain")),
          Seq("graft_id"), "left")
        .select(col("graft_id"),
          coalesce(col("graft_gain"), lit(0L)).as("graft_gain"))
      // argmax: orderBy+limit(1) plans as TakeOrderedAndProject (per-
      // partition top-1 + driver merge), never a full sort
      val top = gains.orderBy(col("graft_gain").desc, col("graft_id")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val id = top(0).getLong(0)
        val gain = top(0).getLong(1)
        covTot += gain
        results :+= ((rank.toLong, id, gain, covTot))
        winners :+= id
        rank += 1
      }
    }
    results.toDF("pick_rank", idCol, "gain", "covered_total")
  }
}
