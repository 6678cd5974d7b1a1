package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the headline queries — pins the
  * properties the 100 TB scale story depends on, so a refactor that
  * silently introduces a shuffle, loses a broadcast, or widens a scan
  * fails CI rather than a cluster run.
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-plan-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Final (post-AQE) physical plan string of a SparkEntry query. */
  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // drive AQE to its final plan
    df.queryExecution.executedPlan.toString
  }

  /** Distinct hash exchanges — the AQE plan string prints subtrees twice
    * (initial + final, with fresh plan_ids), so raw substring counts
    * double-count; dedup on the partitioning expression instead.
    */
  private def hashExchanges(p: String): Int =
    "Exchange hashpartitioning\\([^)]*\\)".r.findAllIn(p).toSet.size

  test("dim joins broadcast the small side (no sort-merge shuffle)") {
    val p = planOf("q07_join_customer_nation_region")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join degraded to SMJ:\n$p")
  }

  test("group-by aggregation is partial (map-side combine) before the exchange") {
    val p = planOf("q02_agg_flag_status")
    assert(p.contains("partial_"), s"no map-side partial aggregation:\n$p")
  }

  test("per-document repetition stats run with no exchange at all") {
    val p = planOf("q53_repetition_stats")
    // the only allowed exchange is the final presentation orderBy
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 0, s"narrow per-doc scan acquired a shuffle:\n$p")
  }

  test("deterministic sampling is a scan-level filter with no exchange") {
    val p = planOf("q54_hash_sample")
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
      s"sampling should not shuffle:\n$p")
    assert(p.contains("Filter"), s"expected a filter over the scan:\n$p")
  }

  test("top-k uses TakeOrderedAndProject, not a global sort") {
    val p = planOf("q19_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), s"top-k did a full sort:\n$p")
  }

  test("quality gate is a shuffle-free narrow pass") {
    val p = planOf("q57_quality_gate")
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
      s"quality gate acquired a shuffle:\n$p")
  }

  test("corpus top-ngrams partially aggregates and take-orders the top k") {
    val p = planOf("q58_top_ngrams")
    assert(p.contains("partial_"), s"no map-side partial aggregation:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k did a full sort:\n$p")
  }

  test("range join window-bins instead of a cartesian/nested-loop product") {
    val p = planOf("q63_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join degraded to an all-pairs product:\n$p")
  }

  test("HLL sketch aggregates partially on both groupBy levels") {
    val p = planOf("q64_hll_distinct")
    assert(p.contains("partial_"), s"sketch lost map-side combine:\n$p")
  }

  test("CMS heavy hitters finish on the driver: final plan reads no parquet") {
    // the corpus is scanned ONCE while building the bounded sketch/top-k;
    // the returned result is a local relation (see Sketches.cmsHeavyHitters),
    // so only the 20-row presentation orderBy remains in the plan
    val df = SparkEntry.queries("q65_cms_heavy_hitters")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("FileScan"), s"q65 result should be a local relation:\n$p")
    assert(p.contains("LocalTableScan"), s"q65 result should be a local relation:\n$p")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "cmsHeavyHitters leaked its vocabulary cache")
  }

  test("weighted sampling take-orders instead of a global sort") {
    val p = planOf("q66_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), s"sample did a full sort:\n$p")
  }

  test("contamination probe broadcasts the bench side; corpus side never shuffles pre-join") {
    val df = SparkEntry.queries("q67_contamination")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"bench grams must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"probe degraded to SMJ:\n$p")
    // exactly one hash exchange: the final per-pair groupBy (per-doc gram
    // dedup happens inside the scan via array_distinct, not a shuffle)
    assert(hashExchanges(p) <= 1, s"expected only the per-pair groupBy exchange:\n$p")
  }

  test("per-dimension embedding stats are one partial aggregation") {
    val p = planOf("q68_embed_dim_stats")
    assert(p.contains("partial_"), s"dim stats lost map-side combine:\n$p")
    assert(hashExchanges(p) <= 1, s"dim stats should shuffle only (dim) rows once:\n$p")
  }

  test("split assignment and text normalization are shuffle-free narrow passes") {
    Seq("q70_split_assign", "q71_text_normalize").foreach { q =>
      val p = planOf(q)
      assert(hashExchanges(p) == 0, s"$q acquired a hash shuffle:\n$p")
      assert(!p.contains("Window"), s"$q acquired a window:\n$p")
    }
  }

  test("corpus shuffle is a range-partitioned global sort, not a single-partition window") {
    val p = planOf("q69_corpus_shuffle")
    assert(!p.contains("Window"), s"shuffle ordering must not use a window:\n$p")
    assert(p.contains("rangepartitioning"), s"expected a range-partitioned sort:\n$p")
  }

  test("stratified sample is a bounded aggregate, not a per-stratum window sort") {
    val p = planOf("q73_stratified_sample")
    assert(!p.contains("Window"), s"stratified sample degraded to a window sort:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"expected a typed top-k aggregate:\n$p")
  }

  test("grouped argmax is one partial aggregation, no window, no join") {
    val p = planOf("q75_best_per_group")
    assert(!p.contains("Window"), s"argmax degraded to a window sort:\n$p")
    assert(!p.contains("Join"), s"argmax acquired a join:\n$p")
    assert(p.contains("partial_"), s"argmax lost map-side combine:\n$p")
    assert(hashExchanges(p) <= 1, s"argmax should shuffle group rows once:\n$p")
  }

  test("doc frequency partially aggregates both levels and take-orders the top k") {
    val p = planOf("q76_doc_frequency")
    assert(p.contains("partial_"), s"doc frequency lost map-side combine:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k degraded to a global sort:\n$p")
  }

  test("bloom probe is a narrow scan: zero shuffles before the membership join") {
    val df = SparkEntry.queries("q77_bloom_probe")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"membership flag lost its broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"bloom probe corpus side shuffled:\n$p")
  }

  test("decontamination broadcasts the bench grams; flagged ids carry no forced hint") {
    // The bench-gram side is bounded (eval suites are small by
    // construction) so it may broadcast; the flagged-id set is bounded
    // only by |train| and must reach the planner UNHINTED — AQE
    // broadcasts it at runtime when it actually measures small (as it
    // does at this sf, hence the executed-plan broadcast check stays).
    // NOTE: ResolvedHint nodes never survive optimization
    // (EliminateResolvedHint folds them into Join.hint), so the pin
    // inspects Join.hint itself.
    val df = SparkEntry.queries("q78_decontaminate")(spark, dir)
    val hinted = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.hint.leftHint.exists(_.strategy.isDefined) ||
            j.hint.rightHint.exists(_.strategy.isDefined) => j
    }
    assert(hinted.size == 1, // exactly the bench-gram broadcast, nothing else
      s"expected only the bench-gram hint, found ${hinted.size}:\n" +
        df.queryExecution.optimizedPlan.toString)
    // examine only the AQE FINAL plan — the unhinted initial plan
    // legitimately says SortMergeJoin until runtime stats arrive
    val p = planOf("q78_decontaminate").split("== Initial Plan ==").head
    assert(!p.contains("SortMergeJoin"), s"decontaminate shuffled a join side:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
  }

  test("length histogram and group quantiles shuffle only group rows once") {
    Seq("q79_length_histogram", "q74_length_quantiles").foreach { q =>
      val p = planOf(q)
      assert(p.contains("partial_") || p.contains("ObjectHashAggregate"),
        s"$q lost map-side combine:\n$p")
      assert(hashExchanges(p) <= 1, s"$q shuffles more than once:\n$p")
    }
  }

  test("simhash signatures are a shuffle-free narrow pass") {
    val p = planOf("q32_dedup_simhash")
    assert(hashExchanges(p) == 0, s"simhash acquired a shuffle:\n$p")
    assert(!p.contains("Generate"), s"simhash acquired an explode:\n$p")
  }

  test("IVF assignment is in-row: only the final top-k window shuffles") {
    val p = planOf("q50_ivf_ann")
    assert(p.contains("BroadcastHashJoin"), s"probe join lost its broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"IVF corpus side shuffled for a join:\n$p")
    assert(hashExchanges(p) <= 1,
      s"IVF should shuffle only the per-query candidate window:\n$p")
  }

  test("LSH bucket assignment adds no exploded-corpus shuffles") {
    // q35 = bucket + persist + broadcast-query join + top-k window;
    // everything beyond the bucketed-corpus persist is bounded, so the
    // plan must not contain a posexplode of the corpus vectors
    val p = planOf("q35_ann_lsh_bucketed")
    assert(!p.contains("posexplode"), s"bucket stage re-acquired the vector explode:\n$p")
  }

  test("per-key cap flags ride a broadcast join, never a per-key window") {
    val p = planOf("q83_source_cap")
    assert(!p.contains("Window"), s"cap degraded to a window sort:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"pick-set flag join lost its broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"cap shuffled the corpus for the flag join:\n$p")
  }

  test("incremental dedup forms no batch-by-reference product") {
    val p = planOf("q84_incremental_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"incremental dedup degraded to a cross product:\n$p")
  }

  test("funnel is one user-keyed aggregation, no joins") {
    val p = planOf("q80_funnel")
    assert(!p.contains("Join"), s"funnel acquired a per-stage join:\n$p")
    assert(hashExchanges(p) <= 1, s"funnel should shuffle users once:\n$p")
  }

  test("segment dedup partially aggregates first-occurrences and never crosses") {
    val p = planOf("q89_segment_dedup")
    assert(p.contains("partial_"), s"first-occurrence min lost map-side combine:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"segment flag join degraded to an all-pairs product:\n$p")
  }

  test("frequency spectrum is two partial aggregations and prunes to the text column") {
    val df = SparkEntry.queries("q90_frequency_spectrum")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_"), s"token counting lost map-side combine:\n$p")
    assert(hashExchanges(p) <= 2, s"spectrum should shuffle tokens then counts:\n$p")
    val schemas = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(schemas.nonEmpty && schemas.forall(s => !s.contains("source")),
      s"documents scan reads unused columns:\n$p")
  }

  test("columnar chunk-table scan stays narrow: no hash exchange before the sort") {
    val p = planOf("q94_columnar_scan")
    assert(hashExchanges(p) == 0,
      s"columnar scan path acquired a shuffle before presentation:\n$p")
    assert(!p.contains("Join"), s"columnar scan path acquired a join:\n$p")
  }

  test("kmeans assignment is a narrow scan: one bounded update aggregation, no joins") {
    val p = planOf("q92_kmeans_step")
    assert(!p.contains("Join"), s"assignment degraded to a seed join:\n$p")
    assert(p.contains("partial_"), s"centroid update lost map-side combine:\n$p")
    assert(hashExchanges(p) <= 1,
      s"kmeans step should shuffle only the (cluster, dim) update:\n$p")
  }

  test("source overlap expands pairs in-row: no self-join, bounded per-segment state") {
    val p = planOf("q91_source_overlap")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("CartesianProduct"),
      s"overlap matrix acquired a corpus self-join:\n$p")
    assert(p.contains("partial_") || p.contains("ObjectHashAggregate"),
      s"source-set collection lost partial aggregation:\n$p")
  }

  test("outlier flags broadcast the per-group stats back onto the scan") {
    val p = planOf("q98_value_outliers")
    assert(p.contains("partial_"), s"stats aggregation lost map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), s"stats join degraded to a product:\n$p")
  }

  test("cluster-purity matrix assignment stays narrow: one bounded groupBy") {
    val p = planOf("q97_cluster_label_matrix")
    assert(!p.contains("SortMergeJoin"), s"assignment acquired a corpus join:\n$p")
    assert(p.contains("partial_"), s"contingency count lost map-side combine:\n$p")
  }

  test("minhash agreement joins candidates only, never the corpus crosswise") {
    val p = planOf("q100_minhash_agreement")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"agreement join degraded to an all-pairs product:\n$p")
  }

  test("token counting prunes the documents scan to the needed columns") {
    val df = SparkEntry.queries("q38_token_counts")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val schemas = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(schemas.nonEmpty, s"no parquet scan found:\n$p")
    schemas.foreach { s =>
      assert(!s.contains("source") && !s.contains("n_chars"),
        s"documents scan reads unused columns: $s")
    }
  }

  test("duplicate spans never self-join the corpus; gram count keeps map-side combine") {
    val p = planOf("q101_duplicate_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span extraction degraded to an all-pairs product:\n$p")
    assert(p.contains("partial_"), s"gram document-frequency lost map-side combine:\n$p")
  }

  test("lm score joins per-distinct-bigram tables; vocab rides a 1-row broadcast") {
    val p = planOf("q102_lm_score")
    assert(!p.contains("CartesianProduct"),
      s"lm scoring acquired an unbounded product:\n$p")
    assert(p.contains("partial_"), s"bigram counts lost map-side combine:\n$p")
  }

  test("mixture sample is one rank window on the source key, no joins") {
    val p = planOf("q103_mixture_sample")
    assert(!p.contains("Join"), s"quota lookup degraded to a join:\n$p")
    assert(hashExchanges(p) <= 1,
      s"mixture sampling should shuffle once on the source key:\n$p")
  }

  test("vocab growth shuffles grams and buckets; the cumsum window is curve-sized") {
    val p = planOf("q104_vocab_growth")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"growth curve acquired a corpus-scale join:\n$p")
    assert(p.contains("partial_"), s"first-rank aggregation lost map-side combine:\n$p")
  }

  test("semantic dedup pairs only within clusters: cluster-keyed join, no all-pairs") {
    val p = planOf("q105_semantic_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"SemDeDup degraded to an all-pairs product:\n$p")
    // AQE may broadcast the smaller side at tiny SF; either way the join
    // key must be cluster_id so candidate volume stays per-cluster squares
    assert(p.contains("hashpartitioning(cluster_id") ||
      p.contains("BroadcastHashJoin [cluster_id"),
      s"pair join must be keyed on cluster_id:\n$p")
  }

  test("quality representatives add one bounded cluster agg, never a corpus window") {
    val p = planOf("q106_quality_rep")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"representative pick acquired an unbounded product:\n$p")
    assert(p.contains("partial_"),
      s"cluster max(struct) lost map-side combine:\n$p")
  }

  test("source blocklist is two bounded aggregations and a text-keyed join") {
    val p = planOf("q107_source_blocklist")
    assert(p.contains("partial_"), s"rollups lost map-side combine:\n$p")
    assert(hashExchanges(p) <= 3,
      s"blocklist should shuffle at most on text (agg + join) and source:\n$p")
  }

  test("ngram novelty dedups grams in-scan and joins per-distinct-gram") {
    val p = planOf("q108_ngram_novelty")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"novelty join degraded to a product:\n$p")
    assert(p.contains("array_distinct"),
      s"grams must dedup inside the scan, before the explode:\n$p")
  }

  test("gopher rule battery is a shuffle-free narrow scan") {
    val p = planOf("q111_gopher_rules")
    assert(hashExchanges(p) == 0,
      s"per-row rule arithmetic acquired a hash shuffle:\n$p")
  }

  test("gopher repetition battery runs in-row: no explode, no shuffle") {
    val p = planOf("q112_gopher_repetition")
    assert(hashExchanges(p) == 0,
      s"sorted-run gram masses acquired a hash shuffle:\n$p")
    assert(!p.toLowerCase.contains("generate"),
      s"gram masses must be in-row aggregates, not an explode:\n$p")
  }

  test("boilerplate mass broadcasts the bounded gram set back onto the corpus") {
    val p = planOf("q113_boilerplate")
    assert(p.contains("partial_"),
      s"gram document-frequency lost map-side combine:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the boilerplate set (≤ denom/num × grams-per-doc) must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"corpus-size scalar must ride a 1-row broadcast, not a cartesian:\n$p")
  }

  test("moore-lewis scores join LM count tables; vocab scalars ride 1-row broadcasts") {
    val p = planOf("q114_moore_lewis")
    assert(!p.contains("CartesianProduct"),
      s"LM scoring acquired an unbounded product:\n$p")
    assert(p.contains("partial_"), s"LM count tables lost map-side combine:\n$p")
  }

  test("winnowing fingerprints are a shuffle-free narrow scan") {
    val p = planOf("q115_winnowing")
    assert(hashExchanges(p) == 0,
      s"per-window minima acquired a hash shuffle:\n$p")
    assert(!p.toLowerCase.contains("generate"),
      s"windows must be in-row slices, not an explode:\n$p")
  }

  test("mixture plan is one source-keyed aggregation with a literal weight map") {
    val p = planOf("q116_mixture_plan")
    assert(p.contains("partial_"), s"source rollup lost map-side combine:\n$p")
    assert(!p.contains("Join"), s"the weight map must be a literal, not a join:\n$p")
    assert(hashExchanges(p) <= 1,
      s"plan should shuffle once on the source key:\n$p")
  }

  test("audio decode is a shuffle-free narrow scan") {
    val p = planOf("q109_audio_features")
    assert(hashExchanges(p) == 0,
      s"clip-feature decode acquired a hash shuffle:\n$p")
  }

  test("audio frame energy is a shuffle-free narrow scan") {
    val p = planOf("q110_audio_frame_energy")
    assert(hashExchanges(p) == 0,
      s"frame windowing acquired a hash shuffle:\n$p")
  }

  test("pq encode is a shuffle-free narrow scan with the codebook as literals") {
    val p = planOf("q117_pq_encode")
    assert(hashExchanges(p) == 0,
      s"PQ encoding acquired a hash shuffle:\n$p")
    assert(!p.contains("Join"), s"the codebook must ride as literals, not a join:\n$p")
  }

  test("vector kernel stages stay inside whole-stage codegen") {
    // The kernel expressions exist so PQ/IVF/silhouette stages compile
    // under the JVM's 64 KB method limit (the unrolled forms broke WSCG
    // for the whole stage and ran interpreted at ~ms/row). Pin: the
    // Project that evaluates each kernel carries a WholeStageCodegen
    // star, and the plan still uses the kernel (not a re-expansion).
    for ((query, kernel) <- Seq(
        "q117_pq_encode" -> "graft_pq_codes",
        "q118_pq_adc_topk" -> "graft_adc",
        "q131_silhouette" -> "graft_sqdist_top2",
        "q50_ivf_ann" -> "graft_cos_rank",
        "q35_ann_lsh_bucketed" -> "graft_lsh_bucket",
        // the weighted-Jaccard pair verification: the higher-order-
        // function form was CodegenFallback and cost 10× at sf0.1
        "q151_weighted_jaccard" -> "graft_wisect")) {
      // q151 on the tiny-vocab test corpus routes to the dense all-pairs
      // path, where the kernel deliberately sits behind a non-codegen
      // Generate barrier (see denseJaccardDistinct); this pin protects
      // the SPARSE path's codegen, so force it for the build.
      val forceSparse = query == "q151_weighted_jaccard"
      if (forceSparse) spark.conf.set("graft.jaccard.denseVocabMax", "0")
      val p = try planOf(query) finally {
        if (forceSparse) {
          spark.conf.unset("graft.jaccard.denseVocabMax")
          graft.llm.CacheRegistry.releaseAll(spark)
          spark.catalog.clearCache()
        }
      }
      assert(p.contains(kernel), s"$query no longer uses $kernel:\n$p")
      val codegenLines = p.linesIterator
        .filter(_.contains(kernel)).filter(l => l.contains("*("))
      assert(codegenLines.nonEmpty,
        s"$query evaluates $kernel outside whole-stage codegen:\n$p")
    }
  }

  test("dense-vocabulary jaccard join verifies with the popcount kernel, no exploded-token candidate join") {
    // The driver corpus is in the dense regime (31 distinct tokens), so
    // the default plan must take the bitmask path: the popcount kernel
    // behind its Generate barrier, and NO prefix-token candidate
    // machinery (slice of the rarity-ordered prefix / array_intersect
    // verification) anywhere in the plan.
    val p = planOf("q139_jaccard_join")
    assert(p.contains("graft_mask_inter"), s"dense path not taken:\n$p")
    // r14: masks build IN-ROW from the vocab literal (graft_tok_mask) —
    // the explode→join→collect_list→graft_bits_mask assembly is gone
    assert(p.contains("graft_tok_mask"), s"in-row mask build missing:\n$p")
    assert(!p.contains("graft_bits_mask"),
      s"shuffled mask assembly resurfaced in the dense plan:\n$p")
    assert(!p.contains("slice(graft_toks") && !p.contains("array_intersect"),
      s"prefix-path candidate machinery leaked into the dense plan:\n$p")
    graft.llm.CacheRegistry.releaseAll(spark)
    spark.catalog.clearCache()
  }

  test("dense-vocabulary containment join takes the popcount path like jaccard") {
    val p = planOf("q177_containment_join")
    assert(p.contains("graft_mask_inter"), s"dense path not taken:\n$p")
    assert(!p.contains("slice(graft_toks") && !p.contains("array_intersect"),
      s"prefix-path candidate machinery leaked into the dense plan:\n$p")
    graft.llm.CacheRegistry.releaseAll(spark)
    spark.catalog.clearCache()
  }

  test("bootstrap means is one map-side-combinable aggregation over one corpus scan") {
    val p = planOf("q178_bootstrap_mean")
    // in-row replicate generate + partial agg: the only exchange is the
    // B-row-per-partition replicate groupBy
    assert(hashExchanges(p) <= 1, s"bootstrap acquired extra shuffles:\n$p")
    assert(p.contains("partial"), s"replicate agg must partial-aggregate:\n$p")
  }

  test("pq adc search broadcasts the query distance tables; corpus side never shuffles pre-topk") {
    val p = planOf("q118_pq_adc_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query distance tables must broadcast:\n$p")
    // the only hash exchange is the per-query top-k window
    assert(hashExchanges(p) <= 1, s"ADC scoring acquired extra shuffles:\n$p")
  }

  test("bpe merge step collapses to the vocabulary before pair expansion") {
    val p = planOf("q120_bpe_merge_step")
    assert(p.contains("partial_"), s"pair counting lost map-side combine:\n$p")
    // word vocab groupBy + pair groupBy; top-n is TakeOrdered, not a window
    assert(hashExchanges(p) <= 2, s"expected vocab+pair shuffles only:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-n should be TakeOrdered:\n$p")
  }

  test("token fertility is one source-keyed aggregation") {
    val p = planOf("q121_token_fertility")
    assert(p.contains("partial_"), s"fertility rollup lost map-side combine:\n$p")
    assert(hashExchanges(p) <= 1, s"plan should shuffle once on the source key:\n$p")
  }

  test("hashed classifier is a shuffle-free narrow scan with the weights as literals") {
    val p = planOf("q122_hashed_classifier")
    assert(hashExchanges(p) == 0, s"classifier scoring acquired a shuffle:\n$p")
    assert(!p.contains("Join"), s"the weight vector must ride as a literal, not a join:\n$p")
  }

  test("split drift is one dim-keyed aggregation over the exploded scaled vectors") {
    val p = planOf("q123_split_drift")
    assert(p.contains("partial_"), s"drift agg lost map-side combine:\n$p")
    assert(hashExchanges(p) <= 1, s"plan should shuffle once on the dim key:\n$p")
    assert(!p.contains("Join"), s"split assignment must be in-row, not a join:\n$p")
  }

  test("chunk windows are in-row expansion, zero shuffles") {
    val p = planOf("q126_chunk_windows")
    assert(hashExchanges(p) == 0, s"chunking acquired a shuffle:\n$p")
  }

  test("ivf-adc fuses assignment+encoding into one narrow scan; probes broadcast") {
    val p = planOf("q127_ivf_adc")
    assert(p.contains("BroadcastHashJoin"), s"probe side must broadcast:\n$p")
    // the only hash exchange is the per-query top-k window
    assert(hashExchanges(p) <= 1, s"IVF-ADC corpus side acquired extra shuffles:\n$p")
  }

  test("winnowing matches reuse one persisted fingerprint table on both join sides") {
    val p = planOf("q129_winnowing_matches")
    assert(p.contains("InMemoryTableScan"),
      s"fingerprint subtree must be persisted, not recomputed per side:\n$p")
    // fp-keyed join (both sides) + pair groupBy
    assert(hashExchanges(p) <= 3, s"match join acquired extra shuffles:\n$p")
  }

  test("silhouette is a shuffle-free narrow scan against centroid literals") {
    val p = planOf("q131_silhouette")
    assert(hashExchanges(p) == 0, s"silhouette scoring acquired a shuffle:\n$p")
    assert(!p.contains("Join"), s"centroids must ride as literals, not a join:\n$p")
  }

  test("carved-text bridge reads the payload store as a narrow join-free scan") {
    // q149's returned frame is binaryFile → extract → project → sort:
    // no hash exchange (the orderBy is a range exchange) and no join —
    // at 100 TB this is a pure distributed scan over the payload store.
    val p = planOf("q149_carved_documents")
    assert(hashExchanges(p) == 0, s"bridge acquired a hash shuffle:\n$p")
    assert(!p.contains("Join"), s"bridge acquired a join:\n$p")
  }

  test("dsv2 hits mode pushes the file_type predicate into the scan") {
    // EvidenceHitsScan.description() prints the pruned set, and
    // BatchScanExec embeds it in the plan string — AQE-wrapping-proof,
    // unlike a tree collect (AdaptiveSparkPlanExec hides its subtree).
    val p = planOf("q150_dsv2_hits_pushdown")
    assert(p.contains("PushedTypes: [jpeg]"),
      s"file_type predicate did not reach automaton construction:\n$p")
  }

  test("dedup operators carry no forced broadcast on corpus-proportional tables") {
    // With autoBroadcastJoinThreshold = -1 stats-based broadcast is off,
    // so any broadcast JOIN NODE left in the initial physical plan can
    // only come from a broadcast() hint (BroadcastExchange itself is
    // inserted later by EnsureRequirements, so sparkPlan must be
    // checked for the join operators, not the exchange). The dedup
    // family must have none: its join inputs (text-pair candidates,
    // membership, distinct-text sizes) are corpus- or
    // candidate-proportional, and a hint-forced broadcast collects
    // them to the driver — an OOM at scale no cluster size fixes. AQE
    // is still free to broadcast at runtime when a side measures
    // small; this pins only that nothing is FORCED.
    // Earlier tests may have registered CacheRegistry persists whose
    // PHYSICAL plans were compiled under the default 10 MB threshold;
    // Spark's CacheManager dedupes by logical plan, so those
    // BroadcastExchange-bearing InMemoryRelations would leak into the
    // pinned plans even with the threshold off. Clear both cache layers
    // before and after so the pin is order-independent.
    val threshold = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(threshold)
    def clearCaches(): Unit = {
      graft.llm.CacheRegistry.releaseAll(spark)
      spark.catalog.clearCache()
    }
    try {
      spark.conf.set(threshold, "-1")
      clearCaches()
      // q78 is NOT in this list: its bench-gram broadcast is a
      // legitimate forced hint (bounded side) with its own pin above.
      for (q <- Seq("q31_dedup_minhash_lsh", "q33_dedup_ngram_jaccard",
          "q56_dedup_clusters", "q72_dedup_corpus",
          "q100_minhash_agreement", "q106_quality_rep", "q139_jaccard_join",
          "q146_minhash_calibration")) {
        val df = SparkEntry.queries(q)(spark, dir)
        val p = df.queryExecution.sparkPlan.toString
        assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastNestedLoopJoin"),
          s"$q forces a broadcast on an unbounded join side:\n$p")
      }
    } finally {
      spark.conf.set(threshold, saved)
      clearCaches()
    }
  }

  test("incremental IVF stats: one exchange per side's k-bounded aggregation") {
    // each corpus side is a narrow kernel scan (centroid literals — no
    // shuffle before its groupBy) + one map-side-combinable aggregation;
    // the finishing joins are codebook-sized. 2 side aggs + ≤1 exchange
    // from the bounded join of k-row frames.
    val p = planOf("q174_ivf_incremental")
    assert(hashExchanges(p) <= 3,
      s"ivfIncrementalStats grew extra exchanges beyond the two side aggs + bounded join:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("bm25 broadcasts the bounded query-term table; no sort-merge join") {
    val p = planOf("q180_bm25_topk")
    assert(p.contains("BroadcastHashJoin"), s"query terms must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"bm25 degraded to SMJ:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"query-term selection should be a distributed top-k:\n$p")
    // tf + dl + term-df + (qid,doc) aggs + the per-query window; the
    // persisted tf table truncates re-reads
    assert(hashExchanges(p) <= 6, s"bm25 acquired extra shuffles:\n$p")
    graft.llm.CacheRegistry.releaseAll(spark)
    spark.catalog.clearCache()
  }

  test("ivf nprobe sweep keeps the probe a codebook-literal scan") {
    val p = planOf("q204_ivf_nprobe_sweep")
    // coarse assignment + PQ encoding are in-row expressions over
    // literal-embedded centroids/codebooks — the corpus side must NOT
    // acquire a join or shuffle to find its list
    assert(!p.contains("SortMergeJoin"), s"ivf sweep degraded to SMJ:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"probe join must broadcast:\n$p")
    // the candidate cache feeds cost + rank branches; the only hash
    // exchanges are the per-(nprobe, query) window, the per-query
    // exact window, and the two small aggs
    assert(hashExchanges(p) <= 5, s"ivf sweep acquired extra shuffles:\n$p")
    graft.llm.CacheRegistry.releaseAll(spark)
    spark.catalog.clearCache()
  }

  test("indexed bm25 scores from a bucket-pruned scan with no corpus pass") {
    val p = planOf("q202_bm25_indexed")
    // the postings/terms scans must prune to the buckets holding the
    // literal query terms — the inverted-index read pattern
    assert(p.contains("SelectedBucketsCount"),
      s"indexed scan lost bucket pruning:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"query terms must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"indexed bm25 degraded to SMJ:\n$p")
    // only the matched-postings (qid,id) agg + the per-query rank
    // window shuffle; NO corpus-sized tokenize/tf/dl/df exchanges
    assert(hashExchanges(p) <= 2,
      s"indexed bm25 re-acquired corpus shuffles:\n$p")
    graft.llm.CacheRegistry.releaseAll(spark)
    spark.catalog.clearCache()
  }

  test("indexed dedup probes bucketed key tables without corpus-key shuffles") {
    val p = planOf("q219_dedup_indexed")
    // both persisted key tables must scan with their bucket spec
    assert("Bucketed: true".r.findAllIn(p).size >= 2,
      s"dedup index scans lost the bucket spec:\n$p")
    assert(p.contains("graft_didx"), s"not reading the persisted index:\n$p")
    // the index-side keys never reshuffle: no exchange partitioned on
    // the content-hash or band-composite columns (at test scale AQE
    // broadcasts the index tables; at corpus scale the bucket layout
    // absorbs the SMJ requirement)
    assert(!p.contains("Exchange hashpartitioning(h#"),
      s"content-hash side re-shuffled:\n$p")
    assert(!p.contains("Exchange hashpartitioning(bk#"),
      s"band-key side re-shuffled:\n$p")
    graft.llm.CacheRegistry.releaseAll(spark)
    spark.catalog.clearCache()
  }

  test("indexed ANN scores from a bucket-pruned lists scan with no corpus pass") {
    val p = planOf("q211_ann_indexed")
    // the lists scan must prune to the buckets holding the probed
    // cent_ids (the FAISS inverted-list read, as bucketed parquet)
    assert(p.contains("SelectedBucketsCount"),
      s"lists scan lost bucket pruning:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"probe tables must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"indexed ANN degraded to SMJ:\n$p")
    // the per-query top-k rank window is the ONLY shuffle — no
    // corpus-side assignment/encoding exchanges
    assert(hashExchanges(p) <= 1,
      s"indexed ANN re-acquired corpus shuffles:\n$p")
    graft.llm.CacheRegistry.releaseAll(spark)
    spark.catalog.clearCache()
  }

  test("ADC re-rank joins the bounded candidate set back as a broadcast") {
    val p = planOf("q263_adc_rerank")
    // the |queries|·kCand candidate frame rides into the raw-vector
    // scan as a broadcast — the corpus side must never sort-merge
    assert(p.contains("BroadcastHashJoin"), s"re-rank join lost its broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"re-rank degraded to SMJ:\n$p")
    // ADC top-kCand window + re-rank top-k window are the only wide ops
    assert(hashExchanges(p) <= 2, s"re-rank acquired extra shuffles:\n$p")
  }

  test("duplicated-span profile is hash-keyed aggregation only — no pair join") {
    val p = planOf("q272_duplicated_spans")
    // the ExactSubstr signal must never materialize doc pairs: spans
    // group on their hash (boilerplate seen a billion times = ONE
    // group), flags ride back on the same key
    assert(!p.contains("CartesianProduct"), s"span profile went all-pairs:\n$p")
    assert(!p.contains("SortMergeJoin"), s"span profile degraded to SMJ:\n$p")
    assert(p.contains("partial_"), s"span counts lost map-side combine:\n$p")
    assert(hashExchanges(p) <= 4, s"span profile acquired extra shuffles:\n$p")
    graft.llm.CacheRegistry.releaseAll(spark)
    spark.catalog.clearCache()
  }

  test("NB training is one vocabulary-bounded shuffle with map-side combine") {
    val p = planOf("q267_nb_train")
    // training IS aggregation: the (bucket, class) count is the only
    // corpus-sized shuffle; totals and the bucket grid broadcast
    assert(p.contains("partial_"), s"NB counts lost map-side combine:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"grid/totals must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"NB train degraded to SMJ:\n$p")
    assert(hashExchanges(p) <= 2, s"NB train acquired extra shuffles:\n$p")
  }

  test("unigram fertility scoring is a zero-shuffle scan (vocab rides as a literal)") {
    val p = planOf("q270_unigram_fertility")
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
      s"fertility scan acquired a shuffle:\n$p")
  }

  test("shard plan is the per-source prefix-sum window plus one partial agg") {
    val p = planOf("q181_shard_plan")
    assert(hashExchanges(p) <= 2, s"shard plan acquired extra shuffles:\n$p")
    assert(p.contains("partial"), s"manifest agg lost map-side combine:\n$p")
  }

  test("embedding outliers broadcast the bounded centroid arrays") {
    val p = planOf("q184_embed_outliers")
    assert(p.contains("Broadcast"), s"centroid table must broadcast:\n$p")
    // (grp,dim) centroid agg + centroid array collect + per-grp window;
    // the distance pass itself is in-row zip_with, no explode
    assert(hashExchanges(p) <= 3, s"outlier quarantine acquired extra shuffles:\n$p")
    graft.llm.CacheRegistry.releaseAll(spark)
    spark.catalog.clearCache()
  }

  test("snapshot diff is one id-keyed full-outer join over digests") {
    val p = planOf("q186_snapshot_diff")
    assert(p.contains("FullOuter"), s"expected a full-outer join:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("jl reduction runs with zero exchanges (pure in-row projection)") {
    val p = planOf("q190_jl_reduce")
    // presentation orderBy is a range exchange; no hash shuffle at all
    assert(hashExchanges(p) == 0, s"jlReduce acquired a shuffle:\n$p")
  }

  test("hard negatives ride one bucket-partitioned window shuffle") {
    val p = planOf("q197_hard_negatives")
    assert(hashExchanges(p) <= 1, s"hard negatives acquired extra shuffles:\n$p")
  }

  test("shard checksums reuse the prefix-sum window partitioning for the shard agg") {
    val p = planOf("q194_shard_checksums")
    assert(hashExchanges(p) <= 2, s"checksum manifest acquired extra shuffles:\n$p")
    assert(p.contains("partial"), s"manifest agg lost map-side combine:\n$p")
  }

  test("key-skew report collapses to bounded bucket frames after the first partial agg") {
    val p = planOf("q183_key_skew")
    // (bucket,key) agg -> bucket aggs + bounded joins; total is broadcast
    assert(p.contains("partial"), s"keyed agg lost map-side combine:\n$p")
    assert(p.contains("Broadcast"), s"1-row total should broadcast:\n$p")
    assert(hashExchanges(p) <= 5, s"skew report acquired extra shuffles:\n$p")
    graft.llm.CacheRegistry.releaseAll(spark)
    spark.catalog.clearCache()
  }

  test("SCD2 lookup broadcasts the dimension history (no sort-merge join)") {
    val p = planOf("q239_scd2_lookup")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"SCD2 dim join lost its broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"SCD2 degraded to SMJ:\n$p")
  }

  test("path trigrams ride ONE per-key window then a partial triple count") {
    val p = planOf("q240_path_trigrams")
    assert("Window".r.findAllIn(p).toSet.size >= 1)
    assert(p.contains("partial"), s"triple count lost map-side combine:\n$p")
    // one shuffle for the per-user window, one for the triple agg
    assert(hashExchanges(p) <= 2, s"trigrams acquired extra shuffles:\n$p")
    assert(p.contains("TakeOrdered"), s"top-k degraded to a global sort:\n$p")
  }

  test("global row ids never funnel through a single-partition exchange") {
    // the op's whole reason to exist: the window formulation would show
    // Exchange SinglePartition feeding a Sort+Window over every row
    val df = graft.operators.GlobalIds.withGlobalIds(
      spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "n_chars"),
      Seq("n_chars", "doc_id"), numParts = 4)
    // the range shuffle lives inside the RDD lineage (createDataFrame
    // hides it from the SQL plan), so pin the property behaviorally:
    // ids are assigned per partition, in parallel, as CONTIGUOUS
    // ascending ranges — the exact thing a single-partition window
    // cannot do without funneling every row through one task
    val parts = df.rdd.mapPartitionsWithIndex { (i, it) =>
      val ids = it.map(_.getLong(2)).toArray
      if (ids.isEmpty) Iterator.empty
      else Iterator((i, ids.min, ids.max, ids.length.toLong))
    }.collect().sortBy(_._1)
    assert(parts.length > 1, s"global ids collapsed to one partition: ${parts.toSeq}")
    val n = parts.map(_._4).sum
    var next = 0L
    parts.foreach { case (_, lo, hi, cnt) =>
      assert(lo === next && hi === next + cnt - 1,
        s"non-contiguous id range in ${parts.toSeq}")
      next += cnt
    }
    assert(next === n)
  }

  test("CDC apply is one key shuffle with map-side combine and no window sort") {
    val p = planOf("q232_cdc_apply")
    assert(!p.contains("Window"), s"CDC apply acquired a window sort:\n$p")
    assert(p.contains("partial"), s"max_by lost map-side combine:\n$p")
    // one shuffle for the key agg (+ the presentation orderBy range
    // exchange, which hashExchanges does not count)
    assert(hashExchanges(p) <= 1, s"CDC apply acquired extra shuffles:\n$p")
  }

  test("constraint suite branches stay narrow partial aggregations") {
    val p = planOf("q233_constraint_report")
    assert(p.contains("partial"), s"checks lost map-side combine:\n$p")
    // only the unique() check shuffles raw keys; scalar checks reduce
    // to 1-row partial aggs
    assert(hashExchanges(p) <= 2, s"checks acquired extra shuffles:\n$p")
  }

  test("MAD report windows run over the value-compressed histogram only") {
    val p = planOf("q226_mad_outliers")
    // every Window must sit above the (group,value) histogram agg, so
    // no Window may consume a raw-scan exchange: all window sorts are
    // keyed by group over histogram frames; nothing is single-partition
    assert(!p.contains("SinglePartition"),
      s"histogram quantile degraded to single partition:\n$p")
    assert(p.contains("partial"), s"histogram agg lost map-side combine:\n$p")
    graft.llm.CacheRegistry.releaseAll(spark)
    spark.catalog.clearCache()
  }

  test("thresholdSweep CC input is duplication-invariant (the mega-cluster skew shield)") {
    import spark.implicits._
    // one boilerplate text floods the corpus; the sweep's CC must see
    // it as ONE weighted node — the doc-level formulation fed n²/2
    // same-text edges through connected components (44,850 at n=300,
    // ~4.5e15 at a 100-TB 30%-duplication corpus)
    def corpus(copies: Int) =
      ((0 until copies).map(i => (1000L + i, "mega cluster boilerplate text")) ++
        Seq((1L, "a b c d"), (2L, "b c d e"), (3L, "p q r s")))
        .toDF("doc_id", "text")
    def edgeCount(copies: Int): Long = {
      val (edges, _) = graft.llm.Dedup.sweepEdges(
        corpus(copies), "doc_id", "text", 5000L)
      val n = edges.count()
      graft.llm.CacheRegistry.releaseAll(spark)
      spark.catalog.clearCache()
      n
    }
    val (e3, e300) = (edgeCount(3), edgeCount(300))
    assert(e3 === 1L, s"fixture must plant exactly the (1,2) cross-text edge, got $e3")
    assert(e300 === e3,
      s"sweep CC edges grew with duplication: $e3 -> $e300 — the skew shield regressed")
    // and the stats still count DOCS: the mega class surfaces at its
    // full copy weight without ever becoming edges
    val got = graft.llm.Dedup.thresholdSweep(corpus(300), "doc_id", "text",
        Seq(5000L)).collect().head
    assert(got.getAs[Long]("max_cluster") === 300L)
    assert(got.getAs[Long]("n_docs_clustered") === 302L)
    assert(got.getAs[Long]("n_clusters") === 2L)
    graft.llm.CacheRegistry.releaseAll(spark)
    spark.catalog.clearCache()
  }

  test("clusterProvenance prunes mega-clusters before the shuffle (WindowGroupLimit)") {
    import spark.implicits._
    // one mega cluster (30% shape) + small clusters: the rank filter
    // must ride the row_number window as a group limit, pruning each
    // INPUT partition to cap+1 rows per cluster BEFORE the exchange —
    // and the representative min must run over the CAPPED frame, not a
    // second whole-cluster window buffer
    val clusters = ((0L until 3000L).map(i => (i, "mega")) ++
      Seq((9000L, "b"), (9001L, "b"), (9002L, "c")))
      .toDF("id", "comp")
    val df = graft.llm.Dedup.clusterProvenance(clusters, "id", "comp",
      maxPerGroup = 5)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._3)).toSeq
    assert(rows === ((1L to 5L).map(i => (0L, i, i)) :+ ((9000L, 9001L, 1L))),
      s"got $rows")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rank cap lost the group-limit pushdown:\n$p")
    assert("WindowGroupLimit [^\\n]*Partial".r.findFirstIn(p).nonEmpty,
      s"group limit must prune pre-shuffle (Partial mode):\n$p")
    // two exchanges total — the input distinct's (id, comp) agg and the
    // comp-keyed rank window; the min window must REUSE the rank
    // window's partitioning instead of adding a whole-cluster buffer
    assert(hashExchanges(p) <= 2, s"provenance acquired extra shuffles:\n$p")
    assert(!p.contains("SinglePartition"), s"provenance degraded:\n$p")
  }

  test("same-text pair expansion chunks + spreads mega classes (the OOM shield)") {
    import spark.implicits._
    // 1,100 copies of one text (crosses the 512-id chunk twice) + one
    // near-dup pair: the doc-pair output is exactly C(1100,2) + the
    // cross pair, and the expansion plan carries the round-robin
    // redistribution branch for wide classes
    val docs = ((0L until 1100L).map(i => (i, "mega text body alpha beta")) ++
      Seq((5000L, "a b c d"), (5001L, "b c d e")))
      .toDF("doc_id", "text")
    val df = graft.llm.Dedup.jaccardJoin(docs, "doc_id", "text", 5000L)
    val rows = df.collect()
    val same = rows.filter(_.getAs[Long]("jaccard_bp") == 10000L)
    assert(same.length === 1100 * 1099 / 2, s"got ${same.length} same-text pairs")
    assert(rows.length === same.length + 1)
    // ordering + distinctness survive the chunked path
    assert(same.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    assert(same.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).distinct.length
      === same.length)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("RoundRobinPartitioning"),
      s"wide-class expansion lost its redistribution branch:\n$p")
    // the grouped (collect_list) frame feeds BOTH union branches in the
    // mega regime — it must sit behind a cache (single execution), with
    // the aggregation appearing nowhere outside it
    val plan = df.queryExecution.optimizedPlan
    val cached = plan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation
        if r.output.exists(_.name == "ids") => r
    }
    assert(cached.size >= 2,
      s"both mega-regime branches must scan the cached grouped frame; " +
        s"found ${cached.size} InMemoryRelation(s) with ids")
    val rogue = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
        if a.aggregateExpressions.exists(_.toString.contains("collect_list")) => a
    }
    assert(rogue.isEmpty,
      "the grouped collect_list aggregation must live behind the cache, " +
        s"not re-execute per union branch:\n${rogue.mkString("\n")}")
    graft.llm.CacheRegistry.releaseAll(spark)
    spark.catalog.clearCache()
  }

  test("unigramEncode keeps the Viterbi DP above the distinct (the 496s pushdown pin)") {
    import spark.implicits._
    val vocab = Seq(("a", 1L, 10L), ("b", 1L, 20L), ("ab", 1L, 25L))
      .toDF("piece", "cnt", "cost_micro")
    val docs = Seq((1L, "ab aab ab b a ab")).toDF("id", "text")
    val df = graft.llm.TextAnalysis.unigramEncode(docs, "id", "text", vocab, 4)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the uncoverable-word filter (and the posexplode's implicit
    // constraints) must bind to the DP Generates' OUTPUT attributes
    // (graft_e#N / graft_ps#N) — a Filter that inlines a DP fold
    // WITHOUT referencing them means the optimizer pushed it below
    // the barrier/distinct and the interpreted chain re-runs once per
    // corpus TOKEN (measured 496 s at sf0.1 before the barrier)
    val offenders = "Filter [^\\n]*aggregate\\(sequence\\(1, length[^\\n]*".r
      .findAllIn(p).filterNot(f =>
        f.contains("graft_e#") || f.contains("graft_ps#")).toSeq
    assert(offenders.isEmpty,
      s"Viterbi DP inlined into a pushed-down Filter condition:\n$offenders")
    // the barrier Generates are present
    assert(p.contains("Generate explode"),
      s"explode-array barrier missing from the encode plan:\n$p")
    graft.llm.CacheRegistry.releaseAll(spark)
    spark.catalog.clearCache()
  }

  test("frontier probe broadcasts batch keys; the frontier side never sort-merges") {
    // probeNew's contract at scale: the corpus-sized frontier scans
    // ONCE against the BROADCAST batch keys (inner), and the batch
    // anti-joins the (batch-bounded) seen subset — also broadcast. A
    // SortMergeJoin anywhere in the probe means the frontier got
    // shuffled, the exact cost the operator exists to avoid.
    val df = SparkEntry.queries("q301_frontier_discovery")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"),
      s"frontier probe plan contains a sort-merge join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"frontier probe plan lost its broadcast joins:\n$p")
    assert("BroadcastHashJoin [^\\n]*LeftAnti".r.findFirstIn(p).isDefined,
      s"the unseen-filter must be a broadcast anti-join:\n$p")
    graft.llm.CacheRegistry.releaseAll(spark)
    spark.catalog.clearCache()
  }

  test("same-text pairs on a natural corpus take the pure in-row plan (no chunk tax)") {
    // The round-14 adaptive gate: the bounded max-class-size probe sees
    // no class wider than SameTextChunk on the driver corpus, so
    // sameTextPairs must emit the single-chain plan — one
    // collect_list aggregation, NO chunk-pair scaffolding (graft_same
    // never constructed), NO round-robin redistribution branch. The
    // round-12 shape ran the chunk scaffolding on every class and
    // measured +0.7 s on q139 / +0.5 s on q177 at sf0.1 (same-window
    // ABBA) — this pin keeps the common case from paying the shield.
    val df = SparkEntry.queries("q139_jaccard_join")(spark, dir)
    df.collect()
    val plan = df.queryExecution.optimizedPlan
    assert(!plan.toString.contains("graft_same"),
      s"natural corpus must not build the chunk-pair scaffolding:\n$plan")
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
        if a.aggregateExpressions.exists(_.toString.contains("collect_list")) => a
    }
    assert(aggs.size == 1,
      s"the in-row plan carries exactly one collect_list aggregation, " +
        s"found ${aggs.size}")
    // (no RoundRobinPartitioning pin here: the dense-regime verify path
    // legitimately round-robins its popcount loop input)
    graft.llm.CacheRegistry.releaseAll(spark)
    spark.catalog.clearCache()
  }
}
