package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Training-data deduplication operators, designed for 100 TB corpora:
  *
  *  - exact: one shuffle on content hash (map-side partial agg).
  *  - MinHash+LSH: shingle→minhash→band→bucket-join. The hash family is
  *    md5(seed || ':' || shingle) — engine-independent and deterministic,
  *    so results are oracle-checkable; at scale swap in xxhash64 (also a
  *    built-in) for speed without changing the plan shape.
  *  - SimHash: 60-bit signature from token-hash bit votes.
  *  - n-gram Jaccard: exact pairwise similarity via shingle-set join,
  *    restricted to LSH/blocking candidates to stay subquadratic.
  *
  * All operators avoid UDFs where a built-in expression exists; the only
  * shuffles are the groupBys/joins inherent to the semantics.
  */
object Dedup extends PersistedIndex {

  /** Exact duplicate groups by content hash: (content_hash, n_docs,
    * keep_id) — keep_id = min id, the canonical survivor.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** Dedup provenance audit — one row per REMOVED cluster member, up
    * to `maxPerGroup` per cluster (lowest ids first), linking it to the
    * kept representative (the cluster's min id): the record a
    * compliance/takedown pipeline needs to answer "where did this
    * document go". Takes any (id, cluster) frame — exact classes
    * (`df.select(id, md5(text))`), [[connectedComponents]] output, or
    * [[dedupCorpus]] clusters. The cap bounds the per-cluster OUTPUT on
    * pathological clusters (a 10M-copy boilerplate class must not emit
    * 10M audit rows; its size is the histogram's job) while the rank
    * sort stays O(cluster size log cluster size) per cluster. One
    * cluster-keyed shuffle; skew equals duplication skew. Output:
    * (keep_id, dup_id, dup_rank), dup_rank 1-based in dup_id order.
    */
  def clusterProvenance(clusters: DataFrame, idCol: String, compCol: String,
      maxPerGroup: Int): DataFrame = {
    require(maxPerGroup > 0, s"maxPerGroup must be positive, got $maxPerGroup")
    val byComp = Window.partitionBy(col(compCol))
    // distinct: a membership frame built with duplicate (id, cluster)
    // rows would otherwise emit self-links (keep_id == dup_id) and
    // shift ranks past the cap.
    //
    // Skew shape (the mega-cluster rule): the rank filter sits directly
    // on the row_number window, so WindowGroupLimit prunes every INPUT
    // partition to its (cap+1) smallest ids per cluster BEFORE the
    // shuffle — a 10M-copy boilerplate class contributes
    // O(partitions·cap) rows to the sort, never its full membership.
    // The representative is then min over the CAPPED frame (rank 1 is
    // the global min by construction), on the same partitioning and
    // sort, instead of a min().over() that buffered the ENTIRE cluster
    // in one window group.
    clusters.select(col(idCol), col(compCol)).distinct()
      .withColumn("graft_rn", row_number().over(byComp.orderBy(col(idCol))))
      .filter(col("graft_rn") <= maxPerGroup + 1)
      .withColumn("graft_keep", min(col(idCol)).over(byComp))
      .filter(col("graft_rn") > 1)
      .select(col("graft_keep").as("keep_id"), col(idCol).as("dup_id"),
        (col("graft_rn") - 1).cast("long").as("dup_rank"))
  }

  /** Word n-gram shingles: (id, shingle), duplicates preserved. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    splitWords(df, idCol, textCol)
      .select(col("id"), explode(shingleArray(n)).as("shingle"))

  /** Per-document DISTINCT shingles: (id, shingle) with no duplicate
    * pairs — `array_distinct` runs per row BEFORE the explode, so the
    * output needs no corpus-wide `distinct()` shuffle. Use this wherever
    * a set-semantics shingle table is wanted (Jaccard, contamination):
    * the dedup happens in the narrow scan for free.
    */
  def distinctShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    splitWords(df, idCol, textCol)
      .select(col("id"), explode(array_distinct(shingleArray(n))).as("shingle"))

  private def splitWords(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("graft_ws"))

  // Sliding window over the pre-split word array via sequence + transform —
  // stays in whole-stage codegen (no UDF). Grams are built by direct
  // element indexing: a per-gram slice() materializes a throwaway
  // sub-array, which profiles ~5x slower than indexed concat on a
  // shingle-heavy corpus scan.
  private def shingleArray(n: Int): Column = {
    val parts = (0 until n)
      .map(o => if (o == 0) "graft_ws[i]" else s"graft_ws[i+$o]")
      .mkString(", ' ', ")
    when(size(col("graft_ws")) >= n,
      expr(s"transform(sequence(0, size(graft_ws) - $n), i -> concat($parts))"))
      .otherwise(array())
  }

  /** K md5-seeded minhashes per id: (id, k, minhash). All k mins are
    * separate aggregate columns of ONE id-keyed groupBy (map-side
    * combinable), unstacked afterwards — the crossJoin(range(k))
    * formulation replicated every shingle k× and shuffled the
    * replicated rows on (id, k).
    */
  def minHashSignatures(shingleDf: DataFrame, k: Int): DataFrame = {
    val mins = (0 until k).map(i =>
      min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"graft_mh$i"))
    shingleDf.groupBy(col("id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("id"),
        posexplode(array((0 until k).map(i => col(s"graft_mh$i")): _*)))
      .select(col("id"), col("pos").cast("long").as("k"), col("col").as("minhash"))
  }

  /** Band keys: bands of `rowsPerBand` minhashes hashed together in k
    * order (sort the (k, minhash) structs, then project the minhashes).
    */
  def bandKeys(signatures: DataFrame, rowsPerBand: Int): DataFrame =
    signatures
      .withColumn("band", (col("k") / rowsPerBand).cast("long"))
      .groupBy(col("id"), col("band"))
      .agg(md5(concat_ws(",", transform(
        sort_array(collect_list(struct(col("k"), col("minhash")))),
        s => s.getField("minhash")))).as("band_key"))

  /** Candidate near-duplicate pairs: ids sharing any band bucket.
    *
    * `maxBandMembers` (opt-in) caps bucket size: a single degenerate
    * band key — boilerplate shingles, near-empty texts — otherwise
    * emits |bucket|²/2 candidates, the one quadratic blow-up left in
    * the banding scheme at corpus scale. Buckets above the cap are
    * dropped WHOLE (the published LSH-dedup mitigation): deterministic,
    * and the lost pairs are precision-free boilerplate collisions that
    * the verify stage would reject anyway. The bucket-size aggregation
    * is map-side combinable and band-bucket-keyed, never corpus-shaped;
    * the membership filter join is left to the planner/AQE. Default
    * (None) emits every pair — oracle semantics unchanged.
    */
  def lshCandidatePairs(bands: DataFrame, maxBandMembers: Option[Int] = None): DataFrame = {
    val kept = maxBandMembers match {
      case Some(cap) =>
        require(cap >= 2, s"maxBandMembers must be >= 2, got $cap")
        val smallBuckets = bands.groupBy(col("band"), col("band_key"))
          .agg(count(lit(1)).as("graft_bn"))
          .filter(col("graft_bn") <= cap)
          .select("band", "band_key")
        // the capped frame feeds BOTH sides of the self-join below —
        // persist so the bucket-count agg and membership join run once,
        // not once per side (subplan re-execution; see collapsedParts).
        // Cache lifecycle: [[CacheRegistry]] — release after materializing.
        CacheRegistry.persist(bands.join(smallBuckets, Seq("band", "band_key")))
      case None => bands
    }
    val a = kept.select(col("band"), col("band_key"), col("id").as("id_a"))
    val b = kept.select(col("band"), col("band_key"), col("id").as("id_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }


  /** Duplicate-heavy-corpus LSH dedup, end to end. Signatures depend only
    * on the text, so the corpus collapses to canonical texts first
    * (identical texts always share all bands), LSH runs on those, and doc
    * pairs re-expand through the membership join — turning the skewed
    * all-docs shingle self-join into a tiny one. Join strategies are
    * left to the planner: the pair/membership tables are corpus- or
    * candidate-proportional, so a forced broadcast would collect them to
    * the driver and OOM at scale regardless of cluster size; AQE
    * converts the join to broadcast at runtime exactly when the built
    * side is actually small. Same-text pairs are emitted only for
    * texts that actually shingle: a text shorter than the shingle width
    * has no signature/bands, so the naive per-doc form emits no pair for
    * it. Returns (doc_a, doc_b), doc_a < doc_b, distinct.
    */
  /** Shared front half of the collapsed-LSH operators: text membership,
    * candidate pairs between canonical texts, and the set of tids that
    * actually shingled. Everything here is collapsed-size (texts, not
    * docs) except membership (2 narrow columns per doc).
    */
  private def collapsedParts(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, rowsPerBand: Int,
      maxBandMembers: Option[Int] = None): (DataFrame, DataFrame, DataFrame) = {
    // membership feeds several join branches and sh feeds two — Spark
    // re-executes each occurrence of a subplan (no common-subtree reuse),
    // so persist both: one corpus scan instead of four, one shingle
    // shuffle instead of two.
    // Cache lifecycle: see [[CacheRegistry]] — release after materializing.
    val membership = CacheRegistry.persist(
      docs.select(col(idCol).as("doc_id"), md5(col(textCol)).as("tid")))
    val texts = docs.select(md5(col(textCol)).as("doc_id"), col(textCol).as("t")).distinct()
    val sh = CacheRegistry.persist(shingles(texts, "doc_id", "t", shingleN))
    val textPairs = lshCandidatePairs(
      bandKeys(minHashSignatures(sh, numHashes), rowsPerBand), maxBandMembers)
    val shingled = sh.select(col("id").as("tid")).distinct()
    (membership, textPairs, shingled)
  }

  def collapsedLshPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      numHashes: Int,
      rowsPerBand: Int): DataFrame = {
    val (membership, textPairs, shingled) =
      collapsedParts(docs, idCol, textCol, shingleN, numHashes, rowsPerBand)
    val cross = textPairs
      .join(membership.select(col("doc_id").as("d1"), col("tid").as("id_a")), Seq("id_a"))
      .join(membership.select(col("doc_id").as("d2"), col("tid").as("id_b")), Seq("id_b"))
      .select(least(col("d1"), col("d2")).as("doc_a"), greatest(col("d1"), col("d2")).as("doc_b"))
    val m2 = membership.join(shingled, Seq("tid"))
    // same-text pairs: ONE shuffle (groupBy tid) + in-row pair expansion,
    // instead of a two-exchange self-join on tid. doc_a < doc_b falls out
    // of the sorted id list and i < j.
    val same = m2.groupBy(col("tid"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(ids) - 2),
          |  i -> transform(sequence(i + 1, size(ids) - 1),
          |    j -> struct(ids[i] AS doc_a, ids[j] AS doc_b))))""".stripMargin)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
    // No distinct needed: each doc has exactly one tid and textPairs is
    // already distinct, so cross pairs are unique; same-text pairs have
    // equal tids while cross pairs have different ones, so the branches
    // are disjoint. (The naive form NEEDS the distinct — one pair per
    // colliding band — which is exactly the shuffle the collapse avoids.)
    cross.union(same)
  }

  /** MinHash agreement per LSH candidate pair — the banding-calibration
    * diagnostic: for every candidate text pair, how many of the k
    * minhashes agree (n_matching/k estimates the Jaccard similarity the
    * banding thresholds were tuned against). Pairwise work runs on the
    * CANDIDATES only (already subquadratic after banding), and the
    * signature table carries k small strings per text. Pure integer
    * output (n_matching, k) — no float division. Returns
    * (id_a, id_b, n_matching, k) over canonical texts.
    */
  def minhashAgreement(docs: DataFrame, idCol: String, textCol: String,
                       shingleN: Int, numHashes: Int,
                       rowsPerBand: Int): DataFrame = {
    val canon = docs.select(md5(col(textCol)).as("graft_th"), col(textCol).as("graft_t"))
      .groupBy(col("graft_th")).agg(min(col("graft_t")).as("graft_t"))
      .select(col("graft_th").as("id"), col("graft_t").as("text"))
    val sh = CacheRegistry.persist(distinctShingles(canon, "id", "text", shingleN))
    val sigs = CacheRegistry.persist(minHashSignatures(sh, numHashes))
    val pairs = lshCandidatePairs(bandKeys(sigs, rowsPerBand))
    pairs
      .join(sigs.select(col("id").as("id_a"), col("k"), col("minhash").as("graft_ma")),
        Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("k"), col("minhash").as("graft_mb")),
        Seq("id_b", "k"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(when(col("graft_ma") === col("graft_mb"), 1L).otherwise(0L))
          .as("n_matching"),
        count(lit(1)).as("k"))
  }

  /** Banding calibration table — the eval that justifies (numHashes,
    * rowsPerBand) choices: for every post-banding candidate pair, the
    * MinHash agreement (the Jaccard ESTIMATE, n_matching of k) and the
    * EXACT shingle-set Jaccard, averaged per agreement level. A
    * well-calibrated family shows mean exact Jaccard ≈ n_matching/k;
    * heavy divergence means degenerate shingles (the q106/q113
    * boilerplate pathology) or too few hashes. Exact-integer
    * arithmetic throughout (bp + HALF_UP means).
    *
    * Scale shape: identical front half to [[minhashAgreement]]
    * (canonical texts, banding — pairwise work only on candidates);
    * the exact-Jaccard check joins the candidate pairs back onto the
    * distinct-shingle table, so its volume is candidates × shared
    * shingles, never corpus². Output: (n_matching, n_pairs,
    * mean_exact_bp).
    */
  def minhashCalibration(docs: DataFrame, textCol: String,
                         shingleN: Int, numHashes: Int,
                         rowsPerBand: Int): DataFrame = {
    val canon = docs.select(md5(col(textCol)).as("graft_th"), col(textCol).as("graft_t"))
      .groupBy(col("graft_th")).agg(min(col("graft_t")).as("graft_t"))
      .select(col("graft_th").as("id"), col("graft_t").as("text"))
    val sh = CacheRegistry.persist(distinctShingles(canon, "id", "text", shingleN))
    val sigs = CacheRegistry.persist(minHashSignatures(sh, numHashes))
    val pairs = CacheRegistry.persist(lshCandidatePairs(bandKeys(sigs, rowsPerBand)))
    val agree = pairs
      .join(sigs.select(col("id").as("id_a"), col("k"), col("minhash").as("graft_ma")),
        Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("k"), col("minhash").as("graft_mb")),
        Seq("id_b", "k"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(when(col("graft_ma") === col("graft_mb"), 1L).otherwise(0L))
        .as("n_matching"))
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("graft_n"))
    val inter = pairs
      .join(sh.select(col("id").as("id_a"), col("shingle")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("graft_ni"))
    agree
      .join(inter, Seq("id_a", "id_b"), "left")
      .join(sizes.select(col("id").as("id_a"), col("graft_n").as("graft_na")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("graft_n").as("graft_nb")), Seq("id_b"))
      .select(col("n_matching"),
        expr("""(20000 * coalesce(graft_ni, 0) + (graft_na + graft_nb - coalesce(graft_ni, 0)))
               |DIV (2 * (graft_na + graft_nb - coalesce(graft_ni, 0)))""".stripMargin)
          .as("graft_ebp"))
      .groupBy(col("n_matching"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("graft_ebp")).as("graft_s"))
      .select(col("n_matching"), col("n_pairs"),
        expr("(2 * graft_s + n_pairs) DIV (2 * n_pairs)").as("mean_exact_bp"))
  }

  /** End-to-end near-duplicate removal — the composition a pipeline
    * actually runs: LSH candidates → duplicate clusters → per-document
    * keep decision. Every document gets its cluster's minimum id as
    * `keep_id` (documents with no near-dup keep themselves); `kept` = 1
    * exactly for cluster canonicals, so `filter($"kept" === 1)` yields
    * the deduplicated corpus and the (doc_id, keep_id) table is the
    * provenance map.
    *
    * Scale design: connected components run on the CANONICAL-TEXT graph,
    * never the document graph. Same-text documents form cliques, so the
    * doc-level components are exactly the text-level components expanded
    * through membership — but the text graph has |distinct texts| nodes
    * where the doc graph has O(docs²) same-text edges (15M at sf0.1,
    * unbounded at corpus scale). Each text is represented by its minimum
    * member doc id, making the text-component label directly the
    * cluster-min doc id. Texts too short to shingle never enter LSH
    * (they have no signature), so their documents keep themselves —
    * identical to the pair-level semantics in [[collapsedLshPairs]].
    * Returns (doc_id, keep_id, kept LONG), one row per input doc.
    */
  def dedupCorpus(docs: DataFrame, idCol: String, textCol: String,
                  shingleN: Int, numHashes: Int, rowsPerBand: Int,
                  maxBandMembers: Option[Int] = None): DataFrame = {
    val (membership, textPairs, shingled) =
      collapsedParts(docs, idCol, textCol, shingleN, numHashes, rowsPerBand,
        maxBandMembers)
    // text → its minimum member doc (the text's representative)
    val reps = CacheRegistry.persist(
      membership.groupBy(col("tid")).agg(min(col("doc_id")).as("rep")))
    // components over canonical texts, on numeric representative ids:
    // cluster label = min rep = min doc id across the whole cluster
    val repPairs = textPairs
      .join(reps.select(col("tid").as("id_a"), col("rep").as("rep_a")), Seq("id_a"))
      .join(reps.select(col("tid").as("id_b"), col("rep").as("rep_b")), Seq("id_b"))
      .select(col("rep_a"), col("rep_b"))
    val comp = connectedComponents(repPairs, "rep_a", "rep_b")
    // expand back to documents: shingled texts adopt their cluster label
    // (falling back to their own rep for texts with no candidate pair);
    // unshingled texts keep every document as its own canonical
    val tidLabel = reps
      .join(shingled.withColumn("shingled", lit(true)), Seq("tid"), "left")
      .join(comp.withColumnRenamed("id", "rep"), Seq("rep"), "left")
      .select(col("tid"),
        when(col("shingled"), coalesce(col("comp"), col("rep"))).as("label"))
    membership
      .join(tidLabel, Seq("tid"))
      .select(
        col("doc_id").cast("long").as("doc_id"),
        coalesce(col("label"), col("doc_id")).cast("long").as("keep_id"),
        when(coalesce(col("label"), col("doc_id")) === col("doc_id"), 1L)
          .otherwise(0L).as("kept"))
  }

  /** Quality-aware duplicate-cluster representative selection: the same
    * near-duplicate clusters as [[dedupCorpus]] (LSH candidates →
    * connected components on the canonical-text graph), but the kept
    * document is the member with the MOST whitespace tokens (integer
    * score — no float to drift; ties → lowest doc id) instead of the
    * blind minimum id. This is the curation refinement real pipelines
    * apply: when a cluster mixes a full article with truncated copies,
    * keep the longest, not the numerically first.
    *
    * Scale shape: everything [[dedupCorpus]] does, plus one
    * cluster-keyed max(struct) aggregation (map-side combinable,
    * cluster-count-sized output) and one broadcast-sized join back —
    * no windows over the corpus. Returns
    * (doc_id, cluster_id, q_score, rep_id, kept LONG).
    */
  def qualityRepresentatives(docs: DataFrame, idCol: String, textCol: String,
                             shingleN: Int, numHashes: Int,
                             rowsPerBand: Int): DataFrame = {
    val labels = dedupCorpus(docs, idCol, textCol, shingleN, numHashes, rowsPerBand)
      .select(col("doc_id"), col("keep_id").as("cluster_id"))
    val scored = docs.select(col(idCol).cast("long").as("doc_id"),
      size(split(col(textCol), " ")).cast("long").as("q_score"))
    // members embeds the whole LSH→CC DAG and feeds BOTH the rep agg and
    // the final join — persist or the front half executes per branch
    // (PERF LESSON 1). Narrow: three longs per corpus row.
    val members = CacheRegistry.persist(labels.join(scored, Seq("doc_id")))
    // lexicographic max over (score, -id) = highest score, ties → lowest id
    val reps = members.groupBy(col("cluster_id"))
      .agg(max(struct(col("q_score"), (-col("doc_id")).as("nid"))).as("b"))
      .select(col("cluster_id"), (-col("b.nid")).as("rep_id"))
    members.join(reps, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("q_score"), col("rep_id"),
        when(col("doc_id") === col("rep_id"), 1L).otherwise(0L).as("kept"))
  }

  /** Scale-path variant on Spark ML's MinHashLSH: shingle sets →
    * HashingTF sparse vectors → approxSimilarityJoin. Trades the
    * engine-independent md5 hash family for the ML library's optimized
    * implementation — use when oracle reproducibility is not required.
    * Returns (id_a, id_b, jaccard_distance).
    */
  def minHashLshMl(shingleDf: DataFrame, numHashTables: Int, maxDistance: Double): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    val sets = shingleDf.groupBy(col("id"))
      .agg(collect_set(col("shingle")).as("shingles"))
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 18)
    val featured = tf.transform(sets)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(42L)
    val model = lsh.fit(featured)
    model.approxSimilarityJoin(featured, featured, maxDistance, "dist")
      .select(
        col("datasetA.id").as("id_a"),
        col("datasetB.id").as("id_b"),
        col("dist"))
      .filter(col("id_a") < col("id_b"))
  }

  /** 60-bit SimHash from whitespace tokens (multiplicity preserved):
    * token hash = first 15 hex chars of md5 as a long; bit j of the
    * signature is set when the +1/−1 votes of token bit j sum positive.
    *
    * The vote matrix runs in ONE [[graft.functions.VecKernels.simhash60]]
    * kernel call per row — a narrow fully-codegen'd scan with NO
    * shuffle. The nested-HOF fold it replaces (aggregate carrying a
    * 60-slot vote vector rebuilt by zip_with per token) is
    * CodegenFallback AND allocates a 60-long array per token; the
    * explode × 60-bit-join formulation costs a 60× row blowup plus two
    * exchanges. Votes are order-independent integer sums, so all three
    * forms are value-identical — only the cost differs.
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.VecFunctions.register(df.sparkSession)
    df.select(col(idCol).as("id"),
        expr(s"transform(split($textCol, ' '), " +
          "t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT))").as("hvs"))
      .select(col("id"), call_function("graft_simhash", col("hvs")).as("simhash"))
  }

  /** Snapshot diff between two corpus drops keyed by document id: the
    * crawl-refresh audit that says what the new snapshot ADDED,
    * REMOVED, CHANGED (same id, different content), or left UNCHANGED
    * — the input to incremental reprocessing (only added+changed docs
    * re-enter the dedup/curation pipeline) and to deletion-compliance
    * checks. Content comparison is by md5, so the join ships two
    * 32-char digests per id, never the documents; one id-keyed
    * full-outer shuffle (bucket both snapshots by id to make it
    * exchange-free — [[graft.sources.BucketedWarehouse]]).
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    def hashed(df: DataFrame, h: String) = df.select(
      col(idCol).as("id"), md5(coalesce(col(textCol), lit(""))).as(h))
    hashed(a, "hash_a").join(hashed(b, "hash_b"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("hash_a").isNull, lit("added"))
          .when(col("hash_b").isNull, lit("removed"))
          .when(col("hash_a") =!= col("hash_b"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Incremental dedup of a NEW batch against an already-ingested
    * reference corpus — the shape every snapshot-over-snapshot crawl
    * pipeline runs: `exact_dup` = the batch document's content hash
    * already exists in the reference; `near_dup` = any of its LSH band
    * keys does. Both checks are semi-joins against reference-derived
    * tables (hash set / band-key set), so the cost scales with the
    * BATCH plus one pass over the reference — no batch×reference
    * pairing ever forms, and at production scale the reference tables
    * are precomputed once per snapshot and reused. Returns one row per
    * new doc: (idCol, exact_dup LONG, near_dup LONG).
    */
  def dedupAgainst(newDocs: DataFrame, ref: DataFrame,
                   idCol: String, textCol: String,
                   shingleN: Int, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val refHashes = ref.select(md5(col(textCol)).as("graft_h")).distinct()
      .withColumn("graft_exact", lit(1L))
    val refBands = bandKeys(
        minHashSignatures(shingles(ref, idCol, textCol, shingleN), numHashes), rowsPerBand)
      .select(col("band"), col("band_key")).distinct()
    val newBands = bandKeys(
        minHashSignatures(shingles(newDocs, idCol, textCol, shingleN), numHashes), rowsPerBand)
    val nearIds = newBands.join(refBands, Seq("band", "band_key"))
      .select(col("id")).distinct()
      .withColumn("graft_near", lit(1L))
    newDocs.select(col(idCol), md5(col(textCol)).as("graft_h"))
      .join(refHashes, Seq("graft_h"), "left")
      .join(nearIds.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("graft_exact"), lit(0L)).as("exact_dup"),
        coalesce(col("graft_near"), lit(0L)).as("near_dup"))
  }

  /** SimHash near-duplicate pairs (Charikar banding): the 60-bit
    * signature splits into `nBands` bands of `bandBits` bits; two
    * documents are candidates when any band matches exactly (a pair
    * within hamming distance d < nBands must agree on at least one band
    * by pigeonhole, so recall at maxHamming ≤ nBands-1 is total), and a
    * candidate survives when the full signature hamming distance is ≤
    * `maxHamming`. Scale shape: the band join buckets on (band, key) —
    * pairwise work is per-bucket, never all-pairs — and the signature
    * table is computed once (persisted through both join sides).
    * Returns (doc_a, doc_b, hamming), doc_a < doc_b, distinct.
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   nBands: Int = 4, bandBits: Int = 15,
                   maxHamming: Int = 3): DataFrame = {
    require(nBands > 0 && bandBits > 0 && nBands * bandBits <= 60,
      s"bands ${nBands}x$bandBits exceed the 60-bit signature")
    // pigeonhole recall bound: a pair differing in nBands bits can
    // spread one difference per band and escape every bucket, so the
    // total-recall claim above only holds for maxHamming <= nBands-1 —
    // enforce it instead of silently losing pairs
    require(maxHamming <= nBands - 1,
      s"maxHamming $maxHamming exceeds the banding recall bound ${nBands - 1}")
    // signature table feeds both join sides. Cache lifecycle:
    // [[CacheRegistry]] — release after materializing.
    val sig = CacheRegistry.persist(simHash(df, idCol, textCol))
    val mask = (1L << bandBits) - 1
    // all bands in ONE pass over the signature table (explode, not a
    // per-band union)
    val banded = sig.select(col("id"), col("simhash"),
      explode(array((0 until nBands).map { b =>
        struct(lit(b).as("b"),
          shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask)).as("bk"))
      }: _*)).as("band"))
      .select(col("id"), col("simhash"), col("band.b").as("b"), col("band.bk").as("bk"))
    val a = banded.select(col("b"), col("bk"), col("id").as("doc_a"), col("simhash").as("sa"))
    val bb = banded.select(col("b"), col("bk"), col("id").as("doc_b"), col("simhash").as("sb"))
    a.join(bb, Seq("b", "bk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sa"), col("sb")).distinct()
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact pairwise n-gram Jaccard via distinct-shingle join. Returns
    * integer (intersection, union) so comparisons stay exact; callers
    * filter e.g. `inter*2 >= union` for J >= 0.5. `blockCol` (optional)
    * restricts pairs to a blocking key (language, LSH bucket, ...).
    */
  def ngramJaccardPairs(shingleDf: DataFrame): DataFrame = {
    // distinctSh feeds the sizes agg and both sides of the intersection
    // self-join — persist so the distinct shuffle runs once, not three
    // times. Cache lifecycle: [[CacheRegistry]] — release after use.
    val distinctSh = CacheRegistry.persist(
      shingleDf.select(col("id"), col("shingle")).distinct())
    val sizes = distinctSh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val a = distinctSh.select(col("shingle"), col("id").as("id_a"))
    val b = distinctSh.select(col("shingle"), col("id").as("id_b"))
    val inter = a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter_count"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), Seq("id_b"))
      .select(
        col("id_a"), col("id_b"), col("inter_count"),
        (col("n_a") + col("n_b") - col("inter_count")).as("union_count"))
  }

  /** Connected components over an undirected duplicate-pair graph:
    * (id, component) where component = min id reachable from the node —
    * the cluster assignment step that turns near-dup PAIRS (LSH / Jaccard
    * / cosine output) into keep/drop decisions (keep id == component).
    *
    * Adaptive execution (the same judgment AQE applies to joins): the
    * edge table is materialized once, and if it fits comfortably on the
    * driver (≤ `smallGraphThreshold` edges — near-dup graphs after LSH
    * blocking are sparse relative to the corpus) components are solved
    * exactly with a driver-side union-find in one collect, avoiding a
    * dozen fixed-latency iterative jobs. Larger graphs run distributed
    * min-label propagation: each round every node adopts the minimum
    * label in its closed neighborhood; converges after graph-diameter
    * rounds (duplicate clusters are near-cliques, so 2-3 in practice).
    * Each round is one shuffle of the label table; `localCheckpoint`
    * truncates the growing lineage so round N's plan does not replay
    * rounds 1..N-1. Runs until a fixpoint (bounded by `maxIter`, then
    * asserts convergence rather than returning partial labels).
    *
    * `smallGraphThreshold < 0` (the default) resolves the cutoff from
    * the `graft.cc.smallGraphEdges` session conf, defaulting to 1M
    * edges — boxed (Long, Long) tuples plus the union-find maps cost
    * ~100 bytes/edge on the driver, so 1M stays ~100 MB, safe even for
    * a default 1g driver heap. Raise the conf on drivers sized for it.
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20,
                          smallGraphThreshold: Long = -1L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val smallCutoff =
      if (smallGraphThreshold >= 0L) smallGraphThreshold
      else spark.conf.get("graft.cc.smallGraphEdges", "1000000").toLong
    val a = col(aCol).cast("long")
    val b = col(bCol).cast("long")

    // Partition-local union-find over an edge partition, emitted as star
    // edges (node → min node of its partition-local component). Exactly
    // connectivity-preserving: the union over partitions of each
    // partition's spanning star has the same components as the union of
    // the original edges, and |output| is bounded by the partition's
    // NODE count — near-clique duplicate graphs (3M edges over 5k texts
    // at sf0.1/t=0.8) contract to ~nodes·partitions edges in ONE narrow
    // pass, where min-label propagation paid diameter × (join + agg)
    // shuffles over the full edge set. Memory is O(nodes per partition),
    // bounded by the partition's edge bytes — never corpus-shaped.
    def contractPartitions(es: org.apache.spark.sql.Dataset[(Long, Long)])
        : org.apache.spark.sql.Dataset[(Long, Long)] =
      es.mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (u, v) =>
          parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
          val (ru, rv) = (find(u), find(v))
          if (ru != rv) parent(if (ru < rv) rv else ru) = math.min(ru, rv)
        }
        val minOfRoot = scala.collection.mutable.HashMap.empty[Long, Long]
        parent.keys.foreach { n =>
          val r = find(n)
          minOfRoot(r) = math.min(minOfRoot.getOrElse(r, Long.MaxValue), n)
        }
        parent.keysIterator.map(n => (n, minOfRoot(find(n))))
      }

    // ONE materialization of the (possibly expensive) edges subtree; the
    // driver cutoff (and its documented memory sizing) is in input edge
    // rows — callers pass already-distinct pair sets, and duplicates only
    // push toward the distributed path (never unsafe).
    var cur = edges.select(a.as("_1"), b.as("_2")).as[(Long, Long)].persist()
    var curCount = cur.count()
    val inputEdges = cur
    // Contract while the graph is too big for the driver and still
    // shrinking: round 1 runs on the verification join's output
    // partitioning; later rounds co-locate each node's star edges so
    // cross-partition components keep merging. Near-clique graphs land
    // under the cutoff in one round; a path-shaped adversary stops
    // shrinking and falls through to label propagation, which is exact
    // on the contracted graph (same components, far fewer edges).
    var rounds = 0
    while (curCount > smallCutoff && rounds < 3) {
      val next = contractPartitions(
        if (rounds == 0) cur else cur.repartition(col("_1"))).persist()
      val nextCount = next.count()
      if (cur ne inputEdges) cur.unpersist()
      val stalled = nextCount > (curCount * 7) / 10
      cur = next
      curCount = nextCount
      rounds = if (stalled) 3 else rounds + 1
    }
    if (curCount <= smallCutoff) {
      // Driver union-find (rank + path compression), then component =
      // min id per root — identical labels to the distributed path.
      val es = cur.collect()
      if (cur ne inputEdges) cur.unpersist()
      inputEdges.unpersist()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (u, v) =>
        parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) parent(if (ru < rv) rv else ru) = math.min(ru, rv)
      }
      val minOfRoot = scala.collection.mutable.HashMap.empty[Long, Long]
      parent.keys.foreach { n =>
        val r = find(n)
        minOfRoot(r) = math.min(minOfRoot.getOrElse(r, Long.MaxValue), n)
      }
      return parent.keys.toSeq.map(n => (n, minOfRoot(find(n)))).toDF("id", "comp")
    }
    // Distributed min-label propagation over the contracted graph: both
    // orientations from one pass over the persisted frame.
    val sym = cur.toDF("cu", "cv")
      .select(explode(array(
        struct(col("cu").as("u"), col("cv").as("v")),
        struct(col("cv").as("u"), col("cu").as("v")))).as("e"))
      .select(col("e.u"), col("e.v"))
      .distinct()
      .persist()
    sym.count()
    if (cur ne inputEdges) cur.unpersist()
    inputEdges.unpersist()
    def propagate(l: DataFrame): DataFrame =
      sym.join(l, sym("v") === l("id"))
        .select(col("u").as("id"), col("comp"))
        .union(l)
        .groupBy("id").agg(min("comp").as("comp"))
    // Labels only ever decrease, so the label-sum is a monotone
    // convergence witness: unchanged sum == fixpoint. The sum is a
    // narrow scan of the just-checkpointed labels — much cheaper than
    // re-joining old vs new labels every round.
    def labelSum(l: DataFrame): java.math.BigDecimal =
      l.agg(sum(col("comp").cast("decimal(38,0)"))).first().getDecimal(0)
    // Seed with the first neighborhood min (round 1's propagate, fused):
    // comp₀ = min(id, min neighbor).
    var labels = sym.groupBy(col("u"))
      .agg(least(min(col("v")), col("u")).as("comp"))
      .select(col("u").as("id"), col("comp"))
      .localCheckpoint()
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = propagate(labels).localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      iter += 1
    }
    sym.unpersist()
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** Segment-level exact substring dedup (the paragraph-dedup pass of a
    * training pipeline, at fixed word-window granularity since the
    * corpus carries no paragraph marks): each document splits into
    * consecutive non-overlapping `segWords`-word segments, a segment
    * occurrence is kept iff it is the corpus-wide FIRST occurrence of
    * that segment text (smallest (doc, position)), and every document is
    * re-assembled from its kept segments in order. Returns one row per
    * document: (id, n_segments, n_kept, deduped_text) — deduped_text is
    * NULL when every segment of the document occurred earlier.
    *
    * Scale shape: segmentation is a narrow scan (non-overlapping slices
    * copy each word once, unlike shingling); first-occurrence is a
    * map-side-combinable `min(struct(id, seg_no))` keyed by segment
    * hash, so the agg shuffle moves one row per DISTINCT segment; the
    * flag join shuffles the segment table once (sort-merge + AQE — the
    * first-occurrence side has one row per distinct segment, never a
    * hot-key blowup); reassembly is one id-keyed groupBy. The shared
    * segment subtree is recomputed (twice) rather than persisted: it is
    * a narrow projection of the corpus, and caching an exploded 100 TB
    * corpus costs more than a second parquet scan.
    */
  // Non-overlapping segWords-word segments of the pre-split word array —
  // unlike shingling each word is copied once, so segmentation stays a
  // narrow codegen'd scan.
  private def segmentArray(segWords: Int): Column =
    expr(
      s"""transform(sequence(0, (size(graft_ws) - 1) div $segWords),
         |          i -> concat_ws(' ', slice(graft_ws, i * $segWords + 1, $segWords)))"""
        .stripMargin)

  def segmentDedup(df: DataFrame, idCol: String, textCol: String,
                   segWords: Int): DataFrame = {
    require(segWords > 0, s"segWords must be positive, got $segWords")
    val segs = df
      .select(col(idCol).as("id"), split(col(textCol), " ").as("graft_ws"))
      .select(col("id"), segmentArray(segWords).as("graft_segs"))
      .select(col("id"), size(col("graft_segs")).cast("long").as("n_segments"),
        posexplode(col("graft_segs")).as(Seq("seg_no", "seg")))
      .select(col("id"), col("n_segments"), col("seg_no").cast("long").as("seg_no"),
        col("seg"), md5(col("seg")).as("graft_sh"))
    val firsts = segs.groupBy(col("graft_sh"))
      .agg(min(struct(col("id"), col("seg_no"))).as("graft_first"))
    segs.join(firsts, "graft_sh")
      .withColumn("graft_keep",
        col("graft_first.id") === col("id") && col("graft_first.seg_no") === col("seg_no"))
      .groupBy(col("id"))
      .agg(
        max(col("n_segments")).as("n_segments"),
        sum(when(col("graft_keep"), 1L).otherwise(0L)).as("n_kept"),
        // collect_list skips the nulls the when() emits for dropped
        // segments; sort_array restores document order (seg_no leads
        // the struct), so reassembly is deterministic.
        concat_ws(" ", transform(
          sort_array(collect_list(when(col("graft_keep"),
            struct(col("seg_no"), col("seg"))))),
          s => s.getField("seg"))).as("graft_text"))
      .select(col("id"), col("n_segments"), col("n_kept"),
        when(col("n_kept") === 0L, lit(null)).otherwise(col("graft_text"))
          .as("deduped_text"))
  }

  /** Cross-group duplication matrix at segment granularity: for every
    * pair of groups (sources, crawls, snapshots — `groupCol`), how many
    * DISTINCT `segWords`-word segments occur in both. The provenance
    * profile that tells a corpus build which sources mirror each other
    * before any pairwise dedup runs.
    *
    * Scale shape: per-doc `array_distinct` dedups inside the narrow
    * scan; ONE segment-hash-keyed groupBy collects the bounded set of
    * groups per segment (≤ #groups, with partial aggregation); pairs
    * expand IN-ROW from that set — the corpus never self-joins, and the
    * pair count per segment is ≤ #groups², independent of how many
    * documents share it. Returns (src_a, src_b, n_shared_segments),
    * src_a < src_b.
    */
  def crossGroupSegmentOverlap(df: DataFrame, groupCol: String,
                               textCol: String, segWords: Int): DataFrame = {
    require(segWords > 0, s"segWords must be positive, got $segWords")
    df.select(col(groupCol).as("graft_src"), split(col(textCol), " ").as("graft_ws"))
      .select(col("graft_src"),
        explode(array_distinct(segmentArray(segWords))).as("seg"))
      .groupBy(md5(col("seg")).as("graft_segh"))
      .agg(sort_array(collect_set(col("graft_src"))).as("srcs"))
      .filter(size(col("srcs")) >= 2)
      .select(explode(expr(
        """flatten(transform(srcs,
          |  (a, i) -> transform(slice(srcs, i + 2, size(srcs)),
          |                      b -> named_struct('src_a', a, 'src_b', b))))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("n_shared_segments"))
  }

  /** Maximal cross-document duplicated spans — the substring-level dedup
    * used on training corpora (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better": memorized spans matter, not just
    * whole-document dups; reference surface: SwiftBeaver has no text
    * analogue, this generalizes its overlap-dedup idea to corpora).
    * A token position is covered when the `n`-gram starting there occurs
    * in at least `minDocs` DISTINCT documents; overlapping covered
    * intervals [pos, pos+n) merge gaps-and-islands into maximal spans.
    * Returns (id, span_start, span_end) in token indices, end-exclusive.
    *
    * Scale shape: one n-gram-keyed groupBy (map-side combinable
    * count-distinct over doc ids is approximated exactly here by a
    * two-level agg), one shuffle join back on the gram, and a per-DOC
    * window for the interval merge — no corpus self-join anywhere; the
    * join fan-out is corpus positions, not position pairs.
    */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
                     n: Int, minDocs: Int = 2): DataFrame = {
    require(n > 0 && minDocs >= 2, s"need n>0, minDocs>=2; got n=$n minDocs=$minDocs")
    val grams = df
      .select(col(idCol).as("id"), split(col(textCol), " ").as("graft_ws"))
      .filter(size(col("graft_ws")) >= n)
      .select(col("id"), explode(expr(
        s"""transform(sequence(0, size(graft_ws) - $n),
           |  i -> struct(i AS pos, concat_ws(' ', slice(graft_ws, i + 1, $n)) AS gram))"""
          .stripMargin)).as("g"))
      .select(col("id"), col("g.pos").cast("long").as("pos"), md5(col("g.gram")).as("graft_gh"))
    // distinct (gram, id) first so the count is map-side combinable,
    // then the df count — two partial-agg shuffles on the same key
    val dup = grams.select(col("graft_gh"), col("id")).distinct()
      .groupBy(col("graft_gh")).agg(count(lit(1)).as("graft_df"))
      .filter(col("graft_df") >= minDocs)
      .select(col("graft_gh"))
    val byDoc = Window.partitionBy("id").orderBy("pos")
    grams.join(dup, "graft_gh")
      .withColumn("graft_end", col("pos") + n)
      .withColumn("graft_maxe", max(col("graft_end")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("graft_new",
        when(col("graft_maxe").isNull || col("pos") > col("graft_maxe"), 1L).otherwise(0L))
      .withColumn("graft_isl", sum(col("graft_new")).over(byDoc))
      .groupBy(col("id"), col("graft_isl"))
      .agg(min(col("pos")).as("span_start"), max(col("graft_end")).as("span_end"))
      .select(col("id"), col("span_start"), col("span_end"))
  }

  /** Apply-side of [[duplicateSpans]] — REMOVE the cross-document
    * duplicated spans from each document (the Lee et al. pipeline
    * actually deletes the memorized substrings rather than dropping
    * whole documents). Every token position inside any detected span is
    * cut; survivors re-join in order. Docs with no spans (including
    * those too short to gram) pass through unchanged; a fully-covered
    * doc becomes the empty string.
    *
    * Scale shape: [[duplicateSpans]]' cost plus one id-keyed span
    * collect (spans per doc are bounded by the merge) and a left join
    * back onto the corpus; the cut itself is in-row. Output:
    * (id, clean_text, n_removed).
    */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                           n: Int, minDocs: Int = 2): DataFrame = {
    val spans = duplicateSpans(df, idCol, textCol, n, minDocs)
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("span_start"), col("span_end"))))
        .as("graft_spans"))
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("graft_ws"))
      .join(spans, Seq("id"), "left")
      .withColumn("graft_sp", coalesce(col("graft_spans"),
        expr("CAST(array() AS ARRAY<STRUCT<span_start: BIGINT, span_end: BIGINT>>)")))
      .withColumn("graft_kept", expr(
        """filter(transform(sequence(0, size(graft_ws) - 1),
          |         i -> struct(CAST(i AS BIGINT) AS i, graft_ws[i] AS w)),
          |       p -> NOT exists(graft_sp,
          |         s -> p.i >= s.span_start AND p.i < s.span_end))""".stripMargin))
      .select(col("id"),
        concat_ws(" ", expr("transform(graft_kept, p -> p.w)")).as("clean_text"),
        (size(col("graft_ws")) - size(col("graft_kept"))).cast("long").as("n_removed"))
  }

  /** Document-stitching candidates — pairs where one document's LAST
    * `k` words equal another's FIRST `k` words, the signature of a
    * single source document split across crawl shards / pagination.
    * Re-joining such pairs (and dropping the overlap) recovers full
    * documents that length filters would otherwise discard and dedup
    * would treat as unrelated. Self-pairs and documents shorter than
    * `k` drop.
    *
    * Scale shape: head and tail grams are in-row (one narrow scan),
    * and the candidate join is gram-keyed — volume is Σ per-gram
    * heads×tails, the banding bound; no all-pairs. Output:
    * (prev_doc, next_doc, boundary_gram).
    */
  def stitchCandidates(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val ws = df.select(col(idCol).as("id"), split(col(textCol), " ").as("graft_ws"))
      .filter(size(col("graft_ws")) >= k)
    val tails = ws.select(col("id").as("prev_doc"),
      expr(s"concat_ws(' ', slice(graft_ws, -$k, $k))").as("boundary_gram"))
    val heads = ws.select(col("id").as("next_doc"),
      expr(s"concat_ws(' ', slice(graft_ws, 1, $k))").as("boundary_gram"))
    tails.join(heads, Seq("boundary_gram"))
      .filter(col("prev_doc") =!= col("next_doc"))
      .select(col("prev_doc"), col("next_doc"), col("boundary_gram"))
  }

  /** Cluster-size histogram over a [[connectedComponents]] (or any
    * (member, cluster)) table — the dedup health report: a long tail of
    * pair-sized clusters is normal near-duplication; a giant component
    * means boilerplate or a degenerate bucket glued the corpus together
    * (the q106 pathology, post-clustering view). Two bounded
    * map-side-combinable aggregations; post-shuffle volume is distinct
    * clusters, then distinct sizes. Output: (cluster_size, n_clusters).
    */
  def clusterSizeHistogram(clusters: DataFrame, compCol: String): DataFrame =
    clusters.groupBy(col(compCol)).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))

  /** Exact set-similarity join with PREFIX FILTERING (Chaudhuri et al.
    * 2006 / PPJoin, Xiao et al. 2008) — all document pairs whose
    * word-set Jaccard is ≥ threshold, WITHOUT the all-pairs comparison:
    * order each document's distinct tokens by a global rarity order
    * (document frequency asc, token asc) and keep only the first
    * |T| − ⌈t·|T|⌉ + 1 as its prefix; any pair with J ≥ t must share a
    * prefix token on BOTH sides (J ≥ t ⇒ |A∩B| ≥ ⌈t·|A|⌉, and an
    * intersection that misses the prefix fits inside the ⌈t·|A|⌉−1
    * suffix — contradiction), so the token-keyed prefix join is a
    * LOSSLESS candidate generator. The oracle computes the unfiltered
    * all-pairs answer, so the gate proves losslessness, not just
    * plausibility.
    *
    * Scale shape: candidate volume is Σ per-prefix-token pair counts —
    * rare tokens by construction (the global order puts the rarest
    * first), so the quadratic blowup a raw token join suffers on common
    * tokens never forms. One vocab-keyed df join + one doc-keyed
    * collect + the prefix-token candidate join; verification is an
    * in-row array_intersect on the two bounded token arrays. The
    * threshold test is pure integers (10⁴·|∩| ≥ t_bp·|∪|) — no float on
    * either engine. Output: (id_a, id_b, n_inter, n_union, jaccard_bp).
    */
  /** Canonical-text collapse shared by the exact similarity joins (the
    * q33 judgment): exact-dup classes share one token set, so any
    * text-set similarity is class-invariant — pairwise work runs on
    * DISTINCT texts and doc-level pairs re-expand through membership.
    * On a duplicate-heavy corpus this is the difference between
    * verifying millions of doc pairs and dozens of text pairs
    * (measured 10.5 s → sub-second at sf0.1).
    *
    * Compact surrogate keys for the internal joins: the candidate
    * distinct + verification shuffles move (key, key) pairs, and a
    * 16-byte two-long struct beats the 32-char md5 string exchange
    * width (measured 18.6 s → see BENCH_NOTES). The key is the md5
    * SPLIT INTO TWO LONGS — fully deterministic, unlike
    * monotonically_increasing_id, whose value depends on partition
    * content order: a cache-evicted partition recomputed mid-job could
    * hand DIFFERENT ids to the consumers of `texts` and silently
    * mis-join pairs to documents. 120 of the 128 md5 bits ride along,
    * so collisions are out of the picture too.
    *
    * Returns (texts: graft_tid, graft_t, graft_tidl; membership:
    * graft_did, graft_tid, graft_tidl), both persisted — callers
    * release via [[CacheRegistry]].
    */
  private def canonicalTexts(df: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val texts = CacheRegistry.persist(
      df.select(md5(col(textCol)).as("graft_tid"), col(textCol).as("graft_t")).distinct()
        .withColumn("graft_tidl", struct(
          conv(substring(col("graft_tid"), 1, 15), 16, 10).cast("long").as("h"),
          conv(substring(col("graft_tid"), 16, 15), 16, 10).cast("long").as("l"))))
    val membership = CacheRegistry.persist(
      df.select(col(idCol).as("graft_did"), md5(col(textCol)).as("graft_tid"))
        .join(texts.select(col("graft_tid"), col("graft_tidl")), Seq("graft_tid")))
    (texts, membership)
  }

  /** Re-expand verified text pairs (tidl_a, tidl_b, payload...) to doc
    * pairs through membership, ids canonicalized least/greatest. No
    * forced broadcast — membership is corpus-sized and tp is candidate-
    * pair-sized (unbounded on a similar corpus); AQE broadcasts at
    * runtime exactly when the built side measures small.
    */
  private def expandTextPairs(tp: DataFrame, membership: DataFrame,
      payload: Seq[String]): DataFrame =
    tp.join(membership.select(col("graft_did").as("graft_d1"),
        col("graft_tidl").as("tidl_a")), Seq("tidl_a"))
      .join(membership.select(col("graft_did").as("graft_d2"),
        col("graft_tidl").as("tidl_b")), Seq("tidl_b"))
      .select(least(col("graft_d1"), col("graft_d2")).as("id_a") +:
        greatest(col("graft_d1"), col("graft_d2")).as("id_b") +:
        payload.map(col): _*)

  /** In-row expansions above this many ids chunk + redistribute: the
    * bound on per-row materialized pair arrays (≤ C² structs).
    */
  private val SameTextChunk = 512

  /** Same-text doc pairs: similarity = 1 by construction, inter = union
    * = the class's per-text value (`perText`: graft_tidl → graft_v).
    * One shuffle (groupBy tid) + in-row pair expansion, not a self-join.
    * Output columns named (outInter, outUnion, outBp).
    *
    * ADAPTIVE regime dispatch (the round-14 fix for the round-12
    * q139/q177 regression). A bounded driver probe — max class size
    * via a count-only aggregation over `membership` (already persisted
    * by [[canonicalTexts]]; two-long rows, map-side partial counts) —
    * picks the plan:
    *
    *   - ALL classes ≤ [[SameTextChunk]] (every natural corpus
    *     measured): the pre-chunking plan verbatim — ONE groupBy +
    *     in-row pair explode, no cache, no union, no repartition.
    *     Round-12 ran the chunk-pair scaffolding (two slice copies +
    *     CASE explode + a two-branch union over a persisted chunk
    *     frame) on EVERY class; a same-window ABBA at sf0.1 measured
    *     that scaffolding at +0.7 s on q139 / +0.5 s on q177 (~1.35×)
    *     with the repartition isolated as free — so only corpora that
    *     NEED the shield pay for it.
    *
    *   - any class > [[SameTextChunk]] (the mega-cluster rule): the
    *     OUTPUT is inherently n²/2 rows per n-copy class, but it must
    *     not materialize as ONE in-row array in one task (a 30%-
    *     duplication class at corpus scale is a task OOM), nor expand
    *     inside the single task the groupBy landed it on (a CPU
    *     hotspot). Wide classes explode into (ci ≤ cj) CHUNK-pair rows
    *     — each expanding ≤ C² pairs — and round-robin across the
    *     cluster before expanding; small classes keep the in-row path.
    *     The grouped frame feeds both union branches, so it persists
    *     ([[CacheRegistry]]) to keep the collect_list aggregation
    *     single-execution. Sorted ids + chunk ordering preserve
    *     id_a < id_b exactly in both regimes.
    */
  private def sameTextPairs(membership: DataFrame, perText: DataFrame,
      outInter: String, outUnion: String, outBp: String): DataFrame = {
    val c = SameTextChunk
    val spark = membership.sparkSession
    val grouped = membership.join(perText, Seq("graft_tidl"))
      .groupBy(col("graft_tidl"))
      .agg(sort_array(collect_list(col("graft_did"))).as("ids"),
        first(col("graft_v")).as("graft_v"))
      .filter(size(col("ids")) >= 2)
    def finish(df: DataFrame): DataFrame = df
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("graft_v").as(outInter), col("graft_v").as(outUnion),
        lit(10000L).as(outBp))
    def inRow(rows: DataFrame): DataFrame = rows
      .select(col("graft_v"), explode(expr(
        """flatten(transform(sequence(0, size(ids) - 2),
          |  i -> transform(sequence(i + 1, size(ids) - 1),
          |    j -> struct(ids[i] AS id_a, ids[j] AS id_b))))""".stripMargin)).as("p"))
    def chunkPairs(rows: DataFrame): DataFrame = rows
      .withColumn("graft_nc", expr(s"CAST(ceil(size(ids) / $c.0) AS INT)"))
      .select(col("graft_v"), col("graft_nc"), col("ids"),
        explode(expr(
          s"""flatten(transform(sequence(0, graft_nc - 1),
             |  ci -> transform(sequence(ci, graft_nc - 1),
             |    cj -> struct(ci, cj))))""".stripMargin)).as("cp"))
      .select(col("graft_v"), col("graft_nc"),
        expr(s"slice(ids, cp.ci * $c + 1, $c)").as("graft_l"),
        expr(s"slice(ids, cp.cj * $c + 1, $c)").as("graft_r"),
        (col("cp.ci") === col("cp.cj")).as("graft_same"))
    // within a chunk: ordered pairs; across chunks: full cross product
    // (sorted ids + ci < cj ⇒ every left id < every right id); a
    // trailing 1-id chunk pairs only across (the ELSE arm drops it)
    def expand(rows: DataFrame): DataFrame = rows
      .select(col("graft_v"), explode(expr(
        s"""CASE
           |  WHEN graft_same AND size(graft_l) >= 2 THEN
           |    flatten(transform(sequence(0, size(graft_l) - 2),
           |      i -> transform(sequence(i + 1, size(graft_l) - 1),
           |        j -> struct(graft_l[i] AS id_a, graft_l[j] AS id_b))))
           |  WHEN NOT graft_same THEN
           |    flatten(transform(graft_l,
           |      a -> transform(graft_r, b -> struct(a AS id_a, b AS id_b))))
           |  ELSE array()
           |END""".stripMargin)).as("p"))
    val maxClass = membership.groupBy(col("graft_tidl"))
      .agg(count(lit(1)).as("graft_n"))
      .agg(max(col("graft_n"))).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    if (maxClass <= c) finish(inRow(grouped))
    else {
      val g = CacheRegistry.persist(grouped)
      finish(inRow(g.filter(size(col("ids")) <= c))
        .unionAll(expand(chunkPairs(g.filter(size(col("ids")) > c))
          .repartition(spark.sessionState.conf.numShufflePartitions))))
    }
  }

  def jaccardJoin(df: DataFrame, idCol: String, textCol: String,
      thresholdBp: Long): DataFrame = {
    require(thresholdBp > 0 && thresholdBp <= 10000,
      s"thresholdBp must be in (0, 10000], got $thresholdBp")
    val (texts, membership) = canonicalTexts(df, idCol, textCol)
    val tp = jaccardJoinDistinct(texts, thresholdBp)
    val cross = expandTextPairs(tp, membership,
      Seq("n_inter", "n_union", "jaccard_bp"))
    val sizes = texts.select(col("graft_tidl"),
      size(array_distinct(split(col("graft_t"), " "))).cast("long").as("graft_v"))
    val same = sameTextPairs(membership, sizes, "n_inter", "n_union", "jaccard_bp")
    cross.union(same)
  }

  /** Similarity join over already-distinct texts keyed `graft_tidl`
    * (dense long) / bodied `graft_t`. Output: (tidl_a, tidl_b, n_inter,
    * n_union, jaccard_bp).
    *
    * Two regimes, dispatched on the corpus's measured shape:
    *
    *   - SPARSE (the 100-TB text norm: huge vocabulary, rare tokens) —
    *     prefix-filter candidate join [[prefixJaccardDistinct]], where
    *     candidates ≪ all pairs because prefix tokens are rare.
    *   - DENSE (small vocabulary: category sets, event-type sets, tag
    *     corpora) — every token is common, so the prefix join
    *     degenerates to ~all-pairs WITH a corpus-sized exploded-token
    *     shuffle on top (measured at sf0.1: V=31, every token in ~75%
    *     of docs → 44M candidate rows for 12.5M pairs). There
    *     [[denseJaccardDistinct]] encodes each distinct token set as a
    *     ⌈V/64⌉-word bitmask and verifies ALL pairs with a codegen'd
    *     popcount kernel — no exploded shuffle, no distinct, no array
    *     joins; in this regime the qualifying OUTPUT is itself Θ(pairs)
    *     (24% of all pairs at sf0.1/t=0.8), so all-pairs verification
    *     is output-optimal.
    *
    * Dispatch probes are bounded driver actions (the
    * [[connectedComponents]] edge-count precedent): the vocabulary
    * count is a full `count()` over the persisted dfreq — the same
    * aggregation both regimes consume, so the probe doubles as the
    * cache materialization pass — and the pair-loop budget
    * D²·width ≤ opsPerCore · defaultParallelism keeps the dense path
    * off corpora whose distinct-text count would make the quadratic
    * loop slower than the sparse plan at the session's actual core
    * count. Session confs `graft.jaccard.denseVocabMax` (default 4096)
    * and `graft.jaccard.densePairOpsPerCore` (default 4e9, roughly a
    * few seconds of popcount work per core) tune the cutovers;
    * denseVocabMax=0 forces the sparse path. `dfreq` is persisted
    * ([[CacheRegistry]]) because the probe materializes it and both
    * paths join it back to the token stream — vocabulary-sized, the
    * smallest cacheable frame in the join.
    */
  private def jaccardJoinDistinct(texts: DataFrame, thresholdBp: Long): DataFrame = {
    val spark = texts.sparkSession
    val toks = texts.select(col("graft_tidl").as("id"),
      explode(array_distinct(split(col("graft_t"), " "))).as("tok"))
    val dfreq = CacheRegistry.persist(
      toks.groupBy(col("tok")).agg(count(lit(1)).as("graft_df")))
    val vocabMax = denseVocabMax(spark)
    // full count (not limit(max+1)): both regimes consume dfreq, and a
    // full count materializes its cache completely — see
    // [[weightedJaccardJoin]]'s dispatch note
    val nTexts = texts.count()
    val vocabN = dfreq.count()
    val width = math.max((vocabN + 63) / 64, 1L)
    if (densePathEligible(spark, vocabN, vocabMax, nTexts, width))
      denseJaccardDistinct(texts, toks, dfreq, vocabN.toInt, thresholdBp)
    else prefixJaccardDistinct(texts, toks, dfreq, thresholdBp)
  }

  /** The ONE place the dense-regime cutovers live (both exact and
    * weighted joins dispatch through here — divergent copies would let
    * the two joins pick different regimes on the same corpus):
    * vocabulary within `graft.jaccard.denseVocabMax` AND pair-loop work
    * D²·perPairUnit within `graft.jaccard.densePairOpsPerCore` × the
    * session's actual core count.
    */
  private def denseVocabMax(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.get("graft.jaccard.denseVocabMax", "4096").toInt

  private def densePathEligible(spark: org.apache.spark.sql.SparkSession,
      vocabN: Long, vocabMax: Int, textCount: Long, perPairUnit: Long): Boolean =
    vocabN <= vocabMax && {
      val budget = spark.conf.get("graft.jaccard.densePairOpsPerCore", "4000000000").toDouble
      val cores = math.max(spark.sparkContext.defaultParallelism, 1).toDouble
      textCount.toDouble * textCount.toDouble * perPairUnit.toDouble <= budget * cores
    }

  /** Dense-vocabulary verification: token → bit id (vocabulary sort
    * order — a ≤ denseVocabMax-row single-partition window, bounded by
    * the dispatch gate), per-text bitmask via one kernel call, then a
    * non-equi self-join whose condition carries ONLY the cheap length
    * filter — the popcount kernel runs once per surviving pair in the
    * projection, inside whole-stage codegen. The stream side is
    * repartitioned so the quadratic loop spreads across every core
    * instead of riding the agg's (possibly single) output partition.
    */
  /** Dense-regime doc masks in ONE narrow scan: the vocabulary (vocab-
    * bounded by the dispatch gate, ≤ denseVocabMax) collects to a sorted
    * token-array literal — bit = position, exactly the row_number-over-
    * token-order assignment it replaces — and `graft_tok_mask` sets each
    * text's bits in-row. graft_sz = popcount(m ∩ m) = the distinct token
    * count. Replaces the explode → vocab join → groupBy(collect_list)
    * per-text shuffle the three dense verifiers each paid (measured
    * ~0.7 s of the q139 pipeline at sf0.1).
    */
  private def denseMaskDocs(texts: DataFrame, dfreq: DataFrame): DataFrame = {
    val vocabToks = dfreq.select(col("tok")).orderBy(col("tok"))
      .collect().map(_.getString(0))
    CacheRegistry.persist(
      texts.select(col("graft_tidl").as("id"),
        call_function("graft_tok_mask", col("graft_t"),
          typedLit(vocabToks.toSeq)).as("graft_m"))
        .withColumn("graft_sz",
          call_function("graft_mask_inter", col("graft_m"), col("graft_m"))))
  }

  private def denseJaccardDistinct(texts: DataFrame, toks: DataFrame,
      dfreq: DataFrame, vocabN: Int, thresholdBp: Long): DataFrame = {
    val spark = texts.sparkSession
    graft.functions.VecFunctions.register(spark)
    val docs = denseMaskDocs(texts, dfreq)
    val lhs = docs.repartition(spark.sessionState.conf.numShufflePartitions)
      .select(col("id").as("tidl_a"), col("graft_m").as("graft_ma"),
        col("graft_sz").as("graft_na"))
    val rhs = docs.select(col("id").as("tidl_b"), col("graft_m").as("graft_mb"),
      col("graft_sz").as("graft_nb"))
    // n_inter rides through explode(array(...)) — a 1-element Generate —
    // as an OPTIMIZER BARRIER: written as a plain projection, Catalyst
    // inlines the kernel into the pushed-down join condition and the
    // popcount runs 2-3× per raw combo (including combos the cheap
    // predicates already reject); a filter on a Generate's output cannot
    // push below it, so the join keeps only the cheap length/order
    // predicates and the kernel runs exactly once per surviving pair.
    lhs.join(rhs,
        col("tidl_a") < col("tidl_b") &&
          lit(10000L) * least(col("graft_na"), col("graft_nb")) >=
            lit(thresholdBp) * greatest(col("graft_na"), col("graft_nb")))
      .withColumn("n_inter", explode(array(
        call_function("graft_mask_inter", col("graft_ma"), col("graft_mb")))))
      .withColumn("n_union",
        (col("graft_na") + col("graft_nb") - col("n_inter")).cast("long"))
      .filter(lit(10000L) * col("n_inter") >= lit(thresholdBp) * col("n_union"))
      .withColumn("jaccard_bp", expr("(20000 * n_inter + n_union) DIV (2 * n_union)"))
      .select(col("tidl_a"), col("tidl_b"), col("n_inter"), col("n_union"),
        col("jaccard_bp"))
  }

  /** The prefix-filter join proper (sparse-vocabulary regime). */
  private def prefixJaccardDistinct(texts: DataFrame, toks: DataFrame,
      dfreq: DataFrame, thresholdBp: Long): DataFrame = {
    // per text: tokens in global rarity order + the prefix length
    val ordered = toks.join(dfreq, Seq("tok"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("graft_df"), col("tok")))).as("graft_ts"))
      .select(col("id"), expr("transform(graft_ts, x -> x.tok)").as("graft_toks"))
      .withColumn("graft_sz", size(col("graft_toks")))
      .withColumn("graft_plen",
        col("graft_sz") - expr(s"($thresholdBp * graft_sz + 9999) DIV 10000") + 1)
    // both candidate sides and the verification join read this — persist
    // or the df-join + collect runs three times. Cache lifecycle:
    // [[CacheRegistry]] — release after materializing.
    val docs = CacheRegistry.persist(
      ordered.select(col("id"), col("graft_toks"), col("graft_sz"), col("graft_plen")))
    // LENGTH FILTER (Arasu et al. 2006): J ≥ t ⇒ |∩| ≥ t·|∪| ≥ t·max and
    // |∩| ≤ min, so 10⁴·min(|A|,|B|) ≥ t_bp·max(|A|,|B|) — size-
    // incompatible candidates die at the prefix join, before the
    // distinct shuffle and the array verification. Lossless; carrying
    // one extra long per exploded prefix row is far cheaper than the
    // pairs it prunes.
    val pre = docs.select(col("id"), col("graft_sz"),
      explode(expr("slice(graft_toks, 1, graft_plen)")).as("tok"))
    val cands = pre.select(col("id").as("tidl_a"), col("graft_sz").as("graft_sa"), col("tok"))
      .join(pre.select(col("id").as("tidl_b"), col("graft_sz").as("graft_sb"), col("tok")),
        Seq("tok"))
      .filter(col("tidl_a") < col("tidl_b") &&
        lit(10000L) * least(col("graft_sa"), col("graft_sb")) >=
          lit(thresholdBp) * greatest(col("graft_sa"), col("graft_sb")))
      .select(col("tidl_a"), col("tidl_b")).distinct()
    cands
      .join(docs.select(col("id").as("tidl_a"), col("graft_toks").as("graft_ta"),
        col("graft_sz").as("graft_na")), Seq("tidl_a"))
      .join(docs.select(col("id").as("tidl_b"), col("graft_toks").as("graft_tb"),
        col("graft_sz").as("graft_nb")), Seq("tidl_b"))
      .select(col("tidl_a"), col("tidl_b"),
        size(array_intersect(col("graft_ta"), col("graft_tb"))).cast("long").as("n_inter"),
        col("graft_na"), col("graft_nb"))
      .select(col("tidl_a"), col("tidl_b"), col("n_inter"),
        (col("graft_na") + col("graft_nb") - col("n_inter")).cast("long").as("n_union"))
      .filter(lit(10000L) * col("n_inter") >= lit(thresholdBp) * col("n_union"))
      .withColumn("jaccard_bp", expr("(20000 * n_inter + n_union) DIV (2 * n_union)"))
  }

  /** Exact asymmetric CONTAINMENT join — all document pairs where the
    * smaller word set sits (mostly) inside the other: C(A→B) =
    * |A∩B| / |A|, pair kept when max(C(A→B), C(B→A)) =
    * |∩| / min(|A|,|B|) ≥ threshold. The similarity Jaccard misses by
    * construction: a boilerplate page embedded whole in a longer
    * document scores containment ≈ 1 while Jaccard ≈ |A|/|B| → 0 — the
    * subset-duplication detector (quotation farms, template wrappers,
    * scraped-page concatenations). Output: (id_a, id_b, n_inter, n_a,
    * n_b, cont_a_bp, cont_b_bp) with id_a < id_b and each containment
    * HALF_UP in basis points against ITS OWN side's size.
    *
    * Scale shape mirrors [[jaccardJoin]]: canonical-text collapse, then
    * regime dispatch through the same bounded probes. Sparse corpora
    * run the asymmetric prefix filter: only the candidate pair's
    * SMALLER side is prefix-bounded (|∩| ≥ t·|A| forces the
    * intersection into A's (|A| − ⌈t·|A|⌉ + 1)-token rarity prefix; the
    * larger side is unconstrained — containment has no length filter,
    * which is exactly why it catches what Jaccard prunes). Dense
    * corpora verify all pairs with the bitmask popcount kernel, where
    * the missing length filter costs nothing (that path never used it
    * to bound work). Same-text doc pairs ride the membership groupBy.
    */
  def containmentJoin(df: DataFrame, idCol: String, textCol: String,
      thresholdBp: Long): DataFrame = {
    require(thresholdBp > 0 && thresholdBp <= 10000,
      s"thresholdBp must be in (0, 10000], got $thresholdBp")
    val (texts, membership) = canonicalTexts(df, idCol, textCol)
    val tp = containmentDistinct(texts, thresholdBp)
    // asymmetric payload: n_a/n_b must FOLLOW their doc through the
    // least/greatest canonicalization (expandTextPairs' symmetric
    // payload contract would mispair sizes with flipped ids)
    val cross = tp
      .join(membership.select(col("graft_did").as("graft_d1"),
        col("graft_tidl").as("tidl_a")), Seq("tidl_a"))
      .join(membership.select(col("graft_did").as("graft_d2"),
        col("graft_tidl").as("tidl_b")), Seq("tidl_b"))
      .select(least(col("graft_d1"), col("graft_d2")).as("id_a"),
        greatest(col("graft_d1"), col("graft_d2")).as("id_b"),
        col("n_inter"),
        when(col("graft_d1") <= col("graft_d2"), col("graft_na"))
          .otherwise(col("graft_nb")).as("n_a"),
        when(col("graft_d1") <= col("graft_d2"), col("graft_nb"))
          .otherwise(col("graft_na")).as("n_b"))
      .withColumn("cont_a_bp", expr("(20000 * n_inter + n_a) DIV (2 * n_a)"))
      .withColumn("cont_b_bp", expr("(20000 * n_inter + n_b) DIV (2 * n_b)"))
    val sizes = texts.select(col("graft_tidl"),
      size(array_distinct(split(col("graft_t"), " "))).cast("long").as("graft_v"))
    val same = sameTextPairs(membership, sizes, "n_inter", "n_a", "cont_a_bp")
      .select(col("id_a"), col("id_b"), col("n_inter"),
        col("n_a"), col("n_a").as("n_b"),
        lit(10000L).as("cont_a_bp"), lit(10000L).as("cont_b_bp"))
    cross.select("id_a", "id_b", "n_inter", "n_a", "n_b", "cont_a_bp", "cont_b_bp")
      .union(same)
  }

  /** Containment candidates + verification over distinct texts:
    * (tidl_a, tidl_b, n_inter, graft_na, graft_nb), tidl_a < tidl_b,
    * max-containment ≥ threshold. Regime dispatch = [[jaccardJoinDistinct]]'s.
    */
  private def containmentDistinct(texts: DataFrame, thresholdBp: Long): DataFrame = {
    val spark = texts.sparkSession
    val toks = texts.select(col("graft_tidl").as("id"),
      explode(array_distinct(split(col("graft_t"), " "))).as("tok"))
    val dfreq = CacheRegistry.persist(
      toks.groupBy(col("tok")).agg(count(lit(1)).as("graft_df")))
    val vocabMax = denseVocabMax(spark)
    val nTexts = texts.count()
    val vocabN = dfreq.count()
    val width = math.max((vocabN + 63) / 64, 1L)
    if (densePathEligible(spark, vocabN, vocabMax, nTexts, width))
      denseContainmentDistinct(texts, toks, dfreq, vocabN.toInt, thresholdBp)
    else prefixContainmentDistinct(texts, toks, dfreq, thresholdBp)
  }

  /** Dense-regime containment: the [[denseJaccardDistinct]] bitmask
    * join with the containment predicate — no length pre-filter exists
    * for containment, so the join carries only the id order and the
    * kernel (behind the same 1-element-Generate optimizer barrier)
    * decides every pair.
    */
  private def denseContainmentDistinct(texts: DataFrame, toks: DataFrame,
      dfreq: DataFrame, vocabN: Int, thresholdBp: Long): DataFrame = {
    val spark = texts.sparkSession
    graft.functions.VecFunctions.register(spark)
    val docs = denseMaskDocs(texts, dfreq)
    val lhs = docs.repartition(spark.sessionState.conf.numShufflePartitions)
      .select(col("id").as("tidl_a"), col("graft_m").as("graft_ma"),
        col("graft_sz").as("graft_na"))
    val rhs = docs.select(col("id").as("tidl_b"), col("graft_m").as("graft_mb"),
      col("graft_sz").as("graft_nb"))
    lhs.join(rhs, col("tidl_a") < col("tidl_b"))
      .withColumn("n_inter", explode(array(
        call_function("graft_mask_inter", col("graft_ma"), col("graft_mb")))))
      .filter(lit(10000L) * col("n_inter") >=
        lit(thresholdBp) * least(col("graft_na"), col("graft_nb")))
      .select(col("tidl_a"), col("tidl_b"), col("n_inter"),
        col("graft_na"), col("graft_nb"))
  }

  /** Sparse-regime containment: asymmetric prefix filter. The
    * candidate join pairs each text's rarity prefix against EVERY
    * distinct token of larger texts — |∩| ≥ t·|small| forces the
    * intersection into the small side's prefix, so the join is
    * lossless; equal sizes tie-break on id to emit each pair once.
    */
  private def prefixContainmentDistinct(texts: DataFrame, toks: DataFrame,
      dfreq: DataFrame, thresholdBp: Long): DataFrame = {
    val ordered = toks.join(dfreq, Seq("tok"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("graft_df"), col("tok")))).as("graft_ts"))
      .select(col("id"), expr("transform(graft_ts, x -> x.tok)").as("graft_toks"))
      .withColumn("graft_sz", size(col("graft_toks")))
      .withColumn("graft_plen",
        col("graft_sz") - expr(s"($thresholdBp * graft_sz + 9999) DIV 10000") + 1)
    val docs = CacheRegistry.persist(
      ordered.select(col("id"), col("graft_toks"), col("graft_sz"), col("graft_plen")))
    val pre = docs.select(col("id"), col("graft_sz"),
      explode(expr("slice(graft_toks, 1, graft_plen)")).as("tok"))
    val full = docs.select(col("id"), col("graft_sz"),
      explode(col("graft_toks")).as("tok"))
    val cands = pre.select(col("id").as("graft_s"), col("graft_sz").as("graft_ssz"), col("tok"))
      .join(full.select(col("id").as("graft_l"), col("graft_sz").as("graft_lsz"), col("tok")),
        Seq("tok"))
      .filter(col("graft_ssz") < col("graft_lsz") ||
        (col("graft_ssz") === col("graft_lsz") && col("graft_s") < col("graft_l")))
      .select(least(col("graft_s"), col("graft_l")).as("tidl_a"),
        greatest(col("graft_s"), col("graft_l")).as("tidl_b"))
      .filter(col("tidl_a") =!= col("tidl_b"))
      .distinct()
    cands
      .join(docs.select(col("id").as("tidl_a"), col("graft_toks").as("graft_ta"),
        col("graft_sz").as("graft_na")), Seq("tidl_a"))
      .join(docs.select(col("id").as("tidl_b"), col("graft_toks").as("graft_tb"),
        col("graft_sz").as("graft_nb")), Seq("tidl_b"))
      .select(col("tidl_a"), col("tidl_b"),
        size(array_intersect(col("graft_ta"), col("graft_tb"))).cast("long").as("n_inter"),
        col("graft_na"), col("graft_nb"))
      .filter(lit(10000L) * col("n_inter") >=
        lit(thresholdBp) * least(col("graft_na"), col("graft_nb")))
  }

  /** Exact IDF-WEIGHTED set-similarity join — all document pairs whose
    * weighted word-set Jaccard J_w(A,B) = Σ_{u∈A∩B} w(u) / Σ_{u∈A∪B} w(u)
    * is ≥ threshold, with the weighted prefix filter (Chaudhuri et al.
    * 2006 generalizes directly). Rare tokens count more: w(u) =
    * ⌊N / df(u)⌋ with N = |docs| and df = DOCUMENT frequency (copies
    * included), so two documents sharing distinctive vocabulary score
    * higher than two sharing only stopwords — plain Jaccard's known
    * blind spot on boilerplate-heavy corpora. All-integer weights keep
    * both engines bit-identical (no float idf).
    *
    * Prefix filter, weighted form: order each doc's tokens by global
    * rarity (df asc, token asc — i.e. weight desc), and let the prefix
    * be the SHORTEST head whose suffix weight drops below t·W(doc):
    * J_w ≥ t ⇒ Σ_{A∩B} w ≥ t·Σ_{A∪B} w ≥ t·W(A), and an intersection
    * avoiding the prefix fits inside the suffix weight < t·W(A) —
    * contradiction, so the prefix-token join is LOSSLESS. The weighted
    * length filter prunes 10⁴·min(W_A,W_B) < t_bp·max(W_A,W_B) pairs at
    * the candidate join for the same reason. The oracle computes the
    * unfiltered all-pairs answer, proving losslessness at the gate.
    *
    * Scale shape mirrors [[jaccardJoin]]: canonical-text collapse first
    * (doc-level df recovered by weighting each text's tokens with its
    * copy count), the heavy-weight-first prefix keeps candidate fan-out
    * on the rare end of the vocabulary, verification is one in-row pass
    * over the two bounded (token, weight) arrays, and doc pairs
    * re-expand through the membership join with the strategy left to
    * AQE. N rides in as a 1-row broadcast agg — no driver action.
    * Output: (id_a, id_b, w_inter, w_union, wjaccard_bp).
    */
  def weightedJaccardJoin(df: DataFrame, idCol: String, textCol: String,
      thresholdBp: Long): DataFrame = {
    require(thresholdBp > 0 && thresholdBp <= 10000,
      s"thresholdBp must be in (0, 10000], got $thresholdBp")
    graft.functions.VecFunctions.register(df.sparkSession)
    val (texts, membership) = canonicalTexts(df, idCol, textCol)
    val copies = membership.groupBy(col("graft_tidl"))
      .agg(count(lit(1)).as("graft_copies"))
    val toks = texts.select(col("graft_tidl").as("id"),
      explode(array_distinct(split(col("graft_t"), " "))).as("tok"))
    // doc-level df: each text's tokens occur once per document copy
    val dfreq = toks.join(copies.withColumnRenamed("graft_tidl", "id"), Seq("id"))
      .groupBy(col("tok")).agg(sum(col("graft_copies")).as("graft_df"))
    val nDocs = df.select(count(lit(1)).as("graft_nd"))
    val weights = dfreq.crossJoin(broadcast(nDocs))
      .select(col("tok"), col("graft_df"),
        expr("graft_nd DIV graft_df").as("graft_w"))
    // per text: (tok, w) in rarity order for the prefix, total weight W,
    // prefix length, and TOKEN-SORTED parallel (tokens, weights) arrays
    // for the merge-walk verification kernel (per-text work — the
    // higher-order functions here run once per distinct text, not per
    // candidate pair, so their CodegenFallback cost is immaterial)
    // regime dispatch ([[densePathEligible]], the one shared cutover):
    // probed BEFORE the per-text frame is built, so the dense regime
    // never evaluates (or caches) the prefix-only columns — the
    // prefix-length CodegenFallback aggregate and the rarity-ordered
    // token array exist only on the sparse branch. In the dense regime
    // every prefix token is common, the prefix self-join degenerates to
    // ~all-pairs plus a corpus-sized exploded shuffle, and a
    // budget-gated all-pairs join carrying the (token, weight) arrays
    // straight through — no candidate distinct, no join-backs — is
    // strictly less work. The per-pair merge walk costs O(doc tokens)
    // ≤ vocabN, hence vocabN as the budget's per-pair unit.
    val spark = df.sparkSession
    val vocabMax = denseVocabMax(spark)
    // full count, not limit(max+1).count(): the probe's aggregation IS
    // dfreq (needed by both regimes), so a full count materializes the
    // persisted frame COMPLETELY — a limited count populates only the
    // partitions the incremental CollectLimit touched, and every
    // downstream dfreq consumer re-ran the missing ones (the r10 bench
    // flagged the two extra probe jobs on q151). texts is materialized
    // first so the dfreq scan reads it from cache.
    val dfreqP = CacheRegistry.persist(dfreq)
    val nTexts = texts.count()
    val vocabN = dfreqP.count()
    val dense = densePathEligible(spark, vocabN, vocabMax, nTexts,
      math.max(vocabN, 1L))
    // per text (sparse regime): (tok, w) in rarity order, total weight
    // W, and the TOKEN-SORTED parallel (tokens, weights) arrays for the
    // merge-walk verification kernel (per-text work — the higher-order
    // functions here run once per distinct text, not per candidate
    // pair, so their CodegenFallback cost is immaterial). Built lazily
    // so the dense regime never evaluates it at all.
    def sorted = toks.join(weights, Seq("tok"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(
        struct(col("graft_df"), col("tok"), col("graft_w")))).as("graft_ts"))
      .select(col("id"),
        expr("transform(graft_ts, x -> struct(x.tok AS tok, x.graft_w AS w))").as("graft_tws"))
      .withColumn("graft_wt", expr("aggregate(graft_tws, 0L, (s, x) -> s + x.w)"))
      // graft_tws elements are already struct(tok, w), so sorting the
      // array directly gives UTF8-binary token order for the kernel
      .withColumn("graft_srt", expr("sort_array(graft_tws)"))
      .withColumn("graft_vt", expr("transform(graft_srt, x -> x.tok)"))
      .withColumn("graft_vw", expr("transform(graft_srt, x -> x.w)"))
    val (verified, docs) =
      if (dense) {
        // Dense verification over BITMASKS (the denseJaccardDistinct
        // shape, weighted): tokens map to vocabulary bits, each text
        // becomes a ⌈V/64⌉-word mask + its total weight, and the pair
        // kernel is one word-walk summing the weight table over set
        // bits of a&b — long addition is order-free, so w_inter equals
        // the token-sorted merge walk exactly. The weight table is a
        // vocab-bounded plan literal (the PQ codebook pattern; ≤ 4096
        // longs under the dispatch gate) collected in ONE driver pass
        // that also provides the token→bit map — replacing the two
        // token-string arrays + weight array the join previously
        // copied into every surviving candidate row (measured: q151
        // dense pair stage 4.2 s → 1.3 s at sf0.1).
        val wRows = weights.select(col("tok"), col("graft_w"))
          .orderBy(col("tok")).collect()
        val wTable = wRows.map(_.getLong(1))
        val wLit = typedLit(wTable.toSeq)
        // masks + totals in ONE narrow scan (the denseMaskDocs shape):
        // graft_wt = Σ w over the text's distinct tokens = the weighted
        // self-intersection of its own mask
        val docs = CacheRegistry.persist(
          texts.select(col("graft_tidl").as("id"),
            call_function("graft_tok_mask", col("graft_t"),
              typedLit(wRows.map(_.getString(0)).toSeq)).as("graft_m"))
            .withColumn("graft_wt", call_function("graft_wmask_inter",
              col("graft_m"), col("graft_m"), wLit)))
        val lhs = docs.repartition(spark.sessionState.conf.numShufflePartitions)
          .select(col("id").as("tidl_a"), col("graft_m").as("graft_ma"),
            col("graft_wt").as("graft_wa"))
        val rhs = docs.select(col("id").as("tidl_b"), col("graft_m").as("graft_mb"),
          col("graft_wt").as("graft_wb"))
        val joined = lhs.join(rhs,
            col("tidl_a") < col("tidl_b") &&
              lit(10000L) * least(col("graft_wa"), col("graft_wb")) >=
                lit(thresholdBp) * greatest(col("graft_wa"), col("graft_wb")))
          // explode(array(...)) barrier: see denseJaccardDistinct — keeps
          // the mask kernel out of the pushed-down join condition
          .withColumn("w_inter", explode(array(call_function("graft_wmask_inter",
            col("graft_ma"), col("graft_mb"), typedLit(wTable.toSeq)))))
        (joined, docs)
      } else {
        // the SHORTEST prefix whose suffix weight drops below t·W(doc) —
        // prefix-path-only work, built after the dispatch on purpose
        val docs = CacheRegistry.persist(sorted
          .withColumn("graft_plen", expr(
            s"""aggregate(graft_tws, struct(CAST(0 AS BIGINT) AS cum, 0 AS i, 0 AS p),
               |  (acc, x) -> struct(acc.cum + x.w, acc.i + 1,
               |    CASE WHEN acc.p > 0 THEN acc.p
               |         WHEN 10000 * (acc.cum + x.w) > (10000 - $thresholdBp) * graft_wt
               |           THEN acc.i + 1
               |         ELSE 0 END),
               |  acc -> acc.p)""".stripMargin))
          .select(col("id"), col("graft_tws"), col("graft_vt"), col("graft_vw"),
            col("graft_wt"), col("graft_plen")))
        val pre = docs.select(col("id"), col("graft_wt"),
          explode(expr("transform(slice(graft_tws, 1, graft_plen), x -> x.tok)")).as("tok"))
        val cands = pre.select(col("id").as("tidl_a"), col("graft_wt").as("graft_wa"), col("tok"))
          .join(pre.select(col("id").as("tidl_b"), col("graft_wt").as("graft_wb"), col("tok")),
            Seq("tok"))
          .filter(col("tidl_a") < col("tidl_b") &&
            lit(10000L) * least(col("graft_wa"), col("graft_wb")) >=
              lit(thresholdBp) * greatest(col("graft_wa"), col("graft_wb")))
          .select(col("tidl_a"), col("tidl_b")).distinct()
        cands
          .join(docs.select(col("id").as("tidl_a"), col("graft_vt").as("graft_vta"),
            col("graft_vw").as("graft_vwa"), col("graft_wt").as("graft_wa")), Seq("tidl_a"))
          .join(docs.select(col("id").as("tidl_b"), col("graft_vt").as("graft_vtb"),
            col("graft_wt").as("graft_wb")), Seq("tidl_b"))
          // verification: ONE codegen'd merge walk per pair over the two
          // token-sorted arrays (graft_wisect kernel) — the higher-order-
          // function forms (map_from_entries/aggregate) are CodegenFallback
          // and knocked the whole pair stage out of whole-stage codegen
          // (measured ~10× slower on the sf0.1 pair set)
        val v = cands
          .join(docs.select(col("id").as("tidl_a"), col("graft_vt").as("graft_vta"),
            col("graft_vw").as("graft_vwa"), col("graft_wt").as("graft_wa")), Seq("tidl_a"))
          .join(docs.select(col("id").as("tidl_b"), col("graft_vt").as("graft_vtb"),
            col("graft_wt").as("graft_wb")), Seq("tidl_b"))
          // verification: ONE codegen'd merge walk per pair over the two
          // token-sorted arrays (graft_wisect kernel) — the higher-order-
          // function forms (map_from_entries/aggregate) are CodegenFallback
          // and knocked the whole pair stage out of whole-stage codegen
          // (measured ~10x slower on the sf0.1 pair set)
          .select(col("tidl_a"), col("tidl_b"),
            call_function("graft_wisect",
              col("graft_vta"), col("graft_vwa"), col("graft_vtb")).as("w_inter"),
            col("graft_wa"), col("graft_wb"))
        (v, docs)
      }
    val tp = verified
      .select(col("tidl_a"), col("tidl_b"), col("w_inter"),
        (col("graft_wa") + col("graft_wb") - col("w_inter")).as("w_union"))
      .filter(lit(10000L) * col("w_inter") >= lit(thresholdBp) * col("w_union"))
      .withColumn("wjaccard_bp", expr("(20000 * w_inter + w_union) DIV (2 * w_union)"))
    val cross = expandTextPairs(tp, membership,
      Seq("w_inter", "w_union", "wjaccard_bp"))
    // same-text doc pairs: J_w = 1, value = the text's total weight W
    val perText = docs.select(col("id").as("graft_tidl"), col("graft_wt").as("graft_v"))
    val same = sameTextPairs(membership, perText, "w_inter", "w_union", "wjaccard_bp")
    cross.union(same)
  }

  /** Dedup aggressiveness sweep: cluster statistics at several Jaccard
    * thresholds from ONE candidate generation — the tuning table that
    * answers "how much does each threshold remove, and does any
    * threshold glue the corpus into a mega-cluster?" before committing
    * a full dedup run. Candidate pairs come from [[jaccardJoin]] at the
    * LOOSEST threshold (every tighter pair set is a subset, and the
    * exact (n_inter, n_union) ride along, so tighter thresholds
    * re-filter with the exact integer test — no re-scan, no loss);
    * connected components then run once per threshold over the
    * shrinking edge set. Output, one row per threshold:
    * (threshold_bp, n_docs_clustered, n_clusters, max_cluster,
    * n_removable = docs − clusters, i.e. what a keep-one-per-cluster
    * dedup deletes).
    */
  def thresholdSweep(df: DataFrame, idCol: String, textCol: String,
                     thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    val (edges, classes) = sweepEdges(df, idCol, textCol, thresholds.min)
    val pairs = CacheRegistry.persist(edges)
    val weights = classes.select(col("rep").as("graft_node"),
      col("graft_copies"))
    thresholds.sorted.map { t =>
      val p = pairs.filter(lit(10000L) * col("n_inter") >= lit(t) * col("n_union"))
      val cc = connectedComponents(p, "rep_a", "rep_b")
      // component size in DOCS = Σ copies over its member texts; texts
      // with ≥ 2 copies and no qualifying cross-text edge are clusters
      // of exact duplicates all by themselves
      val compSizes = cc.join(weights, cc("id") === weights("graft_node"))
        .groupBy(col("comp")).agg(sum(col("graft_copies")).as("graft_sz"))
        .select(col("graft_sz"))
      val loners = weights.filter(col("graft_copies") >= 2)
        .join(cc.select(col("id").as("graft_node")), Seq("graft_node"),
          "left_anti")
        .select(col("graft_copies").as("graft_sz"))
      compSizes.unionAll(loners).agg(
          coalesce(sum(col("graft_sz")), lit(0L)).as("n_docs_clustered"),
          count(lit(1)).as("n_clusters"),
          coalesce(max(col("graft_sz")), lit(0L)).as("max_cluster"))
        .select(lit(t).as("threshold_bp"), col("n_docs_clustered"),
          col("n_clusters"), col("max_cluster"),
          (col("n_docs_clustered") - col("n_clusters")).as("n_removable"))
    }.reduce(_.union(_))
  }

  /** [[thresholdSweep]]'s CC input — the round-12 skew shield, exposed
    * package-private so the mitigation is PINNABLE: one edge per
    * verified cross-text pair, endpoints the text classes' REP doc ids
    * (min id per class), with (n_inter, n_union) riding along for the
    * per-threshold exact re-filter. An n-copy text is ONE weighted CC
    * node here — previously the sweep fed doc-level pairs whose
    * same-text expansion put n²/2 edges through connected components,
    * so a mega-cluster corpus (one text in 30% of docs) paid a
    * quadratic CC for statistics that only need the text graph. Edge
    * count is now DUPLICATION-INVARIANT (pinned by PlanSpec), and the
    * sweep's output is row-identical: a component's doc count equals
    * the copy-weight sum of its texts, and same-text-only classes
    * surface as loner clusters.
    */
  private[graft] def sweepEdges(df: DataFrame, idCol: String, textCol: String,
                                minThresholdBp: Long)
      : (DataFrame, DataFrame) = {
    val (texts, membership) = canonicalTexts(df, idCol, textCol)
    val classes = CacheRegistry.persist(membership.groupBy(col("graft_tidl"))
      .agg(min(col("graft_did")).as("rep"), count(lit(1)).as("graft_copies")))
    val edges = jaccardJoinDistinct(texts, minThresholdBp)
      .join(classes.select(col("graft_tidl").as("tidl_a"),
        col("rep").as("rep_a")), Seq("tidl_a"))
      .join(classes.select(col("graft_tidl").as("tidl_b"),
        col("rep").as("rep_b")), Seq("tidl_b"))
      .select(col("rep_a"), col("rep_b"), col("n_inter"), col("n_union"))
    (edges, classes)
  }

  // ------------------------------------------------------------------
  // Persisted dedup index over BucketedWarehouse
  // ------------------------------------------------------------------

  override protected def manifestName: String = "_graft_dedup_index_manifest"
  override protected def indexVersion: Int = 2
  override protected def pendingName: String = "_graft_compact_pending"
  override protected def indexKind: String = "dedup index"
  override protected def buildHint: String = "run buildDedupIndex first"

  /** Persist the reference corpus' dedup keys ONCE — the incremental-
    * crawl shape: [[dedupAgainst]] recomputes the reference side's
    * content hashes AND shingle→minhash→band keys on EVERY batch, a
    * full reference-corpus pass per crawl increment. This is the third
    * leg of the persisted-index triangle (BM25 postings for text,
    * IVF-PQ lists for vectors, LSH keys for near-duplication):
    *
    *  - `exact` (h): distinct md5 content hashes, bucketed by `h`;
    *  - `bands` (bk): distinct `band:band_key` composites (single-
    *    column join key — the bucketed side never reshuffles), bucketed
    *    by `bk`;
    *  - `docs_exact` (id, h) / `docs_bands` (id, bk): the doc→key
    *    SIDECARS (version 2) — which document contributed which key,
    *    bucketed by the key so key-side probes prune. The key tables
    *    are content-addressed SETS shared across documents, so a
    *    doc-level takedown ([[deleteFromDedupIndex]]) cannot know which
    *    keys to drop without them: a key dies only when its LAST
    *    referencing doc is deleted, and the sidecars are what make that
    *    refcount answerable without a corpus rebuild. Doc ids are
    *    stored BIGINT (the BM25 manifest convention);
    *  - a manifest pinning (version, numBuckets, shingleN, numHashes,
    *    rowsPerBand) — probing with different shingle/hash geometry
    *    than the index was built with would silently miss everything.
    */
  /** The index stores BIGINT doc ids (the BM25 manifest convention). A
    * NULL-producing id cast would silently collapse every doc into ONE
    * minhash group (band keys over the union of all shingles — near-dup
    * recall destroyed) and write sidecar rows no takedown can ever
    * match, so the cast raises the contract error IN-PLAN instead —
    * the hardNegatives guard idiom, no driver-side sampling pass.
    */
  private def requiredLongId(idCol: String): org.apache.spark.sql.Column =
    when(col(idCol).cast("long").isNotNull, col(idCol).cast("long"))
      .otherwise(raise_error(lit(
        s"dedup index requires non-NULL '$idCol' values castable to BIGINT — " +
          "map string/UUID ids to numeric ids upstream")).cast("long"))
      .as("id")

  def buildDedupIndex(ref: DataFrame, idCol: String, textCol: String,
                      indexDir: String, numBuckets: Int, shingleN: Int,
                      numHashes: Int, rowsPerBand: Int): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    val (eName, bName, deName, dbName) = dedupTableNames(indexDir)
    val docs = ref.select(requiredLongId(idCol), col(textCol))
    graft.sources.BucketedWarehouse.writeBucketedPath(
      docs.select(md5(col(textCol)).as("h")).distinct(),
      eName, s"$indexDir/exact", Seq("h"), numBuckets)
    graft.sources.BucketedWarehouse.writeBucketedPath(
      docBandComposite(docs, "id", textCol, shingleN, numHashes, rowsPerBand)
        .select(col("bk")).distinct(),
      bName, s"$indexDir/bands", Seq("bk"), numBuckets)
    graft.sources.BucketedWarehouse.writeBucketedPath(
      docs.select(col("id"), md5(col(textCol)).as("h")),
      deName, s"$indexDir/docs_exact", Seq("h"), numBuckets)
    graft.sources.BucketedWarehouse.writeBucketedPath(
      docBandComposite(docs, "id", textCol, shingleN, numHashes, rowsPerBand),
      dbName, s"$indexDir/docs_bands", Seq("bk"), numBuckets)
    writeManifest(indexDir, Seq("numBuckets" -> numBuckets.toString,
      "shingleN" -> shingleN.toString, "numHashes" -> numHashes.toString,
      "rowsPerBand" -> rowsPerBand.toString))
  }

  /** True when `indexDir` holds a complete current-version dedup index
    * (a tripped mutation fence reads as absent → rebuild).
    */
  def dedupIndexExists(indexDir: String): Boolean = indexExists(indexDir)

  /** Compact an append-grown dedup index: rewrite every table to ONE
    * file per bucket (each [[appendToDedupIndex]] adds a file per
    * bucket). The sidecars are deduplicated (replayed uncommitted
    * batches can append the same (id, key) row twice) and the key
    * tables are RECOMPUTED from them — in the healthy case that is
    * row-identical to compact-in-place (the key sets equal the
    * sidecars' distinct keys by construction, pinned by OpsSpec), and
    * after a torn append (a crash between the bands and exact steps)
    * it converges the key tables back to the sidecar truth. With
    * pending tombstones ([[deleteFromDedupIndex]]) this is also the
    * merge that makes doc-level deletes physical: tombstoned docs'
    * sidecar rows drop, the key tables recompute from the surviving
    * rows (a key dies exactly when its last referencing doc died), and
    * the tombstone list clears — afterwards the index equals a rebuild
    * over the surviving corpus. The swap window is fenced — a crash
    * mid-compact makes [[dedupIndexExists]] false instead of leaving a
    * torn index that silently misses duplicates.
    */
  def compactDedupIndex(spark: org.apache.spark.sql.SparkSession,
                        indexDir: String): Unit = {
    val (nb, _, _, _) = readDedupManifest(indexDir)
    openDedupIndex(spark, indexDir)
    requireNoFence(indexDir, "append/compact")
    // tombstones covering EVERY doc would rewrite the sidecars empty
    // and the key-table recompute would then fail reading a fileless
    // parquet dir mid-compact (fence up, rebuild forced) — refuse
    // BEFORE the fence goes up instead, like the BM25 analog (nothing
    // is mutated, the index stays valid and serving)
    requireSurvivors(spark, indexDir,
      spark.read.parquet(s"$indexDir/docs_exact"),
      s"compactDedupIndex at $indexDir would leave zero surviving docs — " +
        "drop the index dir and rebuild when content exists")
    raiseFence(indexDir, "")
    val (eName, bName, deName, dbName) = dedupTableNames(indexDir)
    val survivorFilter: DataFrame => DataFrame =
      tombstoneIds(spark, indexDir) match {
        case Some(ts) => df => df.join(broadcast(ts), Seq("id"), "left_anti")
        case None => identity
      }
    graft.sources.BucketedWarehouse.rewriteBucketedPath(
      survivorFilter(spark.read.parquet(s"$indexDir/docs_exact")).distinct(),
      spark, deName, s"$indexDir/docs_exact", Seq("h"), nb)
    graft.sources.BucketedWarehouse.rewriteBucketedPath(
      survivorFilter(spark.read.parquet(s"$indexDir/docs_bands")).distinct(),
      spark, dbName, s"$indexDir/docs_bands", Seq("bk"), nb)
    // key tables from the compacted sidecars: bucketed by the same key,
    // so the distinct is bucket-local work
    graft.sources.BucketedWarehouse.rewriteBucketedPath(
      spark.read.parquet(s"$indexDir/docs_exact").select(col("h")).distinct(),
      spark, eName, s"$indexDir/exact", Seq("h"), nb)
    graft.sources.BucketedWarehouse.rewriteBucketedPath(
      spark.read.parquet(s"$indexDir/docs_bands").select(col("bk")).distinct(),
      spark, bName, s"$indexDir/bands", Seq("bk"), nb)
    clearTombstones(indexDir)
    clearFence(indexDir)
  }

  /** Delete documents from the dedup index WITHOUT rewriting it — the
    * takedown/compliance path, closing the loop the content-addressed
    * key tables used to force onto a full rebuild. Ids append to a
    * tombstone table; [[dedupAgainstIndex]] excludes DEAD keys — keys
    * whose every referencing doc is tombstoned, answered precisely from
    * the doc→key sidecars — so purged content stops matching
    * immediately (stronger than the BM25 path's stale-stats interim:
    * the dedup probe has no corpus statistics to go stale). A key some
    * SURVIVING doc also contributed keeps matching, which is correct —
    * the content is still in the corpus. [[compactDedupIndex]] makes
    * the deletes physical and clears the tombstones. Idempotent at
    * read time; bounded compliance lists by nature.
    */
  def deleteFromDedupIndex(spark: org.apache.spark.sql.SparkSession,
                           indexDir: String, ids: Seq[Long]): Unit = {
    readDedupManifest(indexDir) // fail fast on a non-index dir
    appendTombstoneIds(spark, indexDir, ids)
  }

  private val StagingDirName = "_graft_staging_append"
  // the four live table subdirs, in the (arbitrary but fixed) move order
  private val DedupTableDirs = Seq("docs_bands", "bands", "docs_exact", "exact")

  /** Fold a batch's keys into the persisted index: only keys NOT
    * already present append to the key tables (bucketed left-anti
    * probes — batch-sized work), so the distinct-keys invariant
    * survives any append order and re-sending a batch is idempotent;
    * the doc→key sidecar rows append unconditionally (a doc references
    * its keys whether or not another doc already contributed them —
    * that reference IS what [[deleteFromDedupIndex]] refcounts).
    */
  def appendToDedupIndex(docs: DataFrame, idCol: String, textCol: String,
                         indexDir: String): Unit =
    appendToDedupIndex(docs, idCol, textCol, indexDir, None)

  /** [[appendToDedupIndex]] as an ATOMIC STAGED COMMIT, optionally
    * ledgered (the streaming-ingest form; `commitLedger` follows
    * [[Retrieval.appendToIndex]]'s contract exactly). The four table
    * appends (two sidecars, two key tables) used to land directly in
    * the live directories as sequential steps, leaving a window where
    * a crash published a doc's band keys but not its exact hash —
    * conservative (replays withheld the doc) but lossy. Now every
    * append is STAGED first: all four frames write as bucketed tables
    * under `_graft_staging_append/` (the expensive, crash-harmless
    * part — the live index never changes), and only then does the
    * fenced commit run: fence up (carrying the batch id) → staged part
    * files MOVE into the live dirs (metadata renames; bucket ids ride
    * in the file names so the bucketed scans attribute them correctly)
    * → ledger line (fsync'd) → fence clear → staging removed. A replay
    * therefore finds exactly one of: no fence (staging crash — the
    * live index is untouched, redo from scratch), a fence carrying its
    * batch id with the ledger line absent (mid-move crash —
    * [[resumeStagedAppend]] finishes moving the REMAINING staged files
    * and commits; each file is either still staged or already live, so
    * the resume is exact), or the ledger line present (append complete
    * — skip, and [[clearCompletedAppendFence]] removes the stale
    * fence). No kill point drops or double-serves content.
    */
  def appendToDedupIndex(docs: DataFrame, idCol: String, textCol: String,
                         indexDir: String,
                         commitLedger: Option[(java.io.File, Long)]): Unit = {
    val spark = docs.sparkSession
    val (nb, shingleN, numHashes, rowsPerBand) = readDedupManifest(indexDir)
    val (exact, bands, _, _) = openDedupIndex(spark, indexDir)
    val typed = docs.select(requiredLongId(idCol), col(textCol))
    // re-using a tombstoned id would retro-tombstone the NEW content:
    // the fresh sidecar rows carry an id the probe's dead-key test
    // treats as deleted and the next compaction physically drops, so a
    // LIVE doc would silently lose its dedup keys forever. Reject
    // loudly — compaction clears the tombstones and frees the ids.
    tombstoneIds(spark, indexDir).foreach { ts =>
      val clash = typed.select(col("id"))
        .join(broadcast(ts), Seq("id"), "left_semi").limit(1).count()
      require(clash == 0L,
        s"appendToDedupIndex at $indexDir: the batch re-uses doc ids with " +
          "pending tombstones — run compactDedupIndex first (making the " +
          "deletes physical) or assign fresh ids")
    }
    requireNoFence(indexDir, "append/compact")
    // stage: the full batch-sized compute, written OUTSIDE the live
    // dirs — a crash anywhere in here leaves the index untouched.
    // Stale staging from such a crash is discarded (it may be partial)
    val staging = new java.io.File(indexDir, StagingDirName)
    deleteRecursively(staging)
    val batchBands = CacheRegistry.persist(
      docBandComposite(typed, "id", textCol, shingleN, numHashes, rowsPerBand))
    val frames = Map(
      "docs_bands" -> (batchBands, Seq("bk")),
      "bands" -> (batchBands.select(col("bk")).distinct()
        .join(bands, Seq("bk"), "left_anti"), Seq("bk")),
      "docs_exact" -> (typed.select(col("id"), md5(col(textCol)).as("h")),
        Seq("h")),
      "exact" -> (typed.select(md5(col(textCol)).as("h")).distinct()
        .join(exact, Seq("h"), "left_anti"), Seq("h")))
    DedupTableDirs.foreach { sub =>
      val (frame, keys) = frames(sub)
      graft.sources.BucketedWarehouse.writeBucketedPath(frame,
        stagingTableName(indexDir, sub), s"$staging/$sub", keys, nb)
    }
    crashPoint(spark, "dedup_append_before_fence")
    // commit: fence → moves → ledger → fence clear (the BM25 ordering)
    raiseFence(indexDir, commitLedger.map(_._2.toString).getOrElse(""))
    moveStagedFiles(spark, indexDir, staging)
    crashPoint(spark, "dedup_append_before_ledger")
    commitLedger.foreach { case (ledger, id) => appendLineSync(ledger, id) }
    crashPoint(spark, "dedup_append_after_ledger")
    clearFence(indexDir)
    dropStagingTables(spark, indexDir)
    deleteRecursively(staging)
  }

  /** Finish a staged append a crash interrupted MID-MOVE: when the
    * fence carries `batchId` and its staging directory is still
    * present, every staged part file is either already live or still
    * staged — moving the remainder completes the original append
    * exactly, after which the ledger line and fence clear commit it.
    * Returns true when a pending append was resumed. MUST run before
    * any probe of the index for the same batch (the half-moved state
    * is what the probe must never see). A fence carrying any other
    * content is left alone (genuinely torn index → the next mutation
    * fails loudly).
    */
  def resumeStagedAppend(spark: org.apache.spark.sql.SparkSession,
                         indexDir: String, batchId: Long,
                         ledger: java.io.File): Boolean = {
    val pending = pendingFile(indexDir)
    val staging = new java.io.File(indexDir, StagingDirName)
    pending.isFile && staging.isDirectory && {
      val content = new String(
        java.nio.file.Files.readAllBytes(pending.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim
      content == batchId.toString && {
        moveStagedFiles(spark, indexDir, staging)
        appendLineSync(ledger, batchId)
        clearFence(indexDir)
        dropStagingTables(spark, indexDir)
        deleteRecursively(staging)
        true
      }
    }
  }

  /** Move every staged data file into its live table dir. File names
    * carry the bucket id (`..._00003.c000...`), so the bucketed scans
    * attribute moved files to the right buckets; names are unique
    * (task UUIDs), so moves never collide with earlier appends.
    */
  private def moveStagedFiles(spark: org.apache.spark.sql.SparkSession,
                              indexDir: String,
                              staging: java.io.File): Unit = {
    DedupTableDirs.zipWithIndex.foreach { case (sub, i) =>
      val src = new java.io.File(staging, sub)
      Option(src.listFiles()).foreach(_.filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName).foreach { f =>
          java.nio.file.Files.move(f.toPath,
            new java.io.File(s"$indexDir/$sub", f.getName).toPath)
        })
      if (i == 0) crashPoint(spark, "dedup_append_mid_move")
    }
    // the moves happen behind the catalog's back (unlike a saveAsTable
    // append, which invalidates it) — drop the cached file listings or
    // this session's probes keep reading the pre-append table state
    val (eName, bName, deName, dbName) = dedupTableNames(indexDir)
    Seq(eName, bName, deName, dbName).foreach { n =>
      if (spark.catalog.tableExists(n)) spark.catalog.refreshTable(n)
    }
  }

  private def stagingTableName(indexDir: String, sub: String): String =
    s"graft_didx_${tableTag(indexDir)}_stage_$sub"

  private def dropStagingTables(spark: org.apache.spark.sql.SparkSession,
                                indexDir: String): Unit =
    DedupTableDirs.foreach { sub =>
      spark.sql(s"DROP TABLE IF EXISTS `${stagingTableName(indexDir, sub)}`")
    }

  /** [[dedupAgainst]] from the PERSISTED index — per new doc, the exact
    * content-hash hit and the LSH band-key hit, with ZERO reference-
    * corpus passes: the batch's keys shuffle to the index's bucketing;
    * the corpus-sized index tables never move. Row-identical to
    * [[dedupAgainst]] on the same reference corpus + geometry (pinned
    * by the oracle gate).
    *
    * With pending doc-level tombstones ([[deleteFromDedupIndex]]) the
    * probe excludes DEAD keys precisely: a key is dead when every doc
    * referencing it is tombstoned — answered from the sidecars with
    * work bounded by the takedown's own key set (the dead-candidate
    * keys are the deleted docs' keys; checking for a surviving
    * reference probes the key-bucketed sidecar with that bounded set
    * riding as a broadcast, so the corpus-sized sidecar never
    * shuffles). Equivalent to [[dedupAgainst]] over the surviving
    * corpus, before any compaction.
    */
  def dedupAgainstIndex(newDocs: DataFrame, idCol: String, textCol: String,
                        indexDir: String): DataFrame = {
    val spark = newDocs.sparkSession
    val (_, shingleN, numHashes, rowsPerBand) = readDedupManifest(indexDir)
    val (exact0, bands0, docsExact, docsBands) = openDedupIndex(spark, indexDir)
    val (exact, bands) = tombstoneIds(spark, indexDir) match {
      case Some(ts) =>
        def dead(sidecar: DataFrame, keyCol: String): DataFrame = {
          // keys the deleted docs referenced — bounded by the takedown
          val cand = sidecar.join(broadcast(ts), Seq("id"))
            .select(col(keyCol)).distinct()
          // of those, keys some SURVIVING doc also references
          val live = sidecar.join(broadcast(cand), Seq(keyCol), "left_semi")
            .join(broadcast(ts), Seq("id"), "left_anti")
            .select(col(keyCol)).distinct()
          cand.join(live, Seq(keyCol), "left_anti")
        }
        (exact0.join(broadcast(dead(docsExact, "h")), Seq("h"), "left_anti"),
          bands0.join(broadcast(dead(docsBands, "bk")), Seq("bk"), "left_anti"))
      case None => (exact0, bands0)
    }
    val newBands = bandKeys(
      minHashSignatures(shingles(newDocs, idCol, textCol, shingleN), numHashes),
      rowsPerBand)
      .select(col("id"), concat_ws(":", col("band"), col("band_key")).as("bk"))
    val nearIds = newBands.join(bands, Seq("bk"))
      .select(col("id")).distinct()
      .withColumn("graft_near", lit(1L))
    newDocs.select(col(idCol), md5(col(textCol)).as("h"))
      .join(exact.withColumn("graft_exact", lit(1L)), Seq("h"), "left")
      .join(nearIds.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("graft_exact"), lit(0L)).as("exact_dup"),
        coalesce(col("graft_near"), lit(0L)).as("near_dup"))
  }

  /** Per-doc distinct single-column band composites for a corpus slice
    * — the sidecar shape; `.select("bk").distinct()` recovers the key-
    * table shape.
    */
  private def docBandComposite(df: DataFrame, idCol: String, textCol: String,
                               shingleN: Int, numHashes: Int,
                               rowsPerBand: Int): DataFrame =
    bandKeys(minHashSignatures(shingles(df, idCol, textCol, shingleN), numHashes),
      rowsPerBand)
      .select(col("id"),
        concat_ws(":", col("band"), col("band_key")).as("bk"))
      .distinct()

  private def openDedupIndex(spark: org.apache.spark.sql.SparkSession,
                             indexDir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (nb, _, _, _) = readDedupManifest(indexDir)
    val (eName, bName, deName, dbName) = dedupTableNames(indexDir)
    graft.sources.BucketedWarehouse.registerExternal(spark, eName,
      s"$indexDir/exact", "h STRING", Seq("h"), nb)
    graft.sources.BucketedWarehouse.registerExternal(spark, bName,
      s"$indexDir/bands", "bk STRING", Seq("bk"), nb)
    graft.sources.BucketedWarehouse.registerExternal(spark, deName,
      s"$indexDir/docs_exact", "id BIGINT, h STRING", Seq("h"), nb)
    graft.sources.BucketedWarehouse.registerExternal(spark, dbName,
      s"$indexDir/docs_bands", "id BIGINT, bk STRING", Seq("bk"), nb)
    (spark.table(eName), spark.table(bName),
      spark.table(deName), spark.table(dbName))
  }

  private[graft] def readDedupManifest(indexDir: String): (Int, Int, Int, Int) = {
    val props = readManifestProps(indexDir)
    (props.getProperty("numBuckets").toInt, props.getProperty("shingleN").toInt,
      props.getProperty("numHashes").toInt, props.getProperty("rowsPerBand").toInt)
  }

  private def dedupTableNames(indexDir: String)
      : (String, String, String, String) = {
    val tag = tableTag(indexDir)
    (s"graft_didx_${tag}_exact", s"graft_didx_${tag}_bands",
      s"graft_didx_${tag}_dexact", s"graft_didx_${tag}_dbands")
  }

  /** Exact duplicated-SPAN profile (the Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better" ExactSubstr signal, in
    * its hash-join form): every k-token sliding window of every
    * document is hashed, and a span is DUPLICATED when its hash occurs
    * in ≥ 2 distinct documents — the signal that catches boilerplate
    * and quotation reuse exact-document and near-doc dedup both miss.
    * Emitted per document: total spans, duplicated spans, and the
    * duplicated fraction in HALF_UP bp (the removal-targeting number).
    *
    * Scale shape: the span table is O(total tokens) rows (in-row
    * window expansion, no pair join anywhere); distinct (hash, doc)
    * then the per-hash doc count are two map-side-combinable
    * aggregations keyed on the hash — a boilerplate span that appears
    * a billion times is ONE group, not a pair explosion; the flag
    * rides back to spans on the same hash key. Docs shorter than k
    * tokens report zero spans (NULL fraction).
    * Output: (id, n_spans, n_dup_spans, dup_bp).
    */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spans = CacheRegistry.persist(df
      .select(col(idCol).as("id"),
        filter(split(col(textCol), " "), t => t =!= lit("")).as("graft_ws"))
      .select(col("id"), explode(expr(
        s"""CASE WHEN size(graft_ws) >= $k THEN
           |  transform(sequence(0, size(graft_ws) - $k),
           |    i -> md5(concat_ws(' ', slice(graft_ws, i + 1, $k))))
           |ELSE array() END""".stripMargin)).as("graft_h")))
    val dupGrams = spans.select(col("graft_h"), col("id")).distinct()
      .groupBy(col("graft_h")).agg(count(lit(1)).as("graft_nd"))
      .filter(col("graft_nd") >= 2)
      .select(col("graft_h"), lit(1L).as("graft_dup"))
    val per = spans.join(dupGrams, Seq("graft_h"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_spans"),
        coalesce(sum(col("graft_dup")), lit(0L)).as("n_dup_spans"))
    df.select(col(idCol).as("id")).join(per, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"))
      .withColumn("dup_bp", expr(
        "CASE WHEN n_spans > 0 THEN (20000 * n_dup_spans + n_spans) DIV (2 * n_spans) END"))
  }

  /** Blocked fuzzy record linkage: near-identical short strings (names,
    * titles, product labels) matched by edit distance WITHOUT the
    * all-pairs cross join. Two scale levers, both standard linkage
    * practice:
    *
    *  1. collapse exact duplicates first — pairwise work runs on
    *     DISTINCT values, each carrying its record count (the q31/q33
    *     canonical-text convention; a duplicate-heavy column never
    *     inflates the pair set);
    *  2. block on (first token, length band): true matches within
    *     `maxDist` edits can't differ in length by more than maxDist,
    *     so banding lengths by `2·maxDist+1` and probing the value's
    *     own band plus both neighbors keeps every true pair reachable
    *     while the join stays equi-key (a shuffle join on the block
    *     key, skew-safe via AQE — never a cartesian). First-token
    *     blocking is the lossy-by-declaration half (standard: a typo
    *     in token 1 escapes the block) — it bounds block sizes on
    *     natural name data.
    *
    * Output one row per matched distinct-value pair (val_a < val_b,
    * levenshtein ≤ maxDist, including 0 for case-folded collisions):
    * (block_tok, val_a, val_b, dist, n_a, n_b) — n_* = record counts
    * behind each value.
    */
  def fuzzyBlockedPairs(df: DataFrame, valCol: String,
                        maxDist: Int = 2): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val band = 2 * maxDist + 1
    val vals = df
      .select(col(valCol).as("v"))
      .filter(col("v").isNotNull && col("v") =!= "")
      .groupBy(col("v")).agg(count(lit(1)).as("n"))
      .withColumn("tok", split(col("v"), " ").getItem(0))
      .withColumn("band", (length(col("v")) / band).cast("long"))
    // probe own band + both neighbors: |len_a − len_b| ≤ maxDist pairs
    // always share at least one probed band
    val probes = vals.withColumn("pband",
      explode(array(col("band") - 1, col("band"), col("band") + 1)))
    val a = probes.select(col("tok"), col("pband"),
      col("v").as("val_a"), col("n").as("n_a"), col("band").as("band_a"))
    val b = vals.select(col("tok"), col("band").as("pband"),
      col("v").as("val_b"), col("n").as("n_b"))
    a.join(b, Seq("tok", "pband"))
      .filter(col("val_a") < col("val_b"))
      // each pair meets in exactly one probed band (b's OWN band), so
      // no dedup needed; drop the helper columns
      .withColumn("dist", levenshtein(col("val_a"), col("val_b")))
      .filter(col("dist") <= maxDist)
      .select(col("tok").as("block_tok"), col("val_a"), col("val_b"),
        col("dist").cast("long").as("dist"), col("n_a"), col("n_b"))
  }
}
