package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic approximate-query sketches for 100 TB-scale profiling:
  * HyperLogLog distinct counts, count-min frequency estimates, and
  * hash-weighted sampling.
  *
  * All three are built from an md5 hash family and integer sketch state,
  * so the same estimate is reproducible on any engine (the DuckDB
  * oracles compute the identical value): floating point only enters
  * through +,-,*,/ on exactly-representable integers — operations IEEE
  * 754 requires to be exactly rounded — never through libm (ln/exp/pow),
  * whose last-ulp behavior is implementation-defined.
  *
  * Scale shape: every sketch is an algebraic aggregate (map-side
  * combinable groupBy), so a 1000-executor run shuffles only
  * (group × sketch-width) rows, never the data.
  */
object Sketches {

  /** HyperLogLog distinct-count estimate per group. Default precision
    * p=6 (m=64 buckets, standard error ≈ 1.04/√64 ≈ 13%); raising `p`
    * tightens the error at 2^p·8 bytes of sketch state per group.
    *
    * Per value: a 60-bit md5 hash splits into bucket (low p bits) and a
    * (60−p)-bit tail w; rank ρ = leading zeros of w + 1 (ρ = 61−p for
    * w = 0). The harmonic sum Σ 2^−M[j] is accumulated EXACTLY as the
    * integer Σ 2^(61−p−M[j]) (≤ m·2^(61−p) = 2^61), including a full
    * term per empty bucket; the raw estimate α·m²·2^(61−p)/S then
    * involves only exactly-rounded double ops.
    *
    * `smallRangeCorrection = true` applies the standard linear-counting
    * correction (Flajolet et al. §4: when the raw estimate ≤ 2.5·m and
    * empty buckets remain, estimate = m·ln(m/V)). It needs libm's `ln`,
    * whose last-ulp rounding is implementation-defined — so the corrected
    * estimate is accurate (≈1/√(2m) relative error at low load) but NOT
    * guaranteed bit-reproducible across engines; leave the flag off when
    * comparing hashes against another engine. `empty_buckets` is always
    * emitted so callers can apply their own correction.
    *
    * Returns (groupCol, hll_estimate DOUBLE round-4, empty_buckets LONG).
    */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  smallRangeCorrection: Boolean = false, p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16, s"precision $p outside [4, 16]")
    val m = 1L << p
    val maxRho = 61 - p // tail bits (60-p) + 1
    val alphaM2 = (p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m.toDouble)
    }) * m.toDouble * m.toDouble
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10).cast("long")
    // h div m, NOT h/m: `/` is double division, which would round away
    // the low bits of a 60-bit hash (doubles carry 53)
    // null values hash to a null bucket, which would count as a phantom
    // occupied register (sum skips it but count(lit(1)) does not) —
    // drop them: NULL contributes no distinct value
    val hv = df.select(col(groupCol), h.as("hv"))
      .filter(col("hv").isNotNull)
      .select(col(groupCol), (col("hv") % m).as("bucket"), expr(s"hv div $m").as("w"))
    val rho = when(col("w") === 0L, lit(maxRho)).otherwise(lit(maxRho) - length(bin(col("w"))))
    val raw = lit(alphaM2) * lit(math.pow(2.0, maxRho)) /
      (col("s_present") + (lit(m) - col("n_buckets")) * lit(1L << maxRho)).cast("double")
    val empty = (lit(m) - col("n_buckets")).cast("double")
    val est =
      if (!smallRangeCorrection) raw
      else when(raw <= lit(2.5 * m) && empty > 0,
        lit(m.toDouble) * log(lit(m.toDouble) / empty)).otherwise(raw)
    hv.select(col(groupCol), col("bucket"), rho.as("rho"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).as("mx"))
      .groupBy(col(groupCol))
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRho - mx)")).as("s_present"),
        count(lit(1)).as("n_buckets"))
      .select(
        col(groupCol),
        round(est, 4).as("hll_estimate"),
        (lit(m) - col("n_buckets")).as("empty_buckets"))
  }

  /** HLL set operations across groups: for every group pair, the
    * union estimate from MERGED registers (per-bucket max — the HLL
    * union is lossless, exactly the sketch of the concatenated data)
    * and the inclusion-exclusion intersection estimate
    * |A∩B| ≈ |A|+|B|−|A∪B| (clamped at 0). The cross-source user /
    * vocabulary overlap matrix at 100 TB for the cost of |groups|·2^p
    * sketch rows — the data is read once, by the register aggregation.
    *
    * Same determinism contract as [[hllDistinct]] (md5 hashes, exact
    * integer harmonic sums, only exactly-rounded double ops, no
    * small-range correction). Pair expansion happens on the BOUNDED
    * register table: |groups|² pairs × 2^p buckets, corpus-independent.
    *
    * Returns (ga, gb, est_a, est_b, est_union, est_inter), ga < gb.
    */
  def hllOverlap(df: DataFrame, groupCol: String, valueCol: String,
                 p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16, s"precision $p outside [4, 16]")
    val m = 1L << p
    val maxRho = 61 - p
    val alphaM2 = (p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m.toDouble)
    }) * m.toDouble * m.toDouble
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10).cast("long")
    val rho = when(col("w") === 0L, lit(maxRho)).otherwise(lit(maxRho) - length(bin(col("w"))))
    // registers feed the per-group estimates AND every pair merge
    val regs = CacheRegistry.persist(df
      .select(col(groupCol).as("grp"), h.as("hv"))
      .filter(col("hv").isNotNull)
      .select(col("grp"), (col("hv") % m).as("bucket"), expr(s"hv div $m").as("w"))
      .select(col("grp"), col("bucket"), rho.as("rho"))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("mx")))
    def estimate(keys: Seq[String], out: String)(r: DataFrame): DataFrame = {
      val raw = lit(alphaM2) * lit(math.pow(2.0, maxRho)) /
        (col("s_present") + (lit(m) - col("n_buckets")) * lit(1L << maxRho)).cast("double")
      r.groupBy(keys.map(col): _*)
        .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRho - mx)")).as("s_present"),
          count(lit(1)).as("n_buckets"))
        .select(keys.map(col) :+ round(raw, 4).as(out): _*)
    }
    val ests = estimate(Seq("grp"), "est")(regs)
    val pairs = ests.select(col("grp").as("ga"), col("est").as("est_a"))
      .join(ests.select(col("grp").as("gb"), col("est").as("est_b")),
        col("ga") < col("gb"))
    val merged = pairs.select(col("ga"), col("gb"))
      .join(regs, col("grp") === col("ga")).select(col("ga"), col("gb"), col("bucket"), col("mx"))
      .union(pairs.select(col("ga"), col("gb"))
        .join(regs, col("grp") === col("gb")).select(col("ga"), col("gb"), col("bucket"), col("mx")))
      .groupBy(col("ga"), col("gb"), col("bucket"))
      .agg(max(col("mx")).as("mx"))
    pairs.join(estimate(Seq("ga", "gb"), "est_union")(merged), Seq("ga", "gb"))
      .select(col("ga"), col("gb"), col("est_a"), col("est_b"), col("est_union"),
        round(greatest(lit(0.0), col("est_a") + col("est_b") - col("est_union")), 4)
          .as("est_inter"))
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Count-min sketch (d rows × w columns) over a token column, queried
    * for the exact top-k tokens: emits each candidate's true count next
    * to its sketch estimate (always an over-count). Hash_i(t) = 48-bit
    * md5("i:t") mod w.
    *
    * Plan shape: ONE corpus pass — a map-side-combinable groupBy to
    * per-token exact counts. Every sketch cell is the sum of the exact
    * counts of the tokens hashing into it (identical to counting raw
    * tokens), so the sketch derives from the vocabulary table, never a
    * second corpus scan. The sketch (d·w cells) and the top-k are bounded
    * regardless of corpus size, so — like the adaptive small-graph path
    * in [[Dedup.connectedComponents]] — they finish on the driver, the
    * vocabulary cache is dropped before returning, and the result is a
    * local relation. No persisted RDDs outlive the call.
    *
    * Returns (token, n_exact, cm_estimate); callers order as needed.
    */
  def cmsHeavyHitters(tokens: DataFrame, tokenCol: String,
                      d: Int = 4, w: Int = 256, k: Int = 20): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    def colHash(row: Int, t: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(lit(row.toString), lit(":"), t)), 1, 12), 16, 10)
        .cast("long") % w
    // same 48-bit hash, driver side (md5 of the UTF-8 bytes, first 12 hex
    // chars as base-16) — must stay in lockstep with colHash above
    def driverHash(row: Int, t: String): Long =
      java.lang.Long.parseLong(md5Hex(s"$row:$t").substring(0, 12), 16) % w
    val vocab = tokens.select(col(tokenCol).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n_exact"))
      .persist()
    val cells = vocab
      .select(col("n_exact"), explode(array((0 until d).map { i =>
        struct(lit(i).as("r"), colHash(i, col("token")).as("c"))
      }: _*)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(sum(col("n_exact")).as("cnt"))
      .as[(Int, Long, Long)].collect()
      .map { case (r, c, cnt) => (r, c) -> cnt }.toMap
    val topk = vocab.orderBy(col("n_exact").desc, col("token")).limit(k)
      .as[(String, Long)].collect()
    vocab.unpersist()
    val out = topk.toSeq.map { case (t, nExact) =>
      val est = (0 until d).map(i => cells((i, driverHash(i, t)))).min
      (t, nExact, est)
    }
    spark.createDataFrame(out).toDF("token", "n_exact", "cm_estimate")
  }

  /** Build an m-bit Bloom filter over a key column, packed into m/32
    * words of 32 bits (32, not 64, so the oracle's `1 << bit` never
    * shifts into the sign bit on any engine). Bit positions are
    * kHashes 48-bit md5("i:key") values mod m. The build is one
    * map-side-combinable distinct + a bounded collect (m/32 words — for
    * the default m=2048 that is 64 longs), the same documented
    * driver-finish pattern as [[cmsHeavyHitters]]: the filter size is a
    * constant, independent of corpus size.
    */
  def bloomBits(keys: DataFrame, keyCol: String, m: Int = 2048, kHashes: Int = 3): Array[Long] = {
    require(m % 32 == 0 && m > 0, s"m must be a positive multiple of 32, got $m")
    require(kHashes > 0, s"kHashes must be positive, got $kHashes")
    val spark = keys.sparkSession
    import spark.implicits._
    val pos = keys.select(explode(array((0 until kHashes).map { i =>
        conv(substring(md5(concat(lit(s"$i:"), col(keyCol))), 1, 12), 16, 10)
          .cast("long") % m
      }: _*)).as("p"))
      .distinct()
    val words = new Array[Long](m / 32)
    pos.as[Long].collect().foreach { p =>
      words((p / 32).toInt) |= (1L << (p % 32).toInt)
    }
    words
  }

  /** Probe a Bloom filter built by [[bloomBits]]: appends `bloom_hit`
    * (1 iff all kHashes bit positions of the row's key are set — no
    * false negatives, deterministic false positives). The filter rides
    * into the plan as an array literal, so the probe is a narrow
    * codegen'd scan with ZERO shuffle — the shape that makes Bloom
    * pre-filters worth it in front of an expensive contamination join
    * at 100 TB.
    */
  def bloomProbe(df: DataFrame, keyCol: String, words: Array[Long], kHashes: Int = 3): DataFrame = {
    val m = words.length * 32
    val hit = (0 until kHashes).map { i =>
      val p = s"(CAST(conv(substring(md5(concat('$i:', $keyCol)), 1, 12), 16, 10) AS BIGINT) % $m)"
      s"(shiftright(element_at(graft_bloom_words, CAST($p div 32 AS INT) + 1), CAST($p % 32 AS INT)) & 1) = 1"
    }.mkString(" AND ")
    df.withColumn("graft_bloom_words", typedLit(words.toSeq))
      .withColumn("bloom_hit", expr(hit).cast("long"))
      .drop("graft_bloom_words")
  }

  /** Deterministic weighted sample of k rows without replacement:
    * priority = hash(id)/weight (48-bit md5 uniform over an exact double
    * division — heavier rows draw proportionally smaller priorities, a
    * weight-BIASED selection; exact ∝-weight sampling à la
    * Efraimidis–Spirakis needs u^(1/w), i.e. libm, which would break the
    * no-libm determinism contract). The selection is a TakeOrdered
    * (per-partition top-k then driver merge), not a global sort — the
    * scale-safe shape. Ties (hash collisions) break on id. Returns
    * (idCol, weightCol, sample_hash) for the selected rows.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10).cast("long")
    df.select(col(idCol), col(weightCol), u.as("sample_hash"))
      .filter(col(weightCol) > 0)
      .withColumn("priority", col("sample_hash").cast("double") / col(weightCol).cast("double"))
      .orderBy(col("priority"), col(idCol))
      .limit(k)
      .drop("priority")
  }

  // ------------------------------------------------------------------
  // Deterministic quantile sketch (KLL/MRL-style, fixed schedule)
  // ------------------------------------------------------------------

  /** THE deterministic MRL compaction schedule, shared verbatim by the
    * batch sketch below and the streaming
    * [[graft.streaming.QuantileMonitor]] — one implementation so a
    * schedule change can never silently break their equivalence:
    * when a level reaches k items, its sorted EVEN-indexed half
    * promotes with doubled weight and an odd leftover (the max) stays,
    * conserving total weight exactly.
    */
  private[graft] object KllLadder {
    type Ladder =
      scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Long]]

    def empty(): Ladder = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Long])

    def insert(ladder: Ladder, v: Long, k: Int): Unit = {
      ladder(0) += v
      var lvl = 0
      while (ladder(lvl).length >= k) {
        // input arrives value-sorted in both users, and promotions
        // append ascending, so buffers are near-sorted; the defensive
        // sort is O(k log k) on a tiny buffer
        val sorted = ladder(lvl).sorted
        val pairs = sorted.length / 2
        if (lvl + 1 >= ladder.length)
          ladder += scala.collection.mutable.ArrayBuffer.empty[Long]
        var i = 0
        while (i < 2 * pairs) { ladder(lvl + 1) += sorted(i); i += 2 }
        ladder(lvl).clear()
        if (sorted.length > 2 * pairs) ladder(lvl) += sorted.last
        lvl += 1
      }
    }

    /** HALF_UP-rank probe over weighted (value, weight) state. */
    def probe(items: Array[(Long, Long)], n: Long, bp: Long): Long = {
      val target = math.max(1L, (2L * bp * n + 10000L) / 20000L)
      var cum = 0L
      var est = items.last._1
      var i = 0
      var found = false
      while (i < items.length && !found) {
        cum += items(i)._2
        if (cum >= target) { est = items(i)._1; found = true }
        i += 1
      }
      est
    }
  }

  /** Deterministic mergeable quantile sketch over a BIGINT column —
    * the distributed-percentile answer that does NOT need a full sort
    * per cut (unlike the exact `groupQuantiles`, whose global
    * percentile_cont is a corpus sort at 100 TB).
    *
    * Classic KLL randomizes which half of a full compactor survives;
    * this variant pins every choice so the sketch is a pure FUNCTION
    * of (dataset, k, parts) — reproducible on any engine and across
    * any executor schedule:
    *  - rows are assigned to `parts` fixed streams by a 48-bit md5 of
    *    `idCol` (content-addressed, never partition-index-addressed);
    *  - each stream is SORTED by value (one repartition + external
    *    sort — Spark's spillable machinery, no in-memory group
    *    collect) and fed through an MRL ladder: when a level's buffer
    *    reaches `k`, its sorted EVEN-indexed half promotes with
    *    doubled weight; an odd leftover stays put, so total weight
    *    stays exactly n;
    *  - the ≤ parts·levels·k surviving items (a bounded,
    *    codebook-sized state) merge on the driver as a pure
    *    weight-preserving union — no further compaction, so the merge
    *    adds zero error and depends only on the state multiset.
    *
    * Deterministic compaction costs the usual randomized-KLL
    * unbiasedness: the even-index choice biases each compaction's
    * rank estimate low by up to its weight, giving the MRL-style
    * additive rank-error bound ~ levels·n/k (PropertySpec pins an
    * empirical ε·n envelope against exact quantiles). Use k ≈ 256 for
    * ≲1% rank error on 10^8-row groups.
    *
    * `probesBp` are quantile probes in basis points (5000 = median).
    * Each probe returns the smallest sketch value whose cumulative
    * weight reaches HALF_UP(φ·n). Output: (q_bp, est_value, n_rows),
    * computed eagerly (the state collect is the materialization).
    */
  def kllQuantiles(df: DataFrame, idCol: String, valueCol: String,
                   probesBp: Seq[Long], k: Int = 128,
                   parts: Int = 16): DataFrame = {
    require(k >= 8 && k % 2 == 0, s"k must be even and >= 8, got $k")
    require(parts >= 1 && parts <= 4096, s"parts must be in [1, 4096], got $parts")
    require(probesBp.nonEmpty && probesBp.forall(p => p >= 0 && p <= 10000),
      s"probes must be bp in [0, 10000], got $probesBp")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(
        (conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
          .cast("long") % parts).cast("int").as("pid"),
        col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
    // one stream sketch per pid; emission is (pid, level, value), with
    // level -1 carrying the stream's exact row count
    val partials = keyed
      .repartition(parts, col("pid"))
      .sortWithinPartitions(col("pid"), col("v"))
      .as[(Int, Long)]
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
        var pid = -1
        var n = 0L
        var ladder: scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Long]] = null
        def flush(): Unit = if (pid >= 0) {
          out += ((pid, -1, n))
          ladder.zipWithIndex.foreach { case (buf, lvl) =>
            buf.foreach(v => out += ((pid, lvl, v)))
          }
        }
        def open(p: Int): Unit = {
          pid = p; n = 0L
          ladder = KllLadder.empty()
        }
        def insert(v: Long): Unit = {
          n += 1
          KllLadder.insert(ladder, v, k)
        }
        it.foreach { case (p, v) =>
          if (p != pid) { flush(); open(p) }
          insert(v)
        }
        flush()
        out.iterator
      }
      .collect()
    // driver merge: a pure weight-preserving concat — the state is
    // already bounded (≤ parts·levels·k items), so no further
    // compaction is needed and none is done (each compaction costs
    // accuracy; the query below handles mixed weights directly). The
    // result is a function of the state MULTISET, so it is independent
    // of collect order by construction.
    val n = partials.iterator.filter(_._2 == -1).map(_._3).sum
    val items = partials.iterator.filter(_._2 >= 0)
      .map { case (_, lvl, v) => (v, 1L << lvl) }
      .toArray
      .sortBy(_._1)
    val rows = probesBp.map { bp =>
      if (n == 0L) (bp, 0L, 0L)
      else (bp, KllLadder.probe(items, n, bp), n)
    }
    rows.toDF("q_bp", "est_value", "n_rows")
  }
}
