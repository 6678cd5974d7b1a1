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

  /** HyperLogLog distinct-count estimate per group, p=6 (m=64 buckets,
    * standard error ≈ 1.04/√64 ≈ 13%).
    *
    * Per value: a 60-bit md5 hash splits into bucket (low 6 bits) and a
    * 54-bit tail w; rank ρ = leading zeros of w + 1 (ρ = 55 for w = 0).
    * The harmonic sum Σ 2^−M[j] is accumulated EXACTLY as the integer
    * Σ 2^(55−M[j]) (≤ 64·2^55 < 2^62), including 2^55 per empty bucket;
    * the raw estimate α·m²·2^55/S then involves only exactly-rounded
    * double ops. The small-range linear-counting correction is omitted
    * (it needs ln); `empty_buckets` is emitted so callers can apply it.
    *
    * Returns (groupCol, hll_estimate DOUBLE round-4, empty_buckets LONG).
    */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10).cast("long")
    // h div 64, NOT h/64: `/` is double division, which would round away
    // the low bits of a 60-bit hash (doubles carry 53)
    val hv = df.select(col(groupCol), h.as("hv"))
      .select(col(groupCol), (col("hv") % 64).as("bucket"), expr("hv div 64").as("w"))
    val rho = when(col("w") === 0L, lit(55)).otherwise(lit(55) - length(bin(col("w"))))
    hv.select(col(groupCol), col("bucket"), rho.as("rho"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).as("mx"))
      .groupBy(col(groupCol))
      .agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), 55 - mx)")).as("s_present"),
        count(lit(1)).as("n_buckets"))
      .select(
        col(groupCol),
        round(
          lit(0.709 * 4096.0) * lit(math.pow(2.0, 55)) /
            (col("s_present") + (lit(64L) - col("n_buckets")) * lit(1L << 55)).cast("double"),
          4).as("hll_estimate"),
        (lit(64L) - col("n_buckets")).as("empty_buckets"))
  }

  /** Count-min sketch (d rows × w columns) over a token column, queried
    * for the exact top-k tokens: emits each candidate's true count next
    * to its sketch estimate (always an over-count). Token stream →
    * d-row replication → (row, col) counts is one map-side-combinable
    * aggregation; the sketch itself (d·w rows) broadcasts back to the
    * candidates. Hash_i(t) = 48-bit md5("i:t") mod w.
    *
    * Returns (token, n_exact, cm_estimate), top-k by (n_exact desc,
    * token asc).
    */
  def cmsHeavyHitters(tokens: DataFrame, tokenCol: String,
                      d: Int = 4, w: Int = 256, k: Int = 20): DataFrame = {
    val toks = tokens.select(col(tokenCol).as("token")).persist()
    def colHash(row: Int, t: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(lit(row.toString), lit(":"), t)), 1, 12), 16, 10)
        .cast("long") % w
    val sketch = toks
      .select(explode(array((0 until d).map { i =>
        struct(lit(i).as("r"), colHash(i, col("token")).as("c"))
      }: _*)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("token")).limit(k)
    val cand = exact.select(col("token"), col("n_exact"),
      explode(array((0 until d).map { i =>
        struct(lit(i).as("r"), colHash(i, col("token")).as("c"))
      }: _*)).as("rc"))
    val out = cand
      .join(broadcast(sketch), cand("rc.r") === sketch("r") && cand("rc.c") === sketch("c"))
      .groupBy(col("token"), col("n_exact"))
      .agg(min(col("cnt")).as("cm_estimate"))
    toks.unpersist()
    out
  }

  /** Deterministic weighted sample of k rows without replacement:
    * priority = hash(id)/weight (48-bit md5 uniform over an exact double
    * division — heavier rows draw proportionally smaller priorities),
    * take the k smallest. The selection is a TakeOrdered (per-partition
    * top-k then driver merge), not a global sort — the scale-safe shape.
    * Ties (hash collisions) break on id. Returns (idCol, weightCol,
    * sample_hash) for the selected rows.
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
}
