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
object Dedup {

  /** Exact duplicate groups by content hash: (content_hash, n_docs,
    * keep_id) — keep_id = min id, the canonical survivor.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** Word n-gram shingles: (id, shingle), duplicates preserved. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val words = split(col(textCol), " ")
    // sliding window over the word array via sequence + transform —
    // stays in whole-stage codegen (no UDF)
    val grams = when(size(words) >= n,
      transform(sequence(lit(0), size(words) - lit(n)), i => concat_ws(" ", slice(words, i + 1, lit(n)))))
      .otherwise(array())
    df.select(col(idCol).as("id"), explode(grams).as("shingle"))
  }

  /** K md5-seeded minhashes per id: (id, k, minhash). */
  def minHashSignatures(shingleDf: DataFrame, k: Int): DataFrame =
    shingleDf
      .crossJoin(spark_range_df(shingleDf, k))
      .groupBy(col("id"), col("k"))
      .agg(min(md5(concat(col("k").cast("string"), lit(":"), col("shingle")))).as("minhash"))

  private def spark_range_df(df: DataFrame, k: Int): DataFrame =
    df.sparkSession.range(k).toDF("k")

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

  /** Candidate near-duplicate pairs: ids sharing any band bucket. */
  def lshCandidatePairs(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band"), col("band_key"), col("id").as("id_a"))
    val b = bands.select(col("band"), col("band_key"), col("id").as("id_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
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
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("tok"))
    val hv = conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")
    val bits = toks.select(col("id"), hv.as("hv"))
      .crossJoin(df.sparkSession.range(60).toDF("j"))
      .groupBy(col("id"), col("j"))
      .agg(sum(when(expr("shiftright(hv, CAST(j AS INT)) & 1") === 1, 1)
        .otherwise(-1)).as("vote"))
    bits.groupBy(col("id"))
      .agg(sum(when(col("vote") > 0, expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))")).otherwise(0L))
        .as("simhash"))
  }

  /** Exact pairwise n-gram Jaccard via distinct-shingle join. Returns
    * integer (intersection, union) so comparisons stay exact; callers
    * filter e.g. `inter*2 >= union` for J >= 0.5. `blockCol` (optional)
    * restricts pairs to a blocking key (language, LSH bucket, ...).
    */
  def ngramJaccardPairs(shingleDf: DataFrame): DataFrame = {
    val distinctSh = shingleDf.select(col("id"), col("shingle")).distinct()
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
}
