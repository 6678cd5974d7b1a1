package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: the Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle over the
  * same parquet tables. Column names/types must match exactly — the
  * driver sorts columns by name and hash-compares values.
  */
final case class QueryDef(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

object Registry {
  /** Read one driver-provided table from the given sf directory.
    *
    * `events.parquet`'s `ts` column has shipped as both TIMESTAMP(NANOS)
    * (which Spark 4 refuses to read natively — we read nanos as Long via
    * the legacy conf and convert) and, in newer driver drops, plain µs
    * TIMESTAMP / TIMESTAMP_NTZ. Dispatch on the type Spark actually read
    * so every vintage normalizes to a µs TimestampType column; all graft
    * sessions run with session.timeZone=UTC, so the NTZ cast is
    * value-preserving and matches what DuckDB sees.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // the pure-Column Html chains carry graft_decode_* calls that must
    // resolve in whatever session analyzes them; every query path
    // starts here, so this is the natural registration point
    graft.functions.TextFunctions.register(spark)
    val df =
      if (name == "events") {
        import org.apache.spark.sql.functions.{col, expr}
        import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = spark.read.parquet(s"$dir/$name.parquet")
        raw.schema("ts").dataType match {
          case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
          case TimestampType    => raw
          case other => sys.error(s"events.ts: unsupported parquet type $other")
        }
      } else spark.read.parquet(s"$dir/$name.parquet")
    depthSample(df, name)
  }

  /** Short content fingerprint for /tmp fixture-cache keys. Cache dirs
    * for CONTENT-DERIVED fixtures (a BM25/ANN index, a JSONL dump of
    * the docs) must be keyed by what the corpus HOLDS, not how many
    * rows it has: the driver testdata ships different 500-row
    * documents/embeddings tables at sf0.001 and sf0.01, so a
    * count-keyed cache built at one scale factor silently serves the
    * other one wrong bytes. md5 over (total count + the first 10 rows
    * by key, JSON-encoded + an order-independent whole-table xxhash64
    * xor) — two cheap scans, and ANY content change rolls the key: the
    * head rows catch it cheaply for human diffing, the bit_xor digest
    * catches tail-only edits the head would miss (without it two
    * corpora sharing count and head silently reused each other's /tmp
    * fixtures). (Fixtures synthesized purely from ids — the carve slot
    * images — stay count-keyed: their bytes don't depend on corpus
    * content.)
    */
  def contentTag(df: DataFrame, keyCol: String, cols: String*): String = {
    import org.apache.spark.sql.functions.{col, expr, struct, to_json, xxhash64}
    val head = df.orderBy(col(keyCol)).limit(10)
      .select(to_json(struct((keyCol +: cols).map(col): _*)).as("j"))
      .collect().map(_.getString(0)).mkString("\n")
    val sums = df
      .select(xxhash64((keyCol +: cols).map(col): _*).as("graft_h"))
      .agg(expr("count(1)").as("n"),
        expr("coalesce(bit_xor(graft_h), 0L)").as("x"))
      .head()
    val (n, x) = (sums.getLong(0), sums.getLong(1))
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$n\n$x\n$head".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map(b => f"$b%02x").mkString
  }

  private val sampleKeys = Map("documents" -> "doc_id", "embeddings" -> "vec_id")

  /** Depth-compare subsampling (dev/CI knob, unset in the driver's gate).
    *
    * `GRAFT_DEPTH_SAMPLE=<hex digit>` keeps only the rows of the two
    * pair-feeding tables whose key's md5 starts with a hex digit <= the
    * given one — e.g. `0` keeps ~1/16 of docs and so ~1/256 (≈0.4%) of
    * doc pairs. The predicate is expressible verbatim in DuckDB
    * (`substr(md5(CAST(doc_id AS VARCHAR)),1,1) <= '0'`), so the
    * quadratic pair-generating oracles — infeasible for DuckDB at sf0.1
    * in full — can be cross-checked at that scale on a deterministic
    * subsample with BOTH engines seeing exactly the same input rows
    * (which also keeps holistic operators like connected-components
    * comparable, where filtering output pairs would not).
    */
  private def depthSample(df: DataFrame, name: String): DataFrame =
    depthSample(df, name, sys.env.get("GRAFT_DEPTH_SAMPLE"))

  private[graft] def depthSample(df: DataFrame, name: String,
                                   sample: Option[String]): DataFrame =
    (sample, sampleKeys.get(name)) match {
      case (Some(digit), Some(key)) =>
        require(digit.length == 1 && "0123456789abcdef".contains(digit(0)),
          s"GRAFT_DEPTH_SAMPLE must be one lowercase hex digit, got '$digit'")
        df.filter(org.apache.spark.sql.functions.expr(
          s"substr(md5(CAST($key AS STRING)), 1, 1) <= '$digit'"))
      case _ => df
    }
}
