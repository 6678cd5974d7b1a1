package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Z-order (Morton-curve) data layout — the lakehouse technique for
  * making ONE physical sort order serve range predicates on TWO
  * columns at once. Sorting files by `x` alone gives perfect file-level
  * min/max pruning on `x` and none on `y`; sorting by the interleaved
  * z-value gives each file a bounded rectangle in (x, y) space, so a
  * scan with a predicate on EITHER column (or both) skips most files
  * on parquet footer stats alone. Standard in Delta/Iceberg compaction;
  * here as a plain column expression + range-partitioned writer, so it
  * composes with any sink.
  *
  * Everything is exact integer bit arithmetic — no library calls — so
  * the z-values have a bit-identical DuckDB oracle.
  */
object ZOrderLayout {

  /** The z-value: bits of `x` and `y` interleaved (x in even positions,
    * y in odd), both inputs required in [0, 2^bits). A flat codegen'd
    * arithmetic expression — `bits` is a plan-time constant, so this
    * inlines into whole-stage codegen with no UDF boundary.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in 1..31, got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Locality report over equal-width z-ranges: assign each row to one
    * of `nBuckets` contiguous z-intervals (a stand-in for "file" — the
    * writer below makes the intervals physical) and emit each bucket's
    * (x, y) bounding rectangle + row count. Z-ordering is working when
    * every rectangle is small in BOTH dimensions — that's what footer
    * pruning sees. Equal-WIDTH (zval·n ÷ 2^{2·bits}) rather than
    * equal-count buckets keeps the assignment a narrow per-row
    * expression — no global sort, no single-partition ntile window.
    * One map-side-combinable aggregation to an nBuckets-bounded table.
    */
  def zOrderStats(df: DataFrame, xCol: String, yCol: String, bits: Int,
                  nBuckets: Int): DataFrame = {
    val space = 1L << (2 * bits)
    require(nBuckets >= 1 && nBuckets <= space,
      s"nBuckets must be in [1, 2^(2*bits)], got $nBuckets")
    // bucket by interval WIDTH, not zval*nBuckets DIV space: at bits=31
    // zval*nBuckets overflows Long. When nBuckets divides the space
    // (every power-of-two choice) the two are identical; otherwise the
    // last interval is slightly wider — a report, not a contract
    val width = math.max(1L, space / nBuckets)
    df.select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("zval", zValue(col("x"), col("y"), bits))
      .withColumn("bucket", expr(s"zval DIV $width"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
  }

  /** Write `df` z-ordered on (xCol, yCol): range-partition by z-value
    * (each task owns one contiguous z-interval — that's what bounds a
    * FILE's rectangle), sort within partitions, drop the helper column,
    * write parquet. Readers prune on the ordinary parquet min/max
    * footer stats of BOTH columns; no table-format support needed.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    bits: Int, numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.withColumn("graft_zval", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("graft_zval"))
      .sortWithinPartitions(col("graft_zval"))
      .drop("graft_zval")
      .write.mode("overwrite").parquet(path)
  }
}
