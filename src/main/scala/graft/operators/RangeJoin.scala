package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band (interval) join: match left rows to right rows on an equality
  * key plus |right.ts − left.ts| ≤ window.
  *
  * Naive formulation is an equi-join on the key followed by the range
  * filter — on a skewed key (one user with 1M events) that's a quadratic
  * blow-up inside one task. This operator buckets time into
  * window-sized bins and replicates only the LEFT side into its three
  * adjacent bins; the right side keeps exactly one bin per row, so every
  * qualifying pair meets in exactly one (key, bin) bucket — no
  * post-dedup — and the join key (key, bin) shards a hot key's rows
  * across the cluster by time. Replication factor is a constant 3,
  * independent of data or window.
  */
object RangeJoin {

  /** For each left row: the count of right rows with the same `keyCol`
    * within ±`windowMicros` of its `tsCol` (timestamps compared in
    * integer microseconds), excluding rows with the same `idCol`.
    * Left rows with no neighbors keep n_nearby = 0.
    * Returns left's (idCol, keyCol, tsCol) + n_nearby.
    */
  def countNeighbors(left: DataFrame, right: DataFrame,
                     keyCol: String, tsCol: String, idCol: String,
                     windowMicros: Long): DataFrame = {
    // div 0 under non-ANSI Spark yields NULL bins → every count silently 0
    require(windowMicros > 0, s"windowMicros must be positive, got $windowMicros")
    val lus = unix_micros(col(tsCol))
    // integer `div`, not `/`: double division of a µs epoch can round
    // across a bin boundary
    val l = left.select(col(idCol).as("l_id"), col(keyCol).as("l_key"), lus.as("l_us"))
      .withColumn("bin0", expr(s"l_us div ${windowMicros}L"))
      .withColumn("bin", explode(array(col("bin0") - 1, col("bin0"), col("bin0") + 1)))
      .drop("bin0")
    val r = right.select(col(idCol).as("r_id"), col(keyCol).as("r_key"), lus.as("r_us"))
      .withColumn("bin", expr(s"r_us div ${windowMicros}L"))
    val counted = l.join(r,
        l("l_key") === r("r_key") && l("bin") === r("bin") &&
          abs(r("r_us") - l("l_us")) <= windowMicros && l("l_id") =!= r("r_id"))
      .groupBy(col("l_id")).agg(count(lit(1)).as("n_nearby"))
    left.select(col(idCol), col(keyCol), col(tsCol))
      .join(counted, left(idCol) === counted("l_id"), "left")
      .select(col(idCol), col(keyCol), col(tsCol),
        coalesce(col("n_nearby"), lit(0L)).as("n_nearby"))
  }
}
