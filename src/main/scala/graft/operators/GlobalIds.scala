package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Dense global row numbering 0..n−1 in a total order — the sample-id /
  * shard-offset assignment step of a training pipeline — WITHOUT the
  * shape that kills it at scale. The naive formulation,
  * `row_number() OVER (ORDER BY ...)`, is a single-partition window:
  * Spark moves the ENTIRE table through one reducer to number it, which
  * is a non-starter on a 100-TB corpus. This operator instead:
  *
  *  1. range-repartitions on the order columns (a real shuffle, but a
  *     balanced all-to-all into `numParts` sorted ranges),
  *  2. sorts within each partition,
  *  3. `zipWithIndex` — one lightweight count job over partition SIZES
  *     (bytes never move), then per-partition offsets ride in the task
  *     closures and ids are assigned in a narrow map.
  *
  * The result is deterministic whenever `orderCols` is a TOTAL order
  * (include a unique tie-break column): range boundaries only decide
  * where a partition splits, not the global sequence. Cost: one range
  * shuffle + one count job — vs the window's one shuffle into ONE task.
  */
object GlobalIds {

  def withGlobalIds(df: DataFrame, orderCols: Seq[String],
                    idName: String = "row_id", numParts: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must name a total order")
    val spark = df.sparkSession
    val parts =
      if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val cols = orderCols.map(col)
    val sorted = df.repartitionByRange(parts, cols: _*)
      .sortWithinPartitions(cols: _*)
    val schema = sorted.schema.add(idName, LongType, nullable = false)
    val withIds = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(withIds, schema)
  }
}
