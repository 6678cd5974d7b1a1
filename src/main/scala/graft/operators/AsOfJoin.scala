package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Distributed as-of join: for every left row, attach the latest right row
  * with `rightTime <= leftTime` on the same key.
  *
  * Spark has no native as-of join; the naive range join explodes to one
  * row per (left, earlier-right) pair before picking the max. This is the
  * merge formulation instead: tag both sides, union, and run one
  * `last(payload, ignoreNulls)` window over (key, time) — a single shuffle
  * on the key and a single per-partition sorted scan, O(|L|+|R|) rows, no
  * pair blow-up. At 100 TB this is the only shape that survives: the
  * shuffle is the same one any join on the key would pay, and skew in the
  * key column is handled by AQE the same way as a groupBy.
  */
object AsOfJoin {

  /** Left rows with `payloadCols` from the as-of matched right row
    * (nulls when no right row precedes). Ties on rightTime resolve to the
    * greatest payload struct, so make the first payload column a unique
    * key (e.g. the right table's primary key) for determinism.
    */
  def lookupLatest(
      left: DataFrame,
      leftKey: String,
      leftTime: String,
      right: DataFrame,
      rightKey: String,
      rightTime: String,
      payloadCols: Seq[String]): DataFrame = {
    val pStruct = struct(payloadCols.map(col): _*)
    val pType = right.select(pStruct.as("__p")).schema("__p").dataType

    val leftCols = left.columns.toSeq
    val l = left.select(
      col(leftKey).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__side") +:
        lit(null).cast(pType).as("__p") +: leftCols.map(col): _*)
    // a right row with a NULL time has no defined as-of position — NULLS
    // FIRST ordering would otherwise make it precede (and match) every
    // left row, violating the rightTime <= leftTime contract
    val r = right.filter(col(rightTime).isNotNull).select(
      col(rightKey).as("__k") +: col(rightTime).as("__t") +: lit(0).as("__side") +:
        pStruct.as("__p") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // right rows (__side 0) sort before left rows at the same instant, so
    // an order AT the event time is visible (<=, not <); among right rows
    // with equal time the greatest payload struct wins
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payloadCols.map(c => col("__m").getField(c).as(c)): _*)
  }
}
