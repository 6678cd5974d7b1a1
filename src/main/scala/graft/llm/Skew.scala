package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew mitigation for hot join keys: salt the skewed (big) side into
  * `saltFactor` deterministic sub-keys and replicate the small side
  * across all salts, so one hot key spreads over `saltFactor` tasks
  * instead of one straggler. Complements AQE's runtime skew-join split —
  * use this when the skew is known ahead of plan time (e.g. a shingle
  * shared by every document, a null-heavy foreign key).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted. The salt hashes the big
    * side's whole row MIXED WITH its map partition id (still no rand()
    * — a retry of the same partition recomputes the same salts):
    * byte-identical duplicate rows — precisely the shape of a hot key —
    * would otherwise all hash to ONE salt and re-concentrate in a
    * single task; with the partition id mixed in they spread across at
    * least as many salts as the map partitions they arrive from.
    * Output columns = big.* ++ small.* minus the duplicate key.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, saltFactor: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt", rowSalt(big, saltFactor))
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    bigSalted.join(smallExploded, Seq(key, "__salt")).drop("__salt")
  }

  private def rowSalt(df: DataFrame, saltFactor: Int): Column =
    pmod(xxhash64((df.columns.map(col) :+ spark_partition_id().cast("long"))
      .toIndexedSeq: _*), lit(saltFactor)).cast("int")

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (key, salt), then final aggregate on key. Spark's hash aggregate
    * already does map-side partials; this adds an extra REDUCE-side
    * spreading step for keys whose partials still overwhelm one task.
    * `partials` aggregates within (key, salt); `finals` merges partials.
    */
  def saltedAggregate(
      df: DataFrame,
      key: String,
      saltFactor: Int,
      partials: Seq[Column],
      finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(df, saltFactor))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(finals.head, finals.tail: _*)
  }
}
