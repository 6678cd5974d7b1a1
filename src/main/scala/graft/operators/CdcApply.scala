package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture changelog apply — the MERGE/upsert core that
  * turns (base snapshot + ordered changelog) into the next snapshot,
  * the maintenance step every incrementally-updated 100-TB table needs
  * (the operation Delta/Hudi/Iceberg call MERGE INTO, as a pure
  * DataFrame transform).
  *
  * Semantics: the changelog carries the SAME payload columns as the
  * base plus a sequence column (monotone per key: commit timestamp /
  * LSN) and an op column with values `I`/`U` (upsert) or `D` (delete).
  * Per key, the highest (seq, op-rank, payload-hash) entry wins —
  * op-rank makes a DELETE beat an upsert at the SAME sequence number,
  * the conservative reading of a tie, and the trailing xxhash64 over
  * the payload makes even two DIFFERENT upserts at the same (key, seq)
  * resolve to one engine-independent winner (the highest-hash payload —
  * arbitrary, but deterministic; ties should not happen in a well-
  * formed log, and when they do the result must not be plan-dependent).
  * Base rows participate as upserts at sequence −∞, so an untouched key
  * survives unchanged and a changed key never needs a join back to
  * base.
  *
  * Scale shape: ONE shuffle, keyed on the primary key, aggregating
  * with `max_by(payload, (seq, rank))` — O(1) state per key and
  * map-side combinable, unlike the row_number-over-window formulation
  * (which sorts every key group) or the join-based MERGE (two shuffles
  * plus null-handling). Deletes are filtered AFTER the argmax, so a
  * delete genuinely removes the key even when base carries it.
  */
object CdcApply {

  def applyChangelog(base: DataFrame, changes: DataFrame,
                     keyCols: Seq[String], seqCol: String,
                     opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val payload = base.columns.toSeq
    require(!payload.contains(seqCol) && !payload.contains(opCol),
      s"base must not already carry $seqCol/$opCol")
    val all = base
      .withColumn(seqCol, lit(Long.MinValue))
      .withColumn(opCol, lit("U"))
      .unionByName(changes.select((payload :+ seqCol :+ opCol).map(col): _*))
    val rank = when(col(opCol) === "D", lit(1L)).otherwise(lit(0L))
    val winner = all
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(
        struct((payload.map(col) :+ col(opCol).as("graft_op")): _*),
        struct(col(seqCol), rank.as("graft_rank"),
          xxhash64(payload.map(col): _*).as("graft_tb"))).as("graft_w"))
    winner
      .filter(col("graft_w.graft_op") =!= "D")
      .select(payload.map(c => col(s"graft_w.$c").as(c)): _*)
  }
}
