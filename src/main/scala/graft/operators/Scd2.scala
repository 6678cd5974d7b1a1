package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD type 2) lookup: enrich a fact stream
  * with the dimension row that was VALID AT the fact's timestamp —
  * `fact.key = dim.key AND dim.valid_from <= fact.ts < dim.valid_to` —
  * the rate-table / price-history / config-history join every event
  * pipeline runs.
  *
  * Scale shape: the join is a plain KEY equi-join with the interval
  * predicate as a residual filter — each key's version chain is short
  * (that is what an SCD is), so the residual scans a handful of rows
  * per match, never a cross product. Dimension history tables are
  * small by construction (versions of reference data), so the default
  * broadcasts the dimension and the fact side never shuffles at all;
  * pass broadcastDim = false for a genuinely large dimension and the
  * planner falls back to a key-hash join (bucket both sides by key in
  * the warehouse to make it exchange-free — BucketedWarehouse).
  *
  * A fact with NO valid version (before the first epoch, after the
  * last, or an unknown key) is kept with NULL dimension columns (left
  * join) — dropping it would silently bias downstream aggregates;
  * count the NULLs with a Checks.NotNull gate instead. Overlapping
  * validity intervals are the dimension's bug, not this operator's:
  * each overlap yields one row PER matching version (exactly what the
  * join semantics say); keep intervals half-open and disjoint.
  */
object Scd2 {

  def lookup(fact: DataFrame, dim: DataFrame, keyCol: String,
             tsCol: String, validFromCol: String, validToCol: String,
             broadcastDim: Boolean = true): DataFrame = {
    val dimSide0 = if (broadcastDim) broadcast(dim) else dim
    // disambiguate the key: the dim side joins under a reserved name
    val dimSide = dimSide0.withColumnRenamed(keyCol, "graft_dim_key")
    fact.join(dimSide,
        fact(keyCol) === dimSide("graft_dim_key") &&
          fact(tsCol) >= dimSide(validFromCol) &&
          fact(tsCol) < dimSide(validToCol),
        "left")
      .drop("graft_dim_key")
  }
}
