package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry of the DataFrames that operator plan-builders
  * persist for shared-subtree reuse (Spark re-executes every occurrence
  * of a subplan, so a DF feeding 2+ branches must be cached — PERF
  * LESSON 1). Those caches cannot be dropped inside the builder: the
  * returned plan is lazy, and an eager `unpersist()` at construction
  * time is a no-op that silently re-scans the corpus once per branch.
  *
  * Caller contract: after materializing an operator's result (count /
  * write / collect), call `CacheRegistry.releaseAll(spark)` — or
  * `spark.catalog.clearCache()`, which the bench and verify harnesses
  * already do between queries. Re-materializing a result after release
  * is still correct (the plan recomputes), just slower.
  */
object CacheRegistry {
  private val reg = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.concurrent.ConcurrentLinkedQueue[DataFrame]]()

  /** Persist `df` (default storage level) and track the handle.
    * IDEMPOTENT by logical plan: composed operators re-persist shared
    * subtrees an inner builder already registered (e.g. dedupCorpus over
    * collapsedParts), and a second `persist()` on an equivalent plan
    * only earns a `CacheManager: already cached` warning — so a plan
    * that is already cached (this handle or any equivalent one;
    * `storageLevel` resolves through the session's CacheManager) is
    * returned untouched, leaving the original registrant to release it.
    */
  def persist(df: DataFrame): DataFrame = {
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
      df.persist()
      reg.computeIfAbsent(df.sparkSession,
        _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()).add(df)
    }
    df
  }

  /** Unpersist every handle registered for the session. */
  def releaseAll(spark: SparkSession): Unit = {
    val q = reg.remove(spark)
    if (q != null) q.forEach { df =>
      try df.unpersist() catch { case _: Throwable => () }
    }
  }

  /** Identity snapshot of the handles currently registered for the
    * session — pair with [[releaseDelta]] so a long-running caller (a
    * streaming micro-batch loop) can release ONLY the caches its own
    * work registered, without unpersisting co-resident jobs' frames.
    */
  def snapshot(spark: SparkSession): java.util.Set[DataFrame] = {
    val s = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[DataFrame, java.lang.Boolean]())
    val q = reg.get(spark)
    if (q != null) q.forEach { df => s.add(df); () }
    s
  }

  /** Unpersist and deregister every handle added AFTER `before` (a
    * [[snapshot]] taken by the same caller). Handles present in the
    * snapshot — other operators' live caches — are left untouched.
    */
  def releaseDelta(spark: SparkSession, before: java.util.Set[DataFrame]): Unit = {
    val q = reg.get(spark)
    if (q != null) {
      val it = q.iterator()
      while (it.hasNext) {
        val df = it.next()
        if (!before.contains(df)) {
          try df.unpersist() catch { case _: Throwable => () }
          it.remove()
        }
      }
    }
  }
}
