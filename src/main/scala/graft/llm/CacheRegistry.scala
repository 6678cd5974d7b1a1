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
    SparkSession, java.util.concurrent.ConcurrentLinkedQueue[(DataFrame, AnyRef)]]()

  // The ambient owner for scoped release: registrations made while a
  // [[scoped]] block runs on this thread are tagged with its token, so
  // the block's exit releases ONLY its own work — an identity snapshot
  // of the shared queue (the previous mechanism) also swept caches a
  // concurrently-running stream/job registered during the block.
  private val currentOwner = new ThreadLocal[AnyRef]

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
        _ => new java.util.concurrent.ConcurrentLinkedQueue[(DataFrame, AnyRef)]())
        .add((df, currentOwner.get()))
    }
    df
  }

  /** Release the persisted RDD under a `localCheckpoint`ed frame.
    * `Dataset.unpersist` only talks to the CacheManager, which knows
    * nothing of checkpoint storage — the persisted RDD beneath the
    * checkpoint's LogicalRDD is what must be unpersisted. The shared
    * helper for every iterative operator's checkpoint cadence
    * (pageRank, labelPropagation, kCore, bradleyTerry): superseded
    * per-level checkpoints release deterministically instead of
    * waiting on GC + ContextCleaner.
    */
  def dropLocalCheckpoint(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
    case _ => ()
  }

  /** Unpersist every handle registered for the session. */
  def releaseAll(spark: SparkSession): Unit = {
    val q = reg.remove(spark)
    if (q != null) q.forEach { case (df, _) =>
      try df.unpersist() catch { case _: Throwable => () }
    }
  }

  /** Run `body` with every [[persist]] on THIS thread tagged to a fresh
    * owner token, then unpersist exactly those handles — the streaming
    * micro-batch pattern: a long-running foreachBatch loop releases the
    * caches its own operators registered, never a co-resident job's
    * (whose registrations carry a different owner, or none). Nested
    * scopes stack: the inner scope's releases don't touch the outer's.
    */
  def scoped[T](spark: SparkSession)(body: => T): T = {
    val tok = new Object
    val prev = currentOwner.get()
    currentOwner.set(tok)
    try body
    finally {
      currentOwner.set(prev)
      releaseOwned(spark, tok)
    }
  }

  /** Unpersist and deregister every handle tagged with `owner`. */
  private def releaseOwned(spark: SparkSession, owner: AnyRef): Unit = {
    val q = reg.get(spark)
    if (q != null) {
      val it = q.iterator()
      while (it.hasNext) {
        val (df, tag) = it.next()
        if (tag eq owner) {
          try df.unpersist() catch { case _: Throwable => () }
          it.remove()
        }
      }
    }
  }
}
