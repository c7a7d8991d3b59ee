package graft.etl

import org.apache.spark.sql.DataFrame

/** Session-scoped registry for DataFrames persisted inside lazily-returned
  * operators ([[graft.ext.Dedup.dropNearDuplicates]] persists its token
  * stream, [[graft.ext.Dedup.lshCandidatePairs]] its bucket table). The
  * operator cannot unpersist before its result is materialized — the caller
  * owns the action — so repeated calls in one session would otherwise
  * accumulate cached blocks for the session lifetime. Drivers (`Verify`,
  * `Bench`) call [[releaseAll]] after each query's action.
  */
object CacheRegistry {
  private val active = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` (MEMORY_AND_DISK) and track it for later release. */
  def persist(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    active += p
    p
  }

  /** Unpersist every tracked DataFrame (non-blocking) and clear the registry.
    * localCheckpoint'ed frames are deliberately NOT tracked: Dataset.unpersist
    * cannot free their blocks — the ContextCleaner does, once all references
    * drop, which a registry entry would only delay. */
  def releaseAll(): Unit = synchronized {
    active.foreach(_.unpersist(blocking = false))
    active.clear()
  }
}
