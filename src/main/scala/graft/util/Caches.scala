package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.storage.StorageLevel

/** Keyed registry for the engine's shared index frames (shingle index,
  * normalized embedding corpus, minhash signatures, …).
  *
  * Operators persist these so every same-session consumer reads ONE
  * materialization; the registry keys them by canonicalized analyzed plan
  * so (a) repeat calls with identical inputs/args return the SAME cached
  * frame instead of accreting a new storage entry per call, and (b) the
  * session owner has explicit release valves — targeted `release(df)` for
  * one corpus, `releaseAll()` for everything — instead of cache entries
  * living for the session's lifetime. Long-lived services should release
  * when a corpus goes out of scope; the `Verify`/`Bench` mains release on
  * shutdown (Bench additionally between query families, so one family's
  * pinned indexes cannot pressure another family's timings).
  *
  * CONTRACT: cached frames must wrap IMMUTABLE inputs only (the read-only
  * fixture paths, literal query sets). Never cache a plan over a warehouse
  * table that `mergeUpsert`/`compact` rewrites — the registry has no file
  * invalidation, so a later identical plan would return the stale frame.
  * The engine's own call sites (TextDedup/Similarity index frames over
  * fixture corpora) all satisfy this.
  */
object Caches {
  // keyed by (owning session, canonicalized plan): plan equality alone
  // would hand a frame bound to a stopped session to a later session in
  // the same JVM that happens to build the identical plan
  private val frames =
    scala.collection.mutable.LinkedHashMap[(org.apache.spark.sql.SparkSession, LogicalPlan), DataFrame]()

  /** Persist `df` (MEMORY_AND_DISK) unless an equivalent plan is already
    * registered for the same session, in which case that frame is
    * returned. */
  def cached(df: DataFrame): DataFrame = synchronized {
    val key = (df.sparkSession, df.queryExecution.analyzed.canonicalized)
    frames.getOrElseUpdate(key, df.persist(StorageLevel.MEMORY_AND_DISK))
  }

  /** Targeted release: unpersist and forget the frame equivalent to `df`
    * (same session, same canonicalized plan), if registered — lets one
    * component drop its corpus without unpinning another's live indexes
    * the way the global `releaseAll()` would. No-op when absent. */
  def release(df: DataFrame): Unit = synchronized {
    val key = (df.sparkSession, df.queryExecution.analyzed.canonicalized)
    frames.remove(key).foreach(_.unpersist())
  }

  /** Unpersist and forget every registered frame. */
  def releaseAll(): Unit = synchronized {
    frames.values.foreach(_.unpersist())
    frames.clear()
  }

  def size: Int = synchronized(frames.size)
}
