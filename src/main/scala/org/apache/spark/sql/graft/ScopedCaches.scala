package org.apache.spark.sql.graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Scope hygiene for operator-internal caches.
  *
  * Several operators persist a shared intermediate that MULTIPLE
  * branches of one composed plan consume (the IVF (vid, e, nrm,
  * probe_cids) projection, q20's range-partitioned base): the cache is
  * what collapses a double corpus scan into one, but the operator
  * returns its result LAZILY, so it cannot unpersist before the
  * caller's action — and a long-lived session composing operators
  * would otherwise accumulate cached relations forever (the r8 "cache
  * lifetime is manual" residual).
  *
  * [[scoped]] closes the gap without driver-side materialization: the
  * DataFrame is persisted and tracked, and a [[QueryExecutionListener]]
  * sweeps after every completed action in the session, releasing each
  * tracked cache once its column buffers are LOADED. Materialization is
  * the release signal because it is precise exactly where it matters:
  * a scoped cache is materialized by the one consuming action (every
  * branch fills it during that job), so "loaded" ⇔ "the action this
  * cache existed for has run". Until then the entry is pure metadata —
  * tracking it costs nothing and unrelated actions leave it alone.
  *
  * Release is best-effort and NEVER affects results: an early release
  * (e.g. a caller running two actions over one composed result) only
  * means the second action re-plans without the cache — the r7
  * double-scan cost, not a correctness change. The listener bus is
  * asynchronous, so release lands shortly after the action returns;
  * tests poll (see CacheHygieneSpec).
  *
  * Lives in the spark-internal package for CachedRDDBuilder's
  * private[sql] materialization probe.
  */
object ScopedCaches {

  private val tracked = java.util.Collections.newSetFromMap(
    new ConcurrentHashMap[DataFrame, java.lang.Boolean]())
  private val installed = java.util.Collections.newSetFromMap(
    new ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Persist `df` until the action that consumes it completes, then
    * release it via the listener sweep. Returns `df` for chaining.
    */
  def scoped(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (installed.add(spark)) {
      spark.listenerManager.register(new Releaser(spark))
    }
    // track BEFORE persist: a sweep landing in between must see this
    // df as a live co-owner of any equal-plan cache entry (persist on
    // an already-cached plan is a no-op that reuses the entry)
    tracked.add(df)
    df.persist()
    df
  }

  /** Caches still awaiting their consuming action (spec probe). */
  def pending: Int = tracked.size()

  private final class Releaser(spark: SparkSession)
      extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = sweep()
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = sweep()
    private def sweep(): Unit = {
      val cm = spark.sharedState.cacheManager
      tracked.forEach { df =>
        if (df.sparkSession.sharedState eq spark.sharedState) {
          cm.lookupCachedData(
            spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
            df.queryExecution.analyzed) match {
            case None =>
              tracked.remove(df) // cleared externally (clearCache())
            case Some(cd)
                if cd.cachedRepresentation.cacheBuilder
                  .isCachedColumnBuffersLoaded =>
              // the sweep is ASYNC: a later run of the same query may
              // already be tracking an equal plan and sharing this very
              // cache entry (its persist was a no-op). Hand the entry
              // over instead of unpersisting under its feet — the
              // successor's own consuming action releases it.
              tracked.remove(df)
              val sharedWithLiveOwner = tracked.stream().anyMatch(o =>
                (o.sparkSession.sharedState eq spark.sharedState) &&
                  o.queryExecution.analyzed
                    .sameResult(df.queryExecution.analyzed))
              if (!sharedWithLiveOwner) df.unpersist(blocking = false)
            case _ => () // unmaterialized: consuming action still ahead
          }
        }
      }
    }
  }
}
