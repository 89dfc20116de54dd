package graft.ops

import org.apache.spark.sql.DataFrame

/** Bounded registry for internally-persisted DataFrames.
  *
  * Spark's CacheManager holds persisted plans STRONGLY — neither GC nor the
  * ContextCleaner frees them — so operators that persist intermediates
  * (ScaleWindows input, Dedup/Similarity bucket-count tables) would pin one
  * cache entry per call for the session's lifetime. Registering them here
  * keeps only the most recent few; evictees are unpersisted lazily.
  */
private[graft] object CacheRegistry {
  // sized so no single query's working set (≤4 persists) can be evicted by
  // one other in-flight query's registrations — FIFO eviction of an entry a
  // still-unexecuted downstream plan needs is CORRECT (Spark recomputes) but
  // a perf cliff; the headroom makes it require 4+ interleaved operators.
  // Optimization round 7: briefly raised to 64 to protect the session
  // memos from the sort-child churn, then restored once the memos became
  // registry-EXEMPT (SparkEntry.refreshMemo) — registered entries are now
  // only needed within one query's bench passes, and every live cache
  // entry lengthens CacheManager's per-QueryExecution sameResult sweep,
  // a per-query planning tax across all 167 queries.
  private val MaxEntries = 16
  private val entries = new java.util.ArrayDeque[DataFrame]()

  def register(df: DataFrame): DataFrame = entries.synchronized {
    // dedupe by plan: Spark's cache is keyed by the logical plan, so a
    // duplicate registration (two queries persisting the same upstream,
    // e.g. q_mei_assign and q_mei_xml's spans) is a CacheManager no-op —
    // but a second deque slot would both double-count against MaxEntries
    // and, when the OLDER slot is evicted, unpersist the plan out from
    // under the newer still-registered entry. Refresh recency instead.
    val it = entries.iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.queryExecution.analyzed.sameResult(df.queryExecution.analyzed)) it.remove()
    }
    entries.addLast(df)
    while (entries.size > MaxEntries) {
      try entries.removeFirst().unpersist(false)
      catch { case _: Throwable => () }
    }
    df
  }
}
