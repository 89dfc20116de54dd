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
  private val MaxEntries = 8
  private val entries = new java.util.ArrayDeque[DataFrame]()

  def register(df: DataFrame): DataFrame = entries.synchronized {
    entries.addLast(df)
    while (entries.size > MaxEntries) {
      try entries.removeFirst().unpersist(false)
      catch { case _: Throwable => () }
    }
    df
  }
}
