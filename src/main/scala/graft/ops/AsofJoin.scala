package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (temporal) join: for each probe row, attach the payload of the
  * single snapshot row with the greatest `tsCol <= probe ts` within the
  * same `keyCol` — the "state visible at event time" join (crawl snapshot
  * active at fetch time, price at trade time). Spark has no native ASOF
  * JOIN; the naive theta-join + argmax explodes quadratically per key, so
  * this is expressed as the classic union-and-window form:
  *
  *   1. snapshots and probes UNION into one frame (snapshot payload carried
  *      as ONE nullable struct, so a genuinely-null payload field can never
  *      be confused with "no snapshot");
  *   2. one hash exchange on `keyCol`, per-key sort by `(ts, tag)` with
  *      snapshots ordered BEFORE probes at equal ts (a snapshot is visible
  *      to a probe at its own timestamp — DuckDB `ASOF ... ON p.ts >= s.ts`
  *      semantics, which the oracle pins);
  *   3. `last(snap, ignoreNulls) OVER (rows unbounded preceding)` fills each
  *      probe with the latest visible snapshot; probes with none stay null
  *      (left-join semantics).
  *
  * SQL-equality contracts (each mirrors `p.key = s.key AND p.ts >= s.ts`):
  * null-key and null-ts SNAPSHOTS are dropped up front (null equality/
  * comparison can never match); null-key or null-ts PROBES survive with a
  * null payload. Snapshots must be unique per (key, ts) — with duplicates
  * the winner is engine-dependent in ANY as-of formulation (DuckDB
  * included), so the contract is the caller's, not silently resolved here.
  *
  * Scale shape: ONE shuffle of probes+snapshots on `keyCol`; the per-key
  * sort spills, nothing is collected. The plan has no single-partition
  * stage, so it survives key-cardinality growth; a single HOT key (one
  * user/domain with billions of rows) serializes into one sorting task —
  * that regime is [[asofJoinBucketed]], which splits each key's timeline
  * into time buckets and carries the per-bucket last snapshot across
  * buckets on a bucket-level (metadata-scale) table.
  */
object AsofJoin {

  /** Shared union builder: (unionFrame, probeCols, payloadCols). */
  private def unioned(
      probes: DataFrame,
      snaps: DataFrame,
      keyCol: String,
      tsCol: String): (DataFrame, Seq[String], Seq[String]) = {
    val payload = snaps.columns.toSeq.filterNot(c => c == keyCol || c == tsCol)
    val probeCols = probes.columns.toSeq.filterNot(c => c == keyCol || c == tsCol)
    require(payload.nonEmpty, s"snapshot side has no payload besides $keyCol/$tsCol")
    require(probeCols.toSet.intersect(payload.toSet).isEmpty,
      s"probe/payload column collision: ${probeCols.toSet.intersect(payload.toSet)}")

    val snapsU = snaps
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol) +: col(tsCol) +: lit(0).as("__tag") +:
        struct(payload.map(col): _*).as("__snap") +:
        probeCols.map(c => lit(null).cast(probes.schema(c).dataType).as(c)): _*)
    val snapType = snapsU.schema("__snap").dataType
    val probesU = probes
      .select(col(keyCol) +: col(tsCol) +: lit(1).as("__tag") +:
        lit(null).cast(snapType).as("__snap") +: probeCols.map(col): _*)
    (snapsU.unionByName(probesU), probeCols, payload)
  }

  private def project(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      probeCols: Seq[String],
      payload: Seq[String]): DataFrame =
    df.filter(col("__tag") === 1)
      .select(col(keyCol) +: col(tsCol) +: probeCols.map(col) ++:
        payload.map(p => col(s"__asof.$p").as(p)): _*)

  /** The default form: exact per-key as-of via one keyed window. */
  def asofJoin(
      probes: DataFrame,
      snaps: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    val (u, probeCols, payload) = unioned(probes, snaps, keyCol, tsCol)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    project(u.withColumn("__asof", last(col("__snap"), ignoreNulls = true).over(w)),
      keyCol, tsCol, probeCols, payload)
  }

  /** Hot-key form: identical result, but each key's timeline is split into
    * `numBuckets` fixed-width time buckets so no single task sorts a whole
    * key. The cross-bucket carry ("last snapshot of any earlier bucket")
    * is computed on the bucket-level table — ≤ keys × buckets rows,
    * metadata-scale — with a per-key window of ≤ numBuckets rows, then
    * joined back by (key, bucket). Requires a timestamp `tsCol` (bucket
    * width is derived from the observed micros range — deterministic, no
    * wall-clock).
    */
  def asofJoinBucketed(
      probes: DataFrame,
      snaps: DataFrame,
      keyCol: String,
      tsCol: String,
      numBuckets: Int = 0): DataFrame = {
    val spark = probes.sparkSession
    val n = if (numBuckets > 0) numBuckets
      else math.max(2, spark.sparkContext.defaultParallelism)
    val (u0, probeCols, payload) = unioned(probes, snaps, keyCol, tsCol)
    val u = CacheRegistry.register(
      u0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    val bounds = u.agg(
      min(unix_micros(col(tsCol).cast("timestamp"))).as("mn"),
      max(unix_micros(col(tsCol).cast("timestamp"))).as("mx")).head()
    if (bounds.isNullAt(0))
      // no non-null timestamps anywhere: every probe gets a null payload
      return project(u.withColumn("__asof",
        lit(null).cast(u.schema("__snap").dataType)),
        keyCol, tsCol, probeCols, payload)
    val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (mx - mn) / n + 1L)
    // floor of a double division is exact here (offsets ≤ the micros range
    // ≪ 2^53) and the cap bounds any representation edge; cast keeps the
    // join/grouping key integral. NOT `least(raw, n-1)`: Spark's least
    // SKIPS nulls, which would teleport null-ts probes into the last
    // bucket (and its carry) instead of the null bucket no carry joins to
    val raw = floor((unix_micros(col(tsCol).cast("timestamp")) - mn) / width)
    val bkt = when(raw > lit(n - 1L), lit(n - 1L)).otherwise(raw).cast("long")
    val b = u.withColumn("__bkt", bkt)

    // local pass: latest visible snapshot within the row's own bucket
    val wLocal = Window.partitionBy(col(keyCol), col("__bkt"))
      .orderBy(col(tsCol), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = b.withColumn("__local",
      last(col("__snap"), ignoreNulls = true).over(wLocal))

    // carry pass: per (key, bucket-present-in-data), the last snapshot of
    // any EARLIER bucket. Bucket-level table only — the window partitions
    // by key over ≤ numBuckets rows per key.
    val lastPer = b.groupBy(col(keyCol), col("__bkt"))
      .agg(max_by(col("__snap"), when(col("__tag") === 0, col(tsCol))).as("__last"))
    val wCarry = Window.partitionBy(col(keyCol)).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = lastPer.withColumn("__carry",
      last(col("__last"), ignoreNulls = true).over(wCarry))
      .select(col(keyCol), col("__bkt"), col("__carry"))

    val joined = withLocal.join(carry, Seq(keyCol, "__bkt"), "left")
      .withColumn("__asof",
        when(col("__local").isNull, col("__carry")).otherwise(col("__local")))
    project(joined, keyCol, tsCol, probeCols, payload)
  }
}
