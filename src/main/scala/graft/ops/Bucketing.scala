package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins: write both sides bucketed (and sorted) on the
  * join key so repeated joins run with NO Exchange — at 10^12 rows the
  * shuffle is paid once at write time instead of per query (SURVEY.md §4 /
  * prompt: "bucketing for co-located joins").
  *
  * Uses the session catalog (saveAsTable — bucket metadata lives in the
  * metastore; a plain parquet write cannot carry it).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (overwrite). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. When both sides share the
    * bucket count, Catalyst plans a SortMergeJoin with ZERO Exchange (and
    * with sorted buckets, often zero Sort too).
    */
  def cooperativeJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
