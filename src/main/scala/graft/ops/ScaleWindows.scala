package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StringType

/** Scale-safe forms of global-order window functions.
  *
  * `lag(x) OVER (ORDER BY key)` plans a single-partition window — a
  * driver-equivalent bottleneck at web scale (VERDICT r1 #7). The
  * boundary-exchange form here computes the identical result with scalable
  * pieces:
  *
  *   1. bucket boundaries come from ONE approx-percentile pass over the key
  *      (collected to the driver — a fixed literal, so every consumer of the
  *      bucketed plan sees the same bucketing; `spark_partition_id` after a
  *      sampled repartitionByRange would NOT give that guarantee across
  *      plan branches);
  *   2. rows are bucketed by a monotone key image (order-preserving, so
  *      bucket i's keys all precede bucket i+1's), and lagged within each
  *      bucket (hash exchange — no single-partition stage over data);
  *   3. each bucket's LAST row (≤ nBuckets rows — driver-scale metadata) is
  *      lagged across buckets and broadcast back to fill each bucket's first
  *      row.
  *
  * The output is the exact global lag whenever `key` values are distinct
  * (with duplicate keys a global lag is nondeterministic anyway).
  */
object ScaleWindows {

  /** Monotone numeric image of a key column: numerics cast to double;
    * strings pack their first four UTF-16 units (clamped to 16 bits) into a
    * double-exact integer — order-preserving on the 4-char prefix, ties
    * simply share a bucket.
    */
  private def keyImage(df: DataFrame, keyCol: String): Column = {
    val dt = df.schema(keyCol).dataType
    val k = col(keyCol)
    if (dt == StringType) {
      def unit(i: Int): Column =
        coalesce(least(ascii(substring(k, i + 1, 1)), lit(65535)), lit(0)).cast("double")
      unit(0) * math.pow(2, 48) + unit(1) * math.pow(2, 32) +
        unit(2) * math.pow(2, 16) + unit(3)
    } else k.cast("double")
  }

  /** Adds `outCol` = global lag(valueCol, 1) over (ORDER BY keyCol), without
    * a single-partition window over data-scale rows. The global first row
    * gets null (standard lag semantics). `valueCol` should be non-null (a
    * null value is indistinguishable from "first row of bucket" in the
    * boundary fill).
    */
  def withGlobalLag(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      outCol: String,
      numBuckets: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n =
      if (numBuckets > 0) numBuckets
      else math.max(2, spark.sparkContext.defaultParallelism)

    val img = keyImage(df, keyCol)

    // one sketch pass; the collected array is a literal, identical for every
    // branch of the downstream plan
    val fracs = (1 until n).map(_.toDouble / n)
    val boundariesRow = df
      .select(percentile_approx(img, lit(fracs.toArray), lit(10000)).as("b"))
      .collect()(0)
    val boundaries: Seq[Double] =
      if (boundariesRow.isNullAt(0)) Seq.empty
      else boundariesRow.getSeq[Double](0)

    // monotone bucket id: #boundaries strictly below the key image
    val bucket = boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(img > lit(b), 1).otherwise(0)
    }

    val bucketed = df.withColumn("__bkt", bucket)
    val wIn = Window.partitionBy(col("__bkt")).orderBy(col(keyCol))
    val withLocal = bucketed.withColumn("__lag", lag(col(valueCol), 1).over(wIn))

    // one row per non-empty bucket: its last (max-key) value. ≤ n rows —
    // metadata-scale. The "previous non-empty bucket" lookup is a broadcast
    // theta-join over this tiny table (≤ n² pairs), NOT a global-order
    // window, so no single-partition stage exists anywhere in the plan.
    val lastPer = bucketed
      .groupBy(col("__bkt"))
      .agg(max_by(col(valueCol), col(keyCol)).as("__last"))
    val preds = lastPer.select(col("__bkt").as("__pb"), col("__last"))
    val prevBoundary = lastPer.select(col("__bkt"))
      .join(broadcast(preds), col("__pb") < col("__bkt"))
      .groupBy(col("__bkt"))
      .agg(max_by(col("__last"), col("__pb")).as("__prev_last"))

    withLocal.join(broadcast(prevBoundary), Seq("__bkt"), "left")
      .withColumn(outCol,
        when(col("__lag").isNull, col("__prev_last")).otherwise(col("__lag")))
      .drop("__bkt", "__lag", "__prev_last")
  }
}
