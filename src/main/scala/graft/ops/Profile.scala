package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the step a pipeline runs BEFORE committing a 100 TB
  * job to a table it has never seen: per-column null counts and distinct
  * cardinalities, one row per column. The numbers that size everything
  * downstream (shuffle partitions, broadcast decisions, dedup viability,
  * skew expectations).
  *
  * Scale shape: ONE aggregate pass. `exact = false` (the production
  * default) uses `approx_count_distinct` (HyperLogLog++), which
  * partial-aggregates map-side — a single sketch-sized shuffle regardless
  * of cardinality. `exact = true` uses `count(distinct …)`, which Catalyst
  * plans as one Expand (×columns) + two-phase aggregate — exact and
  * engine-portable (it is the oracle-checked mode; HLL sketches are
  * implementation-specific and deliberately NOT oracled), but the expand
  * multiplies the shuffle by the column count: at 10^12 rows use the
  * default.
  *
  * Output: (column, n_rows, n_nulls, n_distinct) — n_distinct excludes
  * null (both engines' count-distinct convention).
  */
object Profile {

  def profileTable(df: DataFrame, exact: Boolean = false): DataFrame = {
    val names = df.columns.toSeq
    // profile by POSITION under generated names: the op is for tables the
    // caller has never seen, whose column names may need quoting (dots,
    // backticks), collide with the aggregate aliases below, or repeat —
    // a positional rename sidesteps all three
    val safe = df.toDF(names.indices.map(i => s"__c$i"): _*)
    val aggs = Seq(count(lit(1)).as("__n")) ++ names.indices.flatMap { i =>
      Seq(
        sum(when(col(s"__c$i").isNull, 1L).otherwise(0L)).as(s"__nulls_$i"),
        (if (exact) count_distinct(col(s"__c$i"))
         else approx_count_distinct(col(s"__c$i"))).as(s"__dist_$i"))
    }
    val wide = safe.agg(aggs.head, aggs.tail: _*)
    val perCol = names.zipWithIndex.map { case (n, i) =>
      struct(lit(n).as("column"), col("__n").as("n_rows"),
        col(s"__nulls_$i").as("n_nulls"), col(s"__dist_$i").as("n_distinct"))
    }
    wide.select(explode(array(perCol: _*)).as("p"))
      .select(col("p.column"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct"))
  }
}
