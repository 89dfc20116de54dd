package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recrawl policy ops — what a crawler does with its own capture history:
  *
  *   - [[schedule]]: per-url change-rate estimation from consecutive CDX
  *     captures (the Cho & Garcia-Molina freshness-policy family): a url
  *     whose digest changed on most revisits is `hot` and gets refreshed
  *     first; single-capture urls are `new`. All comparisons are integer
  *     cross-multiplications — no float rates — so the DuckDB window
  *     oracle over the committed CDX golden reproduces them exactly.
  *
  *   - [[budget]]: rank-proportional per-url fetch budgets from a
  *     centrality table (the harmonic ranking): budget(rank) =
  *     max(1, K / rank) — integer division, a Zipf-shaped allocation
  *     that spends most of the crawl on the head without starving the
  *     tail.
  *
  * 100 TB shape: `schedule` is one urlkey-keyed shuffle — the window and
  * the aggregation share the same key, so Catalyst reuses a single
  * exchange; `budget` is a global rank over the (vertex-sized, not
  * corpus-sized) centrality table.
  */
object Recrawl {

  /** cdx: (urlkey, warc_date, digest, archive_id, rec_offset, ...) →
    * (urlkey, n_captures, n_changes, refresh_class). Capture order is
    * pinned (warc_date, archive_id, rec_offset) — date ties broken by
    * archive position.
    */
  def schedule(cdx: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("urlkey"))
      .orderBy(col("warc_date"), col("archive_id"), col("rec_offset"))
    cdx.select(col("urlkey"), col("warc_date"), col("digest"),
        col("archive_id"), col("rec_offset"))
      .withColumn("__prev", lag(col("digest"), 1).over(w))
      .groupBy(col("urlkey"))
      .agg(
        count(lit(1)).as("n_captures"),
        sum(when(col("__prev").isNotNull && col("__prev") =!= col("digest"), 1L)
          .otherwise(0L)).as("n_changes"))
      .select(col("urlkey"), col("n_captures"), col("n_changes"),
        when(col("n_captures") === 1L, "new")
          .when(col("n_changes") * 2L >= col("n_captures") - 1L, "hot")
          .when(col("n_changes") * 4L >= col("n_captures") - 1L, "warm")
          .otherwise("cold").as("refresh_class"))
  }

  /** centrality: (url, harmonic) → (url, rank, budget): rank by
    * (harmonic DESC, url ASC), budget = max(1, k / rank) integer.
    */
  def budget(centrality: DataFrame, k: Long = 1000L): DataFrame = {
    require(k >= 1, s"budget: k must be positive, got $k")
    val w = Window.orderBy(col("harmonic").desc, col("url").asc)
    centrality.select(col("url"), col("harmonic"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("url"), col("rank"),
        // floor(double)/greatest, NOT a double→long cast: Spark's cast
        // truncates while DuckDB's rounds — floor is the portable form
        greatest(lit(1L), floor(lit(k.toDouble) / col("rank"))).as("budget"))
  }
}
