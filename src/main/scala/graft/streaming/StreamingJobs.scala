package graft.streaming

import graft.pipeline.{AlignJob, Page}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Structured Streaming surface.
  *
  * The reference is pure batch (one folio at a time, alignToOCR.py:407-438 —
  * SURVEY.md §2h: no watermarks/windows/state), so streaming is a graft
  * EXTENSION, not a ported capability: the same per-row kernel runs
  * unchanged over a file-source stream (micro-batch), which is how a
  * continuously-crawled 10^12-page table would be ingested incrementally —
  * each micro-batch is embarrassingly parallel, checkpointed by the sink.
  */
object StreamingJobs {

  /** Stream pages from a parquet directory (file source) through the align
    * kernel. The caller picks the sink/trigger; `Trigger.AvailableNow` turns
    * it into an incremental catch-up batch (the resume story for continuous
    * crawls).
    */
  def alignStream(spark: SparkSession, pagesDir: String): DataFrame = {
    import spark.implicits._
    val pages = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Page]].schema)
      .parquet(pagesDir)
      .as[Page]
    AlignJob.spans(AlignJob.align(pages))
  }

  /** Windowed event aggregation with watermark + late-data handling over the
    * events table shape: per event_type counts/sums in 1-minute tumbling
    * windows, 2-minute watermark.
    */
  def eventWindowCounts(events: DataFrame): DataFrame =
    events
      // watermarks require TIMESTAMP (the testdata carries TIMESTAMP_NTZ);
      // session timezone is pinned to UTC so the cast is instant-preserving
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Run a streaming query to completion over the currently-available input
    * (AvailableNow) writing parquet + checkpoint under outDir. Returns rows
    * written (from the sink directory).
    */
  def runAvailableNow(df: DataFrame, outDir: String): Unit = {
    val q = df.writeStream
      .format("parquet")
      .option("path", s"$outDir/data")
      .option("checkpointLocation", s"$outDir/checkpoint")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
