package graft.pipeline

import org.apache.spark.sql.{Dataset, SaveMode}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Resumable flagship run: output committed at bucket granularity with a
  * manifest, emulating Iceberg snapshot checkpoints over parquet (no Iceberg
  * jar ships in /opt/spark/jars — SURVEY.md §4 item 5; swapping in a real
  * Iceberg writer is a config change behind this interface).
  *
  * Buckets are `pmod(xxhash64(url), nBuckets)`. Buckets are processed in
  * WAVES (several buckets per Spark job) so a 10^12-row rerun does not pay
  * one input scan per bucket: scan count = ceil(uncommitted/bucketsPerWave).
  * After each wave's write lands, its buckets are appended to
  * `_manifest.jsonl`; a rerun reads the manifest and processes only
  * uncommitted buckets. Output layout:
  *
  *   outDir/spans/bucket=N/   (parquet)
  *   outDir/metrics/bucket=N/ (parquet)
  *   outDir/_manifest.jsonl   — one {"bucket":N,"rows":R,"spans":S} per line
  */
object ResumableAlignRunner {

  final case class WaveResult(bucket: Int, rows: Long, spans: Long)

  def manifestPath(outDir: String) = Paths.get(outDir, "_manifest.jsonl")

  /** Full-line match only: a crash mid-append can leave a truncated trailing
    * line — such garbage must parse as "not committed" (recomputed, never
    * silently swallowed).
    */
  private val ManifestLine =
    """\{"bucket":(\d+),"rows":\d+,"spans":\d+\}""".r

  def committedBuckets(outDir: String): Set[Int] = {
    val p = manifestPath(outDir)
    if (!Files.exists(p)) Set.empty
    else Files.readAllLines(p).asScala.flatMap {
      case ManifestLine(b) => Some(b.toInt)
      case _ => None // blank or truncated line
    }.toSet
  }

  /** Snapshot-consistent read of the spans table: ONLY buckets whose
    * manifest line has landed — the Iceberg-snapshot read semantics over
    * the parquet emulation. A reader running concurrently with a writer
    * (or after a mid-wave crash) never sees a partially-written bucket
    * directory, because a bucket becomes visible atomically with its
    * manifest append. Partition pruning: the bucket filter lands on the
    * `bucket=N` directory column, so uncommitted directories are never
    * even listed into tasks.
    */
  def readCommitted(spark: org.apache.spark.sql.SparkSession,
      outDir: String): org.apache.spark.sql.DataFrame = {
    val done = committedBuckets(outDir).toSeq
    // nothing committed yet (or the writer died before its first parquet
    // job) — the snapshot contract says EMPTY, not AnalysisException from
    // a missing/unreadable spans dir; the spans schema is static, so the
    // empty frame is well-typed for downstream selects
    if (done.isEmpty || !Files.isDirectory(Paths.get(outDir, "spans"))) {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("url", StringType), StructField("seq", IntegerType),
        StructField("syl", StringType), StructField("ulx", IntegerType),
        StructField("uly", IntegerType), StructField("lrx", IntegerType),
        StructField("lry", IntegerType), StructField("bucket", IntegerType)))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else {
      spark.read.parquet(s"$outDir/spans")
        .filter(col("bucket").isInCollection(done))
    }
  }

  /** Run (or resume) the job. Returns the buckets processed in THIS
    * invocation. `maxWaves` bounds the waves processed (test hook: simulate
    * a kill between waves).
    */
  def run(
      pages: Dataset[Page],
      outDir: String,
      nBuckets: Int,
      bucketsPerWave: Int = 8,
      maxWaves: Int = Int.MaxValue): Seq[Int] = {
    val spark = pages.sparkSession
    Files.createDirectories(Paths.get(outDir))

    val done = committedBuckets(outDir)
    val todo = (0 until nBuckets).filterNot(done.contains)
    val waves = todo.grouped(bucketsPerWave).take(maxWaves).toSeq
    val processed = Seq.newBuilder[Int]

    for (wave <- waves) {
      val waveSet = wave.toSet
      // a crash can land mid-wave AFTER some parquet appends but BEFORE the
      // manifest commit; uncommitted bucket dirs are partial garbage -- wipe
      // them so the rewrite below cannot duplicate rows
      for (b <- wave; sub <- Seq("spans", "metrics")) {
        val dir = Paths.get(outDir, sub, s"bucket=$b")
        if (Files.exists(dir)) {
          val walk = Files.walk(dir)
          try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => Files.delete(f))
          finally walk.close()
        }
      }
      val bucketCol = pmod(xxhash64(col("url")), lit(nBuckets)).cast("int")
      val waved = pages.toDF()
        .withColumn("bucket", bucketCol)
        .filter(col("bucket").isInCollection(waveSet))

      import spark.implicits._
      val aligned = AlignJob.align(waved.drop("bucket").as[Page],
        saltPartitions = spark.sparkContext.defaultParallelism)
        .withColumn("bucket", bucketCol)

      // cache the kernel output for the wave: spans + metrics + counts reuse
      aligned.persist()
      try {
        AlignJob.spans(aligned.drop("bucket").as[AlignedDoc])
          .withColumn("bucket", bucketCol)
          .write.mode(SaveMode.Append).partitionBy("bucket")
          .parquet(s"$outDir/spans")
        aligned.drop("spans")
          .write.mode(SaveMode.Append).partitionBy("bucket")
          .parquet(s"$outDir/metrics")

        val counts = aligned.groupBy(col("bucket"))
          .agg(count(lit(1)).as("rows"), sum(col("n_spans")).as("spans"))
          .collect()
          .map(r => WaveResult(r.getInt(0), r.getLong(1), r.getLong(2)))
          .toSeq
        // commit the wave: buckets with zero rows still get manifest lines
        val byBucket = counts.map(w => w.bucket -> w).toMap
        val lines = wave.map { b =>
          val w = byBucket.getOrElse(b, WaveResult(b, 0, 0))
          s"""{"bucket":${w.bucket},"rows":${w.rows},"spans":${w.spans}}"""
        }
        // leading newline isolates this wave's block from any truncated
        // partial line a previous crash may have left behind
        Files.write(manifestPath(outDir),
          (lines.mkString("\n", "\n", "\n")).getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        processed ++= wave
      } finally aligned.unpersist()
    }
    processed.result()
  }
}
