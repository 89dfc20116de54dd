package graft.pipeline

import graft.align._
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One output span column group (FIXTURES.md output schema, flat ints). */
final case class SpanCols(seq: Int, syl: String, ulx: Int, uly: Int, lrx: Int, lry: Int)

/** Per-document kernel output: spans + lineage/metrics
  * (SURVEY.md §4 item 4 — partition lineage travels with the row).
  */
final case class AlignedDoc(
    url: String,
    n_spans: Int,
    spans: Seq[SpanCols],
    partition_id: Int,
    tra_len: Int,
    ocr_len: Int,
    edit_distance: Int,
    gap_count: Int,
    band_width: Int,
    cells_filled: Long,
    error: String)

/** The flagship job: Dataset[Page] → per-url aligned spans via the typed
  * mapPartitions kernel (SURVEY.md §3 lifecycle). Catalyst plan:
  * FileScan → [Exchange(salt)] → DeserializeToObject → MapPartitions →
  * SerializeFromObject — one narrow scan, at most one shuffle, then the
  * embarrassingly parallel CPU-bound kernel stage.
  */
object AlignJob {

  /** Synthesize the pages table from the driver's documents parquet —
    * deterministic (seed = doc_id), so every run and parallelism level sees
    * identical bytes.
    */
  def synthPages(spark: SparkSession, sfDir: String): Dataset[Page] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
      .as[(Long, String, String)]
      .map { case (id, text, lang) => PageGen.pageFor(id, text, lang) }
  }

  /** Run the kernel over pages.
    *
    * @param saltPartitions if > 0, hash-salt rows on url before the kernel —
    *   the explicit skew break of SURVEY.md §4 item 3 (kernel cost is opaque
    *   to AQE; one pathologically long document must not straggle a
    *   partition). 0 = no extra shuffle (input partitioning is trusted).
    *   Trade-off at 10^12 rows: the salt Exchange moves the full page
    *   payloads once — worth it when per-partition kernel-cost variance is
    *   high; skip it when input splits are already well-mixed and rely on
    *   the MaxAlignChars cap + many-docs-per-partition averaging (the
    *   metrics table's per-partition lineage shows which regime you're in).
    */
  def align(
      pages: Dataset[Page],
      scoring: Scoring = Scoring.Default,
      saltPartitions: Int = 0): Dataset[AlignedDoc] = {
    val spark = pages.sparkSession
    import spark.implicits._

    val repartitioned =
      if (saltPartitions > 0)
        pages.repartition(saltPartitions, pmod(xxhash64(col("url")), lit(saltPartitions)))
      else pages

    val cellsAcc = spark.sparkContext.longAccumulator("graft.align.cellsFilled")
    val docsAcc = spark.sparkContext.longAccumulator("graft.align.docsAligned")

    repartitioned.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      // one reusable DP workspace + syllable memo per partition: no
      // per-document buffer churn, repeated vocabulary syllabified once
      val ws = new graft.align.NeedlemanWunsch.Workspace
      val sylCache = new Syllabify.Cache
      it.map { p =>
        val r = AlignKernel.process(p.text, p.html, scoring, ws = ws, sylCache = sylCache)
        cellsAcc.add(r.cellsFilled)
        docsAcc.add(1)
        AlignedDoc(
          url = p.url,
          n_spans = r.spans.length,
          spans = r.spans.iterator.zipWithIndex.map { case (s, i) =>
            SpanCols(i, s.syl, s.ulx, s.uly, s.lrx, s.lry)
          }.toSeq,
          partition_id = pid,
          tra_len = r.traAlign.length,
          ocr_len = r.ocrAlign.length,
          edit_distance = r.editDistance,
          gap_count = r.gapCount,
          band_width = r.bandUsed,
          cells_filled = r.cellsFilled,
          error = r.error)
      }
    }
  }

  /** Flat spans under SEVERAL scoring systems in ONE kernel pass:
    * (system, url, seq, syl, ulx, uly, lrx, lry). Pages are scanned,
    * synthesized and HTML-extracted once; only the DP re-runs per system —
    * the evaluation queries' shape (GT scoring vs candidate scoring of the
    * same corpus) without aligning the corpus twice.
    */
  def spansMulti(
      pages: Dataset[Page],
      systems: Seq[(String, Scoring)],
      saltPartitions: Int = 0): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._

    val repartitioned =
      if (saltPartitions > 0)
        pages.repartition(saltPartitions, pmod(xxhash64(col("url")), lit(saltPartitions)))
      else pages

    repartitioned.mapPartitions { it =>
      val ws = new graft.align.NeedlemanWunsch.Workspace
      val sylCache = new Syllabify.Cache
      it.flatMap { p =>
        AlignKernel.processMulti(p.text, p.html, systems, ws, sylCache).iterator.flatMap {
          case (system, r) =>
            r.spans.iterator.zipWithIndex.map { case (s, i) =>
              (system, p.url, i, s.syl, s.ulx, s.uly, s.lrx, s.lry)
            }
        }
      }
    }.toDF("system", "url", "seq", "syl", "ulx", "uly", "lrx", "lry")
  }

  /** Flat spans table: (url, seq, syl, ulx, uly, lrx, lry). */
  def spans(aligned: Dataset[AlignedDoc]): DataFrame = spansDf(aligned.toDF())

  /** [[spans]] over an untyped aligned table (the session-memoized cached
    * form — the typed plan's accumulator closures make every align() call
    * plan-unique, so sharing kernel output across queries requires sharing
    * the DataFrame itself).
    */
  def spansDf(aligned: DataFrame): DataFrame =
    aligned
      .select(col("url"), explode(col("spans")).as("s"))
      .select(col("url"), col("s.seq").as("seq"), col("s.syl").as("syl"),
        col("s.ulx").as("ulx"), col("s.uly").as("uly"),
        col("s.lrx").as("lrx"), col("s.lry").as("lry"))

  /** Per-document metrics/lineage side table. */
  def metrics(aligned: Dataset[AlignedDoc]): DataFrame = metricsDf(aligned.toDF())

  /** [[metrics]] over an untyped aligned table. */
  def metricsDf(aligned: DataFrame): DataFrame =
    aligned.drop("spans")
}
