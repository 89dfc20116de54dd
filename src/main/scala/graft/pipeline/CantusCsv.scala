package graft.pipeline

import graft.align.CleanText
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's CSV entry point (`filename_to_text_func`,
  * parse_cantus_csv.py:38-128) — the E2 pipeline's steps 1–2 — as one
  * Catalyst job over the positional-column chant CSV:
  *
  *   scan (O23) → filter Mode=='*' / header-ish rows (O24) →
  *   per-folio sort by int(seq) + combine_transcripts (O26, O11) →
  *   previous folio's LAST chant prepended (O27/O28) → concat (O29) →
  *   clean (O8).
  *
  * Quirks replicated:
  *   - the "previous" of the FIRST folio is the LAST folio
  *     (`mapping[idx - 1]` with Python's negative indexing,
  *     parse_cantus_csv.py:109) — a wrap-around lag;
  *   - `fname.replace('CF-', '')` strips every occurrence
  *     (parse_cantus_csv.py:125);
  *   - no-mapping-file case: seq = position in the sorted distinct folio
  *     list (parse_cantus_csv.py:63-69).
  *
  * Verified byte-identically against the executing reference on a synthetic
  * Cantus-shaped CSV (src/test/resources/cantus_like.csv + cantus_golden.json).
  */
object CantusCsv {

  /** (folio, fname, text) for every folio that has at least one chant with a
    * melody — `folio_to_text` evaluated for the whole table at once.
    */
  def folioTexts(spark: SparkSession, csvPath: String): DataFrame = {
    val combineUdf = udf((std: String, ms: String) =>
      CleanText.combineTranscripts(if (std == null) "" else std, if (ms == null) "" else ms))
    val cleanUdf = udf((s: String) => CleanText.clean(if (s == null) "" else s))

    val raw = spark.read.option("header", "true").csv(csvPath)
    val cn = raw.columns
    def c(i: Int) = col(cn(i))

    // O24: drop chants with no melody and header-ish rows. NULL-SAFE: the
    // CSV reader maps empty fields to null, and Python's csv gives '' —
    // `x[10] == '*'` is False for '', so empty-Mode rows are KEPT
    // (parse_cantus_csv.py:54). A plain =!= would null-drop them.
    val arr = raw.filter(!(c(10) <=> "*") && !(c(2) <=> "folio"))

    // O26 + O11: per folio, chants ordered by int(seq), j/i-repaired.
    // A monotonic input row index reproduces Python's STABLE sort
    // (parse_cantus_csv.py:85): seq ties keep CSV order. (Values of the
    // index differ across parallelism but its ORDER always matches file
    // order, which is all the sort uses.) Non-integer seq casts to null and
    // sorts first with CSV order — the reference raises there; documented
    // deviation.
    val chants = arr.select(
      c(2).as("folio"),
      c(3).cast("int").as("seq"),
      monotonically_increasing_id().as("rid"),
      combineUdf(c(13), c(14)).as("chant"))

    val perFolio = chants
      .groupBy(col("folio"))
      .agg(expr("array_sort(collect_list(struct(seq, rid, chant)))").as("sorted"))
      .select(
        col("folio"),
        expr("array_join(transform(sorted, x -> x.chant), ' ')").as("own_text"),
        // the reference takes the LAST chant of the SORTED list
        // (folio_to_chants[prev_folio][-1], parse_cantus_csv.py:112) — on
        // seq ties that's the last in CSV order, which max_by would not
        // guarantee
        expr("element_at(sorted, -1).chant").as("last_chant"))

    // O28 with the reference's wrap-around: first folio's "previous" is the
    // last folio (Python mapping[idx-1] negative indexing). The lag is the
    // boundary-exchange form (no single-partition window over the folio
    // table); the wrap row is a single-row aggregate.
    val wrapLast = perFolio.agg(max_by(col("last_chant"), col("folio")).as("wrap_last"))
    graft.ops.ScaleWindows
      .withGlobalLag(perFolio, "folio", "last_chant", "prev_last")
      .crossJoin(broadcast(wrapLast))
      .select(
        col("folio"),
        regexp_replace(col("folio"), "CF-", "").as("fname"),
        cleanUdf(concat(coalesce(col("prev_last"), col("wrap_last")),
          lit(" "), col("own_text"))).as("text"))
      .orderBy(col("folio"))
  }
}
