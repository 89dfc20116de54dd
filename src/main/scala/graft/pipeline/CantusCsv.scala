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

    // O24: drop chants with no melody and header-ish rows
    val arr = raw.filter(c(10) =!= "*" && c(2) =!= "folio")

    // O26 + O11: per folio, chants ordered by int(seq), j/i-repaired
    val chants = arr.select(
      c(2).as("folio"),
      c(3).cast("int").as("seq"),
      combineUdf(c(13), c(14)).as("chant"))

    val perFolio = chants
      .groupBy(col("folio"))
      .agg(
        array_join(expr("transform(array_sort(collect_list(struct(seq, chant))), x -> x.chant)"), " ")
          .as("own_text"),
        max_by(col("chant"), col("seq")).as("last_chant"))

    // O28 with the reference's wrap-around: first folio's "previous" is the
    // last folio (Python mapping[idx-1] negative indexing)
    val w = Window.orderBy(col("folio"))
    val wrapLast = perFolio.orderBy(col("folio").desc).limit(1)
      .select(col("last_chant").as("wrap_last"))
    perFolio
      .withColumn("prev_last", lag(col("last_chant"), 1).over(w))
      .crossJoin(broadcast(wrapLast))
      .select(
        col("folio"),
        regexp_replace(col("folio"), "CF-", "").as("fname"),
        cleanUdf(concat(coalesce(col("prev_last"), col("wrap_last")),
          lit(" "), col("own_text"))).as("text"))
      .orderBy(col("folio"))
  }
}
