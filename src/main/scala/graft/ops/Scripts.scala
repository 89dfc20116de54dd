package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Writing-system (script) mix detection — the langid adjunct every
  * multilingual pipeline runs: language-ID models are script-gated first
  * (a fasttext-style model never sees a Han doc through its Latin
  * n-grams), and mixed-script pages (navigation chrome in one script,
  * content in another; spam keyword stuffing) need flagging before
  * per-language routing.
  *
  * Pinned spec (mirrored as `sc_mix` in graftpy.py):
  *   - script of a code point = the FIRST matching range below; points
  *     outside every range are not letters and are not counted:
  *       latin    0x41–0x5A, 0x61–0x7A, 0xC0–0x2AF
  *       greek    0x370–0x3FF
  *       cyrillic 0x400–0x4FF
  *       arabic   0x600–0x6FF
  *       han      0x3400–0x4DBF, 0x4E00–0x9FFF
  *   - dominant = the script with the max count (ties: script NAME in
  *     ASCII order; zero letters → "none").
  *   - is_mixed = 5·second_count ≥ dominant_count (the second script
  *     carries ≥ 20% of the dominant's mass) — integer comparison.
  *
  * Map-only per-row kernel, no shuffle — the extraction-tier contract.
  */
object Scripts {

  private val Names = Array("arabic", "cyrillic", "greek", "han", "latin")

  /** counts indexed like Names (the ASCII-sorted order, so the dominant
    * tie-break is a plain first-max scan).
    */
  private[ops] def countScripts(text: String): Array[Long] = {
    val c = new Array[Long](5)
    if (text == null) return c
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if ((cp >= 0x41 && cp <= 0x5A) || (cp >= 0x61 && cp <= 0x7A) ||
        (cp >= 0xC0 && cp <= 0x2AF)) c(4) += 1
      else if (cp >= 0x370 && cp <= 0x3FF) c(2) += 1
      else if (cp >= 0x400 && cp <= 0x4FF) c(1) += 1
      else if (cp >= 0x600 && cp <= 0x6FF) c(0) += 1
      else if ((cp >= 0x3400 && cp <= 0x4DBF) || (cp >= 0x4E00 && cp <= 0x9FFF))
        c(3) += 1
      i += Character.charCount(cp)
    }
    c
  }

  /** (doc_id, per-script counts, n_letters, dominant_script, is_mixed). */
  def detect(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text"))
      .filter(col("doc_id").isNotNull)
      .as[(Long, String)]
      .map { case (id, text) =>
        val c = countScripts(text)
        var domI = 0
        var i = 1
        while (i < 5) { if (c(i) > c(domI)) domI = i; i += 1 }
        var secondC = 0L
        i = 0
        while (i < 5) { if (i != domI && c(i) > secondC) secondC = c(i); i += 1 }
        val total = c.sum
        val dom = if (total == 0L) "none" else Names(domI)
        val mixed = total > 0L && 5L * secondC >= c(domI)
        (id, c(0), c(1), c(2), c(3), c(4), total, dom, mixed)
      }
      .toDF("doc_id", "n_arabic", "n_cyrillic", "n_greek", "n_han",
        "n_latin", "n_letters", "dominant_script", "is_mixed")
  }
}
