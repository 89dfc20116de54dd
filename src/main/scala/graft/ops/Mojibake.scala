package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}
import java.nio.ByteBuffer

/** Mojibake repair (ftfy-lite): crawled pages frequently carry UTF-8 bytes
  * that were decoded as Latin-1 somewhere upstream ("café" → "cafÃ©").
  * The repair re-encodes the text as Latin-1 and strictly re-decodes as
  * UTF-8; it applies ONLY when the full round-trip succeeds, so clean text
  * containing genuine Latin-1-range letters is untouched (a bare 'é'
  * cannot start a valid UTF-8 sequence, the strict decode fails, the text
  * passes through). Two passes repair double-encoded mojibake. Latin-1 is
  * used rather than ftfy's "sloppy cp1252" because it is total on
  * [0,0xFF] and engine-independent — the deliberate trade is that
  * mojibake containing cp1252-only glyphs (€, ", ') stays unrepaired
  * rather than risking divergent sloppy-decode tables.
  *
  * Deterministic per-row pure function; the DataFrame form is one
  * map-only pass (no shuffle — the 100 TB shape is a scan). The
  * theoretical false-repair case — clean text whose Latin-1 bytes happen
  * to BE valid UTF-8 (a lead-byte-shaped char followed by exactly
  * continuation-shaped chars) — is fundamental to any encoding guesser;
  * fixture rows pin the guard behavior on bare accented chars.
  */
object Mojibake {

  /** One strict latin1→utf8 round-trip, or None when it cannot apply. */
  private def roundTrip(s: String): Option[String] = {
    // latin-1 encode is total iff every char ≤ 0xFF
    var i = 0
    var hasLead = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c > 0xFF) return None
      // a repairable string must contain a UTF-8 lead-byte-shaped char
      if (c >= 0xC2 && c <= 0xF4) hasLead = true
      i += 1
    }
    if (!hasLead) return None
    val bytes = new Array[Byte](s.length)
    i = 0
    while (i < s.length) { bytes(i) = s.charAt(i).toByte; i += 1 }
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try Some(dec.decode(ByteBuffer.wrap(bytes)).toString)
    catch { case _: CharacterCodingException => None }
  }

  /** Repair up to two encoding layers; identity when nothing applies. */
  def fixText(s: String): String = {
    if (s == null) return null
    var r = s
    var pass = 0
    while (pass < 2) {
      roundTrip(r) match {
        case Some(d) if d != r => r = d; pass += 1
        case _ => return r
      }
    }
    r
  }

  /** (doc_id, text) → (doc_id, fixed_text, was_mojibake). */
  def fix(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) =>
        val f = fixText(t)
        (id, f, t != null && f != t)
      }.toDF("doc_id", "fixed_text", "was_mojibake")
  }
}
