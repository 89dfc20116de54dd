package graft.tools

import graft.align.{CleanText, ExtractHtml}
import graft.pipeline.PageGen
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `transcript \t extractedNoisyStream` cases for the differential
  * suite: exactly what the Spark pipeline feeds the kernel, derived from the
  * driver's documents table through the deterministic page generator and the
  * HTML extractor. The reference oracle (see .claude/skills/verify/SKILL.md)
  * is run ONCE offline over this file; its output is committed as the T2
  * golden (no runtime Python dependency).
  *
  * Docs containing a vowel-less transcript word are skipped — they hang the
  * reference (latinSyllabification.py:71-105), see FIXTURES.md §4.
  */
object DumpCases {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, nStr, outPath) = args
    val n = nStr.toInt
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang").as[(Long, String, String)]
      .orderBy("doc_id").take(n)

    val vowels = "aeiouy".toSet
    val sb = new java.lang.StringBuilder()
    var kept = 0
    for ((id, text, lang) <- rows) {
      val page = PageGen.pageFor(id, text, lang)
      val transcript = CleanText.clean(page.text)
      val noisy = ExtractHtml.extractText(page.html)
      val hazard = transcript.split(" ").exists(w => w.nonEmpty && !w.exists(vowels))
      if (!hazard) {
        sb.append(transcript).append('\t').append(noisy).append('\n')
        kept += 1
      }
    }
    Files.writeString(Paths.get(outPath), sb.toString)
    println(s"wrote $kept cases to $outPath")
    spark.stop()
  }
}
