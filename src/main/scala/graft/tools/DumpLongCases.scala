package graft.tools

import graft.align.{CleanText, ExtractHtml}
import graft.pipeline.PageGen
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump LONG differential cases (transcripts above the full-matrix cell
  * threshold, so the production banded path engages) by concatenating
  * documents. Same TSV contract as DumpCases.
  */
object DumpLongCases {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outPath) = args
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].orderBy("doc_id").take(60).map(_._2)
    val vowels = "aeiouy".toSet
    val sb = new java.lang.StringBuilder()
    for (i <- 0 until 4) {
      val t = CleanText.clean(texts.slice(i * 15, (i + 1) * 15).mkString(" "))
      val noisy = ExtractHtml.cleanStream(PageGen.noisyRender(t, 7000 + i))
      val hazard = t.split(" ").exists(w => w.nonEmpty && !w.exists(vowels))
      require(!hazard, "vowel-less word would hang the reference")
      sb.append(t).append('\t').append(noisy).append('\n')
    }
    Files.writeString(Paths.get(outPath), sb.toString)
    println("wrote " + outPath)
    spark.stop()
  }
}
