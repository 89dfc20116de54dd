package graft.tools

import graft.align._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Dev/verification CLI for the pure-Scala kernel (no Spark).
  *
  * Usage: KernelCli <in.tsv> <out.tsv>
  * Input lines:  transcript \t noisyStream
  * Output lines: traAlign \t ocrAlign \t syl,syl,... \t syl:ulx:uly:lrx:lry;...
  *
  * The noisy stream gets unit char boxes (offset k ⇒ (k,0)-(k+1,1)), matching
  * the web-text degeneration used across the test suites.
  */
object KernelCli {
  def main(args: Array[String]): Unit = {
    val Array(inPath, outPath) = args
    val out = new java.lang.StringBuilder()
    for (line <- Files.readAllLines(Paths.get(inPath)).asScala) {
      if (line.nonEmpty) {
        val parts = line.split("\t", -1)
        val transcript = parts(0)
        val noisy = if (parts.length > 1) parts(1) else ""
        val stream = noisy.zipWithIndex.map { case (c, k) => CharBox.at(c, k) }.toVector
        val r = AlignKernel.processStream(transcript, stream)
        val syls = Syllabify.syllabifyText(transcript).mkString(",")
        val spans = r.spans.map(s => s"${s.syl}:${s.ulx}:${s.uly}:${s.lrx}:${s.lry}").mkString(";")
        out.append(r.traAlign).append('\t').append(r.ocrAlign).append('\t')
          .append(syls).append('\t').append(spans).append('\n')
      }
    }
    Files.writeString(Paths.get(outPath), out.toString)
  }
}
