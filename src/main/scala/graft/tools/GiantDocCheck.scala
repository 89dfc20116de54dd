package graft.tools

import graft.align.{AlignKernel, CharBox, NeedlemanWunsch}

/** Giant-document policy check at the MaxAlignChars ceiling (VERDICT r1 #8):
  * a 100k×100k pair of UNRELATED strings (no band can reach agreement) must
  * terminate without a `require` crash, returning either a full-matrix
  * result (if m small enough), a band-capped result, or a marked drop.
  *
  * Run: sbt "runMain graft.tools.GiantDocCheck [chars=100000]"
  */
object GiantDocCheck {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100000
    val rngA = new graft.pipeline.PageGen.Rng(1L)
    val rngB = new graft.pipeline.PageGen.Rng(2L)
    def randText(rng: graft.pipeline.PageGen.Rng, len: Int): String = {
      val sb = new java.lang.StringBuilder(len)
      var i = 0
      while (i < len) {
        sb.append(if (rng.nextDouble() < 0.15) ' '
          else ('a' + rng.nextInt(26)).toChar)
        i += 1
      }
      sb.toString
    }
    val tra = randText(rngA, n)
    val stream = randText(rngB, n).zipWithIndex.map { case (c, k) => CharBox.at(c, k) }.toVector

    val t0 = System.nanoTime()
    val r = AlignKernel.processStream(tra, stream,
      ws = new NeedlemanWunsch.Workspace)
    val sec = String.format(java.util.Locale.ROOT, "%.1f",
      Double.box((System.nanoTime() - t0) / 1e9))
    println(s"""{"bench":"giant_doc","chars":$n,"sec":$sec,"band_used":${r.bandUsed},"cells":${r.cellsFilled},"n_spans":${r.spans.length},"note":"${r.error}"}""")
  }
}
