package graft.tools

import graft.align._
import graft.pipeline.PageGen

/** Large-document checks: banded vs full exactness above the full-matrix
  * threshold, and extraction robustness/latency on MB-scale HTML.
  */
object LargeDocCheck {
  def main(args: Array[String]): Unit = {
    val words = Array("alleluia", "dominus", "gloria", "sanctus", "benedictus",
      "meus", "dixit", "window", "stream", "batch")
    val rng = new java.util.Random(11)

    // 6k-char pair: above FullMatrixCellThreshold → production path is banded
    val t = Array.fill(1000)(words(rng.nextInt(words.length))).mkString(" ")
    val noisy = PageGen.noisyRender(t, 99L)
    println(s"lens: tra=${t.length} noisy=${noisy.length} cells=${t.length.toLong * noisy.length}")

    val t0 = System.nanoTime()
    val banded = NeedlemanWunsch.alignCharsBanded(t, noisy)
    val tb = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val full = NeedlemanWunsch.alignCharsFull(t, noisy, Scoring.Default)
    val tf = (System.nanoTime() - t1) / 1e9
    val same = banded.traAlign == full.traAlign && banded.ocrAlign == full.ocrAlign
    println(f"banded(band=${banded.bandUsed}, cells=${banded.cellsFilled}) $tb%.2fs vs " +
      f"full(cells=${full.cellsFilled}) $tf%.2fs identical=$same speedup=${tf / tb}%.1fx")
    require(same, "BANDED != FULL on large doc")

    // extraction on ~1MB of script-heavy HTML
    val sb = new StringBuilder("<html><head>")
    for (i <- 0 until 2000) sb.append(s"<script>var x$i = '<div>${i}</div>';</script>")
    sb.append("</head><body>")
    for (i <- 0 until 500) sb.append(s"<p>chunk $i ${words(i % words.length)}</p><style>.a$i{}</style>")
    sb.append("</body></html>")
    val html = sb.toString.getBytes("UTF-8")
    val t2 = System.nanoTime()
    val extracted = ExtractHtml.extractText(html)
    val te = (System.nanoTime() - t2) / 1e9
    println(f"extract ${html.length} bytes -> ${extracted.length} chars in $te%.2fs")
    require(!extracted.contains("var x"), "script leaked into extraction")
  }
}
