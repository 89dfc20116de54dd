package graft.tools

import graft.align._

/** Offline sweep: disagreement rate of k-way doubling-agreement banded DP vs
  * the exact token kernel, per scoring family and agreement strength.
  */
object BandSweep {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5000
    val agree = if (args.length > 1) args(1).toInt else 2
    val rng = new java.util.Random(42)
    def randStr(maxLen: Int): String = {
      val len = rng.nextInt(maxLen)
      val sb = new StringBuilder
      for (_ <- 0 until len)
        sb.append(if (rng.nextInt(10) < 2) ' ' else ('a' + rng.nextInt(5)).toChar)
      sb.toString
    }
    def bandedK(a: String, b: String, sc: Scoring, b0: Int, k: Int): (String, String) = {
      // k consecutive agreeing bands required
      val m = b.length + 1
      var band = math.max(1, b0)
      var streak = 0
      var prev: Option[(String, String)] = None
      while (true) {
        val r = NeedlemanWunsch.alignCharsBanded(a, b, sc, band) // 2-way inside
        val cur = Some((r.traAlign, r.ocrAlign))
        if (r.bandUsed == 0) return cur.get // reached full
        if (cur == prev) { streak += 1; if (streak >= k - 1) return cur.get }
        else streak = 0
        prev = cur
        band = band * 2
        if (band >= m) {
          val rf = NeedlemanWunsch.alignCharsFull(a, b, sc)
          return (rf.traAlign, rf.ocrAlign)
        }
      }
      throw new IllegalStateException
    }
    def run(name: String, scGen: () => Scoring, cases: Int, b0: () => Int): Unit = {
      var fail = 0
      for (_ <- 0 until cases) {
        val a = randStr(60); val b = randStr(60)
        val sc = scGen()
        val (ta, oa) = NeedlemanWunsch.alignTokens(
          a.map(_.toString).toVector, b.map(_.toString).toVector, sc)
        val got = bandedK(a, b, sc, b0(), agree)
        if (got._1 != ta.mkString || got._2 != oa.mkString) fail += 1
      }
      println(s"$name agree=$agree: $fail/$cases disagree")
    }
    run("default-scoring-smallband", () => Scoring.Default, n, () => Seq(1,2,5,16)(rng.nextInt(4)))
    run("default-scoring-band16", () => Scoring.Default, n, () => 16)
    run("any-scoring-band16", () => Scoring(
      1 + rng.nextInt(12), -1 - rng.nextInt(12),
      -rng.nextInt(10), -rng.nextInt(10),
      -rng.nextInt(6), -rng.nextInt(6)), n, () => 16)
    var fail = 0
    for (i <- 0 until n) {
      val words = Array("alleluia", "dominus", "gloria", "sanctus", "benedictus", "meus", "dixit")
      val t = Array.fill(30 + rng.nextInt(60))(words(rng.nextInt(words.length))).mkString(" ")
      val noisy = graft.pipeline.PageGen.noisyRender(t, rng.nextLong())
      val (ta, oa) = NeedlemanWunsch.alignTokens(
        t.map(_.toString).toVector, noisy.map(_.toString).toVector)
      val got = bandedK(t, noisy, Scoring.Default, 64, agree)
      if (got._1 != ta.mkString || got._2 != oa.mkString) fail += 1
    }
    println(s"realistic-default-band64 agree=$agree: $fail/$n disagree")
  }
}
