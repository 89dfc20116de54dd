package graft.tools
import graft.align._
object AbbrevStress {
  def main(args: Array[String]): Unit = {
    val dense = "^" * 50000
    val stream = dense.zipWithIndex.map { case (c, k) => CharBox.at(c, k) }.toVector
    val t0 = System.nanoTime()
    val out = Abbrev.expand(stream)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"dense ^x50000 expanded to ${out.length} boxes in $sec%.2f s")
    // small-size equivalence with the literal algorithm
    val small = ("^" * 300).zipWithIndex.map { case (c, k) => CharBox.at(c, k) }.toVector
    assert(Abbrev.expand(small) == Abbrev.expandLiteral(small))
    println("literal equivalence at 300 chars: OK")
  }
}
