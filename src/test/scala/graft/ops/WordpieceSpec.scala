package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pinned-spec contract of the WordPiece trainer/encoder: hand-computed
  * likelihood-gain argmaxes (including the double-score tie broken in
  * code-point order) and the greedy longest-match / whole-word-UNK
  * inference rules.
  */
class WordpieceSpec extends AnyFunSuite {

  test("wordSyms: first bare, rest ##-prefixed, code points intact") {
    assert(Wordpiece.wordSyms("aab").toSeq === Seq("a", "##a", "##b"))
    assert(Wordpiece.wordSyms("a😀b").toSeq ===
      Seq("a", "##😀", "##b"))
  }

  test("trainLocal: hand-computed scores and code-point tie-break") {
    // {"aab": 2, "ab": 3}: round 1 scores
    //   (a,##a)   2/(5*2) = 0.2
    //   (##a,##b) 2/(2*5) = 0.2   <- tie; "##a" < "a" wins
    //   (a,##b)   3/(5*5) = 0.12
    val words = Seq(
      (Wordpiece.wordSyms("aab"), 2L),
      (Wordpiece.wordSyms("ab"), 3L))
    val ms = Wordpiece.trainLocal(words, 2)
    assert(ms.head === Wordpiece.Merge(1, "##a", "##b", "##ab", 2L, 2L, 5L))
    // round 2: (a,##ab) 2/(5*2) = 0.2 ties (a,##b) 3/(5*3) = 0.2;
    // same left, "##ab" < "##b" wins
    assert(ms(1) === Wordpiece.Merge(2, "a", "##ab", "aab", 2L, 5L, 2L))
  }

  test("applyMergeWp is left-to-right non-overlapping and emits the token") {
    val s = Array("x", "##y", "##y", "##y")
    assert(Wordpiece.applyMergeWp(s, "##y", "##y", "##yy").toSeq ===
      Seq("x", "##yy", "##y"))
  }

  test("encodeWord: greedy longest match, continuation prefixes") {
    val m = Wordpiece.Model(Set("a", "##a", "##b", "##ab", "aab"), Seq.empty)
    assert(Wordpiece.encodeWord("aab", m) === Seq("aab"))
    assert(Wordpiece.encodeWord("ab", m) === Seq("a", "##b"))
    assert(Wordpiece.encodeWord("aaab", m) === Seq("a", "##a", "##ab"))
  }

  test("encodeWord: any miss makes the whole word [UNK]") {
    val m = Wordpiece.Model(Set("a", "##b"), Seq.empty)
    assert(Wordpiece.encodeWord("az", m) === Seq(Wordpiece.Unk))
    assert(Wordpiece.encodeWord("za", m) === Seq(Wordpiece.Unk))
  }
}
