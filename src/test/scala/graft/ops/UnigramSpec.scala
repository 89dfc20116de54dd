package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class UnigramSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("viterbi: max-likelihood segmentation, pinned ties, fallbacks") {
    val sc = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -1.5, "abc" -> -2.0,
      "c" -> -1.0)
    // "ab" as one piece (-1.5) beats a+b (-2.0)
    assert(Unigram.viterbi("ab", sc, 3, -10.0) === IndexedSeq("ab"))
    // "abc" single (-2.0) equals ab+c (-2.5)? no: -2.0 > -2.5 -> single
    assert(Unigram.viterbi("abc", sc, 3, -10.0) === IndexedSeq("abc"))
    // exact tie: scores crafted so a+b == ab -> the SHORTEST last piece
    // wins (L ascending, strict >): path ending in "b" (L=1) is kept
    val tie = Map("a" -> -1.0, "b" -> -0.5, "ab" -> -1.5)
    assert(Unigram.viterbi("ab", tie, 3, -10.0) === IndexedSeq("a", "b"))
    // unknown code point passes through at the floor
    assert(Unigram.viterbi("axb", sc, 3, -10.0) ===
      IndexedSeq("a", "x", "b"))
    // empty word
    assert(Unigram.viterbi("", sc, 3, -10.0) === IndexedSeq.empty)
    // astral code point as its own piece
    val astral = new String(Character.toChars(0x1F600))
    assert(Unigram.viterbi("a" + astral, sc, 3, -10.0) ===
      IndexedSeq("a", astral))
  }

  test("substringFreqs: overlapping occurrences weighted by freq") {
    val m = Unigram.substringFreqs(Seq(("aaa", 2L), ("ab", 1L)), 2)
    assert(m("a") === 7L) // 3 positions x 2 + 1
    assert(m("aa") === 4L) // 2 positions x 2
    assert(m("ab") === 1L && m("b") === 1L)
    assert(!m.contains("aaa")) // maxPieceLen = 2
  }

  test("train: local and distributed paths are bit-identical") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown cat naps under the lazy tree"),
      (3L, "quick quick brown brown the the the"),
      (4L, "packs and packs of quick facts"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val local = Unigram.train(docs, vocabSize = 40, maxPieceLen = 4,
      seedSize = 120, emRounds = 3).collect()
    // force the distributed path by setting the cap below the word count
    val dist = Unigram.train(docs, vocabSize = 40, maxPieceLen = 4,
      seedSize = 120, emRounds = 3, localVocabLimit = 3L).collect()
    assert(local.length === dist.length)
    local.zip(dist).foreach { case (a, b) =>
      assert(a.getInt(0) === b.getInt(0))
      assert(a.getString(1) === b.getString(1))
      assert(a.getLong(2) === b.getLong(2))
      // integer counts -> the doubles are the SAME expressions: bitwise
      assert(java.lang.Double.doubleToLongBits(a.getDouble(3)) ===
        java.lang.Double.doubleToLongBits(b.getDouble(3)))
    }
  }

  test("train -> encode round trip covers the corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha gamma"),
      (2L, "beta beta gamma delta"))
      .toDF("doc_id", "text")
    val trained = Unigram.train(docs, vocabSize = 30, maxPieceLen = 5,
      seedSize = 80, emRounds = 2)
    val out = Unigram.encodeCounts(docs, trained)
      .orderBy("doc_id").collect()
    assert(out.length === 2)
    // every word segments into >= 1 piece; previews join with '|'
    assert(out.forall(_.getInt(1) >= 4))
    assert(out(0).getString(2).split("\\|").nonEmpty)
    // reassembling the preview pieces reproduces a prefix of the text's
    // concatenated words (segmentation is exact, no loss)
    val joined = out(0).getString(2).replace("|", "")
    assert("alphabetaalphagamma".startsWith(joined))
  }
}
