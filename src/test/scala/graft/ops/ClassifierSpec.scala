package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class ClassifierSpec extends AnyFunSuite {

  test("stand-in weights are dyadic multiples of 2^-10 in (-1, 1)") {
    (0 until 4096).foreach { b =>
      val w = Classifier.weight(b)
      assert(w >= -1.0 && w < 1.0)
      val scaled = w * 1024.0
      assert(scaled == math.rint(scaled), s"bucket $b weight $w not dyadic")
    }
  }

  test("logit is exactly order-invariant (dyadic sums)") {
    val text = (1 to 300).map(i => s"tok${i % 50}").mkString(" ")
    val base = Classifier.scoreText(1L, text).logit
    // re-sum the same bucket counts in several shuffled orders; dyadic
    // terms must reproduce the identical double every time
    val toks = text.split(" ")
    val counts = new scala.collection.mutable.HashMap[Int, Int]()
    def bucket(f: String): Int = (Dedup.stringHash64(f) & (Classifier.Dim - 1)).toInt
    toks.indices.foreach { i =>
      counts(bucket(toks(i))) = counts.getOrElse(bucket(toks(i)), 0) + 1
      if (i + 1 < toks.length) {
        val b = bucket(toks(i) + " " + toks(i + 1))
        counts(b) = counts.getOrElse(b, 0) + 1
      }
    }
    val entries = counts.toSeq
    Seq(entries, entries.reverse, entries.sortBy(_._1), entries.sortBy(-_._2)).foreach { order =>
      val logit = order.foldLeft(Classifier.Bias) { case (acc, (b, c)) =>
        acc + c * Classifier.weight(b)
      }
      assert(logit == base, "summation order changed the logit bits")
    }
  }

  test("empty and null text score exactly the bias, labeled drop") {
    assert(Classifier.scoreText(1L, "").logit == Classifier.Bias)
    assert(Classifier.scoreText(1L, null).logit == Classifier.Bias)
    assert(Classifier.scoreText(1L, null).label == "drop")
    assert(Classifier.scoreText(1L, "").nFeatures == 0)
  }

  test("label threshold is logit >= 0") {
    val s = Classifier.scoreText(7L, "some words here for scoring today")
    assert(s.label == (if (s.logit >= 0.0) "keep" else "drop"))
  }

  test("bigrams contribute: reordering tokens changes the logit") {
    val a = Classifier.scoreText(1L, "alpha beta gamma").logit
    val b = Classifier.scoreText(1L, "gamma beta alpha").logit
    // unigram multiset identical; only bigram features differ
    assert(a != b)
  }
}
