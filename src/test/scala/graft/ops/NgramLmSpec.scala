package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class NgramLmSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("log2Portable tracks log2 within the documented series error") {
    val xs = Seq(1e-12, 1e-6, 0.001, 0.25, 0.5, 0.75, 0.999999, 1.0, 1.5,
      1.9999999, 2.0, 3.14159, 1e6)
    xs.foreach { x =>
      val err = math.abs(NgramLm.log2Portable(x) - math.log(x) / math.log(2.0))
      assert(err < 5e-8, s"x=$x err=$err")
    }
    assert(NgramLm.log2Portable(1.0) === 0.0)
    assert(NgramLm.log2Portable(0.5) === -1.0)
    assertThrows[IllegalArgumentException](NgramLm.log2Portable(0.0))
    assertThrows[IllegalArgumentException](NgramLm.log2Portable(-1.0))
  }

  test("train counts unigrams, bigrams and contexts exactly") {
    import spark.implicits._
    val ref = Seq((1L, "a b a b c"), (2L, "a b")).toDF("doc_id", "text")
    val m = NgramLm.train(ref)
    assert(m.unigram === Map("a" -> 3L, "b" -> 3L, "c" -> 1L))
    assert(m.bigram === Map(
      ("a", "b") -> 3L, ("b", "a") -> 1L, ("b", "c") -> 1L))
    assert(m.ctx === Map("a" -> 3L, "b" -> 2L))
    assert(m.v === 4L) // 3 vocab + unk
  }

  test("OOV tokens score through smoothing alone") {
    import spark.implicits._
    val m = NgramLm.train(Seq((1L, "a b a b")).toDF("doc_id", "text"))
    // 'z y' is fully OOV: each transition costs -log2(1 / (0 + V))
    val (n, bits) = NgramLm.scoreText("z y x", m)
    assert(n === 3)
    val per = -NgramLm.log2Portable(1.0 / m.v.toDouble)
    assert(bits === per * 2)
    // seen bigram is cheaper than an unseen one
    val (_, seen) = NgramLm.scoreText("a b", m)
    val (_, unseen) = NgramLm.scoreText("b b", m)
    assert(seen < unseen)
  }

  test("empty and single-token docs bucket as empty with zero bits") {
    import spark.implicits._
    val d = Seq((1L, ""), (2L, "solo"), (3L, "a b a b")).toDF("doc_id", "text")
    val m = NgramLm.train(d.filter($"doc_id" === 3L))
    val rows = NgramLm.score(d, m, headBelow = 1.0, tailFrom = 3.0)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(4)))
    assert(rows(0) === ((1L, 0, "empty")))
    assert(rows(1) === ((2L, 1, "empty")))
    assert(rows(2)._3 !== "empty")
  }

  test("over-cap model degrades by min-count pruning (KenLM behavior)") {
    import spark.implicits._
    // "a a a a b b x" per doc + one singleton doc: counts a=12, b=6, x=3,
    // y=1; bigrams (a,a)=9, (a,b)=3, (b,b)=3, (b,x)=3, (x,y)=1 ... entries
    // total well over a cap of 4 -> threshold rises until <=4 survive
    val ref = Seq((1L, "a a a a b b x"), (2L, "a a a a b b x"),
      (3L, "a a a a b b x y")).toDF("doc_id", "text")
    val m = NgramLm.train(ref, maxModelEntries = 4L)
    assert(m.minCount > 1L)
    assert(m.unigram.size + m.bigram.size <= 4)
    assert(m.unigram.values.forall(_ >= m.minCount))
    assert(m.bigram.values.forall(_ >= m.minCount))
    // ctx sums derive from the KEPT bigrams only
    assert(m.ctx === m.bigram.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap)
    // an under-cap model is untouched (threshold 1)
    assert(NgramLm.train(ref, maxModelEntries = 1000L).minCount === 1L)
  }

  test("pruneThreshold: smallest t with <= cap survivors") {
    // hist: count 1 x5, count 2 x3, count 7 x2
    val h = Map(1L -> 5L, 2L -> 3L, 7L -> 2L)
    assert(NgramLm.pruneThreshold(h, 10L) === 1L) // all 10 fit
    assert(NgramLm.pruneThreshold(h, 9L) === 2L)  // drop c=1 -> 5 left
    assert(NgramLm.pruneThreshold(h, 4L) === 3L)  // drop c<=2 -> 2 left
    assert(NgramLm.pruneThreshold(h, 1L) === 8L)  // drop everything
    assert(NgramLm.pruneThreshold(Map.empty, 0L) === 1L)
  }

  // ==== Kneser-Ney trigram ====

  private def knModel(texts: Seq[String]): NgramLm.KnModel = {
    import spark.implicits._
    NgramLm.trainKn(texts.toDF("text"))
  }

  test("KN derived tables match hand counts") {
    val m = knModel(Seq("a b c a b d", "a b c e", "x y"))
    assert(m.tri === Map(("a", "b", "c") -> 2L, ("a", "b", "d") -> 1L,
      ("b", "c", "a") -> 1L, ("b", "c", "e") -> 1L, ("c", "a", "b") -> 1L))
    assert(m.s3 === Map(("a", "b") -> 3L, ("b", "c") -> 2L, ("c", "a") -> 1L))
    assert(m.t3 === Map(("a", "b") -> 2L, ("b", "c") -> 2L, ("c", "a") -> 1L))
    assert(m.mid === Map(("a", "b") -> 1L, ("b", "c") -> 1L,
      ("b", "d") -> 1L, ("c", "a") -> 1L, ("c", "e") -> 1L))
    assert(m.midCtx === Map("a" -> 1L, "b" -> 2L, "c" -> 2L))
    assert(m.midU === Map("a" -> 1L, "b" -> 2L, "c" -> 2L))
    assert(m.contUni === Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L,
      "e" -> 1L, "y" -> 1L))
    assert(m.bTypes === 6L && m.v === 7L)
    // pinned-arithmetic point values (computed independently by the mirror)
    assert(NgramLm.knP3(Some("a"), Some("b"), Some("c"), m)
      === 0.5327380952380952)
    assert(NgramLm.knP3(Some("a"), Some("b"), None, m)
      === 0.026785714285714284)
    assert(NgramLm.knP2(Some("b"), Some("c"), m) === 0.23214285714285715)
    assert(NgramLm.scoreTextKn("a b c a b q z", m)
      === ((7, 12.628888647850298)))
  }

  test("KN: every level sums to exactly 1 over vocab + unk") {
    val m = knModel(Seq("a b c a b d", "a b c e", "x y"))
    val events: Seq[Option[String]] =
      m.vocab.toSeq.sorted.map(Some(_)) :+ None
    def close(x: Double) = math.abs(x - 1.0) < 1e-12
    assert(close(events.map(c => NgramLm.knP1(c, m)).sum))
    for (b <- Seq(Some("a"), Some("b"), Some("x"), Some("zz"), None))
      assert(close(events.map(c => NgramLm.knP2(b, c, m)).sum), s"p2 ctx $b")
    for ((a, b) <- Seq((Some("a"), Some("b")), (Some("b"), Some("c")),
        (Some("x"), Some("y")), (None, Some("b")), (Some("zz"), Some("q"))))
      assert(close(events.map(c => NgramLm.knP3(a, b, c, m)).sum),
        s"p3 ctx ($a,$b)")
  }

  test("KN: unseen contexts back off; short docs score zero transitions") {
    val m = knModel(Seq("a b c a b d"))
    // context (x, y) unseen -> p3 == p2(y, .) -> mid_ctx(y)=0 -> p1
    assert(NgramLm.knP3(Some("x"), Some("y"), Some("c"), m)
      === NgramLm.knP1(Some("c"), m))
    assert(NgramLm.scoreTextKn("a b", m) === ((2, 0.0)))
    assert(NgramLm.scoreTextKn("", m) === ((0, 0.0)))
    assert(NgramLm.scoreTextKn(null, m) === ((0, 0.0)))
  }

  test("over-cap KN model prunes all three levels with one threshold") {
    import spark.implicits._
    // 15 entries; cap 9 -> drop count-1 (z,q,(z,q)) then count-3 (d,
    // (a,b,d),(b,d)) -> 9 survivors at threshold 4: the repeated a-b-c
    // spine only
    val texts = Seq.fill(3)("a b c a b c a b d") :+ "z q"
    val m = NgramLm.trainKn(texts.toDF("text"), maxModelEntries = 9L)
    assert(m.vocab === Set("a", "b", "c"))
    assert(m.tri.values.forall(_ >= 4L))
    assert(m.biTypes.forall { case (x, y) =>
      Set("a", "b", "c").contains(x) || Set("a", "b", "c").contains(y) })
    // pruned-model distributions still sum to exactly 1 over vocab+unk
    val events: Seq[Option[String]] =
      m.vocab.toSeq.sorted.map(Some(_)) :+ None
    val s1 = events.map(c => NgramLm.knP1(c, m)).sum
    assert(math.abs(s1 - 1.0) < 1e-12, s"p1 sums to $s1")
    val s2 = events.map(c => NgramLm.knP2(Some("a"), c, m)).sum
    assert(math.abs(s2 - 1.0) < 1e-12, s"p2 sums to $s2")
    val s3 = events.map(c => NgramLm.knP3(Some("a"), Some("b"), c, m)).sum
    assert(math.abs(s3 - 1.0) < 1e-12, s"p3 sums to $s3")
  }
}
