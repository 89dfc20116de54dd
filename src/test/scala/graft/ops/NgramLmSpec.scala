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

  test("model cap fails loudly instead of collecting unbounded state") {
    import spark.implicits._
    val ref = Seq((1L, (1 to 100).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    assertThrows[IllegalArgumentException](
      NgramLm.train(ref, maxModelEntries = 10L))
  }
}
