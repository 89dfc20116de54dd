package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class BlocklistSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def scanOf(text: String, phrases: Seq[String]): (Int, Int) = {
    val byLen = phrases.iterator.map(Blocklist.tokensOf)
      .filter(_.nonEmpty).map(_.mkString(" ")).toSet
      .groupBy((k: String) => k.count(_ == ' ') + 1)
    val (n, hit) = Blocklist.scan(Blocklist.tokensOf(text), byLen)
    (n, hit.size)
  }

  test("scan: token-boundary hits, overlaps, folding, multi-length") {
    val ps = Seq("bad", "very bad", "so very bad indeed")
    // token boundary: "badge" does not hit "bad"
    assert(scanOf("a badge is fine", ps) === ((0, 0)))
    assert(scanOf("bad", ps) === ((1, 1)))
    // overlapping hits all count: "very bad" contains "bad" too
    assert(scanOf("very bad", ps) === ((2, 2)))
    assert(scanOf("so very bad indeed", ps) === ((3, 3)))
    // repeated hits accumulate n_matches, not n_phrases
    assert(scanOf("bad bad bad", ps) === ((3, 1)))
    // ASCII case folding on both sides
    assert(scanOf("VERY Bad", Seq("very BAD")) === ((1, 1)))
    // multiple spaces tokenize away
    assert(scanOf("very   bad", ps) === ((2, 2)))
    // empty / null-ish
    assert(scanOf("", ps) === ((0, 0)))
    assert(scanOf("clean text entirely", ps) === ((0, 0)))
  }

  test("matchCounts: verdict threshold, null text kept, duplicates collapse") {
    import spark.implicits._
    val docs = Seq(
      (1L, "bad bad bad"), // 3 hits > maxMatches=2 -> drop
      (2L, "one bad word"), // 1 hit -> keep
      (3L, null.asInstanceOf[String]), // null text -> 0 hits, keep
      (4L, "spark is clean here")) // folding phrase "SPARK" hits
      .toDF("doc_id", "text")
    val out = Blocklist.matchCounts(docs,
      Seq("bad", "BAD", "SPARK"), maxMatches = 2) // duplicate fold: one key
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
      r.getBoolean(3))).toSeq === Seq(
      (1L, 3, 1, false), (2L, 1, 1, true),
      (3L, 0, 0, true), (4L, 1, 1, true)))
  }
}
