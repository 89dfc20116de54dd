package graft.pipeline

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed semantics of the O45 port (writeToMEI.py:41-145) —
  * quirks: group-0 drop, duplicate-span merge, first-max tie, follower
  * inheriting the leader's text. The corpus-scale check is the
  * q_mei_assign golden (reference-executed) in CORRECTNESS.
  */
class MeiAssignSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("group-0 drop, duplicate merge, leader zones (reference quirks)") {
    import spark.implicits._
    val spans = Seq(
      ("u", 0, "al", 0, 0, 2, 1),
      ("u", 1, "le", 3, 0, 5, 1),
      ("u", 2, "lu", 6, 0, 8, 1))
      .toDF("url", "seq", "syl", "ulx", "uly", "lrx", "lry")
    val neumes = Seq(
      ("u", 0, 50, -1, 52, 0), // no collision BEFORE any leader => dropped (group 0)
      ("u", 1, 0, -1, 2, 0),   // wins "al" => leader
      ("u", 2, 0, -1, 2, 0),   // wins "al" again (same span VALUE) => merges into 1
      ("u", 3, 6, -1, 8, 0),   // wins "lu" => new leader
      ("u", 4, 50, -1, 52, 0)) // no collision AFTER a leader => follower of 3
      .toDF("url", "elem_seq", "ulx", "uly", "lrx", "lry")

    val got = MeiAssign.assign(neumes, spans, medLineSpacing = 1.0)
      .orderBy("elem_seq")
      .collect()
      .map(r => (r.getInt(1), r.getBoolean(2), Option(r.getString(3)),
        if (r.isNullAt(4)) -1 else r.getInt(4),
        if (r.isNullAt(5)) -1 else r.getInt(5)))

    assert(got(0) === ((0, false, None, -1, -1)))         // group-0 drop
    assert(got(1) === ((1, true, Some("al"), 1, 0)))      // leader, own zone
    assert(got(2) === ((2, false, Some("al"), 1, -1)))    // duplicate merge
    assert(got(3) === ((3, true, Some("lu"), 3, 6)))
    assert(got(4) === ((4, false, Some("lu"), 3, -1)))    // no-collision follower
  }

  test("argmax tie takes the FIRST span in span order (Python max)") {
    import spark.implicits._
    // two spans with IDENTICAL boxes but different text: equal intersection,
    // first (lower seq) must win
    val spans = Seq(
      ("u", 0, "aa", 0, 0, 2, 1),
      ("u", 1, "bb", 0, 0, 2, 1))
      .toDF("url", "seq", "syl", "ulx", "uly", "lrx", "lry")
    val neumes = Seq(("u", 0, 0, -1, 2, 0))
      .toDF("url", "elem_seq", "ulx", "uly", "lrx", "lry")
    val got = MeiAssign.assign(neumes, spans, 1.0).collect()
    assert(got.length === 1)
    assert(got(0).getString(3) === "aa")
  }
}
