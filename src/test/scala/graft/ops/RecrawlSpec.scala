package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class RecrawlSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def cdxRow(key: String, date: String, digest: String,
      aid: Long, off: Long) = (key, date, digest, aid, off)

  test("schedule: rate classes at their integer boundaries") {
    import spark.implicits._
    val rows = Seq(
      cdxRow("new1", "d1", "x", 0L, 0L),                       // 1 capture
      cdxRow("cold2", "d1", "a", 0L, 0L), cdxRow("cold2", "d2", "a", 1L, 0L),
      cdxRow("hot2", "d1", "a", 0L, 0L), cdxRow("hot2", "d2", "b", 1L, 0L),
      // 4 captures, 2 changes: 2*2 >= 3 -> hot
      cdxRow("hot4", "d1", "a", 0L, 0L), cdxRow("hot4", "d2", "a", 1L, 0L),
      cdxRow("hot4", "d3", "b", 2L, 0L), cdxRow("hot4", "d4", "a", 3L, 0L),
      // 5 captures, 1 change: 1*2 < 4 but 1*4 >= 4 -> warm
      cdxRow("warm5", "d1", "a", 0L, 0L), cdxRow("warm5", "d2", "a", 1L, 0L),
      cdxRow("warm5", "d3", "a", 2L, 0L), cdxRow("warm5", "d4", "b", 3L, 0L),
      cdxRow("warm5", "d5", "b", 4L, 0L))
      .toDF("urlkey", "warc_date", "digest", "archive_id", "rec_offset")
    val out = Recrawl.schedule(rows).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out("new1") === ((1L, 0L, "new")))
    assert(out("cold2") === ((2L, 0L, "cold")))
    assert(out("hot2") === ((2L, 1L, "hot")))
    assert(out("hot4") === ((4L, 2L, "hot")))
    assert(out("warm5") === ((5L, 1L, "warm")))
  }

  test("schedule: date ties break on archive position") {
    import spark.implicits._
    val rows = Seq(
      cdxRow("k", "d1", "a", 1L, 50L),
      cdxRow("k", "d1", "b", 1L, 10L), // earlier offset: comes FIRST
      cdxRow("k", "d1", "b", 0L, 99L)) // earlier archive: comes FIRST
      .toDF("urlkey", "warc_date", "digest", "archive_id", "rec_offset")
    // order: (0,99)=b, (1,10)=b, (1,50)=a -> one change
    val r = Recrawl.schedule(rows).collect().head
    assert(r.getLong(2) === 1L)
  }

  test("budget: Zipf floor-division with the unit floor") {
    import spark.implicits._
    val cent = Seq(("u1", 3.0), ("u2", 2.0), ("u3", 2.0), ("u4", 0.1))
      .toDF("url", "harmonic")
    val out = Recrawl.budget(cent, k = 10L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("u1") === ((1L, 10L)))
    assert(out("u2") === ((2L, 5L)))  // harmonic tie: url ASC
    assert(out("u3") === ((3L, 3L)))
    assert(out("u4") === ((4L, 2L)))
    val big = (1 to 15).map(i => (s"v$i", 1.0 / i)).toDF("url", "harmonic")
    val floors = Recrawl.budget(big, k = 10L).collect()
      .filter(_.getLong(1) > 10).map(_.getLong(2))
    assert(floors.nonEmpty && floors.forall(_ === 1L)) // floor(10/11..)=0 -> 1
  }
}
