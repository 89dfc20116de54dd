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

  test("serializeXml reproduces Python ElementTree byte-for-byte (id-normalized)") {
    import spark.implicits._
    // expected string produced by the EXECUTING reference add_text_to_mei_file
    // on this exact fixture (synthNeumes over these spans), serialized with
    // ET.register_namespace('', MEI) + tostring(encoding='unicode'), ids
    // normalized to gid<k>; the corpus-scale check is the q_mei_xml golden
    val spans = Seq(
      ("http://example.com/doc/7", 0, "al", 0, 10, 5, 12),
      ("http://example.com/doc/7", 1, "le", 6, 10, 9, 12),
      ("http://example.com/doc/7", 2, "lu", 10, 10, 15, 12),
      ("http://example.com/doc/7", 3, "ia", 16, 10, 20, 12),
      ("http://example.com/doc/7", 4, "am", 21, 10, 25, 12))
      .toDF("url", "seq", "syl", "ulx", "uly", "lrx", "lry")
    val neumes = MeiAssign.synthNeumes(spans)
    val xml = MeiAssign.serializeXml(neumes, MeiAssign.assign(neumes, spans, 1.0))
      .collect()
    assert(xml.length === 1)
    val expected =
      "<mei xmlns=\"http://www.music-encoding.org/ns/mei\"><surface>" +
        "<zone xml:id=\"z0\" ulx=\"0\" uly=\"9\" lrx=\"5\" lry=\"11\" />" +
        "<zone xml:id=\"z1\" ulx=\"7\" uly=\"9\" lrx=\"9\" lry=\"11\" />" +
        "<zone xml:id=\"z2\" ulx=\"10\" uly=\"9\" lrx=\"15\" lry=\"11\" />" +
        "<zone xml:id=\"z3\" ulx=\"15\" uly=\"9\" lrx=\"19\" lry=\"11\" />" +
        "<zone xml:id=\"z4\" ulx=\"21\" uly=\"9\" lrx=\"24\" lry=\"11\" />" +
        "<zone xml:id=\"gid0\" lrx=\"5\" lry=\"11\" ulx=\"0\" uly=\"9\" />" +
        "<zone xml:id=\"gid1\" lrx=\"9\" lry=\"11\" ulx=\"7\" uly=\"9\" />" +
        "<zone xml:id=\"gid2\" lrx=\"15\" lry=\"11\" ulx=\"10\" uly=\"9\" />" +
        "<zone xml:id=\"gid3\" lrx=\"19\" lry=\"11\" ulx=\"15\" uly=\"9\" />" +
        "<zone xml:id=\"gid4\" lrx=\"24\" lry=\"11\" ulx=\"21\" uly=\"9\" />" +
        "</surface><layer>" +
        "<syllable xml:id=\"s0\" facs=\"gid0\"><syl>al</syl><neume><nc facs=\"z0\" /></neume></syllable>" +
        "<syllable xml:id=\"s1\" facs=\"gid1\"><syl>le</syl><neume><nc facs=\"z1\" /></neume></syllable>" +
        "<syllable xml:id=\"s2\" facs=\"gid2\"><syl>lu</syl><neume><nc facs=\"z2\" /></neume></syllable>" +
        "<syllable xml:id=\"s3\" facs=\"gid3\"><syl>ia</syl><neume><nc facs=\"z3\" /></neume></syllable>" +
        "<syllable xml:id=\"s4\" facs=\"gid4\"><syl>am</syl><neume><nc facs=\"z4\" /></neume></syllable>" +
        "</layer></mei>"
    assert(xml(0).getString(1) === expected)
  }
}
