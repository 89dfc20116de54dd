package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class MojibakeSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def corrupt(s: String, passes: Int): String = {
    var r = s
    (0 until passes).foreach { _ =>
      r = new String(r.getBytes("UTF-8"), "ISO-8859-1")
    }
    r
  }

  test("single-encoded mojibake is repaired to the original") {
    val clean = "un café très naïve señor über résumé fin"
    assert(Mojibake.fixText(corrupt(clean, 1)) === clean)
  }

  test("double-encoded mojibake is repaired in two passes") {
    val clean = "café señor"
    val twice = corrupt(clean, 2)
    assert(twice !== corrupt(clean, 1))
    assert(Mojibake.fixText(twice) === clean)
  }

  test("clean accented text passes through untouched (strict-decode guard)") {
    // ñ=0xF1 and é=0xE9 are lead-byte-shaped, so hasLead fires — only the
    // strict decode failure protects these rows.
    val cases = Seq("señor", "café", "naïve über", "déjà vu, señorita")
    cases.foreach(s => assert(Mojibake.fixText(s) === s, s))
  }

  test("ascii, empty and null are identity") {
    assert(Mojibake.fixText("plain ascii words") === "plain ascii words")
    assert(Mojibake.fixText("") === "")
    assert(Mojibake.fixText(null) === null)
  }

  test("non-latin1 text (CJK, emoji) is never touched") {
    val cases = Seq("日本語のテキスト", "mixed 日本 café", "emoji 😀 here")
    cases.foreach(s => assert(Mojibake.fixText(s) === s, s))
  }

  test("repair is idempotent on its own output") {
    val clean = "café señor über"
    Seq(corrupt(clean, 1), corrupt(clean, 2), clean).foreach { s =>
      val once = Mojibake.fixText(s)
      assert(Mojibake.fixText(once) === once)
    }
  }

  test("DataFrame form flags exactly the corrupted rows") {
    import spark.implicits._
    val clean = "voilà un café pour señor"
    val in = Seq(
      (0L, corrupt(clean, 2)),
      (1L, clean),
      (2L, corrupt(clean, 1)),
      (3L, "plain ascii"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Mojibake.fix(in).as[(Long, String, Boolean)]
      .collect().sortBy(_._1)
    assert(out(0) === ((0L, clean, true)))
    assert(out(1) === ((1L, clean, false)))
    assert(out(2) === ((2L, clean, true)))
    assert(out(3) === ((3L, "plain ascii", false)))
    assert(out(4) === ((4L, null, false)))
  }
}
