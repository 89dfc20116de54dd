package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class ScriptsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("countScripts classifies the pinned ranges") {
    // latin ×2, cyrillic ×1 (д), greek ×1 (α), han ×1 (一), arabic ×1 (ا)
    val c = Scripts.countScripts("ab д α 一 ا 9 !")
    assert(c.toSeq === Seq(1L, 1L, 1L, 1L, 2L)) // arabic,cyr,greek,han,latin
    assert(Scripts.countScripts(null).toSeq === Seq(0L, 0L, 0L, 0L, 0L))
    // Latin-1/Extended letters are latin; U+2B0+ is not counted
    assert(Scripts.countScripts("é").toSeq.last === 1L)
    assert(Scripts.countScripts("ʰ").sum === 0L)
  }

  test("detect: dominance, name-order ties, mixed boundary, none") {
    import spark.implicits._
    val rows = Seq(
      (1L, "abcdef"),                 // pure latin, second=0 -> not mixed
      (2L, "abcde д"),                // 5*1 >= 5 -> mixed at the boundary
      (3L, "abcdef д"),               // 5*1 < 6 -> not mixed
      (4L, "д α"),                    // tie 1-1: cyrillic vs greek -> greek? no: name order arabic<cyrillic<greek -> first max scan picks cyrillic (index order IS name order)
      (5L, "123 !?"))                 // no letters -> none
    val out = Scripts.detect(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> (r.getString(7), r.getBoolean(8))).toMap
    assert(out(1L) === (("latin", false)))
    assert(out(2L) === (("latin", true)))
    assert(out(3L) === (("latin", false)))
    assert(out(4L) === (("cyrillic", true)))
    assert(out(5L) === (("none", false)))
  }
}
