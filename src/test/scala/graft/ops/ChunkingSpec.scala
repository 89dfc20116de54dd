package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class ChunkingSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def chunks(text: String, size: Int, stride: Int): Seq[(Int, String, Int)] = {
    import spark.implicits._
    Chunking.chunkByTokens(Seq((1L, text)).toDF("doc_id", "text"), size, stride)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
      .sortBy(_._1).toSeq
  }

  test("overlapping windows with a short final chunk") {
    // 10 tokens, size 4, stride 3 → starts 0,3,6,9
    val t = "a b c d e f g h i j"
    assert(chunks(t, 4, 3) === Seq(
      (0, "a b c d", 4), (1, "d e f g", 4), (2, "g h i j", 4), (3, "j", 1)))
  }

  test("stride == size gives disjoint chunks") {
    assert(chunks("a b c d e", 2, 2) === Seq(
      (0, "a b", 2), (1, "c d", 2), (2, "e", 1)))
  }

  test("multiple/leading/trailing spaces follow the non-empty-token contract") {
    assert(chunks("  a   b  c ", 2, 2) === Seq((0, "a b", 2), (1, "c", 1)))
  }

  test("zero-token and null docs emit no chunks") {
    assert(chunks("", 4, 2) === Seq.empty)
    assert(chunks("   ", 4, 2) === Seq.empty)
    import spark.implicits._
    val withNull = Seq((1L, null.asInstanceOf[String]), (2L, "x y z"))
      .toDF("doc_id", "text")
    val got = Chunking.chunkByTokens(withNull, 2, 2)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got.forall(_ == 2L) && got.nonEmpty)
  }

  test("doc shorter than one chunk emits exactly one short chunk") {
    assert(chunks("only two", 16, 12) === Seq((0, "only two", 2)))
  }

  test("invalid parameters are rejected") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException](Chunking.chunkByTokens(df, 0, 1))
    assertThrows[IllegalArgumentException](Chunking.chunkByTokens(df, 4, 0))
    assertThrows[IllegalArgumentException](Chunking.chunkByTokens(df, 4, 5))
  }

  test("every token position is covered by at least one chunk") {
    val n = 53
    val toks = (0 until n).map(i => s"t$i")
    val got = chunks(toks.mkString(" "), 16, 12)
    val covered = got.flatMap { case (cid, text, _) =>
      val start = cid * 12
      text.split(" ").zipWithIndex.map { case (tok, k) =>
        assert(tok === s"t${start + k}"); start + k
      }
    }.toSet
    assert(covered === (0 until n).toSet)
  }
}
