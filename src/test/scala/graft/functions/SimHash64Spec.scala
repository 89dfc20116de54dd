package graft.functions

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The codegen SimHash expression must equal the kernel function on every
  * input (incl. empty, unicode, null) — through a real DataFrame so the
  * generated-code path executes, and via eval (interpreted) coverage from
  * the constant-folded literal.
  */
class SimHash64Spec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("expression == Dedup.simhashOf (codegen + interpreted), null-safe") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rng = new java.util.Random(11)
    val words = Array("alleluia", "dominus", "über", "naïve", "", "a|b", "123")
    val texts = (1 to 200).map(i =>
      Array.fill(rng.nextInt(30))(words(rng.nextInt(words.length))).mkString(" ")) ++
      Seq("", " ", "   ", "one")
    val got = texts.toDF("text")
      .select(col("text"), Dedup.simhashCol(col("text")).as("sig"))
      .as[(String, Long)].collect().toMap
    for (t <- texts.distinct)
      assert(got(t) === Dedup.simhashOf(t), s"mismatch for '$t'")

    // null input → null output (nullIntolerant)
    val nulls = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "text")
      .select(Dedup.simhashCol(col("text")).as("sig")).collect()
    assert(nulls(0).isNullAt(0))
  }
}
