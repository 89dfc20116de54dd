package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class TermsAndSampleSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("topTermsPerDoc ranks tf desc, then rare-in-corpus, then term") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b b a a c"),   // tf: a=2 b=2 c=1; df: a=2 b=1 c=2
      (2L, "a c c")        // tf: c=2 a=1
    ).toDF("doc_id", "text")
    val got = Terms.topTermsPerDoc(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .sortBy(x => (x._1, x._5)).toSeq
    // doc 1: a and b both tf=2; b rarer (df 1 < 2) → b first, then a
    assert(got === Seq(
      (1L, "b", 2L, 1L, 1), (1L, "a", 2L, 2L, 2),
      (2L, "c", 2L, 2L, 1), (2L, "a", 1L, 2L, 2)))
  }

  test("topTermsPerDoc: empty/null text emit no rows; k bounds rows per doc") {
    import spark.implicits._
    val docs = Seq((1L, "x y z w"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Terms.topTermsPerDoc(docs, k = 3)
    assert(got.groupBy("doc_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 3L)))
    assertThrows[IllegalArgumentException](Terms.topTermsPerDoc(docs, 0))
  }

  test("sampleKPerGroup: exact min(k,|group|) rows; salted == single-window") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong, s"g${i % 7}"))
      .toDF("doc_id", "grp")
    Seq(1, 3, 16).foreach { salt =>
      val got = Sampling.sampleKPerGroup(df, "grp", k = 5, saltBuckets = salt)
      val sizes = got.groupBy("grp").count().collect().map(_.getLong(1))
      assert(sizes.forall(_ == 5L), s"salt=$salt")
      // reference: plain single window over the same total order
      val want = df.withColumn("rnk", row_number().over(
          Window.partitionBy(col("grp"))
            .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
        .filter(col("rnk") <= 5)
      val a = got.select("doc_id", "grp", "rnk").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      val b = want.select("doc_id", "grp", "rnk").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      assert(a === b, s"salt=$salt")
    }
  }

  test("sampleKPerGroup: small groups keep all rows; null ids rejected") {
    import spark.implicits._
    val df = Seq((java.lang.Long.valueOf(1L), "a"),
      (java.lang.Long.valueOf(2L), "a"),
      (null.asInstanceOf[java.lang.Long], "a"),
      (java.lang.Long.valueOf(3L), "b")).toDF("doc_id", "grp")
    val got = Sampling.sampleKPerGroup(df, "grp", k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 3L))
  }
}
