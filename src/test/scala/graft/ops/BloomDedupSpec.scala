package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-routed incremental dedup must be bit-identical to the exact
  * anti-join at ANY filter sizing — the filter routes, it never drops.
  */
class BloomDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def corpus() = {
    import spark.implicits._
    val prior = (1 to 400).map(i => (i.toLong, s"prior doc number $i body"))
      .toDF("doc_id", "text")
    // new batch: 1/3 true dups of prior, 2/3 fresh, plus a null-text row
    val fresh = (1 to 300).map { i =>
      val t = if (i % 3 == 0) s"prior doc number ${i / 3} body"
              else s"fresh doc $i payload"
      (1000L + i, t)
    }.toDF("doc_id", "text")
      .unionAll(Seq((9999L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    (fresh, prior)
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  test("bloom route equals exact anti-join (well-sized filter)") {
    val (fresh, prior) = corpus()
    val exact = ids(Dedup.incrementalDedup(fresh, prior))
    val bloom = ids(Dedup.incrementalDedupBloom(fresh, prior,
      expectedPriorDistinct = 400, fpp = 0.01))
    assert(bloom === exact)
    assert(exact.nonEmpty && exact.size < 301) // both branches populated
  }

  test("undersized filter (inflated fpp) is still exact") {
    val (fresh, prior) = corpus()
    val exact = ids(Dedup.incrementalDedup(fresh, prior))
    // expected=2 on 400 distinct digests: nearly every probe is a false
    // positive, so almost everything takes the anti-join route — result
    // must not change by a single row
    val bloom = ids(Dedup.incrementalDedupBloom(fresh, prior,
      expectedPriorDistinct = 2, fpp = 0.5))
    assert(bloom === exact)
  }

  test("empty prior corpus keeps every new row (incl. null text)") {
    import spark.implicits._
    val (fresh, _) = corpus()
    val emptyPrior = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val bloom = ids(Dedup.incrementalDedupBloom(fresh, emptyPrior,
      expectedPriorDistinct = 10, fpp = 0.01))
    assert(bloom === ids(fresh))
  }

  test("null-text rows dedup as a class, identically on both paths") {
    import spark.implicits._
    val prior = Seq((1L, null.asInstanceOf[String]), (2L, "kept"))
      .toDF("doc_id", "text")
    val fresh = Seq((10L, null.asInstanceOf[String]), (11L, "brand new"))
      .toDF("doc_id", "text")
    val exact = ids(Dedup.incrementalDedup(fresh, prior))
    val bloom = ids(Dedup.incrementalDedupBloom(fresh, prior,
      expectedPriorDistinct = 2, fpp = 0.01))
    assert(bloom === exact)
  }
}
