package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    Seq(
      (0L, "spark shuffles data across the cluster"),
      (1L, "spark spark spark caching"),
      (2L, "an unrelated pastoral poem about meadows"),
      (3L, "data caching layers and data movement"),
      (4L, null.asInstanceOf[String]),
      (5L, "")).toDF("doc_id", "text")
  }

  private def query(terms: (Long, String, Int)*) = {
    import spark.implicits._
    terms.toSeq.toDF("query_id", "term", "term_pos")
  }

  test("idf is Lucene-floored (never negative) and decreases with df") {
    assert(Retrieval.idf(10, 1) > Retrieval.idf(10, 5))
    assert(Retrieval.idf(10, 10) > 0.0) // the +1 floor
  }

  test("only docs sharing a term are candidates; ranking by relevance") {
    val r = Retrieval.bm25TopK(corpus(), query((7L, "spark", 0)), k = 10)
      .collect().sortBy(_.getInt(1))
    assert(r.map(_.getLong(2)).toSeq === Seq(1L, 0L)) // tf=3 short doc wins
    assert(r.map(_.getInt(1)).toSeq === Seq(1, 2))
  }

  test("multi-term scores equal the sum of per-term runs (fold order pinned)") {
    val both = Retrieval.bm25TopK(corpus(),
      query((7L, "spark", 0), (7L, "data", 1)), k = 10)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    val a = Retrieval.bm25TopK(corpus(), query((7L, "spark", 0)), k = 10)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    val b = Retrieval.bm25TopK(corpus(), query((7L, "data", 0)), k = 10)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    both.foreach { case (d, s) =>
      assert(s === a.getOrElse(d, 0.0) + b.getOrElse(d, 0.0), s"doc $d")
    }
  }

  test("k truncates; ties break on doc_id; unknown terms yield no rows") {
    val r1 = Retrieval.bm25TopK(corpus(), query((7L, "data", 0)), k = 1).collect()
    assert(r1.length === 1)
    // docs 0 and 3 both contain "data"; doc 3 has tf=2 → wins
    assert(r1.head.getLong(2) === 3L)
    assert(Retrieval.bm25TopK(corpus(), query((9L, "zzzmissing", 0)), k = 5)
      .count() === 0L)
  }

  test("parallelism-independent: 1-partition rerun is bit-identical") {
    val q = query((7L, "spark", 0), (7L, "caching", 1), (8L, "data", 0))
    val a = Retrieval.bm25TopK(corpus(), q, k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2))
    val b = Retrieval.bm25TopK(corpus().repartition(1), q.repartition(1), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2))
    assert(a.toSeq === b.toSeq)
  }

  test("query-workload cap is enforced, not documented") {
    val q = query((7L, "spark", 0), (7L, "data", 1))
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus(), q, k = 5, maxQueryTerms = 1L)
    }
    assert(e.getMessage.contains("cap"))
  }
}
