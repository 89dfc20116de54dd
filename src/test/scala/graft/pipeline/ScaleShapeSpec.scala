package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Scale-shape assertions: plan structure of the flagship job, skew guard
  * behavior, and kernel totality on degenerate rows.
  */
class ScaleShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("flagship plan: exactly one Exchange (the salt), kernel as MapPartitions, pruned scan") {
    val df = AlignJob.metrics(AlignJob.align(
      AlignJob.synthPages(spark, sfDir), saltPartitions = 4))
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly one shuffle, got $exchanges:\n${plan.take(3000)}")
    assert(plan.contains("MapPartitions"), plan.take(2000))
    // scan must read only the three columns the generator needs
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string>"),
      plan.take(3000))
  }

  test("unsalted flagship plan has no shuffle at all") {
    val df = AlignJob.metrics(AlignJob.align(AlignJob.synthPages(spark, sfDir)))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("skew guard: a pathologically long document is truncated, flagged, and finishes") {
    import spark.implicits._
    val hugeText = ("alleluia dominus dixit " * 9000).trim // ~207k chars > MaxAlignChars
    val pages = Seq(
      PageGen.pageFor(1L, hugeText, "la"),
      PageGen.pageFor(2L, "dominus meus", "la")).toDS()
    val m = AlignJob.metrics(AlignJob.align(pages)).collect()
      .map(r => r.getAs[String]("url") ->
        ((r.getAs[String]("error"), r.getAs[Int]("tra_len"), r.getAs[Int]("n_spans"))))
      .toMap
    val (bigErr, bigLen, bigSpans) = m(PageGen.urlFor(1L))
    assert(bigErr.contains("truncated"), bigErr)
    // transcript truncates pre-expansion; alignment length is bounded by
    // truncated transcript + post-expansion stream (expansion can lengthen)
    assert(bigLen > 0 && bigLen <= 3 * graft.align.AlignKernel.MaxAlignChars)
    assert(bigSpans > 0)
    val (smallErr, _, smallSpans) = m(PageGen.urlFor(2L))
    assert(smallErr === "" && smallSpans > 0)
  }

  test("bucketed co-located join plans with zero Exchange") {
    import graft.ops.Bucketing
    // (managed tables land in the default ./spark-warehouse — gitignored)
    // disable broadcast so the join shape is genuinely decided by bucketing
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        spark.read.parquet(s"$sfDir/orders.parquet")
          .select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_b", "o_orderkey", 4)
      Bucketing.writeBucketed(
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(org.apache.spark.sql.functions.col("l_orderkey").as("o_orderkey"),
            org.apache.spark.sql.functions.col("l_quantity")),
        "lineitem_b", "o_orderkey", 4)
      val joined = Bucketing.cooperativeJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(3000))
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      // and it computes the right thing
      val expected = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .join(spark.read.parquet(s"$sfDir/orders.parquet"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("kernel is total on degenerate rows (null/empty text and html)") {
    import spark.implicits._
    val ts = PageGen.tsFor(0L)
    val pages = Seq(
      Page("u1", ts, null, "some text", "en"),
      Page("u2", ts, Array.emptyByteArray, "", "en"),
      Page("u3", ts, "<html><body>only stream</body></html>".getBytes("UTF-8"), null, "en"),
      Page("u4", ts, null, null, "en")).toDS()
    val rows = AlignJob.metrics(AlignJob.align(pages)).collect()
      .map(r => r.getAs[String]("url") ->
        ((r.getAs[String]("error"), r.getAs[Int]("n_spans"), r.getAs[Int]("tra_len"))))
      .toMap
    assert(rows.size === 4)
    // degenerate inputs process CLEANLY (kernel guards, not catch-alls):
    // empty stream or empty transcript → zero spans, no error recorded
    for ((u, (err, nSpans, _)) <- rows) {
      assert(err === "", s"$u unexpectedly errored: $err")
      assert(nSpans === 0, s"$u produced spans from a degenerate row")
    }
    // u1 has real text: its alignment still covers the whole transcript
    assert(rows("u1")._3 > 0)
  }
}
