package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 plan-shape assertions: the new operators must keep the shapes
  * their scale stories claim — PSL-aware domain extraction stays pure
  * expression work (no UDF in the domain queries' scan stage), the
  * decontamination consumer resolves through a LeftAnti join on ids (never
  * a text shuffle), and the q_pipeline composition keeps the pack stage on
  * bucket-partitioned windows with no global-order window anywhere.
  */
class Round5ShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def planOf(name: String): String =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q_domain_stats: PSL-aware extraction is pure expression work — no UDF") {
    val plan = planOf("q_domain_stats")
    assert(!plan.contains("UDF") && !plan.contains("BatchEvalPython"),
      s"domain extraction must stay codegen expression work:\n${plan.take(3000)}")
    assert(plan.contains("regexp_extract"),
      s"expected the PSL regexp in the plan:\n${plan.take(3000)}")
    // one partial-combining aggregate on the domain key
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      s"expected map-side partial aggregation:\n${plan.take(3000)}")
  }

  test("q_decontam_drop resolves through a LeftAnti join keyed on doc_id") {
    val df = graft.SparkEntry.queries("q_decontam_drop")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"),
      s"expected an anti-join resolution:\n${plan.take(3000)}")
    // the anti-join's own exchanges must be id-keyed, never text-keyed:
    // document text beyond minhashJoin's verified-candidate join must not
    // re-shuffle just to be dropped
    val antiRegion = plan.linesIterator.dropWhile(!_.contains("LeftAnti")).take(8).toSeq
    antiRegion.filter(_.contains("Exchange hashpartitioning")).foreach { l =>
      assert(l.contains("doc_id") && !l.contains("text"),
        s"anti-join must shuffle ids, not text: $l")
    }
  }

  test("profileTable: production (approx) mode has NO Expand; exact mode does") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val approxPlan = graft.ops.Profile.profileTable(docs)
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"),
      s"HLL mode must not expand the scan by the column count:\n${approxPlan.take(2000)}")
    assert(approxPlan.contains("approx_count_distinct"),
      s"expected HLL sketches:\n${approxPlan.take(2000)}")
    val exactPlan = graft.ops.Profile.profileTable(docs, exact = true)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "exact multi-column count-distinct plans through Expand (the documented cost)")
    // and the two modes agree on the null counts (sanity, not an oracle)
    val a = graft.ops.Profile.profileTable(docs).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val e = graft.ops.Profile.profileTable(docs, exact = true).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(a == e, s"null counts must be exact in both modes: $a vs $e")
  }

  test("q_pipeline: pack windows are bucket-partitioned; no global-order window") {
    val plan = planOf("q_pipeline")
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty, s"expected window stages:\n${plan.take(3000)}")
    windows.foreach { l =>
      // the forced scaled prefix sum partitions every window by __bkt —
      // a Window with no partitioning spec would be the single-reducer
      // global sort the pack index exists to avoid
      assert(!l.matches(".*Window \\[[^\\]]*\\], \\[\\].*"),
        s"global (unpartitioned) window in the composition: $l")
    }
  }
}
