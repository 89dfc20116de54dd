package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Null-robustness contracts (self-review follow-up): a web crawl WILL
  * contain rows with null text or null ids, and a single such row must
  * degrade per the op's documented contract — never NPE-kill the task.
  */
class NullSafetySpec extends AnyFunSuite with BeforeAndAfterAll {

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
    Seq((1L, "a b c d e f g h i j"), (2L, null.asInstanceOf[String]),
      (3L, "a b c d e f g h i j k"))
      .toDF("doc_id", "text")
  }

  test("duplicateSpans: null text contributes no windows, query completes") {
    val got = TextOps.duplicateSpans(corpus(), n = 8).count()
    // docs 1 and 3 share the windows at offsets 0,1,2 -> 3 flagged
    // occurrences in each doc
    assert(got === 6L)
  }

  test("maskDuplicateSpans: null text masks to empty, not NPE") {
    import spark.implicits._
    val c = corpus()
    val got = TextOps.maskDuplicateSpans(c, TextOps.duplicateSpans(c, 8), 8)
      .as[(Long, String)].collect().toMap
    assert(got(2L) === "")
  }

  test("compressionRatios: null text is a zero-byte row") {
    import spark.implicits._
    val got = TextOps.compressionRatios(corpus())
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(got(2L) === 0L)
  }

  test("repetition + dup fractions: null text scores zero") {
    import spark.implicits._
    val row = TextOps.repetitionScores(corpus()).filter(col("doc_id") === 2)
      .collect().head
    (1 until row.length).foreach(i => assert(row.getDouble(i) === 0.0))
  }

  test("latestCapture: null timestamps lose to any real capture") {
    import spark.implicits._
    val caps = Seq(("u", Some(5L), "old"), ("u", None, "nullts"))
      .map { case (u, ts, t) => (u, ts.map(Long.box).orNull, t) }
      .toDF("url", "ts_us", "text")
    val got = Dedup.latestCapture(caps).select("text").as[String].collect()
    assert(got.toSeq === Seq("old")) // max(struct) ignores the null-ts row
  }

  test("incrementalDedup: null text on either side never crashes") {
    import spark.implicits._
    val prior = Seq((1L, "x"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val newer = Seq((10L, "x"), (11L, null.asInstanceOf[String]), (12L, "y"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(newer, prior)
      .select("doc_id").as[Long].collect().toSet
    // "x" is a prior duplicate; null-text digests are null on both sides and
    // a null join key never matches an anti-join, so null rows SURVIVE
    // (conservative: never silently drop a row you cannot prove duplicated)
    assert(got === Set(11L, 12L))
  }

  test("crossDocLineDedup: null text drops the doc (no lines), others intact") {
    import spark.implicits._
    val c = Seq((1L, "solo line one"), (2L, null.asInstanceOf[String]),
      (3L, "solo line three")).toDF("doc_id", "text")
    val got = Dedup.crossDocLineDedup(c)
      .as[(Long, String, Int)].collect().map(r => r._1 -> r._2).toMap
    // posexplode of split(null) yields no rows — a null-text doc has no
    // lines and so no output row (CONTRACT; it cannot be 'emptied' because
    // it was never structured)
    assert(got === Map(1L -> "solo line one", 3L -> "solo line three"))
  }

  test("snapshotDiff: null text reads changed (conservative), null ids rejected") {
    import spark.implicits._
    def df(rows: Seq[(Any, String)]) = rows
      .map { case (id, t) => (id.asInstanceOf[java.lang.Long], t) }
      .toDF("doc_id", "text")
    val prior = df(Seq((1L, "same"), (2L, null), (4L, null),
      (null, "null id"), (5L, "gone")))
    val current = df(Seq((1L, "same"), (2L, "now real"), (4L, null),
      (3L, "new")))
    val got = Dedup.snapshotDiff(current, prior)
      .as[(Long, String)].collect().toMap
    // 4: null-vs-null digests compare UNEQUAL -> 'changed' — the
    // conservative audit answer (we cannot prove the content unchanged)
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "added",
      4L -> "changed", 5L -> "removed"))
  }

  test("minhashJoin: null text/id rows excluded, never NPE") {
    import spark.implicits._
    def df(rows: Seq[(Any, String)]) = rows
      .map { case (id, t) => (id.asInstanceOf[java.lang.Long], t) }
      .toDF("doc_id", "text")
    val left = df(Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, null), (null, "orphan text here")))
    val right = df(Seq((10L, "alpha beta gamma delta epsilon zeta"),
      (11L, null)))
    val got = Dedup.minhashJoin(left, right, threshold = 0.5)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L))) // null rows signed-out up front, job survives
  }

  test("decontaminate: null-id/text training rows conservatively KEPT in drop mode") {
    import spark.implicits._
    val training = Seq(
      (java.lang.Long.valueOf(1L), "a b c d e f g h i j"),
      (null.asInstanceOf[java.lang.Long], "a b c d e f g h i j"), // contaminated text, no id
      (java.lang.Long.valueOf(3L), null.asInstanceOf[String]),
      (java.lang.Long.valueOf(4L), "z y x w v u t s r q"))
      .toDF("doc_id", "text")
    val evalSet = Seq((100L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val kept = Dedup.decontaminate(training, evalSet, threshold = 0.5)
      .select("doc_id").collect().map(r => Option(r.get(0))).toSet
    // doc 1 dropped (matches); null-id row kept (unsignable); null-text
    // kept (no shingles); doc 4 kept (no match)
    assert(kept === Set(None, Some(3L), Some(4L)))
  }

  test("quantizedTopK: null embedding/id rows excluded, never NPE") {
    import spark.implicits._
    val e = Seq(
      (java.lang.Long.valueOf(1L), Seq(1.0f, 0.0f)),
      (java.lang.Long.valueOf(2L), Seq(0.9f, 0.1f)),
      (null.asInstanceOf[java.lang.Long], Seq(1.0f, 1.0f)),
      (java.lang.Long.valueOf(4L), null.asInstanceOf[Seq[Float]]),
      (java.lang.Long.valueOf(5L), Seq(0.0f, 0.0f))) // zero vector: score 0
      .toDF("vec_id", "embedding")
    val rows = Similarity.quantizedTopK(e, queryMaxId = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(!rows.exists(t => t._3 == 4L),
      "null-embedding row must not appear as a neighbor")
  }

  test("crossDocLineDedup: null doc_id rejected, never silently emptied") {
    import spark.implicits._
    val c = Seq((Some(1L), "kept content"), (None, "null id content"))
      .map { case (id, t) => (id.map(Long.box).orNull, t) }
      .toDF("doc_id", "text")
    val got = Dedup.crossDocLineDedup(c).as[(Long, String, Int)].collect()
    // without the explicit isNotNull filter the restoration join would
    // emit (null, '', 0) — the null-id doc's content silently destroyed;
    // the contract is an up-front drop, visible in the plan
    assert(got.toSeq === Seq((1L, "kept content", 1)))
  }

  test("c4LineFilter / packIndex / greedyPack: null text behaves as null/zero, never NPE") {
    import spark.implicits._
    val c = Seq((1L, "keep this line now."), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    // c4: the null propagates visibly (null clean_text, null counts) —
    // the op does not fabricate an empty document from a null one
    val c4 = TextOps.c4LineFilter(c).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(c4(2L).isNullAt(1) && c4(2L).isNullAt(2) && c4(2L).isNullAt(3))
    assert(c4(1L).getString(1) === "keep this line now.")
    // accounting ops: null text = zero tokens (total functions; a null
    // n_tokens would poison the prefix sum / NPE the packer's encoder)
    val pk = TextOps.packIndex(c, 8).select("doc_id", "n_tokens")
      .as[(Long, Long)].collect().toMap
    assert(pk(2L) === 0L)
    val gp = Packing.greedyPack(c, capacity = 8).select("doc_id", "n_tokens")
      .as[(Long, Long)].collect().toMap
    assert(gp(2L) === 0L)
  }
}
