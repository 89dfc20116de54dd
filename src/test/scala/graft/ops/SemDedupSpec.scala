package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  // two well-separated directions; ids 1..4 near +x, ids 10..11 near +y.
  // 2 and 3 are near-copies of 1 (cos ≈ 1); 4 is +x but distinct enough
  // only vs the copies' threshold when τ is high.
  private def fixture() = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0f, 0.01f)),
      (2L, Seq(1.0f, 0.011f)),  // near-dup of 1 -> pruned
      (3L, Seq(1.0f, 0.009f)),  // near-dup of 1 -> pruned
      (4L, Seq(0.95f, 0.3f)),   // +x-dominant, cos≈0.96 to 1 (< 0.999)
      (10L, Seq(0.01f, 1.0f)),
      (11L, Seq(0.012f, 1.0f))  // near-dup of 10 -> pruned
    ).toDF("vec_id", "embedding")
  }

  test("min-id keeper: near-dups prune to the lowest id in their cluster") {
    val out = Similarity.semDedup(fixture(), threshold = 0.999, k = 2)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) === "kept")
    assert(out(2L) === "pruned")
    assert(out(3L) === "pruned")
    assert(out(10L) === "kept")
    assert(out(11L) === "pruned")
    assert(out(4L) === "kept") // same cluster as 1 but below threshold
  }

  test("every input vector appears exactly once in the output") {
    val out = Similarity.semDedup(fixture(), threshold = 0.999, k = 2)
    assert(out.count() === 6)
    assert(out.select("vec_id").distinct().count() === 6)
  }

  test("oversized clusters skip pairing: all members kept, none dropped") {
    val out = Similarity.semDedup(fixture(), threshold = 0.999, k = 1,
        maxClusterSize = 3)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // k=1 puts all 6 in one cluster; cap=3 < 6 -> no pairing anywhere
    assert(out.size === 6)
    assert(out.values.forall(_ == "kept"))
  }

  test("threshold binds: τ=0.5 prunes the whole +x half-space to id 1") {
    val out = Similarity.semDedup(fixture(), threshold = 0.5, k = 2)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) === "kept")
    assert(out(4L) === "pruned") // cos(1,4) ≈ 0.96 ≥ 0.5
  }

  // ==== hierarchical (two-codebook) form ====

  test("hier: degenerate 1x1 codebooks equal the flat k=1 statuses") {
    val flat = Similarity.semDedup(fixture(), threshold = 0.999, k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val hier = Similarity.semDedupHier(fixture(), threshold = 0.999,
        k1 = 1, k2 = 1)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(hier === flat) // one cell == one cluster
  }

  test("hier: near-dups prune within (coarse, fine) cells; all rows out") {
    val out = Similarity.semDedupHier(fixture(), threshold = 0.999,
      k1 = 2, k2 = 2).collect()
    assert(out.length === 6)
    val st = out.map(r => r.getLong(0) -> r.getString(3)).toMap
    // near-copies land in the same coarse AND fine cell (they are nearly
    // identical vectors) and prune to the min id
    assert(st(1L) === "kept")
    assert(st(2L) === "pruned")
    assert(st(3L) === "pruned")
    assert(st(10L) === "kept")
    assert(st(11L) === "pruned")
    assert(st(4L) === "kept")
    // the cell columns are genuine assignments: copies share their
    // keeper's cell
    val cells = out.map(r =>
      r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(cells(2L) === cells(1L))
    assert(cells(3L) === cells(1L))
    assert(cells(11L) === cells(10L))
  }

  test("hier: oversized cells skip pairing like the flat cap") {
    val out = Similarity.semDedupHier(fixture(), threshold = 0.999,
        k1 = 1, k2 = 1, maxClusterSize = 3)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out.size === 6)
    assert(out.values.forall(_ == "kept"))
  }
}
