package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("bucketOf matches the mirror's pinned vectors (power-of-two mask)") {
    // python: ds_bucket('the')=1755, ds_bucket('of')=2072,
    //         ds_bucket('a b')=4407
    assert(Dsir.bucketOf("the") === 1755)
    assert(Dsir.bucketOf("of") === 2072)
    assert(Dsir.bucketOf("a b") === 4407)
  }

  test("gumbelOf is deterministic and matches the mirror") {
    // python: ds_gumbel(7)=4.442415367012595, ds_gumbel(8)=0.37972759112199006
    assert(Dsir.gumbelOf(7L) === 4.442415367012595)
    assert(Dsir.gumbelOf(8L) === 0.37972759112199006)
  }

  test("featureBuckets: unigrams in order, then bigrams") {
    val b = Dsir.featureBuckets("a b c")
    assert(b.length === 5) // 3 unigrams + 2 bigrams
    assert(b(0) === Dsir.bucketOf("a"))
    assert(b(3) === Dsir.bucketOf("a b"))
    assert(Dsir.featureBuckets(null).isEmpty)
    assert(Dsir.featureBuckets("solo").toSeq === Seq(Dsir.bucketOf("solo")))
  }

  test("select prefers target-distribution lookalikes") {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog again and again"
    val junk = "zzq xvw qqj kkp wwl rrm ttn uuo ppv mmx"
    val rows =
      (0 until 5).map(i => (i.toLong, good + " " + i, "en")) ++
        (5 until 10).map(i => (i.toLong, good + " v" + i, "xx")) ++
        (10 until 20).map(i => (i.toLong, junk + " " + i, "xx"))
    val df = rows.toDF("doc_id", "text", "lang")
    val out = Dsir.select(df, col("lang") === "en", k = 6).collect()
    assert(out.length === 20)
    val selected = out.filter(_.getBoolean(4)).map(_.getLong(0)).toSet
    assert(selected.size === 6)
    // all six winners come from the ten good-vocab docs (target or
    // lookalike) — junk's log-weights are too far below for the Gumbel
    // noise to rescue
    assert(selected.forall(_ < 10), s"selected $selected")
  }

  test("divergence flags the shard whose distribution drifted") {
    import spark.implicits._
    val common = "the quick brown fox jumps over the lazy dog"
    val rows =
      (0 until 8).map(i => (i.toLong, common + " a" + (i % 2), "shardA")) ++
        (8 until 16).map(i => (i.toLong, common + " b" + (i % 2), "shardB")) ++
        (16 until 24).map(i => (i.toLong, "zzq xvw qqj kkp wwl rrm", "shardC"))
    val df = rows.toDF("doc_id", "text", "source")
    val out = Dsir.divergence(df, col("source")).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out.keySet === Set("shardA", "shardB", "shardC"))
    assert(out("shardC") > out("shardA") * 2,
      s"drifted shard should dominate: $out")
    assert(out("shardC") > out("shardB") * 2)
  }

  test("divergence enforces the shard cap on the pruned probe") {
    import spark.implicits._
    val df = (0 until 10).map(i => (i.toLong, "x y", s"s$i"))
      .toDF("doc_id", "text", "source")
    val e = intercept[IllegalArgumentException] {
      Dsir.divergence(df, col("source"), maxShards = 4)
    }
    assert(e.getMessage.contains("shards"))
  }

  test("null target predicate means non-target, never a crash") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick fox", Some("en")),
      (2L, "the slow fox", None: Option[String]),
      (3L, "zzq xvw qqj", Some("xx")))
      .toDF("doc_id", "text", "lang")
    val out = Dsir.select(df, col("lang") === "en", k = 1).collect()
    assert(out.length === 3) // the null-lang row scored, not crashed
  }
}
