package graft.functions

import graft.ops.Similarity
import graft.pipeline.Functions
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class CosineSimilaritySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("native expression matches the reference Scala implementation bit-for-bit") {
    import spark.implicits._
    val rng = new java.util.Random(5)
    val rows = (0 until 200).map { i =>
      val a = Array.fill(64)(rng.nextFloat() * 2 - 1)
      val b = if (i % 7 == 0) Array.empty[Float] else Array.fill(64)(rng.nextFloat() * 2 - 1)
      (a.toSeq, b.toSeq)
    }
    val df = rows.toDF("a", "b")
    val got = df.select(Similarity.cosineCol($"a", $"b")).as[Double].collect()
    val expected = rows.map { case (a, b) => Similarity.cosine(a.toArray, b.toArray) }
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g === e) }
  }

  test("registered as SQL function cosine_f32; codegen plan") {
    import spark.implicits._
    Functions.register(spark)
    val df = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)), (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)))
      .toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val out = spark.sql("SELECT cosine_f32(a, b) AS c FROM vecs").as[Double].collect().sorted
    assert(out(0) === 0.0 && out(1) === 1.0)
    // the expression stays inside whole-stage codegen (no ScalaUDF node);
    // use a real file scan — a local relation is folded at plan time
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.createOrReplaceTempView("emb_t")
    val plan = spark.sql("SELECT cosine_f32(embedding, embedding) FROM emb_t")
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [cosine_f32("), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("null inputs yield null (null-intolerant binary expression)") {
    Functions.register(spark)
    val out = spark.sql(
      "SELECT cosine_f32(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))")
      .collect()(0)
    assert(out.isNullAt(0))
  }
}
