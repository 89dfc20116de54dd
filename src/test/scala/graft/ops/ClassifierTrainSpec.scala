package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class ClassifierTrainSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("expPortable tracks exp within series error; mirror point values") {
    val xs = Seq(-30.0, -7.25, -1.0, -0.01, 0.0, 0.3, 1.0, 5.0, 30.0)
    xs.foreach { x =>
      val rel = math.abs(Classifier.expPortable(x) - math.exp(x)) / math.exp(x)
      assert(rel < 1e-13, s"x=$x rel=$rel")
    }
    assert(Classifier.expPortable(0.0) === 1.0)
    // bit-exact parity with the clean-room mirror (computed independently)
    assert(Classifier.expPortable(1.0) === 2.7182818284590455)
    assert(Classifier.expPortable(-7.25) === 0.0007101743888425491)
    assert(Classifier.sigmoidPortable(2.5) === 0.9241418199787566)
    // clamp: anything past ±30 saturates to the clamped value
    assert(Classifier.sigmoidPortable(1e9) ===
      Classifier.sigmoidPortable(30.0))
    assert(Classifier.sigmoidPortable(-1e9) ===
      Classifier.sigmoidPortable(-30.0))
  }

  test("trainLocal learns a separable task bit-identically to the mirror") {
    val texts = Seq("the quick brown fox", "le chat noir dort",
      "the lazy dog sleeps", "der hund schlaeft tief",
      "the cat runs fast", "el perro corre")
    val ys = Array(1.0, 0.0, 1.0, 0.0, 1.0, 0.0)
    val feats = texts.map(Classifier.featuresOf).toArray
    val m = Classifier.trainLocal(feats, ys, epochs = 20, lr = 1.0)
    assert(m.bias === -0.21251175373789621) // mirror-computed
    val ps = feats.map { f =>
      var z = m.bias
      f.foreach { case (b, tf) =>
        val w = m.weights.getOrElse(b, 0.0)
        if (w != 0.0) z += w * tf
      }
      Classifier.sigmoidPortable(z)
    }
    assert(ps.toSeq === Seq(0.9647329885979805, 0.03863160021534507,
      0.9647329885979805, 0.03863160021534507, 0.9647329885979805,
      0.054379954644224404))
    // the task is separable: every prediction is correct
    assert(ps.map(p => if (p >= 0.5) 1.0 else 0.0).toSeq === ys.toSeq)
  }

  test("trainLogistic + predict end-to-end on a labeled frame") {
    import spark.implicits._
    val labeled = Seq(
      (1L, "aa bb cc", 1), (2L, "xx yy zz", 0),
      (3L, "aa bb dd", 1), (4L, "xx yy ww", 0))
      .toDF("doc_id", "text", "y")
    val m = Classifier.trainLogistic(labeled, epochs = 30, lr = 1.0)
    val out = Classifier.predict(labeled, m).orderBy("doc_id").collect()
    assert(out.map(_.getInt(3)).toSeq === Seq(1, 0, 1, 0))
    assert(out.forall(_.getBoolean(4)))
  }

  test("null doc_id rows drop identically on both dispatch paths") {
    import spark.implicits._
    val rows = Seq(
      (Option(1L), "aa bb cc", 1), (Option(2L), "xx yy zz", 0),
      (Option.empty[Long], "aa bb dd", 1), // null id: dropped, not crashed
      (Option(4L), "xx yy ww", 0), (Option(5L), "aa cc dd", 1))
    val labeled = rows.toDF("doc_id", "text", "y")
    val clean = rows.filter(_._1.isDefined)
      .map(r => (r._1.get, r._2, r._3)).toDF("doc_id", "text", "y")
    val withNull = Classifier.trainLogistic(labeled, epochs = 10)
    val without = Classifier.trainLogistic(clean, epochs = 10)
    assert(withNull === without) // local path: bit-identical after the drop
    // distributed path on the same null-bearing frame also just drops it
    val dist = Classifier.trainLogisticDistributed(labeled, epochs = 10)
    assert(math.abs(dist.bias - without.bias) < 1e-9)
  }

  test("over-cap corpus routes to the distributed trainer (dispatch)") {
    import spark.implicits._
    val labeled = (0L until 60L).map { i =>
      val y = (i % 2).toInt
      val t = if (y == 1) s"good fine solid w$i" else s"bad junk noisy w$i"
      (i, t, y)
    }.toDF("doc_id", "text", "y").repartition(8)
    // maxDocs = 10 forces the dispatch to trainLogisticDistributed
    val m = Classifier.trainLogistic(labeled, epochs = 15, maxDocs = 10L)
    val out = Classifier.predict(labeled, m).collect()
    assert(out.forall(_.getBoolean(4)), "distributed model must separate")
  }

  test("distributed trainer agrees with the local path under float-sum tolerance") {
    import spark.implicits._
    val labeled = (0L until 80L).map { i =>
      val y = (i % 2).toInt
      val t = if (y == 1) s"alpha beta gamma t${i % 7}"
              else s"zeta eta theta t${i % 7}"
      (i, t, y)
    }.toDF("doc_id", "text", "y").repartition(8)
    val local = Classifier.trainLogistic(labeled, epochs = 20)
    val dist = Classifier.trainLogisticDistributed(labeled, epochs = 20)
    // same featurization/sigmoid; only the gradient summation ORDER
    // differs -> reassociation-level agreement, identical support
    assert(dist.weights.keySet === local.weights.keySet)
    assert(math.abs(dist.bias - local.bias) < 1e-9)
    local.weights.foreach { case (b, wv) =>
      assert(math.abs(dist.weights(b) - wv) < 1e-9, s"bucket $b")
    }
    // and identical predictions on the training frame
    val pl = Classifier.predict(labeled, local).orderBy("doc_id")
      .collect().map(_.getInt(3)).toSeq
    val pd = Classifier.predict(labeled, dist).orderBy("doc_id")
      .collect().map(_.getInt(3)).toSeq
    assert(pl === pd)
  }

  test("features skip w==0 buckets exactly like the mirror dot fold") {
    // featuresOf is sorted ascending and deduplicates via tf counts
    val f = Classifier.featuresOf("b a b a c")
    assert(f.map(_._1).toSeq === f.map(_._1).sorted.toSeq)
    assert(f.map(_._2).sum === 5 + 4) // 5 unigram + 4 bigram occurrences
    assert(Classifier.featuresOf(null).isEmpty)
    assert(Classifier.featuresOf("").isEmpty)
  }
}
