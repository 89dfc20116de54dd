package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Seeded fuzz sweep for the batched trainer's soundness: tiny alphabets
  * maximize merge interaction (linking trigrams, dense tied counts,
  * same-batch concatenation collisions, symbol resurrection pressure) —
  * exactly the regime where an unsound acceptance rule would diverge from
  * the sequential order. The sequential reference is the LOCAL exact
  * trainer (itself pinned equal to the distributed sequential loop by
  * BpeBatchSpec), so each corpus costs only the batched path's jobs.
  */
class BpeBatchFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("8 seeded corpora, alphabet 4-7: batched(K=25) == sequential(K=25)") {
    import spark.implicits._
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val alphabet = 4 + rnd.nextInt(4)
      val words = (0 until 40).map { _ =>
        val len = 2 + rnd.nextInt(8)
        (0 until len).map(_ => ('a' + rnd.nextInt(alphabet)).toChar).mkString
      }
      val docs = words.zipWithIndex.map { case (w, i) =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(6))(w).mkString(" "))
      }.toDF("doc_id", "text")
      def merges(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("merge_rank").collect()
          .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
          .toSeq
      val seq = merges(Bpe.train(docs, numMerges = 25))
      assert(Bpe.lastTrainRounds == 0)
      val bat = merges(
        Bpe.train(docs, numMerges = 25, batchCandidates = 16, localVocabLimit = 0))
      assert(seq == bat,
        s"seed=$seed alphabet=$alphabet diverged:\n$seq\nvs\n$bat")
    }
  }
}
