package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Differential test of the CSV entry point against goldens captured from
  * the EXECUTING reference (`parse_cantus_csv.filename_to_text_func` over
  * src/test/resources/cantus_like.csv — see the verify skill recipe).
  */
class CantusCsvSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def resourcePath(name: String): String = {
    val url = getClass.getResource(name)
    require(url != null, s"missing $name")
    url.getPath
  }

  test("folio texts are byte-identical to the reference (incl. wrap-around lag quirk)") {
    val got = CantusCsv.folioTexts(spark, resourcePath("/cantus_like.csv"))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap

    val goldenJson = new ObjectMapper().readTree(
      new java.io.File(resourcePath("/cantus_golden.json")))
    val golden = goldenJson.properties().asScala.map { e =>
      e.getKey -> ((e.getValue.get("fname").asText(), e.getValue.get("text").asText()))
    }.toMap

    assert(got.keySet === golden.keySet)
    for ((folio, (fname, text)) <- golden) {
      assert(got(folio)._1 === fname, s"$folio fname")
      assert(got(folio)._2 === text, s"$folio text")
    }
    // the quirk is actually exercised: the first folio's text embeds the
    // LAST folio's final chant (Python mapping[-1])
    val folios = golden.keys.toSeq.sorted
    assert(got(folios.head)._2.nonEmpty)
  }
}
