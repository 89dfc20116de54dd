package graft.pipeline

import graft.align.{AlignKernel, BBox, Scoring}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Alignment evaluation — the reference's metrics layer
  * (evaluate_text_alignment.py:109-131, SURVEY.md O40–O44) re-expressed
  * relationally: per ground-truth span, candidates are predicted spans of the
  * same document whose syllable substring-matches either way
  * (`x.syl in box.syl or box.syl in x.syl`), the max-intersection candidate
  * wins (FIRST max in prediction order — `ints.index(max(ints))`), scored by
  * bbox IOU and char-range IOU (the black-area analogue), averaged per doc.
  */
object EvalJob {

  /** @param gt   ground-truth spans: (url, seq, syl, ulx, uly, lrx, lry)
    * @param pred predicted spans: same schema
    * @return per-url mean IOU / mean range-IOU over GT spans
    */
  def evaluate(gt: DataFrame, pred: DataFrame): DataFrame = {
    val iouUdf = udf((a1: Int, b1: Int, c1: Int, d1: Int,
                      a2: Int, b2: Int, c2: Int, d2: Int) =>
      BBox.iou(a1, b1, c1, d1, a2, b2, c2, d2))
    val interUdf = udf((a1: Int, b1: Int, c1: Int, d1: Int,
                        a2: Int, b2: Int, c2: Int, d2: Int) =>
      BBox.intersectArea(a1, b1, c1, d1, a2, b2, c2, d2))
    val rangeIouUdf = udf((u1: Int, l1: Int, u2: Int, l2: Int) =>
      BBox.rangeIou(u1, l1, u2, l2))

    val g = gt.select(col("url"), col("seq").as("gt_seq"), col("syl").as("gt_syl"),
      col("ulx").as("g_ulx"), col("uly").as("g_uly"),
      col("lrx").as("g_lrx"), col("lry").as("g_lry"))
    val p = pred.select(col("url"), col("seq").as("p_seq"), col("syl").as("p_syl"),
      col("ulx").as("p_ulx"), col("uly").as("p_uly"),
      col("lrx").as("p_lrx"), col("lry").as("p_lry"))

    // substring theta-join within each document (equi on url, theta on syl)
    val joined = g.join(p, Seq("url"))
      .filter(col("gt_syl").contains(col("p_syl")) || col("p_syl").contains(col("gt_syl")))
      .withColumn("inter", interUdf(
        col("g_ulx"), col("g_uly"), col("g_lrx"), col("g_lry"),
        col("p_ulx"), col("p_uly"), col("p_lrx"), col("p_lry")))

    // argmax-per-GT-span: FIRST max in prediction order (reference
    // `ints.index(max(ints))`, evaluate_text_alignment.py:127)
    val w = Window.partitionBy(col("url"), col("gt_seq"))
      .orderBy(col("inter").desc, col("p_seq").asc)
    val best = joined
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      // reference zeroes the score when no candidate overlaps (:124-126)
      .withColumn("iou", when(col("inter") > 0, iouUdf(
        col("g_ulx"), col("g_uly"), col("g_lrx"), col("g_lry"),
        col("p_ulx"), col("p_uly"), col("p_lrx"), col("p_lry"))).otherwise(lit(0.0)))
      .withColumn("range_iou", when(col("inter") > 0, rangeIouUdf(
        col("g_ulx"), col("g_lrx"), col("p_ulx"), col("p_lrx"))).otherwise(lit(0.0)))
      .select(col("url"), col("gt_seq"), col("iou"), col("range_iou"))

    // GT spans with no substring candidate score 0 (:119-121)
    val allGt = g.select(col("url"), col("gt_seq"))
    allGt.join(best, Seq("url", "gt_seq"), "left")
      .na.fill(0.0, Seq("iou", "range_iou"))
      .groupBy(col("url"))
      .agg(avg(col("iou")).as("mean_iou"),
        avg(col("range_iou")).as("mean_range_iou"),
        count(lit(1)).as("n_gt_spans"))
  }

  /** Scoring-parameter grid search (evaluate_text_alignment.py:178-198,
    * SURVEY.md O44), distributed: the param grid is the Dataset, the fixture
    * pages are broadcast, each task aligns the fixtures under its params and
    * scores against fixed ground-truth spans -- the DEFAULT-scoring
    * alignment of the same noisy stream (the shared coordinate system; the
    * reference scores against fixed human GT on the same page image).
    * mean_score is agreement-with-default, so the default combo scores
    * exactly 1.0. Returns (params, mean_score) sorted ascending like the
    * reference's final sort.
    */
  def gridSearch(
      spark: SparkSession,
      fixtures: Seq[(String, String)], // (transcript, noisyStream)
      matches: Seq[Int] = Seq(5, 8, 11),
      mismatches: Seq[Int] = Seq(-4, -7, -10),
      gapOpensX: Seq[Int] = Seq(-2, -5, -7),
      gapOpensY: Seq[Int] = Seq(-2, -5, -7),
      gapExtendsX: Seq[Int] = Seq(0, -3, -5),
      gapExtendsY: Seq[Int] = Seq(0, -3, -5)): DataFrame = {
    import spark.implicits._

    // ground truth: default-scoring spans on the SAME noisy stream — the
    // shared coordinate system (the reference scores param combos against
    // fixed human GT boxes on the same page image; the degeneration fixes
    // the default alignment as GT)
    val gtByFixture = fixtures.map { case (tra, noisy) =>
      val stream = noisy.zipWithIndex.map { case (c, k) => graft.align.CharBox.at(c, k) }.toVector
      AlignKernel.processStream(tra, stream, Scoring.Default).spans
    }
    val fixturesB = spark.sparkContext.broadcast(fixtures)
    val gtB = spark.sparkContext.broadcast(gtByFixture)

    val grid = for {
      m <- matches; mm <- mismatches; gox <- gapOpensX
      goy <- gapOpensY; gex <- gapExtendsX; gey <- gapExtendsY
    } yield (m, mm, gox, goy, gex, gey)

    grid.toDS()
      .repartition(spark.sparkContext.defaultParallelism)
      .map { case (m, mm, gox, goy, gex, gey) =>
        val sc = Scoring(m, mm, gox, goy, gex, gey)
        val scores = fixturesB.value.zip(gtB.value).map { case ((tra, noisy), gtSpans) =>
          val stream = noisy.zipWithIndex.map { case (c, k) => graft.align.CharBox.at(c, k) }.toVector
          val pred = AlignKernel.processStream(tra, stream, sc).spans
          if (gtSpans.isEmpty) 1.0
          else {
            val perGt = gtSpans.map { g =>
              val cands = pred.filter(p => g.syl.contains(p.syl) || p.syl.contains(g.syl))
              if (cands.isEmpty) 0.0
              else {
                val best = cands.maxBy(p =>
                  BBox.intersectArea(g.ulx, g.uly, g.lrx, g.lry, p.ulx, p.uly, p.lrx, p.lry))
                if (BBox.intersectArea(g.ulx, g.uly, g.lrx, g.lry,
                    best.ulx, best.uly, best.lrx, best.lry) > 0)
                  BBox.rangeIou(g.ulx, g.lrx, best.ulx, best.lrx)
                else 0.0
              }
            }
            perGt.sum / perGt.length
          }
        }
        (m, mm, gox, goy, gex, gey, scores.sum / scores.length)
      }
      .toDF("match", "mismatch", "gap_open_x", "gap_open_y",
        "gap_extend_x", "gap_extend_y", "mean_score")
      .orderBy(col("mean_score"), col("match"), col("mismatch"),
        col("gap_open_x"), col("gap_open_y"), col("gap_extend_x"), col("gap_extend_y"))
  }
}
