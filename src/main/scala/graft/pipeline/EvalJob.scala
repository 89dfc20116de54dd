package graft.pipeline

import graft.align.{AlignKernel, BBox, Scoring}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  /** Intersection area as a pure Column expression (BBox.intersectArea,
    * evaluate_text_alignment.py:16-31): dx*dy when both positive, else 0.
    * Long arithmetic mirrors the Scala kernel exactly.
    */
  def interCol(gUlx: Column, gUly: Column, gLrx: Column, gLry: Column,
               pUlx: Column, pUly: Column, pLrx: Column, pLry: Column): Column = {
    val dx = least(gLrx, pLrx).cast("long") - greatest(gUlx, pUlx)
    val dy = least(gLry, pLry).cast("long") - greatest(gUly, pUly)
    when(dx > 0 && dy > 0, dx * dy).otherwise(lit(0L))
  }

  /** Per-GT-span scored rows: (url, gt_seq, iou, range_iou) — one row per
    * surviving (dict-collapsed) GT span, zero-filled where no candidate
    * matched. Exact values (single integer-ratio divisions), independent of
    * plan/partitioning — the hash-stable form for oracles.
    *
    * All bbox math is pure Column arithmetic (codegen'd — no UDF boxing in
    * the theta-join hot path); the Scala BBox functions remain the unit-test
    * single-row form.
    *
    * @param gt   ground-truth spans: (url, seq, syl, ulx, uly, lrx, lry)
    * @param pred predicted spans: same schema
    */
  def evaluatePerSpan(gt: DataFrame, pred: DataFrame): DataFrame = {
    // Reference quirk replicated (evaluate_text_alignment.py:109-131): the
    // per-document score dict is keyed by box['syl'], so GT spans with the
    // SAME syllable text collapse — the LAST occurrence (in GT order) wins —
    // and the mean runs over distinct GT syllable texts.
    val lastPerSyl = Window.partitionBy(col("url"), col("gt_syl"))
      .orderBy(col("gt_seq").desc)
    val g = gt.select(col("url"), col("seq").as("gt_seq"), col("syl").as("gt_syl"),
      col("ulx").as("g_ulx"), col("uly").as("g_uly"),
      col("lrx").as("g_lrx"), col("lry").as("g_lry"))
      .withColumn("syl_rn", row_number().over(lastPerSyl))
      .filter(col("syl_rn") === 1)
      .drop("syl_rn")
    val p = pred.select(col("url"), col("seq").as("p_seq"), col("syl").as("p_syl"),
      col("ulx").as("p_ulx"), col("uly").as("p_uly"),
      col("lrx").as("p_lrx"), col("lry").as("p_lry"))

    val inter = interCol(
      col("g_ulx"), col("g_uly"), col("g_lrx"), col("g_lry"),
      col("p_ulx"), col("p_uly"), col("p_lrx"), col("p_lry"))

    // substring theta-join within each document (equi on url, theta on syl)
    val joined = g.join(p, Seq("url"))
      .filter(col("gt_syl").contains(col("p_syl")) || col("p_syl").contains(col("gt_syl")))
      .withColumn("inter", inter)

    // argmax-per-GT-span: FIRST max in prediction order (reference
    // `ints.index(max(ints))`, evaluate_text_alignment.py:127)
    val w = Window.partitionBy(col("url"), col("gt_seq"))
      .orderBy(col("inter").desc, col("p_seq").asc)

    // IOU (unclamped reference form — but only evaluated under inter > 0,
    // where areaInt == inter; evaluate_text_alignment.py:34-53) and
    // char-range IOU, both as Column arithmetic
    val areaG = (col("g_lrx") - col("g_ulx")).cast("long") * (col("g_lry") - col("g_uly"))
    val areaP = (col("p_lrx") - col("p_ulx")).cast("long") * (col("p_lry") - col("p_uly"))
    val iouExpr = col("inter").cast("double") / (areaG + areaP - col("inter"))
    val rInter = greatest(lit(0), least(col("g_lrx"), col("p_lrx")) - greatest(col("g_ulx"), col("p_ulx")))
    val rLenG = greatest(lit(0), col("g_lrx") - col("g_ulx"))
    val rLenP = greatest(lit(0), col("p_lrx") - col("p_ulx"))
    val rUnion = rLenG + rLenP - rInter
    val rangeIouExpr = when(rUnion <= 0, lit(0.0))
      .otherwise(rInter.cast("double") / rUnion)

    val best = joined
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      // reference zeroes the score when no candidate overlaps (:124-126)
      .withColumn("iou", when(col("inter") > 0, iouExpr).otherwise(lit(0.0)))
      .withColumn("range_iou", when(col("inter") > 0, rangeIouExpr).otherwise(lit(0.0)))
      .select(col("url"), col("gt_seq"), col("iou"), col("range_iou"))

    // GT spans with no substring candidate score 0 (:119-121)
    val allGt = g.select(col("url"), col("gt_seq"))
    allGt.join(best, Seq("url", "gt_seq"), "left")
      .na.fill(0.0, Seq("iou", "range_iou"))
  }

  /** Per-url mean IOU / mean char-range IOU over (dict-collapsed) GT spans.
    *
    * Deterministic mean: folds scores in ascending gt_seq order (double
    * addition is order-sensitive; a plain avg() would hash-differ across
    * plans/parallelism). Per-document span counts are bounded, so the
    * collect_list is safe. The reference's np.mean sums in dict order — the
    * value set is identical; only the last-ulp summation order is pinned
    * differently here.
    */
  def evaluate(gt: DataFrame, pred: DataFrame): DataFrame =
    evaluatePerSpan(gt, pred)
      .groupBy(col("url"))
      .agg(
        expr("array_sort(collect_list(struct(gt_seq, iou, range_iou)))").as("xs"))
      .select(col("url"),
        (expr("aggregate(xs, 0.0D, (a, x) -> a + x.iou)") / size(col("xs"))).as("mean_iou"),
        (expr("aggregate(xs, 0.0D, (a, x) -> a + x.range_iou)") / size(col("xs"))).as("mean_range_iou"),
        size(col("xs")).as("n_gt_spans"))

  /** One-shuffle evaluation of two span systems over the same corpus.
    *
    * Input: the [[AlignJob.spansMulti]] table (system, url, seq, syl, ulx,
    * uly, lrx, lry). Per-document span counts are bounded (a page has a
    * bounded syllable count), so grouping a document's two span sets into
    * one task and scoring them in a typed pass is the cheaper plan than the
    * url-equi theta-join: ONE hash shuffle of the flat span rows replaces
    * the candidate-pair shuffle (~|gt|·|pred| rows per document) plus two
    * window shuffles. Row-for-row identical to
    * `evaluate(gt, pred)` — same collapse, same first-max argmax, same
    * fold order (asserted in tests and by the shared golden oracle).
    */
  def evaluateGrouped(both: DataFrame, gtSystem: String, predSystem: String): DataFrame = {
    val spark = both.sparkSession
    import spark.implicits._
    both.select(col("system"), col("url"), col("seq"), col("syl"),
        col("ulx"), col("uly"), col("lrx"), col("lry"))
      .as[(String, String, Int, String, Int, Int, Int, Int)]
      .groupByKey(_._2)
      .flatMapGroups { (url, it) =>
        val rows = it.toArray
        def spansOf(sys: String): Array[(Int, String, Int, Int, Int, Int)] =
          rows.iterator.filter(_._1 == sys)
            .map(r => (r._3, r._4, r._5, r._6, r._7, r._8))
            .toArray.sortBy(_._1)
        val gt = spansOf(gtSystem)
        val pred = spansOf(predSystem)
        if (gt.isEmpty) Iterator.empty
        else {
          // dict collapse: last GT span per syllable text
          val byText = new scala.collection.mutable.LinkedHashMap[String, (Int, String, Int, Int, Int, Int)]
          gt.foreach(g => byText.put(g._2, g))
          val perSpan = byText.valuesIterator.map { g =>
            val cands = pred.filter(p => g._2.contains(p._2) || p._2.contains(g._2))
            if (cands.isEmpty) (g._1, 0.0, 0.0)
            else {
              // first max in pred (seq) order == (inter desc, p_seq asc)
              val best = cands.maxBy(p =>
                BBox.intersectArea(g._3, g._4, g._5, g._6, p._3, p._4, p._5, p._6))
              val inter = BBox.intersectArea(g._3, g._4, g._5, g._6,
                best._3, best._4, best._5, best._6)
              if (inter > 0)
                (g._1,
                  BBox.iou(g._3, g._4, g._5, g._6, best._3, best._4, best._5, best._6),
                  BBox.rangeIou(g._3, g._5, best._3, best._5))
              else (g._1, 0.0, 0.0)
            }
          }.toArray.sortBy(_._1) // fold in ascending gt_seq order, like evaluate()
          var si = 0.0; var sr = 0.0
          perSpan.foreach { case (_, i, r) => si += i; sr += r }
          Iterator.single((url, si / perSpan.length, sr / perSpan.length, perSpan.length))
        }
      }
      .toDF("url", "mean_iou", "mean_range_iou", "n_gt_spans")
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
          // same dict-keyed collapse as evaluate(): last GT span per
          // syllable text wins (evaluate_text_alignment.py:119-129);
          // key order pinned to first occurrence so the double mean is
          // deterministic (hash-map order would wobble the last ulp)
          val byText = new scala.collection.mutable.LinkedHashMap[String, graft.align.SylBox]
          gtSpans.foreach(sp => byText.put(sp.syl, sp))
          val gtCollapsed = byText.valuesIterator.toVector
          if (gtCollapsed.isEmpty) 1.0
          else {
            val perGt = gtCollapsed.map { g =>
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
