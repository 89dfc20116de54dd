package graft.align

/** Bounding-box evaluation metrics — ports of evaluate_text_alignment.py:16-53. */
object BBox {

  /** Overlap area, or 0 when disjoint (reference returns False ≡ falsy 0;
    * evaluate_text_alignment.py:16-31).
    */
  def intersectArea(
      ulx1: Int, uly1: Int, lrx1: Int, lry1: Int,
      ulx2: Int, uly2: Int, lrx2: Int, lry2: Int): Long = {
    val dx = math.min(lrx1, lrx2).toLong - math.max(ulx1, ulx2)
    val dy = math.min(lry1, lry2).toLong - math.max(uly1, uly2)
    if (dx > 0 && dy > 0) dx * dy else 0L
  }

  /** Intersection over union (evaluate_text_alignment.py:34-53). NOTE: the
    * reference does NOT clamp negative overlap here, so disjoint boxes can
    * yield a spurious positive ratio — replicated exactly (flagged in
    * SURVEY.md O41); callers gate on intersectArea > 0 first, as the
    * reference does (evaluate_text_alignment.py:122-128).
    */
  def iou(
      ulx1: Int, uly1: Int, lrx1: Int, lry1: Int,
      ulx2: Int, uly2: Int, lrx2: Int, lry2: Int): Double = {
    val nUlx = math.max(ulx1, ulx2)
    val nUly = math.max(uly1, uly2)
    val nLrx = math.min(lrx1, lrx2)
    val nLry = math.min(lry1, lry2)
    val areaInt = (nLrx - nUlx).toLong * (nLry - nUly)
    val area1 = (lrx1 - ulx1).toLong * (lry1 - uly1)
    val area2 = (lrx2 - ulx2).toLong * (lry2 - uly2)
    areaInt.toDouble / (area1 + area2 - areaInt)
  }

  /** Char-count IOU over span x-ranges — the graft analogue of
    * `black_area_IOU` (evaluate_text_alignment.py:56-76, SURVEY.md O42): in
    * the web-text degeneration a span's "black area" is the count of stream
    * character cells it covers, so pixel-mass IOU degenerates to interval
    * IOU over [ulx, lrx).
    */
  def rangeIou(ulx1: Int, lrx1: Int, ulx2: Int, lrx2: Int): Double = {
    val inter = math.max(0, math.min(lrx1, lrx2) - math.max(ulx1, ulx2))
    val len1 = math.max(0, lrx1 - ulx1)
    val len2 = math.max(0, lrx2 - ulx2)
    val union = len1 + len2 - inter
    if (union <= 0) 0.0 else inter.toDouble / union
  }
}
