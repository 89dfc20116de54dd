package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

final case class BBox4(ulx: Int, uly: Int, lrx: Int, lry: Int)

/** Union-bbox fold — the relational form of the reference's span-union
  * (alignToOCR.py:322-323: `new_ul = (min ulx, min uly)`,
  * `new_lr = (max lrx, max lry)`), SURVEY.md §2h's one genuinely
  * Aggregator-shaped fold. Typed `Aggregator` → partial (map-side) + final
  * merge for free; registered as the SQL UDAF `bbox_union`.
  */
class BBoxUnionAggregator extends Aggregator[BBox4, BBox4, BBox4] {
  override def zero: BBox4 = BBox4(Int.MaxValue, Int.MaxValue, Int.MinValue, Int.MinValue)

  override def reduce(b: BBox4, a: BBox4): BBox4 = merge(b, a)

  override def merge(a: BBox4, b: BBox4): BBox4 = BBox4(
    math.min(a.ulx, b.ulx), math.min(a.uly, b.uly),
    math.max(a.lrx, b.lrx), math.max(a.lry, b.lry))

  override def finish(reduction: BBox4): BBox4 = reduction

  override def bufferEncoder: Encoder[BBox4] = Encoders.product[BBox4]
  override def outputEncoder: Encoder[BBox4] = Encoders.product[BBox4]
}
