package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit SimHash of a text column — the
  * signature stage of [[graft.ops.Dedup.simhashNearDups]] without the
  * Dataset object boundary (no DeserializeToObject/SerializeFromObject pair
  * around a mapPartitions, no Tuple2 encoder work; the call stays inside
  * the generated stage and the scan above it keeps column pruning).
  *
  * Semantics are exactly [[graft.ops.Dedup.simhashOf]] — the codegen calls
  * that same function (via the object's static forwarder), so expression
  * and kernel can never drift.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  protected override def nullSafeEval(input: Any): Any =
    graft.ops.Dedup.simhashOf(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.Dedup.simhashOf($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
