package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Morton (Z-order) bit interleave of two non-negative longs, the kernel of
  * multi-dimensional data clustering ([[graft.ops.Layout]]).
  *
  * Sorting by the interleaved value makes rows close in BOTH dimensions
  * land in the same files, so parquet min/max stats prune scans on either
  * column — linear sort only ever prunes its leading column. The interleave
  * is the standard O(log w) magic-mask bit spread (public-domain
  * "Interleave bits by Binary Magic Numbers", Stanford bit-twiddling
  * hacks), not a per-bit loop: 12 shift/mask ops per operand, branch-free,
  * whole-stage-codegen friendly.
  *
  * Inputs must already be normalized to [0, 2^31): callers map raw values
  * to rank/range space first (see Layout). Bits above 31 are masked off —
  * the interleave of two 31-bit values fills 62 bits and stays positive.
  */
case class ZOrderBits(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ZOrderBits requires (bigint, bigint), got ${left.dataType} and ${right.dataType}")

  override def dataType: DataType = LongType

  @inline private def spread(v0: Long): Long = {
    var x = v0 & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      def spreadCode(v: String, out: String): String =
        s"""
           |long $out = $v & 0x7FFFFFFFL;
           |$out = ($out | ($out << 16)) & 0x0000FFFF0000FFFFL;
           |$out = ($out | ($out << 8)) & 0x00FF00FF00FF00FFL;
           |$out = ($out | ($out << 4)) & 0x0F0F0F0F0F0F0F0FL;
           |$out = ($out | ($out << 2)) & 0x3333333333333333L;
           |$out = ($out | ($out << 1)) & 0x5555555555555555L;
         """.stripMargin
      s"""
         |${spreadCode(a, x)}
         |${spreadCode(b, y)}
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderBits {
  /** Column form: interleave two normalized [0, 2^31) long columns. */
  def zorder(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(ZOrderBits(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))
}
