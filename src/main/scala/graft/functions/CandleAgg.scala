package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** One-pass OHLCV aggregate: given (orderingTs, price, size) rows, produces
  * struct(open, high, low, close, volume) where open/close are the prices at
  * the min/max orderingTs.
  *
  * Why: the composed form needs four separate aggregate buffers
  * (min_by + max + min + max_by), each min_by/max_by carrying a (value,
  * ordering) pair. This DeclarativeAggregate keeps ONE seven-slot buffer and
  * is pure expressions — codegen-friendly, map-side partial aggregation for
  * free, and the natural shape for a candle engine's hottest aggregation.
  * Semantics match Resample.ohlcv exactly when orderingTs is unique per
  * group (candle data: it is).
  */
case class CandleAgg(ts: Expression, price: Expression, size: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(ts, price, size)
  override def nullable: Boolean = true

  // name the user's argument in the error, not the generated buffer
  // attributes a type mismatch would otherwise surface deep inside the
  // update expressions ("differing types in If(minTs, ts)…")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def bad(what: String, got: DataType, want: String) =
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"candle() $what must be $want, got ${got.simpleString}")
    if (ts.dataType != LongType) bad("ordering ts", ts.dataType, "bigint")
    else if (price.dataType != DoubleType) bad("price", price.dataType, "double")
    else if (size.dataType != DoubleType) bad("size", size.dataType, "double")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType = StructType(Seq(
    StructField("open", DoubleType), StructField("high", DoubleType),
    StructField("low", DoubleType), StructField("close", DoubleType),
    StructField("volume", DoubleType)))

  private lazy val minTs = AttributeReference("minTs", LongType)()
  private lazy val openA = AttributeReference("open", DoubleType)()
  private lazy val highA = AttributeReference("high", DoubleType)()
  private lazy val lowA = AttributeReference("low", DoubleType)()
  private lazy val maxTs = AttributeReference("maxTs", LongType)()
  private lazy val closeA = AttributeReference("close", DoubleType)()
  private lazy val volA = AttributeReference("vol", DoubleType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(minTs, openA, highA, lowA, maxTs, closeA, volA)

  private val nullL = Literal(null, LongType)
  private val nullD = Literal(null, DoubleType)

  override lazy val initialValues: Seq[Expression] =
    Seq(nullL, nullD, nullD, nullD, nullL, nullD, Literal(0.0))

  private def skip = Or(IsNull(ts), IsNull(price))

  override lazy val updateExpressions: Seq[Expression] = {
    val isNewMin = Or(IsNull(minTs), LessThan(ts, minTs))
    val isNewMax = Or(IsNull(maxTs), GreaterThan(ts, maxTs))
    Seq(
      If(skip, minTs, If(isNewMin, ts, minTs)),
      If(skip, openA, If(isNewMin, price, openA)),
      If(skip, highA, If(Or(IsNull(highA), GreaterThan(price, highA)), price, highA)),
      If(skip, lowA, If(Or(IsNull(lowA), LessThan(price, lowA)), price, lowA)),
      If(skip, maxTs, If(isNewMax, ts, maxTs)),
      If(skip, closeA, If(isNewMax, price, closeA)),
      If(skip, volA, Add(volA, Coalesce(Seq(size, Literal(0.0))))),
    )
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    def pickByTs(lTs: Expression, rTs: Expression, lV: Expression, rV: Expression,
                 leftWins: Expression): (Expression, Expression) = {
      val tsOut = If(IsNull(lTs), rTs, If(IsNull(rTs), lTs, If(leftWins, lTs, rTs)))
      val vOut = If(IsNull(lTs), rV, If(IsNull(rTs), lV, If(leftWins, lV, rV)))
      (tsOut, vOut)
    }
    val (minOut, openOut) = pickByTs(minTs.left, minTs.right, openA.left, openA.right,
      LessThanOrEqual(minTs.left, minTs.right))
    val (maxOut, closeOut) = pickByTs(maxTs.left, maxTs.right, closeA.left, closeA.right,
      GreaterThanOrEqual(maxTs.left, maxTs.right))
    def nullSafeExtreme(l: Expression, r: Expression, cmp: (Expression, Expression) => Expression) =
      If(IsNull(l), r, If(IsNull(r), l, If(cmp(l, r), l, r)))
    Seq(
      minOut, openOut,
      nullSafeExtreme(highA.left, highA.right, GreaterThan(_, _)),
      nullSafeExtreme(lowA.left, lowA.right, LessThan(_, _)),
      maxOut, closeOut,
      Add(volA.left, volA.right),
    )
  }

  override lazy val evaluateExpression: Expression =
    If(IsNull(minTs), Literal(null, dataType),
      CreateNamedStruct(Seq(
        Literal("open"), openA, Literal("high"), highA, Literal("low"), lowA,
        Literal("close"), closeA, Literal("volume"), volA)))

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(ts = newChildren(0), price = newChildren(1), size = newChildren(2))
}

object CandleAgg {
  /** Column API: one-pass candle aggregate. `ts` must be a LONG ordering
    * column (epoch nanos/micros/seconds — only ordering matters).
    */
  def candle(ts: Column, price: Column, size: Column): Column =
    GraftColumnBridge.toColumn(
      CandleAgg(GraftColumnBridge.toExpression(ts),
        GraftColumnBridge.toExpression(price),
        GraftColumnBridge.toExpression(size)).toAggregateExpression())
}
