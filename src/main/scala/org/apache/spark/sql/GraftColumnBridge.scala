package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between Catalyst `Expression`s and the public `Column` API.
  *
  * Spark 4 made the Column <-> Expression converters `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so custom native
  * expressions need this one-file shim inside the sql package — the same
  * technique Spark connector libraries use.
  */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register the graft SQL functions on a live session (the extensions
    * mechanism only fires at session construction; the function registry is
    * private[sql], hence this shim).
    */
  def registerTempFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      (c: Seq[Expression]) => graft.functions.DotProduct(c(0), c(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_polyhash",
      (c: Seq[Expression]) => graft.functions.PolyHash(c.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_shingles",
      (c: Seq[Expression]) => c(1) match {
        case catalyst.expressions.Literal(v: Int, _) => graft.functions.WordShingles(c.head, v)
        case other => throw new IllegalArgumentException(s"n must be an int literal, got $other")
      }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_simhash",
      (c: Seq[Expression]) => c.lift(1).map {
        case catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(s"bits must be an int literal, got $other")
      }.fold(graft.functions.SimHash(c.head, graft.ops.Dedup.DefaultSimhashBits))(
        b => graft.functions.SimHash(c.head, b)),
      "scala_udf")
    reg.createOrReplaceTempFunction("graft_textstats",
      (c: Seq[Expression]) => graft.functions.TextStats(c.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_zorder",
      (c: Seq[Expression]) => graft.functions.ZOrderBits(c(0), c(1)), "scala_udf")
    val tvfReg = spark.sessionState.tableFunctionRegistry
    tvfReg.createOrReplaceTempFunction("graft_sessionize",
      graft.functions.GraftTvf.sessionize, "scala_udf")
    tvfReg.createOrReplaceTempFunction("graft_asof",
      graft.functions.GraftTvf.asof, "scala_udf")
  }
}
