package graft.functions

import graft.ops.{AsofJoin, EventOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Table-valued SQL surface for the engine's whole-operator semantics, so
  * the flagship operators are reachable from pure SQL:
  *
  * {{{
  *   SELECT * FROM graft_sessionize('events_view', 1800)
  *   SELECT * FROM graft_asof('exec_view', 'ctx_view', 'ts', 'symbol')
  * }}}
  *
  * Each builder resolves its view arguments against the ACTIVE session's
  * catalog, applies the same Column-API operator a Scala caller would
  * (`EventOps.sessionize`, `AsofJoin.backward`) and splices the analyzed
  * plan into the outer query — SQL and Scala callers therefore share one
  * implementation and one physical plan shape. Registered by
  * [[GraftExtensions]] (session construction) or
  * `GraftExtensions.register` (live session).
  */
object GraftTvf {

  private def str(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other =>
      throw new IllegalArgumentException(s"$what must be a string literal, got $other")
  }

  private def lng(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def csv(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** graft_sessionize(events_view, gap_seconds[, user_col]). */
  val sessionize: Seq[Expression] => LogicalPlan = { args =>
    require(args.size >= 2 && args.size <= 3,
      "usage: graft_sessionize(events_view, gap_seconds[, user_col])")
    val spark = SparkSession.active
    val events = spark.table(str(args(0), "events_view"))
    val userCol = args.lift(2).map(str(_, "user_col")).getOrElse("user_id")
    EventOps.sessionize(events, lng(args(1), "gap_seconds"), userCol)
      .queryExecution.analyzed
  }

  /** graft_asof(left_view, right_view[, on_col[, partition_cols_csv]]). */
  val asof: Seq[Expression] => LogicalPlan = { args =>
    require(args.size >= 2 && args.size <= 4,
      "usage: graft_asof(left_view, right_view[, on_col[, partition_cols_csv]])")
    val spark = SparkSession.active
    val left = spark.table(str(args(0), "left_view"))
    val right = spark.table(str(args(1), "right_view"))
    val on = args.lift(2).map(str(_, "on_col")).getOrElse("ts")
    val parts = args.lift(3).map(str(_, "partition_cols_csv")).map(csv).getOrElse(Nil)
    AsofJoin.backward(left, right, on, parts).queryExecution.analyzed
  }
}
