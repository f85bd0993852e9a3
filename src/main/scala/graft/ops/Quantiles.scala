package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles as a distributed plan instead of Spark's
  * `percentile()` ObjectAggregate.
  *
  * `percentile()` (Catalyst `Percentile`) collects EVERY value of a group
  * into an in-memory OpenHashMap inside the aggregation buffer — at 100 TB a
  * single group's values must fit on one executor, which is exactly the
  * collect-to-one-node shape this engine avoids everywhere else. This
  * operator computes the same number with ordinary relational pieces:
  *
  *   1. `groupBy(group, value).count()` — a hash aggregate with map-side
  *      combine; the shuffle carries one row per DISTINCT (group, value),
  *      so bounded-domain columns (quantities, prices with fixed decimals,
  *      ages, scores) compress massively before any sort.
  *   2. a per-group running sum over the distinct values (window ordered by
  *      value) assigns each value its rank interval [cum-c, cum).
  *   3. the floor/ceil ranks of position p·(n-1) are located with a
  *      conditional aggregate — no second pass over the raw data.
  *
  * Interpolation uses Spark's own `Percentile.getPercentile` formula
  * `(ceil-pos)·v_floor + (pos-floor)·v_ceil` (with the exact-rank special
  * case), so results are bit-identical to `percentile()` and keep matching
  * a DuckDB `quantile_cont` oracle after 4-decimal rounding.
  *
  * Scale note: stage 2's window partitions by the GROUP key, so per-group
  * parallelism is bounded by the distinct-value count, not the row count —
  * the right shape when values repeat. For few groups over a continuous
  * high-cardinality column at extreme scale, exactness itself is the
  * bottleneck; use `approx_percentile` (t-digest) and its error bound
  * instead.
  */
object Quantiles {

  /** One row per group; for each `(p, outName)` spec an exact interpolated
    * percentile of `valueCol` named `outName`. Multiple specs share the
    * single count+cumsum pass.
    */
  def exactInterpolated(df: DataFrame, groupCols: Seq[String], valueCol: String,
                        specs: Seq[(Double, String)]): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty (global percentiles: group by a literal)")
    val g = groupCols.map(col)
    val counts = df
      // percentile() ignores null values; without this filter they would
      // occupy ranks (nulls sort first in the cumsum window) and shift
      // every bracket
      .where(col(valueCol).isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("_c"))
    val wCum = Window.partitionBy(g: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
    val ranked = counts
      .withColumn("_cum", sum(col("_c")).over(wCum))
      .withColumn("_n", sum(col("_c")).over(wAll))

    def pos(p: Double): Column = lit(p) * (col("_n") - 1).cast("double")
    // value covers ranks [_cum - _c, _cum)
    def covers(rank: Column): Column =
      rank >= col("_cum") - col("_c") && rank < col("_cum")

    val aggs = specs.flatMap { case (p, nm) =>
      Seq(
        max(when(covers(floor(pos(p))), col(valueCol).cast("double"))).as(s"_vf_$nm"),
        max(when(covers(ceil(pos(p))), col(valueCol).cast("double"))).as(s"_vc_$nm"),
        max(col("_n")).as(s"_n_$nm"))
    }
    val agged = ranked.groupBy(g: _*).agg(aggs.head, aggs.drop(1): _*)

    val result = specs.foldLeft(agged) { case (d, (p, nm)) =>
      val position = lit(p) * (col(s"_n_$nm") - 1).cast("double")
      val lo = floor(position)
      val hi = ceil(position)
      // both special cases mirror Percentile.getPercentile exactly: integral
      // rank, and floor/ceil ranks falling inside the same value's interval
      d.withColumn(nm,
        when(lo === hi || col(s"_vf_$nm") === col(s"_vc_$nm"), col(s"_vf_$nm"))
          .otherwise((hi - position) * col(s"_vf_$nm") +
            (position - lo) * col(s"_vc_$nm")))
    }.select((g ++ specs.map { case (_, nm) => col(nm) }): _*)
    // a group whose values are ALL null vanished at the null filter;
    // percentile() returns it with a NULL result — restore it (<=> join so
    // NULL group keys still match, as everywhere else in this engine)
    val allGroups = df.select(g: _*).distinct()
    val joinCond = groupCols.map(c => allGroups(c) <=> result(c)).reduce(_ && _)
    allGroups.join(result, joinCond, "left")
      .select(groupCols.map(allGroups(_)) ++ specs.map { case (_, nm) => result(nm) }: _*)
  }
}
