package graft.ops

import graft.core.Timeframe
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the reference's flagship MTF operator
  * (reference: src/datalake/read/api.py:76-88 `join_mtf_exec_ctx` /
  * src/datalake/read/mtf.py:15-27 `join_asof_multi`, both `pd.merge_asof(...,
  * direction="backward")`): for each left (exec) row, attach the LATEST right
  * (context) row with right.ts <= left.ts, equal timestamps included.
  *
  * Implementation (a) of SURVEY §2.4 J1: union-tag + window-fill.
  *  - union exec rows with ctx rows, ctx value columns null on the exec side;
  *  - sort by (ts, side) with ctx rows FIRST at equal ts so a tie is visible
  *    to the exec row (merge_asof backward includes exact matches —
  *    SURVEY §7.5 item 5);
  *  - last(ctxCol, ignoreNulls) over unboundedPreceding..currentRow;
  *  - keep exec rows.
  *
  * Scale: one shuffle (the window sort), partitioned by `partitionCols`
  * (symbol/source), so a 1000-executor cluster processes symbols
  * independently; no broadcast or skew concern because per-symbol data is
  * time-ordered and bounded per day. When partitionCols is empty the window
  * is a single sorted partition — fine for tests, documented as non-scalable.
  *
  * A cheaper grid-aligned variant is [[bucketJoin]] (implementation (b)):
  * when both sides sit on aligned tf grids, the as-of parent of an exec row
  * is just the ctx bar at floor(ts, ctxTf) — an equi-join, broadcastable when
  * ctx is small (it is: ctx is coarser by construction).
  */
object AsofJoin {

  /** General backward as-of join. `right` value columns (everything except
    * `on` and `partitionCols`) are appended to `left`; suffix them before
    * calling if names collide.
    *
    * `chunk` (in units of `on` cast to long: seconds for timestamps, ns for
    * raw ts_ns) is the HOT-KEY escape hatch: with chunk > 0 the window-fill
    * runs through [[Fill]]'s two-phase chunked scan, so one dominant symbol
    * (or an unkeyed single series) splits into per-chunk partitions plus a
    * tiny carry join instead of pinning one reducer. Salting does not apply
    * here — the fill is order-dependent, so the skew tool is time-range
    * splitting, not key replication. Results are identical (CandleOpsSpec).
    */
  def backward(left: DataFrame, right: DataFrame, on: String = "ts",
               partitionCols: Seq[String] = Nil, chunk: Long = 0L): DataFrame = {
    val rightVals = right.columns.toSeq.filterNot(c => c == on || partitionCols.contains(c))
    val leftCols = left.columns.toSeq
    require(rightVals.intersect(leftCols).isEmpty,
      s"column collision: ${rightVals.intersect(leftCols).mkString(",")}")

    val rSchema = right.schema
    val lSchema = left.schema
    val leftSide = rightVals.foldLeft(left.withColumn("_side", lit(1))) { (d, c) =>
      d.withColumn(c, lit(null).cast(rSchema(c).dataType))
    }
    val rightSide = leftCols.filterNot(c => c == on || partitionCols.contains(c))
      .foldLeft(right.withColumn("_side", lit(0))) { (d, c) =>
        d.withColumn(c, lit(null).cast(lSchema(c).dataType))
      }
    val unioned = leftSide.unionByName(rightSide)
    val filled =
      if (chunk > 0L)
        // chunked two-phase fill: (on, _side) ordering keeps ctx rows
        // visible to exec rows at equal timestamps, exactly like the window
        Fill.ffill(unioned, rightVals, partitionCols, on, chunk, tie = Some("_side"))
      else {
        val w = (if (partitionCols.nonEmpty) Window.partitionBy(partitionCols.map(col): _*)
                 else Window.partitionBy())
          .orderBy(col(on).asc, col("_side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        rightVals.foldLeft(unioned) { (d, c) =>
          d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
        }
      }
    filled.where(col("_side") === 1).drop("_side")
  }

  /** Grid-aligned as-of equi-join (J1-b): valid when ctx rows sit exactly on
    * the ctxTf grid (the output of [[Resample.ohlcv]] does). Joins on
    * floor(left.ts / ctxTf), which Catalyst plans as a broadcast hash join
    * when ctx is small — no sort, no big shuffle.
    */
  def bucketJoin(left: DataFrame, right: DataFrame, ctxTf: Timeframe,
                 on: String = "ts", partitionCols: Seq[String] = Nil): DataFrame = {
    val l = left.withColumn("_bkt", Resample.bucket(on, ctxTf))
    val r = right.withColumnRenamed(on, "_bkt")
    l.join(broadcast(r), partitionCols :+ "_bkt", "left").drop("_bkt")
  }

  /** Broadcast range-interval as-of (J1-c): each ctx row gets a validity
    * interval [ts, next_ts) via lead(); exec rows left-join the single
    * covering interval. With ctx broadcast, the probe distributes over the
    * exec partitions with NO global sort — the right shape whenever ctx is
    * small relative to exec (a coarser timeframe always is). Unlike
    * [[bucketJoin]] this needs no grid alignment: missing ctx buckets fall
    * back to the previous interval exactly like [[backward]].
    */
  def broadcastRange(left: DataFrame, right: DataFrame, on: String = "ts",
                     partitionCols: Seq[String] = Nil): DataFrame = {
    val w = (if (partitionCols.nonEmpty) Window.partitionBy(partitionCols.map(col): _*)
             else Window.partitionBy()).orderBy(col(on))
    val r = right
      .withColumn("_next", lead(col(on), 1).over(w))
      .withColumnRenamed(on, "_rts")
    val keyCond = partitionCols.map(c => left(c) === r(c))
    val rangeCond = left(on) >= r("_rts") && (r("_next").isNull || left(on) < r("_next"))
    val joined = left.join(broadcast(r), (keyCond :+ rangeCond).reduce(_ && _), "left")
    // drop the RIGHT side's key copies by Column reference — drop(String*)
    // would remove the left side's attributes of the same name too
    partitionCols.foldLeft(joined)((d, c) => d.drop(r(c)))
      .drop("_rts", "_next")
  }

  /** Multi-timeframe join (reference: src/datalake/read/api.py:80-87 loop):
    * joins each (tfCode -> ctx frame) onto exec in ascending-minutes order
    * (reference: mtf.py:5,20 TF_ORDER), suffixing ctx value columns with
    * `_{tf}`. `closeOnly` keeps just close (reference: api.py:76
    * suffix_close_only).
    */
  def mtf(exec: DataFrame, ctx: Map[String, DataFrame], closeOnly: Boolean = false,
          partitionCols: Seq[String] = Nil): DataFrame = {
    val ordered = ctx.toSeq.sortBy { case (tf, _) => Timeframe(tf).minutes }
    ordered.foldLeft(exec) { case (acc, (tfCode, df)) =>
      val valCols = if (closeOnly) Seq("close") else Seq("open", "high", "low", "close", "volume")
      val projected = df.select((partitionCols :+ "ts").map(col) ++
        valCols.map(c => col(c).as(s"${c}_$tfCode")): _*)
      backward(acc, projected, "ts", partitionCols)
    }
  }
}
