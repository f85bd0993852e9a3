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

  /** Directional as-of join with an optional match tolerance — the full
    * pandas `merge_asof(direction=..., tolerance=...)` surface (the
    * reference only ever uses backward, api.py:76-88; forward/nearest round
    * out the family for users of the wider pandas contract).
    *
    *  - `backward`: latest right with right.ts <= left.ts (== [[backward]])
    *  - `forward`:  earliest right with right.ts >= left.ts
    *  - `nearest`:  whichever of the two is closer; exact ties prefer the
    *    backward match (documented, deterministic)
    *  - `tolerance` (units of `on` cast to long): matches farther than this
    *    yield nulls for that row — the row itself is kept (left-join shape)
    *
    * One pass for ALL directions: union-tag both sides, then [[Fill.biFill]]
    * forward-fills the previous ctx row's values and backward-fills the
    * next's in the same two-phase chunked scan (no data-sized unpartitioned
    * window even unkeyed; `chunk` is in `on`-cast-long units). The matched
    * right timestamp rides along as a filled column, so tolerance and
    * nearest-selection are pure per-row expression work afterwards.
    */
  def directed(left: DataFrame, right: DataFrame, on: String = "ts",
               partitionCols: Seq[String] = Nil, direction: String = "backward",
               tolerance: Option[Long] = None, chunk: Long = 86400L): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val rightVals = right.columns.toSeq.filterNot(c => c == on || partitionCols.contains(c))
    val leftCols = left.columns.toSeq
    require(rightVals.intersect(leftCols).isEmpty,
      s"column collision: ${rightVals.intersect(leftCols).mkString(",")}")
    // the matched right timestamp rides as the reserved fill columns
    // _p_ts/_n_ts; a right VALUE column literally named "ts" while joining
    // on another column (ts/ts_ns coexist in this engine) would silently
    // collide with them — rename it before calling
    require(on == "ts" || !rightVals.contains("ts"),
      s"right value column 'ts' collides with the matched-timestamp columns when on=$on; rename it")
    val needP = direction != "forward"
    val needN = direction != "backward"
    val pCols = if (needP) rightVals.map(c => s"_p_$c") :+ "_p_ts" else Nil
    val nCols = if (needN) rightVals.map(c => s"_n_$c") :+ "_n_ts" else Nil

    val rSchema = right.schema
    val leftSide = (pCols ++ nCols).foldLeft(left.withColumn("_side", lit(1))) { (d, c) =>
      val src = c.stripPrefix("_p_").stripPrefix("_n_")
      d.withColumn(c, lit(null).cast(if (src == "ts") rSchema(on).dataType else rSchema(src).dataType))
    }
    val rightTagged = right.withColumn("_side", lit(0))
    val rightSide = leftCols.filterNot(c => c == on || partitionCols.contains(c))
      .foldLeft((pCols ++ nCols).foldLeft(rightTagged) { (d, c) =>
        val src = c.stripPrefix("_p_").stripPrefix("_n_")
        d.withColumn(c, col(if (src == "ts") on else src))
      }.drop(rightVals: _*)) { (d, c) =>
        d.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val unioned = leftSide.unionByName(rightSide)
    val filled = Fill.biFill(unioned, pCols, nCols, partitionCols, on, chunk,
      tie = Some("_side"))
    val execRows = filled.where(col("_side") === 1)

    val lts = col(on).cast("long")
    def ok(mts: String, dist: org.apache.spark.sql.Column) =
      col(mts).isNotNull && tolerance.fold(lit(true))(t => dist <= t)
    val pOk = if (needP) ok("_p_ts", lts - col("_p_ts").cast("long")) else lit(false)
    val nOk = if (needN) ok("_n_ts", col("_n_ts").cast("long") - lts) else lit(false)
    val usePrev = direction match {
      case "backward" => pOk
      case "forward" => lit(false)
      case "nearest" =>
        pOk && (!nOk || (lts - col("_p_ts").cast("long")) <= (col("_n_ts").cast("long") - lts))
    }
    val out = rightVals.foldLeft(execRows) { (d, c) =>
      val nullV = lit(null).cast(rSchema(c).dataType)
      val v =
        if (!needN) when(pOk, col(s"_p_$c")).otherwise(nullV)
        else if (!needP) when(nOk, col(s"_n_$c")).otherwise(nullV)
        else when(usePrev, col(s"_p_$c"))
          .otherwise(when(nOk, col(s"_n_$c")).otherwise(nullV))
      d.withColumn(c, v)
    }
    out.drop("_side").drop(pCols ++ nCols: _*)
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
