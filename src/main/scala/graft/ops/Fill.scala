package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed forward/backward non-null fill WITHOUT a global window.
  *
  * The naive fill is `last(v, ignoreNulls) OVER (ORDER BY ts)`; with no
  * partition key Spark moves the whole series into ONE partition (the
  * "No Partition Defined" WindowExec), which serializes at scale. This is the
  * classic two-phase parallel scan instead:
  *
  *   1. fill within coarse time chunks — a window partitioned by
  *      (keys, chunk), so chunks fill in parallel;
  *   2. compute one summary row per (keys, chunk) — the chunk's last
  *      (resp. first) non-null value per column — and resolve each chunk's
  *      carry-in with a tiny summary self-join + max_by/min_by aggregation
  *      (no window; AQE broadcasts it when small);
  *   3. final value = coalesce(within-chunk fill, carried value).
  *
  * Output is bit-identical to the global-window fill; wall-clock scales with
  * the number of chunks. The carry join is O(#chunks²) per key group — with
  * day chunks that is ~365²/year of tiny rows; raise `chunkSeconds` for
  * multi-decade single series.
  *
  * Forward and backward columns can fill in the SAME pass ([[biFill]]): both
  * directions share one chunk-window sort (same partitioning + ordering, so
  * Spark plans a single sort), one boundary-summary aggregate, one carry
  * join, and one stitch join — callers that need both (synthetic gap fill's
  * prior-close/next-open) pay half the stages of two separate fills.
  */
object Fill {

  /** Forward-fill `cols` (last non-null wins) ordered by `ts` within `keys`
    * groups. `ts` must be unique per key group (a resample/grid output is) —
    * unless a `tie` column makes (ts, tie) unique, e.g. AsofJoin's side tag.
    * `chunkSeconds` is in the native unit of `ts` cast to long (seconds for
    * timestamps; pass ns-scaled chunks for raw ts_ns columns).
    */
  def ffill(df: DataFrame, cols: Seq[String], keys: Seq[String] = Nil,
            ts: String = "ts", chunkSeconds: Long = 86400L,
            tie: Option[String] = None): DataFrame =
    biFill(df, cols, Nil, keys, ts, chunkSeconds, tie)

  /** Backward-fill `cols` (next non-null wins). */
  def bfill(df: DataFrame, cols: Seq[String], keys: Seq[String] = Nil,
            ts: String = "ts", chunkSeconds: Long = 86400L,
            tie: Option[String] = None): DataFrame =
    biFill(df, Nil, cols, keys, ts, chunkSeconds, tie)

  /** Forward-fill `fcols` AND backward-fill `bcols` in one two-phase pass. */
  def biFill(df: DataFrame, fcols: Seq[String], bcols: Seq[String],
             keys: Seq[String] = Nil, ts: String = "ts",
             chunkSeconds: Long = 86400L, tie: Option[String] = None): DataFrame = {
    require(fcols.nonEmpty || bcols.nonEmpty, "no columns to fill")
    val dirs: Seq[(String, Boolean)] = fcols.map(_ -> false) ++ bcols.map(_ -> true)
    val withChunk = df.withColumn("_chunk",
      floor(col(ts).cast("long") / chunkSeconds).cast("long"))
    val ordCols = col(ts) +: tie.map(col).toSeq

    // phase 1: within-chunk fill (parallel across (keys, chunk)); both frame
    // directions share the partitioning and ordering, so one sort feeds both
    val part = Window.partitionBy((keys :+ "_chunk").map(col): _*).orderBy(ordCols: _*)
    val local = dirs.foldLeft(withChunk) { case (d, (c, backward)) =>
      val filled =
        if (backward) first(col(c), ignoreNulls = true)
          .over(part.rowsBetween(Window.currentRow, Window.unboundedFollowing))
        else last(col(c), ignoreNulls = true)
          .over(part.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      d.withColumn(s"_loc_$c", filled)
    }

    // phase 2: per-chunk boundary summaries -> carry-in per chunk.
    // summary value = the chunk's last (first) non-null per column, picked
    // with a struct max/min ordered by ts (null when the chunk has none).
    val sumAggs = dirs.map { case (c, backward) =>
      val ordFields = (col(ts).as("t") +: tie.map(t => col(t).as("t2")).toSeq) :+ col(c).as("v")
      val tagged = when(col(c).isNotNull, struct(ordFields: _*))
      (if (backward) min(tagged) else max(tagged)).as(s"_s_$c")
    }
    val summary = withChunk.groupBy((keys :+ "_chunk").map(col): _*)
      .agg(sumAggs.head, sumAggs.tail: _*)
    val src = summary.select(
      keys.map(c => col(c).as(s"_bk_$c")) ++ (col("_chunk").as("_bchunk") +:
        dirs.map { case (c, _) => col(s"_s_$c").as(s"_bs_$c") }): _*)
    val tgt = summary.select((keys :+ "_chunk").map(col): _*)
    // <=> : a NULL key value is a real group for the window form, so the
    // carry join must match it too (=== would orphan NULL-key groups).
    // Direction lives in the per-column aggregate below, so ONE join serves
    // both fill directions; per key group it is the same O(#chunks²) the
    // single-direction join costs.
    val cond = keys.map(c => tgt(c) <=> src(s"_bk_$c"))
      .foldLeft(src("_bchunk") =!= tgt("_chunk"))(_ && _)
    // nearest contributing chunk per column: order by (chunk, ts) so the
    // closest chunk wins; within a chunk the summary already picked the edge
    val carryAggs = dirs.map { case (c, backward) =>
      val inDir =
        if (backward) col("_bchunk") > col("_chunk") else col("_bchunk") < col("_chunk")
      val pick = when(inDir && col(s"_bs_$c").isNotNull,
        struct(col("_bchunk").as("c"), col(s"_bs_$c").getField("v").as("v")))
      (if (backward) min(pick) else max(pick)).getField("v").as(s"_carry_$c")
    }
    val carry = tgt.join(src, cond, "left")
      .groupBy((keys :+ "_chunk").map(col): _*)
      .agg(carryAggs.head, carryAggs.tail: _*)
      .select(keys.map(c => col(c).as(s"_ck_$c")) ++ (col("_chunk").as("_cchunk") +:
        dirs.map { case (c, _) => col(s"_carry_$c") }): _*)

    // phase 3: stitch. carry is one row per (keys, chunk). Unkeyed, that is
    // provably tiny (#chunks rows) — force the broadcast so a planner
    // misestimate can never shuffle the data side. Keyed, cardinality grows
    // with #keys x #chunks (1M symbols x years would OOM a forced
    // broadcast), so let AQE pick broadcast vs shuffle from actual sizes.
    val carrySide = if (keys.isEmpty) broadcast(carry) else carry
    val stitchCond = keys.map(c => local(c) <=> col(s"_ck_$c"))
      .foldLeft(local("_chunk") === col("_cchunk"))(_ && _)
    val joined = local.join(carrySide, stitchCond, "left")
    dirs.foldLeft(joined) { case (d, (c, _)) =>
      d.withColumn(c, coalesce(col(s"_loc_$c"), col(s"_carry_$c")))
        .drop(s"_loc_$c", s"_carry_$c")
    }.drop("_chunk" +: "_cchunk" +: keys.map(c => s"_ck_$c"): _*)
  }
}
