package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap detection + range compression (reference: src/datalake/tools/gaps.py:40-68
  * `find_minute_gaps` — full minute grid minus observed ts, then walk +1min
  * adjacency into contiguous [start,end] ranges; same logic inlined at
  * ingestors/ibkr/ingest_cli.py:206-226 and tools/check_day.py:60-75).
  *
  * Spark mapping: grid = explode(sequence(...)); missing = grid LEFT ANTI JOIN
  * observed (J2/U2); islands via the classic gaps-and-islands trick — group by
  * `ts - rn * step`, a constant within each contiguous run (W5).
  *
  * Scale: the anti-join shuffles on ts (fine, AQE handles it); the islands
  * window partitions by `keys` so per-symbol runs sort independently.
  */
object Gaps {

  /** Timestamps present in the full `stepSeconds` grid but absent from
    * df.ts, per key group. By default the grid spans [min ts, max ts] of the
    * observed data; pass `gridBounds` (like the reference's known full-day
    * grid, gaps.py:53) to catch gaps at the boundaries too — a missing FIRST
    * or LAST bar is invisible to a data-derived grid.
    */
  /** Keyed step grid spanning `gridBounds` (or each group's observed
    * [min ts, max ts]) — the ONE bounds+grid builder [[missing]] and
    * [[synthFill]] share (r14: the two copies had started to drift).
    */
  private def keyedGrid(df: DataFrame, keys: Seq[String], stepSeconds: Long,
                        gridBounds: Option[(java.sql.Timestamp, java.sql.Timestamp)]): DataFrame = {
    val bounds = gridBounds match {
      case Some((f, t)) =>
        (if (keys.isEmpty) df.sparkSession.range(1).select(lit(1).as("_one"))
         else df.select(keys.map(col): _*).distinct())
          .withColumn("_from", lit(f)).withColumn("_to", lit(t))
          .drop("_one")
      case None => df.groupBy(keys.map(col): _*)
        .agg(min(col("ts")).as("_from"), max(col("ts")).as("_to"))
    }
    bounds.select(keys.map(col) :+
      explode(sequence(col("_from"), col("_to"), expr(s"INTERVAL $stepSeconds SECONDS"))).as("ts"): _*)
  }

  def missing(df: DataFrame, keys: Seq[String], stepSeconds: Long,
              gridBounds: Option[(java.sql.Timestamp, java.sql.Timestamp)] = None): DataFrame = {
    // NULL-SAFE key equality (r14): the groupBy above KEEPS a null key
    // group, so the grid contains its slots — a plain-equality anti-join
    // would never match them and report the group's entire grid missing
    // (Fill.biFill's <=> stitch is the package convention). Aliased: the
    // grid DERIVES from df, so unqualified attributes would be ambiguous.
    val grid = keyedGrid(df, keys, stepSeconds, gridBounds).alias("_g")
    val obs = df.select((keys :+ "ts").map(col): _*).alias("_o")
    grid.join(obs,
      (keys :+ "ts").map(c => col(s"_g.$c") <=> col(s"_o.$c")).reduce(_ && _),
      "left_anti")
  }

  /** Compress a set of grid-aligned timestamps into contiguous
    * [gap_start, gap_end] ranges (inclusive), one row per island.
    */
  def islands(missingTs: DataFrame, keys: Seq[String], stepSeconds: Long): DataFrame = {
    val w = (if (keys.nonEmpty) Window.partitionBy(keys.map(col): _*) else Window.partitionBy())
      .orderBy(col("ts"))
    missingTs
      .withColumn("_island", col("ts").cast("long") - row_number().over(w) * stepSeconds)
      .groupBy((keys :+ "_island").map(col): _*)
      .agg(min(col("ts")).as("gap_start"), max(col("ts")).as("gap_end"),
        count(lit(1)).as("n_missing"))
      .drop("_island")
  }

  /** End-to-end: missing minutes compressed to ranges. */
  def minuteGaps(df: DataFrame, keys: Seq[String] = Nil, stepSeconds: Long = 60L,
                 gridBounds: Option[(java.sql.Timestamp, java.sql.Timestamp)] = None): DataFrame =
    islands(missing(df, keys, stepSeconds, gridBounds), keys, stepSeconds)

  /** Day-scoped minute gaps over one series — the reference's scan shape
    * (tools/gaps.py:51-53 find_missing_ranges_utc builds one FULL-day grid
    * per day): every UTC day between the observed min and max ts gets the
    * complete step grid, clipped to the observed bounds only at the two
    * outer ends. Unlike deriving per-day bounds from each day's own data,
    * this DOES see gaps touching midnight and entirely missing days; like
    * the reference, islands never cross midnight (per-day ranges). The grid
    * explode, anti-join, and islands window all parallelize by day.
    */
  def dayScopedMinuteGaps(minutes: DataFrame, stepSeconds: Long = 60L): DataFrame = {
    val b = minutes.agg(min(col("ts")).as("_mn"), max(col("ts")).as("_mx"))
    val days = b.select(
      explode(sequence(expr("CAST(_mn AS LONG) DIV 86400"),
        expr("CAST(_mx AS LONG) DIV 86400"))).as("day"),
      col("_mn"), col("_mx"))
    val grid = days.select(col("day"),
      explode(sequence(
        greatest(timestamp_seconds(col("day") * 86400), col("_mn")),
        least(timestamp_seconds(col("day") * 86400 + (86400 - stepSeconds)), col("_mx")),
        expr(s"INTERVAL $stepSeconds SECONDS"))).as("ts"))
    val miss = grid.join(minutes.select(col("ts")), Seq("ts"), "left_anti")
    islands(miss, Seq("day"), stepSeconds)
  }

  /** Synthetic gap fill (reference: ingestors/ibkr/ingest_cli.py:229-267
    * `_synth_fill` — missing minute price = last prior close, else next open,
    * else 0; flat OHLC bar, volume 0, is_synth=true).
    */
  def synthFill(df: DataFrame, keys: Seq[String] = Nil, stepSeconds: Long = 60L,
                gridBounds: Option[(java.sql.Timestamp, java.sql.Timestamp)] = None): DataFrame = {
    // FULL OUTER join of the step grid with the data: grid-only rows are the
    // synthetic minutes, data rows (on or off the grid) pass through — the
    // same row set as `df UNION (grid ANTI JOIN df)` but with ONE evaluation
    // of df instead of three (bounds + anti-join probe + union arm), which
    // matters because df is typically an aggregation lineage, not a scan.
    // NULL-SAFE key equality (r14, same reasoning as `missing`): with a
    // plain-equality full outer, a null-key group's real bars never meet
    // their own grid slots — every slot would emit a DUPLICATE synthetic
    // bar alongside the real one. Expression join keeps both sides' key
    // columns, so coalesce them back to one. Aliased because the grid
    // derives from df (self-join ambiguity otherwise).
    val grid = keyedGrid(df, keys, stepSeconds, gridBounds).alias("_g")
    val data = df.withColumn("_real", lit(true)).alias("_d")
    val joinCols = keys :+ "ts"
    val dataCols = df.columns.filterNot(joinCols.contains)
    val unioned = grid.join(data,
        joinCols.map(c => col(s"_g.$c") <=> col(s"_d.$c")).reduce(_ && _),
        "full_outer")
      .select(joinCols.map(c => coalesce(col(s"_g.$c"), col(s"_d.$c")).as(c)) ++
        dataCols.map(c => col(s"_d.$c")) :+ col("_d._real"): _*)
      .withColumn("_synth", col("_real").isNull)
      .drop("_real")
    // prior real close / next real open via the chunked two-phase fill —
    // no unpartitioned window even for an unkeyed single series (see Fill);
    // both directions share one pass (Fill.biFill)
    val masked = unioned
      .withColumn("_prev_close", when(!col("_synth"), col("close")))
      .withColumn("_next_open", when(!col("_synth"), col("open")))
    val filled = Fill.biFill(masked, Seq("_prev_close"), Seq("_next_open"), keys)
    filled
      .withColumn("_px", coalesce(col("_prev_close"), col("_next_open"), lit(0.0)))
      .drop("_prev_close", "_next_open")
      .withColumn("open", when(col("_synth"), col("_px")).otherwise(col("open")))
      .withColumn("high", when(col("_synth"), col("_px")).otherwise(col("high")))
      .withColumn("low", when(col("_synth"), col("_px")).otherwise(col("low")))
      .withColumn("close", when(col("_synth"), col("_px")).otherwise(col("close")))
      .withColumn("volume", when(col("_synth"), lit(0.0)).otherwise(col("volume")))
      .withColumn("is_synth", col("_synth"))
      .drop("_px", "_synth")
  }
}
