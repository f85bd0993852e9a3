package graft.ops

import graft.core.Timeframe
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OHLCV time-bucket resample (reference: src/datalake/aggregates/aggregate.py:28-45
  * `resample_df` — rule map aggregate.py:10, agg dict open:first/high:max/low:min/
  * close:last/volume:sum, label='left', closed='left').
  *
  * Spark-first design notes:
  *  - bucket label = bucket floor (left label, left closed), replicating the
  *    reference's observed behavior (SURVEY §7.5 item 1) — a bar whose ts lands
  *    exactly on a boundary goes to the NEXT bucket, which is what floor() does.
  *  - `min_by`/`max_by` on ts instead of bare first/last: Spark's first/last are
  *    order-nondeterministic under shuffle; min_by/max_by are deterministic and
  *    stay inside whole-stage codegen.
  *  - the aggregation is a single hash-aggregate keyed on (keys..., bucket): one
  *    shuffle, map-side partial aggregation for free. At 100 TB the cardinality
  *    of (symbol, bucket) is high enough that no skew handling is needed beyond
  *    AQE defaults.
  */
object Resample {

  /** Floor a timestamp column to tf-sized buckets (UTC grid). */
  def bucket(tsCol: String, tf: Timeframe) = {
    val s = tf.seconds
    timestamp_seconds(floor(unix_timestamp(col(tsCol)) / s) * s)
  }

  /** Resample candles to a coarser timeframe. Input must have
    * ts/open/high/low/close/volume; `keys` are carried grouping columns
    * (typically source/symbol). The output `timeframe` column is set to tf.code
    * when the input had one.
    */
  def ohlcv(df: DataFrame, tf: Timeframe, keys: Seq[String] = Nil): DataFrame = {
    val hasTf = df.columns.contains("timeframe")
    val withBucket = df.withColumn("_bucket", bucket("ts", tf))
    val grouped = withBucket.groupBy(("_bucket" +: keys).map(col): _*).agg(
      min_by(col("open"), col("ts")).as("open"),
      max(col("high")).as("high"),
      min(col("low")).as("low"),
      max_by(col("close"), col("ts")).as("close"),
      sum(col("volume")).as("volume"),
    )
    val out = grouped.withColumnRenamed("_bucket", "ts")
    val withTf = if (hasTf) out.withColumn("timeframe", lit(tf.code)) else out
    withTf.na.drop(Seq("open", "high", "low", "close"))
  }

  /** Resample + forward-fill OHLC across empty buckets (reference:
    * src/datalake/aggregates/aggregate.py:43 `res[OHLC].ffill()`): generate the
    * full bucket grid between min and max ts per key group, left-join the
    * aggregates, then last(ignoreNulls) over an ordered window per key.
    * Empty buckets get the prior bar's OHLC and volume 0.
    *
    * Scale note: the grid explode is per-key, and the fill runs through
    * [[Fill.ffill]]'s two-phase chunked scan — windows partition by
    * (keys, day-chunk), so even a SINGLE unkeyed series fills in parallel
    * across chunks instead of collapsing to one WindowExec partition.
    */
  def ohlcvFfill(df: DataFrame, tf: Timeframe, keys: Seq[String] = Nil): DataFrame = {
    // cached: the resampled frame feeds the grid-bounds aggregate, the grid
    // join, and both phases of the chunked fill — four evaluations of an
    // aggregation lineage without it (lifecycle: see Dedup's cache note)
    val agg = ohlcv(df, tf, keys).cache()
    val s = tf.seconds
    val grid = agg.groupBy(keys.map(col): _*)
      .agg(min(col("ts")).as("_min_ts"), max(col("ts")).as("_max_ts"))
      .select(
        keys.map(col) :+
          explode(sequence(col("_min_ts"), col("_max_ts"), expr(s"INTERVAL $s SECONDS"))).as("ts"): _*)
    val joined = grid.join(agg, keys :+ "ts", "left")
    val filled = Fill.ffill(joined, Seq("open", "high", "low", "close"), keys)
    filled
      .withColumn("volume", coalesce(col("volume"), lit(0.0)))
      .na.drop(Seq("open", "high", "low", "close"))
  }
}
