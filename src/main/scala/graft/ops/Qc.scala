package graft.ops

import graft.core.Timeframe
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Completeness / quality-control checks (reference: A6/A7 —
  * per-hour histograms ingestors/ibkr/ingest_cli.py:681-709, expected
  * bars-per-day maps binance/ingest_cli.py:29-35 + aggregates/cli.py:19,
  * tools/check_day.py's strict day check).
  */
object Qc {

  /** Expected bars per full UTC day per timeframe (reference BASELINE.md). */
  val expectedPerDay: Map[String, Long] = Map(
    "M1" -> 1440L, "M5" -> 288L, "M15" -> 96L, "M30" -> 48L, "H1" -> 24L, "D1" -> 1L)

  /** Per-(key, day) completeness report: bars observed vs expected, missing
    * count, min/max ts (reference A7 count/min/max + check_day gate).
    */
  def dayCompleteness(df: DataFrame, tf: Timeframe, keys: Seq[String] = Nil): DataFrame = {
    val expected = expectedPerDay(tf.code)
    df.groupBy((keys.map(col) :+ to_date(col("ts")).as("day")): _*)
      .agg(count(lit(1)).as("n_bars"), min(col("ts")).as("first_ts"), max(col("ts")).as("max_ts"))
      .withColumn("expected", lit(expected))
      .withColumn("missing", lit(expected) - col("n_bars"))
      .withColumn("complete", col("n_bars") === lit(expected))
  }

  /** Zero-filled per-hour histogram for one day slice (reference A6). */
  def hourHistogram(df: DataFrame): DataFrame = EventOps.hourHistogram(df)

  /** Monotonic-ts + dedup sanity: rows whose ts does not strictly increase
    * within (keys) order — should be empty on a healthy partition.
    */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .where(col("n") > 1)
}
