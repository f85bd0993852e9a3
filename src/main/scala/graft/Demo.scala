package graft

import graft.core.Timeframe
import graft.lake.{LakeReader, LakeWriter}
import graft.ops.{AsofJoin, Gaps, OrLevels, Resample}
import graft.sources.SynthSource
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** End-to-end demo of the candle spine (SURVEY §7.3): synth -> upsert ->
  * partition-pruned range read -> resample -> MTF as-of join -> OR levels ->
  * gap QC. Run: sbt "runMain graft.Demo [lakeDir]".
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_lake").toString)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println(s"[demo] lake root: $root")
    val bars = SynthSource.m1(spark, "BTC-USD", "2025-08-01", "2025-08-03")
    LakeWriter.upsert(spark, root, bars)
    println(s"[demo] upserted ${bars.count()} M1 bars (3 days)")

    val m1 = LakeReader.readRange(spark, root, "synth", "BTC-USD", "M1",
      Some(Timestamp.valueOf("2025-08-01 00:00:00")),
      Some(Timestamp.valueOf("2025-08-02 00:00:00")))
    println(s"[demo] read [08-01, 08-02): ${m1.count()} bars (expect 1440)")

    val m5 = Resample.ohlcv(m1, Timeframe.M5)
    val m15 = Resample.ohlcv(m1, Timeframe.M15)
    println(s"[demo] resampled M5=${m5.count()} (expect 288) M15=${m15.count()} (expect 96)")

    val mtf = AsofJoin.mtf(m1.select("ts", "open", "high", "low", "close", "volume"),
      Map("M5" -> m5, "M15" -> m15))
    println(s"[demo] mtf join rows=${mtf.count()} cols=${mtf.columns.length}")
    mtf.orderBy("ts").show(3)

    val levels = OrLevels.build(
      LakeReader.readRange(spark, root, "synth", "BTC-USD", "M1", None, None),
      "UTC", "00:00-01:00")
    println(s"[demo] OR levels:")
    levels.orderBy("session_date").show(5)

    val gaps = Gaps.minuteGaps(m1)
    println(s"[demo] gaps in day 1: ${gaps.count()} (expect 0)")

    // bridge provider: materialized-aggregate-with-fallback policy (O4)
    val provider = new graft.lake.LakeProvider(spark, root)
    val onTheFly = provider.loadTf("BTC-USD", "5 mins",
      Some(Timestamp.valueOf("2025-08-01 00:00:00")), Some(Timestamp.valueOf("2025-08-02 00:00:00")))
    println(s"[demo] provider on-the-fly M5: ${onTheFly.count()} bars (expect 288)")
    graft.lake.Aggregates.materialize(spark, root,
      provider.loadM1("BTC-USD", None, None), Timeframe.M5)
    val served = provider.loadTf("BTC-USD", "M5",
      Some(Timestamp.valueOf("2025-08-01 00:00:00")), Some(Timestamp.valueOf("2025-08-02 00:00:00")))
    println(s"[demo] provider pre-materialized M5: ${served.count()} bars (expect 288)")

    val qc = graft.ops.Qc.dayCompleteness(
      LakeReader.readRange(spark, root, "synth", "BTC-USD", "M1", None, None), Timeframe.M1)
    println(s"[demo] QC complete days: ${qc.where(col("complete")).count()}/3")

    // idempotence: re-upsert and re-read
    LakeWriter.upsert(spark, root, bars)
    val again = LakeReader.readRange(spark, root, "synth", "BTC-USD", "M1",
      Some(Timestamp.valueOf("2025-08-01 00:00:00")),
      Some(Timestamp.valueOf("2025-08-02 00:00:00")))
    println(s"[demo] after re-upsert: ${again.count()} bars (expect 1440, idempotent)")
    spark.stop()
  }
}
