package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the API). Current probe: typed OrLevels vs oracle. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
    val m1 = graft.ops.EventOps.candles(ev, 60L).withColumn("symbol", lit("EVENTS"))
    val typed = graft.ops.OrLevels.buildTyped(m1, "UTC", "00:00-01:00")
      .select(date_format(col("session_date"), "yyyy-MM-dd").as("session_date"),
        col("or_high"), col("or_low"), col("break_dir"),
        col("break_ts").cast("long").as("break_ts_sec"),
        col("retest_ts").cast("long").as("retest_ts_sec"), col("retest_price"))
      .orderBy("session_date")
    typed.coalesce(1).write.mode("overwrite").parquet("/tmp/typed_or_levels")
    println(s"[scratch] typed OR levels rows: ${typed.count()}")
    spark.stop()
  }
}
