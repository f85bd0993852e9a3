package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Timeframe
import graft.ops.{AsofJoin, EventOps, Resample}

/** Dev scratchpad (not part of the API). Current probe: broadcastRange asof. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
    val m1 = EventOps.candles(ev, 60L)
    val m5 = Resample.ohlcv(m1, Timeframe.M5).select(col("ts"), col("close").as("close_m5"))
    val exec = m1.select(col("ts"), col("close"))
    val viaWindow = AsofJoin.backward(exec, m5)
    val viaRange = AsofJoin.broadcastRange(exec, m5).select("ts", "close", "close_m5")
    val a = viaWindow.orderBy("ts").collect()
    val b = viaRange.orderBy("ts").collect()
    println(s"[scratch] rows window=${a.length} range=${b.length} identical=${a.sameElements(b)}")
    val plan = { viaRange.collect(); viaRange.queryExecution.executedPlan.toString }
    println(s"[scratch] range plan broadcast=${plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange")} globalSort=${plan.contains("Sort [ts")}")
    spark.stop()
  }
}
