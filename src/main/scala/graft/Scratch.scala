package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the API). Current probe: repair plan surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("gappy_lake").toString
    val day = graft.sources.SynthSource.m1(spark, "BTC-USD", "2025-08-01", "2025-08-01")
    // two gaps: 10 min (one 600s window) and 90 min (two 3600s-window steps)
    val gappy = day.where(!(col("ts") >= lit("2025-08-01 03:00:00") &&
      col("ts") < lit("2025-08-01 03:10:00")) &&
      !(col("ts") >= lit("2025-08-01 10:00:00") && col("ts") < lit("2025-08-01 11:30:00")))
    graft.lake.LakeWriter.upsert(spark, root, gappy)
    Cli.run(spark, List("repair", root, "BTC-USD"))
    Cli.run(spark, List("check", root, "BTC-USD", "M1"))
    spark.stop()
  }
}
