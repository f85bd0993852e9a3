package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the API).
  *
  * Modes:
  *  - (no args): repair-plan surface probe (gappy lake -> Cli repair/check)
  *  - explain <queryName> [sfDir]: print the formatted physical plan of a
  *    SparkEntry query — the docs/PLANS.md evidence generator.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.toList match {
      case "explain" :: name :: rest =>
        val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.001")
        println(s"== $name @ $sfDir ==")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      case _ =>
        val root = java.nio.file.Files.createTempDirectory("gappy_lake").toString
        val day = graft.sources.SynthSource.m1(spark, "BTC-USD", "2025-08-01", "2025-08-01")
        // two gaps: 10 min (one 600s window) and 90 min (two 3600s-window steps)
        val gappy = day.where(!(col("ts") >= lit("2025-08-01 03:00:00") &&
          col("ts") < lit("2025-08-01 03:10:00")) &&
          !(col("ts") >= lit("2025-08-01 10:00:00") && col("ts") < lit("2025-08-01 11:30:00")))
        graft.lake.LakeWriter.upsert(spark, root, gappy)
        Cli.run(spark, List("repair", root, "BTC-USD"))
        Cli.run(spark, List("check", root, "BTC-USD", "M1"))
    }
    spark.stop()
  }
}
