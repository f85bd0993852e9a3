package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad (not part of the API). Current probe: bucketed co-located join. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", java.nio.file.Files.createTempDirectory("wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // bucket the real events table by user_id and self-join co-located
    val ev = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    graft.lake.Bucketing.writeBucketed(ev, "li_bkt", Seq("l_orderkey"), 8, Seq("l_orderkey"))
    val j = graft.lake.Bucketing.coLocatedJoin(spark, "li_bkt", "li_bkt", Seq("l_orderkey"))
    println(s"[scratch] bucketed self-join rows: ${j.count()}")
    println(s"[scratch] shuffle in plan: ${graft.lake.Bucketing.hasShuffle(j)}")
    j.explain("formatted")
    spark.stop()
  }
}
