package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad (not part of the API). Current probe: dump plans for docs. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val out = new java.io.PrintWriter("/tmp/plans_raw.txt")
    for (q <- Seq("q02_range_filter", "q13_segment_revenue", "q14_sim_topk",
                  "q17_minhash_candidates", "q26_asof_per_user")) {
      out.println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      out.println(df.queryExecution.executedPlan.toString.take(4000))
    }
    out.close()
    println("[scratch] plans dumped")
    spark.stop()
  }
}
