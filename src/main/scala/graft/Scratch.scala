package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad (not part of the API). Current probe: SQL extension surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").createOrReplaceTempView("documents")
    // drive the SQL surface end-to-end: shingle + hash + dedup in pure SQL
    spark.sql("""
      SELECT count(*) AS n_docs,
             count(DISTINCT graft_polyhash(text)) AS n_distinct_fp,
             sum(size(graft_shingles(text, 3))) AS total_shingles
      FROM documents""").show()
    spark.sql("SELECT graft_dot(array(1.0D,2.0D,3.0D), array(4.0D,5.0D,6.0D)) AS dot").show()
    // error path: wrong arg type
    try { spark.sql("SELECT graft_dot('a', 'b')").collect(); println("[scratch] NO ERROR (bad)") }
    catch { case e: Exception => println(s"[scratch] type error as expected: ${e.getMessage.take(80)}") }
    spark.stop()
  }
}
