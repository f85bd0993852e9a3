package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

/** Dev scratchpad for perf probes (not part of the API). */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    spark.range(1000).selectExpr("sum(id)").collect()

    time("shingles build+count") {
      println(Dedup.shingles(docs, "doc_id", "text", 3).count())
    }
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    time("inter join (no cache)") {
      val a = sh.select(col("doc_id").as("id_a"), col("shingle"))
      val b = sh.select(col("doc_id").as("id_b"), col("shingle"))
      println(a.join(b, "shingle").where(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1))).count())
    }
    time("full jaccardPairs") {
      println(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.1).count())
    }
    time("minhashCandidates") {
      println(Dedup.minhashCandidates(docs, "doc_id", "text").count())
    }
    spark.stop()
  }
}
