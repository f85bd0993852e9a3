package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

/** Dev scratchpad for expression portability probes (not part of the API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(("ab的", 1), ("hello world abc", 2)).toDF("text", "id")
    df.select(
      split(col("text"), "").as("chars"),
      transform(split(col("text"), ""), c => ascii(c)).as("codes"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.words(col("text")).as("words"),
    ).show(false)
    val emb = Seq((Seq(1.5f, 2.5f), 1), (Seq(3.5f, 4.5f), 2)).toDF("v", "id")
    emb.select(Similarity.dot(Similarity.toDouble(col("v")),
      array(lit(3.5), lit(4.5))).as("dot")).show(false)
    spark.stop()
  }
}
