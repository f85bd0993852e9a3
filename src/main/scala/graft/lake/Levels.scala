package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Levels tree writer — K4 (reference: src/datalake/levels/or_levels.py:67-83
  * `write_year_levels`: yearly partitions under levels/market=crypto/symbol=…,
  * merge-dedupe on (session_date, symbol) keep-last, atomic tmp+replace).
  *
  * Spark form: year-partitioned parquet with the same
  * precedence-row_number keep-last upsert as the data tree; the commit
  * protocol provides atomicity.
  */
object LevelsWriter {

  def upsert(spark: SparkSession, root: String, levels: DataFrame,
             market: String = "crypto"): Unit = {
    val path = LakeLayout.levelsRoot(root)
    val partCols = Seq("market", "symbol", "year")
    val key = Seq("session_date", "symbol")
    val enriched = levels
      .withColumn("market", lit(market))
      .withColumn("year", year(col("session_date")))
    // first-write probe, not a catch-all — see LakeFs.readParquetIfData
    val existing = LakeFs.readParquetIfData(spark, path).map { cur =>
      val touched = enriched.select(partCols.map(col): _*).distinct()
      cur.join(broadcast(touched), partCols, "left_semi")
    }
    val tagged = enriched.withColumn("_prec", lit(1))
    val merged = existing match {
      case Some(old) => old.withColumn("_prec", lit(0)).unionByName(tagged, allowMissingColumns = true)
      case None => tagged
    }
    val w = Window.partitionBy(key.map(col): _*).orderBy(col("_prec").desc)
    val deduped = merged.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn", "_prec")
      .localCheckpoint() // see LakeWriter.upsert: batch lineage may read the target
    val conf = spark.conf
    val prev = conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try deduped.repartition(partCols.map(col): _*)
      .sortWithinPartitions(col("session_date"))
      .write.mode("overwrite").partitionBy(partCols: _*)
      .option("compression", "zstd").parquet(path)
    finally conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    spark.catalog.refreshByPath(path)
  }

  def read(spark: SparkSession, root: String, symbol: String): DataFrame =
    spark.read.parquet(LakeLayout.levelsRoot(root))
      .where(col("symbol") === symbol)
}
