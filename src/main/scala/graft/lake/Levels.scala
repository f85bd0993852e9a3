package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    val enriched = levels
      .withColumn("market", lit(market))
      .withColumn("year", year(col("session_date"))) // DATE field: tz-free
    UpsertCore.mergeWrite(spark, LakeLayout.levelsRoot(root), enriched,
      Seq("market", "symbol", "year"), Seq("session_date", "symbol"), "session_date")
  }

  def read(spark: SparkSession, root: String, symbol: String): DataFrame =
    spark.read.parquet(LakeLayout.levelsRoot(root))
      .where(col("symbol") === symbol)
}
