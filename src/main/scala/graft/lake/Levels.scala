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

  /** Levels read. An absent tree fails with a CLEAR error instead of a raw
    * PATH_NOT_FOUND (the levels schema lives only on disk — unlike the
    * candle tree there is no canonical schema to serve an empty frame
    * from, so "empty lake reads as empty frame" cannot apply here).
    */
  def read(spark: SparkSession, root: String, symbol: String): DataFrame =
    LakeFs.readParquetIfData(spark, LakeLayout.levelsRoot(root))
      .map(_.where(col("symbol") === symbol))
      .getOrElse(throw new IllegalStateException(
        s"no levels tree at ${LakeLayout.levelsRoot(root)} — write levels first (Cli levels / LevelsWriter.upsert)"))
}
