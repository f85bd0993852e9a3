package graft.lake

import org.apache.spark.sql.SparkSession

/** Lake configuration contract (reference: src/datalake/config.py:8-16
  * `LakeConfig` — root, format, compression, bar semantics, default tz;
  * defaults from .env, .env.example:1-10).
  */
case class LakeConfig(
    root: String = sys.env.getOrElse("DATALAKE_ROOT", "./datalake"),
    format: String = "parquet",
    compression: String = "zstd",
    barSemantics: String = "bar_end",
    defaultTz: String = "UTC",
)

/** Catalog-integrity check (reference: src/datalake/validate_layout.py:7-27
  * — LAYOUT_RE over the data tree's parquet files; CI runs it on every push).
  * Returns the parquet files whose paths do NOT match the hive layout
  * `data/source=…/market=…/timeframe=…/symbol=…/year=…/month=…/part.parquet`.
  */
object ValidateLayout {

  private val layoutRe =
    ("""^source=[^/]+/market=[^/]+/timeframe=(M1|M5|M15|M30|H1|D1)/symbol=[^/]+/""" +
      """year=\d{4}/month=\d{1,2}/[^/]+\.parquet$""").r

  /** Walks the data tree through the Hadoop FileSystem API (works on
    * file:/hdfs:/s3a: roots, unlike java.io.File).
    */
  def invalidPaths(spark: SparkSession, root: String): Seq[String] =
    LakeFs.listFilesRelative(spark, LakeLayout.dataRoot(root))
      .filter(_.endsWith(".parquet"))
      .filterNot(p => layoutRe.matches(p))

  /** Strict gate like the reference CI: throws when the tree has stray files. */
  def check(spark: SparkSession, root: String): Unit = {
    val bad = invalidPaths(spark, root)
    require(bad.isEmpty, s"invalid lake layout paths: ${bad.take(5).mkString(", ")}")
  }
}
