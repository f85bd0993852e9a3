package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Timeframe codes used throughout the engine.
  *
  * Mirrors the reference's timeframe vocabulary (reference:
  * src/datalake/bridge .. provider.py:12-23 `_norm_tf`, ingestors/binance/ingest_cli.py:19-27
  * interval maps): M1/M5/M15/M30/H1/D1, with IB-style aliases ("1 min", "5 mins",
  * "1 hour", "1 day") accepted on input.
  */
sealed abstract class Timeframe(val code: String, val minutes: Int) {
  def seconds: Long = minutes.toLong * 60L
}

object Timeframe {
  case object M1  extends Timeframe("M1", 1)
  case object M5  extends Timeframe("M5", 5)
  case object M15 extends Timeframe("M15", 15)
  case object M30 extends Timeframe("M30", 30)
  case object H1  extends Timeframe("H1", 60)
  case object D1  extends Timeframe("D1", 1440)

  val all: Seq[Timeframe] = Seq(M1, M5, M15, M30, H1, D1)

  /** Ascending-minutes order used by the MTF join (reference: src/datalake/read/mtf.py:5 TF_ORDER). */
  val order: Seq[String] = all.map(_.code)

  private val aliases: Map[String, Timeframe] = {
    val base = all.map(tf => tf.code -> tf).toMap
    val ib = Map(
      "1 min" -> M1, "1min" -> M1, "1m" -> M1,
      "5 mins" -> M5, "5min" -> M5, "5m" -> M5,
      "15 mins" -> M15, "15min" -> M15, "15m" -> M15,
      "30 mins" -> M30, "30min" -> M30, "30m" -> M30,
      "1 hour" -> H1, "1h" -> H1, "60min" -> H1,
      "1 day" -> D1, "1d" -> D1,
    )
    base.map { case (k, v) => k.toLowerCase -> v } ++ ib
  }

  /** Normalize any accepted alias to a Timeframe; throws on unknown codes. */
  def apply(code: String): Timeframe =
    aliases.getOrElse(code.trim.toLowerCase,
      throw new IllegalArgumentException(s"unknown timeframe: $code"))
}

/** Canonical candle schema + coercion.
  *
  * The reference's single logical dataset is an OHLCV bar table keyed by
  * (source, symbol, timeframe, ts) with ts = bar END in UTC (reference:
  * docs/specs/schema_m1.parquet.json "primary_key"/"ts_semantics",
  * src/datalake/read/schemas.py:4-21 CANONICAL_ORDER/NUMERIC/TEXTUAL/DEFAULTS).
  * The engine uses one canonical `timeframe` column (the reference splits
  * between `tf` and `timeframe` per source — SURVEY §7.5 item 3).
  */
object CandleSchema {

  val numericCols: Seq[String] = Seq("open", "high", "low", "close", "volume")

  /** Textual columns and their defaults (reference: src/datalake/read/schemas.py:13-21 DEFAULTS). */
  val textualDefaults: Seq[(String, String)] = Seq(
    "symbol" -> "",
    "timeframe" -> "M1",
    "source" -> "",
    "market" -> "crypto",
    "exchange" -> "",
    "what_to_show" -> "",
    "vendor" -> "",
    "tz" -> "UTC",
  )

  val canonicalOrder: Seq[String] =
    Seq("ts") ++ numericCols ++ textualDefaults.map(_._1) ++ Seq("is_synth")

  val schema: StructType = StructType(
    StructField("ts", TimestampType, nullable = false) +:
      (numericCols.map(c => StructField(c, DoubleType, nullable = c == "volume")) ++
        textualDefaults.map { case (c, _) => StructField(c, StringType, nullable = true) } :+
        StructField("is_synth", BooleanType, nullable = true))
  )

  /** Primary/dedupe key (reference: docs/specs/schema_m1.parquet.json "dedupe_on"). */
  val key: Seq[String] = Seq("source", "symbol", "timeframe", "ts")

  /** Defensive schema coercion, the Spark analogue of the reference's
    * `enforce_schema` (reference: src/datalake/read/schemas.py:23-47): cast ts to
    * timestamp, numerics to double (invalid -> null, like to_numeric(errors=coerce)),
    * add missing textual columns with defaults, reorder to canonical order with
    * extra columns appended, accept `tf` as an alias of `timeframe`.
    */
  def enforce(df: DataFrame): DataFrame = {
    val in = if (df.columns.contains("tf") && !df.columns.contains("timeframe"))
      df.withColumnRenamed("tf", "timeframe") else df
    val have = in.columns.toSet
    def colOr(c: String, default: Column): Column =
      if (have.contains(c)) col(c) else default

    val ts = colOr("ts", lit(null)).cast(TimestampType).as("ts")
    val nums = numericCols.map(c => colOr(c, lit(null)).cast(DoubleType).as(c))
    val texts = textualDefaults.map { case (c, d) =>
      coalesce(colOr(c, lit(null)).cast(StringType), lit(d)).as(c)
    }
    val synth = colOr("is_synth", lit(null)).cast(BooleanType).as("is_synth")
    val extras = in.columns.filterNot(canonicalOrder.contains).filterNot(_ == "tf").map(col)
    in.select((Seq(ts) ++ nums ++ texts ++ Seq(synth) ++ extras): _*)
      .na.drop(Seq("ts"))
  }
}
