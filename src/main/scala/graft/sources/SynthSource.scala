package graft.sources

import graft.core.CandleSchema
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic M1 candle generator (reference: tools/synth_gen.py:9-44
  * `make_m1` — seeded random walk, px = 100000 + cumsum(N(0,10)), high/low =
  * px ± U(0,5), volume U(0.5, 5.0); the offline-determinism lever behind
  * DATALAKE_SYNTH=1).
  *
  * Spark-first: `spark.range(n)` gives a distributed minute index; pseudo-random
  * draws are hash-based (xxhash64 of (seed, minute, stream)) rather than
  * `rand()`, so the output is deterministic REGARDLESS of partitioning — the
  * same bars come out on 1 or 1000 executors. The cumulative walk is a
  * chunked two-phase prefix sum ([[graft.ops.Packing.prefixSum]]) over
  * long-quantized steps — exact, partition-invariant, and free of any
  * data-sized unpartitioned window.
  */
object SynthSource {

  /** uniform [0,1) from a 64-bit hash, as a Column */
  private def u01(cols: org.apache.spark.sql.Column*) =
    (pmod(xxhash64(cols: _*), lit(1L << 52)).cast("double")) / lit((1L << 52).toDouble)

  /** Generate M1 bars for [dayFrom, dayTo] inclusive UTC days. Bars are
    * stamped 00:00..23:59 like the reference's generator (synth_gen.py:18-20
    * date_range inclusive-left) — i.e. bar-START stamps; the bar-end shift
    * (reference normalize.py:11) is the separate [[barEndShift]] applied at
    * ingest.
    */
  def m1(spark: SparkSession, symbol: String, dayFrom: String, dayTo: String,
         seed: Long = 42L): DataFrame = {
    val start = java.time.LocalDate.parse(dayFrom)
    val end = java.time.LocalDate.parse(dayTo)
    val days = java.time.temporal.ChronoUnit.DAYS.between(start, end) + 1
    val nMinutes = days * 1440L
    val startEpoch = start.atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond

    val idx = spark.range(nMinutes)
    // N(0,10) via Box-Muller on two hash-uniforms
    val u1 = u01(lit(seed), col("id"), lit(1))
    val u2 = u01(lit(seed), col("id"), lit(2))
    val step = sqrt(lit(-2.0) * log(greatest(u1, lit(1e-12)))) * cos(lit(2.0 * math.Pi) * u2) * lit(10.0)
    // The walk's running sum is a distributed prefix sum (Packing.prefixSum:
    // chunked two-phase, no unpartitioned window — a global Window.orderBy
    // here was the last data-sized serialization point in main code). Steps
    // are quantized to 1e-9 price units so the sum runs in LONGS: long
    // addition is associative, which is what keeps the walk bit-identical
    // regardless of partitioning (a chunked DOUBLE sum would drift ulps with
    // aggregation order). 1e-9 quantization of an N(0,10) step is far below
    // the generator's own noise floor; overflow needs ~2^63 nano-units
    // ≈ 9e9 price units of drift — unreachable for any plausible range.
    val stepped = idx.withColumn("_stepq", round(step * lit(1e9)).cast("long"))
    val summed = graft.ops.Packing.prefixSum(stepped, Seq.empty, "id", "_stepq",
      chunkSize = 100000L)

    summed
      .withColumn("_px", lit(100000.0) + col("cum__stepq").cast("double") / lit(1e9))
      .withColumn("ts", timestamp_seconds(lit(startEpoch) + col("id") * 60L))
      .withColumn("open", col("_px"))
      .withColumn("close", col("_px") + (u01(lit(seed), col("id"), lit(3)) - lit(0.5)) * lit(4.0))
      .withColumn("high", greatest(col("open"), col("close")) + u01(lit(seed), col("id"), lit(4)) * lit(5.0))
      .withColumn("low", least(col("open"), col("close")) - u01(lit(seed), col("id"), lit(5)) * lit(5.0))
      .withColumn("volume", lit(0.5) + u01(lit(seed), col("id"), lit(6)) * lit(4.5))
      .withColumn("symbol", lit(symbol))
      .withColumn("timeframe", lit("M1"))
      .withColumn("source", lit("synth"))
      .withColumn("exchange", lit("SYNTH"))
      .drop("id", "_stepq", "cum__stepq", "_px")
      .transform(CandleSchema.enforce)
  }

  /** bar-start -> bar-end stamp shift: ts += 1 minute (reference:
    * src/datalake/ingestors/ibkr/normalize.py:6-18, shift at line 11; the
    * canonical contract is ts = bar END).
    */
  def barEndShift(df: DataFrame): DataFrame =
    df.withColumn("ts", col("ts") + expr("INTERVAL 1 MINUTE"))
}
