package graft

import graft.core.Timeframe
import graft.ops.{Gaps, Resample}
import graft.sources.SynthSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Property-style checks from the SURVEY §5 test plan: resample idempotence,
  * upsert idempotence, gap-fill completeness — swept across seeds/timeframes
  * rather than one fixture (seeds drive the hash-based generator, so each is
  * a genuinely different dataset).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val seeds = Seq(7L, 42L, 1234L)

  test("property: resample(resample(x, tf), tf) == resample(x, tf) across seeds and tfs") {
    for (seed <- seeds; tf <- Seq(Timeframe.M5, Timeframe.M15, Timeframe.H1)) {
      val day = SynthSource.m1(spark, s"S$seed", "2025-08-01", "2025-08-01", seed)
      val once = Resample.ohlcv(day, tf)
      val twice = Resample.ohlcv(once, tf)
      assert(once.orderBy("ts").collect().sameElements(twice.orderBy("ts").collect()),
        s"seed=$seed tf=${tf.code}")
    }
  }

  test("property: synthFill restores exactly the removed minutes, idempotently") {
    for (seed <- seeds) {
      val day = SynthSource.m1(spark, s"S$seed", "2025-08-01", "2025-08-01", seed)
      // remove a seed-dependent stripe of minutes (never the first bar)
      val stride = 7 + (seed % 5).toInt
      val gappy = day.where(
        pmod(hour(col("ts")) * 60 + minute(col("ts")), lit(stride)) =!= lit(stride - 1))
      val removed = 1440 - gappy.count()
      assert(removed > 0)
      // explicit full-day grid: catches removed boundary minutes too
      val bounds = Some((java.sql.Timestamp.valueOf("2025-08-01 00:00:00"),
        java.sql.Timestamp.valueOf("2025-08-01 23:59:00")))
      val filled = Gaps.synthFill(gappy, gridBounds = bounds)
      assert(filled.count() === 1440, s"seed=$seed")
      assert(filled.where(col("is_synth")).count() === removed, s"seed=$seed")
      // idempotent: filling an already-full frame adds nothing
      val refilled = Gaps.synthFill(filled.drop("is_synth"), gridBounds = bounds)
      assert(refilled.count() === 1440 && refilled.where(col("is_synth")).count() === 0)
    }
  }

  test("property: expression OrLevels == typed flatMapGroups OrLevels across seeds/tzs") {
    import org.apache.spark.sql.functions.col
    for (seed <- seeds; tz <- Seq("UTC", "Asia/Tokyo")) {
      val days = SynthSource.m1(spark, s"S$seed", "2025-08-01", "2025-08-03", seed)
      val viaExpr = graft.ops.OrLevels.build(days, tz, "09:00-10:00")
        .orderBy("session_date")
        .select("symbol", "session_date", "or_start", "or_end", "or_high", "or_low",
          "break_dir", "break_ts", "retest_ts", "retest_price").collect()
      val viaTyped = graft.ops.OrLevels.buildTyped(days, tz, "09:00-10:00")
        .orderBy("session_date")
        .select("symbol", "session_date", "or_start", "or_end", "or_high", "or_low",
          "break_dir", "break_ts", "retest_ts", "retest_price").collect()
      assert(viaExpr.length === viaTyped.length, s"seed=$seed tz=$tz")
      viaExpr.zip(viaTyped).foreach { case (a, b) =>
        assert(a === b, s"seed=$seed tz=$tz")
      }
    }
  }

  test("property: upsert is idempotent for any batch") {
    for (seed <- seeds.take(2)) {
      val root = Files.createTempDirectory("lakeprop").toString
      val bars = SynthSource.m1(spark, s"S$seed", "2025-08-01", "2025-08-01", seed)
      graft.lake.LakeWriter.upsert(spark, root, bars)
      graft.lake.LakeWriter.upsert(spark, root, bars)
      assert(spark.read.parquet(s"$root/data").count() === 1440, s"seed=$seed")
    }
  }
}
