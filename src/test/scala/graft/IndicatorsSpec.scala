package graft

import graft.ops.Indicators
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IndicatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def candles(closes: Seq[Double], symbol: String = "A") =
    closes.zipWithIndex.map { case (c, i) =>
      (symbol, new java.sql.Timestamp((1700000000L + i * 300L) * 1000L),
        c + 1.0, c - 1.0, c, 1.0) // high/low bracket close by 1
    }.toDF("symbol", "ts", "high", "low", "close", "volume")

  test("SMA: expanding warmup then trailing mean; constant series is flat") {
    val df = Indicators.enrich(candles(Seq.fill(15)(5.0)), Seq("symbol"))
    val sma = df.orderBy("ts").select("sma").as[Double].collect()
    assert(sma.forall(_ === 5.0))
    val rising = Indicators.enrich(candles((1 to 12).map(_.toDouble)), Seq("symbol"))
      .orderBy("ts").select("sma").as[Double].collect()
    assert(rising(0) === 1.0)           // warmup: mean of first row only
    assert(rising(2) === 2.0)           // mean(1,2,3)
    assert(rising(11) === 7.5)          // mean(3..12), full 10-row frame
  }

  test("SMA/Bollinger: NULL closes use SQL AVG semantics — non-null count (r15)") {
    // closes 2, NULL, 4: SMA over the 3-row frame at row 3 must be
    // mean(2,4)=3.0 (SQL AVG), not (2+4)/3=2.0 (the old count(*) divisor)
    val df = Seq(
      ("A", new java.sql.Timestamp(1700000000L * 1000L), Some(2.0)),
      ("A", new java.sql.Timestamp(1700000300L * 1000L), None: Option[Double]),
      ("A", new java.sql.Timestamp(1700000600L * 1000L), Some(4.0)),
    ).toDF("symbol", "ts", "close")
    val sma = df.select(col("ts"),
        Indicators.smaCols(Seq("symbol"), "ts", col("close"), 10).as("sma"))
      .orderBy("ts").select("sma").as[Option[Double]].collect()
    assert(sma(0) === Some(2.0))
    assert(sma(1) === Some(2.0)) // frame {2, NULL}: AVG = 2
    assert(sma(2) === Some(3.0)) // frame {2, NULL, 4}: AVG = 3, not 2
    val (mid, up, lo) = Indicators.bollingerCols(Seq("symbol"), "ts", col("close"), 10)
    val bb = df.select(col("ts"), mid.as("m"), up.as("u"), lo.as("l"))
      .orderBy("ts").select("m").as[Option[Double]].collect()
    assert(bb(2) === Some(3.0))
    // an all-null frame yields NULL, matching SQL AVG of no rows
    val allNull = Seq(("A", new java.sql.Timestamp(1700000000L * 1000L),
      None: Option[Double])).toDF("symbol", "ts", "close")
    val s0 = allNull.select(
        Indicators.smaCols(Seq("symbol"), "ts", col("close"), 10).as("sma"))
      .select("sma").as[Option[Double]].collect()
    assert(s0.head === None)
  }

  test("Bollinger: constant series has zero-width bands; bands bracket the mid") {
    val flat = Indicators.enrich(candles(Seq.fill(25)(7.0)), Seq("symbol"))
      .orderBy("ts").select("bb_mid", "bb_up", "bb_lo")
      .as[(Double, Double, Double)].collect()
    flat.foreach { case (m, u, l) => assert(m === 7.0 && u === 7.0 && l === 7.0) }
    val noisy = Indicators.enrich(candles(Seq(1, 9, 2, 8, 3, 7, 4, 6, 5, 5).map(_.toDouble)),
        Seq("symbol"))
      .orderBy("ts").select("bb_mid", "bb_up", "bb_lo")
      .as[(Double, Double, Double)].collect()
    noisy.drop(1).foreach { case (m, u, l) => assert(u > m && m > l) }
  }

  test("RSI: null on first row, 100 on monotonic gains, 0-100 bounded") {
    val up = Indicators.enrich(candles((1 to 20).map(_.toDouble)), Seq("symbol"))
      .orderBy("ts").select(col("rsi")).collect()
    assert(up.head.isNullAt(0))
    up.drop(1).foreach(r => assert(r.getDouble(0) === 100.0))
    val mixed = Indicators.enrich(candles(Seq(5, 6, 4, 7, 3, 8, 2).map(_.toDouble)),
        Seq("symbol")).orderBy("ts").select(col("rsi")).collect().drop(1)
    mixed.foreach(r => assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 100.0))
  }

  test("EMA: truncated weights favor recent values; flat series is exact") {
    val flat = Indicators.enrich(candles(Seq.fill(12)(3.0)), Seq("symbol"))
      .orderBy("ts").select("ema").as[Double].collect()
    flat.foreach(v => assert(math.abs(v - 3.0) < 1e-9))
    val jump = Indicators.enrich(candles(Seq.fill(10)(1.0) ++ Seq(11.0)), Seq("symbol"))
      .orderBy("ts").select("ema", "sma").as[(Double, Double)].collect().last
    assert(jump._1 > jump._2, "EMA must react faster than SMA to the jump")
  }

  test("ATR: flat series ATR equals the bar range; jumps widen it") {
    val flat = Indicators.enrich(candles(Seq.fill(20)(10.0)), Seq("symbol"))
      .orderBy("ts").select("atr").as[Double].collect()
    flat.foreach(v => assert(v === 2.0)) // high-low = 2, no close jumps
    val jumpy = Indicators.enrich(candles(Seq(10.0, 20.0, 10.0, 20.0)), Seq("symbol"))
      .orderBy("ts").select("atr").as[Double].collect()
    assert(jumpy.last > 2.0) // |high - prevClose| = 11 dominates
  }

  test("stochastic %K: 50 on a flat window, 0-100 at the extremes") {
    val flat = Indicators.enrich(candles(Seq.fill(16)(4.0)), Seq("symbol"))
      .orderBy("ts").select("stoch_k").as[Double].collect()
    flat.foreach(v => assert(v === 50.0))
    val rising = Indicators.enrich(candles((1 to 16).map(_.toDouble)), Seq("symbol"))
      .orderBy("ts").select("stoch_k").as[Double].collect()
    rising.foreach(v => assert(v >= 0.0 && v <= 100.0))
    // close sits 1 below the window high and 1 above its low: never at the poles
    assert(rising.last > 50.0 && rising.last < 100.0)
  }

  test("MACD: zero on a flat series; positive in an uptrend; hist = macd - signal") {
    val flat = Indicators.withMacd(candles(Seq.fill(40)(5.0)), Seq("symbol"))
      .orderBy("ts").select("macd", "macd_signal", "macd_hist")
      .as[(Double, Double, Double)].collect()
    flat.foreach { case (m, s, h) => assert(m === 0.0 && s === 0.0 && h === 0.0) }
    val up = Indicators.withMacd(candles((1 to 40).map(_.toDouble)), Seq("symbol"))
      .orderBy("ts").select("macd", "macd_signal", "macd_hist")
      .as[(Double, Double, Double)].collect()
    assert(up.last._1 > 0.0, "fast EMA must lead slow EMA in an uptrend")
    up.foreach { case (m, s, h) => assert(math.abs(h - BigDecimal(m - s).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9) }
  }

  test("rollingPairCorr: +1 for linearly rising pairs, -1 for opposed, null when flat") {
    def series(sym: String, f: Int => Double) = (0 until 25).map { i =>
      (sym, new java.sql.Timestamp((1700000000L + i * 300L) * 1000L), f(i))
    }
    val df = (series("A", i => 1.0 + i) ++ series("B", i => 5.0 + 2 * i) ++
      series("C", i => 100.0 - 3 * i) ++ series("D", _ => 7.0))
      .toDF("symbol", "ts", "close")
    val got = Indicators.rollingPairCorr(df, "symbol", n = 20)
      .orderBy("pair", "ts_sec").collect()
      .groupBy(_.getString(0)).map { case (p, rows) =>
        p -> rows.last.getAs[Any]("corr")
      }
    assert(got("A-B") === 1.0)   // both linear up
    assert(got("A-C") === -1.0)  // opposed
    assert(got("A-D") === null)  // D has zero variance
    assert(got.keySet === Set("A-B", "A-C", "A-D", "B-C", "B-D", "C-D"))
  }

  test("cumulative: OBV signs volume by close direction; drawdown tracks the running high") {
    val got = Indicators.cumulative(candles(Seq(10.0, 12.0, 8.0, 8.0, 16.0, 4.0)), Seq("symbol"))
      .orderBy("ts").select("obv", "run_max", "drawdown")
      .as[(Double, Double, Double)].collect().toSeq
    assert(got.map(_._1) === Seq(0.0, 1.0, 0.0, 0.0, 1.0, 0.0)) // +v, -v, flat, +v, -v
    assert(got.map(_._2) === Seq(10.0, 12.0, 12.0, 12.0, 16.0, 16.0))
    assert(got(2)._3 === BigDecimal(8.0 / 12.0 - 1.0).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(4)._3 === 0.0) // at a new high, drawdown is zero
    assert(got(5)._3 === -0.75)
  }

  test("twa: trapezoidal integral over irregular spacing; day resets; degenerate days null") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val df = Seq(
      // A day 1: v=10 for 60 s then ramp 10->20 over 40 s:
      // area = 60*10 + 40*15 = 1200, span 100, twa 12.0
      (1L, "A", t(86400), 10.0), (2L, "A", t(86460), 10.0), (3L, "A", t(86500), 20.0),
      // A day 2: single observation -> null
      (4L, "A", t(2 * 86400 + 50), 99.0),
      // B day 1: two same-second observations -> span 0 -> null
      (5L, "B", t(86400), 1.0), (6L, "B", t(86400), 3.0),
    ).toDF("event_id", "symbol", "ts", "value")
    val got = Indicators.twa(df, Seq("symbol"))
      .orderBy("symbol", "day")
      .as[(String, Long, Long, Long, Option[Double])].collect().toSeq
    assert(got === Seq(
      ("A", 1L, 3L, 100L, Some(12.0)),
      ("A", 2L, 1L, 0L, None),
      ("B", 1L, 2L, 0L, None)))
  }

  test("VWAP: per-day volume weighting; symbols independent") {
    val df = Seq(
      ("A", new java.sql.Timestamp(86400L * 1000L), 11.0, 9.0, 10.0, 1.0),
      ("A", new java.sql.Timestamp((86400L + 300) * 1000L), 21.0, 19.0, 20.0, 3.0),
      ("A", new java.sql.Timestamp(2 * 86400L * 1000L), 51.0, 49.0, 50.0, 2.0), // next day
      ("B", new java.sql.Timestamp(86400L * 1000L), 8.0, 6.0, 7.0, 1.0),
    ).toDF("symbol", "ts", "high", "low", "close", "volume")
    val got = Indicators.enrich(df, Seq("symbol"))
      .select("symbol", "ts", "vwap_day").orderBy("symbol", "ts")
      .as[(String, java.sql.Timestamp, Double)].collect()
    assert(got(0)._3 === 17.5) // (10*1 + 20*3) / 4
    assert(got(1)._3 === 17.5)
    assert(got(2)._3 === 50.0) // new day resets
    assert(got(3)._3 === 7.0)  // symbol B untouched by A
  }
}
