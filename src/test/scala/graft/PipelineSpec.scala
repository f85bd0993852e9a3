package graft

import graft.core.Timeframe
import graft.lake.{Aggregates, LakeProvider, LakeReader, LakeWriter}
import graft.ops.{Multimodal, Qc}
import graft.sources.{BinanceSource, IbkrSource, RawBar, SymbolMap, SynthSource}
import graft.streaming.CandleStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp
import java.time.{Instant, LocalDate}

class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("symbol mapping follows the reference rules") {
    assert(SymbolMap.toBinanceSymbol("BTC-USD") === "BTCUSDT")
    assert(SymbolMap.toBinanceSymbol("SOL-USD") === "SOLUSDT")
    assert(SymbolMap.toBinanceSymbol("SOL-EUR") === "SOLEUR")
    assert(SymbolMap.toBinanceSymbol("BTCUSDT") === "BTCUSDT")
    assert(SymbolMap.splitSymbol("BTC-USD") === ("BTC", "USD"))
    assert(SymbolMap.splitSymbol("ETHUSD") === ("ETH", "USD"))
    assert(SymbolMap.splitSymbol("ADAUSDT") === ("ADA", "USDT"))
    assert(SymbolMap.cryptoContract("BTC-USD")("exchange") === "PAXOS")
    assertThrows[IllegalArgumentException](SymbolMap.splitSymbol("XYZ"))
  }

  test("binance connector paginates, clips, and normalizes to canonical candles") {
    var calls = 0
    val fake = (sym: String, interval: String, fromMs: Long, toMs: Long, limit: Int) => {
      calls += 1
      assert(sym === "BTCUSDT" && interval === "1m" && limit === 1000)
      // serve bars in pages of 700
      val step = 60000L
      (0 until 700).map(i => fromMs + i * step).filter(_ < toMs)
        .map(t => RawBar(t, 1.0, 2.0, 0.5, 1.5, 10.0))
    }
    val src = new BinanceSource(fake)
    val day = Instant.parse("2025-08-01T00:00:00Z")
    val df = src.fetch(spark, "BTC-USD", Timeframe.M1, day, day.plusSeconds(86400))
    assert(calls === 3) // 1440 bars / 700 per page -> 3 requests
    assert(df.count() === 1440)
    assert(df.select(min(col("ts"))).head.getTimestamp(0).toString === "2025-08-01 00:00:00.0")
    assert(df.select("source", "symbol", "timeframe").distinct().collect()
      .map(_.toSeq).toSeq === Seq(Seq("binance", "BTC-USD", "M1")))
  }

  test("ibkr connector plans 3x8h chunks and applies the bar-end shift") {
    val src = new IbkrSource((_, from, to) => {
      val step = 60000L
      Iterator.iterate(from.toEpochMilli)(_ + step).takeWhile(_ < to.toEpochMilli)
        .map(t => RawBar(t, 1.0, 1.0, 1.0, 1.0, 1.0)).toSeq
    })
    val chunks = src.dayChunks(LocalDate.parse("2025-08-01"))
    assert(chunks.length === 3)
    assert(chunks.head._1 === Instant.parse("2025-08-01T00:00:00Z"))
    assert(chunks.last._2 === Instant.parse("2025-08-02T00:00:00Z"))
    val df = src.fetchDay(spark, "BTC-USD", LocalDate.parse("2025-08-01"))
    assert(df.count() === 1440)
    // bar-end: first stamp 00:01, last 00:00 next day
    assert(df.select(min(col("ts"))).head.getTimestamp(0).toString === "2025-08-01 00:01:00.0")
    assert(df.select(max(col("ts"))).head.getTimestamp(0).toString === "2025-08-02 00:00:00.0")
    assert(df.select("what_to_show").distinct().head.getString(0) === "AGGTRADES")
  }

  test("ibkr 10299 downgrade: retries once with AGGTRADES, rethrows other errors") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    def req(wts: String): Seq[RawBar] = {
      calls += wts
      if (wts != "AGGTRADES")
        throw new RuntimeException(
          "Error 10299: requested what to show is not available; use whatToShow=AGGTRADES")
      Seq(RawBar(0L, 1, 1, 1, 1, 1))
    }
    val (bars, used) = IbkrSource.withAggTradesDowngrade(req, "TRADES")
    assert(bars.length === 1 && used === "AGGTRADES")
    assert(calls.toSeq === Seq("TRADES", "AGGTRADES"))
    // 10299 while ALREADY on AGGTRADES must not loop: it propagates
    calls.clear()
    intercept[RuntimeException] {
      IbkrSource.withAggTradesDowngrade(
        wts => { calls += wts; throw new RuntimeException("Error 10299 ... AGGTRADES") },
        "AGGTRADES")
    }
    assert(calls.toSeq === Seq("AGGTRADES"))
    // unrelated errors propagate without a downgrade attempt
    intercept[RuntimeException] {
      IbkrSource.withAggTradesDowngrade(_ => throw new RuntimeException("pacing violation"))
    }
  }

  // deterministic multi-day M1 fixture: OHLCV is a pure function of the
  // bar's open-time minute, so the expected lake content is recomputable
  // in-test without trusting any engine code under test
  private def fixtureBar(tMs: Long): RawBar = {
    val m = tMs / 60000L
    val p = (m % 97).toDouble / 7.0 + 1.0
    RawBar(tMs, p, p + 2.0, p - 1.0, p + 1.0, (m % 3 + 1).toDouble)
  }

  test("binance fixture replay E2E: paged multi-day ingest with a 429 retry -> upsert -> readRange -> resample") {
    val day1 = Instant.parse("2025-08-01T00:00:00Z")
    val day3 = Instant.parse("2025-08-03T00:00:00Z")
    // canned transport: serves the fixture series in 1000-bar pages and
    // fails the SECOND page request with a 429 exactly once
    var pageCalls = 0
    var thrown429 = false
    val transport = (sym: String, iv: String, fromMs: Long, toMs: Long, limit: Int) => {
      assert(sym === "BTCUSDT" && iv === "1m" && limit === 1000)
      pageCalls += 1
      if (pageCalls == 2 && !thrown429) {
        thrown429 = true
        throw new RuntimeException("HTTP 429 Too Many Requests")
      }
      Iterator.iterate(fromMs)(_ + 60000L).takeWhile(_ < toMs).take(limit)
        .map(fixtureBar).toSeq
    }
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val src = new BinanceSource(BinanceSource.withRetry429(transport, sleeps += _))
    val root = Files.createTempDirectory("binance_e2e").toString
    // two single-day ingest windows, exactly how the fill orchestrator
    // walks a month (2 pages/day at 1000 bars -> 4 page calls + 1 retried)
    Seq(day1, day1.plusSeconds(86400)).foreach { d =>
      LakeWriter.upsert(spark, root,
        src.fetch(spark, "BTC-USD", Timeframe.M1, d, d.plusSeconds(86400)))
    }
    assert(pageCalls === 5 && sleeps.toSeq === Seq(1000L),
      "expected 4 served pages (2/day at 1000 bars) + 1 retried 429 with the published 1 s first backoff")
    val back = LakeReader.readRange(spark, root, "binance", "BTC-USD", "M1",
      Some(Timestamp.from(day1)), Some(Timestamp.from(day3)))
    val got = back.select("ts", "open", "high", "low", "close", "volume")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).sortBy(_._1).toSeq
    val want = Iterator.iterate(day1.toEpochMilli)(_ + 60000L)
      .takeWhile(_ < day3.toEpochMilli).map(fixtureBar)
      .map(b => (b.openTimeMs, b.open, b.high, b.low, b.close, b.volume)).toSeq
    assert(got === want, "lake read-back != canned payload")
    // resample the lake read to M5 and check against the independently
    // recomputed expectation from the raw fixture
    val m5 = graft.ops.Resample.ohlcv(back, Timeframe.M5)
      .select("ts", "open", "high", "low", "close", "volume")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).sortBy(_._1).toSeq
    val wantM5 = want.groupBy(_._1 / 300000L).toSeq.sortBy(_._1).map { case (b, bars) =>
      (b * 300000L, bars.head._2, bars.map(_._3).max, bars.map(_._4).min,
        bars.last._5, bars.map(_._6).sum)
    }
    assert(m5 === wantM5, "M5 resample != fixture-derived expectation")
  }

  test("ibkr fixture replay E2E: chunked multi-day ingest with a 10299 downgrade -> upsert -> readRange -> resample") {
    val d1 = LocalDate.parse("2025-08-01")
    val d2 = LocalDate.parse("2025-08-02")
    // canned TWS transport: 8h of fixture M1 bars per chunk; the SECOND
    // chunk request rejects TRADES with the 10299 error once, forcing the
    // downgrade path through IbkrSource.withAggTradesDowngrade
    val wtsCalls = scala.collection.mutable.ArrayBuffer.empty[String]
    var chunkCalls = 0
    val src = new IbkrSource((sym, from, to) => {
      assert(sym === "BTC-USD")
      chunkCalls += 1
      val isSecond = chunkCalls == 2
      val (bars, used) = IbkrSource.withAggTradesDowngrade({ wts =>
        wtsCalls += wts
        if (isSecond && wts == "TRADES")
          throw new RuntimeException(
            "Error 10299: requested what to show is not available; use whatToShow=AGGTRADES")
        Iterator.iterate(from.toEpochMilli)(_ + 60000L).takeWhile(_ < to.toEpochMilli)
          .map(fixtureBar).toSeq
      }, "TRADES")
      assert(used === (if (isSecond) "AGGTRADES" else "TRADES"))
      bars
    })
    val root = Files.createTempDirectory("ibkr_e2e").toString
    Seq(d1, d2).foreach(d => LakeWriter.upsert(spark, root, src.fetchDay(spark, "BTC-USD", d)))
    assert(chunkCalls === 6, "2 days x 3 8h chunks")
    assert(wtsCalls.count(_ == "AGGTRADES") === 1 && wtsCalls.size === 7,
      "exactly one downgrade retry among 6 chunk fetches")
    // bar-END stamps: day d covers (d 00:01 .. d+1 00:00]
    val from = Timestamp.from(Instant.parse("2025-08-01T00:00:00Z"))
    val to = Timestamp.from(Instant.parse("2025-08-03T00:01:00Z"))
    val back = LakeReader.readRange(spark, root, "ibkr", "BTC-USD", "M1", Some(from), Some(to))
    val got = back.select("ts", "open", "high", "low", "close", "volume")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).sortBy(_._1).toSeq
    val want = Iterator.iterate(Instant.parse("2025-08-01T00:00:00Z").toEpochMilli)(_ + 60000L)
      .takeWhile(_ < Instant.parse("2025-08-03T00:00:00Z").toEpochMilli).map(fixtureBar)
      .map(b => (b.openTimeMs + 60000L, b.open, b.high, b.low, b.close, b.volume)).toSeq
    assert(got === want, "lake read-back != bar-end-shifted canned payload")
    assert(got.size === 2880)
    // resample sanity on the shifted stamps: (00:01 .. 00:00] straddles the
    // 5-minute grid, so 2880 bar-end M1 stamps land in 577 left-label buckets
    assert(graft.ops.Resample.ohlcv(back, Timeframe.M5).count() === 577L)
  }

  test("weight budget: paces requests and sleeps out exhausted windows") {
    import graft.sources.WeightBudget
    var nowMs = 0L
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val budget = new WeightBudget(maxWeightPerMinute = 10,
      clock = () => nowMs, sleeper = ms => { sleeps += ms; nowMs += ms })
    // 5 reqs x weight 2 = 10 fits; each paced by the per-call sleep
    budget.maybeWait(5, weightPerReq = 2, sleepPerCallMs = 200L)
    assert(budget.used === 10)
    assert(sleeps.toSeq === Seq.fill(5)(200L))
    // next request exceeds the budget: sleep to the window end, then reset
    sleeps.clear()
    budget.maybeWait(1, weightPerReq = 2, sleepPerCallMs = 200L)
    assert(sleeps.head === 60000L - 1000L) // window opened at 0, 5x200ms spent
    assert(budget.used === 2)
    // a fresh window after 60 s resets the used weight without sleeping long
    sleeps.clear()
    nowMs += 61000L
    budget.maybeWait(1, weightPerReq = 2, sleepPerCallMs = 200L)
    assert(sleeps.toSeq === Seq(200L) && budget.used === 2)
  }

  test("withRetry429 retries only rate-limit-shaped failures, not any message containing '429'") {
    import graft.sources.{BinanceSource, RawBar}
    def run(msg: String, failures: Int): (Int, Seq[Long]) = {
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      var calls = 0
      val fetch = BinanceSource.withRetry429((_, _, _, _, _) => {
        calls += 1
        if (calls <= failures) throw new RuntimeException(msg)
        Seq.empty[RawBar]
      }, sleeps += _)
      try fetch("BTCUSDT", "1m", 0L, 60000L, 1000) catch { case _: Exception => () }
      (calls, sleeps.toSeq)
    }
    // rate-limit shapes retry with the published backoff — including the
    // exact java.net.HttpURLConnection message and the parenthesized form
    assert(run("HTTP 429 Too Many Requests", 1) === (2, Seq(1000L)))
    assert(run("429: Too Many Requests", 1) === (2, Seq(1000L)))
    assert(run("Server returned HTTP response code: 429 for URL: https://example.invalid/api/v3/klines", 1)
      === (2, Seq(1000L)))
    assert(run("Too Many Requests (429)", 1) === (2, Seq(1000L)))
    // key=value transports: '=' delimits the status just like ':' does
    assert(run("request failed with status_code=429", 1) === (2, Seq(1000L)))
    assert(run("code=429 retry later", 1) === (2, Seq(1000L)))
    // a path/id merely embedding 429 must NOT trigger retry sleeps
    assert(run("failed to read /tmp/shard_429.parquet", 1) === (1, Nil))
    assert(run("row count 14290 mismatch", 1) === (1, Nil))
    assert(run("key 4290 not found", 1) === (1, Nil))
  }

  test("pacing schedules match the reference constants") {
    import graft.sources.Pacing
    assert((0 to 5).map(Pacing.binance429BackoffSeconds) === Seq(1, 2, 4, 8, 10, 10))
    assert(Pacing.ibkrRepairWindowsSeconds === Seq(3600, 1800, 600, 300))
    assert(Pacing.binanceReqsPerDay === Map("M1" -> 2, "M5" -> 1, "M15" -> 1, "M30" -> 1))
    val src = new IbkrSource((_, _, _) => Nil)
    // a 10-minute gap uses the smallest window covering it (600 s): one shot
    val p1 = src.repairPlan(Instant.parse("2025-08-01T03:00:00Z"), Instant.parse("2025-08-01T03:10:00Z"))
    assert(p1 === Seq((Instant.parse("2025-08-01T03:00:00Z"), Instant.parse("2025-08-01T03:10:00Z"))))
    // a 2-hour gap exceeds all windows: stepped 3600 s chunks
    val p2 = src.repairPlan(Instant.parse("2025-08-01T00:00:00Z"), Instant.parse("2025-08-01T02:00:00Z"))
    assert(p2.length === 2 && p2.head._2 === Instant.parse("2025-08-01T01:00:00Z"))
  }

  test("provider serves M1, materialized aggregates, and on-the-fly fallback") {
    val root = Files.createTempDirectory("lake").toString
    val bars = SynthSource.m1(spark, "BTC-USD", "2025-08-01", "2025-08-02")
    LakeWriter.upsert(spark, root, bars)
    val provider = new LakeProvider(spark, root)
    val from = Some(Timestamp.valueOf("2025-08-01 00:00:00"))
    val to = Some(Timestamp.valueOf("2025-08-02 00:00:00"))
    assert(provider.loadM1("BTC-USD", from, to).count() === 1440)
    // no materialized M5 yet -> on-the-fly resample
    val onTheFly = provider.loadTf("BTC-USD", "5 mins", from, to)
    assert(onTheFly.count() === 288)
    // materialize M5, then the provider must serve the pre-aggregate
    Aggregates.materialize(spark, root,
      provider.loadM1("BTC-USD", None, None), Timeframe.M5)
    val served = provider.loadTf("BTC-USD", "M5", from, to)
    assert(served.count() === 288)
    val (exec, filt) = provider.loadExecAndFilter("BTC-USD", from, to, "1 min", "M5")
    assert(exec.count() === 1440 && filt.count() === 288)
  }

  test("QC day completeness flags short days") {
    val full = SynthSource.m1(spark, "BTC-USD", "2025-08-01", "2025-08-01")
    val short = full.where(col("ts") < lit("2025-08-01 23:00:00"))
    val rep = Qc.dayCompleteness(full.unionByName(
      short.withColumn("ts", col("ts") + expr("INTERVAL 1 DAY"))), Timeframe.M1)
      .orderBy("day").collect()
    assert(rep(0).getAs[Boolean]("complete"))
    assert(!rep(1).getAs[Boolean]("complete"))
    assert(rep(1).getAs[Long]("missing") === 60L)
    assert(Qc.duplicateKeys(full, Seq("ts")).count() === 0)
  }

  test("streaming ticks aggregate into watermarked M1 bars (memory sink)") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, Double, Double)]
    val ticks = input.toDF().toDF("ts", "symbol", "price", "size")
    val q = CandleStream.m1Bars(ticks)
      .writeStream.outputMode("append").format("memory").queryName("bars_out").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      input.addData(
        (t("2025-08-01 00:00:05"), "BTC", 100.0, 1.0),
        (t("2025-08-01 00:00:30"), "BTC", 105.0, 2.0),
        (t("2025-08-01 00:00:55"), "BTC", 99.0, 1.0),
        (t("2025-08-01 00:01:10"), "BTC", 101.0, 1.0))
      q.processAllAvailable()
      // advance watermark past 00:01 so the first window closes
      input.addData((t("2025-08-01 00:05:00"), "BTC", 102.0, 1.0))
      q.processAllAvailable()
      val bars = spark.table("bars_out").orderBy("ts").collect()
      assert(bars.nonEmpty)
      val b0 = bars.head
      assert(b0.getAs[Timestamp]("ts").toString === "2025-08-01 00:00:00.0")
      assert(b0.getAs[Double]("open") === 100.0)
      assert(b0.getAs[Double]("high") === 105.0)
      assert(b0.getAs[Double]("low") === 99.0)
      assert(b0.getAs[Double]("close") === 99.0)
      assert(b0.getAs[Double]("volume") === 4.0)
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch range join") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    // openers: (user, open_id, open_ts); points: (user, pt_id, ts)
    val opens = Seq((1L, 100L, t("2025-08-01 10:00:00")),
      (1L, 101L, t("2025-08-01 10:30:00")),
      (2L, 200L, t("2025-08-01 10:30:00")))
    val points = Seq(
      (1L, 1L, t("2025-08-01 09:59:59")), // before every window
      (1L, 2L, t("2025-08-01 10:00:00")), // in 100 only
      (1L, 3L, t("2025-08-01 10:45:00")), // in 100 AND 101
      (1L, 4L, t("2025-08-01 11:00:00")), // 100 closed (half-open), in 101
      (2L, 5L, t("2025-08-01 10:10:00")), // before user 2's window
      (2L, 6L, t("2025-08-01 10:45:00"))) // in 200; user isolation from 100/101
    val oIn = MemoryStream[(Long, Long, Timestamp)]
    val pIn = MemoryStream[(Long, Long, Timestamp)]
    val joined = graft.streaming.EnrichStream.pointsInWindows(
      pIn.toDF().toDF("user_id", "pt_id", "ts"), "ts",
      oIn.toDF().toDF("user_id", "open_id", "open_ts"), "open_ts",
      windowSeconds = 3600L, keys = Seq("user_id"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("enrich_out").start()
    val got = try {
      oIn.addData(opens: _*)
      pIn.addData(points: _*)
      q.processAllAvailable()
      spark.table("enrich_out").select("pt_id", "open_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally q.stop()
    // batch reference: the chunked RangeJoin on the same rows (epoch secs)
    val bp = points.map { case (u, id, ts) => (u, id, ts.getTime / 1000) }
      .toDF("user_id", "pt_id", "p")
    val bo = opens.map { case (u, id, ts) =>
      (u, id, ts.getTime / 1000, ts.getTime / 1000 + 3600L) }
      .toDF("user_id", "open_id", "s", "e")
    val batch = graft.ops.RangeJoin
      .pointInInterval(bp, "p", bo, "s", "e", 3600L, keys = Seq("user_id"))
      .select("pt_id", "open_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch === Set((2L, 100L), (3L, 100L), (3L, 101L), (4L, 101L), (6L, 200L)))
    assert(got === batch)
  }

  test("streaming sessionization: stateful gap sessions close on watermark, match batch semantics") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
    val q = graft.streaming.SessionStream.sessions(events, gapSeconds = 600L,
        watermark = "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      def sec(s: String) = t(s).getTime / 1000L
      // user 1: two events 5 min apart (one session), continued NEXT batch
      // (cross-batch state), then a 2h silence
      input.addData((1L, t("2025-08-01 00:00:00")), (1L, t("2025-08-01 00:05:00")),
        (2L, t("2025-08-01 00:01:00")))
      q.processAllAvailable()
      input.addData((1L, t("2025-08-01 00:09:00"))) // still within gap of 00:05
      q.processAllAvailable()
      assert(spark.table("sess_out").isEmpty) // nothing provably closed yet
      // advance the watermark far past last+gap for both users
      input.addData((1L, t("2025-08-01 02:00:00")), (2L, t("2025-08-01 02:00:00")))
      q.processAllAvailable()
      // one more batch so the event-time timeout fires under the new watermark
      input.addData((3L, t("2025-08-01 03:00:00")))
      q.processAllAvailable()
      val out = spark.table("sess_out").orderBy("user_id", "session_start")
        .as[graft.streaming.SessionStream.ClosedSession].collect()
      // the 02:00 singletons ALSO closed: watermark reached 03:00 > 02:00+gap
      val u1 = out.filter(_.user_id == 1L)
      assert(u1.map(s => (s.session_start, s.session_end, s.n_events)).toSeq ===
        Seq((sec("2025-08-01 00:00:00"), sec("2025-08-01 00:09:00"), 3L),
          (sec("2025-08-01 02:00:00"), sec("2025-08-01 02:00:00"), 1L)))
      val u2 = out.filter(_.user_id == 2L)
      assert(u2.map(s => (s.session_start, s.session_end, s.n_events)).toSeq ===
        Seq((sec("2025-08-01 00:01:00"), sec("2025-08-01 00:01:00"), 1L),
          (sec("2025-08-01 02:00:00"), sec("2025-08-01 02:00:00"), 1L)))
      // user 3's session is still open: no watermark has passed it
      assert(out.forall(_.user_id != 3L))
    } finally q.stop()
  }

  test("levels writer: yearly tree, keep-last on (session_date, symbol)") {
    val root = Files.createTempDirectory("lake").toString
    val bars = SynthSource.m1(spark, "BTC-USD", "2025-08-01", "2025-08-02")
    val levels = graft.ops.OrLevels.build(bars, "UTC", "00:00-01:00")
    graft.lake.LevelsWriter.upsert(spark, root, levels)
    assert(graft.lake.LevelsWriter.read(spark, root, "BTC-USD").count() === 2)
    // re-upsert with a modified row: keep-last, no duplicates
    val patched = levels.withColumn("or_high", col("or_high") + 1.0)
    graft.lake.LevelsWriter.upsert(spark, root, patched)
    val readBack = graft.lake.LevelsWriter.read(spark, root, "BTC-USD")
    assert(readBack.count() === 2)
    val orig = levels.orderBy("session_date").collect().map(_.getAs[Double]("or_high"))
    val got = readBack.orderBy("session_date").collect().map(_.getAs[Double]("or_high"))
    assert(got.toSeq === orig.map(_ + 1.0).toSeq)
  }

  test("streaming documents: watermarked dedup, annotation, quality filter") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val q = graft.streaming.DocumentStream.cleaned(docs, minQuality = 0.4)
      .writeStream.outputMode("append").format("memory").queryName("docs_out").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      val good = "a perfectly reasonable sentence with a number of ordinary words " * 3
      input.addData(
        (t("2025-08-01 00:00:01"), 1L, good),
        (t("2025-08-01 00:00:02"), 2L, good),            // exact dup inside watermark
        (t("2025-08-01 00:00:03"), 3L, ";;;;!!!.... ,,,, ;;; !!!"), // quality-filtered
        (t("2025-08-01 00:00:04"), 4L, good + "but different"))
      q.processAllAvailable()
      val out = spark.table("docs_out").orderBy("doc_id").collect()
      assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 4L))
      assert(out.forall(_.getAs[Double]("quality_score") >= 0.4))
      // streaming signature == batch kernel on the same text
      val batchSig = Seq(good).toDF("text")
        .select(graft.ops.Dedup.simhash(col("text"))).head.getLong(0)
      assert(out.find(_.getAs[Long]("doc_id") == 1L).get.getAs[Long]("simhash") === batchSig)
      assert(out.forall(_.getAs[String]("lang_guess") == "en"))
    } finally q.stop()
  }

  test("liquidity profiles: us_equity_open tracks the NY DST shift") {
    // US DST 2025 springs forward on Mar 9: 09:30 America/New_York is
    // 14:30 UTC on Mar 7 (EST) but 13:30 UTC on Mar 10 (EDT)
    val bars = SynthSource.m1(spark, "BTC-USD", "2025-03-07", "2025-03-10")
    val prof = graft.ops.LiquidityProfiles.crypto("us_equity_open")
    assert(prof.window === "09:30-09:35")
    val levels = graft.ops.LiquidityProfiles(bars, "us_equity_open")
      .orderBy("session_date").collect()
    val starts = levels.map(r => r.getAs[java.sql.Date]("session_date").toString ->
      r.getAs[Timestamp]("or_start").toString).toMap
    assert(starts("2025-03-07") === "2025-03-07 14:30:00.0")
    assert(starts("2025-03-10") === "2025-03-10 13:30:00.0")
    // unknown profile names fail loudly
    intercept[IllegalArgumentException](graft.ops.LiquidityProfiles(bars, "nope"))
  }

  test("IVF ANN finds identical-vector neighbors; skew salting preserves results") {
    import spark.implicits._
    val vecs = (0 until 40).map(i =>
      (i.toLong, (0 until 8).map(j => (j * (i % 4 + 1)).toFloat))).toDF("vec_id", "embedding")
    val ivf = graft.ops.Similarity.ivfTopK(
      vecs.where(col("vec_id") === 0), vecs, "vec_id", "embedding", 5, nCentroids = 4)
    // ids with the same i%4 are scalar multiples -> cosine 1.0, same cell
    val top = ivf.orderBy("rank").collect()
    assert(top.nonEmpty && top.head.getAs[Double]("cosine") === 1.0)

    val large = (0 until 1000).map(i => ("hot", i)).toDF("k", "v")
    val small = Seq(("hot", 99)).toDF("k", "w")
    val salted = graft.ops.Skew.saltedJoin(large, small, Seq("k"), factor = 8)
    assert(salted.count() === 1000)
    val counts = graft.ops.Skew.twoPhaseCount(large, Seq("k"), factor = 8).collect()
    assert(counts.length === 1 && counts.head.getAs[Long]("n") === 1000L)
    // a map-typed column must not break the content-hash salt (xxhash64
    // rejects MapType at analysis time — saltLarge excludes it and hashes
    // the rest of the row)
    val withMap = large.withColumn("m", map(col("k"), col("v")))
    val saltedMap = graft.ops.Skew.saltLarge(withMap, Seq("k"), factor = 8)
    assert(saltedMap.select("_salt").distinct().count() > 1,
      "salt must still split the hot key from the non-map content")
    // but an all-map frame has no content to hash deterministically
    intercept[IllegalArgumentException](
      graft.ops.Skew.saltLarge(withMap.select("m"), Seq("m"), factor = 8))
  }

  test("streaming writeToLake: bars land in the lake via the idempotent upsert sink") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val root = Files.createTempDirectory("streamlake").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    val input = MemoryStream[(Timestamp, String, Double, Double)]
    val ticks = input.toDF().toDF("ts", "symbol", "price", "size")
    val q = CandleStream.writeToLake(CandleStream.m1Bars(ticks), root, ckpt).start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      input.addData(
        (t("2025-08-01 00:00:05"), "BTC-USD", 100.0, 1.0),
        (t("2025-08-01 00:00:40"), "BTC-USD", 101.0, 1.0))
      q.processAllAvailable()
      input.addData((t("2025-08-01 00:05:00"), "BTC-USD", 102.0, 1.0)) // closes 00:00 window
      q.processAllAvailable()
      val onDisk = spark.read.parquet(s"$root/data")
      assert(onDisk.where(col("ts") === lit("2025-08-01 00:00:00")).count() === 1)
      val bar = onDisk.where(col("ts") === lit("2025-08-01 00:00:00")).head
      assert(bar.getAs[Double]("open") === 100.0 && bar.getAs[Double]("close") === 101.0)
      assert(onDisk.select("source").distinct().head.getString(0) === "stream")
    } finally q.stop()
  }

  test("streaming writeToLake survives a restart; a replayed batch upserts harmlessly") {
    // the sink's exactly-once story = checkpoint recovery (foreachBatch)
    // + idempotent merge keyed on (source,symbol,tf,ts): restart must
    // continue, and re-delivering an already-landed batch must change
    // nothing — pin both
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val root = Files.createTempDirectory("streamlake_rs").toString
    val ckpt = Files.createTempDirectory("ckpt_rs").toString
    val input = MemoryStream[(Timestamp, String, Double, Double)]
    val ticks = input.toDF().toDF("ts", "symbol", "price", "size")
    def t(s: String) = Timestamp.valueOf(s)
    def start() = CandleStream.writeToLake(CandleStream.m1Bars(ticks), root, ckpt).start()
    val q1 = start()
    try {
      input.addData((t("2025-08-01 00:00:05"), "BTC-USD", 100.0, 1.0))
      q1.processAllAvailable()
      input.addData((t("2025-08-01 00:05:00"), "BTC-USD", 102.0, 1.0)) // closes 00:00
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start() // resume from the same checkpoint
    try {
      input.addData((t("2025-08-01 00:10:00"), "BTC-USD", 104.0, 2.0)) // closes 00:05
      q2.processAllAvailable()
    } finally q2.stop()
    def bars() = spark.read.parquet(s"$root/data")
      .select("ts", "open", "close", "volume").orderBy("ts")
      .as[(Timestamp, Double, Double, Double)].collect().toSeq
    val afterRestart = bars()
    assert(afterRestart === Seq(
      (t("2025-08-01 00:00:00"), 100.0, 100.0, 1.0),
      (t("2025-08-01 00:05:00"), 102.0, 102.0, 1.0)),
      "restarted stream must continue landing closed bars exactly once")
    // simulated at-least-once redelivery: the SAME closed bar upserted
    // again by hand — keep-last merge must leave the lake bit-identical
    graft.lake.LakeWriter.upsert(spark, root,
      Seq((t("2025-08-01 00:05:00"), 102.0, 102.0, 102.0, 102.0, 1.0, "BTC-USD", "M1", "stream"))
        .toDF("ts", "open", "high", "low", "close", "volume", "symbol", "timeframe", "source"))
    assert(bars() === afterRestart, "a replayed batch must upsert to a no-op")
  }

  test("graft SQL functions: extensions class at construction + live-session register") {
    // live-session registration on the shared session
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D,2.0D), array(3.0D,4.0D)) AS d, " +
        "graft_polyhash('hello world abc') AS h, " +
        "size(graft_shingles('a b c d', 3)) AS s, " +
        // no bits arg: the SQL surface must share the Column API's wide
        // default (r16), pinned by comparing against Dedup.simhash's default
        "graft_simhash('hello world abc') AS sh, " +
        "graft_textstats('hello world abc').n_tokens AS nt, " +
        "graft_zorder(3L, 0L) AS z").head
    assert(r.getDouble(0) === 11.0)
    assert(r.getLong(1) === 88643107L)
    assert(r.getInt(2) === 2)
    assert(r.getAs[Long]("z") === 5L)
    // SQL surface == Column-API kernels
    import spark.implicits._
    val (expSh, expNt) = Seq("hello world abc").toDF("t")
      .select(graft.ops.Dedup.simhash(col("t")),
        graft.ops.TextAnalysis.tokenCount(col("t")).cast("long"))
      .as[(Long, Long)].head()
    assert(r.getLong(3) === expSh)
    assert(r.getLong(4) === expNt)

    // extensions path: new session on the SAME context (never stop it — that
    // would kill the shared SparkContext for every other suite)
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(ext ne spark)
      assert(ext.sql("SELECT graft_polyhash('x') AS h").head.getLong(0) ===
        graft.functions.TextKernels.polyHash(
          org.apache.spark.unsafe.types.UTF8String.fromString("x")))
    } finally {
      SparkSession.clearActiveSession()
      prev.foreach(SparkSession.setDefaultSession)
    }
  }

  test("graft table functions: SQL graft_sessionize/graft_asof == Column-API operators") {
    import spark.implicits._
    graft.functions.GraftExtensions.register(spark)
    def t(s: String) = Timestamp.valueOf(s)
    Seq((1L, t("2025-08-01 00:00:00")), (1L, t("2025-08-01 00:10:00")),
      (1L, t("2025-08-01 02:00:00")), (2L, t("2025-08-01 01:00:00")))
      .toDF("user_id", "ts").createOrReplaceTempView("tvf_events")
    val viaSql = spark.sql(
      "SELECT user_id, session_start, session_end, n_events " +
        "FROM graft_sessionize('tvf_events', 1800) ORDER BY user_id, session_start")
    val viaApi = graft.ops.EventOps.sessionize(spark.table("tvf_events"), 1800L)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
    assert(viaSql.collect().toSeq === viaApi.collect().toSeq)

    Seq((t("2025-08-01 00:00:30"), 1.0), (t("2025-08-01 00:02:10"), 2.0))
      .toDF("ts", "px").createOrReplaceTempView("tvf_exec")
    Seq((t("2025-08-01 00:00:00"), 10.0), (t("2025-08-01 00:02:00"), 20.0))
      .toDF("ts", "ctx").createOrReplaceTempView("tvf_ctx")
    val asofSql = spark.sql(
      "SELECT ts, px, ctx FROM graft_asof('tvf_exec', 'tvf_ctx') ORDER BY ts")
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(asofSql === Seq(
      (t("2025-08-01 00:00:30"), 1.0, 10.0),
      (t("2025-08-01 00:02:10"), 2.0, 20.0)))
    // usable inside a larger SQL query (joins back onto a view)
    val n = spark.sql(
      "SELECT count(*) FROM graft_sessionize('tvf_events', 1800) s " +
        "JOIN tvf_events e ON e.user_id = s.user_id").head.getLong(0)
    assert(n === 7L) // u1: 3 events x 2 sessions = 6, u2: 1 x 1 = 1
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    // AQE hides the static plan shape; check the co-location guarantee with
    // it off for this test
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val a = (0 until 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
      val b = (0 until 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
      graft.lake.Bucketing.writeBucketed(a, "bkt_a", Seq("k"), 4, Seq("k"))
      graft.lake.Bucketing.writeBucketed(b, "bkt_b", Seq("k"), 4, Seq("k"))
      // disable broadcast so the no-shuffle claim is about BUCKET co-location,
      // not about one side being small enough to broadcast
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = graft.lake.Bucketing.coLocatedJoin(spark, "bkt_a", "bkt_b", Seq("k"))
        assert(joined.count() === 1000)
        assert(joined.queryExecution.executedPlan.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]))
        assert(!graft.lake.Bucketing.hasShuffle(joined), "bucketed SMJ must not shuffle")
        // sanity: the same SMJ over unbucketed frames DOES shuffle
        assert(graft.lake.Bucketing.hasShuffle(a.join(b, Seq("k"))))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("closed-range read [from,to] = [from,to+1s)") {
    val root = Files.createTempDirectory("lake").toString
    graft.lake.LakeWriter.upsert(spark, root,
      SynthSource.m1(spark, "BTC-USD", "2025-08-01", "2025-08-01"))
    val closed = graft.lake.LakeReader.readRangeClosed(spark, root, "synth", "BTC-USD", "M1",
      Some(Timestamp.valueOf("2025-08-01 00:00:00")), Some(Timestamp.valueOf("2025-08-01 00:10:00")))
    assert(closed.count() === 11) // 00:00..00:10 inclusive
  }

  test("streaming bars: same-timestamp ticks have a deterministic open/close tiebreak across arrival orders") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    def run(name: String, ticks: Seq[(Timestamp, String, Double, Double)]) = {
      val input = MemoryStream[(Timestamp, String, Double, Double)]
      input.addData(ticks)
      input.addData((t("2025-08-01 00:10:00"), "X", 1.0, 1.0)) // advance watermark
      val q = CandleStream.m1Bars(input.toDF().toDF("ts", "symbol", "price", "size"),
          watermark = "2 minutes")
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name).where(col("ts") === lit("2025-08-01 00:00:00"))
        .select("open", "close").as[(Double, Double)].head()
    }
    // three ticks at the SAME second at each bar edge, in two arrival orders
    val ticks = Seq(
      (t("2025-08-01 00:00:05"), "X", 12.0, 1.0), (t("2025-08-01 00:00:05"), "X", 10.0, 1.0),
      (t("2025-08-01 00:00:05"), "X", 11.0, 1.0),
      (t("2025-08-01 00:00:50"), "X", 20.0, 1.0), (t("2025-08-01 00:00:50"), "X", 22.0, 1.0),
      (t("2025-08-01 00:00:50"), "X", 21.0, 1.0))
    val a = run("tie_a", ticks)
    val b = run("tie_b", ticks.reverse)
    assert(a === b, "open/close must not depend on arrival order")
    // the documented tie rule: lowest price among earliest ticks opens,
    // highest among latest closes
    assert(a === ((10.0, 22.0)))
  }

  test("streaming: a tick later than the watermark does not reopen a closed bar") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, Double, Double)]
    val ticks = input.toDF().toDF("ts", "symbol", "price", "size")
    val q = CandleStream.m1Bars(ticks, watermark = "2 minutes")
      .writeStream.outputMode("append").format("memory").queryName("late_out").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      input.addData((t("2025-08-01 00:00:10"), "X", 10.0, 1.0))
      q.processAllAvailable()
      // advance watermark far past the 00:00 window -> bar emits and closes
      input.addData((t("2025-08-01 00:10:00"), "X", 11.0, 1.0))
      q.processAllAvailable()
      val closed = spark.table("late_out").where(col("ts") === lit("2025-08-01 00:00:00")).collect()
      assert(closed.length === 1 && closed.head.getAs[Double]("volume") === 1.0)
      // late tick for the already-closed 00:00 window: dropped by the watermark
      input.addData((t("2025-08-01 00:00:50"), "X", 99.0, 5.0))
      input.addData((t("2025-08-01 00:15:00"), "X", 12.0, 1.0))
      q.processAllAvailable()
      val after = spark.table("late_out").where(col("ts") === lit("2025-08-01 00:00:00")).collect()
      assert(after.length === 1 && after.head.getAs[Double]("volume") === 1.0,
        "late tick must not reopen the closed bar (idempotent lake upsert would absorb a re-emit anyway)")
    } finally q.stop()
  }

  test("multimodal: stubbed decode is deterministic, partition-invariant, resize/frames work") {
    import spark.implicits._
    val media = Seq(
      (1L, "img", "hello media bytes".getBytes("UTF-8")),
      (2L, "img", Array.empty[Byte]),
      (3L, "vid", ("x" * 100).getBytes("UTF-8")),
    ).toDF("id", "format", "media")
    val feats = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.id)
    assert(feats.length === 3)
    assert(feats(0).n_bytes === 17L)
    assert(feats(0).features.length === 8)
    assert(feats(1).checksum === 0L && feats(1).features.forall(_ === 0f))
    // determinism across partitioning
    val feats7 = Multimodal.extractFeatures(media.repartition(7), dim = 8).collect().sortBy(_.id)
    assert(feats.map(_.checksum).toSeq === feats7.map(_.checksum).toSeq)

    val resized = Multimodal.resizeMeta(
      Multimodal.extractFeatures(media, 8).toDF(), maxSide = 16).collect()
    assert(resized.forall(r => r.getAs[Int]("out_width") <= 16 && r.getAs[Int]("out_height") <= 16))

    val frames = Multimodal.sampleFrames(media.where(col("id") === 3), frameBytes = 10, everyK = 2)
    assert(frames.count() === 5) // 100 bytes -> 10 frames -> every 2nd = 5
    assert(frames.select(length(col("frame"))).distinct().head.getInt(0) === 10)
  }
}
