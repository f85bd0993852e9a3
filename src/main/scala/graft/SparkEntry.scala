package graft

import graft.core.Timeframe
import graft.ops._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Determinism conventions shared by every query and its DuckDB oracle:
  *  - timestamps leave the engine as epoch-second BIGINTs (`secs`), sidestepping
  *    parquet ns-vs-us precision differences between Spark and DuckDB;
  *  - sums over doubles go through DECIMAL(18,4) of per-row rounded terms
  *    (`dsum`) so the result is independent of partitioning / summation order;
  *  - every result is fully ordered by its leading output columns;
  *  - integer outputs are LongType (DuckDB aggregates return BIGINT).
  */
object SparkEntry {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(s, dir) else s.read.parquet(s"$dir/$name.parquet")

  /** The events table stores ts as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read it as raw nanos (legacy long mode) and
    * expose BOTH `ts_ns` (exact, for ordering/tiebreaks — matches DuckDB's
    * ns-precision ordering bit-for-bit) and `ts` (µs-truncated TimestampType
    * for the time-bucket/window ops; floor truncation preserves whole-second
    * bucket and range semantics).
    */
  private def loadEvents(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    val asNs = if (raw.schema("ts").dataType.typeName == "long") raw.withColumnRenamed("ts", "ts_ns")
      else raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
    asNs.withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
  }

  private def secs(c: Column): Column = c.cast("long")

  /** Order-insensitive exact sum of a double expression: round each term to 4
    * decimals (bit-identical in Spark and DuckDB — same IEEE double ops), sum
    * as decimal (exact), return double.
    */
  private def dsum(c: Column): Column =
    sum(round(c, 4).cast(DecimalType(28, 4))).cast("double")

  /** events -> M1 OHLCV candles (value = price, count = volume). */
  private def m1Candles(s: SparkSession, dir: String): DataFrame =
    EventOps.candles(tbl(s, dir, "events"), 60L)

  /** Flagship query on sf=0.001 — the reference's MTF as-of join
    * (SURVEY §2.4 J1) over event-derived candles; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_asof_mtf")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A7-style pricing summary (scan + hash agg; partial agg map-side)
    "q01_pricing_summary" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          round(dsum(col("l_quantity")) / count(lit(1)), 4).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // P1 half-open range filter [from, to) — the reference's global read contract
    "q02_range_filter" -> ((s, dir) => {
      tbl(s, dir, "events")
        .where(col("ts") >= to_timestamp(lit("2024-01-10 00:00:00")) &&
          col("ts") < to_timestamp(lit("2024-01-20 00:00:00")))
        .select(col("event_id"), secs(col("ts")).as("ts_sec"), col("event_type"),
          col("value"))
        .orderBy(col("event_id"))
    }),

    // A1 OHLCV resample M1 -> M5 (graft.ops.Resample)
    "q03_resample_m5" -> ((s, dir) => {
      val m5 = Resample.ohlcv(m1Candles(s, dir), Timeframe.M5)
      m5.select(secs(col("ts")).as("ts_sec"), col("open"), col("high"), col("low"),
          col("close"), col("volume"))
        .orderBy(col("ts_sec"))
    }),

    // J1 backward as-of join: M5 context onto M1 exec grain (graft.ops.AsofJoin)
    "q04_asof_mtf" -> ((s, dir) => {
      val m1 = m1Candles(s, dir)
      val m5 = Resample.ohlcv(m1, Timeframe.M5)
      val joined = AsofJoin.backward(
        m1.select(col("ts"), col("close")),
        m5.select(col("ts"), col("close").as("close_m5")))
      joined.select(secs(col("ts")).as("ts_sec"), col("close"), col("close_m5"))
        .orderBy(col("ts_sec"))
    }),

    // J2+W5 minute-gap detection compressed to islands (graft.ops.Gaps)
    "q05_gap_islands" -> ((s, dir) => {
      val minutes = tbl(s, dir, "events")
        .select(timestamp_seconds(floor(unix_timestamp(col("ts")) / 60) * 60).as("ts"))
        .distinct()
      Gaps.minuteGaps(minutes)
        .select(secs(col("gap_start")).as("gap_start_sec"),
          secs(col("gap_end")).as("gap_end_sec"), col("n_missing"))
        .orderBy(col("gap_start_sec"))
    }),

    // A4/A5/W3/P5 opening-range levels with break/retest (graft.ops.OrLevels)
    "q06_or_levels" -> ((s, dir) => {
      val m1 = m1Candles(s, dir).withColumn("symbol", lit("EVENTS"))
      OrLevels.build(m1, "UTC", "00:00-01:00")
        .select(date_format(col("session_date"), "yyyy-MM-dd").as("session_date"),
          col("or_high"), col("or_low"), col("break_dir"),
          secs(col("break_ts")).as("break_ts_sec"),
          secs(col("retest_ts")).as("retest_ts_sec"),
          col("retest_price"))
        .orderBy(col("session_date"))
    }),

    // exact dedup by content hash (graft.ops — training-data pipeline)
    "q07_dedup_exact" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .orderBy(col("text_hash"))
    }),

    // W1/W3-style ranking: top-2 orders per customer
    "q10_topk_per_customer" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      tbl(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 2)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // A6 per-hour completeness histogram, zero-filled 0-23 (graft.ops.EventOps)
    "q11_hour_histogram" -> ((s, dir) => {
      EventOps.hourHistogram(tbl(s, dir, "events"))
        .select(col("hour").cast("long").as("hour"), col("n"))
        .orderBy(col("hour"))
    }),

    // sessionization: inactivity-gap islands per user (graft.ops.EventOps)
    "q12_sessionize" -> ((s, dir) => {
      EventOps.sessionize(tbl(s, dir, "events"), 1800L)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"), max(col("n_events")).as("max_session_events"),
          sum(col("n_events")).as("n_events_total"))
        .orderBy(col("user_id"))
    }),

    // multi-join star query: revenue per market segment (broadcast dims)
    "q13_segment_revenue" -> ((s, dir) => {
      val c = tbl(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
      val o = tbl(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = tbl(s, dir, "lineitem")
        .select(col("l_orderkey"), (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(dsum(col("rev")).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("c_mktsegment"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = {
    val m1Sql =
      """SELECT (floor(epoch(ts)/60)*60)::BIGINT AS ts_sec,
        | arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
        | arg_max(value, ts) AS close, count(*)::DOUBLE AS volume
        |FROM events GROUP BY 1""".stripMargin
    val m5Sql =
      s"""SELECT (ts_sec//300)*300 AS ts_sec,
         | arg_min(open, ts_sec) AS open, max(high) AS high, min(low) AS low,
         | arg_max(close, ts_sec) AS close, sum(volume) AS volume
         |FROM ($m1Sql) m1 GROUP BY 1""".stripMargin
    Map(
      "q01_pricing_summary" ->
        """SELECT l_returnflag, l_linestatus,
          | sum(CAST(round(l_quantity,4) AS DECIMAL(28,4)))::DOUBLE AS sum_qty,
          | sum(CAST(round(l_extendedprice,4) AS DECIMAL(28,4)))::DOUBLE AS sum_base_price,
          | sum(CAST(round(l_extendedprice*(1-l_discount),4) AS DECIMAL(28,4)))::DOUBLE AS sum_disc_price,
          | round(sum(CAST(round(l_quantity,4) AS DECIMAL(28,4)))::DOUBLE / count(*), 4) AS avg_qty,
          | count(*) AS n
          |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
      "q02_range_filter" ->
        """SELECT event_id, floor(epoch(ts))::BIGINT AS ts_sec, event_type, value
          |FROM events
          |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
          |ORDER BY event_id""".stripMargin,
      "q03_resample_m5" ->
        s"SELECT * FROM ($m5Sql) m5 ORDER BY ts_sec",
      "q04_asof_mtf" ->
        s"""WITH m1 AS ($m1Sql), m5 AS ($m5Sql)
           |SELECT m1.ts_sec, m1.close, m5.close AS close_m5
           |FROM m1 ASOF LEFT JOIN m5 ON m1.ts_sec >= m5.ts_sec
           |ORDER BY m1.ts_sec""".stripMargin,
      "q05_gap_islands" ->
        """WITH obs AS (SELECT DISTINCT (floor(epoch(ts)/60)*60)::BIGINT AS m FROM events),
          | grid AS (SELECT unnest(generate_series((SELECT min(m) FROM obs),
          |                                        (SELECT max(m) FROM obs), 60)) AS m),
          | miss AS (SELECT m FROM grid WHERE m NOT IN (SELECT m FROM obs)),
          | isl AS (SELECT m, m - 60*row_number() OVER (ORDER BY m) AS island FROM miss)
          |SELECT min(m) AS gap_start_sec, max(m) AS gap_end_sec, count(*) AS n_missing
          |FROM isl GROUP BY island ORDER BY 1""".stripMargin,
      "q06_or_levels" ->
        s"""WITH m1 AS ($m1Sql),
           | sess AS (SELECT *, strftime(to_timestamp(ts_sec), '%Y-%m-%d') AS sd,
           |                 ts_sec % 86400 AS tod FROM m1),
           | ranges AS (SELECT sd, max(CASE WHEN tod < 3600 THEN high END) AS or_high,
           |                   min(CASE WHEN tod < 3600 THEN low END) AS or_low
           |            FROM sess GROUP BY 1 HAVING or_high IS NOT NULL),
           | aft AS (SELECT s.*, r.or_high AS oh, r.or_low AS ol
           |         FROM sess s JOIN ranges r USING (sd) WHERE s.tod >= 3600),
           | ev AS (SELECT sd,
           |          min(CASE WHEN close > oh THEN ts_sec END) AS up_ts,
           |          min(CASE WHEN close < ol THEN ts_sec END) AS dn_ts,
           |          min(CASE WHEN low <= oh THEN ts_sec END) AS rtup_ts,
           |          min(CASE WHEN high >= ol THEN ts_sec END) AS rtdn_ts
           |        FROM aft GROUP BY 1),
           | fin AS (SELECT r.sd, r.or_high, r.or_low,
           |           CASE WHEN e.up_ts IS NOT NULL AND (e.dn_ts IS NULL OR e.up_ts <= e.dn_ts) THEN 'UP'
           |                WHEN e.dn_ts IS NOT NULL THEN 'DOWN' ELSE 'NONE' END AS break_dir,
           |           e.up_ts, e.dn_ts, e.rtup_ts, e.rtdn_ts
           |         FROM ranges r LEFT JOIN ev e USING (sd))
           |SELECT f.sd AS session_date, f.or_high, f.or_low, f.break_dir,
           |  CASE f.break_dir WHEN 'UP' THEN f.up_ts WHEN 'DOWN' THEN f.dn_ts END AS break_ts_sec,
           |  CASE f.break_dir WHEN 'UP' THEN f.rtup_ts WHEN 'DOWN' THEN f.rtdn_ts END AS retest_ts_sec,
           |  m.close AS retest_price
           |FROM fin f LEFT JOIN m1 m
           |  ON m.ts_sec = CASE f.break_dir WHEN 'UP' THEN f.rtup_ts WHEN 'DOWN' THEN f.rtdn_ts END
           |ORDER BY session_date""".stripMargin,
      "q07_dedup_exact" ->
        """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_dups
          |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
      "q10_topk_per_customer" ->
        """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
          |  SELECT o_custkey, o_orderkey, o_totalprice,
          |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |  FROM orders) t
          |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,
      "q11_hour_histogram" ->
        """SELECT g.range AS hour, count(e.event_id) AS n
          |FROM range(0, 24) g LEFT JOIN events e ON floor(epoch(e.ts)/3600)::BIGINT % 24 = g.range
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      "q12_sessionize" ->
        """WITH x AS (SELECT user_id, ts, floor(epoch(ts))::BIGINT AS tsec FROM events),
          | y AS (SELECT user_id, tsec,
          |   CASE WHEN lag(tsec) OVER w IS NULL OR tsec - lag(tsec) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
          |   FROM x WINDOW w AS (PARTITION BY user_id ORDER BY tsec)),
          | z AS (SELECT user_id,
          |   sum(new_s) OVER (PARTITION BY user_id ORDER BY tsec ROWS UNBOUNDED PRECEDING) AS sid
          |   FROM y),
          | g AS (SELECT user_id, sid, count(*) AS n FROM z GROUP BY 1,2)
          |SELECT user_id, count(*) AS n_sessions, max(n) AS max_session_events, sum(n) AS n_events_total
          |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
      "q13_segment_revenue" ->
        """SELECT c_mktsegment,
          | sum(CAST(round(l_extendedprice*(1-l_discount),4) AS DECIMAL(28,4)))::DOUBLE AS revenue,
          | count(*) AS n_items
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          | JOIN customer ON o_custkey = c_custkey
          |GROUP BY 1 ORDER BY 1""".stripMargin,
    )
  }
}
