package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream temporal enrichment — the streaming twin of
  * [[graft.ops.RangeJoin.pointInInterval]].
  *
  * Batch range joins see both sides whole; a stream sees each side as it
  * arrives and must bound how much of the other side it retains. Structured
  * Streaming does that from the JOIN CONDITION itself: with a watermark on
  * both event-time columns and a two-sided time-range predicate, the state
  * store keeps only opener rows whose window can still match a future point
  * (point watermark < open + window) and only point rows that can still
  * match a late opener — O(arrival rate x window), never O(stream).
  *
  * The same condition-shape rules from the batch operator apply: the range
  * predicate must bound BOTH directions (`pt >= open` and `pt < open +
  * window`), otherwise Spark cannot derive a state eviction bound for one
  * side and state grows without limit — the streaming equivalent of the
  * batch cross product.
  */
object EnrichStream {

  /** Pair every point row with every opener row of the same `keys` whose
    * half-open window [openTs, openTs + windowSeconds) contains the point's
    * `ptsTs`. Both inputs must be streaming DataFrames with TIMESTAMP
    * event-time columns; `delay` is the watermark (late-data allowance) for
    * both. Output carries the columns of both sides (keys once).
    */
  def pointsInWindows(points: DataFrame, ptsTs: String,
                      opens: DataFrame, openTs: String,
                      windowSeconds: Long, keys: Seq[String],
                      delay: String = "1 minute"): DataFrame = {
    require(windowSeconds > 0, "windowSeconds must be positive")
    require(ptsTs != openTs,
      "rename one of the event-time columns: both sides in one output")
    val p = points.withWatermark(ptsTs, delay)
    val o = opens.withWatermark(openTs, delay)
    val cond = (keys.map(k => p(k) === o(k)) :+
      (p(ptsTs) >= o(openTs)) :+
      (p(ptsTs) < o(openTs) + expr(s"INTERVAL $windowSeconds SECONDS")))
      .reduce(_ && _)
    keys.foldLeft(p.join(o, cond, "inner")) { (d, k) => d.drop(o(k)) }
  }
}
