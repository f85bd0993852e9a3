package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming KMV distinct-count — the streaming twin of the batch
  * `Sketches.kmvDistinct` (q63).
  *
  * Exact streaming `count(DISTINCT value)` per group needs O(distinct)
  * state, which is unbounded on an infinite stream. The KMV sketch merges
  * LOSSLESSLY under union — the k smallest hashes of a union are contained
  * in the union of each side's k smallest — so per-group state is a fixed
  * k longs no matter how long the stream runs, and the streaming estimate
  * after processing a bounded input is BIT-IDENTICAL to the batch
  * operator's (asserted by the parity spec): same portable hash, same
  * integer-exact estimator.
  *
  * Shape: `mapGroupsWithState` in Update mode — every micro-batch emits
  * each touched group's current (n_seen, kth, est_distinct) row, so the
  * sink always holds the latest estimate per group (the monitoring use
  * case: "distinct users per event type, live"). State never times out:
  * it is O(groups × k) forever, which is the sketch's contract; callers
  * tracking windowed cardinality should bucket the group key by window
  * start instead, letting each window's sketch age out of the sink.
  */
object SketchStream {

  val P: Long = graft.ops.Sketches.P

  case class Keyed(group: String, hv: Long)

  /** Sorted ascending, at most k entries. */
  case class KmvState(hashes: Array[Long])

  case class KmvEstimate(group: String, n_seen: Long, kth: Long,
                         est_distinct: Long)

  /** events(groupCol, valueCol: long) -> per-micro-batch updated KMV
    * estimates. Same hash and estimator as the batch op.
    */
  def kmvDistinct(events: DataFrame, groupCol: String, valueCol: String,
                  k: Int): Dataset[KmvEstimate] = {
    require(k >= 2, "KMV needs k >= 2")
    import events.sparkSession.implicits._
    events
      .selectExpr(s"CAST($groupCol AS STRING) AS group",
        s"(pmod(CAST($valueCol AS LONG), ${P}L) * 2654435761L + 11L) % ${P}L AS hv")
      .as[Keyed]
      .groupByKey(_.group)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(stateFn(k))
  }

  private def stateFn(k: Int)(
      group: String, rows: Iterator[Keyed],
      state: GroupState[KmvState]): KmvEstimate = {
    val prev = state.getOption.map(_.hashes).getOrElse(Array.empty[Long])
    // merge = distinct union, keep the k smallest (lossless for KMV)
    val merged = (prev ++ rows.map(_.hv)).distinct
    java.util.Arrays.sort(merged)
    val kept = merged.take(k)
    state.update(KmvState(kept))
    val nSeen = kept.length.toLong
    val est =
      if (nSeen < k) nSeen
      else (k - 1).toLong * P / kept.last // exact integer DIV, same as batch
    KmvEstimate(group, nSeen, kept.last, est)
  }

  /** Run the stream to completion over a bounded input and return the final
    * estimate per group — the batch-parity surface used by the spec.
    */
  def kmvFinal(events: DataFrame, groupCol: String, valueCol: String,
               k: Int, queryName: String): DataFrame = {
    val spark = events.sparkSession
    val q = kmvDistinct(events, groupCol, valueCol, k)
      .writeStream.outputMode("update").format("memory").queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()
    // Update mode appends a row per (micro-batch, group). The final state
    // per group is identified by the VALUES, not sink order: n_seen only
    // grows as the stream progresses, and at equal n_seen the kth hash
    // only shrinks (smaller hashes displace larger ones).
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("group"))
      .orderBy(col("n_seen").desc, col("kth").asc)
    spark.table(queryName)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }
}
