package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming face of the SimHash near-dup blocking stack — the live twin
  * of `Dedup.simhashBucketRegistry` (and the candidate-generation seam of
  * the oracled q27 pipeline): documents arrive continuously, each is
  * signed inline by the native SimHash kernel (stateless expression work,
  * exactly the batch signature), exploded into its 4 8-bit blocking
  * buckets, and folded into a standing bucket→(anchor, population)
  * registry via `mapGroupsWithState`.
  *
  * Why this state is safe FOREVER: the bucket keyspace is fixed (4 chunks
  * × 256 byte values = at most 1024 groups) and each group's state is two
  * longs — min doc id and count — no matter how many documents stream
  * through. That is the whole point of registering ANCHORS rather than
  * members: a new document's candidate set is "the anchors of my 4
  * buckets" (then verify by true hamming against the anchor), so the
  * unbounded member lists live in the landed table for the batch layer,
  * never in stream state. Same split as the candle lake: streaming keeps a
  * bounded live view, idempotent batch repair owns history.
  *
  * Both folds are order-insensitive (min and count are commutative
  * monoids), so the final registry over a bounded input is BIT-IDENTICAL
  * to the batch operator's — asserted by the parity spec against the
  * oracled q132 registry.
  */
object DedupStream {

  case class BucketRow(bucket: Long, doc_id: Long)

  case class BucketState(anchorId: Long, n: Long)

  case class BucketEntry(chunk: Long, v: Long, anchor_id: Long, n_docs: Long)

  /** docs(idCol: long, textCol: string) -> per-micro-batch updated bucket
    * registry rows (chunk, v, anchor_id, n_docs). Update mode: the sink's
    * latest row per bucket is the current registry entry.
    */
  def simhashBuckets(docs: DataFrame, idCol: String,
                     textCol: String): Dataset[BucketEntry] = {
    import docs.sparkSession.implicits._
    val chunks = 4
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        graft.ops.Dedup.simhash(col(textCol)).as("_sig"))
      .select(explode(array((0 until chunks).map(c =>
        lit(c.toLong * 256L) + shiftright(col("_sig"), c * 8).bitwiseAND(0xFFL)): _*))
        .as("bucket"), col("doc_id"))
      .as[BucketRow]
      .groupByKey(_.bucket)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(stateFn)
  }

  private def stateFn(bucket: Long, rows: Iterator[BucketRow],
                      state: org.apache.spark.sql.streaming.GroupState[BucketState]): BucketEntry = {
    var anchor = state.getOption.map(_.anchorId).getOrElse(Long.MaxValue)
    var n = state.getOption.map(_.n).getOrElse(0L)
    rows.foreach { r =>
      if (r.doc_id < anchor) anchor = r.doc_id
      n += 1L
    }
    state.update(BucketState(anchor, n))
    BucketEntry(bucket / 256L, bucket % 256L, anchor, n)
  }

  /** Run the stream to completion over a bounded input and return the
    * final registry — the batch-parity surface used by the spec. A
    * bucket's count strictly grows across its update emissions, so the
    * final entry per bucket is simply the max-count row.
    */
  def bucketsFinal(docs: DataFrame, idCol: String, textCol: String,
                   queryName: String): DataFrame = {
    val spark = docs.sparkSession
    val q = simhashBuckets(docs, idCol, textCol)
      .writeStream.outputMode("update").format("memory").queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("chunk"), col("v"))
      .orderBy(col("n_docs").desc)
    spark.table(queryName)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }
}
