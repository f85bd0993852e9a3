package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}

/** Shared run-to-completion drain behind every streaming face's
  * batch-parity surface (the `*Final` helpers): start the stream into a
  * named in-memory sink, process every available micro-batch, stop, and
  * hand back the sink table. The `*Final` helpers compose this with their
  * own final-state reducer (last-row-per-group window, max-count row,
  * distinct, …), so the drain semantics — await/stop ordering, sink
  * naming — live in ONE place instead of being copy-pasted per face
  * (round-13 review: eight verbatim copies across four files meant any
  * drain fix needed eight edits).
  */
private[streaming] object StreamRun {

  /** Drain `ds` to completion into an in-memory sink named `queryName`
    * and return the sink's contents. Bounded inputs only — this blocks
    * until every available micro-batch is processed.
    */
  def toCompletion(ds: Dataset[_], outputMode: String,
                   queryName: String): DataFrame = {
    val q = ds.writeStream.outputMode(outputMode).format("memory")
      .queryName(queryName).start()
    try q.processAllAvailable() finally q.stop()
    ds.sparkSession.table(queryName)
  }
}
