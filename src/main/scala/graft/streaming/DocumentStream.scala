package graft.streaming

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the training-data pipeline ops: a live document feed
  * -> watermarked exact dedup -> quality/language annotation -> near-dup
  * signature, ready to land for downstream batch LSH.
  *
  * Scale design:
  *  - exact dedup uses `dropDuplicatesWithinWatermark` on the content hash:
  *    dedup state is bounded by the watermark horizon instead of growing
  *    forever (a plain streaming dropDuplicates keys state on every hash
  *    ever seen — fatal at sustained ingest);
  *  - annotation (quality, language, token stats) is pure column expression
  *    work — stateless, shuffle-free, whole-stage codegen;
  *  - the 32-bit SimHash signature (Dedup.simhash's default) is computed
  *    inline by the native [[graft.functions.SimHash]] kernel, so batch
  *    near-dup candidate generation can run directly over the landed
  *    signature column via [[graft.ops.Dedup.simhashCandidatesFromSignatures]]
  *    — no text re-read, no re-signing.
  *
  * Cross-watermark duplicates are the batch layer's job (exact dedup q07 /
  * LSH candidates over the landed table) — same split as the candle lake's
  * "streaming appends, idempotent batch repair" model.
  */
object DocumentStream {

  /** docs(ts, doc_id, text) -> deduped, annotated, quality-filtered stream.
    * Event-time column `ts` drives the watermark.
    */
  def cleaned(docs: DataFrame, watermark: String = "10 minutes",
              minQuality: Double = 0.3): DataFrame = {
    docs
      .withWatermark("ts", watermark)
      .withColumn("text_hash", md5(col("text")))
      .dropDuplicatesWithinWatermark("text_hash")
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")).cast("long"))
      .withColumn("quality_score", TextAnalysis.qualityScore(col("text")))
      .withColumn("lang_guess", TextAnalysis.langId(col("text")))
      .withColumn("simhash", Dedup.simhash(col("text")))
      .where(col("quality_score") >= minQuality)
  }
}
