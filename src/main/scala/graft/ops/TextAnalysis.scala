package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over a `documents`
  * table (doc_id, text, lang, source, n_chars).
  *
  * All functions are pure `org.apache.spark.sql.functions` compositions —
  * no UDFs — so they stay inside whole-stage codegen and scale as flat
  * per-row scalar work (the ideal 100 TB shape: no shuffle at all until an
  * aggregation is requested).
  */
object TextAnalysis {

  /** Whitespace tokenization of trimmed, lowercased text. */
  def words(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** One-pass native per-document statistics struct (n_tokens,
    * mean_word_len, punct_ratio, stopword_ratio, lang_* marker hits) — the
    * compiled kernel behind every function below. The HOF `*Hof` forms are
    * kept as executable specs (interpreted CodegenFallback lambdas, one
    * array scan per statistic) and pinned equal by TextOpsSpec.
    */
  def stats(text: Column): Column = graft.functions.TextFunctions.textStats(text)

  /** Token count (whitespace tokenizer). */
  def tokenCount(text: Column): Column = stats(text).getField("n_tokens")

  /** HOF spec form of [[tokenCount]]. */
  def tokenCountHof(text: Column): Column = size(words(text))

  /** A BPE-ish subword proxy: count of word-boundary + non-alnum splits,
    * approximating tokenizer token counts without a vocab (deterministic,
    * engine-portable).
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"), w => length(trim(w)) > 0))

  /** Punctuation-character ratio. */
  def punctRatio(text: Column): Column = stats(text).getField("punct_ratio")

  /** HOF spec form of [[punctRatio]]. */
  def punctRatioHof(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^.!?,;:]", "")).cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Ratio of stopword tokens (tiny fixed English list — heuristic quality
    * signal, same spirit as length/punct/stopword scoring in web-scale
    * pipelines).
    */
  val stopwords: Seq[String] = graft.functions.TextKernels.stopwords.toSeq.sorted

  def stopwordRatio(text: Column): Column = stats(text).getField("stopword_ratio")

  /** HOF spec form of [[stopwordRatio]]. */
  def stopwordRatioHof(text: Column): Column = {
    val ws = words(text)
    when(size(ws) > 0,
      size(filter(ws, w => w.isInCollection(stopwords))).cast("double") / size(ws))
      .otherwise(lit(0.0))
  }

  def meanWordLen(text: Column): Column = stats(text).getField("mean_word_len")

  /** HOF spec form of [[meanWordLen]]. */
  def meanWordLenHof(text: Column): Column = {
    val ws = words(text)
    when(size(ws) > 0,
      aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(ws))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: long enough, words not degenerate,
    * not punctuation-soup. Thresholds are heuristic; the value is the
    * deterministic, portable arithmetic.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(200.0), lit(1.0))
    val wordScore = when(meanWordLen(text).between(2.0, 12.0), lit(1.0)).otherwise(lit(0.5))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    round((lenScore + wordScore + punctScore) / 3.0, 4)
  }

  /** Marker-word language-ID heuristic: count hits against per-language
    * marker lists, pick the argmax with a fixed precedence order
    * (en > es > de > fr > zh > unknown) so ties are deterministic.
    */
  val langMarkers: Seq[(String, Seq[String])] =
    graft.functions.TextKernels.langMarkers.map { case (l, m) => l -> m.toSeq.sorted }

  def langScores(text: Column): Seq[(String, Column)] =
    langMarkers.map { case (lang, _) => lang -> stats(text).getField(s"lang_$lang") }

  /** HOF spec form of [[langScores]]. */
  def langScoresHof(text: Column): Seq[(String, Column)] = {
    val ws = words(text)
    langMarkers.map { case (lang, markers) =>
      lang -> size(filter(ws, w => w.isInCollection(markers)))
    }
  }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = greatest(scores.map(_._2): _*)
    // first language (in precedence order) reaching the max, if max > 0
    scores.foldLeft(when(best <= 0, lit("unknown"))) { case (acc, (lang, s)) =>
      acc.when(s === best, lit(lang))
    }.otherwise(lit("unknown"))
  }

  /** Order-sensitive polynomial rolling hash of the text's characters:
    * h = (h*31 + codepoint(c)) mod 1e9+7. Portable: the same arithmetic is
    * expressible in any engine (the DuckDB oracle uses list_reduce), unlike
    * xxhash64/md5-of-engine internals. Used as the document fingerprint.
    */
  def fingerprint(text: Column): Column = graft.functions.TextFunctions.polyHash(text)

  /** HOF reference form of [[fingerprint]] (kept for kernel equivalence tests). */
  def fingerprintHof(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (h, c) => (h * 31L + c) % 1000000007L)

  /** Convenience: full per-document profile. */
  def profile(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_tokens", tokenCount(t).cast("long"))
      .withColumn("mean_word_len", round(meanWordLen(t), 4))
      .withColumn("punct_ratio", round(punctRatio(t), 4))
      .withColumn("stopword_ratio", round(stopwordRatio(t), 4))
      .withColumn("quality_score", qualityScore(t))
      .withColumn("lang_guess", langId(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
