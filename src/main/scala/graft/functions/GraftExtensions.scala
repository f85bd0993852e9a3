package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registering the engine's native expressions as SQL
  * functions, so `spark.sql("SELECT graft_dot(a, b) ...")` works alongside
  * the Column API.
  *
  * Wire up either way:
  *  - config: `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  *  - builder: `.withExtensions(new GraftExtensions)`
  */
object GraftExtensions {
  /** Register the same functions on an already-running session (the
    * extensions mechanism only applies at session construction).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftColumnBridge.registerTempFunctions(spark)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - codegen dot product of float/double arrays"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_polyhash"),
      info("graft_polyhash", "graft_polyhash(s) - portable polynomial hash mod 1e9+7"),
      (children: Seq[Expression]) => PolyHash(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "graft_shingles(s, n) - distinct word n-gram shingles"),
      (children: Seq[Expression]) => {
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(s"n must be an int literal, got $other")
        }
        WordShingles(children.head, n)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(s, bits) - one-pass SimHash over word hashes"),
      (children: Seq[Expression]) => {
        val bits = children.lift(1).map {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(s"bits must be an int literal, got $other")
        }.getOrElse(graft.ops.Dedup.DefaultSimhashBits)
        SimHash(children.head, bits)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_textstats"),
      info("graft_textstats",
        "graft_textstats(s) - one-pass struct(n_tokens, mean_word_len, punct_ratio, stopword_ratio, lang_*)"),
      (children: Seq[Expression]) => TextStats(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_zorder"),
      info("graft_zorder", "graft_zorder(a, b) - Morton interleave of two [0, 2^31) bigints"),
      (children: Seq[Expression]) => ZOrderBits(children(0), children(1))))
    ext.injectTableFunction((
      FunctionIdentifier("graft_sessionize"),
      info("graft_sessionize",
        "graft_sessionize(events_view, gap_seconds[, user_col]) - per-user inactivity-gap sessions"),
      GraftTvf.sessionize))
    ext.injectTableFunction((
      FunctionIdentifier("graft_asof"),
      info("graft_asof",
        "graft_asof(left_view, right_view[, on_col[, partition_cols_csv]]) - backward as-of join"),
      GraftTvf.asof))
  }
}
