package graft.ops

import graft.functions.ZOrderBits
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional file-layout clustering (the lakehouse OPTIMIZE
  * ZORDER): rewrite a table so rows close in SEVERAL columns land in the
  * same files.
  *
  * Why it matters at 100 TB: parquet scans prune on per-file / per-row-group
  * min/max statistics. A table sorted by (a, b) prunes perfectly on `a` but
  * not at all on `b` — every file's b-range spans the whole domain. Sorting
  * by the Morton interleave of (a, b) bounds EACH file in a small rectangle
  * of (a, b) space, so a predicate on either column (or a box on both)
  * skips most files without any index structure. This composes with the
  * engine's pushdown discipline: the same `PushedFilters` that reach the
  * scan now actually eliminate I/O.
  *
  * Normalization: Z-order needs both inputs in [0, 2^31). `normalize`
  * range-scales a numeric column given its (min, max) bounds — callers pass
  * bounds they know (partition ranges, schema domains) or take them from
  * one tiny min/max aggregate, which is O(data) map-side work and one
  * 1-row result, never a shuffle of the data itself.
  */
object Layout {

  /** Range-normalize `c` from [lo, hi] to [0, 2^bits): a pure per-row
    * expression. Values outside the bounds clamp to the edges (stats stay
    * correct — clamping only affects placement, never query results).
    */
  def normalize(c: Column, lo: Double, hi: Double, bits: Int = 31): Column = {
    require(bits > 0 && bits <= 31, "bits must be in 1..31")
    require(hi > lo, "hi must exceed lo")
    val cells = (1L << bits) - 1
    val scaled = (c.cast("double") - lo) / (hi - lo) * cells
    least(lit(cells), greatest(lit(0L), round(scaled, 0).cast("long")))
  }

  /** The Z-address of two normalized [0, 2^31) coordinates. */
  def zorder(a: Column, b: Column): Column = ZOrderBits.zorder(a, b)

  /** Cluster `df` for writing: range-repartition then sort within
    * partitions by the Z-address of (colA, colB), each normalized by its
    * given bounds. Downstream `.write.parquet` then produces one file per
    * partition whose (colA, colB) bounding box is small — the property the
    * scan pruner exploits. Bounds are caller-supplied so the plan stays a
    * single pass; get them from `df.agg(min, max)` when unknown.
    */
  def zorderedBy(df: DataFrame, colA: String, aLo: Double, aHi: Double,
                 colB: String, bLo: Double, bHi: Double,
                 partitions: Int): DataFrame = {
    val z = zorder(normalize(col(colA), aLo, aHi), normalize(col(colB), bLo, bHi))
    df.withColumn("_z", z)
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
