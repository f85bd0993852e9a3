package graft.ops

import org.apache.spark.sql.DataFrame

/** Spread an under-parallel scan across the session's cores (optimization
  * guide §2.5 "input skew: one huge unsplittable file — repartition
  * immediately after the read"). Parquet row groups are the split floor:
  * a table laid out in fewer row groups/files than the session has cores
  * scans as that many tasks, and any expensive work FUSED above the scan
  * (tokenize+explode pipelines, per-row decimal rounding, SimHash
  * signatures) serializes behind it regardless of core count.
  *
  * Gated on the ACTUAL scan parallelism: when the scan already yields at
  * least half the session's cores — any healthy multi-row-group layout,
  * i.e. every at-scale input — this is the identity and adds no exchange.
  * Callers pass the NARROW projection so the exchange moves only the
  * columns the downstream pipeline needs (§2.3). Keyless round-robin
  * repartition: deterministic under Spark's sort-before-repartition
  * default; callers must only hang order-insensitive work below it
  * (aggregates, per-row signatures — never first/last picks).
  *
  * Sharing note: two consumers of the SAME spread frame plan identical
  * Exchange subtrees, which AQE's exchange reuse dedupes at runtime — the
  * scan+projection then executes once for both (bm25's two tokenize
  * passes read one shuffle output).
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions * 2 >= cores) df
    else df.repartition(cores)
  }
}
