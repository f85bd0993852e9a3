package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salting utility for hot-key joins/aggregations.
  *
  * At 100 TB a handful of hot keys (one symbol with 100x the volume, one
  * degenerate LSH bucket) can pin a single reducer. Salting splits each hot
  * key into `factor` sub-keys: the skewed (large) side gets a deterministic
  * salt derived from a row hash; the small side is replicated across all
  * salts. AQE's skew-join handling covers sort-merge joins automatically;
  * salting is the explicit fallback for aggregations and non-SMJ plans.
  */
object Skew {

  /** Add a deterministic salt column in [0, factor) to the large side. */
  def saltLarge(df: DataFrame, keyCols: Seq[String], factor: Int,
                saltCol: String = "_salt"): DataFrame =
    df.withColumn(saltCol,
      pmod(xxhash64((keyCols.map(col) :+ monotonically_increasing_id()): _*), lit(factor))
        .cast("int"))

  /** Replicate the small side across every salt value. */
  def replicateSmall(df: DataFrame, factor: Int, saltCol: String = "_salt"): DataFrame =
    df.withColumn(saltCol, explode(sequence(lit(0), lit(factor - 1))))
      .withColumn(saltCol, col(saltCol).cast("int"))

  /** Salted equi-join: join on keyCols + salt, then drop the salt. */
  def saltedJoin(large: DataFrame, small: DataFrame, keyCols: Seq[String],
                 factor: Int, joinType: String = "inner"): DataFrame =
    saltLarge(large, keyCols, factor)
      .join(replicateSmall(small, factor), keyCols :+ "_salt", joinType)
      .drop("_salt")

  /** Two-phase skew-safe aggregation: partial aggregate on (keys, salt),
    * then final aggregate on keys. Caller supplies mergeable partial/final
    * expression pairs (e.g. sum/sum, count/sum).
    */
  def twoPhaseCount(df: DataFrame, keyCols: Seq[String], factor: Int): DataFrame =
    saltLarge(df, keyCols, factor)
      .groupBy((keyCols :+ "_salt").map(col): _*).agg(count(lit(1)).as("_partial"))
      .groupBy(keyCols.map(col): _*).agg(sum(col("_partial")).as("n"))
}
