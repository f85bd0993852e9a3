package graft

import graft.ops.Fill
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fill's two-phase chunked scan must be bit-identical to the naive global
  * window fill, including values carried across many empty chunks.
  */
class FillSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 3 "days" of minutes at chunkSeconds=3600 -> 72 chunks; values present
  // only at scattered minutes, including runs of >1 empty chunk
  private lazy val sparse = {
    val rows = (0 until 3 * 1440).map { i =>
      val v: Option[Double] =
        if (i % 97 == 0 && i % 5 != 0) Some(i.toDouble) else None
      val w: Option[Double] = if (i % 211 == 3) Some(-i.toDouble) else None
      (new java.sql.Timestamp(1700000000000L + i * 60000L), v, w)
    }
    rows.toDF("ts", "v", "w").cache()
  }

  test("ffill(chunked) == ffill(global window), multiple columns") {
    val w = Window.orderBy(col("ts")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = sparse
      .withColumn("v", last(col("v"), ignoreNulls = true).over(w))
      .withColumn("w", last(col("w"), ignoreNulls = true).over(w))
      .orderBy("ts").collect()
    val got = Fill.ffill(sparse, Seq("v", "w"), chunkSeconds = 3600L)
      .select("ts", "v", "w").orderBy("ts").collect()
    assert(got.sameElements(want))
  }

  test("bfill(chunked) == bfill(global window)") {
    val w = Window.orderBy(col("ts")).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val want = sparse
      .withColumn("v", first(col("v"), ignoreNulls = true).over(w))
      .select("ts", "v", "w").orderBy("ts").collect()
    val got = Fill.bfill(sparse, Seq("v"), chunkSeconds = 3600L)
      .select("ts", "v", "w").orderBy("ts").collect()
    assert(got.sameElements(want))
  }

  test("NULL key values form a real fill group, like the window form") {
    val keyed = sparse.withColumn("k",
      when(col("ts").cast("long") % 2 === 0, lit("A"))) // half the rows k=NULL
    val w = Window.partitionBy(col("k")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = keyed.withColumn("v", last(col("v"), ignoreNulls = true).over(w))
      .select("k", "ts", "v").orderBy("k", "ts").collect()
    val got = Fill.ffill(keyed, Seq("v"), keys = Seq("k"), chunkSeconds = 3600L)
      .select("k", "ts", "v").orderBy("k", "ts").collect()
    assert(got.sameElements(want))
  }

  test("keyed fill stays within key groups") {
    val twoKeys = sparse.withColumn("k", lit("A"))
      .unionByName(sparse.withColumn("v", col("v") * 100).withColumn("k", lit("B")))
    val w = Window.partitionBy(col("k")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = twoKeys.withColumn("v", last(col("v"), ignoreNulls = true).over(w))
      .select("k", "ts", "v").orderBy("k", "ts").collect()
    val got = Fill.ffill(twoKeys, Seq("v"), keys = Seq("k"), chunkSeconds = 3600L)
      .select("k", "ts", "v").orderBy("k", "ts").collect()
    assert(got.sameElements(want))
  }
}
