package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // naive reference: the O(n*m) predicate join the chunked plan must equal
  private def naivePoints(pts: DataFrame, iv: DataFrame): Set[(Long, Long)] =
    pts.join(iv, col("p") >= col("s") && col("p") < col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def chunkedPoints(pts: DataFrame, iv: DataFrame, w: Long,
                            keys: Seq[String] = Nil): Set[(Long, Long)] =
    RangeJoin.pointInInterval(pts, "p", iv, "s", "e", w, keys)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("pointInInterval equals the naive range join, boundaries half-open") {
    val pts = Seq((1L, 0L), (2L, 99L), (3L, 100L), (4L, 199L), (5L, 200L),
      (6L, 250L), (7L, 999L)).toDF("pid", "p")
    // [100,200) hits exactly p=100,199; [0,1) hits p=0; [240,260) hits 250;
    // empty [300,300) hits nothing
    val iv = Seq((10L, 100L, 200L), (11L, 0L, 1L), (12L, 240L, 260L),
      (13L, 300L, 300L)).toDF("iid", "s", "e")
    val expected = naivePoints(pts, iv)
    assert(expected === Set((3L, 10L), (4L, 10L), (1L, 11L), (6L, 12L)))
    // chunk width smaller, equal, larger than intervals — same answer
    for (w <- Seq(7L, 100L, 1000L))
      assert(chunkedPoints(pts, iv, w) === expected, s"width $w")
  }

  test("pointInInterval emits each match once even when intervals span many chunks") {
    val pts = (0L until 50L).map(i => (i, i * 10L)).toDF("pid", "p")
    val iv = Seq((1L, 5L, 455L), (2L, 100L, 110L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(pts, "p", iv, "s", "e", 25L)
      .groupBy("pid", "iid").count()
    assert(got.where(col("count") > 1).count() === 0L, "duplicate emissions")
    assert(chunkedPoints(pts, iv, 25L) === naivePoints(pts, iv))
  }

  test("pointInInterval honors extra equi-keys") {
    val pts = Seq(("a", 1L, 50L), ("b", 2L, 50L)).toDF("k", "pid", "p")
    val iv = Seq(("a", 10L, 0L, 100L), ("b", 11L, 60L, 100L)).toDF("k", "iid", "s", "e")
    val got = RangeJoin.pointInInterval(pts, "p", iv, "s", "e", 10L, keys = Seq("k"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // point b@50 is inside interval 10's range but key-mismatched
    assert(got === Set((1L, 10L)))
  }

  test("intervalOverlap equals the naive overlap join, no duplicates") {
    val a = Seq((1L, 0L, 100L), (2L, 150L, 250L), (3L, 400L, 410L))
      .toDF("aid", "as", "ae")
    val b = Seq((10L, 50L, 160L), (11L, 240L, 500L), (12L, 100L, 150L))
      .toDF("bid", "bs", "be")
    val naive = a.join(b, col("as") < col("be") && col("bs") < col("ae"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // touching-at-endpoint pairs excluded by half-open semantics:
    // a1[0,100) vs b12[100,150) and a2[150,250) vs b12[100,150) do NOT overlap
    assert(naive === Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L)))
    for (w <- Seq(9L, 64L, 1000L)) {
      val rows = RangeJoin.intervalOverlap(a, "as", "ae", b, "bs", "be", w)
        .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.length === rows.toSet.size, s"width $w: duplicate pairs")
      assert(rows.toSet === naive, s"width $w")
    }
  }
}
