package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** State-store SIZE audits for the stateful streaming faces: every face
  * argues a state bound in its scaladoc (buckets ≤ keyspace, SCD2 ≤ keys,
  * sketches ≤ groups, sessions ≤ active users); these tests read the
  * actual state store back through Spark's state data source
  * (`format("statestore")` over the checkpoint) after a replay and pin the
  * row count against the documented bound — the difference between "the
  * comment says bounded" and "the store is bounded".
  */
class StateBoundSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Rows in operator-0 state at the checkpoint's latest committed batch. */
  private def stateRows(ckpt: String): Long =
    spark.read.format("statestore").load(ckpt).count()

  test("DedupStream.simhashBuckets state ≤ fixed keyspace (1024 at 32 bits) and == touched buckets") {
    assume(new java.io.File(sf).isDirectory)
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val docs = docsDf.as[(Long, String)].collect().toSeq
    val in = MemoryStream[(Long, String)]
    docs.grouped(math.max(1, docs.size / 3 + 1)).foreach(c => in.addData(c: _*))
    val dir = java.nio.file.Files.createTempDirectory("dedup_state").toString
    val q = graft.streaming.DedupStream
      .simhashBuckets(in.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.outputMode("update").format("memory")
      .queryName("state_buckets")
      .option("checkpointLocation", s"$dir/_ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    val rows = stateRows(s"$dir/_ckpt")
    assert(rows <= 1024L, s"bucket state $rows exceeds the 4x256 keyspace")
    // exact: one state row per TOUCHED bucket = the batch registry's rows
    val touched = graft.ops.Dedup
      .simhashBucketRegistry(docsDf, "doc_id", "text").count()
    assert(rows === touched)
  }

  test("Scd2Stream state == distinct keys (one open version per key, forever)") {
    assume(new java.io.File(sf).isDirectory)
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // synthetic change stream: 40 keys, 300 changes across 3 micro-batches
    val rnd = new scala.util.Random(7)
    val changes = (1 to 300).map { i =>
      (rnd.nextInt(40).toLong, i.toLong, s"v${rnd.nextInt(5)}",
        new Timestamp(1700000000000L + i * 60000L))
    }
    val in = MemoryStream[(Long, Long, String, Timestamp)]
    changes.grouped(100).foreach(c => in.addData(c: _*))
    val dir = java.nio.file.Files.createTempDirectory("scd2_state").toString
    val q = graft.streaming.Scd2Stream
      .history(in.toDF().toDF("key", "id", "attr", "ts"))
      .writeStream.outputMode("append").format("memory")
      .queryName("state_scd2")
      .option("checkpointLocation", s"$dir/_ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    val keys = changes.map(_._1).distinct.size.toLong
    assert(stateRows(s"$dir/_ckpt") === keys)
  }

  test("SketchStream.sampleQuantiles state == groups, each state value capped at k samples") {
    assume(new java.io.File(sf).isDirectory)
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ev = (1 to 2000).map { i =>
      (s"g${i % 5}", i.toLong, (i * 37 % 1000).toDouble)
    }
    val in = MemoryStream[(String, Long, Double)]
    ev.grouped(700).foreach(c => in.addData(c: _*))
    val dir = java.nio.file.Files.createTempDirectory("sq_state").toString
    val q = graft.streaming.SketchStream
      .sampleQuantiles(in.toDF().toDF("event_type", "event_id", "value"),
        "event_type", "event_id", "value", k = 64)
      .writeStream.outputMode("update").format("memory")
      .queryName("state_sq")
      .option("checkpointLocation", s"$dir/_ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    val st = spark.read.format("statestore").load(s"$dir/_ckpt")
    assert(st.count() === 5L, "one state row per group")
    // the value payload is the bottom-k sample: arrays capped at k even
    // though each group saw 400 rows
    val sizes = st.select(size(col("value.groupState.hv")).as("n")).as[Int].collect()
    assert(sizes.forall(n => n > 0 && n <= 64), s"sample arrays exceed k: ${sizes.toSeq}")
  }

  test("SessionStream state ≤ active users and SHRINKS when event-time timeouts fire") {
    assume(new java.io.File(sf).isDirectory)
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ev = (1 to 400).map { i =>
      (i % 50L, new Timestamp(1700000000000L + i * 1000L))
    }
    val maxTs = ev.map(_._2.getTime).max
    val in = MemoryStream[(Long, Timestamp)]
    in.addData(ev: _*)
    val dir = java.nio.file.Files.createTempDirectory("sess_state").toString
    val q = graft.streaming.SessionStream
      .sessions(in.toDF().toDF("user_id", "ts"), gapSeconds = 1800L,
        watermark = "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("state_sess")
      .option("checkpointLocation", s"$dir/_ckpt")
      .start()
    try {
      q.processAllAvailable()
      val open = stateRows(s"$dir/_ckpt")
      assert(open <= 50L, s"open-session state $open exceeds active users")
      assert(open === 50L, "all 50 users have an open session mid-stream")
      // sentinel advances the watermark past every last+gap, next batch
      // fires the timeouts: the 50 user sessions must LEAVE the store
      in.addData((-1L, new Timestamp(maxTs + 3 * 1800 * 1000L)))
      q.processAllAvailable()
      in.addData((-1L, new Timestamp(maxTs + 6 * 1800 * 1000L)))
      q.processAllAvailable()
      val after = stateRows(s"$dir/_ckpt")
      assert(after <= 1L, s"timed-out sessions still in the store: $after")
    } finally q.stop()
  }
}
