package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Dev-only measurement (PLANS.md round 15): the stateful streaming faces'
  * throughput and STATE growth under input scaled 1×/4×/10× — the decade
  * ladder the batch suite already has, applied to the streaming twins. The
  * contract being measured: state is bounded by the KEY domain (groups /
  * active users / SCD2 keys / the dedup keyspace), never by input volume,
  * so a 10× larger day costs ~10× wall (same per-row work) at FLAT state —
  * which is what lets a 100 TB/day deployment checkpoint in O(keys).
  *
  * Per face and scale: wall to drain `batches` micro-batches, rows/s,
  * final state rows (Spark's `statestore` reader over the checkpoint), and
  * checkpoint bytes on disk. Keys are held FIXED across scales for the
  * flat-state claim; kmv additionally runs a keys-scaled ladder to show
  * state growth tracks the KEY domain (the one thing that should grow it).
  *
  * Usage: runMain graft.StreamScaleProbe [baseRows] [batches]
  */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val baseRows = args.lift(0).map(_.toInt).getOrElse(100000)
    val batches = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.streaming.StateStores.Recommended.foreach { case (k, v) =>
      spark.conf.set(k, v)
    }
    spark.sparkContext.setLogLevel("WARN")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    def dirBytes(p: String): Long = {
      val root = new java.io.File(p)
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(root)
    }

    def stateRows(ckpt: String): Long =
      try spark.read.format("statestore").load(s"$ckpt/_ckpt").count()
      catch { case scala.util.control.NonFatal(_) => -1L }

    /** Drain `batches` micro-batches through `startQuery`, feeding
      * `feed(batchIdx)` before each; returns wall seconds.
      */
    def run(tag: String, scale: Int, rows: Long,
            start: String => org.apache.spark.sql.streaming.StreamingQuery,
            feed: Int => Unit): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft_ssp_$tag").toString
      val q = start(ckpt)
      val t0 = System.nanoTime()
      (0 until batches).foreach { b => feed(b); q.processAllAvailable() }
      val wall = (System.nanoTime() - t0) / 1e9
      q.stop()
      println(f"[stream-scale] $tag%-16s scale=${scale}%2dx rows=$rows%9d " +
        f"wall=$wall%6.2fs thru=${rows / wall / 1000}%7.1fk rows/s " +
        f"state_rows=${stateRows(ckpt)}%7d ckpt_kb=${dirBytes(ckpt) / 1024}%7d")
    }

    val sink = (df: org.apache.spark.sql.DataFrame, ckpt: String) =>
      df.writeStream.outputMode("update")
        .option("checkpointLocation", s"$ckpt/_ckpt")
        .format("noop").start()
    val sinkAppend = (df: org.apache.spark.sql.DataFrame, ckpt: String) =>
      df.writeStream.outputMode("append")
        .option("checkpointLocation", s"$ckpt/_ckpt")
        .format("noop").start()

    for (scale <- Seq(1, 4, 10)) {
      val rowsPerBatch = baseRows * scale / batches
      val total = rowsPerBatch.toLong * batches

      // 1) KMV distinct (mapGroupsWithState), KEYS FIXED at 5000: state
      //    must stay ~5000 rows while input scales 10x
      locally {
        val in = MemoryStream[(String, Long)]
        run("kmv_fixed_keys", scale, total,
          ckpt => sink(graft.streaming.SketchStream
            .kmvDistinct(in.toDF().toDF("g", "v"), "g", "v", k = 64).toDF(), ckpt),
          b => in.addData((0 until rowsPerBatch).map(i =>
            (s"g${(b * rowsPerBatch + i) % 5000}", (b * rowsPerBatch + i).toLong * 2654435761L))))
      }

      // 2) KMV, KEYS SCALED with input: state rows must track the key
      //    domain (the one legitimate growth axis)
      locally {
        val in = MemoryStream[(String, Long)]
        val keys = 5000 * scale
        run("kmv_scaled_keys", scale, total,
          ckpt => sink(graft.streaming.SketchStream
            .kmvDistinct(in.toDF().toDF("g", "v"), "g", "v", k = 64).toDF(), ckpt),
          b => in.addData((0 until rowsPerBatch).map(i =>
            (s"g${(b * rowsPerBatch + i) % keys}", (b * rowsPerBatch + i).toLong * 2654435761L))))
      }

      // 3) Sessionization (flatMapGroupsWithState, event-time timeout),
      //    USERS FIXED at 2000, event time advancing so watermarks close
      //    sessions: state <= active users regardless of volume
      locally {
        val in = MemoryStream[(Long, Timestamp)]
        run("sessions", scale, total,
          ckpt => sinkAppend(graft.streaming.SessionStream
            .sessions(in.toDF().toDF("user_id", "ts")).toDF(), ckpt),
          b => in.addData((0 until rowsPerBatch).map { i =>
            val n = b * rowsPerBatch + i
            (n % 2000L, new Timestamp(1700000000000L + n.toLong * 20L))
          }))
      }

      // 4) SCD2 history (flatMapGroupsWithState, no timeout), KEYS FIXED
      //    at 2000: one OpenVersion per key forever
      locally {
        val in = MemoryStream[(Long, Long, String, Long)]
        run("scd2_history", scale, total,
          ckpt => sinkAppend(graft.streaming.Scd2Stream
            .history(in.toDF().toDF("key", "id", "attr", "ts")).toDF(), ckpt),
          b => in.addData((0 until rowsPerBatch).map { i =>
            val n = b * rowsPerBatch + i
            (n % 2000L, n.toLong, s"attr${n % 7}", 1700000000L + n.toLong)
          }))
      }
    }
    spark.stop()
  }
}
