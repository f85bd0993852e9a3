package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Dev-only measurement (r16, VERDICT item 5): CHECKPOINT-SIZE steady state
  * of a changelog-checkpointed RocksDB face whose every batch touches every
  * key — the worst changelog shape (kmv over a fixed key domain, the r15
  * StreamScaleProbe face whose checkpoint grew 1.3→8 MB over 10 batches at
  * FLAT state).
  *
  * What the r15 growth actually was: each commit writes an O(touched-keys)
  * changelog, and versions accumulate until `minBatchesToRetain` (default
  * 100) of them exist AND the background maintenance thread (default
  * interval 60 s) deletes the excess — a 10-batch probe never reaches
  * either, so bytes grow monotonically by construction, not by leak. This
  * probe runs PAST retention with a fast maintenance interval and sweeps
  * the two knobs that bound the steady state:
  *
  *   - `spark.sql.streaming.minBatchesToRetain` — how many recoverable
  *     versions the checkpoint keeps (bytes ≈ retain × changelog + kept
  *     snapshots; also the restart-window trade);
  *   - `spark.sql.streaming.stateStore.minDeltasForSnapshot` — how many
  *     changelogs may pile up before a full snapshot upload (recovery
  *     replays at most this many changelogs; snapshots cost upload bytes).
  *
  * Usage: runMain graft.RetentionProbe [rowsPerBatch] [batches]
  * Output: one line per config with ckpt KB at quarter points, final, max,
  * and wall — the PLANS.md table; the pinned default lands in
  * [[graft.streaming.StateStores]].
  */
object RetentionProbe {
  def main(args: Array[String]): Unit = {
    val rowsPerBatch = args.lift(0).map(_.toInt).getOrElse(5000)
    val batches = args.lift(1).map(_.toInt).getOrElse(60)
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
    // fast maintenance so retention applies within the probe's seconds —
    // production keeps the 60 s default; only the STEADY-STATE bytes change
    // cadence, not the bound
    spark.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "2s")
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    def dirBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(p))
    }

    val sweep = Seq(
      ("defaults       ", 10, 100),
      ("retain20       ", 10, 20),
      ("retain20_snap5 ", 5, 20),
      ("retain20_snap20", 20, 20))

    for ((tag, minDeltas, retain) <- sweep) {
      spark.conf.set("spark.sql.streaming.stateStore.minDeltasForSnapshot",
        minDeltas.toString)
      spark.conf.set("spark.sql.streaming.minBatchesToRetain", retain.toString)
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft_ret").toString
      val in = MemoryStream[(String, Long)]
      val q = graft.streaming.SketchStream
        .kmvDistinct(in.toDF().toDF("g", "v"), "g", "v", k = 64).toDF()
        .writeStream.outputMode("update")
        .option("checkpointLocation", s"$ckpt/_ckpt")
        .format("noop").start()
      val sizes = new Array[Long](batches)
      val t0 = System.nanoTime()
      (0 until batches).foreach { b =>
        in.addData((0 until rowsPerBatch).map(i =>
          (s"g${(b * rowsPerBatch + i) % 5000}",
            (b * rowsPerBatch + i).toLong * 2654435761L)))
        q.processAllAvailable()
        // give the async maintenance thread a beat to vacuum past-retention
        // versions — without it the probe measures backlog, not steady state
        Thread.sleep(150)
        sizes(b) = dirBytes(ckpt) / 1024
      }
      val wall = (System.nanoTime() - t0) / 1e9
      // idle tail: let the async maintenance thread catch up, then measure
      // the SETTLED size — the steady state a long-running face pays
      val settledTrack = (0 until 8).map { _ =>
        Thread.sleep(2000); dirBytes(ckpt) / 1024
      }
      q.stop()
      val qtr = Seq(batches / 4, batches / 2, 3 * batches / 4, batches - 1)
        .map(i => sizes(i))
      println(f"[retention] $tag minDeltas=$minDeltas%2d retain=$retain%3d " +
        f"kb@[${qtr.mkString(",")}] max=${sizes.max}%7d final=${sizes.last}%7d " +
        f"settled=[${settledTrack.mkString(",")}] wall=$wall%6.1fs")
    }
    spark.stop()
  }
}
