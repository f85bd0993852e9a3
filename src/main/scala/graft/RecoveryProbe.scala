package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Dev-only measurement (PLANS.md round 13): RocksDB changelog
  * checkpointing's effect on streaming restart/recovery — the
  * `spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled`
  * lever. With it OFF every commit uploads a full state snapshot and
  * recovery downloads the latest snapshot; with it ON commits upload an
  * O(changed-keys) changelog and recovery replays changelogs over the last
  * snapshot — the difference between O(state) and O(changes) per commit,
  * which is what keeps a 100 TB deployment's per-batch overhead flat as
  * standing state grows.
  *
  * Shape: [[graft.streaming.SketchStream.kmvDistinct]] (mapGroupsWithState
  * — the mechanism most of the engine's stateful faces ride) over `groups`
  * distinct groups, fed `batches` micro-batches, then the query is stopped
  * and restarted from its checkpoint and the FIRST post-restart batch is
  * timed (that batch pays the state-store load). Both configurations run in
  * one JVM, changelog-off first; each uses its own checkpoint.
  *
  * Usage: runMain graft.RecoveryProbe [groups] [batches] [rowsPerBatch]
  */
object RecoveryProbe {
  def main(args: Array[String]): Unit = {
    val groups = args.lift(0).map(_.toInt).getOrElse(50000)
    val batches = args.lift(1).map(_.toInt).getOrElse(8)
    val rowsPerBatch = args.lift(2).map(_.toInt).getOrElse(100000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    def timed[A](f: => A): (A, Double) = {
      val s = System.nanoTime(); val a = f; (a, (System.nanoTime() - s) / 1e9)
    }

    for (changelog <- Seq(false, true)) {
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        changelog.toString)
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_recovery_cl_$changelog").toString
      val in = MemoryStream[(String, Long)]
      def start() = graft.streaming.SketchStream
        .kmvDistinct(in.toDF().toDF("g", "v"), "g", "v", k = 16)
        .writeStream.outputMode("update")
        .option("checkpointLocation", s"$ckpt/_ckpt")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.SketchStream.KmvEstimate], _: Long) =>
          df.queryExecution.toRdd.count(); ()
        }
        .start()
      // build up standing state across `batches` commits
      val q1 = start()
      val (_, buildSec) = timed {
        var next = 0L
        (1 to batches).foreach { _ =>
          in.addData((0 until rowsPerBatch).map { i =>
            val r = next + i; (s"g${r % groups}", r)
          }: _*)
          next += rowsPerBatch
          q1.processAllAvailable()
        }
      }
      q1.stop()
      // recovery: restart from the checkpoint, time the first batch (it
      // pays the per-partition state-store load: snapshot download, plus
      // changelog replay when enabled)
      val (_, recoverSec) = timed {
        val q2 = start()
        in.addData(("g0", -1L))
        q2.processAllAvailable()
        q2.stop()
      }
      // checkpoint footprint: what each strategy actually persisted
      val stateBytes = {
        val p = new org.apache.hadoop.fs.Path(s"$ckpt/_ckpt/state")
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        if (!fs.exists(p)) 0L
        else { var t = 0L; val it = fs.listFiles(p, true)
          while (it.hasNext) t += it.next().getLen; t }
      }
      println(f"[recovery] changelog=$changelog%-5s groups=$groups batches=$batches " +
        f"build=$buildSec%.2fs restartFirstBatch=$recoverSec%.2fs " +
        f"stateDir=${stateBytes / 1024 / 1024}%dMB")
    }
    spark.stop()
  }
}
