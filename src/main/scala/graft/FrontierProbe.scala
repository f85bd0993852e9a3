package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only probe for the ONE unmeasured incremental-dedup claim (round-11
  * verdict): `Dedup.incrementalClusters(frontier = true)`'s iterative cost
  * is O(delta + affected members), FLAT in corpus size at fixed delta —
  * the daily-fold shape, where a small batch lands against a huge standing
  * component table. The only prior measurement was the q138 gate's
  * delta=1/3 shape, where frontier *loses* (three extra corpus-sized
  * semi-joins buy nothing when the delta touches most components anyway).
  *
  * The fold's inputs are content-free — an (id, label) table, a pair
  * delta, a new-node set; corpus text never enters — so the probe
  * generates them directly at sizes ScaleGen's sf1 documents (~0.5M rows)
  * cannot reach: clusters of 4, a fixed 10k-pair delta touching 10k
  * distinct old components (spread evenly, worst case for locality), and
  * 10k genuinely new ids. Per corpus size it times, min-of-2 over real
  * parquet inputs:
  *   - frontier fold (the daily shape under test),
  *   - flat fold (the default, whole-table star-edge propagation),
  *   - from-scratch rebuild ([[graft.ops.Dedup.connectedComponents]]).
  *
  * Results land in PLANS.md ("frontier fold probe", round 12).
  *
  * Usage: runMain graft.FrontierProbe [outTmpDir]
  */
object FrontierProbe {
  def main(args: Array[String]): Unit = {
    val tmp = args.headOption.getOrElse(
      s"${sys.props("java.io.tmpdir")}/frontier_probe_${ProcessHandle.current().pid()}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println(f"${"corpus"}%12s ${"delta"}%8s ${"touched"}%8s ${"frontier_s"}%10s ${"flat_s"}%8s ${"rebuild_s"}%9s")
    // axis 1: corpus grows, delta fixed (the daily-fold claim);
    // axis 2: corpus fixed at the largest size, delta grows (the
    // O(delta + affected) slope itself)
    val shapes = Seq(1000000L, 4000000L, 16000000L).map(n => (n, 10000L)) ++
      Seq((16000000L, 100000L), (16000000L, 1000000L))
    for ((n, delta) <- shapes) {
      // standing table: clusters of 4, labels = min member id
      spark.range(n)
        .select(col("id").as("doc_id"),
          (col("id") - pmod(col("id"), lit(4L))).as("cluster_id"))
        .write.mode("overwrite").parquet(s"$tmp/comps_${n}_$delta")
      // delta: each new id (n + i) pairs with old id i*spread*4 — 10k
      // pairs touching 10k DISTINCT old components spread across the whole
      // id range (no locality for the semi-joins to exploit)
      val spread = n / (4L * delta)
      spark.range(delta)
        .select((col("id") + n).as("id_a"),
          (col("id") * spread * 4L).as("id_b"))
        .write.mode("overwrite").parquet(s"$tmp/pairs_${n}_$delta")
      spark.range(delta).select((col("id") + n).as("doc_id"))
        .write.mode("overwrite").parquet(s"$tmp/new_${n}_$delta")
      val comps = spark.read.parquet(s"$tmp/comps_${n}_$delta")
      val pairs = spark.read.parquet(s"$tmp/pairs_${n}_$delta")
      val fresh = spark.read.parquet(s"$tmp/new_${n}_$delta")

      def time2(mk: => DataFrame): Double = {
        def once(): Double = {
          spark.catalog.clearCache()
          val s = System.nanoTime()
          mk.queryExecution.toRdd.count()
          (System.nanoTime() - s) / 1e9
        }
        math.min(once(), once())
      }
      val frontierS = time2(graft.ops.Dedup.incrementalClusters(
        comps, pairs, Some(fresh), frontier = true, withSizes = false))
      val flatS = time2(graft.ops.Dedup.incrementalClusters(
        comps, pairs, Some(fresh), frontier = false, withSizes = false))
      val rebuildS = time2 {
        val nodes = comps.select(col("doc_id").as("id"))
          .unionByName(fresh.select(col("doc_id").as("id")))
        val edges = comps.select(col("doc_id").as("src"), col("cluster_id").as("dst"))
          .unionByName(pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
        graft.ops.Dedup.connectedComponents(nodes, edges)
      }
      println(f"$n%12d $delta%8d $delta%8d $frontierS%10.2f $flatS%8.2f $rebuildS%9.2f")
    }
    // the probe's value is the printed table — don't leave ~GBs of
    // generated parquet in /tmp across runs
    try {
      val p = new org.apache.hadoop.fs.Path(tmp)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
