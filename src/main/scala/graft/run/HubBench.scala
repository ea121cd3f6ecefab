package graft.run

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Hub-graph PageRank evidence driver — the power-law worst case the
  * deterministic fold cannot survive at web scale: ONE node with
  * `hubDegree` in-edges (a crawl hub / link-farm target), plus a ring so
  * every node has out-degree and the damped update has structure. Runs
  * [[Graph.pageRank]] BOTH ways on identical input — the bounded-state
  * `sum` default and the `deterministic = true` ascending-source fold —
  * and reports, per variant: wall seconds, the PEAK task execution
  * memory and LONGEST task (SparkListener task metrics — the fold's
  * O(in-degree) aggregation state and its one fat task show up here;
  * the sum's partial aggregation stays flat), and the max absolute rank
  * difference between the two (the IEEE reassociation bound — expected
  * ~1e-15 relative).
  *
  * Usage: `HubBench [hubDegree] [iters]` — defaults 2,000,000 × 3.
  * Prints one JSON line.
  */
object HubBench {

  private final class Probe extends SparkListener {
    val peakMem = new AtomicLong(0L)
    val maxTaskMs = new AtomicLong(0L)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      if (t.taskMetrics != null) {
        peakMem.getAndUpdate(m => math.max(m, t.taskMetrics.peakExecutionMemory))
        maxTaskMs.getAndUpdate(m => math.max(m, t.taskInfo.duration))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val hubDegree = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.setup(spark)

    // every node 1..M points at the hub (node 0) AND at its ring successor;
    // the hub points back at node 1 so no node is dangling
    val m = hubDegree
    val star = spark.range(1L, m + 1).select(col("id").as("src"), lit(0L).as("dst"))
    val ring = spark.range(1L, m + 1)
      .select(col("id").as("src"), (pmod(col("id"), lit(m)) + 1).as("dst"))
    val hubOut = spark.range(1).select(lit(0L).as("src"), lit(1L).as("dst"))
    val edges = star.unionByName(ring).unionByName(hubOut)
      .localCheckpoint(true) // materialize: time the RANKING, not the build

    def run(det: Boolean): (Double, Long, Long, Map[Long, Double]) = {
      val probe = new Probe
      spark.sparkContext.addSparkListener(probe)
      val t0 = System.nanoTime()
      // ranks for the hub, its ring neighbor, and one far leaf suffice for
      // the parity check — collecting M rows would put the driver in the
      // measurement
      val picked = Graph.pageRank(edges, "src", "dst", iters,
          deterministic = det)
        .filter(col("id").isin(0L, 1L, m / 2))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // let the async listener bus drain task-end events
      spark.sparkContext.removeSparkListener(probe)
      (secs, probe.peakMem.get(), probe.maxTaskMs.get(), picked)
    }

    // sum first, fold second; a second sum run guards against warm-up bias
    // in the comparison (report the min of the two sum walls)
    val (sumSec1, _, _, _) = run(det = false)
    val (foldSec, foldMem, foldTask, foldRanks) = run(det = true)
    val (sumSec2, sumMem, sumTask, sumRanks) = run(det = false)
    val maxDiff = foldRanks.map { case (k, v) => math.abs(v - sumRanks(k)) }.max
    require(maxDiff < 1e-9, s"sum path diverged from fold: $maxDiff")
    println(s"""{"hub_in_degree":$m,"iters":$iters,""" +
      s""""sum_sec":${math.min(sumSec1, sumSec2)},"fold_sec":$foldSec,""" +
      s""""sum_peak_task_mem":$sumMem,"fold_peak_task_mem":$foldMem,""" +
      s""""sum_max_task_ms":$sumTask,"fold_max_task_ms":$foldTask,""" +
      s""""hub_rank":${sumRanks(0L)},"max_abs_rank_diff":$maxDiff}""")
    spark.stop()
  }
}
