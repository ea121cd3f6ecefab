package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Diagnostic (guide §1): run named queries once through the noop sink
  * and report, per query, wall seconds plus the number of Spark JOBS,
  * STAGES and TASKS and the summed executor task time. A query whose
  * wall time is many times its task time is scheduling/latency-bound
  * (too many sequential actions / exchanges), not compute-bound — the
  * two call for different fixes. Same session shape as [[Bench]].
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.setup(spark)

    val verbose = sys.env.contains("SPARK_GRAFT_JOBPROF_V")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskNanos = new AtomicLong(0L)
    val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val desc = j.stageInfos.lastOption.map(_.name).getOrElse("")
          jobStartNs.put(j.jobId, (System.nanoTime(), desc))
        }
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (verbose) Option(jobStartNs.remove(e.jobId)).foreach { case (t0, desc) =>
          println(f"    job ${e.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $desc")
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
      }
    })

    def once(name: String, timed: Boolean): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a moment to drain
      Thread.sleep(300)
      if (timed) println(f"$name%-36s wall ${wall}%7.2f s  jobs ${jobs.get}%4d  stages ${stages.get}%4d  tasks ${tasks.get}%6d  taskTime ${taskNanos.get / 1e9}%8.2f s")
    }

    once("q1_pricing_summary", timed = false) // warmup
    args.foreach { n =>
      graft.util.Caches.releaseAll()
      once(n, timed = true)
    }
    graft.util.Caches.releaseAll()
    spark.stop()
  }
}
