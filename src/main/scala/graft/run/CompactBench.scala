package graft.run

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.IngestPipeline

/** State-fan-out evidence for [[RunIngest.runCompact]]: bootstrap a
  * corpus, commit `n` small batch deltas (the ~daily-batch shape), then
  * time one UNCOMMITTED probe screen against the state (a) fanned
  * across `n`+1 delta dirs, (b) after compaction folded it into one —
  * plus the compaction wall itself. The probe decision is asserted
  * identical before/after (same census), so the speedup is free.
  *
  * Usage: `CompactBench <sfDir> [nBatches]` — prints one JSON line.
  */
object CompactBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args.lift(1).map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.setup(spark)

    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val corpusCut = maxId / 2
    val batchSpan = math.max(1L, (maxId - corpusCut) / n)
    val dir = Files.createTempDirectory("compact_bench").toString

    val state0 = IngestPipeline.bootstrap(docs.filter(col("doc_id") <= corpusCut))
    RunIngest.writeDelta(dir, 0, state0, None)
    RunIngest.commit(dir, 0, "__bootstrap__", Seq.empty)

    // every step reloads state from committed files, so the PREVIOUS
    // step's eager-checkpoint blocks are dead weight — sweep them, or 50
    // steps of pinned batch frames overrun any fixed heap (this is what
    // RunIngest gets for free by running one batch per process)
    def sweep(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

    val tIngest0 = System.nanoTime()
    (0 until n).foreach { i =>
      sweep()
      val lo = corpusCut + 1 + i * batchSpan
      val hi = if (i == n - 1) maxId + 1 else lo + batchSpan
      val batch = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
      val live = RunIngest.liveVersions(dir)
      val state = RunIngest.loadState(spark, dir, live)
      val sketch = RunIngest.loadSketch(dir, live)
      val r = IngestPipeline.ingest(state, batch, sketch = sketch)
      val v = RunIngest.committedVersions(dir).max + 1
      RunIngest.writeDelta(dir, v, r.delta, sketch)
      RunIngest.commit(dir, v, s"b$i", r.census.map(c => c.stage -> c.docs))
    }
    val ingestSec = (System.nanoTime() - tIngest0) / 1e9

    // the probe is a corpus slice re-presented: all-dup decisions push
    // every screen stage, the worst case for state reads
    val probe = docs.filter(col("doc_id") <= corpusCut / 4)
    def decide(): (Double, Seq[(String, Long)]) = {
      sweep()
      val t0 = System.nanoTime()
      val live = RunIngest.liveVersions(dir)
      val state = RunIngest.loadState(spark, dir, live)
      val sketch = RunIngest.loadSketch(dir, live)
      val r = IngestPipeline.ingest(state, probe, sketch = sketch)
      val census = r.census.map(c => c.stage -> c.docs)
      ((System.nanoTime() - t0) / 1e9, census)
    }
    val pre = Seq(decide(), decide())
    val liveBefore = RunIngest.liveVersions(dir).size

    sweep()
    val tc0 = System.nanoTime()
    val compacted = RunIngest.runCompact(spark, dir)
    val compactSec = (System.nanoTime() - tc0) / 1e9
    require(compacted.nonEmpty, "compaction must fold >1 live delta")

    val post = Seq(decide(), decide())
    require(pre.map(_._2).distinct.size == 1 &&
      pre.head._2 == post.head._2 && post.map(_._2).distinct.size == 1,
      "probe decisions must be identical before and after compaction")
    println(s"""{"n_batches":$n,"live_deltas_before":$liveBefore,""" +
      s""""live_deltas_after":${RunIngest.liveVersions(dir).size},""" +
      s""""ingest_loop_sec":$ingestSec,""" +
      s""""probe_sec_fanned":${pre.map(_._1).min},""" +
      s""""probe_sec_compacted":${post.map(_._1).min},""" +
      s""""compact_sec":$compactSec,"decisions_equal":true}""")
    spark.stop()
  }
}
