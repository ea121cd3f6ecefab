package graft.run

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× scale pillar for the change-feed pipeline: a versioned source
  * takes a 3-commit history over the ×100 events fixture (10M rows —
  * `MakeScale <sf0.1> <out> 100 events`), then the REAL Structured
  * Streaming `versioned-feed` source folds it into a keyed CDC target,
  * one commit per micro-batch. Reported per phase: wall seconds, rows,
  * and — the claim that matters at 100 TB — the number of FILES each
  * feed slice actually scanned vs the snapshot's total (a bounded feed
  * reads the commit diff, not the table).
  *
  * Usage: `runMain graft.run.FeedScale <scaledDir> [workDir]`. */
object FeedScale {
  def main(args: Array[String]): Unit = {
    import graft.sources.{SkippingIndex, VersionedTable}
    import graft.streaming.Streams
    val srcDir = args(0)
    val work = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_feedscale").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.setup(spark)

    val src = s"$work/src"
    val tgt = s"$work/tgt"
    val ev = graft.sources.Tables.events(spark, srcDir)
      .select("event_id", "user_id", "event_type", "value")
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[feedscale] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val cut = 600000000L // ~60% of the shifted keyspace into v0
    timed("v0 overwrite (range-clustered)") {
      VersionedTable.overwrite(spark, src, ev.filter(col("event_id") < cut)
        .repartitionByRange(32, col("event_id")).sortWithinPartitions("event_id"))
    }
    timed("v1 append") {
      VersionedTable.append(spark, src, ev.filter(col("event_id") >= cut))
    }
    timed("v2 bounded delete") {
      // the ×100 fixture shifts each copy's keys by 10M — the box must
      // sit inside a copy's live keyspace to actually delete rows
      val (_, rw, carry) = VersionedTable.deleteWhere(spark, src,
        Seq(SkippingIndex.ColRange("event_id", 10000000, 10099999)))
      println(s"[feedscale] delete rewrote $rw files, carried $carry")
    }
    val total = VersionedTable.dataFiles(src).size
    // per-slice scan boundedness: the feed between consecutive versions
    // reads only the commit diff's files
    Seq((0L, 1L), (1L, 2L)).foreach { case (a, b) =>
      val n = VersionedTable.changeFeed(spark, src, a, b).inputFiles.length
      println(s"[feedscale] feed v$a->v$b scans $n files of $total in the snapshot")
    }
    timed("streaming consume (one commit per micro-batch)") {
      Streams.changeFeedStream(spark, src, tgt, Seq("event_id"),
        Seq(col("event_id").desc), "fs", maxVersionsPerTrigger = Some(1L))
    }
    val got = VersionedTable.read(spark, tgt).count()
    val want = VersionedTable.read(spark, src).count()
    println(s"[feedscale] target rows $got vs source $want " +
      s"(equal: ${got == want}); target versions ${VersionedTable.versions(tgt).size}")
    timed("whole-stream replay (must no-op)") {
      Streams.changeFeedStream(spark, src, tgt, Seq("event_id"),
        Seq(col("event_id").desc), "fs", maxVersionsPerTrigger = Some(1L))
    }
    println(s"[feedscale] versions after replay: ${VersionedTable.versions(tgt).size}")
    spark.stop()
  }
}
