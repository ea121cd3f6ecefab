package graft.run

import org.apache.spark.sql.SparkSession

/** Deep-LOG head-resolution soak (round 15). [[CommitSoak]] probes the
  * wide-table axis (many data FILES); this probes the other scale axis:
  * many VERSIONS. Every commit verb needs the current head, and before
  * round 15 each resolve listed the whole `_commits/` directory —
  * O(total versions) per call, several calls per commit, so a
  * long-lived high-frequency writer paid a growing per-commit tax even
  * when `vacuumCommitLogs` hadn't run. `latestVersion` now serves the
  * head from a validated per-root hint (one stat + one forward probe
  * per foreign commit), with the listing as the cold fallback.
  *
  * Method: deepen the log with rename ping-pong commits (`v`→`w`→`v` —
  * METADATA-ONLY, no Spark job, so the loop is pure protocol cost),
  * then at each decade measure (a) the hint path (median of 1000
  * calls), (b) the listing path (`versions(root)` — exactly what every
  * head resolve paid before), and (c) one real append at that depth.
  *
  * Usage: runMain graft.run.HeadSoak [maxVersions]
  */
object HeadSoak {
  def main(args: Array[String]): Unit = {
    import graft.sources.VersionedTable
    val depth = if (args.nonEmpty) args(0).toInt else 20000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_headsoak").toString
    val batch = (0 until 100).map(i => (i.toLong, s"r$i")).toDF("id", "v")
      .coalesce(1).persist()
    batch.count()
    VersionedTable.overwrite(spark, root, batch)
    println("| versions | deepen s (renames/s) | head via hint µs | head via listing ms | append ms |")
    println("|---|---|---|---|---|")
    val marks = Seq(1000, 2000, 5000, 10000, 20000, 50000, 100000).filter(_ <= depth)
    for (m <- marks) {
      val t0 = System.nanoTime()
      var renames = 0
      // pairs keep the logical schema back at `v` for the append below
      while (VersionedTable.latestVersion(root).get + 2 <= m) {
        VersionedTable.renameColumn(spark, root, "v", "w")
        VersionedTable.renameColumn(spark, root, "w", "v")
        renames += 2
      }
      val deepenS = (System.nanoTime() - t0) / 1e9
      val rate = if (deepenS > 0) renames / deepenS else 0.0
      // steady state: the validated hint (one stat, zero listings)
      var i = 0
      val t1 = System.nanoTime()
      while (i < 1000) { VersionedTable.latestVersion(root); i += 1 }
      val hintUs = (System.nanoTime() - t1) / 1e3 / 1000
      // the pre-r15 path: list the whole _commits/ directory
      val t2 = System.nanoTime()
      val listed = VersionedTable.versions(root).lastOption
      val listMs = (System.nanoTime() - t2) / 1e6
      require(listed == VersionedTable.latestVersion(root),
        s"hint/listing disagree: $listed vs ${VersionedTable.latestVersion(root)}")
      // a real append at this log depth (the full commit path)
      val t3 = System.nanoTime()
      VersionedTable.append(spark, root, batch)
      val appendMs = (System.nanoTime() - t3) / 1e6
      val v = VersionedTable.latestVersion(root).get
      println(f"| $v | $deepenS%.1f ($rate%.0f/s) | $hintUs%.2f | $listMs%.1f | $appendMs%.0f |")
    }
    // the production bound: vacuum(keep) retires the prefix, then
    // commit-log GC deletes the tombstones — _commits/ returns to
    // O(keep), so the listing cost above is the UNBOUNDED worst case
    VersionedTable.vacuum(root, keep = Some(10), minAgeMs = 0L)
    val gcd = VersionedTable.vacuumCommitLogs(root, minAgeMs = 0L).size
    val left = java.nio.file.Paths.get(root, "_commits").toFile.listFiles().length
    println(s"vacuum(keep=10) + vacuumCommitLogs: $gcd old commit lists GC'd; _commits/ now holds $left file(s)")
    spark.stop()
  }
}
