package graft.run

import org.apache.spark.sql.SparkSession

/** Concurrent-writer throughput soak (round 15). The racing-writers
  * spec proves CORRECTNESS under contention (link(2) CAS, no lost
  * commits); this measures THROUGHPUT: N writer threads performing
  * idempotent appends onto ONE table, reporting commits/s as N grows.
  * With the O(change) append path and O(1) head resolution the
  * serialized section is one small delta-list write + one link(2) —
  * the measurement shows how close real contention gets to that
  * ceiling, and the exactly-once invariants are re-asserted at the end
  * (contiguous versions, every writer's rows exactly once).
  *
  * Usage: runMain graft.run.WriterSoak [appendsPerWriter]
  */
object WriterSoak {
  def main(args: Array[String]): Unit = {
    import graft.sources.VersionedTable
    val perWriter = if (args.nonEmpty) args(0).toInt else 50
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    println("| writers | appends | wall s | commits/s | versions contiguous | rows exactly once |")
    println("|---|---|---|---|---|---|")
    for (n <- Seq(1, 2, 4, 8)) {
      val root = java.nio.file.Files.createTempDirectory(s"graft_writersoak_$n").toString
      VersionedTable.overwrite(spark, root, Seq((0L, "seed")).toDF("id", "v"))
      // one pre-materialized single-file batch per writer: the Spark
      // write cost is constant, so the sweep isolates PROTOCOL
      // contention (carry derivation + CAS), not executor scheduling
      val batches = (0 until n).map { w =>
        val b = (0 until 50).map(i => (w * 1000L + i, s"w$w-$i")).toDF("id", "v")
          .coalesce(1).persist()
        b.count(); b
      }
      val total = n * perWriter
      val t0 = System.nanoTime()
      val threads = (0 until n).map { w =>
        new Thread(() =>
          (0 until perWriter).foreach(e =>
            VersionedTable.appendIdempotent(spark, root, batches(w), s"w$w", e)))
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      val vs = VersionedTable.versions(root)
      val contiguous = vs == (vs.head to vs.last)
      require(vs.size == total + 1,
        s"expected ${total + 1} versions, got ${vs.size} — a commit was lost or duplicated")
      // every writer's epoch committed exactly once: conservation check
      val rows = VersionedTable.read(spark, root).count()
      val exact = rows == 1L + total.toLong * 50
      println(f"| $n | $total | $wall%.1f | ${total / wall}%.1f | $contiguous | $exact |")
      require(contiguous && exact, s"invariant violated at n=$n")
      batches.foreach(_.unpersist())
    }
    spark.stop()
  }
}
