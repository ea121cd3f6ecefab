package graft.run

import org.apache.spark.sql.SparkSession
import graft.sources.ParquetDirSource

/** X1 — sequential orchestration driver: Bronze → Silver → Gold with a
  * per-layer report, against a fixture scale-factor directory.
  *
  * Usage: runMain graft.run.RunPipeline <sfDir> <warehouseDir>
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val whDir = if (args.length > 1) args(1)
                else java.nio.file.Files.createTempDirectory("graft_wh").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.setup(spark)

    val source = ParquetDirSource(sfDir,
      Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem"))
    val executionId = java.util.UUID.randomUUID().toString
    val pipe = new Pipeline(Warehouse(spark, whDir), source, executionId)

    val reports = Seq(pipe.runBronze(), pipe.runSilver(), pipe.runGold())
    reports.foreach { r =>
      val total = r.tables.values.sum
      println(s"[${r.layer}] ${r.tables.size} tables, $total rows" +
        (if (r.quarantined.nonEmpty) s", quarantined=${r.quarantined.values.sum}" else ""))
      r.tables.toSeq.sortBy(_._1).foreach { case (t, n) => println(f"  $t%-24s $n%10d") }
    }
    if (args.contains("--copy")) {
      val copied = pipe.copyToWarehouse()
      println(s"[warehouse-copy] ${copied.size} tables, ${copied.values.sum} rows")
    }
    if (args.contains("--incremental")) {
      val wm = new java.sql.Timestamp(System.currentTimeMillis() - 24L * 3600 * 1000)
      val inc = pipe.runGoldIncremental(wm)
      println(s"[gold-incremental] watermark=$wm")
      inc.toSeq.sortBy(_._1).foreach { case (t, n) => println(f"  $t%-24s $n%10d") }
    }
    println(s"warehouse at $whDir")
    spark.stop()
  }
}
