package graft.run

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.sources.SkippingIndex
import graft.sources.SkippingIndex.{ColRange, StrRange}

/** Skip-ratio evidence for the round-9 SkippingIndex extensions on the
  * engine's own gold-table layout: lineitem partitioned by ship YEAR
  * with a Z-ORDER on (orderkey, partkey) inside each partition — the
  * production shape where partition pruning (path bounds) STACKS with
  * in-file footer bounds. Reports surviving/total files for: a year
  * range alone, a year+orderkey box (stacked), an orderkey box alone
  * (footer bounds reach across every partition), and a string range on
  * the returnflag (truncated string bounds), plus the wall for the
  * pruned vs plain filtered aggregate on the stacked box.
  *
  * Usage: `PartitionPruneBench <sfDir> [filesPerPartition]` — one JSON
  * line.
  */
object PartitionPruneBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val perPart = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.setup(spark)

    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_returnflag"),
        col("l_quantity").cast("double").as("l_quantity"),
        year(col("l_shipdate")).as("l_year"))
    val dir = Files.createTempDirectory("ppb").toString
    // z-order within each year partition: repartition per (year, z-range)
    // then partitionBy splits the files under each year dir
    Layout.zorder(li, Seq("l_orderkey", "l_partkey"), numFiles = perPart * 7)
      .write.mode("overwrite").partitionBy("l_year").parquet(dir)

    val m = SkippingIndex.manifest(spark, dir,
      Seq("l_year", "l_orderkey", "l_partkey", "l_returnflag"))
    val total = m.files.size
    def kept(r: Seq[ColRange], s: Seq[StrRange] = Nil): Int =
      m.survivors(r, s).size

    val yearOnly = kept(Seq(ColRange("l_year", 1994, 1995)))
    val boxOnly = kept(Seq(ColRange("l_orderkey", 0, 60000)))
    val stacked = kept(Seq(ColRange("l_year", 1994, 1995),
      ColRange("l_orderkey", 0, 60000)))
    val strOnly = kept(Nil, Seq(StrRange("l_returnflag", "R", "R")))

    val ranges = Seq(ColRange("l_year", 1994, 1995),
      ColRange("l_orderkey", 0, 60000))
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def prunedCount(): Long =
      SkippingIndex.prunedRead(spark, dir, ranges, Some(m))
        .agg(count(lit(1))).head().getLong(0)
    def plainCount(): Long =
      spark.read.parquet(dir)
        .filter(col("l_year").between(1994, 1995) &&
          col("l_orderkey").between(0, 60000))
        .agg(count(lit(1))).head().getLong(0)
    val (prunedSec, nP) = Seq(time(prunedCount()), time(prunedCount())).minBy(_._1)
    val (plainSec, nF) = Seq(time(plainCount()), time(plainCount())).minBy(_._1)
    require(nP == nF, s"pruned read must equal plain filtered read: $nP vs $nF")
    println(s"""{"total_files":$total,"year_range_kept":$yearOnly,""" +
      s""""orderkey_box_kept":$boxOnly,"stacked_kept":$stacked,""" +
      s""""returnflag_str_kept":$strOnly,"rows":$nP,""" +
      s""""pruned_scan_sec":$prunedSec,"plain_scan_sec":$plainSec}""")
    spark.stop()
  }
}
