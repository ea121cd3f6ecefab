package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.sources.SkippingIndex
import graft.sources.SkippingIndex.ColRange

/** Layout/skipping evidence driver: replicates lineitem `factor`× (shifted
  * orderkeys — MakeScale's scheme), writes the SAME rows as (a) a linear
  * orderkey-sorted layout and (b) a Z-ordered (orderkey, partkey) layout,
  * then for a two-sided box predicate reports each layout's file skip
  * ratio and the wall clock of the footer-index pruned scan vs the plain
  * full scan. The claim under test is the 100 TB one: multi-predicate
  * scans over a Z layout touch a near-minimal file set, and the manifest
  * prune pays for itself end-to-end (index build + prune + scan < scan).
  *
  * Usage: `LayoutBench <sfDir> [factor] [files]` — prints one JSON line.
  */
object LayoutBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val files = args.lift(2).map(_.toInt).getOrElse(64)
    val repeats = 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.setup(spark)

    val base = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_returnflag", "l_shipdate")
    val maxOk = base.agg(max("l_orderkey")).head().getLong(0)
    val shift = maxOk + 1
    val big = (0 until factor).map { i =>
      base.withColumn("l_orderkey", col("l_orderkey") + lit(i * shift))
    }.reduce(_ union _)
    val rows = big.count()

    val tmp = java.nio.file.Files.createTempDirectory("layout_bench").toString
    val zDir = s"$tmp/z"; val lDir = s"$tmp/linear"
    def timed[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
    }
    val (zWriteSec, _) = timed(
      Layout.zorder(big, Seq("l_orderkey", "l_partkey"), files)
        .write.mode("overwrite").parquet(zDir))
    val (lWriteSec, _) = timed(
      Layout.linear(big, "l_orderkey", files)
        .write.mode("overwrite").parquet(lDir))

    // the manifest is built ONCE per layout (the deployed shape: index
    // maintained at write time) and every query prunes on the driver
    val idxCols = Seq("l_orderkey", "l_partkey")
    val (zIdxSec, zIdx) = timed(SkippingIndex.manifest(spark, zDir, idxCols))
    val (lIdxSec, lIdx) = timed(SkippingIndex.manifest(spark, lDir, idxCols))

    // box A: both dims selective (~3% × ~5%); box B: partkey ONLY — the
    // dimension a linear orderkey sort cannot prune at all
    val maxPk = base.agg(max("l_partkey")).head().getLong(0)
    val boxA = Seq(
      ColRange("l_orderkey", (shift / 4).toDouble, (shift / 4 + factor * shift / 32).toDouble),
      ColRange("l_partkey", (maxPk / 4).toDouble, (maxPk / 4 + maxPk / 20).toDouble))
    val boxB = Seq(
      ColRange("l_partkey", (maxPk / 4).toDouble, (maxPk / 4 + maxPk / 20).toDouble))

    def fullScan(dir: String, box: Seq[ColRange]): Long =
      spark.read.parquet(dir)
        .filter(box.map(r => col(r.column) >= r.lo && col(r.column) <= r.hi)
          .reduce(_ && _))
        .agg(count(lit(1)), sum("l_quantity")).head().getLong(0)
    def prunedScan(dir: String, idx: SkippingIndex.Manifest,
                   box: Seq[ColRange]): Long =
      SkippingIndex.prunedRead(spark, dir, box, Some(idx))
        .agg(count(lit(1)), sum("l_quantity")).head().getLong(0)

    def measure(box: Seq[ColRange]): (String, Long) = {
      val (zKept, zTotal) = SkippingIndex.skipRatio(spark, zDir, box, Some(zIdx))
      val (lKept, lTotal) = SkippingIndex.skipRatio(spark, lDir, box, Some(lIdx))
      // alternate, keep mins; assert identical row counts across paths
      val runs = (1 to repeats).map { _ =>
        val a = timed(prunedScan(zDir, zIdx, box)); val b = timed(fullScan(zDir, box))
        val c = timed(prunedScan(lDir, lIdx, box)); val d = timed(fullScan(lDir, box))
        (a, b, c, d)
      }
      val counts = runs.flatMap(r => Seq(r._1._2, r._2._2, r._3._2, r._4._2)).distinct
      require(counts.size == 1, s"pruned/full scans disagree: $counts")
      val json =
        s""""z_kept":$zKept,"z_total":$zTotal,"linear_kept":$lKept,"linear_total":$lTotal,""" +
        s""""z_pruned_sec":${runs.map(_._1._1).min},"z_full_sec":${runs.map(_._2._1).min},""" +
        s""""linear_pruned_sec":${runs.map(_._3._1).min},"linear_full_sec":${runs.map(_._4._1).min}"""
      (json, counts.head)
    }
    val (jsonA, rowsA) = measure(boxA)
    val (jsonB, rowsB) = measure(boxB)
    println(s"""{"rows":$rows,"files":$files,""" +
      s""""z_write_sec":$zWriteSec,"linear_write_sec":$lWriteSec,""" +
      s""""z_index_sec":$zIdxSec,"linear_index_sec":$lIdxSec,""" +
      s""""boxA_rows":$rowsA,"boxA":{$jsonA},""" +
      s""""boxB_rows":$rowsB,"boxB":{$jsonB}}""")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    spark.stop()
  }
}
