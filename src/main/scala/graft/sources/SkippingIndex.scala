package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-style FILE SKIPPING index over a parquet directory — the
  * engine-owned analogue of a Delta/Iceberg manifest: per-file min/max
  * row-group statistics, read from parquet FOOTERS ONLY (zero data
  * pages touched), so building the index over a 100 TB table costs one
  * footer round-trip per file, not a scan. A multi-predicate query then
  * prunes to the candidate file list BEFORE the scan starts; parquet's
  * own row-group/page pruning stacks on top inside the surviving files.
  * Maximally effective over a [[graft.operators.Layout.zorder]] layout,
  * where every indexed dimension has tight per-file bounds.
  *
  * Reference analogue: the reference leans on its warehouse's automatic
  * data skipping for selective fact scans (the spaceparts gold queries
  * filter by date and dimension keys simultaneously); this makes that
  * capability an explicit, inspectable operator.
  *
  * Scale notes:
  *  - footers are read DISTRIBUTED (one task per file batch); only file
  *    NAMES pass through the driver — the standard manifest shape, a
  *    few MB per million files;
  *  - stats rows are (file, column, min, max, nulls, rows) — numeric
  *    and date columns only (strings need truncated-bound semantics;
  *    out of scope here, the scaladoc'd extension point);
  *  - pruning is CONSERVATIVE by construction: a file with no usable
  *    stats for a queried column (all-null chunks, missing column,
  *    non-numeric type) is always kept, so a pruned read can never
  *    lose rows — `s16_pruned_scan` puts that soundness under the
  *    DuckDB hash gate, and LayoutSpec asserts equality on random
  *    boxes. Values are carried as DOUBLE: exact for every integral
  *    value below 2^53 (any surrogate key / date / epoch-seconds);
  *    larger longs round — callers indexing epoch-nanos columns should
  *    index a coarser-unit twin instead. */
object SkippingIndex {

  /** One (file, column) stats row. Nulls in min/max mean "no usable
    * bound — never prune this file on this column". */
  final case class FileColStats(file: String, column: String,
                                min_v: Option[Double], max_v: Option[Double],
                                n_nulls: Long, n_rows: Long)

  /** Inclusive range predicate on one indexed column. */
  final case class ColRange(column: String, lo: Double, hi: Double)

  private def listParquet(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).map(_.getPath).filter(_.getName.endsWith(".parquet"))
      .map(_.toString).toSeq.sorted
  }

  /** Read per-file stats for `cols` from parquet footers, one spark task
    * per file slice. The Hadoop `Configuration` is constructed INSIDE
    * the task (it is not serializable); footers are a few KB each. */
  def footerStats(spark: SparkSession, dir: String,
                  cols: Seq[String]): DataFrame = {
    import spark.implicits._
    val files = listParquet(spark, dir)
    val want = cols.toSet
    val slices = math.max(1, math.min(files.size, 64))
    spark.sparkContext.parallelize(files, slices).flatMap { f =>
      val conf = new Configuration()
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
      try {
        val blocks = reader.getFooter.getBlocks
        val rows = { var r = 0L; blocks.forEach(b => r += b.getRowCount); r }
        val name = new Path(f).getName
        // per-block bounds first; the FILE bound combines them afterwards
        // so ONE statless chunk poisons the whole file's bound (a partial
        // bound would prune unsoundly), while a clean file takes the
        // min/max across its row groups
        val perBlock = scala.collection.mutable.Map[String,
          List[(Option[Double], Option[Double], Long)]]().withDefaultValue(Nil)
        blocks.forEach { b =>
          b.getColumns.forEach { c =>
            val colName = c.getPath.toDotString
            if (want(colName)) {
              val st = c.getStatistics
              val (mn, mx): (Option[Double], Option[Double]) =
                if (st == null || st.isEmpty || !st.hasNonNullValue) (None, None)
                else (num(st.genericGetMin.asInstanceOf[Any]),
                      num(st.genericGetMax.asInstanceOf[Any]))
              val nulls = if (st == null) 0L else st.getNumNulls
              perBlock(colName) = (mn, mx, nulls) :: perBlock(colName)
            }
          }
        }
        // emit a row for every requested column: a column ABSENT from the
        // footer still yields (None, None) so pruning stays conservative
        cols.map { cn =>
          val bs = perBlock(cn)
          val nu = bs.map(_._3).sum
          val (mn, mx): (Option[Double], Option[Double]) =
            if (bs.isEmpty || bs.exists(b => b._1.isEmpty || b._2.isEmpty))
              (None, None)
            else (Some(bs.flatMap(_._1).min), Some(bs.flatMap(_._2).max))
          FileColStats(name, cn, mn, mx, nu, rows)
        }
      } finally reader.close()
    }.toDF()
  }

  private def num(v: Any): Option[Double] = v match {
    case n: java.lang.Long    => Some(n.doubleValue())
    case n: java.lang.Integer => Some(n.doubleValue())
    case n: java.lang.Double  => Some(n.doubleValue())
    case n: java.lang.Float   => Some(n.doubleValue())
    case _                    => None // binary/bool — no numeric bound
  }

  /** Files that can contain a row matching ALL ranges: keep unless some
    * queried column PROVES disjointness (`max < lo || min > hi`).
    * Returns the surviving file names (relative, as indexed). */
  def pruneFiles(stats: DataFrame, ranges: Seq[ColRange]): DataFrame = {
    if (ranges.isEmpty) return stats.select("file").distinct()
    val excluded = ranges.map { r =>
      stats.filter(col("column") === r.column &&
          col("min_v").isNotNull && col("max_v").isNotNull &&
          (col("max_v") < lit(r.lo) || col("min_v") > lit(r.hi)))
        .select("file")
    }.reduce(_ union _).distinct()
    stats.select("file").distinct()
      .join(excluded, Seq("file"), "left_anti")
  }

  /** Collected, reusable form of the index: build once when the table is
    * written (or compacted), prune every subsequent query on the driver
    * in microseconds. Memory is O(files × columns) — the manifest trade
    * every lakehouse makes (a million files × 4 columns ≈ tens of MB). */
  final case class Manifest(stats: Seq[FileColStats]) {
    private val byFile = stats.groupBy(_.file)
    def files: Seq[String] = byFile.keys.toSeq.sorted
    /** Files that can contain a row matching ALL ranges (conservative:
      * a missing/unusable bound never prunes). */
    def survivors(ranges: Seq[ColRange]): Seq[String] =
      files.filter { f =>
        val cols = byFile(f)
        ranges.forall { r =>
          cols.find(_.column == r.column) match {
            case Some(FileColStats(_, _, Some(mn), Some(mx), _, _)) =>
              !(mx < r.lo || mn > r.hi)
            case _ => true // no usable bound — keep
          }
        }
      }
  }

  /** Build the reusable manifest for `dir` (one footer pass). */
  def manifest(spark: SparkSession, dir: String, cols: Seq[String]): Manifest =
    Manifest(footerStats(spark, dir, cols).as[FileColStats](
      org.apache.spark.sql.Encoders.product[FileColStats]).collect().toIndexedSeq)

  /** End-to-end pruned scan: manifest → driver-side file pruning → scan
    * ONLY the surviving files → residual filter (pruning is
    * file-granular, the exact predicate still applies). Pass a prebuilt
    * `index` to amortize the footer pass across queries — the deployed
    * shape, where the manifest is maintained at write time. Equals
    * `read(dir).filter(ranges)` by construction (soundness gated by
    * `s17_pruned_scan` + LayoutSpec). */
  def prunedRead(spark: SparkSession, dir: String, ranges: Seq[ColRange],
                 index: Option[Manifest] = None): DataFrame = {
    val m = index.getOrElse(manifest(spark, dir, ranges.map(_.column)))
    val keep = m.survivors(ranges).toSet
    val indexed = m.files.toSet
    val all = listParquet(spark, dir)
    // conservative at FILE granularity too: a file the manifest has never
    // seen (appended/compacted after the index was built) must be KEPT —
    // excluding it would anti-conservatively lose rows from a stale index
    val paths = all.filter { p =>
      val name = new Path(p).getName
      keep(name) || !indexed(name)
    }
    val residual = ranges.map(r =>
      col(r.column) >= lit(r.lo) && col(r.column) <= lit(r.hi))
      .reduceOption(_ && _).getOrElse(lit(true))
    if (paths.isEmpty)
      spark.read.parquet(dir).filter(lit(false))
    else if (paths.size == all.size)
      // nothing pruned — keep the plain directory read (single listed
      // relation, no per-path enumeration overhead)
      spark.read.parquet(dir).filter(residual)
    else
      spark.read.parquet(paths: _*).filter(residual)
  }

  /** Count of files a range set would scan vs the total — the evidence
    * metric LayoutSpec and SCALE.md report. */
  def skipRatio(spark: SparkSession, dir: String, ranges: Seq[ColRange],
                index: Option[Manifest] = None): (Long, Long) = {
    val m = index.getOrElse(manifest(spark, dir, ranges.map(_.column)))
    (m.survivors(ranges).size.toLong, m.files.size.toLong)
  }
}
