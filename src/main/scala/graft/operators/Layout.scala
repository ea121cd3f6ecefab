package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT — Z-order (Morton) clustering so that a
  * range predicate on ANY of the clustered columns maps to a contiguous
  * band of files, not a full scan. This is the storage-side half of scan
  * efficiency at 100 TB: partitioning prunes on the partition column
  * only; Z-ordering makes file-level min/max stats selective on EVERY
  * clustered dimension at once, so a manifest-style skipping index
  * ([[graft.sources.SkippingIndex]]) can drop most files before the
  * scan starts. Reference analogue: the reference relies on its
  * warehouse's automatic clustering for multi-predicate fact scans
  * (spaceparts notebooks query fact tables by date AND product
  * simultaneously); this is the engine-owned equivalent.
  *
  * Everything is exact INTEGER arithmetic inside whole-stage codegen —
  * no doubles anywhere, so the construction replays bit-for-bit in any
  * engine with 64-bit integer ops (the DuckDB oracle runs the same
  * shifts; see `o6_zorder_value`).
  */
object Layout {

  /** Bits of resolution per dimension. 16 bits × up to 4 dims keeps the
    * interleaved value inside a signed 64-bit long. */
  val Bits = 16
  private val Buckets = 1L << Bits // 65536

  /** Exact integer scaling of `c` from `[minV, maxV]` onto
    * `[0, 65535]`: `((c - min) * 65536) div (max - min + 1)`. All-long
    * arithmetic — callers must ensure `(max - min) * 65536` fits a
    * long, i.e. the column's RANGE is below 2^47 (any surrogate key or
    * epoch-seconds column qualifies; epoch-NANOS ranges spanning more
    * than ~4 years do not — scale those to a coarser unit first). A
    * constant column (min = max) lands everything on bucket 0. */
  def scaleTo(c: Column, minV: Column, maxV: Column): Column =
    call_function("div",
      (c.cast("long") - minV.cast("long")) * lit(Buckets),
      maxV.cast("long") - minV.cast("long") + lit(1L))

  /** Morton/Z value of pre-scaled dimensions (each already in
    * `[0, 2^Bits)`): bit `b` of dimension `i` lands at interleaved
    * position `b*n + i`. Built as 16·n shift/mask/or terms over longs —
    * a single codegen'd projection, no UDF, no shuffle. */
  def zValue(scaled: Seq[Column]): Column = {
    require(scaled.nonEmpty && scaled.size * Bits <= 63,
      s"zValue supports 1..${63 / Bits} dimensions at $Bits bits")
    val n = scaled.size
    val terms = for {
      (c, i) <- scaled.zipWithIndex
      b <- 0 until Bits
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Z-value of raw columns, scaled per-dimension by the frame's own
    * min/max (one mergeable agg, broadcast back as a 1-row frame — the
    * same shape `temperatureMix` uses; no driver collect). */
  def zValueAuto(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c")))
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val scaled = cols.map(c => scaleTo(col(c), col(s"__min_$c"), col(s"__max_$c")))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", zValue(scaled))
      .drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** Cluster `df` into `numFiles` files Z-ordered on `cols`: range
    * partition by the Z value (so each output file owns a contiguous
    * Z band → tight per-file min/max on every clustered column), sort
    * within partitions (so ROW GROUPS inside each file are tight too —
    * parquet's own row-group pruning stacks on top of file skipping),
    * then drop the helper. One extra shuffle at write time buys every
    * subsequent multi-predicate scan its file pruning — the classic
    * write-once/read-many trade at corpus scale. */
  def zorder(df: DataFrame, cols: Seq[String], numFiles: Int): DataFrame =
    zValueAuto(df, cols)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** Linear (single-key sort) layout twin for evidence runs: tight on
    * `cols.head`, arbitrarily loose on every other dimension. */
  def linear(df: DataFrame, sortCol: String, numFiles: Int): DataFrame =
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
}
