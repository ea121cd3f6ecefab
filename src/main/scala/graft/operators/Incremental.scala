package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch-incremental semantics (SURVEY §2.9): watermark scans with a fixed
  * late-data overlap, changed-key discovery, and semi-join-restricted
  * rebuilds. The reference implements "streaming" as watermarked batch —
  * extract `ts > last_success - overlap`, then reconcile the re-extracted
  * overlap rows by dedup/merge (bronze_incremental_load.ipynb:cell 17;
  * Gold_incremental_load.ipynb:cell 8-10).
  *
  * Scale notes: the watermark predicate is a plain comparison on the scan
  * column, so it pushes down to parquet row-group stats / JDBC WHERE; the
  * changed-key set is DISTINCT-reduced before the semi join, which Spark
  * broadcasts when small — the common case for dimension rebuilds.
  */
object Incremental {

  /** S3/P9 — watermark filter with overlap (reference: 1 hour for
    * bronze/silver, N-day lookback for gold). */
  def watermarkScan(df: DataFrame, tsCol: String, watermark: Column,
                    overlapSeconds: Long = 3600L): DataFrame =
    df.filter(col(tsCol) > (watermark - expr(s"INTERVAL $overlapSeconds SECONDS")))

  /** A3/J8 — keys touched since the watermark (DISTINCT-reduced). */
  def changedKeys(src: DataFrame, keyCols: Seq[String], tsCol: String,
                  watermark: Column): DataFrame =
    src.filter(col(tsCol) >= watermark).select(keyCols.map(col): _*).distinct()

  /** J8 — restrict a rebuild to changed keys (left-semi ≡ the reference's
    * inner join against a DISTINCT key set). */
  def restrictToChanged(dim: DataFrame, changed: DataFrame, keyCols: Seq[String]): DataFrame =
    dim.join(changed, keyCols, "left_semi")

  /** CDC-style snapshot diff: classify every business key as
    * `insert` (new only), `delete` (old only), or `update` (both sides,
    * any non-key column differs) — the change-capture primitive for
    * re-deriving downstream tables from periodic full snapshots when the
    * source offers no change feed.
    *
    * Shape: ONE key-shuffle full-outer join; non-key columns collapse to a
    * struct compared with null-safe equality (`<=>`), so the comparison is
    * exact (no hashing — a hash collision could silently drop an update)
    * and stays inside whole-stage codegen. Unchanged keys are filtered
    * out, so the output is |changes|, not |snapshot|. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keys: Seq[String]): DataFrame = {
    val nonKey = newSnap.columns.filterNot(keys.contains).toSeq
    def pack(df: DataFrame, tag: String) =
      df.select(keys.map(col) :+ struct(nonKey.map(col): _*).as(tag): _*)
    pack(oldSnap, "__o").join(pack(newSnap, "__n"), keys, "full_outer")
      .withColumn("change_type",
        when(col("__o").isNull, lit("insert"))
          .when(col("__n").isNull, lit("delete"))
          .when(!(col("__o") <=> col("__n")), lit("update")))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) :+ col("change_type"): _*)
  }
}
