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
}
