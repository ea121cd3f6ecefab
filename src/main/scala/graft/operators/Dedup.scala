package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-based deduplication (SURVEY §2.5 W1/W2/W3).
  *
  * All variants are one `row_number` window: a single hash-partition shuffle
  * on the dedup keys, map-side combinable by AQE. Tie-breaks must be total
  * (`orderCols` should end in a unique column) so results are deterministic
  * and reproducible across runs — the reference's `orderBy(desc(ts))` alone
  * is not (SURVEY §7.3).
  *
  * Scale note: partitioning by low-cardinality keys (the W2 fact pattern)
  * skews — but for the `row_number = 1` shape all of these compile to,
  * Spark ≥3.5's InferWindowGroupLimit already inserts a PARTIAL
  * WindowGroupLimit before the exchange: every map task forwards at most
  * one row per key, so a hot key reaches the final sort with ≤ #map-tasks
  * rows regardless of its true size. Measured (SkewBench, SCALE.md): a
  * single key owning ALL 40M input rows dedups in 0.6 s through the
  * plain window — FASTER than `saltedKeepLatest`, whose hand-rolled
  * pre-reduction pays an extra full shuffle for the same bound. Keep
  * using `keepLatest`; `saltedKeepLatest` remains for window shapes the
  * rewrite cannot cover (rank filters keeping many rows per key, engines
  * without the optimization) and as the explicit-bound fallback.
  */
object Dedup {

  private val Rn = "__graft_rn"

  /** Keep exactly one row per `partCols` group, the first under `orderCols`. */
  def keepLatest(df: DataFrame, partCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn(Rn, row_number().over(w)).filter(col(Rn) === 1).drop(Rn)
  }

  /** W1 — dim dedup: partition by ALL columns except audit/timestamp ones,
    * keep the latest by `tsCol` (Silver_full_load.ipynb:cell 8
    * `remove_duplicates`). Exact-duplicate removal keeping newest audit ts. */
  def dedupDim(df: DataFrame, tsCol: String, auditCols: Set[String] = Set.empty): DataFrame = {
    val keys = df.columns.filterNot(c => c == tsCol || auditCols.contains(c)).toSeq
    keepLatest(df, keys, Seq(col(tsCol).desc))
  }

  /** W2 — fact dedup with pattern-discovered keys: business-key columns are
    * those whose (lowercased) name contains any of `patterns`
    * (Silver_full_load.ipynb:cell 8; silver_processor.py:204). */
  def patternKeys(df: DataFrame, patterns: Seq[String]): Seq[String] =
    df.columns.filter(c => patterns.exists(p => c.toLowerCase.contains(p))).toSeq

  def dedupFactByPattern(df: DataFrame, patterns: Seq[String],
                         orderCols: Seq[Column]): DataFrame =
    keepLatest(df, patternKeys(df, patterns), orderCols)

  /** Total tie-break: the caller's primary ordering followed by every other
    * column descending — full-row ordering makes keep-latest reproducible
    * even when version columns tie on physical duplicates (SURVEY §7.3). */
  def totalOrder(df: DataFrame, partCols: Seq[String], primary: Seq[Column],
                 primaryNames: Seq[String]): Seq[Column] = {
    val covered = (partCols ++ primaryNames).toSet
    primary ++ df.columns.filterNot(covered.contains).sorted.map(c => col(c).desc)
  }

  /** W3/S11 — merge-upsert without a transactional table format: union the
    * incoming batch over the existing rows with the incoming side winning
    * ties, then window-dedup on the business keys. Same observable semantics
    * as `MERGE INTO … WHEN MATCHED UPDATE SET * WHEN NOT MATCHED INSERT *`
    * (Gold_incremental_load.ipynb:cell 10), already proven by the
    * reference's own Silver incremental path (Silver_incremental_load
    * .ipynb:cell 8 `merge_to_silver_table`). */
  def mergeUpsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
                  versionCols: Seq[Column]): DataFrame = {
    val pri = "__graft_src_pri"
    val unioned = existing.withColumn(pri, lit(0))
      .unionByName(incoming.withColumn(pri, lit(1)), allowMissingColumns = true)
    keepLatest(unioned, keys, col(pri).desc +: versionCols).drop(pri)
  }

  /** First stage of the salted dedup: per-(key, salt) local reduction.
    * AT MOST `saltBuckets` candidate rows per key survive — this is the
    * bound that protects the global window from a hot key (exposed
    * package-private so the skew spec can assert it directly). */
  private[graft] def saltedCandidates(df: DataFrame, partCols: Seq[String],
                                      orderCols: Seq[Column], saltBuckets: Int): DataFrame = {
    val salt = "__graft_salt"
    val local = df
      .withColumn(salt, pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    keepLatest(local, partCols :+ salt, orderCols).drop(salt)
  }

  /** Skew-resistant variant of keepLatest for 100TB-scale hot keys: the
    * per-(key, salt) reduction shrinks each hot key to `saltBuckets`
    * candidates before the global window, so no single task ever sorts a
    * hot key's full row set. */
  def saltedKeepLatest(df: DataFrame, partCols: Seq[String],
                       orderCols: Seq[Column], saltBuckets: Int = 64): DataFrame =
    keepLatest(saltedCandidates(df, partCols, orderCols, saltBuckets), partCols, orderCols)
}
