package graft.run

/** Storage-format strategy behind [[Warehouse]] (SURVEY §7.1): the engine
  * emulates transactional semantics over plain parquet (union+window merge,
  * rewrite compaction) and dispatches to Delta Lake's native
  * `MERGE INTO` / `OPTIMIZE` when Delta is on the classpath — there the
  * merge rewrites only matched files instead of the whole table, which is
  * the difference between a bounded and a full-table write at 100 TB.
  * Nothing here links against Delta at compile time: detection is by
  * class-presence and the Delta operations are plain SQL strings +
  * `format("delta")`, so the same jar serves both deployments.
  */
sealed trait TableFormat { def name: String }

object TableFormat {
  case object Parquet extends TableFormat { val name = "parquet" }
  case object Delta extends TableFormat { val name = "delta" }

  /** Delta iff its DataSource is loadable AND the session was actually
    * built with the Delta extension (MERGE INTO / OPTIMIZE parse only
    * through `DeltaSparkSessionExtension`; the jar alone being on the
    * classpath would make every write fail with AnalysisException).
    * Parquet in this container — the emulation carries the same observable
    * semantics, proven by the s11 merge gate. */
  def detect(spark: org.apache.spark.sql.SparkSession): TableFormat =
    if (classExists("org.apache.spark.sql.delta.sources.DeltaDataSource") &&
        spark.conf.getOption("spark.sql.extensions")
          .exists(_.contains("DeltaSparkSessionExtension"))) Delta
    else Parquet

  private def classExists(fqcn: String): Boolean =
    try { Class.forName(fqcn, false, getClass.getClassLoader); true }
    catch { case _: Throwable => false }

  /** The Delta MERGE statement for a path-addressed target: upsert-by-key
    * with source rows winning (`UPDATE SET *` / `INSERT *`) — the SQL twin
    * of [[graft.operators.Dedup.mergeUpsert]]'s union+window emulation.
    * Pure string builder so the dispatch seam is testable without Delta. */
  def mergeSql(targetPath: String, sourceView: String, keys: Seq[String]): String = {
    val on = keys.map(k => s"t.`$k` = s.`$k`").mkString(" AND ")
    s"MERGE INTO delta.`$targetPath` t USING $sourceView s ON $on " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
  }

  def optimizeSql(targetPath: String): String = s"OPTIMIZE delta.`$targetPath`"
}
