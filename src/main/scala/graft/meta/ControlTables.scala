package graft.meta

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Control/metadata tables (SURVEY §1.1, §2.9): execution log + incremental
  * watermark store. These are the only explicitly-schema'd tables in the
  * engine (mirroring the reference's StructType-declared control tables,
  * bronze_incremental_load.ipynb:cell 10). Tiny, append-only, driver-built.
  */
object ControlTables {

  val ExecutionLogSchema: StructType = StructType(Seq(
    StructField("execution_id", StringType, nullable = false),
    StructField("pipeline_name", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("layer", StringType, nullable = false),
    StructField("load_type", StringType, nullable = false),   // initial | incremental
    StructField("records_processed", LongType, nullable = false),
    StructField("status", StringType, nullable = false),      // success | failed
    StructField("error_message", StringType, nullable = true),
    StructField("execution_timestamp", TimestampType, nullable = false)))

  final case class LogEntry(executionId: String, pipelineName: String,
      tableName: String, layer: String, loadType: String, records: Long,
      status: String, error: Option[String], at: java.sql.Timestamp)

  /** S15 — build a 1-row log DataFrame from literals with explicit schema. */
  def logRow(spark: SparkSession, e: LogEntry): DataFrame =
    spark.createDataFrame(
      java.util.List.of(Row(e.executionId, e.pipelineName, e.tableName, e.layer,
        e.loadType, e.records, e.status, e.error.orNull, e.at)),
      ExecutionLogSchema)

  /** A4/P10 — last successful watermark for a table: filter status+name,
    * top-1 by timestamp. Returns None on bootstrap (missing/empty log). */
  def lastSuccessWatermark(log: DataFrame, tableName: String): Option[java.sql.Timestamp] =
    log.filter(col("status") === "success" && col("table_name") === tableName)
      .orderBy(col("execution_timestamp").desc)
      .limit(1).collect().headOption
      .map(_.getAs[java.sql.Timestamp]("execution_timestamp"))

  /** X3 — most recent failure, for the on-fail lookup hook. */
  def lastFailure(log: DataFrame): Option[Row] =
    log.filter(col("status") === "failed")
      .orderBy(col("execution_timestamp").desc).limit(1)
      .collect().headOption
}
