package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Silver-layer type standardization (SURVEY §2.2 P2, §1.2).
  *
  * One wide `select` that rebuilds every column by type rule — a single
  * Projection node, fully whole-stage-codegen'd, no shuffle. Semantics from
  * the reference's silver standardization (Silver_full_load.ipynb:cell 8;
  * pandas twin silver_processor.py:137-187):
  *   - sentinel strings -> real null
  *   - bigint `*date`/`month` columns -> epoch decode (ns vs s heuristic)
  *   - NaN / ±Inf doubles -> null
  *   - everything else passes through untouched.
  */
object Standardize {

  /** Sentinel values normalized to null (compared after trim+upper). */
  val NullSentinels: Seq[String] = Seq("", "NULL", "N/A", "UNKNOWN", "NONE", "#N/A")

  /** Epoch-unit heuristic threshold: values above 1e12 are nanoseconds,
    * otherwise seconds. Faithful to the reference (including its quirk that
    * values in (1e9, 1e12) follow the seconds path — do not "fix"). */
  val NsThreshold: Long = 1000000000000L

  /** Decode a bigint epoch column to a timestamp: nanos -> floor to micros
    * (keeps sub-second precision at Spark's native resolution); seconds ->
    * `timestamp_seconds`. Floor via exact decimal math — a double division
    * would corrupt micros above 2^53. */
  def epochDecode(c: Column): Column =
    when(c > lit(NsThreshold),
      timestamp_micros(floor(c.cast(DecimalType(38, 0)) / lit(1000)).cast(LongType)))
      .otherwise(timestamp_seconds(c))

  /** Sentinel-string normalization: "", NULL, N/A, UNKNOWN, NONE, #N/A
    * (after trim+upper) become real null; other values pass unchanged. */
  def nullifySentinels(c: Column): Column =
    when(trim(upper(c)).isin(NullSentinels: _*), lit(null)).otherwise(c)

  /** NaN / ±Inf -> null for floating-point columns. */
  def cleanFloat(c: Column): Column =
    when(isnan(c) || c === lit(Double.PositiveInfinity) ||
      c === lit(Double.NegativeInfinity), lit(null)).otherwise(c)

  private def isDateNamed(name: String): Boolean = {
    val n = name.toLowerCase
    (n.endsWith("date") && n != "dwcreateddate") || n == "month"
  }

  /** The P2 operator: one projection applying all §1.2 type rules. */
  def standardizeTypes(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      val c = col(f.name)
      val out = f.dataType match {
        case StringType => nullifySentinels(c)
        case DoubleType | FloatType => cleanFloat(c)
        case LongType if isDateNamed(f.name) => epochDecode(c)
        case _ => c
      }
      out.as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** P4: audit-column injection with an injectable clock so tests and the
    * correctness gate stay hash-stable (SURVEY §7.3). */
  def withAudit(df: DataFrame, layer: String, executionId: String,
                clock: Column = current_timestamp()): DataFrame =
    df.withColumn(s"${layer}_created_date", clock)
      .withColumn(s"${layer}_execution_id", lit(executionId))
}
