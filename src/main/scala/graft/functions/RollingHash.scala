package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash (Karp–Rabin) over a string's UTF-8 bytes — the
  * document-fingerprint primitive (north-star text analysis). A native
  * Catalyst `Expression` with `doGenCode`, so it stays inside whole-stage
  * codegen (no UDF serialization, no boxing in the hot path).
  *
  * hash = Σ byte_i · BASE^(n-1-i)  (mod 2^64, wrapping long arithmetic)
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  final val Base: Long = 1315423911L

  /** Static so generated code can call it directly. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * Base + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  /** Register `rolling_hash` in the session's function registry (the public
    * Column<->Expression bridge in Spark 4). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "scala_udf")

  /** Column-level entry point (requires [[register]] on the session). */
  def rolling_hash(c: Column): Column =
    org.apache.spark.sql.functions.call_function("rolling_hash", c)
}
