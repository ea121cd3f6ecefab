package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array as a native codegen `Expression`.
  *
  * Semantics identical to the HOF formulation in TextDedup.simhashFold
  * (md5-derived 64-bit hash per token — the digest's first 8 bytes,
  * big-endian — ±1 vote per bit, sign → bit): the HOF version nests
  * `aggregate(zip_with(zip_with(...)))`, which is a CodegenFallback
  * walking interpreted closures 64× per token; this is one primitive
  * loop per row inside whole-stage codegen.
  *
  * The token hash is md5 (not xxhash64) DELIBERATELY: md5 exists in
  * every engine, so the whole fingerprint — per-token hashing, bit
  * votes, sign collapse — replays as portable SQL and the `d4_simhash`
  * gate is hash-checked against DuckDB rather than rows-only. The cost
  * is one md5 per DISTINCT token per doc, far from any hot loop.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** Static so generated code can call it directly. Null tokens are
    * skipped (the HOF twin never produces them — tokenizers emit
    * non-null arrays). Token hash = md5 digest's first 8 bytes read
    * big-endian — i.e. the first 16 hex chars of `md5(token)` as an
    * unsigned 64-bit value, which is exactly what the DuckDB replay
    * parses via two 32-bit halves. */
  // one digest per executor thread: getInstance per row would dominate
  // the short-token workload
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val md = mdPool.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val d = md.digest(arr.getUTF8String(i).getBytes) // digest() resets
        var h = 0L
        var j = 0
        while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")

  def simhash64(c: Column): Column =
    org.apache.spark.sql.functions.call_function("simhash64", c)
}
