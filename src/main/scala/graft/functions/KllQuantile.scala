package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Mergeable quantile sketches (DataSketches KLL) as native aggregates —
  * the percentile counterpart of the approx-top-k / theta family: a
  * fixed-size summary per group that merges without rescanning, so
  * per-segment sketches stored today answer corpus-wide percentile
  * questions tomorrow. Spark ships KLL in no form (its
  * `approx_percentile` buffer is neither exposed nor storable), which is
  * exactly the gap: `percentile_approx` must re-scan history on every
  * widening, while a stored KLL blob is a few KB per segment and a
  * `kll_merge` away from any rollup.
  *
  * `kll_agg(x)` folds doubles into a sketch blob (parameter k sets the
  * accuracy/size trade; items ≤ k are retained verbatim, making small
  * groups EXACT — the oracled regime); `kll_merge(blob)` unions stored
  * blobs; `kll_quantile(blob, q)` / `kll_n(blob)` read them. All are
  * `TypedImperativeAggregate`/eval expressions registered the same way as
  * the other graft natives (temp registry + `call_function`).
  */
object KllQuantile {

  private def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  /** Fold a DoubleType column into a KLL sketch blob. */
  case class KllSketchAgg(child: Expression, k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(k)

    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[Double])
      buf
    }

    override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
      buf.merge(other); buf
    }

    override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
    override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch = heapify(bytes)

    override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllSketchAgg =
      copy(child = c.head)
    override def prettyName: String = "kll_agg"
  }

  /** Union stored sketch blobs — the no-rescan rollup step. */
  case class KllMergeAgg(child: Expression, k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(k)

    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null) buf.merge(heapify(v.asInstanceOf[Array[Byte]]))
      buf
    }

    override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
      buf.merge(other); buf
    }

    override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
    override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch = heapify(bytes)

    override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllMergeAgg =
      copy(child = c.head)
    override def prettyName: String = "kll_merge"
  }

  /** `getQuantile(q, INCLUSIVE)`: the smallest item whose inclusive rank
    * ≥ q — in the exact regime (n ≤ k) that is the order statistic at
    * 1-based index ⌈q·n⌉, which is what the oracle replays. Null on an
    * empty sketch. */
  case class KllQuantileExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(sketch: Any, q: Any): Any = {
      val sk = heapify(sketch.asInstanceOf[Array[Byte]])
      if (sk.isEmpty) null
      else sk.getQuantile(q.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "kll_quantile"
  }

  /** `getRank(x, INCLUSIVE)`: the normalized rank of `x` — in the exact
    * regime, count(items ≤ x) / n as one IEEE division, which is what the
    * oracle replays. Null on an empty sketch. */
  case class KllRankExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(sketch: Any, x: Any): Any = {
      val sk = heapify(sketch.asInstanceOf[Array[Byte]])
      if (sk.isEmpty) null
      else sk.getRank(x.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "kll_rank"
  }

  /** Item count folded into a sketch blob. */
  case class KllNExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def nullSafeEval(sketch: Any): Any =
      heapify(sketch.asInstanceOf[Array[Byte]]).getN
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def prettyName: String = "kll_n"
  }

  private def intLit(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  /** Register `kll_agg(x, k)`, `kll_merge(blob, k)`, `kll_quantile(blob,
    * q)`, `kll_n(blob)`. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_agg",
      exprs => KllSketchAgg(exprs(0), intLit(exprs(1), "k")).toAggregateExpression(),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_merge",
      exprs => KllMergeAgg(exprs(0), intLit(exprs(1), "k")).toAggregateExpression(),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_quantile", exprs => KllQuantileExpr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_rank", exprs => KllRankExpr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_n", exprs => KllNExpr(exprs(0)), "scala_udf")
  }

  def kllAgg(x: Column, k: Int): Column =
    call_function("kll_agg", x.cast("double"), lit(k))
  def kllMerge(blob: Column, k: Int): Column =
    call_function("kll_merge", blob, lit(k))
  def kllQuantile(blob: Column, q: Double): Column =
    call_function("kll_quantile", blob, lit(q))
  def kllRank(blob: Column, x: Column): Column =
    call_function("kll_rank", blob, x.cast("double"))
  def kllN(blob: Column): Column = call_function("kll_n", blob)
}
