package graft.functions

import java.nio.ByteBuffer
import java.util.{PriorityQueue => JPriorityQueue}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Top-N rows per group as a MERGEABLE bounded-heap aggregate — the
  * 100 TB replacement for the `row_number() over (partition by g order by
  * score)` quota idiom. The window formulation sort-shuffles the ENTIRE
  * corpus to rank rows it is about to throw away; this aggregate keeps at
  * most N (score, id) entries per group per partition, combines map-side,
  * and ships only N·|groups| tuples through the exchange. Same exact
  * answer (it is a total order, not a sketch), a corpus-sized sort less.
  *
  * Scores are LONG or DOUBLE (integral/float inputs are widened at
  * registration): quality scores are ratios, so a long-only quota forces
  * lossy pre-scaling. Doubles are stored as raw IEEE-754 bits (exact
  * round-trip) and ordered with `java.lang.Double.compare` — a TOTAL
  * order (NaN sorts above +Inf, deterministically), so ties cannot make
  * two engines disagree any more than the long path can.
  *
  * Ordering is the deterministic quota order used across the engine:
  * score DESC, id ASC. `topk_by` returns the retained entries as
  * `array<struct<score,id>>` sorted strongest-first; explode it (and
  * optionally semi-join the ids back) to materialize the quota'd rows.
  */
object TopKBy {

  private def entryType(scoreType: DataType) = StructType(Seq(
    StructField("score", scoreType, nullable = false),
    StructField("id", LongType, nullable = false)))

  /** weakest-first heap order: lowest score at the head; on score ties the
    * LARGER id is weaker (id ASC preferred). The head is what eviction
    * removes when the heap exceeds k. Double scores live as raw bits in
    * slot 0 and compare via Double.compare — the long/double distinction
    * is the comparator, not the storage. */
  final class Heap(val k: Int, val isDouble: Boolean) {
    private def cmpScore(a: Long, b: Long): Int =
      if (isDouble)
        java.lang.Double.compare(
          java.lang.Double.longBitsToDouble(a), java.lang.Double.longBitsToDouble(b))
      else java.lang.Long.compare(a, b)
    private[TopKBy] def stronger(a: Array[Long], b: Array[Long]): Boolean = {
      val c = cmpScore(a(0), b(0))
      c > 0 || (c == 0 && a(1) < b(1))
    }
    val q = new JPriorityQueue[Array[Long]](math.max(k, 1),
      (a: Array[Long], b: Array[Long]) => {
        val c = cmpScore(a(0), b(0))
        if (c != 0) c else java.lang.Long.compare(b(1), a(1))
      })
    def offer(score: Long, id: Long): Unit = {
      val e = Array(score, id)
      if (q.size < k) q.add(e)
      else if (stronger(e, q.peek())) { q.poll(); q.add(e) }
    }
  }

  /** `topk_by(score, id, k)`: retain the k strongest (score DESC, id ASC)
    * entries of the group. Null scores/ids are ignored. */
  case class TopKByAgg(score: Expression, id: Expression, k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Heap] {

    require(k > 0, "topk_by: k must be positive")
    private def isDouble = score.dataType match {
      case DoubleType => true
      case LongType   => false
      case other => throw new IllegalArgumentException(
        s"topk_by: score must be LONG or DOUBLE, got $other")
    }

    /** Unsupported score/id types (decimal, string, date, …) fail HERE at
      * analysis with a clear message, not as an IllegalArgumentException
      * from createAggregationBuffer at task runtime. */
    override def checkInputDataTypes(): TypeCheckResult = score.dataType match {
      case LongType | DoubleType => id.dataType match {
        case LongType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"topk_by: id must be BIGINT, got ${other.sql}")
      }
      case other => TypeCheckResult.TypeCheckFailure(
        s"topk_by: score must be BIGINT or DOUBLE " +
          s"(smaller integral/float types widen at registration), got ${other.sql}")
    }

    override def children: Seq[Expression] = Seq(score, id)
    override def nullable: Boolean = false
    override def dataType: DataType =
      ArrayType(entryType(score.dataType), containsNull = false)

    override def createAggregationBuffer(): Heap = new Heap(k, isDouble)

    override def update(buf: Heap, input: InternalRow): Heap = {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null) {
        val bits =
          if (buf.isDouble) java.lang.Double.doubleToLongBits(s.asInstanceOf[Double])
          else s.asInstanceOf[Long]
        buf.offer(bits, i.asInstanceOf[Long])
      }
      buf
    }

    override def merge(buf: Heap, other: Heap): Heap = {
      val it = other.q.iterator()
      while (it.hasNext) { val e = it.next(); buf.offer(e(0), e(1)) }
      buf
    }

    override def eval(buf: Heap): Any = {
      val arr = new Array[Array[Long]](buf.q.size)
      var i = 0
      val it = buf.q.iterator()
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      // strongest first: score DESC, id ASC
      java.util.Arrays.sort(arr, (a: Array[Long], b: Array[Long]) =>
        if (buf.stronger(a, b)) -1 else if (buf.stronger(b, a)) 1 else 0)
      new GenericArrayData(arr.map { e =>
        val s: Any =
          if (buf.isDouble) java.lang.Double.longBitsToDouble(e(0)) else e(0)
        InternalRow(s, e(1)): Any
      })
    }

    override def serialize(buf: Heap): Array[Byte] = {
      val bb = ByteBuffer.allocate(9 + buf.q.size * 16)
      bb.put(if (buf.isDouble) 1.toByte else 0.toByte)
      bb.putInt(buf.k).putInt(buf.q.size)
      val it = buf.q.iterator()
      while (it.hasNext) { val e = it.next(); bb.putLong(e(0)).putLong(e(1)) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Heap = {
      val bb = ByteBuffer.wrap(bytes)
      val dbl = bb.get() == 1.toByte
      val heap = new Heap(bb.getInt, dbl)
      val n = bb.getInt
      var i = 0
      while (i < n) { heap.offer(bb.getLong, bb.getLong); i += 1 }
      heap
    }

    override def withNewMutableAggBufferOffset(o: Int): TopKByAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TopKByAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKByAgg =
      copy(score = c(0), id = c(1))
    override def prettyName: String = "topk_by"
  }

  private def intLit(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  /** Integral scores widen to LONG, float to DOUBLE; LONG/DOUBLE pass
    * through. Anything else (decimal, string) is rejected by the agg. */
  private def widenScore(e: Expression): Expression = e.dataType match {
    case ByteType | ShortType | IntegerType => Cast(e, LongType)
    case FloatType                          => Cast(e, DoubleType)
    case _                                  => e
  }

  /** Register `topk_by(score, id, k)`. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_by",
      exprs => TopKByAgg(widenScore(exprs(0)), exprs(1),
        intLit(exprs(2), "k")).toAggregateExpression(),
      "scala_udf")

  def topkBy(score: Column, id: Column, k: Int): Column =
    call_function("topk_by", score, id.cast("long"), lit(k))
}
