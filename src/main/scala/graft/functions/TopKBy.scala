package graft.functions

import java.nio.ByteBuffer
import java.util.{PriorityQueue => JPriorityQueue}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
  * Ordering is the deterministic quota order used across the engine:
  * score DESC, id ASC — ties cannot make two engines disagree. `topk_by`
  * returns the retained entries as `array<struct<score,id>>` sorted
  * strongest-first; explode it (and optionally semi-join the ids back)
  * to materialize the quota'd rows.
  */
object TopKBy {

  private val entryType = StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("id", LongType, nullable = false)))

  /** weakest-first heap order: lowest score at the head; on score ties the
    * LARGER id is weaker (id ASC preferred). The head is what eviction
    * removes when the heap exceeds k. */
  final class Heap(val k: Int) {
    val q = new JPriorityQueue[Array[Long]](math.max(k, 1),
      (a: Array[Long], b: Array[Long]) => {
        val c = java.lang.Long.compare(a(0), b(0))
        if (c != 0) c else java.lang.Long.compare(b(1), a(1))
      })
    def offer(score: Long, id: Long): Unit = {
      if (q.size < k) q.add(Array(score, id))
      else {
        val head = q.peek()
        val weaker = score > head(0) || (score == head(0) && id < head(1))
        if (weaker) { q.poll(); q.add(Array(score, id)) }
      }
    }
  }

  /** `topk_by(score, id, k)`: retain the k strongest (score DESC, id ASC)
    * entries of the group. Null scores/ids are ignored. */
  case class TopKByAgg(score: Expression, id: Expression, k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Heap] {

    require(k > 0, "topk_by: k must be positive")

    override def children: Seq[Expression] = Seq(score, id)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(entryType, containsNull = false)

    override def createAggregationBuffer(): Heap = new Heap(k)

    override def update(buf: Heap, input: InternalRow): Heap = {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null)
        buf.offer(s.asInstanceOf[Long], i.asInstanceOf[Long])
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
      java.util.Arrays.sort(arr, (a: Array[Long], b: Array[Long]) => {
        val c = java.lang.Long.compare(b(0), a(0))
        if (c != 0) c else java.lang.Long.compare(a(1), b(1))
      })
      new GenericArrayData(arr.map(e =>
        InternalRow(e(0), e(1)): Any))
    }

    override def serialize(buf: Heap): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + buf.q.size * 16)
      bb.putInt(buf.k).putInt(buf.q.size)
      val it = buf.q.iterator()
      while (it.hasNext) { val e = it.next(); bb.putLong(e(0)).putLong(e(1)) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Heap = {
      val bb = ByteBuffer.wrap(bytes)
      val heap = new Heap(bb.getInt)
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

  /** Register `topk_by(score, id, k)`. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_by",
      exprs => TopKByAgg(exprs(0), exprs(1), intLit(exprs(2), "k")).toAggregateExpression(),
      "scala_udf")

  def topkBy(score: Column, id: Column, k: Int): Column =
    call_function("topk_by", score.cast("long"), id.cast("long"), lit(k))
}
