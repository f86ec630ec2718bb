package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregation buffer: a min-heap at the "worst kept"
  * end, so insertion beyond k evicts in O(log k). Better = higher
  * score; ties broken toward the SMALLER id (deterministic output).
  */
final class TopKBuffer(val k: Int) {
  // PriorityQueue dequeues the max per its ordering; "max worseness"
  // = lowest score, then largest id, so head == worst kept element
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] {
      case (s, i) => (-s, i)
    }
  val heap = scala.collection.mutable.PriorityQueue.empty(worstFirst)

  def insert(score: Double, id: Long): Unit = {
    // NaN is skipped like null: Scala's total-order Ordering ranks NaN
    // greatest, so a NaN entry would become a permanent "worst kept"
    // head that every later comparison (`score > ws`, `score == ws`)
    // loses against — silently rejecting better elements. The window
    // formulation the oracle uses never ranks NaN either.
    if (score.isNaN) return
    // canonicalize -0.0 to +0.0: SQL ordering treats them EQUAL
    // (tie -> smaller id), but Scala's total-order Ordering inside
    // the heap/sort ranks -0.0 below 0.0 — without this, insert's
    // primitive == sees a tie while sorted() does not, and the
    // smaller id can lose the documented tie-break
    val s = if (score == 0.0) 0.0 else score
    if (heap.size < k) heap.enqueue((s, id))
    else {
      val (ws, wi) = heap.head
      if (s > ws || (s == ws && id < wi)) {
        heap.dequeue(); heap.enqueue((s, id))
      }
    }
  }

  /** Descending score, ascending id within ties. */
  def sorted: Array[(Double, Long)] =
    heap.toArray.sortBy { case (s, i) => (-s, i) }
}

/** `top_k_by(score, id, k)` — per-group top-k as a Catalyst
  * `TypedImperativeAggregate` returning
  * `array<struct<score:double, id:bigint>>` sorted by (score desc,
  * id asc), exactly `min(k, group size)` entries; null scores/ids and
  * NaN scores are skipped (SQL aggregate convention; NaN would poison
  * the heap's total-order comparisons — see [[TopKBuffer.insert]]).
  *
  * Why an aggregate and not a window: the idiomatic
  * `row_number() OVER (PARTITION BY g ORDER BY s DESC) <= k` shuffles
  * and SORTS every row of every group. This aggregate does map-side
  * partial aggregation: each map task ships at most k entries per
  * group it saw, the shuffle carries O(groups x partitions x k)
  * instead of O(rows), and no full per-group sort ever happens —
  * insertion is an O(log k) bounded-heap operation. At 100 TB with
  * millions of rows per group and k in the tens, that is the
  * difference between a top-k that works and one that spills.
  */
case class TopKBy(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"top_k_by: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_by"

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"top_k_by expects (double, bigint), got ($s, $i) — cast first")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    o.heap.foreach { case (s, i) => b.insert(s, i) }
    b
  }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + 16 * b.heap.size)
    val out = new DataOutputStream(bos)
    out.writeInt(b.heap.size)
    b.heap.foreach { case (s, i) =>
      out.writeDouble(s); out.writeLong(i)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new TopKBuffer(k)
    val n = in.readInt()
    (0 until n).foreach(_ => b.insert(in.readDouble(), in.readLong()))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKBy =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKBy =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKBy {
  /** Column-API entry point; casts are the caller's job (the helper
    * [[graft.operators.GroupOps.topKPerGroup]] casts for you).
    */
  def topKBy(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKBy(
      ColumnBridge.expression(score), ColumnBridge.expression(id), k)
      .toAggregateExpression())
}
