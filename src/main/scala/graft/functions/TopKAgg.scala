package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded min-heap over (score, id) with the ranking order
  * score DESC, id ASC — the exact tie-break a deterministic top-k query
  * uses, so results match a row_number()-based oracle bit-for-bit. */
final class TopKHeap(val k: Int) {
  // head = WORST retained element (lowest score, then largest id)
  private val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(y._1, x._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }
  val q = new scala.collection.mutable.PriorityQueue[(Double, Long)]()(worstFirst)

  def add(score: Double, id: Long): Unit = {
    if (q.size < k) q.enqueue((score, id))
    else if (worstFirst.compare((score, id), q.head) < 0) { // strictly better than worst
      q.dequeue(); q.enqueue((score, id))
    }
  }

  /** Best-first (score desc, id asc). */
  def sortedDesc: Seq[(Double, Long)] = q.clone().dequeueAll.reverse.toSeq
}

/** Typed imperative TOP-K aggregate: per group, keep the k best (score,
  * id) pairs in a bounded heap — ranked score DESC then id ASC — and
  * return them as array<struct<vec_id, cos_sim>> best-first.
  *
  * This is the shape a 100 TB top-k wants and no built-in composition
  * gives: the window formulation (row_number over (q_id) order by score)
  * shuffles EVERY scored row to rank it, while this aggregate is
  * map-side combinable — each partition reduces to k rows per group
  * before the exchange, so the shuffle carries k x partitions rows per
  * group no matter how large the corpus is. The two-phase window trick
  * (Similarity.topKTwoPhase) approximates this; the aggregate IS it.
  *
  * Deterministic given distinct (score, id) ranking — ties in score
  * break by id, matching a `row_number() ORDER BY score DESC, id ASC`
  * oracle exactly.
  */
case class TopKAgg(scoreExpr: Expression, idExpr: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint) inputs, got ${s.simpleString}, ${i.simpleString}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("cos_sim", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buffer.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    other.q.foreach { case (s, i) => buffer.add(s, i) }
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedDesc.map { case (s, i) =>
      InternalRow(i, s)
    }.toArray[Any])

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val els = buffer.q.toSeq
    val bb = java.nio.ByteBuffer.allocate(4 + els.size * 16)
    bb.putInt(els.size)
    els.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var j = 0
    while (j < n) { h.add(bb.getDouble, bb.getLong); j += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}
