package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary: at most `cap` counters; any item
  * whose true frequency exceeds n/(cap+1) is guaranteed to survive —
  * under ANY update and merge order (Misra & Gries, Sci. Comput.
  * Program. 2, 1982; merge rule per Agarwal et al., "Mergeable
  * Summaries", PODS'12: sum counters, then subtract the (cap+1)-th
  * largest count and drop non-positives). */
final class MGSummary(val cap: Int) {
  val m = new scala.collection.mutable.HashMap[String, Long]()

  /** One occurrence of `t` (the classic streaming step). */
  def add(t: String): Unit =
    m.get(t) match {
      case Some(c) => m.update(t, c + 1L)
      case None =>
        if (m.size < cap) m.update(t, 1L)
        else {
          // full and t unseen: decrement every counter (t's own +1 and
          // -1 cancel), dropping the ones that reach zero
          val dead = scala.collection.mutable.ArrayBuffer[String]()
          m.foreach { case (k, c) =>
            if (c == 1L) dead += k else m.update(k, c - 1L)
          }
          dead.foreach(m.remove)
        }
    }

  /** PODS'12 merge: pointwise sum, then re-bound to `cap` counters by
    * subtracting the (cap+1)-th largest summed count. */
  def mergeIn(other: MGSummary): Unit = {
    other.m.foreach { case (k, c) =>
      m.update(k, m.getOrElse(k, 0L) + c)
    }
    if (m.size > cap) {
      val counts = m.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (cap + 1)) // (cap+1)-th largest
      val dead = scala.collection.mutable.ArrayBuffer[String]()
      m.foreach { case (k, c) =>
        if (c - cut <= 0L) dead += k else m.update(k, c - cut)
      }
      dead.foreach(m.remove)
    }
  }
}

/** Typed imperative MISRA-GRIES aggregate: bounded-state frequent-item
  * CANDIDATES over a string column, `cap` counters per aggregation
  * buffer, returned as array<string>.
  *
  * This is the map-side half of the exact heavy-hitters plan a 100 TB
  * token stream wants: a full `GROUP BY token` shuffles EVERY distinct
  * token (trillions of rows of exchange for a question whose answer is
  * a few hundred rows), while this aggregate reduces each partition to
  * at most `cap` counters before the exchange and merges them with the
  * summed-then-rebounded rule — state and shuffle are O(cap) however
  * large the corpus is. The candidate SET depends on encounter order
  * (any MG run does), but its superset guarantee does not: every token
  * with frequency > n/(cap+1) is present in every run. An exact
  * confirming count over just the candidates (a semi-join-pruned second
  * pass) then yields a deterministic, exactly-thresholded result — see
  * TextAnalysis.heavyHitters.
  */
case class MisraGriesAgg(child: Expression, cap: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] {

  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_misra_gries"

  override def createAggregationBuffer(): MGSummary = new MGSummary(cap)

  override def update(buffer: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MGSummary, other: MGSummary): MGSummary = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: MGSummary): Any =
    new GenericArrayData(
      buffer.m.keysIterator.map(UTF8String.fromString).toArray[Any])

  override def serialize(buffer: MGSummary): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.m.size)
    buffer.m.foreach { case (k, c) =>
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = new MGSummary(cap)
    var j = 0
    while (j < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      s.m.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      j += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0))
}
