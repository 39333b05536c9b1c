package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructField, StructType}

/** PACKED HLL REGISTER KERNELS — the [[graft.operators.Graph.hyperBall]]
  * / closenessSketch exchange-width fix (the SQ8 narrow-exchange trick
  * applied to sketch registers: shrink WIDTH and ROW COUNT, not work).
  *
  * A HyperBall iterate is logically a (node, reg, mj) frame — 64 rows
  * per node — and every hop joins it against the adjacency and
  * re-maxes, so each hop's exchange carries 64·(E+V) rows. Packing the
  * 64 registers into ONE 64-byte BinaryType blob per node (byte[reg] =
  * mj, 0 = register absent; mj ∈ [1,55] fits a byte with room) turns
  * that into (E+V) rows of ~80 B: 64× fewer rows through every
  * shuffle of the run, identical register CONTENT. [[RegMaxAgg]] is the
  * register-wise MAX aggregate (map-side combinable — each partition
  * reduces to one blob per node before the exchange), [[PackRegExpr]]
  * builds the init blob, [[RegSummaryExpr]] reads a blob back into the
  * two integers the estimator needs (register count and the exact
  * harmonic denominator Σ 2^(REM+1−mj)); all integer-exact, so the
  * estimate doubles — and the DuckDB twin, which iterates the LOGICAL
  * (node, reg, mj) frame — are bit-identical to the row form. */
object RegisterExpressions

/** 64-byte register blob with byte[reg] = mj, all others 0. Init-path
  * only (V rows once per run) — CodegenFallback is noise there. */
case class PackRegExpr(reg: Expression, mj: Expression, nRegs: Int)
  extends BinaryExpression with CodegenFallback {

  require(nRegs >= 1 && nRegs <= 4096, s"nRegs out of range: $nRegs")

  override def left: Expression = reg
  override def right: Expression = mj

  override def checkInputDataTypes(): TypeCheckResult =
    (reg.dataType, mj.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got ${a.simpleString}, ${b.simpleString}")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pack_reg"

  override protected def nullSafeEval(r: Any, m: Any): Any = {
    val ri = r.asInstanceOf[Long]
    val mi = m.asInstanceOf[Long]
    require(ri >= 0 && ri < nRegs, s"register index $ri outside [0, $nRegs)")
    require(mi >= 1 && mi <= 127, s"rank $mi does not fit a register byte")
    val b = new Array[Byte](nRegs)
    b(ri.toInt) = mi.toByte
    b
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackRegExpr =
    copy(reg = newLeft, mj = newRight)
}

/** (n_regs, s_present) readout of a register blob: n_regs = #nonzero
  * bytes, s_present = Σ_{mj>0} 2^(shift − mj) — the exact integers the
  * HLL estimator's raw/linear-counting branch consumes (shift =
  * HbRemBits+1 = 55 for the HyperBall geometry). Runs V rows per hop. */
case class RegSummaryExpr(child: Expression, shift: Int)
  extends UnaryExpression with CodegenFallback {

  require(shift >= 1 && shift <= 62, s"shift out of range: $shift")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_regs", LongType, nullable = false),
    StructField("s_present", LongType, nullable = false)))
  override def prettyName: String = "graft_reg_summary"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    var n = 0L
    var s = 0L
    var i = 0
    while (i < b.length) {
      val mj = b(i)
      if (mj != 0) { n += 1L; s += 1L << (shift - mj) }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      java.lang.Long.valueOf(n), java.lang.Long.valueOf(s)))
  }

  override protected def withNewChildInternal(newChild: Expression): RegSummaryExpr =
    copy(child = newChild)
}

/** Register-wise (bytewise) MAX aggregate over fixed-width blobs — the
  * HyperBall merge. Map-side combinable (ObjectHashAggregate): each
  * partition reduces its fan-in to ONE blob per node before the
  * exchange, so per-hop shuffle volume is bounded by ~(blob+key)·V per
  * partition whatever the edge count — the published HyperBall memory
  * argument, kept intact through Spark's agg machinery. Buffer is the
  * blob itself; blobs of unequal width refuse loudly (a geometry mix-up
  * must never silently truncate). */
case class RegMaxAgg(child: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${t.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_reg_max"

  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def maxInto(buf: Array[Byte], in: Array[Byte]): Array[Byte] =
    if (in == null || in.length == 0) buf
    else if (buf.length == 0) in.clone()
    else {
      require(buf.length == in.length,
        s"register blob width mismatch: ${buf.length} vs ${in.length}")
      var i = 0
      while (i < in.length) {
        if (in(i) > buf(i)) buf(i) = in(i)
        i += 1
      }
      buf
    }

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buffer else maxInto(buffer, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    maxInto(buffer, other)

  override def eval(buffer: Array[Byte]): Any =
    if (buffer.length == 0) null else buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): RegMaxAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): RegMaxAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RegMaxAgg =
    copy(child = newChildren(0))
}
