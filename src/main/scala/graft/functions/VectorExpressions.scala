package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen dot product over two `array<double>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * CodegenFallback — every row pays interpreted lambda dispatch per
  * element. This expression compiles to a tight Java loop inside
  * whole-stage codegen, the difference between "walks the corpus" and
  * "scans the corpus" for brute-force similarity at 100 TB. Accumulation
  * is sequential left-to-right, bit-identical to the HOF version and the
  * DuckDB oracle's mirror.
  *
  * Null handling: a null array yields null (BinaryExpression default);
  * a null ELEMENT in the scanned range yields null — matching the HOF
  * form, where x*null poisons the fold (this is what makes the
  * RewriteHofDotProduct rule result-invariant). The per-element null
  * check is SCHEMA-GATED: when both inputs are containsNull=false the
  * generated loop carries no check at all, so the dense hot path is
  * unchanged.
  */
case class DotProductExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** True when either input's schema admits null elements. */
  private lazy val mayHaveNullElements: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  })

  override def nullable: Boolean =
    left.nullable || right.nullable || mayHaveNullElements

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (mayHaveNullElements && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nullCheck =
        if (mayHaveNullElements)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Fused codegen cosine similarity: ONE loop accumulates x·y, x·x and
  * y·y (the three-DotProductExpr formulation reads both arrays three
  * times). Each accumulator is the same sequential left fold, so the
  * result is bit-identical to dot/(sqrt(dot)·sqrt(dot)) — and to the
  * DuckDB oracle's mirror of that formula.
  */
case class CosineSimExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var xy = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      xy += xv * yv; xx += xv * xv; yy += yv * yv
      i += 1
    }
    xy / (math.sqrt(xx) * math.sqrt(yy))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val xy = ctx.freshName("xy"); val xx = ctx.freshName("xx"); val yy = ctx.freshName("yy")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $xy = 0.0; double $xx = 0.0; double $yy = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i); double $yv = $b.getDouble($i);
         |  $xy += $xv * $yv; $xx += $xv * $xv; $yy += $yv * $yv;
         |}
         |${ev.value} = $xy / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

/** Fused SQ8-decode + cosine kernel over two `array<tinyint>` code
  * columns: ONE whole-stage-codegen loop decodes both sides against the
  * broadcast-in-plan affine grid (v = mn[i] + (c+128)·sc[i] — codes are
  * stored −128-shifted to fit tinyint) and accumulates x·y, x·x, y·y in
  * [[CosineSimExpr]]'s exact order, so the result is bit-identical to
  * graft_cosine over the separately-decoded vectors (and to the DuckDB
  * twin's decode-then-cosSql). Exists because the HOF formulation
  * (`transform` decode feeding CosineSimExpr) materializes two fresh
  * 64-double arrays per candidate row and falls out of whole-stage
  * codegen — measured 4-5× slower end to end on the descent rounds.
  * Grid arrays ride as IndexedSeq fields (structural equality) exposed
  * to codegen via reference objects; plan strings carry a summary, not
  * 128 doubles.
  */
case class Sq8CosineExpr(left: Expression, right: Expression,
    mnl: IndexedSeq[Double], scl: IndexedSeq[Double])
  extends BinaryExpression {

  require(mnl.nonEmpty && mnl.length == scl.length,
    "sq8 cosine: grid mins and scales must align")

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(org.apache.spark.sql.types.ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<tinyint> code inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_sq8_cosine"

  override def stringArgs: Iterator[Any] =
    Iterator(left, right, s"grid(${mnl.length} dims)")
  override def flatArguments: Iterator[Any] =
    Iterator(left, right, s"grid(${mnl.length} dims)")

  @transient private lazy val mnA: Array[Double] = mnl.toArray
  @transient private lazy val scA: Array[Double] = scl.toArray

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(math.min(x.numElements(), y.numElements()), mnA.length)
    var xy = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < n) {
      val xv = mnA(i) + (x.getByte(i) + 128.0) * scA(i)
      val yv = mnA(i) + (y.getByte(i) + 128.0) * scA(i)
      xy += xv * yv; xx += xv * xv; yy += yv * yv
      i += 1
    }
    xy / (math.sqrt(xx) * math.sqrt(yy))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("sq8mn", mnA, "double[]")
    val scRef = ctx.addReferenceObj("sq8sc", scA, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val xy = ctx.freshName("xy"); val xx = ctx.freshName("xx"); val yy = ctx.freshName("yy")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min(
         |  java.lang.Math.min($a.numElements(), $b.numElements()), $mnRef.length);
         |double $xy = 0.0; double $xx = 0.0; double $yy = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $mnRef[$i] + ($a.getByte($i) + 128.0) * $scRef[$i];
         |  double $yv = $mnRef[$i] + ($b.getByte($i) + 128.0) * $scRef[$i];
         |  $xy += $xv * $yv; $xx += $xv * $xv; $yy += $yv * $yv;
         |}
         |${ev.value} = $xy / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8CosineExpr =
    copy(left = newLeft, right = newRight)
}

/** Codegen set-Jaccard over two SORTED, DISTINCT `array<long>` columns:
  * a single merge loop counts the intersection, then
  * |A∩B| / (|A| + |B| - |A∩B|). No per-row hash-set allocation (the
  * array_intersect/array_union formulation builds two hash sets per
  * pair), which is what makes multi-million-pair LSH verification
  * scan-speed. Returns the same value as set-jaccard as long as inputs
  * are sorted sets — callers own that invariant (sort_array(
  * array_distinct(...)) at signature build time, once per document).
  */
case class SortedJaccardExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_sorted_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val inter = ctx.freshName("inter"); val u = ctx.freshName("u")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $inter++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |int $u = $nx + $ny - $inter;
         |${ev.value} = $u == 0 ? 0.0 : (double) $inter / (double) $u;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccardExpr =
    copy(left = newLeft, right = newRight)
}

/** Codegen SimHash packer: given the token-hash array (`array<long>`),
  * set output bit b iff 2·(#hashes with bit b set) >= #hashes — the
  * multiset sign rule over `nBits` low bits. One compiled loop per row
  * replaces the interpreted aggregate/zip_with chain (48 lambda
  * dispatches per token). Matches Dedup's oracle definition exactly.
  */
case class SimhashExpr(child: Expression, nBits: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${t.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(a: Any): Any = {
    val hs = a.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Long](nBits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < nBits) { counts(b) += (h >> b) & 1L; b += 1 }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < nBits) {
      if (counts(b) * 2 >= n) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val counts = ctx.freshName("counts")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val h = ctx.freshName("h"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |long[] $counts = new long[$nBits];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < $nBits; $b++) { $counts[$b] += ($h >> $b) & 1L; }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < $nBits; $b++) {
         |  if ($counts[$b] * 2 >= $n) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)
}

/** Thread-local MD5 helper for the native hash60 kernel (also called
  * from generated code — keep the FQN stable). */
object HashUtil {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit value of the first 15 hex chars of md5(s): big-endian first
    * 8 digest bytes, unsigned-shifted by one nibble. Bit-identical to
    * DuckDB's CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT). */
  def md5Hash60(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

/** Native engine-neutral 60-bit hash: md5 digest bytes straight to a
  * Long. The functions-API formulation (conv(substring(md5(c),1,15),
  * 16,10)) allocates a 32-char hex string and string-parses it back per
  * call — measured ~7us/hash, the dominant cost of every LSH signature
  * build. This kernel is one digest + integer fold (~0.5us), same value.
  */
case class Hash60Expr(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "graft_hash60"

  override protected def nullSafeEval(input: Any): Any =
    HashUtil.md5Hash60(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.md5Hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60Expr =
    copy(child = newChild)
}

/** Driver-side precomputed SRP hyperplanes.
  *
  * The hyperplane component for (bit, dim) is a pure function of the two
  * indices — `(hash60("srp#bit#dim") % 10000) / 5000 - 1`, uniform in
  * [-1, 1) — so computing it per ROW (as the original HOF formulation
  * did: the hash sat inside a zip_with lambda) burned nBits x dim md5
  * digests per vector on constants: ~512-1024 md5s/row for the IVF and
  * banded-SRP paths. Here each plane is computed ONCE on the driver
  * (via the same [[HashUtil.md5Hash60]] kernel the column expression
  * uses, so values are bit-identical) and shipped to executors inside
  * the serialized [[SrpBandExpr]] — zero per-row hashing.
  */
object SrpPlanes {
  /** Embedding dimensionality the planes are sized for. */
  val Dim = 64

  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()

  /** Hyperplane for global SRP bit `bit`: component i is
    * (hash60("srp#bit#i") % 10000) / 5000.0 - 1.0 — the exact arithmetic
    * of the per-row formulation, hoisted to the driver. */
  def plane(bit: Int): Array[Double] =
    cache.computeIfAbsent(bit, b => Array.tabulate(Dim) { i =>
      val h = HashUtil.md5Hash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"srp#$b#$i"))
      (h % 10000L).toDouble / 5000.0 - 1.0
    })

  /** Planes for bits [offset, offset + n). */
  def planes(offset: Int, n: Int): Array[Array[Double]] =
    Array.tabulate(n)(b => plane(offset + b))
}

/** Fused multi-bit SRP band kernel: packs the sign bits of `nBits`
  * hyperplane projections (global bits [offset, offset+nBits)) into one
  * Long, reading the vector once. Projections accumulate left-to-right
  * (same fold order as the HOF reference `srpBitHof`, bit-identical),
  * and bit b of the result is 1 iff projection(offset+b) >= 0 — NaN and
  * the empty-vector null-propagation case both yield 0, matching the HOF
  * `when(proj >= 0.0, 1).otherwise(0)` semantics.
  */
case class SrpBandExpr(child: Expression, offset: Int, nBits: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(offset >= 0 && nBits >= 1 && nBits <= 63,
    s"SRP band bits must satisfy 0 <= offset, 1 <= nBits <= 63; got ($offset, $nBits)")

  private lazy val planes: Array[Array[Double]] = SrpPlanes.planes(offset, nBits)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${t.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "graft_srp_band"

  /** Shared by interpreted eval and codegen (via the expression reference
    * object) so both paths are one implementation. */
  def packBits(v: ArrayData): Long = {
    // planes are sized for SrpPlanes.Dim: silently truncating a wider
    // vector would diverge from the full-length HOF reference projection,
    // so refuse it loudly (shorter vectors project over their own length,
    // exactly like zip_with against the plane)
    if (v.numElements() > SrpPlanes.Dim)
      throw new IllegalArgumentException(
        s"graft_srp_band: input vector has ${v.numElements()} dims but the " +
          s"precomputed hyperplanes cover ${SrpPlanes.Dim}; raise SrpPlanes.Dim " +
          "to the corpus dimensionality")
    val n = v.numElements()
    if (n == 0) return 0L
    var sig = 0L
    var b = 0
    while (b < nBits) {
      val p = planes(b)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * p(i); i += 1 }
      if (s >= 0.0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def nullSafeEval(a: Any): Any =
    packBits(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpBand", this, classOf[SrpBandExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.packBits($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBandExpr =
    copy(child = newChild)
}

/** Trained-BPE piece counter as ONE per-row kernel — the streaming half
  * of [[graft.operators.TextAnalysis.bpeDocPieces]]. The learned merge
  * list ([[graft.operators.TextAnalysis.bpeMerges]]' output, in rank
  * order) rides in the plan; per row: lowercase, tokenize with the
  * trainer's regex, and for each token apply every merge in rank order
  * as ONE greedy left-to-right non-overlapping pass — exactly the
  * trainer's per-round replace discipline, so a token's piece count
  * here equals `size(split(s))` of its row in the trainer's final type
  * table (for ANY token, seen in training or not; the encode rule is a
  * pure function of the merge list). Output: (n_tokens, n_pieces) per
  * document. Word-level memoization inside a row batches repeated
  * tokens (Zipf makes most tokens repeats). CodegenFallback: regex +
  * per-token list walks dominate.
  */
case class BpeCountExpr(child: Expression, merges: Seq[(String, String)])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false)))

  override def prettyName: String = "graft_bpe_count"

  private def modelSummary: String = s"merges(${merges.length})"
  override def stringArgs: Iterator[Any] = Iterator(child, modelSummary)
  override def flatArguments: Iterator[Any] = Iterator(child, modelSummary)
  override def toString: String = s"$prettyName($child, $modelSummary)"
  override lazy val hashCode: Int =
    scala.util.hashing.MurmurHash3.productHash(this)

  @transient private lazy val tokenPattern =
    java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9\\s]")
  @transient private lazy val mergesA: Array[(String, String)] = merges.toArray

  /** Piece count of one token under the merge list: code-point split
    * (NOT charAt — the batch trainer's canonical split is regex '.'
    * over CODE POINTS on both engines, so a non-BMP token must not get
    * surrogate-halved here), then one greedy pass per merge in rank
    * order (the trainer's exact application order). */
  private def pieceCount(tok: String): Long = {
    val cps = tok.codePoints().toArray
    var syms = new Array[String](cps.length)
    var i = 0
    while (i < cps.length) { syms(i) = new String(Character.toChars(cps(i))); i += 1 }
    var n = syms.length
    var m = 0
    while (m < mergesA.length && n > 1) {
      val (a, b) = mergesA(m)
      var r = 0 // read
      var w = 0 // write
      while (r < n) {
        if (r + 1 < n && syms(r) == a && syms(r + 1) == b) {
          syms(w) = a + b; r += 2
        } else {
          syms(w) = syms(r); r += 1
        }
        w += 1
      }
      n = w
      m += 1
    }
    n.toLong
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    val memo = new java.util.HashMap[String, java.lang.Long](64)
    var nTok = 0L
    var nPieces = 0L
    val m = tokenPattern.matcher(s)
    while (m.find()) {
      val t = m.group()
      var p = memo.get(t)
      if (p == null) { p = java.lang.Long.valueOf(pieceCount(t)); memo.put(t, p) }
      nTok += 1
      nPieces += p.longValue()
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](java.lang.Long.valueOf(nTok), java.lang.Long.valueOf(nPieces)))
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
}

/** Integer micro-nat Naive-Bayes scorer as ONE per-row kernel — the
  * streaming half of [[graft.operators.TextAnalysis.sourceNb]], the
  * same role [[LangIdScoreExpr]] plays for the langid batch operator.
  * The trained model (ascending class list, per-class micro-nat priors,
  * dense token → per-class micro-nat weight rows over the train
  * vocabulary) rides in the plan; scoring is: lowercase, tokenize with
  * the batch operator's exact regex, count IN-VOCAB tokens, then
  * score(c) = prior_µ(c) + Σ cnt_t · w_µ(t,c) — exact integer
  * arithmetic, so the argmax with (score desc, class asc strict-<)
  * tie-break reproduces the batch join pipeline bit for bit (weights
  * are quantized ONCE at model-build time, identically on both paths).
  * A doc with no in-vocab tokens scores priors-only, like the batch
  * completion join. CodegenFallback: per-row work is regex matching +
  * a hash-count loop; one virtual call is noise against it.
  */
case class NbScoreExpr(child: Expression,
    classes: IndexedSeq[String], priorsMicro: IndexedSeq[Long],
    weights: Map[String, IndexedSeq[Long]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(classes.nonEmpty, "nb: empty class list")
  require(classes.length == priorsMicro.length, "nb: priors misaligned")
  require(classes == classes.sorted, "nb: classes must ascend (the tie-break order)")
  require(weights.values.forall(_.length == classes.length),
    "nb: weight rows misaligned with classes")

  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("source_pred", StringType, nullable = false),
    StructField("best_score_micro", LongType, nullable = false),
    StructField("margin_micro", LongType, nullable = true)))

  override def prettyName: String = "graft_nb_score"

  // the model is V×C longs — summarize in plan strings, cache the hash
  private def modelSummary: String =
    s"model(${classes.length} classes, ${weights.size} vocab)"
  override def stringArgs: Iterator[Any] = Iterator(child, modelSummary)
  override def flatArguments: Iterator[Any] = Iterator(child, modelSummary)
  override def toString: String = s"$prettyName($child, $modelSummary)"
  override lazy val hashCode: Int =
    scala.util.hashing.MurmurHash3.productHash(this)

  @transient private lazy val tokenPattern =
    java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9\\s]")
  @transient private lazy val weightIndex: java.util.HashMap[String, Array[Long]] = {
    val hm = new java.util.HashMap[String, Array[Long]](weights.size * 2)
    weights.foreach { case (t, ws) => hm.put(t, ws.toArray) }
    hm
  }
  @transient private lazy val classNames: Array[UTF8String] =
    classes.map(UTF8String.fromString).toArray
  @transient private lazy val priorsA: Array[Long] = priorsMicro.toArray

  override protected def nullSafeEval(input: Any): Any = {
    // UTF8String.toLowerCase = the lower() the batch path applies
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    val scores = priorsA.clone()
    val m = tokenPattern.matcher(s)
    while (m.find()) {
      val w = weightIndex.get(m.group())
      if (w != null) {
        var c = 0
        while (c < scores.length) { scores(c) += w(c); c += 1 }
      }
    }
    // argmax with strict >: classes ascend, so ties keep the lower class
    var best = 0
    var c = 1
    while (c < scores.length) {
      if (scores(c) > scores(best)) best = c
      c += 1
    }
    var second = Long.MinValue
    c = 0
    while (c < scores.length) {
      if (c != best && scores(c) > second) second = scores(c)
      c += 1
    }
    val margin: Any =
      if (scores.length > 1) java.lang.Long.valueOf(scores(best) - second)
      else null
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](classNames(best), java.lang.Long.valueOf(scores(best)), margin))
  }

  override protected def withNewChildInternal(newChild: Expression): NbScoreExpr =
    copy(child = newChild)
}

/** Nearest-standing-centroid assignment as ONE per-row kernel — the
  * streaming half of [[graft.operators.Similarity.ivfAppend]]'s batch
  * assignment, the fourth instance of the stateless
  * trained-model-router pattern (after [[LangIdScoreExpr]],
  * [[NbScoreExpr]], [[BpeCountExpr]]). The persisted index's centroid
  * table (ascending bucket ids, one mean vector each — ≤2^nBits
  * entries) rides in the plan; per arriving vector the kernel computes
  * [[CosineSimExpr]]'s exact fused single-pass cosine against every
  * entry, rounds to 4 like the batch path, and takes the argmax with
  * the batch heap's TOTAL order — java.lang.Double.compare (so a NaN
  * cosine, e.g. from a zero-norm centroid or a NaN component, ranks
  * ABOVE every finite score exactly as [[TopKHeap]] ranks it) with
  * ties to the lower bucket — so stream routing is bit-identical to
  * the batch assignment on every input, degenerate vectors included.
  * CodegenFallback: per-row work is buckets × dim fused
  * multiply-adds; one virtual call is noise against it. */
case class NearestCentroidExpr(child: Expression,
    buckets: IndexedSeq[Long], cents: IndexedSeq[IndexedSeq[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(buckets.nonEmpty, "nearest-centroid: empty centroid table")
  require(buckets.length == cents.length, "nearest-centroid: table misaligned")
  require(buckets == buckets.sorted,
    "nearest-centroid: buckets must ascend (the tie-break order)")

  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("cos_sim", DoubleType, nullable = false)))

  override def prettyName: String = "graft_nearest_centroid"

  // the model is buckets × dim doubles — summarize in plan strings
  private def modelSummary: String =
    s"index(${buckets.length} centroids)"
  override def stringArgs: Iterator[Any] = Iterator(child, modelSummary)
  override def flatArguments: Iterator[Any] = Iterator(child, modelSummary)
  override def toString: String = s"$prettyName($child, $modelSummary)"
  override lazy val hashCode: Int =
    scala.util.hashing.MurmurHash3.productHash(this)

  @transient private lazy val centArrays: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val bucketArray: Array[Long] = buckets.toArray

  /** Spark Round semantics on a double (HALF_UP; NaN/Inf pass through). */
  private def round4(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var best = 0
    var bestCos = Double.NegativeInfinity
    var j = 0
    while (j < centArrays.length) {
      val c = centArrays(j)
      val n = math.min(v.numElements(), c.length)
      var xy = 0.0; var xx = 0.0; var yy = 0.0
      var i = 0
      while (i < n) {
        val xv = v.getDouble(i); val yv = c(i)
        xy += xv * yv; xx += xv * xv; yy += yv * yv
        i += 1
      }
      val cos = round4(xy / (math.sqrt(xx) * math.sqrt(yy)))
      // Double.compare, not >: the batch heap ranks by
      // java.lang.Double.compare, under which NaN sits ABOVE +Inf — so
      // a NaN cosine must WIN here too or a zero-norm centroid routes a
      // streamed vector differently than the batch assignment. Ties
      // (compare == 0, including NaN vs NaN) keep the lower bucket —
      // the heap's id-asc tie-break over ascending buckets.
      if (java.lang.Double.compare(cos, bestCos) > 0) { bestCos = cos; best = j }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](java.lang.Long.valueOf(bucketArray(best)),
        java.lang.Double.valueOf(bestCos)))
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroidExpr =
    copy(child = newChild)
}

/** PQ encode as ONE per-row kernel — the streaming half of
  * [[graft.operators.Similarity.pqEncode]], the fine-quantizer
  * companion to [[NearestCentroidExpr]]'s coarse routing: the trained
  * PQ codebook (per subspace: ascending code ids and their entry
  * vectors) rides in the plan; per arriving vector the kernel slices
  * each subspace's subvector, computes the batch path's exact d²
  * composition (⟨x,x⟩ − 2⟨x,c⟩ + ⟨c,c⟩, sequential left-to-right like
  * [[DotProductExpr]], rounded to 6) against every entry of that
  * subspace, and takes the argmin with the batch heap's (d² asc, code
  * asc) tie-break. Output: (codes array, per-subspace d² array) — the
  * stored compressed row plus its reconstruction-SSE audit trail.
  * CodegenFallback: per-row work is Σ_sub entries × subDim fused
  * multiply-adds; one virtual call is noise against it. */
case class PqEncodeExpr(child: Expression,
    subs: IndexedSeq[Int], codes: IndexedSeq[IndexedSeq[Long]],
    entries: IndexedSeq[IndexedSeq[IndexedSeq[Double]]], subDim: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(subs.nonEmpty, "pq-encode: empty codebook")
  require(subs == subs.sorted, "pq-encode: subspaces must ascend")
  // Output arrays are POSITIONAL over the subspace list: position i of
  // codes/d2s means subspace i. A codebook missing a subspace would
  // silently shrink the output and shift every later position (the
  // batch pqEncode carries an explicit `sub` column and cannot), so a
  // gap is a constructor error, never a silent misalignment.
  require(subs == subs.indices,
    s"pq-encode: subspaces must be contiguous from 0 (positional output), got $subs")
  require(subs.length == codes.length && subs.length == entries.length,
    "pq-encode: codebook misaligned")
  require(codes.zip(entries).forall { case (c, e) =>
    c.nonEmpty && c.length == e.length && c == c.sorted },
    "pq-encode: per-subspace codes must ascend (the tie-break order)")
  require(subDim >= 1, s"pq-encode: subDim must be >= 1, got $subDim")

  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("d2s", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  override def prettyName: String = "graft_pq_encode"

  private def modelSummary: String =
    s"codebook(${subs.length} subspaces, ${codes.map(_.length).sum} entries)"
  override def stringArgs: Iterator[Any] = Iterator(child, modelSummary)
  override def flatArguments: Iterator[Any] = Iterator(child, modelSummary)
  override def toString: String = s"$prettyName($child, $modelSummary)"
  override lazy val hashCode: Int =
    scala.util.hashing.MurmurHash3.productHash(this)

  @transient private lazy val codeArrays: Array[Array[Long]] =
    codes.map(_.toArray).toArray
  @transient private lazy val entryArrays: Array[Array[Array[Double]]] =
    entries.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val subArray: Array[Int] = subs.toArray

  /** Spark Round semantics on a double (HALF_UP; NaN/Inf pass through). */
  private def round6(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nV = v.numElements()
    val outCodes = new Array[Long](subArray.length)
    val outD2 = new Array[Double](subArray.length)
    var s = 0
    while (s < subArray.length) {
      val off = subArray(s) * subDim
      // the batch slice: components [off, off+subDim) of the vector,
      // truncated at the vector's own length like slice()
      val n0 = math.max(0, math.min(subDim, nV - off))
      val es = entryArrays(s)
      var best = 0
      var bestD2 = Double.PositiveInfinity
      var j = 0
      while (j < es.length) {
        val c = es(j)
        // ⟨x,x⟩, ⟨x,c⟩, ⟨c,c⟩ in three sequential accumulations — the
        // batch path composes three DotProductExpr kernels, so each
        // product's accumulation ORDER and LENGTH are mirrored exactly:
        // x·x over the slice, x·c over min(slice, entry), c·c over the
        // full entry (DotProductExpr scans min(|a|,|b|) per pair)
        var xx = 0.0; var i = 0
        while (i < n0) { val x = v.getDouble(off + i); xx += x * x; i += 1 }
        val nxc = math.min(n0, c.length)
        var xc = 0.0; i = 0
        while (i < nxc) { xc += v.getDouble(off + i) * c(i); i += 1 }
        var cc = 0.0; i = 0
        while (i < c.length) { cc += c(i) * c(i); i += 1 }
        val d2 = round6(xx - 2.0 * xc + cc)
        // The batch argmin is TopKHeap on score = −d², ranked by
        // java.lang.Double.compare — under which a NaN d² WINS the
        // argmin (−NaN is NaN, above every finite −d²). Mirror that
        // exact total order; ties (including NaN vs NaN) keep the
        // lower code — the heap's id-asc tie-break over ascending
        // codes.
        if (java.lang.Double.compare(-d2, -bestD2) > 0) { bestD2 = d2; best = j }
        j += 1
      }
      outCodes(s) = codeArrays(s)(best)
      outD2(s) = bestD2
      s += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(outCodes),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(outD2)))
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Shared O(m) code-point n-gram slicer. `substringSQL(j+1, n)` locates
  * its start by scanning from byte 0 for non-ASCII input, turning a
  * per-document gram loop into O(m²); here ONE forward pass records the
  * byte offset of every code point (advancing
  * `UTF8String.numBytesForFirstByte` per step) and each gram is a
  * byte-range slice — identical output (code-point semantics, bytewise
  * equality), linear cost on any script. */
private[functions] object Utf8Ngrams {
  import org.apache.spark.unsafe.types.UTF8String

  /** All positional n-grams of `s`; empty array when numChars < n. */
  def slices(s: UTF8String, n: Int): Array[UTF8String] = {
    val m = s.numChars()
    val cnt = m - n + 1
    if (cnt <= 0) return Array.empty
    val bytes = s.getBytes
    val offs = new Array[Int](m + 1)
    var i = 0
    var off = 0
    while (i < m) {
      offs(i) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      i += 1
    }
    offs(m) = off
    val out = new Array[UTF8String](cnt)
    var j = 0
    while (j < cnt) {
      out(j) = UTF8String.fromBytes(bytes, offs(j), offs(j + n) - offs(j))
      j += 1
    }
    out
  }
}

/** Positional character n-grams of a (pre-cleaned) string, as one
  * per-row loop. The naive HOF formulation — `transform(sequence(...),
  * j => cleaned.substr(j, n))` — re-evaluates every expression CAPTURED
  * in the lambda body per element, so the cleaning regex ran once per
  * gram instead of once per document (measured 10x slowdown on the
  * shingling pipeline). Here the cleaned string is the child (evaluated
  * once per row) and slicing is the linear [[Utf8Ngrams]] cursor walk.
  * CodegenFallback: one virtual call per row is noise; the per-element
  * regex was not.
  */
case class CharNgramsExpr(child: Expression, n: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(n >= 1, "n-gram size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def prettyName: String = "graft_char_ngrams"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Utf8Ngrams.slices(s, n).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgramsExpr =
    copy(child = newChild)
}

/** Codegen sorted-set intersection over two ascending `array<bigint>`
  * columns — the merge walk of [[SortedJaccardExpr]] emitting the common
  * ELEMENTS instead of a ratio. Built for the forward triangle algorithm
  * (Schank & Wagner, SEA 2005): the triangles through oriented edge
  * (s, t) are exactly the common out-neighbors of s and t, so the
  * census/clustering chain replaces a Θ(Σ outdeg²)-row wedge join
  * stream (308M hash probes at sf0.1) with one ~µs merge per EDGE over
  * a broadcast adjacency table. Inputs must be sorted ascending
  * (sort_array upstream); on duplicate elements the walk follows
  * multiset-merge semantics (the graph path passes sets, so this never
  * fires there).
  */
case class SortedIntersectExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def prettyName: String = "graft_sorted_intersect"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    val tmp = new Array[Long](math.min(nx, ny))
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { tmp(c) = xv; c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(tmp, c))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val c = ctx.freshName("c"); val tmp = ctx.freshName("tmp")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |long[] $tmp = new long[$nx < $ny ? $nx : $ny];
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $tmp[$c++] = $xv; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($tmp, $c));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectExpr =
    copy(left = newLeft, right = newRight)
}

/** Cavnar–Trenkle language scorer as ONE per-row kernel (SDAIR 1994):
  * trigram-count the lowercased input, rank its top `docK` grams by
  * (count desc, gram asc bytewise), and score every language profile
  * by out-of-place distance Σ |doc_rank − lang_rank| with penalty
  * `profK` for absent grams. Returns
  * struct<lang_pred:string, best_dist:bigint, margin:bigint> —
  * 'und' with null dist/margin when the input has no trigrams.
  *
  * The trained model (lang → gram → rank) rides IN the expression as a
  * literal — built once on the driver from the O(|langs|·profK)-row
  * profile and shipped with the serialized plan, so scoring is a
  * stateless per-row projection: no join, no aggregation, no shuffle.
  * That is what the STREAMING router needs — per-document scoring
  * inside a micro-batch with no watermark or state — while the batch
  * operator keeps the exchange-based form whose structure the DuckDB
  * twin mirrors. Tie-breaks are bit-compatible with the batch path:
  * UTF8String comparisons are bytewise like Spark's string sort order,
  * and the argmin scans languages in ascending order with strict <.
  * CodegenFallback: the per-row work is a hash-count + small sort —
  * one virtual call per row is noise against it.
  */
case class LangIdScoreExpr(child: Expression,
    profiles: Seq[(String, Map[String, Int])], profK: Int, docK: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(profiles.nonEmpty, "langid: empty language profile set")
  require(profK >= 1 && docK >= 1, "langid: profile sizes must be >= 1")

  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("lang_pred", StringType, nullable = false),
    StructField("best_dist", LongType, nullable = true),
    StructField("margin", LongType, nullable = true)))

  override def prettyName: String = "graft_langid_score"

  // The trained model is |langs|·profK entries; the default TreeNode
  // rendering would embed ALL of it in every explain/UI/error string,
  // and the default case-class hashCode would walk it on every plan
  // transform. Summarize the model in plan text and cache the hash.
  private def modelSummary: String =
    s"model(${profiles.length} langs, profK=$profK, docK=$docK)"
  override def stringArgs: Iterator[Any] =
    Iterator(child, modelSummary)
  override def flatArguments: Iterator[Any] =
    Iterator(child, modelSummary)
  override def toString: String = s"$prettyName($child, $modelSummary)"
  override lazy val hashCode: Int =
    scala.util.hashing.MurmurHash3.productHash(this)

  // languages in ascending BYTE order — the argmin tie-break order
  @transient private lazy val langNames: Array[UTF8String] =
    profiles.map(p => UTF8String.fromString(p._1)).sortWith(_.compareTo(_) < 0).toArray
  @transient private lazy val langMaps: Array[java.util.HashMap[UTF8String, Integer]] = {
    val byName = profiles.map { case (l, m) => UTF8String.fromString(l) -> m }.toMap
    langNames.map { l =>
      val hm = new java.util.HashMap[UTF8String, Integer](byName(l).size * 2)
      byName(l).foreach { case (g, r) => hm.put(UTF8String.fromString(g), Integer.valueOf(r)) }
      hm
    }
  }
  private val und = UTF8String.fromString("und")

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase
    val m = s.numChars() - 2
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](und, null, null))
    // per-row trigram counts over the O(m) byte-cursor slices
    // (substringSQL re-scans from byte 0 per gram on non-ASCII — O(m²)
    // in this streaming hot path; see Utf8Ngrams)
    val grams = Utf8Ngrams.slices(s, 3)
    val counts = new java.util.HashMap[UTF8String, Array[Int]](math.min(m, 256))
    var j = 0
    while (j < grams.length) {
      val g = grams(j)
      val c = counts.get(g)
      if (c == null) counts.put(g, Array(1)) else c(0) += 1
      j += 1
    }
    // top docK by (count desc, gram asc bytewise)
    val entries = new Array[(UTF8String, Int)](counts.size)
    val it = counts.entrySet().iterator()
    var n = 0
    while (it.hasNext) { val e = it.next(); entries(n) = (e.getKey, e.getValue()(0)); n += 1 }
    java.util.Arrays.sort(entries, new java.util.Comparator[(UTF8String, Int)] {
      def compare(a: (UTF8String, Int), b: (UTF8String, Int)): Int = {
        val c = Integer.compare(b._2, a._2)
        if (c != 0) c else a._1.compareTo(b._1)
      }
    })
    val k = math.min(docK, n)
    // out-of-place distance per language; langs ascend, strict < keeps
    // the (dist asc, lang asc) tie-break
    var bestD = Long.MaxValue; var secondD = Long.MaxValue
    var bestL: UTF8String = null
    var li = 0
    while (li < langNames.length) {
      val hm = langMaps(li)
      var d = 0L; var r = 0
      while (r < k) {
        val lr = hm.get(entries(r)._1)
        d += (if (lr == null) profK.toLong else math.abs(r + 1 - lr.intValue()).toLong)
        r += 1
      }
      if (d < bestD) { secondD = bestD; bestD = d; bestL = langNames(li) }
      else if (d < secondD) secondD = d
      li += 1
    }
    val margin: Any = if (langNames.length > 1) java.lang.Long.valueOf(secondD - bestD) else null
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestL, java.lang.Long.valueOf(bestD), margin))
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdScoreExpr =
    copy(child = newChild)
}
