package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import scala.util.Random

/** Property tests for the native kernels — expression-level checks
  * against straightforward Scala reference implementations over seeded
  * random inputs (the interpreted nullSafeEval path; codegen parity with
  * it is Spark's contract and is additionally exercised by the
  * DataFrame-level suites).
  */
class KernelPropertySpec extends AnyFunSuite {

  private val Trials = 300

  private def arr(xs: Seq[Long]) = new GenericArrayData(xs.toArray)
  private def litL(xs: Seq[Long]) = Literal(arr(xs), ArrayType(LongType))
  private def litD(xs: Seq[Double]) =
    Literal(new GenericArrayData(xs.toArray), ArrayType(DoubleType))

  test("SortedJaccardExpr equals set-jaccard on random long sets") {
    val rnd = new Random(42)
    for (_ <- 1 to Trials) {
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextLong() % 100).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextLong() % 100).distinct.sorted
      val expected =
        if (a.isEmpty && b.isEmpty) 0.0
        else a.toSet.intersect(b.toSet).size.toDouble / a.toSet.union(b.toSet).size.toDouble
      val got = SortedJaccardExpr(litL(a), litL(b)).eval(null).asInstanceOf[Double]
      assert(math.abs(got - expected) < 1e-15, s"a=$a b=$b")
    }
  }

  test("DotProductExpr equals the left-fold sum on random vectors") {
    val rnd = new Random(43)
    for (_ <- 1 to Trials) {
      val n = rnd.nextInt(65)
      val a = Seq.fill(n)(rnd.nextDouble() * 20 - 10)
      val b = Seq.fill(n)(rnd.nextDouble() * 20 - 10)
      val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      val got = DotProductExpr(litD(a), litD(b)).eval(null).asInstanceOf[Double]
      assert(got === expected, s"n=$n") // same order => bit-identical
    }
  }

  test("DotProductExpr null-propagates on null elements when schema admits them") {
    val withNulls = Literal(
      new GenericArrayData(Array[Any](1.0, null, 3.0)),
      ArrayType(DoubleType, containsNull = true))
    val dense = Literal(
      new GenericArrayData(Array[Any](1.0, 2.0, 3.0)),
      ArrayType(DoubleType, containsNull = true))
    assert(DotProductExpr(withNulls, dense).eval(null) === null)
    assert(DotProductExpr(dense, dense).eval(null) === 14.0)
  }

  test("CosineSimExpr is bit-identical to the three-pass dot/norm form") {
    val rnd = new Random(47)
    for (_ <- 1 to Trials) {
      val n = 1 + rnd.nextInt(64)
      val a = Seq.fill(n)(rnd.nextDouble() * 4 - 2)
      val b = Seq.fill(n)(rnd.nextDouble() * 4 - 2)
      def fold(f: (Double, Double) => Double) =
        a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + f(x, y) }
      val expected = fold(_ * _) /
        (math.sqrt(a.zip(a).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }) *
          math.sqrt(b.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }))
      val got = CosineSimExpr(litD(a), litD(b)).eval(null).asInstanceOf[Double]
      assert(got === expected, s"n=$n")
    }
  }

  test("SimhashExpr matches the sign rule on random hash multisets") {
    val rnd = new Random(44)
    for (_ <- 1 to Trials) {
      val hs = Seq.fill(rnd.nextInt(50))(rnd.nextLong().abs % (1L << 48))
      val n = hs.size
      val expected = (0 until 48).map { b =>
        val set = hs.count(h => ((h >> b) & 1L) == 1L)
        if (2L * set >= n) 1L << b else 0L
      }.sum
      val got = SimhashExpr(litL(hs), 48).eval(null).asInstanceOf[Long]
      assert(got === expected, s"hs=$hs")
    }
  }

  test("Hash60Expr equals the hex-parse reference on random strings") {
    val rnd = new Random(46)
    for (_ <- 1 to Trials) {
      val s = Random.alphanumeric.take(rnd.nextInt(30)).mkString + "é∆" * rnd.nextInt(2)
      val got = Hash60Expr(Literal(UTF8String.fromString(s), StringType))
        .eval(null).asInstanceOf[Long]
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val expected = java.lang.Long.parseLong(hex.take(15), 16)
      assert(got === expected, s"s=$s")
    }
  }

  test("SrpPlanes components equal the per-row hash formula they hoist") {
    val md = java.security.MessageDigest.getInstance("MD5")
    for (bit <- Seq(0, 3, 7, 15); i <- 0 until SrpPlanes.Dim) {
      val hex = md.digest(s"srp#$bit#$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.take(15), 16)
      val expected = (h % 10000L).toDouble / 5000.0 - 1.0
      assert(SrpPlanes.plane(bit)(i) === expected, s"bit=$bit i=$i")
    }
  }

  test("SrpBandExpr packs the sign bits of the left-fold projections") {
    val rnd = new Random(48)
    for (_ <- 1 to Trials) {
      val v = Seq.fill(64)(rnd.nextDouble() * 2 - 1)
      val offset = rnd.nextInt(12)
      val nBits = 1 + rnd.nextInt(16)
      val expected = (0 until nBits).map { b =>
        val p = SrpPlanes.plane(offset + b)
        val proj = v.indices.foldLeft(0.0)((acc, i) => acc + v(i) * p(i))
        if (proj >= 0.0) 1L << b else 0L
      }.sum
      val got = SrpBandExpr(litD(v), offset, nBits).eval(null).asInstanceOf[Long]
      assert(got === expected, s"offset=$offset nBits=$nBits")
    }
  }

  test("SrpBandExpr: empty vector yields signature 0 (HOF null-propagation twin)") {
    assert(SrpBandExpr(litD(Seq.empty), 0, 8).eval(null).asInstanceOf[Long] === 0L)
  }

  test("TopKHeap retains exactly the k best under (score desc, id asc)") {
    val rnd = new Random(49)
    for (_ <- 1 to Trials) {
      val k = 1 + rnd.nextInt(8)
      // duplicate scores on purpose: ties must break by id asc
      val xs = Seq.fill(40)((rnd.nextInt(10) / 4.0, rnd.nextLong().abs % 1000))
        .distinctBy(_._2)
      val h = new TopKHeap(k)
      xs.foreach { case (s, i) => h.add(s, i) }
      val expected = xs.sortBy { case (s, i) => (-s, i) }.take(k)
      assert(h.sortedDesc === expected, s"k=$k")
    }
  }

  test("TopKHeap merge equals single-pass add") {
    val rnd = new Random(50)
    for (_ <- 1 to Trials) {
      val xs = Seq.fill(60)((rnd.nextDouble(), rnd.nextLong().abs % 10000)).distinctBy(_._2)
      val (a, b) = xs.splitAt(xs.size / 2)
      val ha = new TopKHeap(10); a.foreach { case (s, i) => ha.add(s, i) }
      val hb = new TopKHeap(10); b.foreach { case (s, i) => hb.add(s, i) }
      hb.q.foreach { case (s, i) => ha.add(s, i) }
      val whole = new TopKHeap(10); xs.foreach { case (s, i) => whole.add(s, i) }
      assert(ha.sortedDesc === whole.sortedDesc)
    }
  }

  test("CharNgramsExpr yields every positional n-gram, in order") {
    val rnd = new Random(45)
    for (_ <- 1 to Trials) {
      val s = Random.alphanumeric.take(rnd.nextInt(40)).mkString.toLowerCase
      val n = 1 + rnd.nextInt(6)
      val e = CharNgramsExpr(Literal(UTF8String.fromString(s), StringType), n)
      val got = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(StringType).map(_.toString).toSeq
      val expected = if (s.length < n) Seq.empty else s.sliding(n).toSeq
      assert(got === expected, s"s=$s n=$n")
    }
  }

  test("Sq8CosineExpr equals CosineSimExpr over the separately-decoded " +
    "vectors, bit for bit (random grids and codes, degenerate dims)") {
    import org.apache.spark.sql.types.ByteType
    val rnd = new Random(47)
    for (_ <- 1 to Trials) {
      val dims = 1 + rnd.nextInt(64)
      val mnl = IndexedSeq.fill(dims)(rnd.nextDouble() * 4 - 2)
      // include degenerate dimensions (scale 0 → decodes to the min)
      val scl = IndexedSeq.fill(dims)(
        if (rnd.nextInt(8) == 0) 0.0 else rnd.nextDouble() / 64)
      def codes() = Array.fill(dims)((rnd.nextInt(256) - 128).toByte)
      val ca = codes(); val cb = codes()
      def decode(c: Array[Byte]): Seq[Double] =
        c.indices.map(i => mnl(i) + (c(i) + 128.0) * scl(i))
      val fused = Sq8CosineExpr(
        Literal(new GenericArrayData(ca.map(x => x: Any)), ArrayType(ByteType)),
        Literal(new GenericArrayData(cb.map(x => x: Any)), ArrayType(ByteType)),
        mnl, scl).eval(null).asInstanceOf[Double]
      val ref = CosineSimExpr(litD(decode(ca)), litD(decode(cb)))
        .eval(null).asInstanceOf[Double]
      assert(java.lang.Double.compare(fused, ref) === 0,
        s"fused $fused != decode-then-cosine $ref (dims=$dims)")
    }
  }

  test("CharNgramsExpr n-grams are CODE-POINT windows on multi-byte " +
    "input (the O(m) byte-cursor walk matches a code-point mirror)") {
    val rnd = new Random(46)
    // 1-byte ASCII, 2-byte Latin, 3-byte CJK, 4-byte astral — every
    // UTF-8 width class the cursor must advance over
    val alphabet = "ab éü中文日本語𝕏😀".toCharArray // includes surrogate pairs
    val cps = new String(alphabet).codePoints().toArray
    for (_ <- 1 to Trials) {
      val len = rnd.nextInt(30)
      val s = new String((0 until len).flatMap(_ =>
        Character.toChars(cps(rnd.nextInt(cps.length)))).toArray)
      val n = 1 + rnd.nextInt(4)
      val e = CharNgramsExpr(Literal(UTF8String.fromString(s), StringType), n)
      val got = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(StringType).map(_.toString).toSeq
      val scps = s.codePoints().toArray
      val expected =
        if (scps.length < n) Seq.empty
        else (0 to scps.length - n).map(i =>
          new String(scps, i, n))
      assert(got === expected, s"s=$s n=$n")
    }
  }
}
