package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns. The hot kernel (dot) is a
  * native codegen Expression ([[DotProductExpr]]) — a tight Java loop in
  * whole-stage codegen; the SRP projection stays a higher-order function
  * (it runs once per vector at index time, not in the scoring loop). Sums
  * run sequentially left-to-right, matching DuckDB's list_* kernels, so
  * oracle results agree to the last ULP (outputs are still rounded
  * defensively).
  */
object VectorOps {

  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      DotProductExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))

  /** Higher-order-function dot (CodegenFallback) — kept as the reference
    * implementation; tests assert it agrees with the codegen kernel. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Fused single-pass kernel; bit-identical to dot/(norm·norm) —
    * asserted in KernelPropertySpec. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      CosineSimExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))

  /** Three-pass reference formulation (tests compare against it). */
  def cosineRef(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Signed random-projection bit (HOF REFERENCE formulation): sign of
    * <v, h_seed> where h_seed is a deterministic pseudo-random hyperplane
    * derived from (seed, dim idx) via the engine-neutral hash. Components
    * are uniform in [-1, 1): (hash60("srp#seed#i") % 10000) / 5000 - 1.
    * This form recomputes the CONSTANT hyperplane per row (nBits x dim
    * md5s/vector) — kept only as the semantic spec the fused kernel is
    * tested against; production paths use [[srpSignatureSlice]]. */
  def srpBitHof(v: Column, seed: Int): Column = {
    val proj = aggregate(
      zip_with(
        v,
        sequence(lit(0), size(v) - 1),
        (x, i) =>
          x * ((EngineNeutral.hash60(concat(lit(s"srp#$seed#"), i.cast("string"))) % 10000L)
            .cast("double") / 5000.0 - 1.0)),
      lit(0.0), (acc, x) => acc + x)
    when(proj >= 0.0, 1L).otherwise(0L)
  }

  /** HOF reference for a packed band — tests assert the kernel matches. */
  def srpSignatureSliceHof(v: Column, offset: Int, nBits: Int): Column =
    (0 until nBits).map(b => shiftleft(srpBitHof(v, offset + b), b)).reduce(_ + _)

  /** nBits-bit SRP signature as a Long — fused kernel over driver-side
    * precomputed hyperplanes ([[SrpPlanes]]): one pass over the vector,
    * zero per-row hashing. */
  def srpSignature(v: Column, nBits: Int): Column =
    srpSignatureSlice(v, 0, nBits)

  /** A band of the SRP signature: bits [offset, offset+nBits) packed into
    * a Long. Seeds are global bit indices, so band b of a (bands x bits)
    * scheme reuses the same hyperplanes as a flat signature would. */
  def srpSignatureSlice(v: Column, offset: Int, nBits: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      SrpBandExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(v), offset, nBits))
}
