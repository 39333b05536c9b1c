package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** SQL-entry registration of the library's native expressions. After
  * `Functions.register(spark)`, `spark.sql` queries can call:
  *
  *   graft_dot(a, b)            — codegen dot product over array<double>
  *   graft_sorted_jaccard(a, b) — set Jaccard over sorted array<bigint>
  *   graft_sorted_intersect(a, b) — common elements of sorted array<bigint>
  *   graft_simhash(hs)          — 48-bit SimHash of an array<bigint>
  *   graft_hash60(s)            — engine-neutral 60-bit md5 hash
  *   graft_cosine(a, b)         — fused one-pass cosine similarity
  *   graft_srp_band(v, off, n)  — packed SRP band bits (off/n literals)
  *
  * Registration is session-scoped (temp functions) — nothing global, and
  * harness-built sessions that never call register are unaffected.
  */
object Functions {
  def register(spark: SparkSession): Unit = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    Bridge.registerFunction(s, "graft_dot",
      args => DotProductExpr(args(0), args(1)))
    Bridge.registerFunction(s, "graft_sorted_jaccard",
      args => SortedJaccardExpr(args(0), args(1)))
    Bridge.registerFunction(s, "graft_sorted_intersect",
      args => SortedIntersectExpr(args(0), args(1)))
    Bridge.registerFunction(s, "graft_simhash",
      args => SimhashExpr(args(0), 48))
    Bridge.registerFunction(s, "graft_hash60",
      args => Hash60Expr(args(0)))
    Bridge.registerFunction(s, "graft_cosine",
      args => CosineSimExpr(args(0), args(1)))
    Bridge.registerFunction(s, "graft_srp_band", { args =>
      def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression, what: String): Int =
        e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(
            s"graft_srp_band: $what must be an integer literal")
        }
      SrpBandExpr(args(0), intLit(args(1), "offset"), intLit(args(2), "nBits"))
    })
  }
}
