package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** SQL-entry registration of the library's native expressions. After
  * `Functions.register(spark)`, `spark.sql` queries can call:
  *
  *   graft_dot(a, b) — codegen dot product over array<double>
  *
  * Registration is session-scoped (temp functions) — nothing global, and
  * harness-built sessions that never call register are unaffected.
  */
object Functions {
  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      "graft_dot",
      args => DotProductExpr(args(0), args(1)))
  }
}
