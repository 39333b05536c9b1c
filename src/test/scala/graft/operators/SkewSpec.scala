package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import graft.functions.Functions
import org.apache.spark.sql.functions._

/** Salting rewrites must be pure performance moves: same results. */
class SkewSpec extends SparkSpec {

  test("saltedAgg equals the plain aggregate") {
    val li = Tables.lineitem(spark, Sf)
    val salted = Skew.saltedAgg(li, col("l_returnflag"), col("l_quantity"))
      .select(col("key"), col("n"), round(col("sum_value"), 2).as("s"))
      .collect().map(_.toSeq).toSet
    val plain = li.groupBy(col("l_returnflag").as("key"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("s"))
      .collect().map(_.toSeq).toSet
    assert(salted === plain)
  }

  test("saltedJoin equals the plain inner join (row multiset)") {
    val orders = Tables.orders(spark, Sf)
    val cust = Tables.customer(spark, Sf)
    val salted = Skew.saltedJoin(orders, cust, "o_custkey", "c_custkey")
      .select("o_orderkey", "c_custkey")
    val plain = orders.join(cust, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("native kernels are callable from the SQL entry path") {
    Functions.register(spark)
    val r = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r === 11.0)
    val j = spark.sql(
      "SELECT graft_sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j")
      .collect()(0).getDouble(0)
    assert(j === 0.5)
    val h = spark.sql("SELECT graft_hash60('abc') AS h").collect()(0).getLong(0)
    assert(h === 648541476951500027L) // matches DuckDB's hex-parse value
    assert(spark.sql("SELECT graft_simhash(array(7L, 7L, 7L)) AS s")
      .collect()(0).getLong(0) === 7L)
    val c = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .collect()(0).getDouble(0)
    assert(c === 1.0)
    // srp band over a 64-dim constant vector agrees with the column API
    val vSql = (1 to 64).map(i => s"${i / 64.0}d").mkString("array(", ", ", ")")
    val sqlBits = spark.sql(s"SELECT graft_srp_band($vSql, 0, 8) AS b")
      .collect()(0).getLong(0)
    val colBits = spark.range(1)
      .select(graft.functions.VectorOps.srpSignature(
        org.apache.spark.sql.functions.expr(vSql), 8).as("b"))
      .collect()(0).getLong(0)
    assert(sqlBits === colBits)
  }
}
