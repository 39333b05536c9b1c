package graft.plans

import graft.SparkSpec
import graft.functions.VectorOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The session extension must rewrite user-written HOF dot products to
  * the native kernel without changing results. */
class ExtensionsSpec extends SparkSpec {

  test("optimizer rule rewrites aggregate(zip_with(*)) to graft_dot") {
    // a second session over the same SparkContext, with extensions
    val base = spark // force shared-session init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val extSpark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    try {
      val e = extSpark.read.parquet(s"$Sf/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val hof = e.select(col("vec_id"),
        VectorOps.dotHof(col("v"), col("v")).as("d"))
      val optimized = hof.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_dot"),
        s"HOF dot not rewritten:\n$optimized")
      // results identical to the explicit kernel
      val kernel = e.select(col("vec_id"), VectorOps.dot(col("v"), col("v")).as("d"))
      assert(hof.exceptAll(kernel).isEmpty && kernel.exceptAll(hof).isEmpty)
      // rewrite invariance on RAGGED arrays: HOF yields null (zip_with
      // pads with nulls); the rewritten form must agree, not min-length-dot
      val ragged = extSpark.sql(
        """SELECT aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE),
          |  (acc, v) -> acc + v) AS d
          |FROM VALUES (array(1.0d, 2.0d), array(3.0d)),
          |            (array(1.0d, 2.0d), array(3.0d, 4.0d)) AS t(a, b)""".stripMargin)
      // (constant folding may pre-evaluate the literal inputs into a
      // LocalRelation — the VALUES here check result semantics, not plan text)
      val vals = ragged.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
      assert(vals.toSet === Set(null, 11.0))
      // sanity: without extensions the HOF form stays interpreted
      val plain = base.read.parquet(s"$Sf/embeddings.parquet")
        .select(VectorOps.dotHof(col("embedding").cast("array<double>"),
          col("embedding").cast("array<double>")).as("d"))
      assert(!plain.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
