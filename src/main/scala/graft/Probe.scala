package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: time individual SparkEntry queries against any
  * sf dir (optionally the 10x scaled corpus), with repeats and optional
  * formatted explain. Not part of the driver contract — a tool for the
  * perf loop ("measure, don't guess").
  *
  * Usage: runMain graft.Probe <sfDir|scale10:sfDir> q1 [q2 ...] [--explain] [--reps N]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val explain = args.contains("--explain")
    val repsIdx = args.indexOf("--reps")
    val reps = if (repsIdx >= 0 && repsIdx + 1 < args.length) args(repsIdx + 1).toInt else 2
    // drop exactly the --reps flag and its value token, not anything
    // string-equal to the value (e.g. `Probe dir q1 2 --reps 2`)
    val pos = args.zipWithIndex.collect {
      case (a, i) if (repsIdx < 0 || (i != repsIdx && i != repsIdx + 1)) &&
        !a.startsWith("--") => a
    }
    val dirSpec = pos.head
    val names = pos.tail.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir =
      if (dirSpec.startsWith("scale10:")) {
        val base = dirSpec.stripPrefix("scale10:")
        val target = "/root/repo/target/graft-scale10-" + new java.io.File(base).getName
        graft.sources.ScaledCorpus.ensure(spark, base, target, 10)
        target
      } else dirSpec
    // warm
    names.headOption.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (explain) fn(spark, dir).explain("formatted")
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val cnt = fn(spark, dir).count()
        println(f"PROBE $n%-28s rep$r rows=$cnt%-9d ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
