package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver runs this at sf0.1 per round → BENCH_r{N}.json.
  *
  * Headline set: the queries whose shape dominates a 100 TB deployment —
  * the fact⋈fact star join, wide aggregation, window rank, LSH dedup
  * (minhash + simhash), set-similarity join, sessionization, and ANN
  * top-k. Each is timed via count() (full pipeline execution, no
  * collect-to-driver of result data).
  */
object Bench {

  /** Headline queries (subset of SparkEntry.queries keys). */
  val headline: Seq[String] = Seq(
    "rel_pricing_summary",
    "rel_left_join_agg",
    "rel_window_top_per_key",
    "rel_cte_top_segments",
    "rel_star_join_revenue",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "text_quality_score",
    "events_sessionize",
    "events_hourly_agg",
    "sim_brute_force_topk",
    "mm_meta_stats")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warm-up on the smallest SF so headline timings measure
    // the plan, not first-query class loading.
    SparkEntry.queries("rel_pricing_summary")(spark, "/root/testdata/sf0.001").count()
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
