package devcheck
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Emits plans/r17/<query>_<suffix>.txt — explain("formatted") for every
  * query touched in the round-17 optimization pass. Run once against the
  * round-16 classes (suffix "before") and once against HEAD ("after").
  * args: <suffix> [dataDir] [csvQueryList]
  */
object PlansR17 {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val outDir = Paths.get("/root/repo/plans/r17")
    Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = Seq(
      "dedup_lsh_tuning", "graph_random_walks", "graph_pagerank", "graph_ppr",
      "graph_eigencentrality", "graph_hits", "graph_kcore", "graph_coreness",
      "graph_label_propagation", "graph_betweenness", "graph_modularity",
      "dedup_clusters", "mm_phash_clusters", "graph_local_clustering",
      "graph_triangle_sample", "graph_clustering_approx", "sim_index_roundtrip",
      "dedup_index_roundtrip", "text_model_roundtrip")
    val qs = if (args.length > 2) args(2).split(',').toSeq else all
    for (q <- qs) {
      try {
        val df = graft.SparkEntry.queries(q)(spark, dir)
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        Files.writeString(outDir.resolve(s"${q}_$suffix.txt"), txt)
        println(s"OK $q chars=${txt.length}")
      } catch {
        case e: Throwable =>
          println(s"SKIP $q: ${e.getClass.getSimpleName} " +
            String.valueOf(e.getMessage).take(120))
      }
    }
    spark.stop()
  }
}
