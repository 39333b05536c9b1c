package devcheck
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
object Scaling {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfs = Seq("sf0.001" -> "/root/testdata/sf0.001", "sf0.01" -> "/root/testdata/sf0.01", "sf0.1" -> "/root/testdata/sf0.1")
    // warm up
    graft.SparkEntry.queries("rel_pricing_summary")(spark, sfs.head._2).count()
    val results = graft.Bench.headline.map { q =>
      q -> sfs.map { case (sf, dir) =>
        val fn = graft.SparkEntry.queries(q)
        val t0 = System.nanoTime()
        fn(spark, dir).queryExecution.toRdd.count()  // toRdd: no count-pruning (see Bench)
        sf -> (System.nanoTime() - t0) / 1e9
      }
    }
    val sb = new StringBuilder
    sb.append("# SCALING — headline query times across scale factors\n\n")
    sb.append("local[32], warm JVM, single run per cell (seconds). Data grows 10x per\n")
    sb.append("column; a scale-safe plan grows sublinearly-to-linearly, never worse.\n\n")
    sb.append("| query | sf0.001 | sf0.01 | sf0.1 | sf0.1/sf0.01 |\n|---|---|---|---|---|\n")
    for ((q, times) <- results) {
      val m = times.toMap
      sb.append(f"| $q | ${m("sf0.001")}%.2f | ${m("sf0.01")}%.2f | ${m("sf0.1")}%.2f | ${m("sf0.1")/m("sf0.01")}%.1fx |\n")
    }
    // preserve the hand-written sections below the table
    // explicit UTF-8: the dev-loop JVM may default to the POSIX charset,
    // which turns every em-dash in the preserved sections into U+FFFD
    val existing = new String(Files.readAllBytes(Paths.get("/root/repo/docs/SCALING.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val keepFrom = existing.indexOf("\nNotes: sub-second entries")
    sb.append(existing.substring(keepFrom))
    Files.writeString(Paths.get("/root/repo/docs/SCALING.md"), sb.toString)
    println("WROTE docs/SCALING.md chars=" + sb.length)
    spark.stop()
  }
}
