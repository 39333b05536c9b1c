package graft.operators
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Emits the ONE-ROUND h-index plan of corenessFrom, before (per-row
  * rank window, reproduced verbatim from commit 155e812) and after
  * (value-grouped cumulative counts, the shipped r17 form) — the final
  * query's explain reads the last checkpoint, so the round body where
  * the optimization lives needs its own plan record.
  */
object CoreRoundPlan {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = graft.operators.Dedup.minhashLshPairs(spark, dir)
      .select($"doc_a".as("a"), $"doc_b".as("b")).localCheckpoint(true)
    val adj = e.select($"a".as("src"), $"b".as("dst"))
      .unionAll(e.select($"b".as("src"), $"a".as("dst"))).localCheckpoint(true)
    val deg = adj.groupBy($"src".as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val c = deg.select($"node", $"deg".cast("long").as("cv"))

    // BEFORE (155e812): per-row rank window over every adjacency row
    val wB = Window.partitionBy($"dst").orderBy($"nv".desc, $"src".asc)
    val roundBefore = adj.join(c.select($"node".as("src"), $"cv".as("nv")), "src")
      .withColumn("rn", row_number().over(wB))
      .groupBy($"dst")
      .agg(max(least($"rn".cast("long"), $"nv")).as("cv"))
      .select($"dst".as("node"), $"cv")

    // AFTER (r17): value-grouped counts, cumulative window over the
    // collapsed (dst, nv) frame
    val wA = Window.partitionBy($"dst").orderBy($"nv".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val roundAfter = adj.join(c.select($"node".as("src"), $"cv".as("nv")), "src")
      .groupBy($"dst", $"nv").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum($"cnt").over(wA))
      .groupBy($"dst")
      .agg(max(least($"cum", $"nv")).as("cv"))
      .select($"dst".as("node"), $"cv")

    for ((df, name) <- Seq(roundBefore -> "graph_coreness_round_before.txt",
        roundAfter -> "graph_coreness_round_after.txt")) {
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get("/root/repo/plans/r17/" + name), txt)
      println(s"WROTE $name chars=${txt.length}")
    }
    spark.stop()
  }
}
