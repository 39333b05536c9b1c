package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.syntax._

/** Batch time-series operators over the `events` table; these batch
  * forms are the oracle-checkable semantics (streaming variants, when
  * added, share the same aggregation logic via readStream).
  *
  * Timestamps: the parquet stores nanosecond timestamps; Spark truncates
  * to microseconds on read and DuckDB keeps ns — so every output here is
  * coarsened (hour buckets / epoch millis) where both engines agree.
  */
object Events {

  /** Tumbling-window aggregate: events per (hour, type) + value sum.
    * Epoch seconds (bigint) as the window key — timezone-proof. */
  def hourlyAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        unix_timestamp(date_trunc("hour", $"ts")).as("hour_ts"),
        $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))

  /** Sessionization (30-min inactivity gap) via lag + running flag-sum.
    * Two window passes over the same (user_id, ts) partitioning — Spark
    * reuses the single exchange+sort for both. At 100 TB the user_id
    * hash partitioning is exactly the layout a cluster wants. */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(s, dir)
      .select($"user_id", $"event_id", $"ts")
      .withColumn("prev_ms", lag(unix_millis($"ts"), 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ms".isNull || unix_millis($"ts") - $"prev_ms" > 1800000L, 1L)
          .otherwise(0L))
      .groupBy($"user_id")
      .agg(sum($"new_session").as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** Top event-type per user by count (groupBy + window rank). */
  def topTypePerUser(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(s, dir)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"user_id").orderBy($"n".desc, $"event_type".asc)
    counts.withColumn("rnk", row_number().over(w))
      .filter($"rnk" === 1)
      .select($"user_id", $"event_type", $"n")
  }

  /** Daily aggregate THROUGH the hive-partitioned events layout
    * ([[graft.sources.Layout.eventsByDate]]): the date-range predicate
    * lands in the scan's PartitionFilters — only the 7 matching day
    * directories are listed and read, the other 23 never open. This is
    * the partition-pruning contract that keeps a year-scale events table
    * queryable at 100 TB (PlanSpec asserts the pruned scan shape). */
  def partitionedDaily(s: SparkSession, dir: String): DataFrame =
    graft.sources.Layout.eventsByDate(s, dir)
      .filter($"event_date".between(
        lit("2024-01-08").cast("date"), lit("2024-01-14").cast("date")))
      .groupBy($"event_date", $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .select(
        date_format($"event_date", "yyyy-MM-dd").as("event_date"),
        $"event_type", $"n", $"sum_value")

  /** JSON prop extraction (the `props` column is a JSON object). */
  def propsExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        $"event_type",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(
        count($"k").as("n_with_k"),
        round(avg($"k"), 4).as("avg_k"))
}
