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

  /** AS-OF JOIN: for each `leftType` event, the most recent `rightType`
    * event of the same user at-or-before it — the canonical time-series
    * enrichment (trade←quote, click←view) that Spark has no native
    * operator for. A naive range join explodes to |L|x|R| per user; the
    * scalable composition is UNION-AND-CARRY: tag both streams, sort
    * within user by (ms, side right-first), and carry the last seen
    * right row forward with last(ignoreNulls) over a running window —
    * ONE exchange + sort on user_id, linear in |L|+|R|, the same
    * partitioning every other per-user operator here shuffles on.
    * Equal-ms ties on the right resolve to max(value) — not by a
    * pre-aggregation (that would be a second shuffle on (user, ms)) but
    * by the window SORT KEY: ascending value among same-ms right rows
    * means the carried "last" is the max, deterministically, matching
    * the oracle's grouped ASOF twin with zero extra exchanges.
    * Timestamps compare at epoch-ms (both engines floor identically). */
  def asofJoin(s: SparkSession, dir: String,
               leftType: String = "click", rightType: String = "view"): DataFrame = {
    val ev = Tables.events(s, dir)
      .select($"event_id", $"user_id", $"event_type", $"value",
        unix_millis($"ts").as("ms"))
    val left = ev.filter($"event_type" === leftType)
    val right = ev.filter($"event_type" === rightType)
    val tagged = left.select(
        $"user_id", $"ms", lit(1).as("side"), $"event_id",
        lit(null).cast("double").as("r_value"), lit(null).cast("long").as("r_ms"))
      .unionAll(right.select(
        $"user_id", $"ms", lit(0).as("side"), lit(null).cast("long").as("event_id"),
        $"value".as("r_value"), $"ms".as("r_ms")))
    // right (side 0) sorts before left (side 1) at equal ms: "at or
    // before"; r_value asc makes the carried last-of-equal-ms the max
    val w = Window.partitionBy($"user_id")
      .orderBy($"ms".asc, $"side".asc, $"r_value".asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("view_ms", last($"r_ms", ignoreNulls = true).over(w))
      .withColumn("view_value", last($"r_value", ignoreNulls = true).over(w))
      .filter($"side" === 1 && $"view_ms".isNotNull)
      .select($"user_id", $"event_id", $"ms",
        $"view_ms", round($"view_value", 2).as("view_value"))
  }

  /** RANGE JOIN via TIME-BUCKETING: for each `leftType` event, count the
    * `rightType` events of the same user in the preceding `windowMs`
    * window. Spark plans a raw `r.ms BETWEEN l.ms-w AND l.ms` predicate
    * as a nested-loop/cartesian per user — quadratic. Bucketing both
    * sides by the window length makes it an EQUI join: any right row in
    * [l.ms - w, l.ms) lives in the left row's bucket or the one before,
    * so the left side probes exactly 2 buckets (explode on the small
    * per-row literal array) and the join key is (user_id, bucket) — a
    * plain shuffle hash join, linear in |L|+|R|, with the exact range
    * re-checked on the equi-matched candidates. PlanSpec asserts no
    * nested-loop/cartesian survives. */
  def rangeJoinPriorCounts(s: SparkSession, dir: String,
                           leftType: String = "error", rightType: String = "click",
                           windowMs: Long = 300000L): DataFrame = {
    val ev = Tables.events(s, dir)
      .select($"event_id", $"user_id", $"event_type", unix_millis($"ts").as("ms"))
    val left = ev.filter($"event_type" === leftType)
      .withColumn("probe_bucket",
        explode(array(($"ms" / windowMs).cast("long") - 1, ($"ms" / windowMs).cast("long"))))
    val right = ev.filter($"event_type" === rightType)
      .select($"user_id".as("r_user"), ($"ms" / windowMs).cast("long").as("r_bucket"),
        $"ms".as("r_ms"))
    left.join(right,
        $"user_id" === $"r_user" && $"probe_bucket" === $"r_bucket" &&
          $"r_ms" >= $"ms" - windowMs && $"r_ms" < $"ms")
      .groupBy($"user_id", $"event_id", $"ms")
      .agg(count(lit(1)).as("n_prior"))
  }

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
