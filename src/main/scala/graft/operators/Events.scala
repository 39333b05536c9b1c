package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** 2-D range scan through the Z-ORDERED layout
    * ([[graft.sources.Layout.ensureEventsZOrdered]]): a user-band ∩
    * time-window predicate — the access pattern a 1-D layout cannot
    * localize. The answer is layout-independent (the DuckDB twin reads
    * the flat table); what the layout buys is IO: LayoutSpec asserts
    * the matching rows concentrate in a small fraction of the z-sorted
    * files, which is what parquet footer min/max pruning skips by at
    * 100 TB. */
  def zorderScan(s: SparkSession, dir: String): DataFrame =
    graft.sources.Layout.eventsZOrdered(s, dir)
      .filter($"user_id".between(100L, 130L) &&
        $"ts" >= lit("2024-01-10").cast("timestamp") &&
        $"ts" < lit("2024-01-17").cast("timestamp"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))

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
               leftType: String = "click", rightType: String = "view"): DataFrame =
    asofEnriched(s, dir, leftType, rightType)

  /** [[asofJoin]] with the full option surface exposed: `direction`
    * (backward = most recent at-or-before; forward = earliest
    * at-or-after) and an optional match `tolerance` in ms. */
  def asofEnriched(s: SparkSession, dir: String,
                   leftType: String = "click", rightType: String = "view",
                   direction: String = "backward",
                   toleranceMs: Option[Long] = None): DataFrame = {
    val ev = Tables.events(s, dir)
      .select($"event_id", $"user_id", $"event_type", $"value",
        unix_millis($"ts").as("ms"))
    val left = ev.filter($"event_type" === leftType)
      .select($"user_id", $"ms", $"event_id")
    val right = ev.filter($"event_type" === rightType)
      .select($"user_id", $"ms", $"value".as("view_value"))
    asofJoinOn(left, right, on = "user_id", timeCol = "ms",
        payload = Seq("view_value"), direction = direction,
        toleranceMs = toleranceMs)
      .select($"user_id", $"event_id", $"ms",
        $"asof_ms".as("view_ms"), round($"view_value", 2).as("view_value"))
  }

  /** Generic AS-OF JOIN core: enrich each `left` row with the payload of
    * the nearest `right` row at-or-before it (direction=backward) or
    * at-or-after it (direction=forward) on `timeCol`, matching on the
    * equality key `on`, optionally only within `toleranceMs`.
    *
    *  - `left` columns: `on`, `timeCol`, plus ANY carried columns (all
    *    preserved in the output);
    *  - `right` columns: `on`, `timeCol`, plus the `payload` columns,
    *    which land in the output under their own names, alongside
    *    `asof_<timeCol>` = the matched right row's time;
    *  - rows with no (in-tolerance) match are dropped (inner semantics);
    *  - equal-time ties: a right row AT the left row's time matches in
    *    both directions, and among several right rows at the same time
    *    the payload with the greatest struct order (field by field) wins
    *    — not via a pre-aggregation (a second shuffle on (key, time))
    *    but via the window SORT KEY, so ties stay deterministic with
    *    zero extra exchanges.
    *
    * Shape: UNION-AND-CARRY — tag both inputs, sort within `on` by
    * (time, side right-first), carry the last right payload forward with
    * last(ignoreNulls). ONE exchange + sort on `on`, linear in |L|+|R|;
    * the forward direction reuses the backward kernel on negated time. */
  def asofJoinOn(left: DataFrame, right: DataFrame,
                 on: String, timeCol: String, payload: Seq[String],
                 direction: String = "backward",
                 toleranceMs: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(payload.nonEmpty, "payload must name at least one right-side column")
    toleranceMs.foreach(t => require(t >= 0, s"tolerance must be >= 0 ms, got $t"))
    val sign = if (direction == "backward") 1L else -1L
    val lCarry = left.columns.toSeq.filterNot(c => c == on || c == timeCol)
    // Fail fast on silent output collisions: every output column name —
    // key, time, carried left columns, asof_<timeCol>, payload — must be
    // distinct, and inputs must not use the internal __-prefixed slots.
    val outNames = Seq(on, timeCol) ++ lCarry ++ Seq(s"asof_$timeCol") ++ payload
    val dupes = outNames.groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
    require(dupes.isEmpty,
      s"as-of join output columns collide: ${dupes.mkString(", ")} — " +
        s"on/timeCol/asof_$timeCol/payload/left-carried names must be pairwise distinct")
    val reserved = Set("__t", "__side", "__l", "__p", "__rt", "__mt", "__mp")
    val usedReserved = (left.columns ++ right.columns).filter(reserved).distinct
    require(usedReserved.isEmpty,
      s"as-of join inputs use reserved internal names: ${usedReserved.mkString(", ")}")
    // typed nulls for the two struct slots on the opposite side
    val lType = left.select(struct(lCarry.map(col): _*).as("__l")).schema("__l").dataType
    val pType = right.select(struct(payload.map(col): _*).as("__p")).schema("__p").dataType
    val tagged = left.select(
        col(on), (col(timeCol) * sign).as("__t"), lit(1).as("__side"),
        struct(lCarry.map(col): _*).as("__l"),
        lit(null).cast(pType).as("__p"), lit(null).cast("long").as("__rt"))
      .unionAll(right.select(
        col(on), (col(timeCol) * sign).as("__t"), lit(0).as("__side"),
        lit(null).cast(lType).as("__l"),
        struct(payload.map(col): _*).as("__p"), (col(timeCol) * sign).as("__rt")))
    // right (side 0) sorts before left (side 1) at equal time: the match
    // includes equality; __p asc makes the carried last-of-equal-time the
    // struct max (left rows carry null __p — nulls first keeps them inert)
    val w = Window.partitionBy(col(on))
      .orderBy($"__t".asc, $"__side".asc, $"__p".asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = tagged
      .withColumn("__mt", last($"__rt", ignoreNulls = true).over(w))
      .withColumn("__mp", last($"__p", ignoreNulls = true).over(w))
      .filter($"__side" === 1 && $"__mt".isNotNull)
    val inTolerance = toleranceMs
      .map(t => $"__t" - $"__mt" <= t) // t-space distance == ms distance in both directions
      .getOrElse(lit(true))
    carried.filter(inTolerance)
      .select(
        Seq(col(on), ($"__t" * sign).as(timeCol)) ++
          lCarry.map(c => col(s"__l.$c").as(c)) ++
          Seq(($"__mt" * sign).as(s"asof_$timeCol")) ++
          payload.map(p => col(s"__mp.$p").as(p)): _*)
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
    // FLOOR division (not cast-truncation toward zero): for negative
    // epoch-ms (pre-1970) truncation would break the 2-bucket cover and
    // drop matches. |ms|/windowMs << 2^52, so the double floor is exact.
    def bucketOf(ms: Column): Column = floor(ms / windowMs).cast("long")
    val left = ev.filter($"event_type" === leftType)
      .withColumn("probe_bucket",
        explode(array(bucketOf($"ms") - 1, bucketOf($"ms"))))
    val right = ev.filter($"event_type" === rightType)
      .select($"user_id".as("r_user"), bucketOf($"ms").as("r_bucket"),
        $"ms".as("r_ms"))
    left.join(right,
        $"user_id" === $"r_user" && $"probe_bucket" === $"r_bucket" &&
          $"r_ms" >= $"ms" - windowMs && $"r_ms" < $"ms")
      .groupBy($"user_id", $"event_id", $"ms")
      .agg(count(lit(1)).as("n_prior"))
  }

  /** FUNNEL: how many users progressed through `stages` IN ORDER —
    * stage k counts users with a stage-k event at-or-after their
    * earliest stage-(k-1) completion (the standard ordered-conversion
    * semantics; simultaneous events count, matching SQL `>=`).
    *
    * Shape: one filtered min-aggregate per stage, each keyed on
    * user_id — every exchange in the chain is on the SAME key, so the
    * stages co-partition (physically: one shuffle per stage input,
    * reused sort order, no fan-out joins). Per-user state is one
    * timestamp per stage — bounded regardless of event volume, the
    * property that keeps funnels cheap at 100 TB. Output: one row per
    * stage with its user count (stage 1 = users with any first-stage
    * event). */
  def funnel(s: SparkSession, dir: String,
             stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame =
    funnelFrom(
      Tables.events(s, dir)
        .select($"user_id", $"event_type", unix_millis($"ts").as("ms")),
      stages)

  /** Funnel core over any (user_id, event_type, ms) frame — split out so
    * the ordered-conversion semantics are unit-testable on hand-built
    * fixtures (a stage event strictly before the prior stage's first
    * completion must NOT count; a simultaneous one must). */
  def funnelFrom(ev: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, s"funnel needs >= 2 stages, got $stages")
    // null users can never convert (the stage joins drop them); filtering
    // up front ALSO makes stage 1's aggregate carry the same null-filter
    // the join branches get, so the subtrees canonicalize equal and reuse
    val e = ev.filter($"user_id".isNotNull)
    val first = e.filter($"event_type" === stages.head)
      .groupBy($"user_id").agg(min($"ms").as("stage_ms"))
    val reached: Seq[DataFrame] = stages.tail.scanLeft(first) { (prev, stage) =>
      e.filter($"event_type" === stage)
        .join(prev.select($"user_id", $"stage_ms".as("prev_ms")), "user_id")
        .filter($"ms" >= $"prev_ms")
        .groupBy($"user_id").agg(min($"ms").as("stage_ms"))
    }
    reached.zipWithIndex.map { case (df, i) =>
      // count(stage_ms), not count(*): stage_ms = min(ms) is non-null per
      // group so the value is identical, but keeping the column referenced
      // stops the optimizer pruning min() out of this branch's aggregate —
      // each stage's shuffle then canonicalizes equal to the SAME stage's
      // subtree inside the next stage's join and collapses to a
      // ReusedExchange: k scans for a k-stage funnel instead of 2k-1
      // (PlanSpec pins it).
      df.agg(count($"stage_ms").as("n_users"))
        .select(lit(i + 1).cast("long").as("stage"),
          lit(stages(i)).as("event_type"), $"n_users")
    }.reduce(_ union _)
  }

  /** COHORT RETENTION — the other standard conversion analytic next to
    * [[funnel]]: users grouped by the period of their FIRST activity
    * (the cohort), then each cohort's distinct active users counted at
    * every later period offset (offset 0 = the cohort's own size, the
    * retention denominator).
    *
    * Shape at 100 TB: the cohort is a min() window over the user_id
    * partition — ONE scan and one exchange (an aggregate-then-join-back
    * would scan events twice), then a distinct-count keyed on
    * (cohort, offset) whose output is tiny (periods x offsets).
    * Per-user window state is one long — never per-event. */
  def cohortRetention(s: SparkSession, dir: String,
                      periodMs: Long = 7L * 86400000L): DataFrame = {
    require(periodMs > 0, s"period must be positive, got $periodMs")
    cohortRetentionFrom(
      Tables.events(s, dir)
        .filter($"user_id".isNotNull)
        .select($"user_id",
          floor(unix_millis($"ts") / lit(periodMs.toDouble)).cast("long").as("p")))
  }

  /** Retention core over any (user_id, p) frame — unit-testable. */
  def cohortRetentionFrom(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
    ev.withColumn("cohort", min($"p").over(w))
      .groupBy($"cohort", ($"p" - $"cohort").as("offset"))
      .agg(count_distinct($"user_id").as("n_users"))
  }

  /** PATH TRANSITIONS — the first-order Markov structure of user
    * journeys: for every consecutive pair of events of the same user
    * (ordered by time), count the (from_type → to_type) transition and
    * the distinct users making it. This is the path-analysis primitive
    * behind "where do users go after X" dashboards and the input to any
    * sequence-model pretraining over event logs.
    *
    * Shape: ONE exchange+sort on user_id serves the lead() window (the
    * same partitioning every per-user operator here shuffles on), then a
    * partial-aggregated count on the (from, to) pair — the output is
    * |types|² rows however large the log. Ordering ties break on
    * (epoch-ms, event_id) — epoch-ms, not the raw timestamp, so the
    * ns-vs-µs storage difference between engines can never reorder a
    * tie. Per-user window state is one row — bounded. */
  def pathTransitions(s: SparkSession, dir: String): DataFrame =
    pathTransitionsFrom(
      Tables.events(s, dir)
        .filter($"user_id".isNotNull)
        .select($"user_id", $"event_id", $"event_type",
          unix_millis($"ts").as("ms")))

  /** Core of [[pathTransitions]] over any (user_id, event_id,
    * event_type, ms) frame — unit-testable. */
  def pathTransitionsFrom(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ms".asc, $"event_id".asc)
    ev
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
      .agg(count(lit(1)).as("n"), count_distinct($"user_id").as("n_users"))
  }

  /** TOP PATHS — the most common k-step behavioural sequences
    * ([[pathTransitions]] gives the 1-step Markov matrix; this mines
    * the actual length-k paths whose frequency the matrix only
    * approximates — a funnel DISCOVERED from data rather than declared
    * up front). Each user's event chain (ordered by the same (ms,
    * event_id) total order as every path operator here) slides a
    * length-k window; identical consecutive windows count once each;
    * the top `topN` paths by (count desc, path asc) are returned with
    * their distinct-user reach.
    *
    * Shape: ONE exchange on user_id serves the sort and both lead()s
    * (one window spec), then a partial-aggregated count on the path
    * string — the path vocabulary is |types|^k bounded, tiny next to
    * the event volume — and a TakeOrderedAndProject head. At 100 TB
    * the only data-sized step is the per-user window sort every
    * sessionization op already pays; no self-joins, no explode
    * amplification beyond one row per event. */
  def topPaths(s: SparkSession, dir: String, steps: Int = 3,
               topN: Int = 20): DataFrame = {
    require(steps >= 2 && steps <= 5, s"steps must be in [2, 5], got $steps")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val w = Window.partitionBy($"user_id").orderBy($"ms".asc, $"event_id".asc)
    val chains = Tables.events(s, dir)
      .filter($"user_id".isNotNull)
      .select($"user_id", $"event_id", $"event_type", unix_millis($"ts").as("ms"))
    val withNexts = (1 until steps).foldLeft(chains) { (df, i) =>
      df.withColumn(s"t$i", lead($"event_type", i).over(w))
    }
    val full = (1 until steps).map(i => $"t$i".isNotNull).reduce(_ && _)
    withNexts.filter(full)
      .select($"user_id",
        concat_ws(" > ", ($"event_type" +: (1 until steps).map(i => $"t$i")): _*)
          .as("path"))
      .groupBy($"path")
      .agg(count(lit(1)).as("n"), count_distinct($"user_id").as("n_users"))
      .orderBy($"n".desc, $"path".asc)
      .limit(topN)
  }

  /** SLIDING (hopping) WINDOW aggregate — the 3-hour window advancing
    * hourly: each event contributes to windowHours/hopHours overlapping
    * windows, the shape trend dashboards and rate alerts read. Uses
    * Spark's native `window()` generator (one bounded fan-out per row —
    * the same plan Structured Streaming runs, so the batch result IS
    * the streaming semantics), then one partial-aggregated exchange on
    * (window, type). Output keyed by epoch-second window start. */
  def slidingAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window($"ts", "3 hours", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .select(
        unix_timestamp($"window.start").as("window_ts"),
        $"event_type", $"n", $"sum_value")

  /** HOURLY ANOMALY Z-SCORES — the volume-spike detector an event
    * pipeline runs continuously: each (event_type, hour) count scored
    * against the TRAILING 24 hours' mean and sample stddev (strictly
    * preceding — the scored hour never contaminates its own baseline).
    * Hours whose baseline has fewer than `minBaseline` points or zero
    * variance are unscoreable and emit no row. Shape: one aggregate to
    * hour grain (the [[hourlyAgg]] shuffle — after which the data is
    * types × hours, tiny), then one window per event_type; integer
    * counts make the variance bounded away from zero, so the rounded
    * z-score is engine-stable. */
  def anomalyZscore(s: SparkSession, dir: String, minBaseline: Int = 8): DataFrame =
    anomalyZscoreFrom(
      Tables.events(s, dir)
        .groupBy(
          unix_timestamp(date_trunc("hour", $"ts")).as("hour_ts"),
          $"event_type")
        .agg(count(lit(1)).as("n")),
      minBaseline)

  /** Core of [[anomalyZscore]] over any (event_type, hour_ts, n) frame. */
  def anomalyZscoreFrom(hourly: DataFrame, minBaseline: Int): DataFrame = {
    require(minBaseline >= 2, s"need >= 2 baseline points, got $minBaseline")
    val w = Window.partitionBy($"event_type").orderBy($"hour_ts".asc)
      .rowsBetween(-24, -1)
    hourly
      .withColumn("base_n", count(lit(1)).over(w))
      .withColumn("base_avg", avg($"n").over(w))
      .withColumn("base_std", stddev_samp($"n").over(w))
      .filter($"base_n" >= minBaseline && $"base_std" > 0)
      .select($"event_type", $"hour_ts", $"n",
        round(($"n" - $"base_avg") / $"base_std", 4).as("z"))
  }

  /** RFM SEGMENTATION — the recency/frequency/monetary user rollup
    * behind lifecycle marketing and churn models. Per purchase-user:
    * days since last purchase (relative to the corpus max timestamp, so
    * the query is reproducible), purchase count, and monetary total in
    * EXACT CENTS (a double sum's partial-agg order is nondeterministic
    * in the last ulp, which could flip a boundary user's bucket —
    * integer cents cannot). Bucketing is by exact QUINTILE BOUNDARIES
    * (the percentile aggregate is a tiny 1-row frame, broadcast back) —
    * NOT a global ntile window, which would funnel every user through
    * one partition at 100 TB. Ties land in the same bucket on both
    * engines by construction (boundary comparison, no rank tiebreak).
    * Output is the segment rollup (≤125 rows). */
  def rfm(s: SparkSession, dir: String, eventType: String = "purchase"): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter($"event_type" === eventType && $"user_id".isNotNull)
      .select($"user_id", unix_millis($"ts").as("ms"),
        round($"value" * 100).cast("long").as("cents"))
    val maxMs = ev.agg(max($"ms").as("corpus_max_ms"))
    val perUser = ev.groupBy($"user_id")
      .agg(max($"ms").as("last_ms"), count(lit(1)).as("freq"),
        sum($"cents").as("cents"))
      .join(broadcast(maxMs))
      .withColumn("recency_days",
        floor(($"corpus_max_ms" - $"last_ms") / lit(86400000.0)).cast("long"))
    val bounds = perUser.agg(
      expr("percentile(recency_days, array(0.2, 0.4, 0.6, 0.8))").as("rb"),
      expr("percentile(freq, array(0.2, 0.4, 0.6, 0.8))").as("fb"),
      expr("percentile(cents, array(0.2, 0.4, 0.6, 0.8))").as("mb"))
    def bucketOf(v: Column, bs: Column): Column =
      (0 until 4).map(i => when(v > element_at(bs, i + 1), 1L).otherwise(0L))
        .reduce(_ + _) + 1L
    perUser.join(broadcast(bounds))
      .select($"user_id", $"freq", $"cents",
        // recency: LOWER days = better = higher bucket → invert
        (lit(6L) - bucketOf($"recency_days", $"rb")).as("r_bucket"),
        bucketOf($"freq", $"fb").as("f_bucket"),
        bucketOf($"cents", $"mb").as("m_bucket"))
      .groupBy($"r_bucket", $"f_bucket", $"m_bucket")
      .agg(
        count(lit(1)).as("n_users"),
        round(sum($"cents") / 100.0, 2).as("total_monetary"))
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

  /** MARKOV STATIONARY DISTRIBUTION — the long-run occupancy of the
    * user-behaviour Markov chain whose one-step matrix
    * [[pathTransitions]] counts: π ← πP power iterations with L1
    * renormalization (the [[graft.operators.Graph.eigenCentrality]]
    * discipline, applied to a row-stochastic matrix), uniform start
    * over the observed states. Where the transition report says "what
    * follows what", the stationary vector says WHERE USERS END UP
    * SPENDING THEIR TIME — the equilibrium the product's event flow
    * drives toward, and the baseline an anomaly monitor compares a
    * day's empirical mix against. The output sets stationary_p next to
    * the empirical from-share precisely so that comparison is one
    * report.
    *
    * Scale shape: the ONLY data-sized step is the per-user window the
    * transition count already pays (one exchange); everything after
    * runs on the |types|² matrix — driver-light, broadcast
    * normalizers, iterates checkpointed. Renormalization makes
    * observed-but-terminal states (rows with no outgoing mass)
    * harmless: their leak is divided back out each step.
    * Determinism: P entries and iterates round to 8; πp products round
    * to 12 and sum in DECIMAL(38,12) — partial-agg order never moves a
    * probability. */
  def markovStationary(s: SparkSession, dir: String, iters: Int = 6): DataFrame = {
    require(iters >= 1 && iters <= 12, s"iters must be in [1, 12], got $iters")
    val trans = pathTransitions(s, dir)
      .select($"from_type", $"to_type", $"n")
      .localCheckpoint(true)
    val rowTot = trans.groupBy($"from_type").agg(sum($"n").as("tot"))
    val p = trans.join(rowTot, "from_type")
      .select($"from_type", $"to_type",
        round($"n".cast("double") / $"tot", 8).as("p"))
      .localCheckpoint(true)
    val states = p.select($"from_type".as("state"))
      .unionByName(p.select($"to_type".as("state"))).distinct()
      .localCheckpoint(true)
    val nStates = states.agg(count(lit(1)).as("k"))
    var pi = states.crossJoin(broadcast(nStates))
      .select($"state", round(lit(1.0) / $"k", 8).as("pi"))
    for (_ <- 1 to iters) {
      val contrib = p.join(pi, $"from_type" === $"state")
        .select($"to_type", round($"pi" * $"p", 12).cast("decimal(38,12)").as("c"))
      val sums = contrib.groupBy($"to_type").agg(sum($"c").as("sc"))
      val tot = sums.agg(sum($"sc").as("tot"))
      pi = states.join(sums, $"state" === $"to_type", "left")
        .crossJoin(broadcast(tot))
        .select($"state",
          round(coalesce($"sc".cast("double"), lit(0.0)) /
            $"tot".cast("double"), 8).as("pi"))
        .localCheckpoint(true)
    }
    val grand = trans.agg(sum($"n").as("g"))
    states.join(pi, "state")
      .join(rowTot, $"state" === $"from_type", "left")
      .crossJoin(broadcast(grand))
      .select($"state".as("event_type"), $"pi".as("stationary_p"),
        coalesce($"tot", lit(0L)).as("n_out_transitions"),
        round(coalesce($"tot".cast("double"), lit(0.0)) /
          $"g".cast("double"), 8).as("empirical_from_share"))
  }

  /** MULTI-TOUCH ATTRIBUTION (linear model) — each conversion's value
    * split equally across the user's touch events inside the lookback
    * window, credited to the touch TYPE; conversions with no in-window
    * touch report as 'direct'. This is the standard marketing /
    * growth-analytics question ("which channel earns the revenue?")
    * re-expressed over the events stream; the linear model is the
    * order-free member of the classic family (first/last-touch are
    * [[asofJoin]] shapes, U-shaped adds position weights to THIS plan).
    *
    * Shape at 100 TB: the conversion×touch pairing is the
    * [[rangeJoinPriorCounts]] bucketed range join — each conversion
    * probes exactly TWO (user, time-bucket) keys, so the join is equi
    * on (user, bucket) with a residual window filter, never an
    * unbounded time-range explode; the per-conversion touch count is
    * one window over the conv-keyed pairing (bounded by in-window touch
    * volume), and the rollup is one partial-agged exchange on the touch
    * type. Determinism: credit = value/n is one double divide; sums
    * round at 2 (the [[hourlyAgg]] ULP-absorption convention).
    * Output: one row per touch type + 'direct'. */
  def attribution(s: SparkSession, dir: String,
                  convType: String = "purchase",
                  touchTypes: Seq[String] = Seq("view", "click", "signup"),
                  windowMs: Long = 21600000L): DataFrame =
    attributionFrom(
      Tables.events(s, dir)
        .select($"event_id", $"user_id", $"event_type", $"value",
          unix_millis($"ts").as("ms")),
      convType, touchTypes, windowMs)

  /** Core of [[attribution]] over any (event_id, user_id, event_type,
    * value, ms) frame. */
  def attributionFrom(ev: DataFrame, convType: String,
                      touchTypes: Seq[String], windowMs: Long): DataFrame = {
    require(windowMs > 0 && touchTypes.nonEmpty,
      s"need windowMs > 0 and touch types, got $windowMs / $touchTypes")
    def bucketOf(ms: Column): Column = floor(ms / windowMs).cast("long")
    val conv = ev.filter($"event_type" === convType)
      .select($"event_id".as("conv_id"), $"user_id", $"ms", $"value")
    val touch = ev.filter($"event_type".isInCollection(touchTypes))
      .select($"user_id".as("t_user"), $"event_type".as("touch_type"),
        bucketOf($"ms").as("t_bucket"), $"ms".as("t_ms"))
    val paired = conv
      .withColumn("probe_bucket",
        explode(array(bucketOf($"ms") - 1, bucketOf($"ms"))))
      .join(touch,
        $"user_id" === $"t_user" && $"probe_bucket" === $"t_bucket" &&
          $"t_ms" >= $"ms" - windowMs && $"t_ms" < $"ms")
      .select($"conv_id", $"value", $"touch_type")
    val n = Window.partitionBy($"conv_id")
    val credited = paired
      .withColumn("credit", $"value" / count(lit(1)).over(n))
    val byType = credited.groupBy($"touch_type")
      .agg(
        count(lit(1)).as("n_touches"),
        countDistinct($"conv_id").as("n_conversions"),
        round(sum($"credit"), 2).as("attributed_value"))
    val direct = conv
      .join(paired.select($"conv_id").distinct(), Seq("conv_id"), "left_anti")
      .agg(
        lit(0L).as("n_touches"),
        count(lit(1)).as("n_conversions"),
        round(sum($"value"), 2).as("attributed_value"))
      .select(lit("direct").as("touch_type"), $"n_touches",
        $"n_conversions", $"attributed_value")
      .filter($"n_conversions" > 0)
    byType.unionByName(direct)
  }

  /** CUSUM CHANGEPOINT — offline mean-shift detection per event type
    * over its hourly count series (Page, Biometrika 1954; the offline
    * argmax-|S| estimator): S_t = Σ_{i≤t}(x_i − x̄) peaks exactly where
    * the series' level shifts, so the hour at max |S_t| is the
    * estimated changepoint, reported with the mean level on each side.
    * The monitoring complement of [[anomalyZscore]]: z-scores flag
    * SPIKES against a trailing baseline; CUSUM finds the sustained
    * LEVEL SHIFT (a deploy, a bot cohort arriving) that a per-hour
    * z-score smears over many small excursions.
    *
    * Engine-neutral arithmetic: deviations are carried SCALED BY THE
    * SERIES LENGTH — n_i·T − total is an exact integer, so the
    * cumulative S_t is an exact integer cumsum (no FP ordering across
    * engines, unlike a double x̄ subtraction), |S| argmax ties break on
    * the earlier hour, and the only doubles are the two terminal mean
    * divides. The last hour is excluded from candidates (S_T ≡ 0 —
    * never a changepoint). Shape: one partial-agged hourly rollup, two
    * windows over (type, hour) — series length per type is bounded by
    * the time range, not event volume. */
  def changepointCusum(s: SparkSession, dir: String): DataFrame =
    changepointCusumFrom(hourlyCountsOf(Tables.events(s, dir)))

  /** HOURLY PERIODICITY — lag-`lagHours` autocorrelation of each event
    * type's hourly volume series (the Box-Jenkins seasonality
    * diagnostic at the one lag that matters operationally: 24 h): a
    * type with autocorr ≈ 1 has a hard daily cycle — size its
    * ingestion windows and watermark slack to the cycle — while
    * autocorr ≈ 0 means load is memoryless and static partitioning is
    * fine. The series is DENSIFIED to the full corpus hour grid with
    * zero counts (a sparse series would silently correlate only busy
    * hours and overstate the cycle).
    *
    * Determinism: the grid is integer hour indices (epoch/3600) via
    * sequence(); counts are integers; the Pearson at lag L uses the
    * five exact integer moment sums and converts to IEEE doubles only
    * in the terminal mean/sqrt formula + round(6) — the
    * [[Graph.assortativity]] moments discipline. A zero-variance side
    * (constant series) is decided on exact DECIMAL integer products
    * and reports autocorr = 0. Shape: one partial-agged hourly
    * rollup, a broadcast 2-value hour range, a types × grid explode
    * (bounded by time range, not volume), one self-equi-join on
    * (type, hour+L), one bounded agg. */
  def periodicity(s: SparkSession, dir: String, lagHours: Int = 24): DataFrame =
    periodicityFrom(hourlyCountsOf(Tables.events(s, dir)), lagHours)

  /** Core of [[periodicity]] over any (hour_ts, event_type, n) frame. */
  def periodicityFrom(hourly: DataFrame, lagHours: Int): DataFrame = {
    require(lagHours >= 1, s"lagHours must be >= 1, got $lagHours")
    val hc = hourly.select(($"hour_ts" / 3600).cast("long").as("h"),
      $"event_type", $"n")
    val range = hc.agg(min($"h").as("h0"), max($"h").as("h1"))
    val grid = hc.select($"event_type").distinct()
      .crossJoin(broadcast(range))
      .select($"event_type", explode(sequence($"h0", $"h1")).as("h"))
    val series = grid.join(hc, Seq("event_type", "h"), "left")
      .select($"event_type", $"h", coalesce($"n", lit(0L)).as("x"))
    val lagged = series.select($"event_type",
      ($"h" + lagHours).as("h"), $"x".as("y"))
    val sums = series.join(lagged, Seq("event_type", "h"))
      .groupBy($"event_type").agg(
        count(lit(1)).as("np"),
        sum($"x" * $"y").as("sxy"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sx2"), sum($"y" * $"y").as("sy2"))
    val npd = $"np".cast("double")
    val mx = $"sx".cast("double") / npd
    val my = $"sy".cast("double") / npd
    val varXZero = $"np".cast("decimal(38,0)") * $"sx2" ===
      $"sx".cast("decimal(38,0)") * $"sx"
    val varYZero = $"np".cast("decimal(38,0)") * $"sy2" ===
      $"sy".cast("decimal(38,0)") * $"sy"
    sums.select($"event_type", $"np".as("n_pairs"),
      lit(lagHours.toLong).as("lag_hours"),
      when(varXZero || varYZero, lit(0.0))
        .otherwise(round(($"sxy".cast("double") / npd - mx * my)
          / (sqrt($"sx2".cast("double") / npd - mx * mx)
            * sqrt($"sy2".cast("double") / npd - my * my)), 6))
        .as("autocorr"))
  }

  /** Hourly (hour_ts, event_type, n) rollup shared with the twin. */
  private def hourlyCountsOf(ev: DataFrame): DataFrame =
    ev.filter($"event_type".isNotNull)
      .groupBy(unix_timestamp(date_trunc("hour", $"ts")).as("hour_ts"),
        $"event_type")
      .agg(count(lit(1)).as("n"))

  /** Core of [[changepointCusum]] over any (hour_ts, event_type, n)
    * hourly series frame. */
  def changepointCusumFrom(hourly: DataFrame): DataFrame = {
    val byType = Window.partitionBy($"event_type")
    val ordered = Window.partitionBy($"event_type").orderBy($"hour_ts".asc)
    val cum = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = hourly
      .withColumn("t_hours", count(lit(1)).over(byType))
      .withColumn("total", sum($"n").over(byType))
      .withColumn("pos", row_number().over(ordered))
      .withColumn("cum_n", sum($"n").over(cum))
      .withColumn("s_scaled", sum($"n" * $"t_hours" - $"total").over(cum))
      .filter($"t_hours" >= 2 && $"pos" < $"t_hours")
    val best = Window.partitionBy($"event_type")
      .orderBy(abs($"s_scaled").desc, $"hour_ts".asc)
    scored.withColumn("rk", row_number().over(best)).filter($"rk" === 1)
      .select($"event_type", $"hour_ts".as("cp_hour_ts"),
        $"t_hours", abs($"s_scaled").as("s_abs_scaled"),
        round($"cum_n".cast("double") / $"pos".cast("double"), 4)
          .as("mean_before"),
        round(($"total" - $"cum_n").cast("double") /
          ($"t_hours" - $"pos").cast("double"), 4).as("mean_after"))
  }

  /** FREQUENT EVENT-TYPE PAIRS — the 2-itemset market-basket census
    * (Agrawal & Srikant, VLDB'94 A-Priori, at the k=2 level where the
    * candidate space is just |types|² and needs no candidate pruning):
    * baskets are (user, UTC day), items are the distinct event types in
    * the basket, and every co-occurring type pair reports its basket
    * count, support, and lift — the behavioral complement of
    * [[pathTransitions]] (which is ORDER-sensitive and adjacent-only;
    * this is order-free whole-basket co-occurrence, the "viewed AND
    * purchased same day" signal).
    *
    * Shape for scale: one shuffle builds the per-basket sorted distinct
    * type array (collect_set is bounded by |event types|, a small
    * constant); pairs explode i<j off the sorted array map-side, so the
    * pair exchange carries ≤ |types|²/2 rows per basket and the
    * aggregate output is ≤ |types|² rows total whatever the event
    * volume. Singles/total join back by broadcast. No self-join of the
    * event table — the twin's DISTINCT self-join formulation is the
    * semantics, not the plan. */
  def itemsetPairs(s: SparkSession, dir: String): DataFrame =
    itemsetPairsFrom(Tables.events(s, dir)
      .filter($"user_id".isNotNull && $"event_type".isNotNull)
      .select($"user_id", date_trunc("day", $"ts").as("day"), $"event_type"))

  /** Core of [[itemsetPairs]] over any (user_id, day, event_type) frame. */
  def itemsetPairsFrom(base: DataFrame): DataFrame = {
    val baskets = base.groupBy($"user_id", $"day")
      .agg(sort_array(collect_set($"event_type")).as("types"))
      .localCheckpoint(true)
    val nB = baskets.agg(count(lit(1)).as("n_baskets"))
    val singles = baskets.select(explode($"types").as("t"))
      .groupBy($"t").agg(count(lit(1)).as("n_single"))
    val pairs = baskets
      .select($"types", posexplode($"types").as(Seq("i", "type_a")))
      .select($"type_a",
        explode(expr("slice(types, i + 2, size(types))")).as("type_b"))
      .groupBy($"type_a", $"type_b").agg(count(lit(1)).as("n_pair"))
    pairs
      .join(broadcast(singles.select($"t".as("type_a"), $"n_single".as("n_a"))),
        Seq("type_a"))
      .join(broadcast(singles.select($"t".as("type_b"), $"n_single".as("n_b"))),
        Seq("type_b"))
      .crossJoin(broadcast(nB))
      .select($"type_a", $"type_b", $"n_pair",
        round($"n_pair".cast("double") / $"n_baskets".cast("double"), 6)
          .as("support"),
        round(($"n_pair".cast("double") * $"n_baskets".cast("double")) /
          ($"n_a".cast("double") * $"n_b".cast("double")), 6).as("lift"))
  }

  /** EWMA DEVIATION DETECTION — each (event_type, hour) count scored
    * against the exponentially-weighted moving average of its TRAILING
    * 24 present hours (decay 0.7 per hour of lag, weights re-normalized
    * over the hours actually present — a gap hour is MISSING, not
    * zero), reporting the top-20 hours by |deviation|. The recency-
    * weighted complement of [[anomalyZscore]]: the flat 24-hour mean
    * dilutes a level shift across the whole baseline, while the EWMA
    * tracks it within a few hours — the two differ exactly on "new
    * normal vs anomaly", which is why monitoring stacks run both.
    *
    * Shape for scale: one aggregate to hour grain (after which the
    * data is types × hours, tiny — the [[anomalyZscore]] posture),
    * then one BOUNDED-fan-out range self-join (each hour joins ≤ 24
    * predecessors: never a window over unbounded history, never a
    * per-type collect) and one partial-agged rollup. Determinism: the
    * weight pow(0.7, lag−1) and the weighted term are each rounded to
    * 12 and summed in DECIMAL(38,12) — partial-agg order never moves a
    * score — and the final ewma/deviation round to 6 before the
    * (|deviation| desc, type, hour) total-order top-20. */
  def ewmaAnomaly(s: SparkSession, dir: String): DataFrame =
    ewmaAnomalyFrom(hourlyCountsOf(Tables.events(s, dir)))

  /** Core of [[ewmaAnomaly]] over any (hour_ts, event_type, n) frame. */
  def ewmaAnomalyFrom(hourly: DataFrame, lookback: Int = 24,
                      decay: Double = 0.7, minBaseline: Int = 8,
                      topN: Int = 20): DataFrame =
    ewmaScoredFrom(hourly, lookback, decay, minBaseline)
      .orderBy(abs($"deviation").desc, $"event_type".asc, $"hour_ts".asc)
      .limit(topN)

  /** The unranked EWMA score frame — every scoreable (type, hour) row.
    * [[ewmaAnomalyFrom]] top-Ns it; the streaming twin
    * ([[graft.streaming.Streams.ewmaMonitor]]) emits exactly these rows
    * as hours close (global ranking is a batch/serving concern, the
    * rfmRunning convention), so the parity spec compares against THIS. */
  private[graft] def ewmaScoredFrom(hourly: DataFrame, lookback: Int = 24,
                                    decay: Double = 0.7,
                                    minBaseline: Int = 8): DataFrame = {
    require(lookback >= 1 && decay > 0 && decay < 1 && minBaseline >= 1,
      "need lookback >= 1, 0 < decay < 1, minBaseline >= 1")
    val hc = hourly.select(($"hour_ts" / 3600).cast("long").as("h"),
      $"event_type", $"n").localCheckpoint(true)
    val prior = hc.select($"event_type".as("p_type"), $"h".as("h2"),
      $"n".as("x2"))
    hc.join(prior,
        $"event_type" === $"p_type"
          && $"h2" >= $"h" - lookback && $"h2" < $"h")
      .select($"event_type", $"h", $"n",
        round(pow(lit(decay), $"h" - $"h2" - 1), 12)
          .cast("decimal(38,12)").as("w"),
        round(pow(lit(decay), $"h" - $"h2" - 1) * $"x2", 12)
          .cast("decimal(38,12)").as("wx"))
      .groupBy($"event_type", $"h", $"n")
      .agg(count(lit(1)).as("base_n"), sum($"w").as("den"), sum($"wx").as("num"))
      .filter($"base_n" >= minBaseline)
      .select($"event_type", ($"h" * 3600).as("hour_ts"), $"n",
        round($"num".cast("double") / $"den".cast("double"), 6).as("ewma"))
      .select($"event_type", $"hour_ts", $"n", $"ewma",
        round(($"n" - $"ewma") / sqrt($"ewma" + 1.0), 6).as("deviation"))
  }

  /** SESSION STATISTICS — the duration-vs-size profile of the 30-minute
    * inactivity sessions [[sessionize]] counts: one row per session
    * SIZE (events per session) with how many sessions have that size,
    * their exact-ms mean duration, and the max. The engagement-model
    * artifact behind bot triage: human sessions show duration growing
    * roughly linearly with size, scripted traffic shows many-event
    * near-zero-duration rows, and the single-event bucket's share is
    * the bounce rate — none of which the per-user session COUNT
    * exposes.
    *
    * Shape: the [[sessionize]] user_id exchange serves BOTH windows
    * (lag flag + running session id — same partitioning, one sort),
    * then a per-(user, session) rollup rides the same user_id prefix;
    * the final size-grain aggregate is bounded by the longest session,
    * not event volume. Durations are exact integer ms (max−min); the
    * mean divides the exact BIGINT sum once and rounds to 3. */
  def sessionStats(s: SparkSession, dir: String,
                   gapMs: Long = 1800000L): DataFrame =
    sessionStatsFrom(Tables.events(s, dir), gapMs)

  /** Core of [[sessionStats]] over any (user_id, event_id, ts) frame. */
  def sessionStatsFrom(ev: DataFrame, gapMs: Long): DataFrame = {
    require(gapMs >= 1L, s"need a positive gap, got $gapMs")
    val byUser = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"event_id".asc)
    val flagged = ev
      .filter($"user_id".isNotNull)
      .select($"user_id", $"event_id", $"ts", unix_millis($"ts").as("ms"))
      .withColumn("prev_ms", lag($"ms", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ms".isNull || $"ms" - $"prev_ms" > gapMs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum($"new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy($"user_id", $"sid")
      .agg(count(lit(1)).as("n_ev"), (max($"ms") - min($"ms")).as("dur_ms"))
      .groupBy($"n_ev".as("events_per_session"))
      .agg(count(lit(1)).as("n_sessions"),
        round(sum($"dur_ms").cast("double") / count(lit(1)), 3)
          .as("mean_duration_ms"),
        max($"dur_ms").as("max_duration_ms"))
  }

  /** INTER-ARRIVAL STATISTICS — per event type, the distribution of
    * gaps between consecutive events (global arrival order per type):
    * count, exact integer-ms mean, and nearest-rank p50/p90. The
    * traffic-model fingerprint next to [[periodicity]]'s cyclic view:
    * a p90/p50 ratio far above ~3 says bursty arrivals (batch
    * ingestion, bot traffic), near-uniform gaps say a metronome
    * (synthetic or scheduled load) — the first audit run when an
    * events feed's provenance is in question.
    *
    * Determinism: gaps are exact integer milliseconds off the
    * (ts, event_id) total order; the mean divides the exact BIGINT gap
    * sum once and rounds to 3; percentiles are NEAREST-RANK LOW picks
    * (the element at row floor((n−1)·q)+1 of the gap sort) — an
    * ACTUAL gap value, identical in both engines, where interpolating
    * percentile kernels could disagree in the last ulp. Ties among
    * equal gaps make the rank pick value-stable regardless of
    * row_number's tie order. Shape: one window pass partitioned by
    * type (the [[sessionize]] exchange), one rank window at types ×
    * gaps grain, one bounded rollup — types with a single event have
    * no gap and emit no row. */
  def interarrivalStats(s: SparkSession, dir: String): DataFrame =
    interarrivalStatsFrom(Tables.events(s, dir)
      .filter($"event_type".isNotNull)
      .select($"event_type", $"event_id", unix_millis($"ts").as("ms")))

  /** BURSTINESS COEFFICIENT — per event type, B = (σ−μ)/(σ+μ) of the
    * inter-arrival gap distribution (Goh & Barabási, EPL 81, 2008),
    * with the coefficient of variation σ/μ alongside. The one-number
    * regime classifier on top of [[interarrivalStats]]'s percentile
    * view: B → −1 is a metronome (scheduled/synthetic load), B ≈ 0 is
    * Poisson (organic arrivals), B → +1 is heavy-tailed bursts (batch
    * ingestion, bots, incident retries) — the provenance fingerprint a
    * training-data pipeline checks before trusting an events feed as
    * "real user behaviour".
    *
    * Determinism: gaps are exact integer ms off the (ts, event_id)
    * total order; Σg is BIGINT, Σg² is DECIMAL(38,0) (each square
    * exact — no Long overflow even at month-long gaps); μ, σ and the
    * two ratios are computed in DOUBLE in one fixed expression order
    * and rounded at the output. Variance is clamped at 0 before the
    * sqrt (FP subtraction of near-equal doubles can land an ulp
    * negative on a near-constant gap stream). Shape: ONE window pass
    * partitioned by type + one partial-agged moment rollup — nothing
    * beyond the [[interarrivalStats]] exchange. */
  def burstiness(s: SparkSession, dir: String): DataFrame =
    burstinessFrom(Tables.events(s, dir)
      .filter($"event_type".isNotNull)
      .select($"event_type", $"event_id", unix_millis($"ts").as("ms")))

  /** Core of [[burstiness]] over any (event_type, event_id, ms) frame. */
  def burstinessFrom(ev: DataFrame): DataFrame = {
    val byType = Window.partitionBy($"event_type")
      .orderBy($"ms".asc, $"event_id".asc)
    val agg = ev
      .withColumn("gap_ms", $"ms" - lag($"ms", 1).over(byType))
      .filter($"gap_ms".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_gaps"),
        sum($"gap_ms").as("sum_g"),
        sum($"gap_ms".cast("decimal(19,0)") * $"gap_ms".cast("decimal(19,0)"))
          .as("sum_g2"))
    val mu = $"sum_g".cast("double") / $"n_gaps"
    val sd = sqrt(greatest(lit(0.0),
      $"sum_g2".cast("double") / $"n_gaps" - mu * mu))
    // mu = 0 (all-duplicate timestamps → every gap 0) makes both ratios
    // 0/0: Spark's non-ANSI Divide yields null, IEEE engines NaN — null
    // on BOTH sides by explicit guard, the tokenFertility convention.
    agg.select($"event_type", $"n_gaps",
      round(mu, 3).as("mean_gap_ms"),
      round(sd, 3).as("sd_gap_ms"),
      when($"sum_g" > 0, round(sd / mu, 6)).as("cv"),
      when($"sum_g" > 0, round((sd - mu) / (sd + mu), 6)).as("burstiness"))
  }

  /** Core of [[interarrivalStats]] over any (event_type, event_id, ms)
    * frame. */
  def interarrivalStatsFrom(ev: DataFrame): DataFrame = {
    val byType = Window.partitionBy($"event_type")
      .orderBy($"ms".asc, $"event_id".asc)
    val gaps = ev
      .withColumn("gap_ms", $"ms" - lag($"ms", 1).over(byType))
      .filter($"gap_ms".isNotNull)
    val ranked = gaps.withColumn("rn", row_number().over(
      Window.partitionBy($"event_type").orderBy($"gap_ms".asc)))
    val cnt = ranked.groupBy($"event_type")
      .agg(count(lit(1)).as("n_gaps"), sum($"gap_ms").as("sum_ms"))
    ranked.join(cnt, "event_type")
      .groupBy($"event_type")
      .agg(
        (max($"n_gaps") + 1L).as("n_events"),
        max($"n_gaps").as("n_gaps"),
        round(max($"sum_ms").cast("double") / max($"n_gaps"), 3)
          .as("mean_gap_ms"),
        max(when($"rn" === floor(($"n_gaps" - 1) * 0.5) + 1L, $"gap_ms"))
          .as("p50_gap_ms"),
        max(when($"rn" === floor(($"n_gaps" - 1) * 0.9) + 1L, $"gap_ms"))
          .as("p90_gap_ms"))
  }
}
