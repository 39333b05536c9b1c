package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.syntax._

/** One event row (the `events` table schema, ts at microsecond precision). */
final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                       event_type: String, value: Double)

/** Per-user OPEN-session accumulator carried across micro-batches: the
  * one live session only — closed sessions are emitted and forgotten,
  * which is what keeps state size O(active users), not O(ever-seen). */
final case class SessionState(startMs: Long, lastMs: Long, nEvents: Long)

/** One closed (or flushed) session segment. */
final case class SessionOut(user_id: Long, session_start: Long, session_end: Long,
                            n_events: Long)

/** One corpus document on the streaming ingestion seam: content plus the
  * PROCESSING-time stamp the source attached on arrival (the watermark
  * column for ingestion-window dedup — documents carry no event time). */
final case class Doc(doc_id: Long, text: String, ingest_ts: java.sql.Timestamp)

/** One embedding vector on the streaming ingestion seam: the payload a
  * vector index ingests continuously, stamped with processing time on
  * arrival (like [[Doc]], vectors carry no event time). */
final case class Vec(vec_id: Long, embedding: Seq[Double],
                     ingest_ts: java.sql.Timestamp)

/** Per-user funnel progress carried across micro-batches: the first
  * completion timestamp of each stage reached so far (a k-element
  * prefix — bounded at k longs per user regardless of event volume),
  * plus the user's last activity for idle eviction. */
final case class FunnelState(stageMs: List[Long], lastMs: Long)

/** One stage completion: user `user_id` first reached stage `stage`
  * (1-based, type `event_type`) at `stage_ms`. */
final case class StageHit(user_id: Long, stage: Int, event_type: String,
                          stage_ms: Long)

/** Per-user retention tracker: first-activity period (the cohort) plus a
  * bitmask of period offsets already emitted — two longs per user, the
  * whole state. */
final case class RetentionState(firstP: Long, seenMask: Long, lastMs: Long)

/** First activity of `user_id` at `offset` periods after their cohort. */
final case class RetentionHit(user_id: Long, cohort: Long, offset: Int)

/** Per-user running type histogram: one count per event TYPE (the type
  * vocabulary is a small closed set — this is O(|types|) longs per user,
  * never per-event), plus last activity for idle eviction. */
final case class TopTypeState(counts: Map[String, Long], lastMs: Long)

/** User `user_id`'s current most-frequent event type (count `n`). */
final case class TopTypeOut(user_id: Long, event_type: String, n: Long)

/** Per-event-type anomaly-detector state: counts of hours the watermark
  * still holds OPEN (hourMs -> n), plus the trailing ring of the last
  * <= 24 FINALIZED hour counts (newest first) — the batch z-score's
  * rowsBetween(-24,-1) baseline, carried as at most 24 longs. */
final case class ZScoreState(open: Map[Long, Long], ring: List[Long])

/** Per-event-type EWMA-monitor state: OPEN hour counts (hourMs -> n)
  * plus the trailing finalized (hourMs, n) pairs still inside the
  * lookback horizon — the pairs carry their HOUR because the batch
  * EWMA weights by hour DISTANCE (decay^(lag-1)), not ring position:
  * a gap hour shifts every weight, which a bare count ring would miss. */
final case class EwmaState(open: Map[Long, Long], ring: List[(Long, Long)])

/** One finalized, scoreable hour under the EWMA baseline: `n` events of
  * `event_type` in the hour at `hour_ts` (epoch seconds), the
  * renormalized trailing EWMA, and the deviation (n-ewma)/sqrt(ewma+1)
  * — the batch operator's exact arithmetic. */
final case class EwmaOut(event_type: String, hour_ts: Long, n: Long,
                         ewma: Double, deviation: Double)

/** One finalized, scoreable hour: `n` events of `event_type` in the hour
  * starting at `hour_ts` (epoch seconds), `z` standard deviations from
  * the trailing-24-observed-hours mean. */
final case class ZScoreOut(event_type: String, hour_ts: Long, n: Long, z: Double)

/** One CDC change row feeding the streaming SCD2 snapshot (the `orders`
  * change-log shape: key, unique change id as tiebreak, payload,
  * effective timestamp). */
final case class Change(custkey: Long, orderkey: Long, totalprice: Double,
                        ts: java.sql.Timestamp)

/** Per-key CURRENT interval: the (valid_from, orderkey)-maximal change
  * seen so far, plus the newest change timestamp for retirement. */
final case class Scd2State(validFromMs: Long, orderkey: Long,
                           totalprice: Double, lastSeenMs: Long)

/** Key `custkey`'s current open interval after an update. */
final case class Scd2Out(custkey: Long, orderkey: Long, totalprice: Double,
                         valid_from_ms: Long)

/** Per-user running RFM profile: last purchase (ms), purchase count,
  * monetary total in exact cents — three longs per user, the minimal
  * state ANY running recency/frequency/monetary rollup must hold. */
final case class RfmState(lastMs: Long, freq: Long, cents: Long)

/** User `user_id`'s current RFM profile after each update. */
final case class RfmOut(user_id: Long, last_ms: Long, freq: Long, cents: Long)

/** Structured Streaming twins of the batch operators in
  * graft.operators.Events — same aggregation logic, driven by
  * `readStream` instead of `read`. The batch forms remain the
  * oracle-checkable semantics; these are the low-latency deployment path
  * (`events` as a Kafka/file stream at scale).
  *
  * State sizing at 100 TB — every operator here is BOUNDED:
  *  - hourlyAgg / typeCounts keep (windows-within-watermark x keys) rows;
  *    closed windows are finalized and dropped by the watermark;
  *  - sessionize keeps ONE open-session struct per ACTIVE user and
  *    evicts it via event-time timeout as soon as the watermark passes
  *    the session gap — user churn cannot grow state without bound;
  *  - anomalyZscore keeps (open hours + a 24-count ring) per event TYPE
  *    — the smallest key space in the file;
  *  - rfmRunning keeps three longs per purchaser active within the
  *    churn window, evicted by event-time timeout at the churn boundary.
  */
object Streams {

  /** Tumbling-window twin of Events.hourlyAgg. The 2h watermark bounds
    * state and admits the usual late-data slack; output rows match the
    * batch query's (hour_ts, event_type, n, sum_value) schema. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .select(
        unix_timestamp($"window.start").as("hour_ts"),
        $"event_type", $"n", $"sum_value")

  /** STREAM-STATIC enrichment join — the ingest-time dimension lookup
    * every event pipeline runs (click ← user profile, doc ← source
    * config). The static side is a bounded batch DataFrame joined into
    * every micro-batch; the join is STATELESS (no watermark, no state
    * store — each batch joins and forgets), so it scales with batch
    * size, not stream history. The static side is broadcast: at 100 TB
    * the stream side is the unbounded one, the dim is the small one —
    * if the dim outgrows broadcast, pre-bucket it and drop the hint.
    * LEFT join + zero-fill so events from users outside the dim survive
    * enrichment (an inner join would silently drop them). */
  def enrichWithUserTotals(events: Dataset[Event], userTotals: DataFrame): DataFrame =
    events.toDF()
      .join(broadcast(userTotals), Seq("user_id"), "left")
      .select($"event_id", $"user_id", $"event_type", $"value",
        coalesce($"user_total", lit(0.0)).as("user_total"))

  /** Streaming twin of Events.topTypePerUser's underlying counts, as a
    * WATERMARKED daily-window aggregate (update mode): the state held is
    * only the windows the watermark still admits — unlike a complete-mode
    * running total, which never evicts a (user, type) pair. All-time
    * totals are a cheap downstream sum over closed windows; counts within
    * one window only ever grow, so "final value per window" = max. */
  def typeCounts(events: DataFrame, windowLen: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", windowLen), $"user_id", $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(
        unix_timestamp($"window.start").as("window_ts"),
        $"user_id", $"event_type", $"n")

  /** Stateful sessionization (30-min inactivity gap) with BOUNDED state:
    * one open-session struct per active user, evicted by an EVENT-TIME
    * TIMEOUT at (last event + gap) — when the watermark passes a user's
    * gap their session is emitted as a final segment and the state is
    * REMOVED. Output is the stream of closed session segments (plus a
    * refreshed segment per update while a session is open — update
    * mode); per-user totals are a downstream groupBy over segments
    * keyed by session_start (the batch twin Events.sessionize is the
    * oracle for those totals, asserted in StreamingSpec).
    *
    * In-batch out-of-order arrivals are sorted before folding;
    * cross-batch ordering is handled the streaming-native way — by the
    * watermark delay admitting stragglers before the timeout fires. */
  /** Hopping-window twin of Events.slidingAgg — the SAME window()
    * generator expression, so batch and stream share the window
    * semantics by construction; the watermark bounds state to the
    * windows it still admits (windowHours/hopHours per key in flight). */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "3 hours", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .select(
        unix_timestamp($"window.start").as("window_ts"),
        $"event_type", $"n", $"sum_value")

  /** STREAM-STREAM INTERVAL JOIN — attribution's native shape: every
    * (view, click) pair of the same user where the click lands within
    * `windowSec` seconds AT-OR-AFTER the view (view→click attribution;
    * trade→quote, impression→conversion are the same join). This is the
    * one Structured Streaming operator class where BOTH sides buffer:
    * correctness requires each side to hold rows until the other side's
    * watermark proves no more matches can arrive.
    *
    * State bound at 100 TB — and why the time-range condition is not
    * optional: with watermarks on both sides AND a range tying the two
    * event times, Spark derives a per-side state-eviction horizon (a
    * view is dropped once the click watermark passes view_ts +
    * windowSec; a click once the view watermark passes click_ts), so
    * state is O(events within the join window), not O(stream history).
    * An unconstrained stream-stream join would buffer forever — the
    * classic production incident this operator exists to avoid. Inner
    * join → append mode; each pair is emitted exactly once, when both
    * sides have it. StreamingSpec asserts parity with the identical
    * batch join and that state rows stay bounded by the window. */
  def intervalJoin(views: DataFrame, clicks: DataFrame,
                   windowSec: Long = 1800L, delay: String = "1 hour"): DataFrame = {
    require(windowSec > 0, s"attribution window must be positive, got $windowSec")
    val v = views
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("view_ts"))
      .withWatermark("view_ts", delay)
    val c = clicks
      .select($"user_id".as("c_user"), $"event_id".as("click_id"),
        $"ts".as("click_ts"), $"value")
      .withWatermark("click_ts", delay)
    v.join(c,
        $"user_id" === $"c_user" &&
          $"click_ts" >= $"view_ts" &&
          $"click_ts" <= $"view_ts" + expr(s"INTERVAL $windowSec SECONDS"))
      .select($"user_id", $"view_id", $"click_id",
        unix_millis($"view_ts").as("view_ms"),
        unix_millis($"click_ts").as("click_ms"),
        round($"value", 2).as("click_value"))
  }

  /** Streaming twin of exact dedup (graft.operators.Dedup.exact) — the
    * corpus-ingestion seam: an at-least-once upstream (re-delivered
    * files, replayed partitions, near-simultaneous crawls of the same
    * page) becomes exactly-one-document-per-content downstream. The key
    * is the SAME normalized content fingerprint the batch op groups on,
    * so the streamed keep-set has exactly one survivor per batch
    * fingerprint group.
    *
    * Keep semantics differ from batch by design and are part of the
    * contract: batch keeps min(doc_id) (deterministic over a complete
    * corpus); a stream cannot wait for the global minimum, so it keeps
    * the FIRST ARRIVAL and drops later copies. State at 100 TB:
    * `dropDuplicatesWithinWatermark` holds one row per distinct
    * fingerprint seen within the watermark window and evicts it as the
    * watermark passes — O(distinct content per window), not O(stream
    * history), the property that makes ingestion dedup runnable forever. */
  def dedupByFingerprint(docs: Dataset[Doc], delay: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", md5(regexp_replace(lower($"text"), "[^a-z0-9]", "")))
      .withWatermark("ingest_ts", delay)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming twin of the batch funnel (graft.operators.Events.funnel):
    * ordered conversion through `stages`, stage k counting only events
    * at-or-after the user's stage-(k-1) first completion (`>=` —
    * simultaneous events count, matching the batch/oracle semantics).
    * Emits one [[StageHit]] the moment a user first reaches each stage;
    * the batch funnel's per-stage user counts are a downstream
    * `groupBy(stage).agg(count_distinct(user_id))` over the hits
    * (StreamingSpec asserts the equality against the batch oracle).
    *
    * State at 100 TB: k longs per user — NOT per event — and only for
    * users active within `idleTimeoutMs`: an event-time timeout drops a
    * user once the watermark passes their last activity plus the idle
    * window (the funnel's attribution window), so state is O(active
    * users), immune to user churn. Fully-converted users keep their
    * (inert) state until the same timeout so a late straggler cannot
    * restart their funnel and double-count stage 1.
    *
    * Ordering contract mirrors [[sessionize]]: in-batch arrivals are
    * sorted by event time before folding; cross-batch stragglers are
    * handled by the watermark delay. Ties on event time break by FUNNEL
    * POSITION (then event_id): a stage-k event simultaneous with the
    * stage-(k-1) completion must count under the batch `>=` semantics,
    * so the shallower stage has to be folded first — sorting tied
    * events by event_id alone would skip the deeper event whenever its
    * id happened to sort lower (StreamingSpec pins the tied case).
    * Under that contract each emitted hit is final (a first-completion
    * can only move earlier via an event that the fold has not yet
    * passed), so append mode is sound. */
  def funnel(events: Dataset[Event],
             stages: Seq[String] = Seq("view", "click", "purchase"),
             idleTimeoutMs: Long = 7L * 24 * 3600 * 1000): Dataset[StageHit] = {
    require(stages.size >= 2, s"funnel needs >= 2 stages, got $stages")
    import events.sparkSession.implicits._
    // non-stage types get -1: they never advance and only feed the
    // (order-independent) lastMs max, so their slot in a tie is free
    val stageIdx = stages.zipWithIndex.toMap
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // attribution window closed: all reachable hits were already
            // emitted incrementally — just forget the user
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.toSeq.sortBy(e =>
              (e.ts.getTime, stageIdx.getOrElse(e.event_type, -1), e.event_id))
            var st = state.getOption.getOrElse(FunnelState(Nil, Long.MinValue))
            var hits = List.empty[StageHit]
            for (e <- sorted) {
              val ms = e.ts.getTime
              val depth = st.stageMs.size
              val advances = depth < stages.size &&
                e.event_type == stages(depth) &&
                (depth == 0 || ms >= st.stageMs.head)
              st =
                if (advances) {
                  hits ::= StageHit(uid, depth + 1, stages(depth), ms)
                  // stageMs is kept newest-first so the `>=` guard reads
                  // the prior stage's completion at the head, O(1)
                  FunnelState(ms :: st.stageMs, math.max(st.lastMs, ms))
                } else st.copy(lastMs = math.max(st.lastMs, ms))
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(st.lastMs + idleTimeoutMs, state.getCurrentWatermarkMs() + 1))
            hits.reverseIterator
          }
      }
  }

  /** Streaming twin of batch cohort retention
    * (graft.operators.Events.cohortRetention): emits one [[RetentionHit]]
    * the FIRST time a user is active at each period offset after their
    * cohort (their first-seen period); the batch query's (cohort,
    * offset, n_users) rows are a downstream
    * `groupBy(cohort, offset).agg(count_distinct(user_id))` over the
    * hits (StreamingSpec asserts the equality).
    *
    * State at 100 TB: TWO longs per user (first period + an
    * emitted-offset bitmask, hence `maxOffset` <= 63) — never per-event,
    * never per-period-list. An event-time timeout drops users idle past
    * `idleTimeoutMs` (set it to the retention horizon: a user outside
    * the reporting window contributes no further rows). Ordering
    * contract as [[funnel]]/[[sessionize]]: in-batch sorts, watermark
    * handles cross-batch stragglers — under it a user's cohort is fixed
    * by their first processed event, so every hit is final and append
    * mode is sound. */
  def cohortRetention(events: Dataset[Event],
                      periodMs: Long = 7L * 86400000L,
                      maxOffset: Int = 63,
                      idleTimeoutMs: Long = 30L * 86400000L): Dataset[RetentionHit] = {
    require(periodMs > 0, s"period must be positive, got $periodMs")
    require(maxOffset >= 0 && maxOffset <= 63,
      s"maxOffset must fit the state bitmask (0..63), got $maxOffset")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RetentionState, RetentionHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[RetentionState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var hits = List.empty[RetentionHit]
            var st = state.getOption.orNull
            for (e <- sorted) {
              val ms = e.ts.getTime
              val p = math.floorDiv(ms, periodMs)
              if (st == null) {
                st = RetentionState(p, 1L, ms)
                hits ::= RetentionHit(uid, p, 0)
              } else {
                val off = p - st.firstP
                val newMask =
                  if (off >= 0 && off <= maxOffset && (st.seenMask & (1L << off)) == 0L) {
                    hits ::= RetentionHit(uid, st.firstP, off.toInt)
                    st.seenMask | (1L << off)
                  } else st.seenMask
                st = RetentionState(st.firstP, newMask, math.max(st.lastMs, ms))
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(st.lastMs + idleTimeoutMs, state.getCurrentWatermarkMs() + 1))
            hits.reverseIterator
          }
      }
  }

  /** Streaming twin of the n-gram vocabulary counts
    * (graft.operators.TextAnalysis.ngramCounts) on the corpus-ingestion
    * seam: per-window word n-gram frequencies — the vocab-drift /
    * contamination-burst monitor a live ingestion pipeline runs (a gram
    * whose frequency spikes in one ingestion window is a crawl-loop or
    * spam signature long before it dominates the corpus total). The
    * gram construction is the SAME zip_with fold as batch
    * ([[TextAnalysis.wordNgramsOf]]); counts are a watermarked windowed
    * aggregate (update mode), so state is (windows-within-watermark x
    * distinct grams) and closed windows are finalized and dropped —
    * all-time totals are a downstream sum, and the batch top-k is that
    * rollup ranked (StreamingSpec asserts it). */
  def ngramCounts(docs: Dataset[Doc], n: Int = 2,
                  windowLen: String = "1 hour"): DataFrame = {
    import graft.functions.EngineNeutral.wsTokens
    import graft.operators.TextAnalysis
    docs
      .withWatermark("ingest_ts", "2 hours")
      .select($"ingest_ts", wsTokens(lower($"text")).as("tk"))
      .select($"ingest_ts", explode(TextAnalysis.wordNgramsOf($"tk", n)).as("gram"))
      .groupBy(window($"ingest_ts", windowLen), $"gram")
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp($"window.start").as("window_ts"), $"gram", $"n")
  }

  /** Streaming COUNT-MIN SKETCH maintenance — the bounded-state
    * alternative to [[ngramCounts]]-style vocabulary aggregation: per
    * ingestion window, maintain the d×w counter matrix of
    * [[graft.operators.TextAnalysis.cmsEstimate]] instead of a
    * per-token histogram. The state-cardinality contrast IS the point:
    * a windowed token count holds (windows × distinct tokens) rows —
    * unbounded in the vocabulary, and a trillion-token ingestion
    * stream has billions of singletons — while the sketch holds
    * (windows × d·w) rows whatever arrives. Downstream, point-queries
    * read min-over-d-cells per window, and windows sum cell-wise into
    * coarser sketches (CMS is linear), so the live matrix answers
    * "how often was token X this hour" without the vocabulary ever
    * existing as state.
    *
    * Same seeded md5 bucket hashes as batch, so a drained stream's
    * per-window matrix equals the batch sketch of the same slice
    * exactly (StreamingSpec asserts cell-level equality); update mode
    * re-emits touched cells and the watermark finalizes closed
    * windows. */
  def cmsMaintenance(docs: Dataset[Doc], depth: Int = 4, width: Int = 1024,
                     windowLen: String = "1 hour"): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape: $depth x $width")
    import graft.functions.EngineNeutral.{hash60, wsTokens}
    docs
      .withWatermark("ingest_ts", "2 hours")
      .select($"ingest_ts", explode(wsTokens(lower($"text"))).as("token"))
      .select($"ingest_ts", $"token",
        explode(array((0 until depth).map(lit): _*)).as("j"))
      .select($"ingest_ts", $"j",
        (hash60(concat($"token", lit("#cms"), $"j".cast("string")))
          % width).as("bucket"))
      .groupBy(window($"ingest_ts", windowLen), $"j", $"bucket")
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp($"window.start").as("window_ts"),
        $"j", $"bucket", $"cnt")
  }

  /** Streaming HYPERLOGLOG maintenance — the distinct-content gauge of
    * an ingestion stream with O(1) state: per window, maintain the 256
    * deterministic HLL registers of [[graft.operators.Dedup.hllDistinct]]
    * (register-wise MAX is the whole update rule, and max is exactly
    * the streaming-aggregable shape). Where [[dedupByFingerprint]]
    * answers "is THIS doc new" with per-fingerprint state, this answers
    * "how many distinct contents arrived this hour" with 256 rows per
    * window whatever the stream carries — the dashboard counter that
    * never stores an id. Registers share [[Dedup.hllParts]] with batch,
    * so a drained stream's per-window register table equals the batch
    * sketch of the same slice EXACTLY (StreamingSpec asserts it), and
    * windows merge into coarser sketches by the same max. Read side:
    * the estimate is [[Dedup]]'s closed-form over any register set. */
  def hllMaintenance(docs: Dataset[Doc], windowLen: String = "1 hour"): DataFrame = {
    import graft.functions.EngineNeutral.hash60
    val (reg, rho) = graft.operators.Dedup.hllParts($"h")
    docs
      .withWatermark("ingest_ts", "2 hours")
      .select($"ingest_ts",
        hash60(regexp_replace(lower($"text"), "[^a-z0-9]", "")).as("h"))
      .select($"ingest_ts", reg.as("reg"), rho.as("rho"))
      .groupBy(window($"ingest_ts", windowLen), $"reg")
      .agg(max($"rho").as("mj"))
      .select(unix_timestamp($"window.start").as("window_ts"), $"reg", $"mj")
  }

  /** Streaming twin of Events.topTypePerUser: each user's CURRENT
    * most-frequent event type, re-emitted whenever it may have changed
    * (update mode — the latest emission per user is the answer, which is
    * exactly the batch query's row once the stream drains; StreamingSpec
    * asserts that equality). Tie-break matches batch/oracle: count desc,
    * type asc.
    *
    * State at 100 TB: a (type -> count) histogram per user — the event
    * TYPE vocabulary is a small closed set, so this is O(|types|) longs
    * per user, never per-event, for users active within `idleTimeoutMs`
    * (event-time timeout; an all-time argmax never finalizes, so
    * eviction is the deployment knob: past the idle horizon a returning
    * user restarts their histogram — within it, semantics are exactly
    * the batch query's). */
  def topTypePerUser(events: Dataset[Event],
                     idleTimeoutMs: Long = 30L * 86400000L): Dataset[TopTypeOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TopTypeState, TopTypeOut](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[TopTypeState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(TopTypeState(Map.empty, Long.MinValue))
            for (e <- it) {
              st = TopTypeState(
                st.counts.updated(e.event_type, st.counts.getOrElse(e.event_type, 0L) + 1L),
                math.max(st.lastMs, e.ts.getTime))
            }
            // Spark gives no hard cross-version guarantee against a
            // spurious empty invocation before any event lands — never
            // materialize (or argmax) an empty-count state
            if (st.counts.isEmpty) Iterator.empty
            else {
              state.update(st)
              state.setTimeoutTimestamp(
                math.max(st.lastMs + idleTimeoutMs, state.getCurrentWatermarkMs() + 1))
              val (t, n) = st.counts.minBy { case (ty, c) => (-c, ty) }
              Iterator.single(TopTypeOut(uid, t, n))
            }
          }
      }
  }

  def sessionize(events: Dataset[Event], gapMs: Long = 1800000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last event + gap: the session is closed for
            // good — emit the final segment and FORGET the user
            val st = state.get
            state.remove()
            Iterator(SessionOut(uid, st.startMs, st.lastMs, st.nEvents))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[SessionOut]
            var stOpt = state.getOption
            for (e <- sorted) {
              val ms = e.ts.getTime
              stOpt match {
                case Some(st) if ms - st.lastMs <= gapMs =>
                  // max() so a cross-batch straggler (older than the open
                  // session's end, admitted by the watermark) can never
                  // regress session_end
                  stOpt = Some(SessionState(st.startMs, math.max(st.lastMs, ms), st.nEvents + 1))
                case Some(st) => // gap exceeded in-stream: close and restart
                  closed ::= SessionOut(uid, st.startMs, st.lastMs, st.nEvents)
                  stOpt = Some(SessionState(ms, ms, 1L))
                case None =>
                  stOpt = Some(SessionState(ms, ms, 1L))
              }
            }
            val st = stOpt.get
            state.update(st)
            // evict once the watermark passes the inactivity gap (clamped
            // a tick past the current watermark — the API rejects setting
            // a timeout at or below it)
            state.setTimeoutTimestamp(
              math.max(st.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
            (SessionOut(uid, st.startMs, st.lastMs, st.nEvents) :: closed)
              .reverseIterator
          }
      }
  }

  /** Streaming twin of the batch anomaly detector
    * (graft.operators.Events.anomalyZscore): each (event_type, hour)
    * count scored against the trailing 24 OBSERVED hours' mean and
    * sample stddev the moment the watermark closes the hour. An hour is
    * scored exactly once, against exactly the baseline the batch window
    * (rowsBetween(-24,-1) per type, hours in event-time order) would
    * give it, so append mode is sound and the batch query is the oracle.
    *
    * State at 100 TB: per event TYPE (a small closed set — this is the
    * smallest-keyed operator in the file): the open hours the watermark
    * still admits (bounded by the watermark delay) plus <= 24 finalized
    * counts. An event-time timeout fires when the watermark passes the
    * earliest open hour's end, so quiet types still finalize and score
    * their hours without waiting for their next event.
    *
    * Timezone coupling: hours are bucketed by UTC epoch-ms floor
    * (ts % 3600000), while the batch oracle's date_trunc("hour")
    * truncates in the SESSION timezone — they agree because every
    * session builder in this repo pins spark.sql.session.timeZone=UTC
    * (any whole-hour-offset zone would also agree; a half-hour zone
    * like Asia/Kolkata would silently diverge). The require below makes
    * the coupling explicit instead of ambient. */
  def anomalyZscore(events: Dataset[Event], minBaseline: Int = 8,
                    maxTrailing: Int = 24): Dataset[ZScoreOut] = {
    require(minBaseline >= 2, s"need >= 2 baseline points, got $minBaseline")
    // see the timezone-coupling note above: epoch-hour flooring matches
    // the batch oracle's date_trunc only under a whole-hour-offset zone
    val tz = java.util.TimeZone.getTimeZone(
      events.sparkSession.conf.get("spark.sql.session.timeZone", "UTC"))
    require(tz.getRawOffset % 3600000 == 0 && tz.getDSTSavings % 3600000 == 0,
      s"anomalyZscore buckets hours by UTC epoch floor; session timezone " +
        s"${tz.getID} has a non-whole-hour offset (raw or DST) and would " +
        "diverge from the batch date_trunc oracle")
    import events.sparkSession.implicits._

    def finalize(typ: String, st: ZScoreState, wmMs: Long): (ZScoreState, List[ZScoreOut]) = {
      val (closable, open) = st.open.partition { case (h, _) => h + 3600000L <= wmMs }
      var ring = st.ring
      var out = List.empty[ZScoreOut]
      // ascending event-time order — the batch window's frame order
      closable.toSeq.sortBy(_._1).foreach { case (h, n) =>
        val base = ring.take(maxTrailing)
        if (base.size >= minBaseline) {
          val mean = base.sum.toDouble / base.size
          val varS = base.map(x => (x - mean) * (x - mean)).sum / (base.size - 1)
          val std = math.sqrt(varS)
          if (std > 0) {
            val z = java.math.BigDecimal.valueOf((n - mean) / std)
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
            out ::= ZScoreOut(typ, h / 1000L, n, z)
          }
        }
        ring = (n :: ring).take(maxTrailing)
      }
      (ZScoreState(open, ring), out.reverse)
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[ZScoreState, ZScoreOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (typ: String, it: Iterator[Event], state: GroupState[ZScoreState]) =>
          val prior = state.getOption.getOrElse(ZScoreState(Map.empty, Nil))
          val merged =
            if (state.hasTimedOut) prior
            else {
              var open = prior.open
              it.foreach { e =>
                val h = e.ts.getTime - e.ts.getTime % 3600000L
                open = open.updated(h, open.getOrElse(h, 0L) + 1L)
              }
              prior.copy(open = open)
            }
          val (st, hits) = finalize(typ, merged, state.getCurrentWatermarkMs())
          state.update(st)
          // re-arm to the earliest still-open hour's end so the score
          // fires as soon as the watermark closes it; clamped a tick
          // past the watermark (the API rejects <= wm)
          if (st.open.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              st.open.keys.min + 3600000L, state.getCurrentWatermarkMs() + 1))
          hits.iterator
      }
  }

  /** Streaming twin of the EWMA deviation detector's scored core
    * (graft.operators.Events.ewmaScoredFrom — the batch operator's
    * top-20 stays a batch/serving concern, the rfmRunning convention):
    * each hour an event type's watermark closes is scored against the
    * exponentially-weighted average of its trailing <= `lookback`
    * PRESENT closed hours, weights decay^(hour lag - 1) renormalized
    * over the hours actually present — gap hours are MISSING, not
    * zero, exactly the batch semantics, which is why the state ring
    * carries (hour, n) PAIRS (a gap shifts every lag).
    *
    * Arithmetic parity: per-pair weight and weighted term are rounded
    * to 12 (HALF_UP) and summed in BigDecimal — the batch DECIMAL(38,12)
    * sums — then ewma and deviation round to 6 from the same doubles,
    * so streamed rows equal the batch frame row-for-row on closed
    * hours (StreamingSpec pins it with exceptAll both ways).
    *
    * State at 100 TB: per event TYPE, the watermark-open hour counts
    * plus <= `lookback` (hour, count) pairs — the smallest-keyed state
    * in the file alongside [[anomalyZscore]], whose open/finalize/
    * timeout skeleton (and UTC whole-hour timezone coupling, asserted
    * below) this shares. */
  def ewmaMonitor(events: Dataset[Event], lookback: Int = 24,
                  decay: Double = 0.7, minBaseline: Int = 8): Dataset[EwmaOut] = {
    require(lookback >= 1 && decay > 0 && decay < 1 && minBaseline >= 1,
      "need lookback >= 1, 0 < decay < 1, minBaseline >= 1")
    val tz = java.util.TimeZone.getTimeZone(
      events.sparkSession.conf.get("spark.sql.session.timeZone", "UTC"))
    require(tz.getRawOffset % 3600000 == 0 && tz.getDSTSavings % 3600000 == 0,
      s"ewmaMonitor buckets hours by UTC epoch floor; session timezone " +
        s"${tz.getID} has a non-whole-hour offset and would diverge " +
        "from the batch date_trunc oracle")
    import events.sparkSession.implicits._

    def r(d: Double, sc: Int): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(d).setScale(sc, java.math.RoundingMode.HALF_UP)

    def finalize(typ: String, st: EwmaState, wmMs: Long): (EwmaState, List[EwmaOut]) = {
      val (closable, open) = st.open.partition { case (h, _) => h + 3600000L <= wmMs }
      var ring = st.ring
      var out = List.empty[EwmaOut]
      closable.toSeq.sortBy(_._1).foreach { case (hMs, n) =>
        val h = hMs / 3600000L
        val base = ring.filter { case (h2, _) => h2 >= h - lookback && h2 < h }
        if (base.size >= minBaseline) {
          var num = java.math.BigDecimal.ZERO
          var den = java.math.BigDecimal.ZERO
          base.foreach { case (h2, x2) =>
            val wRaw = math.pow(decay, (h - h2 - 1).toDouble)
            den = den.add(r(wRaw, 12))
            num = num.add(r(wRaw * x2, 12))
          }
          val ewma = r(num.doubleValue() / den.doubleValue(), 6).doubleValue()
          val dev = r((n - ewma) / math.sqrt(ewma + 1.0), 6).doubleValue()
          out ::= EwmaOut(typ, hMs / 1000L, n, ewma, dev)
        }
        ring = ((h, n) :: ring).filter { case (h2, _) => h2 > h - lookback }
      }
      (EwmaState(open, ring), out.reverse)
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (typ: String, it: Iterator[Event], state: GroupState[EwmaState]) =>
          val prior = state.getOption.getOrElse(EwmaState(Map.empty, Nil))
          val merged =
            if (state.hasTimedOut) prior
            else {
              var open = prior.open
              it.foreach { e =>
                val h = e.ts.getTime - e.ts.getTime % 3600000L
                open = open.updated(h, open.getOrElse(h, 0L) + 1L)
              }
              prior.copy(open = open)
            }
          val (st, hits) = finalize(typ, merged, state.getCurrentWatermarkMs())
          state.update(st)
          if (st.open.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              st.open.keys.min + 3600000L, state.getCurrentWatermarkMs() + 1))
          hits.iterator
      }
  }

  /** Streaming twin of the RFM rollup's per-user core
    * (graft.operators.Events.rfm): a RUNNING recency/frequency/monetary
    * profile per purchasing user, refreshed on every purchase (update
    * mode). The batch operator's quintile BUCKETING stays a batch/serving
    * concern — boundaries are global order statistics, recomputed over
    * the profile table, not stream state.
    *
    * State at 100 TB: three longs per user active within `churnMs` — an
    * event-time timeout drops profiles the watermark has seen nothing
    * from for the churn window (the same boundary a lifecycle model
    * treats as churned), so state is O(recently-active purchasers), not
    * O(ever-seen). Monetary is EXACT CENTS, mirroring the batch
    * operator's determinism argument (double-sum partial-agg order
    * cannot flip a boundary user).
    *
    * Churn-reset semantics (INTENTIONAL lifecycle behavior, a
    * divergence from the batch full-history rollup): once a user's
    * state is dropped at the churn timeout, a later purchase restarts
    * freq/cents from zero — the profile describes the CURRENT activity
    * episode, not all history. Equality with the batch oracle therefore
    * holds only while the corpus span stays inside `churnMs`; the
    * StreamingSpec parity test passes churnMs explicitly larger than
    * its corpus span rather than relying on the default. */
  def rfmRunning(events: Dataset[Event], eventType: String = "purchase",
                 churnMs: Long = 90L * 24 * 3600 * 1000): Dataset[RfmOut] = {
    import events.sparkSession.implicits._
    events
      .filter(_.event_type == eventType)
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RfmState, RfmOut](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[RfmState]) =>
          if (state.hasTimedOut) {
            // churn boundary passed: every profile update was already
            // emitted — just forget the user
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(RfmState(Long.MinValue, 0L, 0L))
            it.foreach { e =>
              val cents = java.math.BigDecimal.valueOf(e.value * 100)
                .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
              st = RfmState(math.max(st.lastMs, e.ts.getTime), st.freq + 1L,
                st.cents + cents)
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(st.lastMs + churnMs, state.getCurrentWatermarkMs() + 1))
            Iterator(RfmOut(uid, st.lastMs, st.freq, st.cents))
          }
      }
  }

  /** Streaming twin of the SCD2 pair's serving half
    * (graft.operators.Relational.q42Scd2Intervals → is_current rows): a
    * RUNNING current-interval snapshot per key, maintained from the
    * change stream (update mode). Current = the (valid_from,
    * orderkey)-MAXIMAL change — exactly the row the batch lead() window
    * leaves open under its (valid_from ASC, orderkey ASC) order — and
    * max-merge is order-insensitive, so disorder WITHIN the stream never
    * corrupts the snapshot (a late change that doesn't dominate is
    * simply absorbed without emission). A row is emitted only when the
    * current interval actually changes, so the sink's last row per key
    * IS the batch snapshot.
    *
    * State at 100 TB: ONE fixed-size row per key active within
    * `retireMs` — an event-time timeout retires keys the watermark has
    * seen no change from for that long (a serving snapshot's state only
    * needs keys that may still update; emitted rows already live in the
    * sink). The contract mirrors every watermark: retireMs must exceed
    * the source's maximum disorder, because a change arriving AFTER its
    * key retired is judged only against later changes — it would be
    * re-emitted as current even if a dominating row had been emitted
    * before retirement. The parity test passes retireMs explicitly
    * wider than its corpus span rather than relying on the default. */
  /** STREAMING NEAR-DUP MAINTENANCE — the incremental-curation shape:
    * documents ARRIVING on the ingestion stream are checked against the
    * STANDING MinHash LSH index of the already-curated corpus, emitting
    * each (new doc, standing near-dup) pair as it is discovered. This is
    * the online half of [[graft.operators.Dedup.minhashLshPairs]]: batch
    * builds the index once; the stream keeps curation current without
    * re-running the corpus×corpus join.
    *
    * Parity is STRUCTURAL: both sides featurize through the single
    * [[graft.operators.Dedup.minhashDocFeatures]] definition (band keys +
    * exact-verify token-hash set), candidates join on the same
    * (band_id, band_key) equi key with the same first-shared-band
    * dedup, and the same exact-Jaccard verify filters them —
    * StreamingSpec asserts stream output == the batch pair join
    * restricted to (new × standing). Only new×standing pairs are in
    * scope by contract; new×new pairs within one arriving window are
    * the batch job's territory (or a stream-stream self-join, whose
    * state cost this maintenance path exists to avoid).
    *
    * State: NONE — a stream-static inner join is stateless (each
    * micro-batch probes the static side and forgets), asserted in
    * StreamingSpec. At 100 TB the index side is the pre-exploded
    * (band_id, band_key → doc) table bucketed by band_key, so each
    * micro-batch's probe is a broadcast-or-bucketed lookup, never a
    * corpus scan; the verify joins fetch only the candidates' token
    * sets. */
  def nearDupMaintenance(docs: Dataset[Doc], index: DataFrame,
                         threshold: Double = 0.9): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0,1], got $threshold")
    import graft.functions.SortedJaccardExpr
    import org.apache.spark.sql.graftbridge.Bridge
    import graft.operators.Dedup.Bands
    val feats = graft.operators.Dedup.minhashDocFeatures(
      docs.toDF().select($"doc_id", $"text"))
    def explodeBands(f: DataFrame): DataFrame = f.select(
      $"doc_id", $"bks", $"hb",
      explode(array((0 until Bands).map(b =>
        struct(lit(b).as("band_id"), element_at($"bks", b + 1).as("bk"))): _*)).as("b"))
      .select($"doc_id", $"bks", $"hb", $"b.band_id".as("band_id"), $"b.bk".as("bk"))
    val arriving = explodeBands(feats)
    val standing = explodeBands(index).select(
      $"doc_id".as("dup_doc_id"), $"bks".as("bks_s"), $"hb".as("hb_s"),
      $"band_id".as("band_id_s"), $"bk".as("bk_s"))
    // same first-shared-band candidate dedup as the batch pair join
    val noEarlierMatch = (0 until Bands - 1).map { e =>
      $"band_id" <= e || element_at($"bks", e + 1) =!= element_at($"bks_s", e + 1)
    }.reduce(_ && _)
    def sortedJaccard(a: Column, b: Column): Column =
      Bridge.column(SortedJaccardExpr(Bridge.expression(a), Bridge.expression(b)))
    arriving.join(standing,
        $"band_id" === $"band_id_s" && $"bk" === $"bk_s" &&
          $"doc_id" =!= $"dup_doc_id" && noEarlierMatch)
      .withColumn("jaccard", sortedJaccard($"hb", $"hb_s"))
      .filter($"jaccard" >= threshold)
      .select($"doc_id", $"dup_doc_id", round($"jaccard", 6).as("jaccard"))
  }

  def scd2Current(changes: Dataset[Change],
                  retireMs: Long = 365L * 24 * 3600 * 1000,
                  delay: String = "1 hour"): Dataset[Scd2Out] = {
    import changes.sparkSession.implicits._
    changes
      .withWatermark("ts", delay)
      .groupByKey(_.custkey)
      .flatMapGroupsWithState[Scd2State, Scd2Out](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[Change], state: GroupState[Scd2State]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prior = state.getOption
            var cur = prior
            var lastSeen = prior.map(_.lastSeenMs).getOrElse(Long.MinValue)
            it.foreach { c =>
              val ms = c.ts.getTime
              lastSeen = math.max(lastSeen, ms)
              val dominates = cur.forall(s =>
                ms > s.validFromMs ||
                  (ms == s.validFromMs && c.orderkey > s.orderkey))
              if (dominates)
                cur = Some(Scd2State(ms, c.orderkey, c.totalprice, lastSeen))
            }
            cur.foreach { s =>
              state.update(s.copy(lastSeenMs = lastSeen))
              state.setTimeoutTimestamp(math.max(
                lastSeen + retireMs, state.getCurrentWatermarkMs() + 1))
            }
            val changed = (cur, prior) match {
              case (Some(c), Some(p)) =>
                c.validFromMs != p.validFromMs || c.orderkey != p.orderkey
              case (Some(_), None) => true
              case _ => false
            }
            if (changed)
              cur.iterator.map(s =>
                Scd2Out(key, s.orderkey, s.totalprice, s.validFromMs))
            else Iterator.empty
          }
      }
  }
  /** STREAMING QUALITY-GATE MONITOR — per ingestion window, the Gopher
    * rule pass rate and per-rule failure counts over arriving
    * documents: the quality-drift alarm a live ingestion pipeline
    * watches (a falling pass_rate says the crawl went bad; WHICH
    * failure counter spiked says how — a bullet_frac spike is a nav-page
    * loop, an alpha spike is binary junk, a stop-word spike is
    * non-English drift). The per-document flags are the EXACT batch
    * gate ([[graft.operators.TextAnalysis.gopherRulesFrom]] — shared
    * stateless codegen core, so the monitor can never drift from the
    * gate it monitors; StreamingSpec asserts per-window equality with a
    * batch recomputation of the same slice).
    *
    * State at 100 TB: one row of 9 longs per open window — the flag
    * computation itself is stateless scan-speed codegen; the watermark
    * finalizes and drops closed windows. Update mode re-emits a window
    * whenever it absorbs new documents. */
  def qualityGateMonitor(docs: Dataset[Doc],
                         windowLen: String = "1 hour"): DataFrame = {
    val flagged = graft.operators.TextAnalysis.gopherFlagCols(
      docs.withWatermark("ingest_ts", "2 hours").toDF())
    def fails(c: Column): Column = sum(when(!c, 1L).otherwise(0L))
    flagged.groupBy(window($"ingest_ts", windowLen))
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"gopher_pass", 1L).otherwise(0L)).as("n_pass"),
        fails($"r_word_count").as("f_word_count"),
        fails($"r_mean_word_len").as("f_mean_word_len"),
        fails($"r_symbol").as("f_symbol"),
        fails($"r_bullet").as("f_bullet"),
        fails($"r_ellipsis").as("f_ellipsis"),
        fails($"r_alpha").as("f_alpha"),
        fails($"r_stop").as("f_stop"))
      .select(unix_timestamp($"window.start").as("window_ts"),
        $"n_docs", $"n_pass",
        round($"n_pass".cast("double") / $"n_docs", 6).as("pass_rate"),
        $"f_word_count", $"f_mean_word_len", $"f_symbol", $"f_bullet",
        $"f_ellipsis", $"f_alpha", $"f_stop")
  }

  /** STREAMING SOURCE/QUALITY-CLASSIFIER ROUTER — the ingestion-time
    * half of [[graft.operators.TextAnalysis.sourceNb]], the second
    * instance of the [[langIdRouter]] pattern: arriving documents are
    * scored against the STATIC trained integer micro-nat NB model
    * (collected offline by [[graft.operators.TextAnalysis
    * .sourceNbModelOf]], redeployed by restarting the query). Emits one
    * row per arriving doc: (doc_id, ingest_ts, source_pred,
    * best_score_micro, margin_micro) with the batch operator's exact
    * integer arithmetic and (score desc, class asc) tie-break — a
    * provenance/quality gate at the crawl's front door.
    *
    * Shape: the O(V·C)-long model rides inside
    * [[graft.functions.NbScoreExpr]] as plan constants, so the stream
    * is a STATELESS projection — no state store, no watermark, no
    * shuffle, append mode, unbounded throughput (the langid-router
    * 100 TB ingestion shape). An empty model degrades to an 'und'
    * prediction with null scores, like an empty-train batch run has no
    * classes to score. */
  def nbRouter(docs: Dataset[Doc], spark: SparkSession,
               modelPath: String): DataFrame =
    nbRouter(docs,
      graft.operators.TextAnalysis.loadNbModel(spark, modelPath))

  def nbRouter(docs: Dataset[Doc],
               model: (IndexedSeq[String], IndexedSeq[Long],
                 Map[String, IndexedSeq[Long]])): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val (classes, priors, weights) = model
    if (classes.isEmpty) {
      docs.toDF().select($"doc_id", $"ingest_ts",
        lit("und").as("source_pred"),
        lit(null).cast("long").as("best_score_micro"),
        lit(null).cast("long").as("margin_micro"))
    } else {
      val score = Bridge.column(graft.functions.NbScoreExpr(
        Bridge.expression($"text"), classes, priors, weights))
      docs.toDF()
        .select($"doc_id", $"ingest_ts", score.as("r"))
        .select($"doc_id", $"ingest_ts",
          $"r"("source_pred").as("source_pred"),
          $"r"("best_score_micro").as("best_score_micro"),
          $"r"("margin_micro").as("margin_micro"))
    }
  }

  /** STREAMING BPE PIECE PRICER — the ingestion-time half of
    * [[graft.operators.TextAnalysis.bpeDocPieces]], the third instance
    * of the stateless trained-model-router pattern: arriving documents
    * are priced against the STATIC learned merge list via
    * [[graft.functions.BpeCountExpr]] (each merge applied as one greedy
    * left-to-right pass in rank order — the trainer's discipline, so
    * batch and stream price every token identically). Emits
    * (doc_id, ingest_ts, n_tokens, n_pieces, pieces_per_token) per
    * arriving doc — the number packing/truncation/billing decisions
    * read at the crawl's front door. No state store, no shuffle,
    * append mode. */
  def bpeRouter(docs: Dataset[Doc], spark: SparkSession,
                mergesPath: String): DataFrame =
    bpeRouter(docs,
      graft.operators.TextAnalysis.loadBpeMerges(spark, mergesPath))

  def bpeRouter(docs: Dataset[Doc],
                merges: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val cnt = Bridge.column(graft.functions.BpeCountExpr(
      Bridge.expression($"text"), merges))
    docs.toDF()
      .select($"doc_id", $"ingest_ts", cnt.as("r"))
      .select($"doc_id", $"ingest_ts",
        $"r"("n_tokens").as("n_tokens"),
        $"r"("n_pieces").as("n_pieces"),
        when($"r"("n_tokens") > 0L,
          round($"r"("n_pieces").cast("double") / $"r"("n_tokens"), 6))
          .otherwise(lit(null).cast("double")).as("pieces_per_token"))
  }

  /** STREAMING LANGUAGE ROUTER — the ingestion-time half of
    * [[graft.operators.TextAnalysis.langIdNgram]]: arriving documents
    * scored against a STATIC trained rank-profile model (the
    * (lang, gram, lrank) frame [[graft.operators.TextAnalysis
    * .langProfileOf]] builds — retrained offline, redeployed by
    * restarting the query, the standard model-rollout seam). Emits one
    * row per arriving doc: (doc_id, ingest_ts, lang_pred, best_dist,
    * margin) with the batch operator's exact integer arithmetic and
    * tie-breaks — the routing/quarantine decision at the crawl's front
    * door rather than in the nightly batch.
    *
    * Shape: the O(|langs|·K)-row model collapses into the
    * [[graft.functions.LangIdScoreExpr]] per-row kernel carried by the
    * plan, so the stream is a STATELESS projection — no state store,
    * no watermark, no shuffle, append-mode, unbounded throughput. The
    * batch form's groupBy/window would drag watermark semantics and a
    * state store into what is per-row work on this seam. */
  def langIdRouter(docs: Dataset[Doc], spark: SparkSession,
                   profilePath: String): DataFrame =
    langIdRouter(docs,
      graft.operators.TextAnalysis.loadLangProfile(spark, profilePath))

  def langIdRouter(docs: Dataset[Doc], langProf: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    import graft.operators.TextAnalysis.{DocProfK, LangProfK}
    val rows = langProf.collect() // static model: O(|langs|·K) rows
    if (rows.isEmpty) {
      // An empty model (training split produced no profiles) must not
      // be a restart-time crash seam: the BATCH scorer degrades to
      // all-'und' predictions in the same situation, so the router
      // mirrors that — every arriving doc routes to the abstention
      // bucket until a retrained model is rolled out.
      docs.toDF().select($"doc_id", $"ingest_ts",
        lit("und").as("lang_pred"),
        lit(null).cast("long").as("best_dist"),
        lit(null).cast("long").as("margin"))
    } else {
      val profiles = rows.groupBy(_.getString(0)).toSeq
        .map { case (l, rs) =>
          l -> rs.map(r => r.getString(1) -> r.getInt(2)).toMap }
        .sortBy(_._1)
      val score = Bridge.column(graft.functions.LangIdScoreExpr(
        Bridge.expression($"text"), profiles, LangProfK, DocProfK))
      docs.toDF()
        .select($"doc_id", $"ingest_ts", score.as("r"))
        .select($"doc_id", $"ingest_ts",
          coalesce($"r"("lang_pred"), lit("und")).as("lang_pred"),
          $"r"("best_dist").as("best_dist"),
          $"r"("margin").as("margin"))
    }
  }

  /** STREAMING IVF INGESTION ROUTER — the ingestion-time half of
    * [[graft.operators.Similarity.ivfAppend]], the fourth instance of
    * the stateless trained-model-router pattern: arriving vectors are
    * assigned to their nearest STANDING centroid (the persisted index
    * artifact [[graft.operators.Similarity.ivfCentroidVecs]] builds —
    * retrained offline when [[graft.operators.Similarity.ivfAppend]]'s
    * `cos_drift` or the recall-drift audit says so, redeployed by
    * restarting the query, the standard model-rollout seam). This IS
    * what "the index ingests daily" means at 100 TB: the batch append
    * report prices staleness nightly; this seam routes each vector the
    * moment it arrives. Emits (vec_id, ingest_ts, bucket, cos_sim) per
    * arriving vector, bit-identical to the batch assignment
    * ([[graft.operators.Similarity.assignToCentroids]] — same fused
    * cosine, same round-4, same (cos desc, bucket asc) tie-break;
    * parity asserted in StreamingSpec).
    *
    * Shape: the ≤2^nBits-row centroid table rides inside
    * [[graft.functions.NearestCentroidExpr]] as plan constants, so the
    * stream is a STATELESS projection — no state store, no watermark,
    * no shuffle, append mode, unbounded throughput. An EMPTY centroid
    * table (no standing index yet) degrades to null routing — vectors
    * pass through unrouted until an index is rolled out, never a
    * restart-time crash. The production deployment passes the
    * PERSISTED artifact path (the parquet
    * [[graft.operators.Similarity.writeIvfIndex]] wrote at train time)
    * via the path overload — every restart re-loads the standing index
    * from storage, never from a live upstream plan. */
  def ivfRouter(vecs: Dataset[Vec], spark: SparkSession,
                indexPath: String): DataFrame =
    ivfRouter(vecs,
      graft.operators.Similarity.loadIvfIndex(spark, indexPath))

  def ivfRouter(vecs: Dataset[Vec], centroids: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    // static model: ≤2^nBits rows, ascending buckets (the tie-break order)
    val rows = centroids.select($"bucket", $"cv").collect()
    if (rows.isEmpty) {
      vecs.toDF().select($"vec_id", $"ingest_ts",
        lit(null).cast("long").as("bucket"),
        lit(null).cast("double").as("cos_sim"))
    } else {
      val model = rows
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
        .sortBy(_._1)
      val nearest = Bridge.column(graft.functions.NearestCentroidExpr(
        Bridge.expression($"embedding".cast("array<double>")),
        model.map(_._1).toIndexedSeq, model.map(_._2).toIndexedSeq))
      vecs.toDF()
        .select($"vec_id", $"ingest_ts", nearest.as("r"))
        .select($"vec_id", $"ingest_ts",
          $"r"("bucket").as("bucket"),
          $"r"("cos_sim").as("cos_sim"))
    }
  }

  /** STREAMING PQ ENCODE ROUTER — the fine-quantizer companion to
    * [[ivfRouter]], fifth instance of the stateless
    * trained-model-router pattern: arriving vectors are ENCODED on
    * arrival against the STANDING trained PQ codebook (the persisted
    * artifact [[graft.operators.Similarity.pqCodebookTable]] builds;
    * retrained offline when [[graft.operators.Similarity.pqAppend]]'s
    * MSE-drift report says so, redeployed by restarting the query).
    * Together the two routers are the full write path of a 100 TB
    * vector index: coarse bucket + compressed codes assigned the
    * moment a vector arrives, so the stored row is index-ready and the
    * nightly batch only prices drift. Emits (vec_id, ingest_ts, codes,
    * d2s) — the 4-bit code per subspace plus each subspace's
    * reconstruction SSE (the per-row audit trail the MSE report
    * aggregates), bit-identical to the batch encode
    * ([[graft.operators.Similarity.pqEncode]]; parity asserted in
    * StreamingSpec).
    *
    * Shape: the ≤128-row codebook rides inside
    * [[graft.functions.PqEncodeExpr]] as plan constants — STATELESS
    * projection, no state store, no shuffle, append mode. An EMPTY
    * codebook (no trained index yet) degrades to null codes — vectors
    * pass through unencoded until a codebook is rolled out, never a
    * restart-time crash. Like [[ivfRouter]], the production deployment
    * passes the PERSISTED artifact path
    * ([[graft.operators.Similarity.writePqCodebook]]'s parquet) via
    * the path overload. */
  def pqRouter(vecs: Dataset[Vec], spark: SparkSession,
               codebookPath: String): DataFrame =
    pqRouter(vecs,
      graft.operators.Similarity.loadPqCodebook(spark, codebookPath))

  def pqRouter(vecs: Dataset[Vec], codebook: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    // static model: ≤128 rows grouped per subspace, ascending codes
    val rows = codebook.select($"sub", $"code", $"cv").collect()
    if (rows.isEmpty) {
      vecs.toDF().select($"vec_id", $"ingest_ts",
        lit(null).cast("array<long>").as("codes"),
        lit(null).cast("array<double>").as("d2s"))
    } else {
      val bySub = rows
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toIndexedSeq))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (s, es) =>
          val sorted = es.sortBy(_._2)
          (s.toInt, sorted.map(_._2).toIndexedSeq,
            sorted.map(_._3).toIndexedSeq)
        }
      val enc = Bridge.column(graft.functions.PqEncodeExpr(
        Bridge.expression($"embedding".cast("array<double>")),
        bySub.map(_._1).toIndexedSeq,
        bySub.map(_._2).toIndexedSeq,
        bySub.map(_._3).toIndexedSeq,
        graft.operators.Similarity.pqSubspaceDim))
      vecs.toDF()
        .select($"vec_id", $"ingest_ts", enc.as("r"))
        .select($"vec_id", $"ingest_ts",
          $"r"("codes").as("codes"),
          $"r"("d2s").as("d2s"))
    }
  }
}
