package graft.streaming

import graft.SparkSpec
import graft.operators.Events
import graft.sources.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twins must agree with their batch oracles when fed the same
  * events (MemoryStream, multiple micro-batches to exercise state), and
  * their state must be BOUNDED — eviction is asserted, not assumed. */
class StreamingSpec extends SparkSpec {

  /** Suite-scoped checkpoint root, deleted in afterAll — no /tmp litter
    * accumulating across test runs. */
  private val ckptRoot =
    java.nio.file.Files.createTempDirectory("graft-ckpt-").toFile

  private def ckpt(tag: String): String =
    s"${ckptRoot.getAbsolutePath}/$tag-${System.nanoTime()}"

  override def afterAll(): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(ckptRoot)
    super.afterAll()
  }

  private def loadEvents(): Seq[Event] = {
    import spark.implicits._
    Tables.events(spark, Sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().toSeq.sortBy(e => (e.ts.getTime, e.event_id))
  }

  /** Final per-user totals derived from the session-segment stream: the
    * last (max-end) emission per (user, session_start), then count/sum. */
  private def totalsFromSegments(table: String) =
    spark.table(table)
      .groupBy("user_id", "session_start")
      .agg(max("session_end").as("session_end"), max("n_events").as("n_ev"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_ev").as("n_events"))

  test("stream-static enrichment equals the batch join, stateless") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val events = loadEvents()
    // the static dim: per-user historical totals from the batch table
    val dim = Tables.events(spark, Sf).groupBy($"user_id")
      .agg(round(sum($"value"), 2).as("user_total"))
    val stream = MemoryStream[Event]
    val query = Streams.enrichWithUserTotals(stream.toDS(), dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append")
      .option("checkpointLocation", ckpt("en"))
      .start()
    try {
      val third = events.size / 3
      Seq(events.take(third), events.slice(third, 2 * third), events.drop(2 * third))
        .foreach { b => stream.addData(b); query.processAllAvailable() }
      val streamed = spark.table("enriched")
      val batch = Tables.events(spark, Sf)
        .join(dim, Seq("user_id"), "left")
        .select($"event_id", $"user_id", $"event_type", $"value",
          coalesce($"user_total", lit(0.0)).as("user_total"))
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
      // stateless: the join keeps NO state store rows across batches
      assert(query.lastProgress.stateOperators.isEmpty,
        "stream-static join should not allocate a state store")
    } finally query.stop()
  }

  test("streaming hourlyAgg equals the batch aggregate") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val events = loadEvents()
    val stream = MemoryStream[Event]
    val query = Streams.hourlyAgg(stream.toDF())
      .writeStream.format("memory").queryName("hourly_stream")
      .outputMode("complete").start()
    try {
      // two micro-batches: state must carry across
      val (b1, b2) = events.splitAt(events.size / 2)
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
      val streamed = spark.table("hourly_stream")
        .select("hour_ts", "event_type", "n", "sum_value")
        .collect().map(_.toSeq).toSet
      val batch = Events.hourlyAgg(spark, Sf).collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally query.stop()
  }

  test("windowed type counts (update mode) roll up to the batch top-type query") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val events = loadEvents()
    val stream = MemoryStream[Event]
    val query = Streams.typeCounts(stream.toDF())
      .writeStream.format("memory").queryName("type_counts_stream")
      .outputMode("update")
      .option("checkpointLocation", ckpt("tc"))
      .start()
    try {
      val (b1, b2) = events.splitAt(events.size / 2)
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
      // update mode re-emits a window's row as it grows; the final value
      // per (window, user, type) is the max (counts only increase)
      val perWindow = spark.table("type_counts_stream")
        .groupBy("window_ts", "user_id", "event_type")
        .agg(max("n").as("n"))
      val totals = perWindow.groupBy("user_id", "event_type")
        .agg(sum("n").as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"n".desc, $"event_type".asc)
      val streamedTop = totals
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" === 1).select("user_id", "event_type", "n")
      val batchTop = Events.topTypePerUser(spark, Sf)
      assert(streamedTop.exceptAll(batchTop).isEmpty && batchTop.exceptAll(streamedTop).isEmpty)
    } finally query.stop()
  }

  test("stateful top-type-per-user converges to the batch argmax") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val events = loadEvents()
    val stream = MemoryStream[Event]
    val query = Streams.topTypePerUser(stream.toDS())
      .writeStream.format("memory").queryName("top_type_stream")
      .outputMode("update")
      .option("checkpointLocation", ckpt("tt"))
      .start()
    try {
      val (b1, b2) = events.splitAt(events.size / 2)
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
      // per-user emissions have non-decreasing n, and within the maximal
      // n the tie-set minimum only ever decreases — so (max n, then min
      // type) is exactly the LAST emission, i.e. the final state's top
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"n".desc, $"event_type".asc)
      val streamedTop = spark.table("top_type_stream")
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" === 1).select("user_id", "event_type", "n")
      val batchTop = Events.topTypePerUser(spark, Sf)
      assert(streamedTop.exceptAll(batchTop).isEmpty && batchTop.exceptAll(streamedTop).isEmpty)
    } finally query.stop()
  }

  test("top-type state is EVICTED after the idle window; ties break type-asc") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val t0 = 1700000000000L
    def ev(id: Long, user: Long, ms: Long, tpe: String) =
      Event(id, new java.sql.Timestamp(ms), user, tpe, 1.0)
    val stream = MemoryStream[Event]
    val query = Streams.topTypePerUser(stream.toDS(), idleTimeoutMs = 1800000L)
      .writeStream.format("memory").queryName("top_type_evict")
      .outputMode("update")
      .option("checkpointLocation", ckpt("tte"))
      .start()
    try {
      // user 1: b,b,a — then a catches up to the tie, top flips to 'a'
      stream.addData(Seq(
        ev(1, 1L, t0, "b"), ev(2, 1L, t0 + 1000, "b"), ev(3, 1L, t0 + 2000, "a")))
      query.processAllAvailable()
      stream.addData(Seq(ev(4, 1L, t0 + 3000, "a")))
      query.processAllAvailable()
      // user 2 far enough ahead that the watermark passes user 1's
      // last activity + the 30min idle window
      stream.addData(Seq(ev(5, 2L, t0 + 4 * 3600 * 1000L, "c")))
      query.processAllAvailable()
      stream.addData(Seq(ev(6, 2L, t0 + 5 * 3600 * 1000L, "c")))
      query.processAllAvailable() // timeout fires: user 1 removed
      val stateRows = query.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows === 1L, s"expected only user 2 in state, got $stateRows rows")
      val u1 = spark.table("top_type_evict").filter($"user_id" === 1L)
        .select($"event_type", $"n").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(u1 === Set(("b", 2L), ("a", 2L)), s"got $u1")
    } finally query.stop()
  }

  test("watermark drops events later than the 2h bound (append semantics)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val events = loadEvents()
    val stream = MemoryStream[Event]
    val query = Streams.hourlyAgg(stream.toDF())
      .writeStream.format("memory").queryName("hourly_wm")
      .outputMode("append")
      .option("checkpointLocation", ckpt("wm"))
      .start()
    try {
      // feed everything, then a straggler 3h older than the max event time:
      // its window is below the watermark, so append mode must never emit it
      stream.addData(events); query.processAllAvailable()
      val maxTs = events.map(_.ts.getTime).max
      val straggler = Event(999999L, new java.sql.Timestamp(maxTs - 3 * 3600 * 1000L),
        42L, "late_type", 1.0)
      stream.addData(Seq(straggler)); query.processAllAvailable()
      // advance event time so closed windows flush
      stream.addData(Seq(Event(999998L, new java.sql.Timestamp(maxTs + 4 * 3600 * 1000L),
        42L, "flush_type", 1.0)))
      query.processAllAvailable()
      val emitted = spark.table("hourly_wm").filter($"event_type" === "late_type").count()
      assert(emitted === 0L, "late event leaked past the watermark")
      // sanity: closed windows did flush
      assert(spark.table("hourly_wm").count() > 0L)
    } finally query.stop()
  }

  test("sessionize sorts out-of-order events WITHIN a batch (contract)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val events = loadEvents()
    val shuffled = new scala.util.Random(7).shuffle(events) // one chaotic batch
    val stream = MemoryStream[Event]
    val query = Streams.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("sessions_shuffled")
      .outputMode("update")
      .option("checkpointLocation", ckpt("sh"))
      .start()
    try {
      stream.addData(shuffled); query.processAllAvailable()
      val streamed = totalsFromSegments("sessions_shuffled")
      val batch = Events.sessionize(spark, Sf)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    } finally query.stop()
  }

  test("streaming sessionize equals the batch sessionization") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val events = loadEvents() // event-time order, the documented contract
    val stream = MemoryStream[Event]
    val query = Streams.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("update")
      .option("checkpointLocation", ckpt("x"))
      .start()
    try {
      val third = events.size / 3
      Seq(events.take(third), events.slice(third, 2 * third), events.drop(2 * third))
        .foreach { b => stream.addData(b); query.processAllAvailable() }
      val streamed = totalsFromSegments("sessions_stream")
      val batch = Events.sessionize(spark, Sf)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    } finally query.stop()
  }

  test("hourlyAgg runs from a FILE STREAM over the partitioned events layout") {
    import spark.implicits._
    // the deployment seam: readStream over the hive-partitioned directory
    // (explicit schema — file streams cannot infer), same transform object
    val dir = graft.sources.Layout.ensureEventsByDate(spark, Sf)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val query = Streams.hourlyAgg(stream)
      .writeStream.format("memory").queryName("hourly_file")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("hourly_file")
        .select("hour_ts", "event_type", "n", "sum_value")
        .collect().map(_.toSeq).toSet
      val batch = Events.hourlyAgg(spark, Sf).collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally query.stop()
  }

  test("streaming near-dup maintenance equals the batch pair join " +
    "restricted to new x standing, stateless") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val t0 = 1700000000000L
    // split the corpus: standing index from 3/4 of docs, the rest ARRIVE
    val all = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val isNew = Tables.documents(spark, Sf)
      .filter(graft.functions.EngineNeutral.hash60($"doc_id".cast("string")) % 4 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val standing = Tables.documents(spark, Sf).select($"doc_id", $"text")
      .filter(!$"doc_id".isin(isNew.toSeq: _*))
    val index = graft.operators.Dedup.minhashDocFeatures(standing)
    val arriving = all.filter(d => isNew(d._1)).zipWithIndex.map {
      case ((id, tx), i) => Doc(id, tx, new java.sql.Timestamp(t0 + i * 1000L)) }
    val stream = MemoryStream[Doc]
    val query = Streams.nearDupMaintenance(stream.toDS(), index)
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt("nd"))
      .start()
    try {
      val (b1, b2) = arriving.splitAt(arriving.size / 2)
      stream.addData(b1.toSeq); query.processAllAvailable()
      stream.addData(b2.toSeq); query.processAllAvailable()
      val streamed = spark.table("neardup_stream").collect()
        .map { r =>
          val (a, b) = (r.getLong(0), r.getLong(1))
          (math.min(a, b), math.max(a, b), r.getDouble(2)) }.toSet
      // batch pairs with exactly one endpoint among the arriving docs
      val batch = graft.operators.Dedup.minhashLshPairs(spark, Sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .filter { case (a, b, _) => isNew(a) ^ isNew(b) }.toSet
      assert(batch.nonEmpty, "fixture split produced no cross pairs")
      assert(streamed === batch,
        s"stream ${streamed.size} pairs != batch-restricted ${batch.size}")
      // stream-static join is stateless: no state store operators at all
      assert(query.lastProgress.stateOperators.isEmpty,
        "near-dup maintenance must hold no state")
    } finally query.stop()
  }

  test("windowed ngram counts roll up to the batch top-k vocabulary") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the harness corpus with synthetic ingest stamps spread over 3 windows
    val t0 = 1700000000000L
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .zipWithIndex.map { case (r, i) =>
        Doc(r.getLong(0), r.getString(1),
          new java.sql.Timestamp(t0 + (i % 3) * 3600 * 1000L))
      }.toSeq
    val stream = MemoryStream[Doc]
    val query = Streams.ngramCounts(stream.toDS())
      .writeStream.format("memory").queryName("ngram_stream")
      .outputMode("update")
      .option("checkpointLocation", ckpt("ng"))
      .start()
    try {
      val (b1, b2) = docs.splitAt(docs.size / 2)
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
      // final count per (window, gram) = max over update-mode re-emissions;
      // all-time totals are the cross-window sum, ranked like the batch op
      val w = org.apache.spark.sql.expressions.Window
        .orderBy($"n".desc, $"gram".asc)
      val streamedTop = spark.table("ngram_stream")
        .groupBy("window_ts", "gram").agg(max("n").as("n"))
        .groupBy("gram").agg(sum("n").as("n"))
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 20).select("gram", "n")
      val batchTop = graft.operators.TextAnalysis.ngramCounts(spark, Sf)
      assert(streamedTop.exceptAll(batchTop).isEmpty &&
        batchTop.exceptAll(streamedTop).isEmpty)
    } finally query.stop()
  }

  test("streaming CMS maintenance: per-window matrix equals the batch " +
    "sketch cell-for-cell; state bounded by windows x d*w") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val t0 = 1700000000000L
    val nWin = 3
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .zipWithIndex.map { case (r, i) =>
        Doc(r.getLong(0), r.getString(1),
          new java.sql.Timestamp(t0 + (i % nWin) * 3600 * 1000L))
      }.toSeq
    val stream = MemoryStream[Doc]
    val query = Streams.cmsMaintenance(stream.toDS())
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("update")
      .option("checkpointLocation", ckpt("cms"))
      .start()
    try {
      val (b1, b2) = docs.splitAt(docs.size / 2)
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
      // final cell value = max over update-mode re-emissions
      val streamed = spark.table("cms_stream")
        .groupBy("window_ts", "j", "bucket").agg(max("cnt").as("cnt"))
      // batch sketch of the same slices: same tokens, same seeded hashes
      val winOf = docs.zipWithIndex
        .map { case (d, _) =>
          d.doc_id -> (d.ingest_ts.getTime / 1000 / 3600) * 3600 }.toMap
      val batch = Tables.documents(spark, Sf)
        .select($"doc_id",
          explode(graft.functions.EngineNeutral.wsTokens(lower($"text")))
            .as("token"))
        .select($"doc_id", $"token",
          explode(array((0 until 4).map(lit): _*)).as("j"))
        .select($"doc_id", $"j",
          (graft.functions.EngineNeutral.hash60(
            concat($"token", lit("#cms"), $"j".cast("string"))) % 1024)
            .as("bucket"))
        .collect()
        .map(r => (winOf(r.getLong(0)), r.getInt(1).toLong, r.getLong(2)))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val got = streamed.collect()
        .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)) -> r.getLong(3))
        .toMap
      assert(got === batch, "streamed matrix diverges from the batch sketch")
      // bounded state: never more cells than windows x d*w, and far fewer
      // distinct cells than distinct (window, token) pairs would need
      assert(got.size <= nWin * 4 * 1024)
      val st = query.lastProgress.stateOperators
      assert(st.nonEmpty && st.head.numRowsTotal <= nWin.toLong * 4 * 1024,
        s"state ${if (st.isEmpty) -1 else st.head.numRowsTotal} exceeds d*w bound")
    } finally query.stop()
  }

  test("streaming HLL maintenance: per-window registers equal the batch " +
    "sketch exactly; state bounded by windows x 256") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val t0 = 1700000000000L
    val nWin = 3
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .zipWithIndex.map { case (r, i) =>
        Doc(r.getLong(0), r.getString(1),
          new java.sql.Timestamp(t0 + (i % nWin) * 3600 * 1000L))
      }.toSeq
    val stream = MemoryStream[Doc]
    val query = Streams.hllMaintenance(stream.toDS())
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("update")
      .option("checkpointLocation", ckpt("hll"))
      .start()
    try {
      val (b1, b2) = docs.splitAt(docs.size / 2)
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
      // final register value = max over update-mode re-emissions
      val streamed = spark.table("hll_stream")
        .groupBy("window_ts", "reg").agg(max("mj").as("mj")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // batch registers of the same slices via the shared batch operator
      // (window label standing in for the source key)
      val winMap = docs
        .map(d => d.doc_id -> d.ingest_ts.getTime / 1000 / 3600 * 3600)
        .toDF("doc_id", "win")
      val batch = graft.operators.Dedup.hllRegistersFrom(
        Tables.documents(spark, Sf)
          .select($"doc_id", $"text").join(winMap, "doc_id")
          .withColumn("source", $"win".cast("string")))
        .collect()
        .map(r => (r.getString(0).toLong, r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed === batch, "streamed registers diverge from batch sketch")
      assert(streamed.size <= nWin * 256)
      val st = query.lastProgress.stateOperators
      assert(st.nonEmpty && st.head.numRowsTotal <= nWin.toLong * 256,
        s"state exceeds the 256-registers-per-window bound")
    } finally query.stop()
  }

  test("streaming dedup keeps one survivor per batch fingerprint group") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val t0 = 1700000000000L
    val texts = Tables.documents(spark, Sf)
      .select($"doc_id", $"text").collect().map(r => (r.getLong(0), r.getString(1)))
    val stream = MemoryStream[Doc]
    val query = Streams.dedupByFingerprint(stream.toDS())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt("dd"))
      .start()
    try {
      // every doc delivered TWICE (at-least-once upstream), split so the
      // re-deliveries land in a later micro-batch — state must carry
      val once = texts.map { case (id, tx) => Doc(id, tx, new java.sql.Timestamp(t0)) }
      val again = texts.map { case (id, tx) =>
        Doc(id + 1000000L, tx, new java.sql.Timestamp(t0 + 60000L)) }
      stream.addData(once.toSeq); query.processAllAvailable()
      stream.addData(again.toSeq); query.processAllAvailable()
      val streamed = spark.table("dedup_stream")
      // one survivor per distinct fingerprint, same fingerprint set as batch
      assert(streamed.groupBy("fp").count().filter($"count" > 1).count() === 0L)
      val batchFps = graft.operators.Dedup.exact(spark, Sf)
        .select("fp").collect().map(_.getString(0)).toSet
      val streamFps = streamed.select("fp").collect().map(_.getString(0)).toSet
      assert(streamFps === batchFps)
      // first arrival kept: every survivor is from the original delivery
      assert(streamed.filter($"doc_id" >= 1000000L).count() === 0L)
    } finally query.stop()
  }

  test("streaming dedup state is EVICTED once the watermark passes") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val t0 = 1700000000000L
    val stream = MemoryStream[Doc]
    val query = Streams.dedupByFingerprint(stream.toDS())
      .writeStream.format("memory").queryName("dedup_evict")
      .outputMode("append")
      .option("checkpointLocation", ckpt("de"))
      .start()
    try {
      stream.addData(Seq(
        Doc(1L, "some page", new java.sql.Timestamp(t0)),
        Doc(2L, "other page", new java.sql.Timestamp(t0))))
      query.processAllAvailable()
      // 3h later: watermark (1h delay) passes t0 + window, old fps evict
      stream.addData(Seq(Doc(3L, "third page", new java.sql.Timestamp(t0 + 3 * 3600 * 1000L))))
      query.processAllAvailable()
      stream.addData(Seq(Doc(4L, "fourth page", new java.sql.Timestamp(t0 + 3 * 3600 * 1000L + 1000))))
      query.processAllAvailable()
      val stateRows = query.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows <= 2L,
        s"expired fingerprints not evicted: $stateRows state rows")
    } finally query.stop()
  }

  test("streaming funnel rolls up to the batch funnel counts") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val events = loadEvents() // event-time order, the documented contract
    val stream = MemoryStream[Event]
    val query = Streams.funnel(stream.toDS())
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt("fn"))
      .start()
    try {
      val third = events.size / 3
      Seq(events.take(third), events.slice(third, 2 * third), events.drop(2 * third))
        .foreach { b => stream.addData(b); query.processAllAvailable() }
      val streamed = spark.table("funnel_stream")
        .groupBy($"stage".cast("long").as("stage"), $"event_type")
        .agg(count_distinct($"user_id").as("n_users"))
      val batch = Events.funnel(spark, Sf)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
      // append-mode hits are final: no (user, stage) ever emitted twice
      val dupHits = spark.table("funnel_stream")
        .groupBy("user_id", "stage").count().filter($"count" > 1).count()
      assert(dupHits === 0L, "a stage completion was emitted more than once")
    } finally query.stop()
  }

  test("streaming cohort retention rolls up to the batch retention") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val events = loadEvents()
    val stream = MemoryStream[Event]
    val query = Streams.cohortRetention(stream.toDS())
      .writeStream.format("memory").queryName("retention_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt("cr"))
      .start()
    try {
      val third = events.size / 3
      Seq(events.take(third), events.slice(third, 2 * third), events.drop(2 * third))
        .foreach { b => stream.addData(b); query.processAllAvailable() }
      val streamed = spark.table("retention_stream")
        .groupBy($"cohort", $"offset".cast("long").as("offset"))
        .agg(count_distinct($"user_id").as("n_users"))
      val batch = Events.cohortRetention(spark, Sf)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
      // hits are first-time-only: no (user, cohort, offset) emitted twice
      val dups = spark.table("retention_stream")
        .groupBy("user_id", "cohort", "offset").count().filter($"count" > 1).count()
      assert(dups === 0L)
    } finally query.stop()
  }

  test("funnel counts a stage event TIED with the prior stage's completion") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val t0 = 1700000000000L
    def ev(id: Long, user: Long, ms: Long, tpe: String) =
      Event(id, new java.sql.Timestamp(ms), user, tpe, 1.0)
    val stream = MemoryStream[Event]
    val query = Streams.funnel(stream.toDS())
      .writeStream.format("memory").queryName("funnel_ties")
      .outputMode("append")
      .option("checkpointLocation", ckpt("ft"))
      .start()
    try {
      // all three stages share ONE timestamp, with event_ids ordered
      // AGAINST funnel position — under the batch `>=` semantics every
      // stage counts; an (event_id)-only tie-break would fold purchase
      // and click before view and drop both
      stream.addData(Seq(
        ev(1, 7L, t0, "purchase"), ev(2, 7L, t0, "click"), ev(3, 7L, t0, "view"),
        // user 8: tie only between stage 1 and 2, deeper event first by id
        ev(4, 8L, t0, "click"), ev(5, 8L, t0, "view")))
      query.processAllAvailable()
      val hits = spark.table("funnel_ties")
        .select($"user_id", $"stage").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(hits === Set((7L, 1), (7L, 2), (7L, 3), (8L, 1), (8L, 2)),
        s"tied-timestamp events mis-folded: $hits")
      // and the streamed counts still match the batch funnel on this data
      val batch = Events.funnelFrom(
        spark.table("funnel_ties").sparkSession.createDataFrame(Seq(
          (1L, t0, 7L, "purchase"), (2L, t0, 7L, "click"), (3L, t0, 7L, "view"),
          (4L, t0, 8L, "click"), (5L, t0, 8L, "view")
        )).toDF("event_id", "ms", "user_id", "event_type"),
        Seq("view", "click", "purchase"))
      val streamed = spark.table("funnel_ties")
        .groupBy($"stage".cast("long").as("stage"), $"event_type")
        .agg(count_distinct($"user_id").as("n_users"))
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    } finally query.stop()
  }

  test("funnel state is EVICTED after the idle attribution window") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val t0 = 1700000000000L
    def ev(id: Long, user: Long, ms: Long, tpe: String) =
      Event(id, new java.sql.Timestamp(ms), user, tpe, 1.0)
    val stream = MemoryStream[Event]
    val query = Streams.funnel(stream.toDS(), idleTimeoutMs = 1800000L)
      .writeStream.format("memory").queryName("funnel_evict")
      .outputMode("append")
      .option("checkpointLocation", ckpt("fe"))
      .start()
    try {
      // user 1 converts fully; user 2 stalls at stage 1; then only user 3
      // far enough ahead that the watermark (1h) passes both users'
      // last activity + 30min idle window
      stream.addData(Seq(
        ev(1, 1L, t0, "view"), ev(2, 1L, t0 + 1000, "click"),
        ev(3, 1L, t0 + 2000, "purchase"), ev(4, 2L, t0 + 3000, "view")))
      query.processAllAvailable()
      stream.addData(Seq(ev(5, 3L, t0 + 4 * 3600 * 1000L, "view")))
      query.processAllAvailable() // watermark advances after this batch
      stream.addData(Seq(ev(6, 3L, t0 + 5 * 3600 * 1000L, "click")))
      query.processAllAvailable() // timeouts fire: users 1 and 2 removed
      val stateRows = query.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows === 1L,
        s"expected only user 3 in state, got $stateRows rows")
      // every hit was emitted before eviction
      val hits = spark.table("funnel_evict")
        .select($"user_id", $"stage").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(hits === Set((1L, 1), (1L, 2), (1L, 3), (2L, 1), (3L, 1), (3L, 2)))
    } finally query.stop()
  }

  test("streaming slidingAgg equals the batch hopping-window aggregate") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val events = loadEvents()
    val stream = MemoryStream[Event]
    val query = Streams.slidingAgg(stream.toDF())
      .writeStream.format("memory").queryName("sliding_stream")
      .outputMode("complete").start()
    try {
      val (b1, b2) = events.splitAt(events.size / 2)
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
      val streamed = spark.table("sliding_stream")
        .select("window_ts", "event_type", "n", "sum_value")
        .collect().map(_.toSeq).toSet
      val batch = Events.slidingAgg(spark, Sf).collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally query.stop()
  }

  test("stream-stream interval join equals the batch join; state bounded") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val events = loadEvents()
    val views = events.filter(_.event_type == "view")
    val clicks = events.filter(_.event_type == "click")
    val vStream = MemoryStream[Event]
    val cStream = MemoryStream[Event]
    val query = Streams.intervalJoin(vStream.toDF(), cStream.toDF())
      .writeStream.format("memory").queryName("vc_join")
      .outputMode("append")
      .option("checkpointLocation", ckpt("ij"))
      .start()
    try {
      // interleaved micro-batches so pairs span batch boundaries both ways
      val (v1, v2) = views.splitAt(views.size / 2)
      val (c1, c2) = clicks.splitAt(clicks.size / 2)
      vStream.addData(v1); query.processAllAvailable()
      cStream.addData(c1); query.processAllAvailable()
      cStream.addData(c2); query.processAllAvailable()
      vStream.addData(v2); query.processAllAvailable()
      // watermark-advancing tail events (disjoint users, far apart in
      // time — they can match nothing) so buffered state gets evicted
      val farMs = events.map(_.ts.getTime).max + 12 * 3600 * 1000L
      vStream.addData(Seq(Event(-1L, new java.sql.Timestamp(farMs), -1L, "view", 0.0)))
      cStream.addData(Seq(Event(-2L, new java.sql.Timestamp(farMs + 8 * 3600 * 1000L), -2L, "click", 0.0)))
      query.processAllAvailable()

      val ev = Tables.events(spark, Sf)
      val v = ev.filter($"event_type" === "view")
        .select($"user_id", $"event_id".as("view_id"), $"ts".as("view_ts"))
      val c = ev.filter($"event_type" === "click")
        .select($"user_id".as("c_user"), $"event_id".as("click_id"),
          $"ts".as("click_ts"), $"value")
      val batch = v.join(c,
          $"user_id" === $"c_user" &&
            $"click_ts" >= $"view_ts" &&
            $"click_ts" <= $"view_ts" + expr("INTERVAL 1800 SECONDS"))
        .select($"user_id", $"view_id", $"click_id",
          unix_millis($"view_ts").as("view_ms"),
          unix_millis($"click_ts").as("click_ms"),
          round($"value", 2).as("click_value"))
      val streamed = spark.table("vc_join")
      assert(batch.count() > 0, "fixture must produce view→click pairs")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "streamed interval join must equal the batch join")
      // both-side buffers were evicted once the watermarks passed the
      // join window: only the two tail rows (plus nothing else) remain
      val stateRows = query.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows <= 4L,
        s"join state not evicted: $stateRows rows still buffered")
    } finally query.stop()
  }

  test("sessionize state is EVICTED once the watermark passes the gap") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val t0 = 1700000000000L // fixed epoch-ms base
    def ev(id: Long, user: Long, ms: Long) =
      Event(id, new java.sql.Timestamp(ms), user, "t", 1.0)
    val stream = MemoryStream[Event]
    val query = Streams.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("sessions_evict")
      .outputMode("update")
      .option("checkpointLocation", ckpt("ev"))
      .start()
    try {
      // user 1's session, then only user 2 far enough in the future that
      // the watermark (1h delay) passes user 1's last event + 30min gap
      stream.addData(Seq(ev(1, 1L, t0), ev(2, 1L, t0 + 60000L)))
      query.processAllAvailable()
      stream.addData(Seq(ev(3, 2L, t0 + 4 * 3600 * 1000L)))
      query.processAllAvailable() // watermark advances after this batch
      stream.addData(Seq(ev(4, 2L, t0 + 5 * 3600 * 1000L)))
      query.processAllAvailable() // timeout fires here, user 1 removed
      val stateRows = query.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows === 1L,
        s"expected only user 2's open session in state, got $stateRows rows")
      // the evicted session was emitted as a final segment with its full count
      val u1 = spark.table("sessions_evict").filter($"user_id" === 1L)
        .groupBy("user_id", "session_start")
        .agg(max("n_events").as("n"))
        .collect()
      assert(u1.length === 1 && u1(0).getAs[Long]("n") === 2L)
    } finally query.stop()
  }

  test("streaming anomaly z-scores equal the batch z-scores") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val events = loadEvents()
    val maxMs = events.map(_.ts.getTime).max
    val stream = MemoryStream[Event]
    val query = Streams.anomalyZscore(stream.toDS())
      .writeStream.format("memory").queryName("zscore_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt("az"))
      .start()
    try {
      val third = events.size / 3
      Seq(events.take(third), events.slice(third, 2 * third), events.drop(2 * third))
        .foreach { b => stream.addData(b); query.processAllAvailable() }
      // sentinel batches push the watermark past every real hour so the
      // tail hours finalize and their timeouts fire; the sentinel's own
      // type is excluded from the comparison
      Seq(maxMs + 30L * 24 * 3600 * 1000, maxMs + 31L * 24 * 3600 * 1000).foreach { ms =>
        stream.addData(Seq(Event(-1L, new java.sql.Timestamp(ms), -1L, "__wm__", 0.0)))
        query.processAllAvailable()
      }
      val streamed = spark.table("zscore_stream")
        .filter($"event_type" =!= "__wm__")
        .select($"event_type", $"hour_ts", $"n", $"z")
      val batch = Events.anomalyZscore(spark, Sf)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
      // append-mode scores are final: no (type, hour) emitted twice
      val dups = spark.table("zscore_stream")
        .groupBy("event_type", "hour_ts").count().filter($"count" > 1).count()
      assert(dups === 0L, "an hour was scored more than once")
    } finally query.stop()
  }

  test("streaming EWMA monitor equals the batch scored frame on closed hours") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val events = loadEvents()
    val maxMs = events.map(_.ts.getTime).max
    val stream = MemoryStream[Event]
    val query = Streams.ewmaMonitor(stream.toDS())
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt("ew"))
      .start()
    try {
      val third = events.size / 3
      Seq(events.take(third), events.slice(third, 2 * third), events.drop(2 * third))
        .foreach { b => stream.addData(b); query.processAllAvailable() }
      // sentinels push the watermark past every real hour (the
      // anomalyZscore harness); the sentinel type is excluded
      Seq(maxMs + 30L * 24 * 3600 * 1000, maxMs + 31L * 24 * 3600 * 1000).foreach { ms =>
        stream.addData(Seq(Event(-1L, new java.sql.Timestamp(ms), -1L, "__wm__", 0.0)))
        query.processAllAvailable()
      }
      val streamed = spark.table("ewma_stream")
        .filter($"event_type" =!= "__wm__")
        .select($"event_type", $"hour_ts", $"n", $"ewma", $"deviation")
      val hourly = Tables.events(spark, Sf)
        .filter($"event_type".isNotNull)
        .groupBy(unix_timestamp(date_trunc("hour", $"ts")).as("hour_ts"),
          $"event_type")
        .agg(count(lit(1)).as("n"))
      val batch = Events.ewmaScoredFrom(hourly)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "streamed EWMA rows diverge from the batch scored frame")
      // append-mode scores are final: no (type, hour) emitted twice
      val dups = spark.table("ewma_stream")
        .groupBy("event_type", "hour_ts").count().filter($"count" > 1).count()
      assert(dups === 0L, "an hour was scored more than once")
    } finally query.stop()
  }

  test("streaming RFM profiles converge to the batch per-user rollup") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val events = loadEvents()
    val stream = MemoryStream[Event]
    // churnMs explicitly wider than any corpus span: profiles reset at
    // the churn boundary by design (episode semantics), so batch parity
    // must not depend on the 90-day default exceeding the test data span
    val query = Streams.rfmRunning(stream.toDS(),
        churnMs = 100L * 365 * 24 * 3600 * 1000)
      .writeStream.format("memory").queryName("rfm_stream")
      .outputMode("update")
      .option("checkpointLocation", ckpt("rf"))
      .start()
    try {
      val third = events.size / 3
      Seq(events.take(third), events.slice(third, 2 * third), events.drop(2 * third))
        .foreach { b => stream.addData(b); query.processAllAvailable() }
      // freq is strictly increasing per emission, so the max-freq struct
      // per user is that user's final profile
      val streamed = spark.table("rfm_stream")
        .groupBy($"user_id")
        .agg(max(struct($"freq", $"last_ms", $"cents")).as("p"))
        .select($"user_id", $"p.last_ms", $"p.freq", $"p.cents")
      val batch = Tables.events(spark, Sf)
        .filter($"event_type" === "purchase" && $"user_id".isNotNull)
        .groupBy($"user_id")
        .agg(max(unix_millis($"ts")).as("last_ms"), count(lit(1)).as("freq"),
          sum(round($"value" * 100).cast("long")).as("cents"))
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
      // state is one profile per purchasing user, nothing more
      val nUsers = batch.count()
      val stateRows = query.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows <= nUsers, s"state $stateRows rows > $nUsers purchasers")
    } finally query.stop()
  }

  test("streaming SCD2 current rows converge to the batch interval snapshot") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the change log: orders in effective-date arrival order (CDC shape)
    val changes = Tables.orders(spark, Sf)
      .select($"o_custkey".as("custkey"), $"o_orderkey".as("orderkey"),
        $"o_totalprice".cast("double").as("totalprice"),
        $"o_orderdate".cast("timestamp").as("ts"))
      .as[Change].collect().toSeq.sortBy(c => (c.ts.getTime, c.orderkey))
    val minMs = changes.map(_.ts.getTime).min
    val maxMs = changes.map(_.ts.getTime).max
    val span = maxMs - minMs
    val stream = MemoryStream[Change]
    // retireMs explicitly wider than the corpus span: snapshot parity
    // must not depend on a default exceeding the test data span
    val query = Streams.scd2Current(stream.toDS(), retireMs = span + 60000L)
      .writeStream.format("memory").queryName("scd2_stream")
      .outputMode("update")
      .option("checkpointLocation", ckpt("s2"))
      .start()
    try {
      val third = changes.size / 3
      Seq(changes.take(third), changes.slice(third, 2 * third), changes.drop(2 * third))
        .foreach { b => stream.addData(b); query.processAllAvailable() }
      // emissions are monotone in (valid_from, orderkey) per key, so the
      // max struct per key is that key's final current row
      val streamed = spark.table("scd2_stream")
        .groupBy($"custkey")
        .agg(max(struct($"valid_from_ms", $"orderkey", $"totalprice")).as("c"))
        .select($"custkey", $"c.orderkey".as("orderkey"),
          $"c.totalprice".as("totalprice"), $"c.valid_from_ms".as("valid_from_ms"))
      val batch = graft.operators.Relational.q42Scd2Intervals(spark, Sf)
        .filter($"is_current")
        .select($"o_custkey".as("custkey"), $"o_orderkey".as("orderkey"),
          $"o_totalprice".cast("double").as("totalprice"),
          unix_millis($"valid_from".cast("timestamp")).as("valid_from_ms"))
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
      // bounded state: at most one fixed-size row per key
      val nKeys = batch.count()
      val stateRows = query.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows <= nKeys, s"state $stateRows rows > $nKeys keys")
      // eviction: sentinels push the watermark past every key's
      // retirement boundary; timeouts fire on the following batch and
      // the store collapses to (at most) the sentinel key itself
      Seq(maxMs + span + 3660000L, maxMs + span + 7320000L).foreach { ms =>
        stream.addData(Seq(Change(-1L, -1L, 0.0, new java.sql.Timestamp(ms))))
        query.processAllAvailable()
      }
      val evicted = query.lastProgress.stateOperators(0).numRowsTotal
      assert(evicted <= 2L, s"retirement left $evicted state rows")
    } finally query.stop()
  }
  test("streaming quality-gate monitor: per-window pass rates equal a " +
    "batch gopher recomputation of the same slice; state is one row per window") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val t0 = 1700000000000L
    val nWin = 3
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .zipWithIndex.map { case (r, i) =>
        Doc(r.getLong(0), r.getString(1),
          new java.sql.Timestamp(t0 + (i % nWin) * 3600 * 1000L))
      }.toSeq
    val stream = MemoryStream[Doc]
    val query = Streams.qualityGateMonitor(stream.toDS())
      .writeStream.format("memory").queryName("qgate_stream")
      .outputMode("update")
      .option("checkpointLocation", ckpt("qg"))
      .start()
    try {
      val (b1, b2) = docs.splitAt(docs.size / 2)
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
      // latest update-mode emission per window is the final answer
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"window_ts").orderBy($"n_docs".desc)
      val streamed = spark.table("qgate_stream")
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
      // batch recomputation: the same flags over the same window slices
      val batch = graft.operators.TextAnalysis.gopherFlagCols(
          docs.toDF().withColumn("window_ts",
            (unix_millis($"ingest_ts") / 1000L - pmod(unix_millis($"ingest_ts") / 1000L, lit(3600L)))))
        .groupBy($"window_ts")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"gopher_pass", 1L).otherwise(0L)).as("n_pass"),
          sum(when(!$"r_word_count", 1L).otherwise(0L)).as("f_word_count"),
          sum(when(!$"r_mean_word_len", 1L).otherwise(0L)).as("f_mean_word_len"),
          sum(when(!$"r_symbol", 1L).otherwise(0L)).as("f_symbol"),
          sum(when(!$"r_bullet", 1L).otherwise(0L)).as("f_bullet"),
          sum(when(!$"r_ellipsis", 1L).otherwise(0L)).as("f_ellipsis"),
          sum(when(!$"r_alpha", 1L).otherwise(0L)).as("f_alpha"),
          sum(when(!$"r_stop", 1L).otherwise(0L)).as("f_stop"))
        .select($"window_ts", $"n_docs", $"n_pass",
          round($"n_pass".cast("double") / $"n_docs", 6).as("pass_rate"),
          $"f_word_count", $"f_mean_word_len", $"f_symbol", $"f_bullet",
          $"f_ellipsis", $"f_alpha", $"f_stop")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream-drained windows must equal the batch gate on the same slice")
      // exactly nWin windows, together covering the whole corpus
      assert(streamed.count() === nWin.toLong)
      assert(streamed.agg(sum($"n_docs")).head.getLong(0) === docs.size.toLong)
    } finally query.stop()
  }

  test("langid router: streamed predictions equal the batch operator " +
    "per doc, stateless (no state operators)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // model trained offline on the corpus's labeled 80% split — the
    // SAME training half the batch operator uses
    val corpus = Tables.documents(spark, Sf)
    val model = graft.operators.TextAnalysis
      .langProfileOf(corpus.filter($"doc_id" % 5 =!= 0))
    val t0 = 1700000000000L
    val docs = corpus.select("doc_id", "text").collect().zipWithIndex
      .map { case (r, i) => Doc(r.getLong(0), r.getString(1),
        new java.sql.Timestamp(t0 + i * 1000L)) }.toSeq
    val stream = MemoryStream[Doc]
    val query = Streams.langIdRouter(stream.toDS(), model)
      .writeStream.format("memory").queryName("langid_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt("lid"))
      .start()
    try {
      val (b1, b2) = docs.splitAt(docs.size / 2)
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
      def key(r: org.apache.spark.sql.Row, pred: Int, dist: Int, marg: Int) =
        r.getLong(0) -> ((r.getString(pred),
          if (r.isNullAt(dist)) None else Some(r.getLong(dist)),
          if (r.isNullAt(marg)) None else Some(r.getLong(marg))))
      val streamed = spark.table("langid_stream").collect()
        .map(r => key(r, 2, 3, 4)).toMap
      val batch = graft.operators.TextAnalysis
        .langIdNgram(spark, Sf).collect().map(r => key(r, 3, 4, 5)).toMap
      assert(streamed.size === docs.size, "every arriving doc must route")
      assert(streamed === batch,
        "streamed routing must equal the batch operator per doc")
      // the router is a stateless projection: no state store at all
      assert(query.lastProgress.stateOperators.isEmpty,
        "langid router must hold no state")
    } finally query.stop()
  }

  test("nb router: streamed predictions equal the batch source " +
    "classifier per doc, stateless; empty model degrades to 'und'") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val corpus = Tables.documents(spark, Sf)
    // model trained offline on the SAME labeled 80% split the batch
    // operator uses
    val model = graft.operators.TextAnalysis
      .sourceNbModelOf(corpus.filter($"doc_id" % 5 =!= 0))
    val t0 = 1700000000000L
    val docs = corpus.select("doc_id", "text").collect().zipWithIndex
      .map { case (r, i) => Doc(r.getLong(0), r.getString(1),
        new java.sql.Timestamp(t0 + i * 1000L)) }.toSeq
    val stream = MemoryStream[Doc]
    val query = Streams.nbRouter(stream.toDS(), model)
      .writeStream.format("memory").queryName("nb_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt("nbr"))
      .start()
    try {
      val (b1, b2) = docs.splitAt(docs.size / 2)
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
      val streamed = spark.table("nb_stream").collect()
        .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
      val batch = graft.operators.TextAnalysis.sourceNb(spark, Sf).collect()
        .map(r => r.getLong(0) -> ((r.getString(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
      assert(streamed.size === docs.size, "every arriving doc must route")
      assert(streamed === batch,
        "streamed NB routing must equal the batch classifier per doc")
      assert(query.lastProgress.stateOperators.isEmpty,
        "nb router must hold no state")
    } finally query.stop()
    // empty model: the degrade seam, not a crash
    val emptyModel = graft.operators.TextAnalysis
      .sourceNbModelOf(corpus.filter(lit(false)))
    assert(emptyModel._1.isEmpty)
    val stream2 = MemoryStream[Doc]
    val q2 = Streams.nbRouter(stream2.toDS(), emptyModel)
      .writeStream.format("memory").queryName("nb_empty_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt("nbr_empty"))
      .start()
    try {
      stream2.addData(Seq(Doc(1L, "anything at all",
        new java.sql.Timestamp(t0))))
      q2.processAllAvailable()
      val out = spark.table("nb_empty_stream").collect()
        .map(r => (r.getString(2), r.isNullAt(3), r.isNullAt(4)))
      assert(out.toSeq === Seq(("und", true, true)))
    } finally q2.stop()
  }

  test("bpe router: streamed per-doc piece pricing equals the batch " +
    "operator per doc, stateless") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val merges = graft.operators.TextAnalysis.bpeMerges(spark, Sf).collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty, "fixture: trained merge list must be non-empty")
    val t0 = 1700000000000L
    val docs = Tables.documents(spark, Sf).select("doc_id", "text")
      .collect().zipWithIndex
      .map { case (r, i) => Doc(r.getLong(0), r.getString(1),
        new java.sql.Timestamp(t0 + i * 1000L)) }.toSeq
    val stream = MemoryStream[Doc]
    val query = Streams.bpeRouter(stream.toDS(), merges)
      .writeStream.format("memory").queryName("bpe_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt("bper"))
      .start()
    try {
      stream.addData(docs); query.processAllAvailable()
      val streamed = spark.table("bpe_stream").collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
      val batch = graft.operators.TextAnalysis.bpeDocPieces(spark, Sf)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
      assert(streamed.size === docs.size, "every arriving doc must price")
      assert(streamed === batch,
        "streamed piece pricing must equal the batch operator per doc")
      assert(query.lastProgress.stateOperators.isEmpty,
        "bpe router must hold no state")
    } finally query.stop()
  }

  test("ivf router: streamed routing equals the batch nearest-centroid " +
    "assignment per vector, stateless (no state operators)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the persisted index: standing-only centroids, the same coin split
    // ivfAppend uses (batchMod=8)
    val e = Tables.embeddings(spark, Sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val isNew = graft.functions.EngineNeutral.hash60(
      $"vec_id".cast("string")) % 8 === 0
    val centroids = graft.operators.Similarity
      .ivfCentroidVecs(e.filter(!isNew), nBits = 8)
    // the router consumes the PERSISTED artifact (the production
    // restart seam): write the standing index to parquet and start the
    // stream from the path overload, never from the live build plan
    val idxPath = ckpt("ivf-artifact")
    graft.operators.Similarity.writeIvfIndex(centroids, idxPath)
    // EVERY corpus vector arrives on the stream (standing re-ingest and
    // fresh batch alike — routing is defined for both)
    val t0 = 1700000000000L
    val vecs = e.collect().zipWithIndex.map { case (r, i) =>
      Vec(r.getLong(0), r.getSeq[Double](1),
        new java.sql.Timestamp(t0 + i * 1000L)) }.toSeq
    val stream = MemoryStream[Vec]
    val query = Streams.ivfRouter(stream.toDS(), spark, idxPath)
      .writeStream.format("memory").queryName("ivf_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt("ivfr"))
      .start()
    try {
      val (b1, b2) = vecs.splitAt(vecs.size / 2)
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
      val streamed = spark.table("ivf_stream").collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
      val batch = graft.operators.Similarity
        .assignToCentroids(e, centroids).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(streamed.size === vecs.size, "every arriving vector must route")
      assert(streamed === batch,
        "streamed routing must equal the batch assignment per vector")
      assert(query.lastProgress.stateOperators.isEmpty,
        "ivf router must hold no state")
    } finally query.stop()
  }

  test("ivf router: an EMPTY centroid table degrades to null routing, " +
    "not a restart-time crash") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val empty = graft.operators.Similarity.ivfCentroidVecs(
      Tables.embeddings(spark, Sf)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .filter(lit(false)), nBits = 8)
    assert(empty.isEmpty, "fixture: centroid table must be empty")
    val t0 = 1700000000000L
    val stream = MemoryStream[Vec]
    val query = Streams.ivfRouter(stream.toDS(), empty)
      .writeStream.format("memory").queryName("ivf_empty_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt("ivfr_empty"))
      .start()
    try {
      stream.addData(Seq(
        Vec(1L, Seq.fill(64)(0.5), new java.sql.Timestamp(t0)),
        Vec(2L, Seq.fill(64)(-0.5), new java.sql.Timestamp(t0 + 1000))))
      query.processAllAvailable()
      val rows = spark.table("ivf_empty_stream").collect()
      assert(rows.length === 2, "both vectors must pass through")
      rows.foreach { r =>
        assert(r.isNullAt(2) && r.isNullAt(3),
          "unrouted vectors must carry null bucket and score")
      }
    } finally query.stop()
  }

  test("pq router: streamed encoding equals the batch pq encode per " +
    "vector and subspace, stateless (no state operators)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the persisted fine-quantizer: the Lloyd codebook trained on the
    // STANDING corpus (pqAppend's coin split, batchMod=8)
    val e = Tables.embeddings(spark, Sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val isNew = graft.functions.EngineNeutral.hash60(
      $"vec_id".cast("string")) % 8 === 0
    val cb = graft.operators.Similarity.pqCodebookTable(e.filter(!isNew))
    // persisted-artifact seam, like the ivf router test: the stream
    // encodes against the parquet-loaded codebook
    val cbPath = ckpt("pq-artifact")
    graft.operators.Similarity.writePqCodebook(cb, cbPath)
    val t0 = 1700000000000L
    val vecs = e.collect().zipWithIndex.map { case (r, i) =>
      Vec(r.getLong(0), r.getSeq[Double](1),
        new java.sql.Timestamp(t0 + i * 1000L)) }.toSeq
    val stream = MemoryStream[Vec]
    val query = Streams.pqRouter(stream.toDS(), spark, cbPath)
      .writeStream.format("memory").queryName("pq_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt("pqr"))
      .start()
    try {
      val (b1, b2) = vecs.splitAt(vecs.size / 2)
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
      val streamed = spark.table("pq_stream").collect()
        .map(r => r.getLong(0) ->
          ((r.getSeq[Long](2), r.getSeq[Double](3)))).toMap
      // batch mirror: (vec_id, sub, code, d2) rolled up per vector in
      // ascending-subspace order
      val batch = graft.operators.Similarity.pqEncode(e, cb).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .groupBy(_._1).view.mapValues { rs =>
          val s = rs.sortBy(_._2)
          (s.map(_._3).toSeq, s.map(_._4).toSeq)
        }.toMap
      assert(streamed.size === vecs.size, "every arriving vector must encode")
      assert(streamed === batch,
        "streamed encoding must equal the batch pq encode per vector")
      assert(query.lastProgress.stateOperators.isEmpty,
        "pq router must hold no state")
    } finally query.stop()
  }

  test("pq router: an EMPTY codebook degrades to null codes, not a " +
    "restart-time crash") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val empty = graft.operators.Similarity.pqCodebookTable(
      Tables.embeddings(spark, Sf)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .filter(lit(false)))
    assert(empty.isEmpty, "fixture: codebook must be empty")
    val t0 = 1700000000000L
    val stream = MemoryStream[Vec]
    val query = Streams.pqRouter(stream.toDS(), empty)
      .writeStream.format("memory").queryName("pq_empty_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt("pqr_empty"))
      .start()
    try {
      stream.addData(Seq(
        Vec(1L, Seq.fill(64)(0.5), new java.sql.Timestamp(t0)),
        Vec(2L, Seq.fill(64)(-0.5), new java.sql.Timestamp(t0 + 1000))))
      query.processAllAvailable()
      val rows = spark.table("pq_empty_stream").collect()
      assert(rows.length === 2, "both vectors must pass through")
      rows.foreach { r =>
        assert(r.isNullAt(2) && r.isNullAt(3),
          "unencoded vectors must carry null codes and d2s")
      }
    } finally query.stop()
  }

  test("router kernels: NaN scores (zero-norm centroid, NaN component) " +
    "rank exactly like the batch heap — NaN wins, ties to lower id") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.Bridge
    val Sim = graft.operators.Similarity
    // model with a zero-norm centroid: every cosine against bucket 3 is
    // 0/0 = NaN, which the batch heap (java.lang.Double.compare) ranks
    // ABOVE every finite score — so bucket 3 must win in BOTH paths
    val cents = IndexedSeq(
      0L -> IndexedSeq(1.0, 1.0, 1.0, 1.0),
      3L -> IndexedSeq(0.0, 0.0, 0.0, 0.0))
    val cvDf = cents.map { case (b, c) => (b, c.toSeq) }.toDF("bucket", "cv")
    val vecs = Seq(
      10L -> Seq(1.0, 2.0, 3.0, 4.0),
      11L -> Seq(0.0, 0.0, 0.0, 0.0), // zero-norm INPUT: NaN vs both → tie → bucket 0
      12L -> Seq(Double.NaN, 1.0, 1.0, 1.0)).toDF("vec_id", "v")
    def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)
    val batch = Sim.assignToCentroids(vecs, cvDf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), bits(r.getDouble(2))))).toMap
    val kernel = Bridge.column(graft.functions.NearestCentroidExpr(
      Bridge.expression($"v"), cents.map(_._1), cents.map(_._2)))
    val streamed = vecs.select($"vec_id", kernel.as("r")).collect()
      .map(r => r.getLong(0) ->
        ((r.getStruct(1).getLong(0), bits(r.getStruct(1).getDouble(1))))).toMap
    assert(streamed === batch,
      "kernel routing must equal the batch assignment on NaN/zero-norm inputs")
    assert(batch(10L)._1 === 3L && batch(11L)._1 === 0L,
      "fixture must exercise both a NaN win and an all-NaN tie")
    // fine quantizer: a NaN vector component makes every d² NaN — the
    // batch argmin (heap on −d²) lets NaN WIN, ties to the lower code
    val cb = Sim.pqCodebookTable(
      Tables.embeddings(spark, Sf)
        .select($"vec_id", $"embedding".cast("array<double>").as("v")))
    val nanVec = Seq(20L -> Seq.tabulate(64)(i =>
      if (i == 0) Double.NaN else 0.1 * i)).toDF("vec_id", "v")
    val batchEnc = Sim.pqEncode(nanVec, cb).collect()
      .map(r => (r.getLong(1), r.getLong(2), bits(r.getDouble(3)))).sortBy(_._1)
    val rows = cb.select($"sub", $"code", $"cv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toIndexedSeq))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (s, es) =>
        val sorted = es.sortBy(_._2)
        (s.toInt, sorted.map(_._2).toIndexedSeq, sorted.map(_._3).toIndexedSeq)
      }
    val enc = Bridge.column(graft.functions.PqEncodeExpr(
      Bridge.expression($"v"),
      rows.map(_._1).toIndexedSeq, rows.map(_._2).toIndexedSeq,
      rows.map(_._3).toIndexedSeq, Sim.pqSubspaceDim))
    val kernelEnc = nanVec.select(enc.as("r")).collect().head.getStruct(0)
    val kCodes = kernelEnc.getSeq[Long](0)
    val kD2s = kernelEnc.getSeq[Double](1).map(bits)
    assert(batchEnc.map(_._2) === kCodes.toSeq &&
      batchEnc.map(_._3) === kD2s.toSeq,
      "kernel encode must equal the batch encode on a NaN-component vector")
    assert(bits(Double.NaN) === batchEnc.head._3,
      "fixture must exercise a NaN d² (sub 0 sliced the NaN component)")
    // positional-output guard: a codebook with a subspace gap must be a
    // constructor error, never a silently shrunken codes array
    val gap = intercept[IllegalArgumentException] {
      graft.functions.PqEncodeExpr(Bridge.expression($"v"),
        IndexedSeq(0, 2), IndexedSeq(rows(0)._2, rows(2)._2),
        IndexedSeq(rows(0)._3, rows(2)._3), Sim.pqSubspaceDim)
    }
    assert(gap.getMessage.contains("contiguous"),
      "the gap error must name the contiguity contract")
  }

  test("langid router: an EMPTY trained model degrades to all-'und' " +
    "abstention like the batch scorer, not a restart-time crash") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // training split that yields no profiles (no labeled rows at all)
    val emptyModel = graft.operators.TextAnalysis
      .langProfileOf(Tables.documents(spark, Sf).filter(lit(false)))
    assert(emptyModel.isEmpty, "fixture: model must be empty")
    val t0 = 1700000000000L
    val docs = Seq(
      Doc(1L, "the quick brown fox", new java.sql.Timestamp(t0)),
      Doc(2L, "der schnelle fuchs", new java.sql.Timestamp(t0 + 1000)))
    val stream = MemoryStream[Doc]
    val query = Streams.langIdRouter(stream.toDS(), emptyModel)
      .writeStream.format("memory").queryName("langid_empty_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt("lid_empty"))
      .start()
    try {
      stream.addData(docs); query.processAllAvailable()
      val out = spark.table("langid_empty_stream").collect()
        .map(r => r.getLong(0) -> ((r.getString(2), r.isNullAt(3), r.isNullAt(4))))
        .toMap
      assert(out === Map(1L -> (("und", true, true)),
        2L -> (("und", true, true))),
        "empty model must route every doc to the abstention bucket")
    } finally query.stop()
  }
}
