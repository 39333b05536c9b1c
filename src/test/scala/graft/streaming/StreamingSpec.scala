package graft.streaming

import graft.SparkSpec
import graft.operators.Events
import graft.sources.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twins must agree with their batch oracles when fed the same
  * events (MemoryStream, multiple micro-batches to exercise state). */
class StreamingSpec extends SparkSpec {

  private def loadEvents(): Seq[Event] = {
    import spark.implicits._
    Tables.events(spark, Sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().toSeq.sortBy(e => (e.ts.getTime, e.event_id))
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

  test("streaming type counts + batch rank equals the batch top-type query") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val events = loadEvents()
    val stream = MemoryStream[Event]
    val query = Streams.typeCounts(stream.toDF())
      .writeStream.format("memory").queryName("type_counts_stream")
      .outputMode("complete").start()
    try {
      val (b1, b2) = events.splitAt(events.size / 2)
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"n".desc, $"event_type".asc)
      val streamedTop = spark.table("type_counts_stream")
        .withColumn("rnk", org.apache.spark.sql.functions.row_number().over(w))
        .filter($"rnk" === 1).select("user_id", "event_type", "n")
      val batchTop = Events.topTypePerUser(spark, Sf)
      assert(streamedTop.exceptAll(batchTop).isEmpty && batchTop.exceptAll(streamedTop).isEmpty)
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
      .option("checkpointLocation", s"/tmp/graft-ckpt-wm-${System.nanoTime()}")
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
      .option("checkpointLocation", s"/tmp/graft-ckpt-sh-${System.nanoTime()}")
      .start()
    try {
      stream.addData(shuffled); query.processAllAvailable()
      val streamed = spark.table("sessions_shuffled")
        .select("user_id", "n_sessions", "n_events")
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
      .option("checkpointLocation", s"/tmp/graft-ckpt-${System.nanoTime()}")
      .start()
    try {
      val third = events.size / 3
      Seq(events.take(third), events.slice(third, 2 * third), events.drop(2 * third))
        .foreach { b => stream.addData(b); query.processAllAvailable() }
      // last update per user is the final state
      val streamed = spark.table("sessions_stream")
        .groupBy("user_id")
        .agg(last("n_sessions").as("n_sessions"), last("n_events").as("n_events"))
      val batch = Events.sessionize(spark, Sf)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    } finally query.stop()
  }
}
