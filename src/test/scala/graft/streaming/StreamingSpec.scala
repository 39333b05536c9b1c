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
