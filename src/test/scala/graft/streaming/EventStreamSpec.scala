package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.streaming.EventStreams.{Event, Session}

/** Streaming == batch equivalence through the shared transforms, plus the
  * custom stateful sessionizer's emit-on-gap / emit-on-timeout behavior. */
class EventStreamSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val sample = Seq(
    Event(1L, ts(5), 1L, "click", 1.0),
    Event(2L, ts(20), 1L, "view", 2.0),
    Event(3L, ts(65), 2L, "click", 3.0),
    Event(4L, ts(70), 1L, "purchase", 4.0),
    Event(5L, ts(130), 2L, "click", 5.0))

  test("hourlyCounts: one transform, batch and stream agree") {
    val batch = EventStreams.hourlyCounts(sample.toDF())
      .orderBy("hour", "event_type").collect().toSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.hourlyCounts(mem.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      val streamed = spark.table("hourly")
        .orderBy("hour", "event_type").collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("sessionWindows: native session_window groups by 30-min gap") {
    val out = EventStreams.sessionWindows(sample.toDF(), gap = "30 minutes")
      .orderBy("user_id", "session_start").collect()
    // user 1: events at :05,:20 merge (15' gap), :70 separate; user 2: :65, :130 separate
    assert(out.map(r => (r.getLong(0), r.getLong(3))).toSeq ===
      Seq((1L, 2L), (1L, 1L), (2L, 1L), (2L, 1L)))
  }

  test("stateful sessionizer: gap split within a batch + state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS(), gapUs = 30L * 60 * 1000000)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // batch 1: user 1 at :05 and :20 (one open session)
      mem.addData(sample(0), sample(1))
      q.processAllAvailable()
      // batch 2: user 1 at :70 -> gap 50' > 30' closes the first session
      mem.addData(sample(3))
      q.processAllAvailable()
      val emitted = spark.table("sessions").as[Session].collect()
      assert(emitted.toSeq === Seq(Session(1L, ts(5).getTime * 1000,
        ts(20).getTime * 1000, 2L)))

      // batch 3: far-future event advances the watermark past :70 + gap,
      // firing the event-time timeout for user 1's open session
      mem.addData(Event(99L, ts(600), 3L, "click", 0.0))
      q.processAllAvailable()
      mem.addData(Event(100L, ts(601), 3L, "click", 0.0))
      q.processAllAvailable()
      val after = spark.table("sessions").as[Session].collect()
      assert(after.exists(s => s.user_id == 1L &&
        s.start_us == ts(70).getTime * 1000 && s.n_events == 1L))
    } finally q.stop()
  }

  test("streaming funnel matches the batch funnel on in-order testdata events") {
    // real testdata, replayed per-user-in-order in two micro-batches —
    // the regime where the streaming state machine is exactly the batch
    // min-over-successors (see EventStreams.funnel's caveat)
    val stepUs = graft.queries.EventQueries.FunnelStepUs
    val events = graft.sources.EventSource.read(spark, sf("sf0.001"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq

    val batch = graft.queries.EventQueries
      .queries("q_event_funnel")(spark, sf("sf0.001"))
      .select($"user_id", $"stage").as[(Long, Int)].collect().toMap

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.funnel(mem.toDS(), stepUs)
      .writeStream.format("memory").queryName("funnel")
      .outputMode("update").start()
    try {
      val (first, second) = events.splitAt(events.size / 2)
      mem.addData(first: _*)
      q.processAllAvailable()
      mem.addData(second: _*)
      q.processAllAvailable()
      // last update per user wins (update-mode memory sink appends rows;
      // take each user's final stage)
      val streamed = spark.table("funnel")
        .groupBy("user_id").agg(max("stage").as("stage"))
        .as[(Long, Int)].collect().toMap
      assert(streamed === batch)
    } finally q.stop()
  }
}
