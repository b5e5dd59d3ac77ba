package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.WorkerMonitor
import graft.streaming.WorkerMonitor._

/** ST4 worker sessions + watermark semantics via MemoryStream. */
class StreamingSpec extends SparkSuite {

  test("worker monitor emits 'up' once per worker") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Heartbeat]
    // withTimeout=false: a live ProcessingTimeTimeout schedules no-data
    // batches forever and processAllAvailable never settles
    val q = WorkerMonitor.monitor(spark, input.toDS(), withTimeout = false)
      .writeStream.format("memory").queryName("workers_up")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Heartbeat("w1", Timestamp.valueOf("2024-01-01 00:00:00")))
      q.processAllAvailable()
      input.addData(Heartbeat("w1", Timestamp.valueOf("2024-01-01 00:00:05")),
        Heartbeat("w2", Timestamp.valueOf("2024-01-01 00:00:05")))
      q.processAllAvailable()
      val out = spark.table("workers_up").as[WorkerEvent].collect()
      assert(out.toSet == Set(WorkerEvent("w1", "up"), WorkerEvent("w2", "up")))
    } finally q.stop()
  }

  test("worker monitor timeout branch emits 'down' (TestGroupState)") {
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    val timedOut = TestGroupState.create[Long](
      optionalState = Optional.of(3L),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 100000L,
      eventTimeWatermarkMs = Optional.empty[Long], hasTimedOut = true)
    val out = WorkerMonitor.processGroup(armTimeout = true)(
      "w1", Iterator.empty, timedOut).toList
    assert(out == List(WorkerEvent("w1", "down")))
    assert(timedOut.isRemoved)
  }

  test("watermark drops events later than 10 minutes behind max ts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "event_type")
    val q = WorkerMonitor.tumblingCounts(df)
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: events in hour 10; max ts 12:00 pushes watermark to 11:50
      input.addData(
        (Timestamp.valueOf("2024-01-01 10:15:00"), "click"),
        (Timestamp.valueOf("2024-01-01 10:45:00"), "click"),
        (Timestamp.valueOf("2024-01-01 12:00:00"), "view"))
      q.processAllAvailable()
      // batch 2: a late event for hour 10 (behind watermark) — dropped;
      // advance max ts so hour-10/11/12 windows all close and emit
      input.addData(
        (Timestamp.valueOf("2024-01-01 10:20:00"), "click"), // LATE
        (Timestamp.valueOf("2024-01-01 14:00:00"), "view"))
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2024-01-01 16:00:00"), "view"))
      q.processAllAvailable()
      val rows = spark.table("tumbling").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      // hour-10 click count must be 2 — the late event did NOT count
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L)))
      assert(!rows.contains(("2024-01-01 10:00:00.0", "click", 3L)))
    } finally q.stop()
  }
}
