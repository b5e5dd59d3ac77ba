package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.TaskEngine._
import graft.streaming.TaskEngineTws

/** transformWithState engine: lifecycle + the native retry timer
  * (ST3's TTL-expiry semantics with no external retry_fire event).
  * Needs the RocksDB state store provider.
  *
  * NOTE on test style: a TWS query in ProcessingTime mode never
  * quiesces — the engine keeps scheduling timer-evaluation batches, so
  * processAllAvailable/awaitTermination(AvailableNow) block forever.
  * The spec polls the sink with a deadline instead; the continuous
  * batches are exactly what lets the retry timer fire unprompted. */
class TaskEngineTwsSpec extends SparkSuite {

  private def waitFor(what: String)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis + 90000
    while (!cond && System.currentTimeMillis < deadline) Thread.sleep(250)
    assert(cond, s"timed out waiting for: $what")
  }

  test("tws: fail registers a retry timer that fires DELAYED→PENDING unprompted") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[TaskEvent]
    val q = TaskEngineTws.transitions(spark, input.toDS(), backoffScaleMs = 1L)
      .writeStream.format("memory").queryName("tws_out")
      .outputMode(OutputMode.Append).start()

    def rows(): Seq[TaskTransition] =
      spark.table("tws_out").as[TaskTransition].collect().toSeq

    try {
      input.addData(TaskEvent("t1", "submit", null, 1),
        TaskEvent("t1", "assign", "w1", 2), TaskEvent("t1", "fail", null, 3))
      waitFor("fail→DELAYED transition") {
        rows().exists(t => t.taskId == "t1" && t.from == Processing && t.to == Delayed)
      }
      val retry = rows().find(t => t.taskId == "t1" && t.to == Delayed).get
      assert(retry.retryCount == 1 && retry.delaySec == 2)
      // the 2ms timer (backoffScaleMs=1) fires in a subsequent
      // timer-evaluation batch — no further input events
      waitFor("timer-fired DELAYED→PENDING") {
        rows().exists(t => t.taskId == "t1" && t.from == Delayed && t.to == Pending)
      }
      val fired = rows().find(t => t.taskId == "t1" && t.from == Delayed).get
      assert(fired.retryCount == 1)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
