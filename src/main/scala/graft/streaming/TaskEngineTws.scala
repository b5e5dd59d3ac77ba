package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues}

import graft.streaming.TaskEngine.{TaskEvent, TaskState, TaskTransition}

/** transformWithState form of the task lifecycle engine — the modern
  * (Spark 4.x) stateful API, used where TaskEngine uses
  * flatMapGroupsWithState. The reference's delayed-retry TTL trigger
  * (/root/reference/tasks/worker.go:83-112 sets a lease whose expiry
  * re-submits the task, /root/reference/tasks/dispatcher.go:331-385)
  * maps to a REAL timer here: `fail` with retries left moves the task
  * to DELAYED and registers a processing-time timer for the backoff;
  * `handleExpiredTimer` fires DELAYED→PENDING with no external
  * `retry_fire` event needed.
  *
  * Requires the RocksDB state store provider
  * (spark.sql.streaming.stateStore.providerClass =
  * ...RocksDBStateStoreProvider).
  *
  * @param backoffScaleMs milliseconds per backoff second (1000 in
  *   production; tests pass 1 so timers expire within the next batch).
  */
class TaskLifecycleProcessor(backoffScaleMs: Long)
    extends StatefulProcessor[String, TaskEvent, TaskTransition] {

  @transient private var state: org.apache.spark.sql.streaming.ValueState[TaskState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    state = getHandle.getValueState[TaskState]("taskState",
      Encoders.product[TaskState], org.apache.spark.sql.streaming.TTLConfig.NONE)
  }

  override def handleInputRows(taskId: String, events: Iterator[TaskEvent],
      timers: TimerValues): Iterator[TaskTransition] = {
    var cur: Option[TaskState] = if (state.exists()) Some(state.get()) else None
    val out = Vector.newBuilder[TaskTransition]
    events.toSeq.sortBy(_.seq).foreach { ev =>
      TaskEngine.step(cur, ev).foreach { case (ns, tr) =>
        cur = Some(ns)
        out += tr
        if (ns.status == TaskEngine.Delayed) {
          // ST3: the TTL-delay timer, natively
          getHandle.registerTimer(timers.getCurrentProcessingTimeInMs() +
            tr.delaySec * backoffScaleMs)
        }
      }
    }
    cur.foreach(state.update)
    out.result().iterator
  }

  override def handleExpiredTimer(taskId: String, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[TaskTransition] = {
    if (state.exists() && state.get().status == TaskEngine.Delayed) {
      val s = state.get()
      val ns = TaskState(TaskEngine.Pending, s.retryCount, null)
      state.update(ns)
      Iterator(TaskTransition(taskId, TaskEngine.Delayed, TaskEngine.Pending,
        s.retryCount, null, 0))
    } else Iterator.empty
  }
}

object TaskEngineTws {
  /** Wire the processor over a streaming event Dataset. */
  def transitions(spark: SparkSession, events: Dataset[TaskEvent],
      backoffScaleMs: Long = 1000L): Dataset[TaskTransition] = {
    import spark.implicits._
    events.groupByKey(_.taskId)
      .transformWithState(new TaskLifecycleProcessor(backoffScaleMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
