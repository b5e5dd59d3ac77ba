package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming re-expression of the reference's distributed task state
  * machine (SURVEY.md §2.9). The etcd watch loops + lease-TTL timers +
  * CAS transactions of the reference collapse into one keyed stateful
  * operator: exactly-once state updates replace the idempotent-claim
  * Txns (ST9), and the state store replaces the CAS counter loop (A2).
  *
  * Lifecycle (reference /root/reference/tasks/worker.go:35-165):
  *   PENDING → PROCESSING → COMPLETED
  *                        ↘ fail: retry_count < 3 → DELAYED → PENDING
  *                        ↘ fail: retries exhausted → FAILED
  * Retry backoff 2s·2^(n-1) (worker.go:72-79), jitter applied at
  * runtime only (excluded from deterministic outputs).
  *
  * Scale: state is keyed by task_id — uniformly distributed, so the
  * state store shards evenly across executors; each micro-batch
  * shuffles only the incoming events, never the full state.
  */
object TaskEngine {

  val MaxRetries = 3 // /root/reference/common/constants.go:20

  val Pending = 0
  val Processing = 1
  val Completed = 2
  val Failed = 3
  val Delayed = 4

  /** Input: a task lifecycle event.
    * kind ∈ submit | assign | complete | fail | retry_fire
    * (retry_fire models the delayed-trigger lease expiry,
    * /root/reference/tasks/dispatcher.go:331-385). */
  case class TaskEvent(taskId: String, kind: String, workerId: String,
      seq: Long)

  /** Per-task state carried between micro-batches. */
  case class TaskState(status: Int, retryCount: Int, workerId: String)

  /** Output: one record per state transition. */
  case class TaskTransition(taskId: String, from: Int, to: Int,
      retryCount: Int, workerId: String, delaySec: Int)

  def backoffSec(retryCount: Int): Int =
    if (retryCount <= 0) 0 else 2 * (1 << (retryCount - 1))

  /** Pure transition function — the whole state machine, unit-testable
    * without Spark. Returns None for invalid transitions (ignored, the
    * streaming analog of the reference's lost-CAS no-op). */
  def step(state: Option[TaskState], ev: TaskEvent): Option[(TaskState, TaskTransition)] = {
    val s = state.getOrElse(TaskState(-1, 0, null))
    (ev.kind, s.status) match {
      case ("submit", -1) =>
        val ns = TaskState(Pending, 0, null)
        Some((ns, TaskTransition(ev.taskId, -1, Pending, 0, null, 0)))
      case ("assign", Pending) =>
        val ns = TaskState(Processing, s.retryCount, ev.workerId)
        Some((ns, TaskTransition(ev.taskId, Pending, Processing, s.retryCount, ev.workerId, 0)))
      case ("complete", Processing) =>
        val ns = TaskState(Completed, s.retryCount, s.workerId)
        Some((ns, TaskTransition(ev.taskId, Processing, Completed, s.retryCount, s.workerId, 0)))
      case ("fail", Processing) if s.retryCount < MaxRetries =>
        val rc = s.retryCount + 1
        val ns = TaskState(Delayed, rc, null)
        Some((ns, TaskTransition(ev.taskId, Processing, Delayed, rc, s.workerId, backoffSec(rc))))
      case ("fail", Processing) =>
        val ns = TaskState(Failed, s.retryCount, s.workerId)
        Some((ns, TaskTransition(ev.taskId, Processing, Failed, s.retryCount, s.workerId, 0)))
      case ("retry_fire", Delayed) =>
        val ns = TaskState(Pending, s.retryCount, null)
        Some((ns, TaskTransition(ev.taskId, Delayed, Pending, s.retryCount, null, 0)))
      // worker death (ST5 failover): processing task re-enqueued
      case ("worker_down", Processing) =>
        val ns = TaskState(Pending, s.retryCount, null)
        Some((ns, TaskTransition(ev.taskId, Processing, Pending, s.retryCount, s.workerId, 0)))
      case _ => None // invalid transition: idempotent no-op (ST9)
    }
  }

  private def processGroup(taskId: String, events: Iterator[TaskEvent],
      state: GroupState[TaskState]): Iterator[TaskTransition] = {
    var cur: Option[TaskState] = state.getOption
    val out = Vector.newBuilder[TaskTransition]
    // Events within a batch are folded in seq order (the event-time
    // order of the source; cross-batch ordering is the source's
    // exactly-once guarantee).
    events.toSeq.sortBy(_.seq).foreach { ev =>
      step(cur, ev).foreach { case (ns, tr) => cur = Some(ns); out += tr }
    }
    cur.foreach(state.update)
    out.result().iterator
  }

  /** Wire the state machine over a (possibly streaming) event Dataset. */
  def transitions(spark: SparkSession, events: Dataset[TaskEvent]): Dataset[TaskTransition] = {
    import spark.implicits._
    events.groupByKey(_.taskId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(processGroup)
  }
}
