package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TaskEngine
import graft.streaming.TaskEngine._

/** Property tests for the pure lifecycle step function — the invariants
  * the reference enforces with etcd Txns, checked over 2000 seeded
  * random event sequences (no Spark needed: `step` IS the state
  * machine). */
class TaskEnginePropSpec extends AnyFunSuite {

  private val kinds = Vector("submit", "assign", "complete", "fail",
    "retry_fire", "worker_down", "bogus")

  private def randomSequences: Seq[List[TaskEvent]] = {
    val rnd = new scala.util.Random(20260812L)
    Seq.fill(2000) {
      List.fill(rnd.nextInt(20))(
        TaskEvent("t", kinds(rnd.nextInt(kinds.length)), "w", 0))
    }
  }

  private def run(events: Seq[TaskEvent]): (Option[TaskState], Seq[TaskTransition]) =
    events.foldLeft((Option.empty[TaskState], Vector.empty[TaskTransition])) {
      case ((st, out), ev) =>
        TaskEngine.step(st, ev) match {
          case Some((ns, tr)) => (Some(ns), out :+ tr)
          case None => (st, out)
        }
    }

  test("terminal states are absorbing: nothing follows COMPLETED or FAILED") {
    randomSequences.foreach { events =>
      val (_, transitions) = run(events)
      val terminalAt = transitions.indexWhere(t =>
        t.to == Completed || t.to == Failed)
      if (terminalAt >= 0)
        assert(transitions.length == terminalAt + 1, events)
    }
  }

  test("retry_count is monotonically non-decreasing and capped at MaxRetries") {
    randomSequences.foreach { events =>
      val (state, transitions) = run(events)
      transitions.sliding(2).foreach {
        case Seq(a, b) => assert(b.retryCount >= a.retryCount, events)
        case _ =>
      }
      transitions.foreach(t => assert(t.retryCount <= MaxRetries, events))
      state.foreach(s => assert(s.retryCount <= MaxRetries, events))
      transitions.filter(_.to == Failed)
        .foreach(t => assert(t.retryCount == MaxRetries, events))
    }
  }

  test("transition chain is gapless: each `from` equals the previous `to`") {
    randomSequences.foreach { events =>
      val (_, transitions) = run(events)
      transitions.sliding(2).foreach {
        case Seq(a, b) => assert(b.from == a.to, events)
        case _ =>
      }
      transitions.headOption.foreach(t => assert(t.from == -1, events))
    }
  }

  test("no spontaneous tasks: state exists only after a submit") {
    randomSequences.foreach { events =>
      val (state, transitions) = run(events)
      if (!events.exists(_.kind == "submit"))
        assert(state.isEmpty && transitions.isEmpty, events)
    }
  }
}
