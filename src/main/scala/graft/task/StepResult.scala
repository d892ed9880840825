package graft.task

import graft.events.{Event, EventManager}

/**
 * Step-result protocol (reference: core/execution/operator/
 * __init__.py:9-57 `execute_step`, result schema core/schemas/
 * result.py:6-108): every operator step is wrapped into a typed result
 * carrying status, timings, batch id, and the optional event severity
 * resolved from the exception cause chain.
 *
 * Severity semantics (core/schemas/event.py:73-95, routing
 * input.py:335-404):
 *  - CONTINUE     — log/emit and keep going (step failure tolerated);
 *  - FAIL         — the step failure fails the task;
 *  - STOP_WH_FAIL — stop processing but report overall success
 *    ("stop without failure").
 */
object StepResult {

  sealed trait Severity
  case object Continue extends Severity
  case object Fail extends Severity
  case object StopWithoutFailure extends Severity

  object Severity {
    def parse(s: String): Severity = s.toUpperCase match {
      case "CONTINUE" => Continue
      case "STOP_WH_FAIL" => StopWithoutFailure
      case _ => Fail
    }
  }

  final case class Result[+T](
      step: String,
      status: String, // Success | Failure
      value: Option[T],
      exception: Option[Throwable],
      severity: Option[Severity],
      batchId: String,
      startedMs: Long,
      endedMs: Long) {
    def durationMs: Long = endedMs - startedMs
    def succeeded: Boolean = status == "Success"
  }

  /**
   * Run one step, producing a [[Result]]. On failure the exception cause
   * chain is walked against `subscriptions` (exception simple-class-name →
   * severity); the first match fires an event on `events` and sets the
   * result severity (reference walks `__cause__`/`__context__`;
   * JVM analogue is `getCause`).
   */
  def executeStep[T](step: String, batchId: String,
                     subscriptions: Map[String, Severity] = Map.empty,
                     events: Option[EventManager] = None)(body: => T): Result[T] = {
    val start = System.currentTimeMillis()
    try {
      val v = body
      Result(step, "Success", Some(v), None, None, batchId, start, System.currentTimeMillis())
    } catch {
      case e: Throwable =>
        var severity: Option[Severity] = None
        var cause: Throwable = e
        // identity-set guard: cause CYCLES (a→b→a via initCause) would
        // otherwise spin this walk forever
        val visited = java.util.Collections.newSetFromMap(
          new java.util.IdentityHashMap[Throwable, java.lang.Boolean]())
        while (cause != null && severity.isEmpty && visited.add(cause)) {
          subscriptions.get(cause.getClass.getSimpleName).foreach { sev =>
            severity = Some(sev)
            events.foreach(_.push(Event(cause.getClass.getSimpleName,
              severity = "ERROR",
              payload = Map("step" -> step, "message" -> String.valueOf(cause.getMessage)))))
          }
          cause = cause.getCause
        }
        Result(step, "Failure", None, Some(e), severity, batchId, start,
          System.currentTimeMillis())
    }
  }

  /** Resolve a failed step per its severity: CONTINUE → None (skip),
    * STOP_WH_FAIL → None + stop flag, FAIL/unsubscribed → rethrow. */
  def resolve[T](r: Result[T]): (Option[T], Boolean) =
    if (r.succeeded) (r.value, false)
    else r.severity match {
      case Some(Continue) => (None, false)
      case Some(StopWithoutFailure) => (None, true)
      case _ => throw r.exception.get
    }
}
