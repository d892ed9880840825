package graft

import graft.events.EventManager
import graft.task.StepResult
import graft.task.StepResult._
import java.util.concurrent.{CountDownLatch, TimeUnit}

/** execute_step wrapping + cause-chain severity routing
  * (reference operator/__init__.py:9-57). */
class StepResultSpec extends SparkSpec {

  test("successful step carries value, status, timing") {
    val r = StepResult.executeStep("read", "b1") { 42 }
    assert(r.succeeded && r.value === Some(42))
    assert(r.durationMs >= 0 && r.batchId === "b1")
  }

  test("unsubscribed failure resolves by rethrow") {
    val r = StepResult.executeStep("read", "b1") {
      throw new IllegalStateException("boom")
    }
    assert(!r.succeeded && r.severity === None)
    assertThrows[IllegalStateException] { StepResult.resolve(r) }
  }

  test("CONTINUE severity swallows the failure; event fires") {
    val m = EventManager.started()
    val latch = new CountDownLatch(1)
    m.subscribe("IllegalStateException", _ => latch.countDown())
    val r = StepResult.executeStep("read", "b1",
      Map("IllegalStateException" -> Continue), Some(m)) {
      throw new IllegalStateException("tolerated")
    }
    assert(StepResult.resolve(r) === (None, false))
    assert(latch.await(5, TimeUnit.SECONDS))
    m.stop()
  }

  test("severity found by walking the cause chain (reference cause-walk)") {
    val r = StepResult.executeStep("read", "b1",
      Map("java.lang.ArithmeticException".split("\\.").last -> StopWithoutFailure)) {
      throw new RuntimeException("outer", new ArithmeticException("/ by zero"))
    }
    assert(r.severity === Some(StopWithoutFailure))
    assert(StepResult.resolve(r) === (None, true))
  }

  test("FAIL severity rethrows") {
    val r = StepResult.executeStep("read", "b1",
      Map("IllegalStateException" -> Fail)) {
      throw new IllegalStateException("fatal")
    }
    assertThrows[IllegalStateException] { StepResult.resolve(r) }
  }
}
