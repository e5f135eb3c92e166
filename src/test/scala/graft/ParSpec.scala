package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins Par.run's failure discipline: a failing task must not propagate
  * until every sibling has finished — callers delete shared temp stores
  * in a `finally`, and a still-running sibling would race that cleanup
  * (the r19 verdict's Par.run item). */
class ParSpec extends AnyFunSuite with Matchers {

  test("results come back in task order") {
    Par.run(() => 1, () => 2, () => 3) shouldBe Seq(1, 2, 3)
  }

  test("first failure propagates unwrapped") {
    val boom = intercept[IllegalStateException] {
      Par.run[Int](() => throw new IllegalStateException("boom"), () => 2)
    }
    boom.getMessage shouldBe "boom"
  }

  test("a failing task does not propagate until every sibling finished") {
    val slowDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    intercept[IllegalStateException] {
      Par.run[Unit](
        () => throw new IllegalStateException("fast failure"),
        () => { Thread.sleep(400); slowDone.set(true) })
    }
    // by the time run() rethrows, the slow sibling must have completed —
    // otherwise the caller's finally-cleanup races the sibling's writes
    slowDone.get() shouldBe true
  }

  test("all failures: the FIRST task's failure wins") {
    val boom = intercept[IllegalStateException] {
      Par.run[Int](
        () => { Thread.sleep(200); throw new IllegalStateException("first") },
        () => throw new IllegalStateException("second"))
    }
    boom.getMessage shouldBe "first"
  }
}
