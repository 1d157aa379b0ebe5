package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The bounded pooled fan-out under maintenance (`system.compact`) and
  * partition-listing: a wedged task (the hanging-filesystem pathology)
  * must fail the whole operation loudly at the deadline — naming the
  * hung task — instead of parking the caller on an infinite await with
  * the pool alive; a plain failure is attributed per task after the
  * in-flight siblings finish. */
class RunBoundedSpec extends AnyFunSuite with Matchers {

  test("a hung task trips the deadline and is named; the pool dies") {
    val ran = new java.util.concurrent.atomic.AtomicInteger(0)
    val t0 = System.nanoTime
    val ex = intercept[IllegalStateException] {
      QuirkCsvMaintenance.runBounded(Seq(
          "dir-ok" -> (() => { ran.incrementAndGet(); 1 }),
          "dir-wedged" -> (() => {
            // a wedged filesystem call: blocks far past the deadline
            // (shutdownNow's interrupt releases the thread, not the task)
            try { Thread.sleep(600000); ran.incrementAndGet(); 2 }
            catch { case _: InterruptedException => 2 }
          })),
        parallelism = 2, timeoutSec = 2L, what = "compaction")
    }
    (System.nanoTime - t0) should be < 60L * 1000000000L
    ex.getMessage should include("timed out")
    ex.getMessage should include("dir-wedged")
    (ex.getMessage should not).include("dir-ok")
    ran.get() shouldBe 1 // the healthy sibling completed
  }

  test("a failing task is attributed by label after siblings finish; " +
      "healthy results are not the caller's problem to salvage") {
    val ran = new java.util.concurrent.atomic.AtomicInteger(0)
    val ex = intercept[IllegalStateException] {
      QuirkCsvMaintenance.runBounded(Seq(
          "dir-a" -> (() => { ran.incrementAndGet(); 1 }),
          "dir-boom" -> (() =>
            throw new RuntimeException("disk on fire")),
          "dir-b" -> (() => { ran.incrementAndGet(); 3 })),
        parallelism = 2, timeoutSec = 60L, what = "compaction")
    }
    ex.getMessage should include("dir-boom")
    ex.getMessage should include("disk on fire")
    ex.getCause.getMessage shouldBe "disk on fire"
    ran.get() shouldBe 2 // both healthy siblings ran to completion
  }

  test("all-healthy fan-out returns every result in input order") {
    QuirkCsvMaintenance.runBounded(
      (1 to 20).map(i => s"d$i" -> (() => i * 10)),
      parallelism = 4, timeoutSec = 60L, what = "listing") shouldBe
      (1 to 20).map(_ * 10)
  }
}
