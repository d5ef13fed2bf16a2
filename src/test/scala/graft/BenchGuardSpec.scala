package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench protocol self-guard (VERDICT r6 "Next #1"): the sf0.1/10M suite
  * is only comparable under the default 8g heap; a small-scale run on an
  * oversized heap must be stamped as a protocol violation so a contaminated
  * BENCH record is machine-detectable.
  */
class BenchGuardSpec extends AnyFunSuite {
  private val GiB = 1024L * 1024L * 1024L

  test("10M rows on an 8g heap is clean") {
    assert(Bench.protocolViolation(10000000L, 8L * GiB).isEmpty)
  }

  test("10M rows on a 16g heap is still within the ceiling") {
    assert(Bench.protocolViolation(10000000L, 16L * GiB).isEmpty)
  }

  test("10M rows on a 90g heap is flagged (the r5/r6 driver-run trap)") {
    val v = Bench.protocolViolation(10000000L, 90L * GiB)
    assert(v.exists(_.startsWith("heap:")))
    assert(v.exists(_.contains("92160mb")))
  }

  test("100M rows on a 96g heap is the documented full-parity protocol") {
    assert(Bench.protocolViolation(100000000L, 96L * GiB).isEmpty)
  }

  test("disabled ref suites (rows=0) still guard the heap") {
    assert(Bench.protocolViolation(0L, 90L * GiB).nonEmpty)
  }

  test("violating run refuses unless explicitly acknowledged (r7 follow-up)") {
    val v = Bench.protocolViolation(10000000L, 90L * GiB)
    // unacknowledged -> refuse (main exits 2 before any artifact write)
    assert(Bench.shouldRefuse(v, acknowledged = false) == v)
    // acknowledged -> run proceeds, stamped
    assert(Bench.shouldRefuse(v, acknowledged = true).isEmpty)
    // clean run never refuses
    assert(Bench.shouldRefuse(None, acknowledged = false).isEmpty)
  }
}
