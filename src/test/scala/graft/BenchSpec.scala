package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's contention self-identification (VERDICT r17
  * item 4): a sweep that starts under heavy ambient load must FLAG
  * itself so a hot-window total never again ships as the round
  * headline without a caveat. */
class BenchSpec extends AnyFunSuite {

  test("dirtyWindow flags load_start > 5 and clears calm windows") {
    assert(!Bench.dirtyWindow(0.0))
    assert(!Bench.dirtyWindow(3.1))   // the r16/r17 calm re-measure regime
    assert(!Bench.dirtyWindow(5.0))   // boundary: exactly 5 is still clean
    assert(Bench.dirtyWindow(5.001))
    assert(Bench.dirtyWindow(8.894))  // the r17 committed-sweep wake
  }
}
