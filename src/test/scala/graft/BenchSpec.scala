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

  test("dirtyWindow flags contention that begins mid-sweep (load_end)") {
    // r18's snapshot sweep: start 4.64 (under the bar) yet q99 read 25×
    // its clean value — the end sample must also trip the flag.
    assert(Bench.dirtyWindow(4.64, 7.2))
    assert(!Bench.dirtyWindow(4.64, 2.1))
    assert(Bench.dirtyWindow(8.9, 0.0))
  }

  test("parsePriorQueries extracts the per-key map from a bench artifact") {
    val line = """{"queries":{"q01":0.512,"q43":4.92,"q99":1.04},"extras":{"q131_build":2.0},""" +
      """"failed":[],"guard":{"cpus":32,"load_start":3.490},"sf":"/x","reps":3,""" +
      """"unit":"sec","metric":"total","value":295.485}"""
    val m = Bench.parsePriorQueries(line)
    assert(m === Map("q01" -> 0.512, "q43" -> 4.92, "q99" -> 1.04))
    // tolerant of garbage / missing field — empty map, never a throw
    assert(Bench.parsePriorQueries("not json").isEmpty)
    assert(Bench.parsePriorQueries("""{"value":1.0}""").isEmpty)
    assert(Bench.parsePriorQueries("""{"queries":{""").isEmpty) // unterminated
    // sf gating: a prior recorded at a different scale dir is no baseline
    assert(Bench.parsePriorQueries(line, "/x").nonEmpty)
    assert(Bench.parsePriorQueries(line, "/root/testdata/sf1").isEmpty)
  }

  test("suspectKeys flags >3x regressions on keys with prior >= 0.5s only") {
    val prior = Map("q99" -> 1.04, "q61b" -> 6.0, "q01" -> 0.1, "q43" -> 4.92)
    val current = Seq(
      "q99" -> 26.26,  // the r18 ghost: 25× its clean value → suspect
      "q61b" -> 22.07, // 3.7× → suspect
      "q01" -> 0.9,    // 9× but prior under 0.5s — job-overhead jitter, clear
      "q43" -> 8.46,   // 1.7× — in-sweep pressure, under the 3× bar, clear
      "qNew" -> 50.0)  // no prior — new key, nothing to compare
    assert(Bench.suspectKeys(current, prior) === Seq("q99", "q61b"))
    assert(Bench.suspectKeys(current, Map.empty).isEmpty)
    // boundary: exactly 3× is not a suspect (strict >)
    assert(Bench.suspectKeys(Seq("a" -> 1.5), Map("a" -> 0.5)).isEmpty)
    assert(Bench.suspectKeys(Seq("a" -> 1.501), Map("a" -> 0.5)) === Seq("a"))
  }
}
