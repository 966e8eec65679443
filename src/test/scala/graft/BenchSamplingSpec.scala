package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench dispersion-population contract (ADVICE r14,
  * Bench.scala): the cold run is dropped BY INDEX in the raw sample
  * sequence, before errored runs are filtered — so an errored first
  * run never shifts the drop onto a warm sample. */
class BenchSamplingSpec extends AnyFunSuite {

  test("steady drops the cold run by index, not post-filter position") {
    // run 1 errored (-1), run 2 is the true cold sample. Filtering
    // first would drop 1.18 (warm-up) from position 0 of the OK list —
    // the bug: the actual cold sample would then be... here run 2 IS
    // the slow one only because run 1 never executed the query. The
    // contract is: only raw(0) is excluded.
    val raw = Seq(-1.0, 1.18, 0.16, 0.17, 0.16)
    assert(Bench.steady(raw) == Seq(1.18, 0.16, 0.17, 0.16))
    // consequence: the 1.18 outlier stays in the population and the
    // query is correctly dispersion-flagged (errored cold run means
    // run 2 paid the warm-up, and its spread is real information)
    assert(Bench.spreadExceeds(Bench.steady(raw)))
  }

  test("steady excludes the cold first sample when it ran") {
    val raw = Seq(1.18, 0.16, 0.17, 0.16, 0.16)
    assert(Bench.steady(raw) == Seq(0.16, 0.17, 0.16, 0.16))
    assert(!Bench.spreadExceeds(Bench.steady(raw)))
  }

  test("with exactly 2 raw samples the cold run still counts") {
    assert(Bench.steady(Seq(3.0, 1.0)) == Seq(3.0, 1.0))
    assert(Bench.steady(Seq(-1.0, 1.0)) == Seq(1.0))
  }

  test("errored runs are excluded from the steady population") {
    assert(Bench.steady(Seq(0.5, 0.4, -1.0, 0.41)) == Seq(0.4, 0.41))
  }

  test("spreadExceeds needs two positive samples and a 1.5x spread") {
    assert(!Bench.spreadExceeds(Seq()))
    assert(!Bench.spreadExceeds(Seq(1.0)))
    assert(!Bench.spreadExceeds(Seq(1.0, 1.4)))
    assert(Bench.spreadExceeds(Seq(1.0, 1.6)))
    assert(!Bench.spreadExceeds(Seq(0.0, 9.0))) // zero min: undefined ratio
  }

  test("vsPrevFlags: flags 3x+ jumps over the previous round, ignores " +
    "new queries, errored medians, and sub-floor noise") {
    val prev = Map("q61" -> 0.94, "q06" -> 0.10, "q88" -> 4.0,
      "qz" -> 0.0)
    val cur = Seq(
      "q61" -> 18.4,  // the r19 contention case: must flag
      "q06" -> 0.40,  // 4x but +0.3 s absolute — jitter, no flag
      "q88" -> 7.9,   // <3x — no flag
      "q99" -> 9.0,   // new this round — no prev, no flag
      "qz" -> 9.0,    // prev recorded 0/errored — no flag
      "q61b" -> -1.0) // errored now — no flag
    assert(Bench.vsPrevFlags(prev, cur) == Seq(("q61", 0.94, 18.4)))
    // boundary: exactly 3x is NOT a flag (strictly greater)
    assert(Bench.vsPrevFlags(Map("a" -> 1.0), Seq("a" -> 3.0)).isEmpty)
    assert(Bench.vsPrevFlags(Map("a" -> 1.0), Seq("a" -> 3.01)).nonEmpty)
  }

  test("parsePrevQueries: reads the queries map; shape surprises and " +
    "junk yield empty instead of failing the bench") {
    val json = """{"metric":"total_query_seconds","value":1.0,
      "queries":{"q01_fwm_agg":0.5,"q02":1.25,"bad":"x"},
      "total_sec":1.0}"""
    assert(Bench.parsePrevQueries(json) ==
      Map("q01_fwm_agg" -> 0.5, "q02" -> 1.25))
    assert(Bench.parsePrevQueries("not json").isEmpty)
    assert(Bench.parsePrevQueries("""{"queries":[1,2]}""").isEmpty)
    assert(Bench.parsePrevQueries("""{"value":3}""").isEmpty)
  }
}
