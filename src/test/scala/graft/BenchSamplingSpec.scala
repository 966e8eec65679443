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
}
