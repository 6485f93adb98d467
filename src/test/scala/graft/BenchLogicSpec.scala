package graft

import org.scalatest.funsuite.AnyFunSuite

/** Burst arbitration for the bench artifact (no Spark needed): r07's
  * driver run published a 47.6s wall for a suite that runs in 5.6s
  * because BOTH best-of-2 passes landed inside one co-tenant burst
  * window. The rules under test: disagreeing passes trigger a
  * tie-break third run, the reported wall is the burst-resistant
  * median, and a still-disagreeing run never reseeds BENCH_LOCAL. */
class BenchLogicSpec extends AnyFunSuite {

  test("burstSuspect fires iff walls disagree by more than 2x") {
    assert(!Bench.burstSuspect(Seq(5.6, 7.5)))     // r07 judge reruns
    assert(!Bench.burstSuspect(Seq(5.6, 11.2)))    // exactly 2x: agree
    assert(Bench.burstSuspect(Seq(5.6, 47.6)))     // r07 driver run
    assert(Bench.burstSuspect(Seq(102.5, 47.6)))   // both inflated
    assert(!Bench.burstSuspect(Seq(5.6)))
    assert(!Bench.burstSuspect(Nil))
    assert(Bench.burstSuspect(Seq(0.0, 1.0)))      // degenerate floor
  }

  test("representativeWall: min while passes agree, median once a " +
      "tie-break third pass ran") {
    assert(Bench.representativeWall(Seq(5.6, 7.5)) == 5.6)
    // one burst outlier among three: the median ignores it
    assert(Bench.representativeWall(Seq(5.6, 47.6, 5.9)) == 5.9)
    // two inflated, tie-break clean: median still 2x-honest vs clean
    assert(Bench.representativeWall(Seq(102.5, 47.6, 5.6)) == 47.6)
    // a third pass that brought agreement (<=2x spread) reports min
    assert(Bench.representativeWall(Seq(5.6, 6.1, 5.8)) == 5.6)
    assert(Bench.representativeWall(Nil) == 0.0)
  }

  test("shouldPersist refuses to reseed BENCH_LOCAL only when NO two " +
      "walls corroborate each other (within 2x)") {
    assert(Bench.shouldPersist(Seq(5.6, 7.5)))
    // two clean passes that disagree: can't tell which is real
    assert(!Bench.shouldPersist(Seq(5.6, 47.6)))
    // 2-of-3 agree: the median is trustworthy — persist (with the
    // burst flag set), else the artifact goes stale against the
    // registry and round_report's burst warning can never fire
    assert(Bench.shouldPersist(Seq(5.6, 5.9, 47.6)))
    assert(Bench.burstSuspect(Seq(5.6, 5.9, 47.6))) // …and flags it
    // three mutually incompatible walls: genuinely unusable
    assert(!Bench.shouldPersist(Seq(5.6, 13.0, 47.6)))
    assert(Bench.shouldPersist(Seq(5.6, 6.1, 5.8)))
    assert(!Bench.shouldPersist(Seq(5.6)))
    assert(!Bench.shouldPersist(Nil))
  }
}
