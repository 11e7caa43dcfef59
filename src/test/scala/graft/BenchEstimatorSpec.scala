package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's stall-robust co-estimator (median of a level's 3 smallest
  * draws) must stay honest when a deadline-starved section produced fewer
  * than 3 draws: the earlier fallback returned the LARGEST available draw,
  * which on a stall-prone box made a 2-draw med3 stall-poisoned by
  * construction (the final round-4 builder run recorded multi-JVM med3
  * efficiency 0.246 from exactly that: one deadline-cut visit whose worse
  * draw was a ~280 s stall window next to a clean ~47 s one).
  */
class BenchEstimatorSpec extends AnyFunSuite {

  test("med3 is the median of the 3 smallest draws") {
    assert(Bench.med3(Seq(5.0, 1.0, 3.0)) == 3.0)
    assert(Bench.med3(Seq(9.0, 2.0, 8.0, 1.0, 3.0)) == 2.0)
    // duplicates: median of {1,1,2}
    assert(Bench.med3(Seq(1.0, 2.0, 1.0, 7.0)) == 1.0)
  }

  test("2 draws -> midpoint, 1 draw -> the draw (never the max)") {
    assert(Bench.med3(Seq(46.77, 287.96)) == (46.77 + 287.96) / 2)
    assert(Bench.med3(Seq(42.0)) == 42.0)
  }
}
