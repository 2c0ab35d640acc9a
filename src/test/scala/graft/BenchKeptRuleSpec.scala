package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pin for the bench kept-value rule (`Bench.keptValue`) — every
  * branch the artifact's `kept_rule` string promises, including the
  * r16-final warmup-aware refinement the sf0.1 board surfaced
  * (`bm25_search_compacted`: slowest pass least-stolen = first-touch
  * index build, not steal). */
class BenchKeptRuleSpec extends AnyFunSuite {

  test("main-pass failure is the -1 sentinel, regardless of family") {
    assert(Bench.keptValue(Seq(1.0, -1.0, 2.0), Nil, Seq(0, 0, 0), isLoop = false) === -1.0)
    assert(Bench.keptValue(Seq(1.0, -1.0), Seq(0.5), Seq(0, 0), isLoop = true) === -1.0)
  }

  test("loop family keeps the min over mains + surviving extras; failed extras dropped") {
    assert(Bench.keptValue(Seq(5.0, 4.0, 6.0), Seq(3.5, -1.0), Seq(0, 0, 0),
      isLoop = true) === 3.5)
    // a failed extra must never flip a healthy query (ADVICE r15)
    assert(Bench.keptValue(Seq(5.0, 4.0), Seq(-1.0), Seq(0, 0),
      isLoop = true) === 4.0)
  }

  test("spread ≤ 2× keeps the median") {
    assert(Bench.keptValue(Seq(1.0, 1.8, 1.4), Nil, Seq(9, 0, 0),
      isLoop = false) === 1.4)
  }

  test("spread > 2× keeps the min-steal pass's observation") {
    // the stolen pass is the slow one: median (43.2) would keep a stolen
    // number, min-steal (pass 1) doesn't — the r15 dedup_containment case
    assert(Bench.keptValue(Seq(11.9, 43.2, 31.5), Nil, Seq(0.5, 40.0, 25.0),
      isLoop = false) === 11.9)
  }

  test("warmup-aware: slowest pass that is also least-stolen is discarded, median of the rest kept") {
    // the r16 bm25_search_compacted board entry: 7.92 s at 0.8 steal vs
    // 1.6/1.19 steady-state — first-touch index build, not box noise
    assert(Bench.keptValue(Seq(7.92, 1.6, 1.19), Nil, Seq(0.8, 7.3, 3.9),
      isLoop = false) === 1.6)
    // but with only 2 passes there is no "rest" median — min-steal stands
    assert(Bench.keptValue(Seq(7.92, 1.6), Nil, Seq(0.8, 7.3),
      isLoop = false) === 7.92)
  }

  test("spread > 2× without steal data falls back to the median") {
    assert(Bench.keptValue(Seq(1.0, 5.0, 4.0), Nil, Seq.empty,
      isLoop = false) === 4.0)
  }
}
