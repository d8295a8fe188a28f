package graft

import org.scalatest.funsuite.AnyFunSuite

/** The marginal-leg retime rule (Bench.isMarginal / Bench.adoptRetime):
  * r05f's exec bracket went non-voting on a 6.9% same-width leg
  * disagreement at steal 0.002 — one slow leg, a full resample the only
  * recourse. The rule re-reads just the slower leg when (and only when)
  * the window is otherwise clean and the disagreement is marginal. */
class BenchRetimeSpec extends AnyFunSuite {

  private val gate = 0.06
  private val steal = 0.04

  test("marginal window: only (gate, 2*gate] at clean steal triggers") {
    assert(!Bench.isMarginal(0.059, 0.001, gate, steal)) // clean already
    assert(Bench.isMarginal(0.069, 0.002, gate, steal))  // the r05f case
    assert(Bench.isMarginal(0.120, 0.000, gate, steal))  // boundary 2*gate
    assert(!Bench.isMarginal(0.121, 0.000, gate, steal)) // bad wholesale
    assert(!Bench.isMarginal(0.069, 0.100, gate, steal)) // steal-dirty
  }

  test("adoption replaces only the slower leg, min-of-two, keeping steal of the chosen run") {
    // slower AFTER leg, fresh read faster: adopt fresh time + fresh steal
    val (b1, c1, sb1, sc1, l1) =
      Bench.adoptRetime(70.0, 75.0, 0.001, 0.002, 71.0, 0.003, steal)
    assert(b1 == 70.0 && c1 == 71.0 && sb1 == 0.001 && sc1 == 0.003)
    assert(l1.startsWith("after:75.0->71.0"))
    // slower BEFORE leg, fresh read even slower: keep original everything
    val (b2, c2, sb2, sc2, l2) =
      Bench.adoptRetime(80.0, 72.0, 0.001, 0.002, 85.0, 0.000, steal)
    assert(b2 == 80.0 && c2 == 72.0 && sb2 == 0.001 && sc2 == 0.002)
    assert(l2.startsWith("before:80.0->85.0"))
  }

  test("a steal-dirty re-read is recorded but never adopted") {
    val (b, c, sb, sc, l) =
      Bench.adoptRetime(70.0, 75.0, 0.001, 0.002, 60.0, 0.2, steal)
    assert(b == 70.0 && c == 75.0 && sb == 0.001 && sc == 0.002)
    assert(l.startsWith("retime_dirty:60.0"))
  }

  test("a genuine-drift re-read leaves the bracket still disagreeing (stays non-voting)") {
    // before 60, after 75 (25% apart is NOT marginal at the default gate —
    // use times inside it): before 70, after 75 (7.1%); drifted box
    // re-reads 76 → after stays 75, disagreement unchanged
    val (b, c, _, _, _) =
      Bench.adoptRetime(70.0, 75.0, 0.001, 0.002, 76.0, 0.001, steal)
    val disagree = math.abs(b - c) / math.min(b, c)
    assert(disagree > 0.06)
  }
}
