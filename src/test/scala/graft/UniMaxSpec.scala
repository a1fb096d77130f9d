package graft

import graft.operators.UniMax

/** [[UniMax]] (the qx88 engine): the waterfill's contracts — exact
  * budget conservation, the epoch cap, and uniformity among uncapped
  * languages — plus a hand-checked scenario per branch. */
class UniMaxSpec extends SparkTestBase {

  private def alloc(epochs: Long, num: Long, den: Long,
                    langs: (String, Long)*): Map[String, (Long, Long, Long)] = {
    import spark.implicits._
    UniMax.allocate(langs.toDF("lang", "avail"), epochs, num, den)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
  }

  test("hand-checked mixed allocation: small langs cap, big langs waterfill") {
    // tot=1000, B=800, E=1. Sorted caps: 100, 200, 700.
    //  i=1: 100*3=300 ≤ 800 → capped.  i=2: 200*2=400 ≤ 700 → capped.
    //  i=3: 700*1=700 > 500 → free: share 500.
    val a = alloc(1L, 4L, 5L, ("lo", 100L), ("mid", 200L), ("hi", 700L))
    assert(a("lo") == ((100L, 100L, 1000000L)))
    assert(a("mid") == ((200L, 200L, 1000000L)))
    assert(a("hi") == ((700L, 500L, 714285L)))
  }

  test("budget conservation is exact, remainder split deterministic") {
    // B = 1000*4/5 = 800; nothing caps (E=2): share 800/3=266 rem 2 →
    // first two langs in (cap, lang) order get the extra token.
    val a = alloc(2L, 4L, 5L, ("a", 333L), ("b", 333L), ("c", 334L))
    assert(a.values.map(_._2).sum == 800L, "Σ alloc == budget exactly")
    assert(a("a")._2 == 267L && a("b")._2 == 267L && a("c")._2 == 266L)
  }

  test("budget above total caps: everyone caps, leftover unspent") {
    val a = alloc(1L, 1L, 1L, ("x", 10L), ("y", 20L))
    assert(a("x")._2 == 10L && a("y")._2 == 20L)
    assert(a.values.forall(v => v._3 == 1000000L), "exactly one epoch each")
  }

  test("no language ever exceeds the epoch cap; uncapped allocations are uniform ±1") {
    val langs = Seq(("l1", 37L), ("l2", 1000L), ("l3", 999L), ("l4", 12L),
      ("l5", 5000L), ("l6", 4999L), ("l7", 170L))
    val a = alloc(2L, 1L, 2L, langs: _*)
    langs.foreach { case (l, av) =>
      assert(a(l)._2 <= 2L * av, s"$l over its cap")
    }
    val uncapped = a.collect { case (_, (cap, al, _)) if al < cap => al }
    assert(uncapped.nonEmpty && uncapped.max - uncapped.min <= 1L,
      s"uncapped allocations must be uniform ±1: $uncapped")
  }
}
