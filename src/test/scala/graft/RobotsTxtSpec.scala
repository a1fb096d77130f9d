package graft

import graft.operators.RobotsTxt
import graft.operators.RobotsTxt.{evaluate, matches, parse}

/** Pins the RFC 9309 evaluator (qx72's kernel): group selection,
  * longest-match precedence with the allow-wins tie rule, glob and
  * end-anchor matching, case-insensitive fields and tokens, and the
  * orphan-rule / empty-pattern conventions. */
class RobotsTxtSpec extends SparkTestBase {

  test("named group wins; the * fallback is ignored") {
    val txt =
      """User-agent: other-bot
        |Disallow: /
        |
        |user-agent: MyBot
        |disallow: /secret/
        |crawl-delay: 3
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    val r = parse(txt, "mybot") // token match is case-insensitive
    assert(evaluate(r, "/page/1").fetchable)
    assert(!evaluate(r, "/secret/x").fetchable)
    assert(r.crawlDelay === 3L)
    // an agent with NO named group falls back to *
    val fallback = parse(txt, "stranger")
    assert(!evaluate(fallback, "/page/1").fetchable)
  }

  test("malformed crawl-delay is ignored, not thrown (r8 ADVICE)") {
    // fractional delays are common in the wild; a general evaluator
    // skips the unparseable line instead of failing the task
    val r = parse(
      "User-agent: *\nCrawl-delay: 0.5\nDisallow: /x/\nCrawl-delay: junk\n", "x")
    assert(r.crawlDelay === 0L)
    assert(!evaluate(r, "/x/1").fetchable)
    // a later VALID delay still takes effect
    val r2 = parse("User-agent: *\nCrawl-delay: 0.5\nCrawl-delay: 7\n", "x")
    assert(r2.crawlDelay === 7L)
  }

  test("longest match wins; allow beats disallow on ties") {
    val r = parse("User-agent: *\nDisallow: /a/\nAllow: /a/b/\n", "x")
    assert(!evaluate(r, "/a/z").fetchable)
    val v = evaluate(r, "/a/b/c")
    assert(v.fetchable && v.ruleLen === 5)
    // equal-length pair: Allow wins regardless of order
    val tie = parse("User-agent: *\nDisallow: /t/\nAllow: /t*\n", "x")
    assert(evaluate(tie, "/t/q").fetchable)
  }

  test("glob * and end-anchor $ semantics") {
    assert(matches("/*.tmp$", "/a/b/c.tmp"))
    assert(!matches("/*.tmp$", "/a/b/c.tmp.bak")) // anchored
    assert(matches("/*.tmp", "/a/b/c.tmp.bak"))   // unanchored = prefix
    assert(matches("/p", "/page"))                 // prefix semantics
    assert(!matches("/page", "/p"))
    assert(matches("/a*c*e", "/abcde"))
    assert(!matches("", "/anything"))              // empty Disallow: allow-all
  }

  test("orphan rules (before any group) are ignored; comments stripped") {
    val r = parse("Disallow: /all\n# note\nUser-agent: * # trailing\nDisallow: /x/ # c\n", "bot")
    assert(evaluate(r, "/all/1").fetchable) // orphan rule dropped
    assert(!evaluate(r, "/x/1").fetchable)
  }

  test("multiple groups for the same agent combine") {
    val txt = "User-agent: a\nDisallow: /one/\n\nUser-agent: b\nDisallow: /decoy/\n\nUser-agent: a\nDisallow: /two/\n"
    val r = parse(txt, "a")
    assert(!evaluate(r, "/one/x").fetchable && !evaluate(r, "/two/x").fetchable)
    assert(evaluate(r, "/decoy/x").fetchable)
  }
}
