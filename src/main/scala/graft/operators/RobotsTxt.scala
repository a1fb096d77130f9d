package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

/** REAL robots.txt evaluation (RFC 9309, the Robots Exclusion Protocol)
  * — the crawl-politeness gate that belongs between qx65's URL frontier
  * and the fetch: a crawler may only fetch a URL its domain's robots
  * rules allow, and must honor the domain's crawl delay.
  *
  * The parser implements the RFC semantics, not a line grep:
  *  - GROUPS: consecutive `User-agent:` lines open one group; the rules
  *    after them belong to that group; rules before any group are
  *    ignored. Field names AND user-agent tokens match
  *    case-insensitively (Locale.ROOT — the qx68 lesson), `#` starts a
  *    comment, blank lines are cosmetic;
  *  - GROUP SELECTION: if any group names OUR agent, the union of those
  *    groups applies and every `*` group is IGNORED (the classic trap:
  *    a `User-agent: *` / `Disallow: /` fallback must not block an
  *    agent that has its own group); otherwise the `*` groups apply;
  *  - RULE MATCHING: patterns anchor at the path start, `*` matches any
  *    octet sequence, `$` (final character only) anchors the end, and
  *    an un-anchored pattern matches any path PREFIX (implemented as
  *    glob `p*`). The MOST SPECIFIC (longest) matching rule wins;
  *    at equal length `Allow` beats `Disallow` (RFC 9309 §2.2.2).
  *    An empty `Disallow:` matches nothing (allow-all);
  *  - `Crawl-delay` (the de-facto extension) is read from the selected
  *    group.
  *
  * Scale shape: robots content rides a broadcast-able domains-sized
  * table joined to the URL stream; [[evalDF]] then runs partition-local
  * with a per-partition memo (domain → compiled rules), so a domain's
  * robots parse once per partition — pre-partition the URLs by domain
  * (the qx62 exchange) and it parses once per domain. No shuffle of its
  * own, no driver-side state.
  */
object RobotsTxt {

  final case class Rule(allow: Boolean, pattern: String)
  final case class Robots(rules: Vector[Rule], crawlDelay: Long)
  final case class Verdict(fetchable: Boolean, ruleLen: Int)

  /** Full glob match: `*` matches any sequence; everything else (incl.
    * a non-final `$`) is literal. Iterative with star backtracking. */
  private def fullGlob(p: String, s: String): Boolean = {
    var i = 0; var j = 0; var star = -1; var mark = 0
    while (i < s.length) {
      if (j < p.length && (p.charAt(j) == '*')) { star = j; mark = i; j += 1 }
      else if (j < p.length && p.charAt(j) == s.charAt(i)) { i += 1; j += 1 }
      else if (star >= 0) { j = star + 1; mark += 1; i = mark }
      else return false
    }
    while (j < p.length && p.charAt(j) == '*') j += 1
    j == p.length
  }

  /** RFC 9309 path match: start-anchored; `$` at pattern end anchors
    * the path end; otherwise prefix semantics. Empty patterns match
    * nothing. */
  def matches(pattern: String, path: String): Boolean =
    if (pattern.isEmpty) false
    else if (pattern.endsWith("$")) fullGlob(pattern.dropRight(1), path)
    else fullGlob(pattern + "*", path)

  /** Parse robots.txt content and select the rule set for `ua`. */
  def parse(content: String, ua: String): Robots = {
    val uaLower = ua.toLowerCase(java.util.Locale.ROOT)
    // (uaTokens, rules, crawlDelay) per group, in file order
    final case class Group(uas: mutable.ArrayBuffer[String],
                           rules: mutable.ArrayBuffer[Rule],
                           var delay: Long)
    val groups = mutable.ArrayBuffer.empty[Group]
    var current: Group = null
    var lastWasUa = false
    for (raw <- content.split("\n")) {
      val noComment = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }
      val line = noComment.trim
      if (line.nonEmpty) {
        val c = line.indexOf(':')
        if (c > 0) {
          val name = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(c + 1).trim
          name match {
            case "user-agent" =>
              if (!lastWasUa) {
                current = Group(mutable.ArrayBuffer.empty, mutable.ArrayBuffer.empty, 0L)
                groups += current
              }
              current.uas += value.toLowerCase(java.util.Locale.ROOT)
              lastWasUa = true
            case "allow" if current != null =>
              current.rules += Rule(allow = true, value); lastWasUa = false
            case "disallow" if current != null =>
              current.rules += Rule(allow = false, value); lastWasUa = false
            case "crawl-delay" if current != null =>
              // Unparseable values (fractional "0.5", junk) are ignored
              // like any other malformed line — a general RFC 9309
              // evaluator must not fail the task on one bad directive.
              value.trim.toLongOption.foreach(d => current.delay = d)
              lastWasUa = false
            case _ => lastWasUa = false // sitemap, unknown fields, orphan rules
          }
        }
      }
    }
    val mine = groups.filter(_.uas.contains(uaLower))
    val selected = if (mine.nonEmpty) mine else groups.filter(_.uas.contains("*"))
    Robots(selected.iterator.flatMap(_.rules).toVector,
      selected.iterator.map(_.delay).foldLeft(0L)(math.max))
  }

  /** Most-specific-match verdict for one path. */
  def evaluate(robots: Robots, path: String): Verdict = {
    var bestLen = -1; var bestAllow = true
    for (r <- robots.rules if matches(r.pattern, path)) {
      val len = r.pattern.length
      if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
        bestLen = len; bestAllow = r.allow
      }
    }
    if (bestLen < 0) Verdict(fetchable = true, ruleLen = 0)
    else Verdict(bestAllow, bestLen)
  }

  /** (doc_id, domain, path, content) → + (fetchable, rule_len,
    * crawl_delay). Partition-local; robots parse memoized per domain
    * within each partition. */
  def evalDF(joined: DataFrame, ua: String): DataFrame = {
    val spark = joined.sparkSession
    import spark.implicits._
    joined.select("doc_id", "domain", "path", "content")
      .as[(Long, String, String, String)]
      .mapPartitions { it =>
        val memo = mutable.HashMap.empty[String, Robots]
        it.map { case (id, dom, path, content) =>
          val robots = memo.getOrElseUpdate(dom, parse(content, ua))
          val v = evaluate(robots, path)
          (id, dom, path, v.fetchable, v.ruleLen.toLong, robots.crawlDelay)
        }
      }
      .toDF("doc_id", "domain", "path", "fetchable", "rule_len", "crawl_delay")
  }
}
