package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}

import graft.operators.RobotsTxt

/** Streaming robots.txt gate — the ONLINE qx72, and the politeness
  * stage of the crawl frontier: URL candidates surviving
  * [[UrlFrontierStream]]'s seen-before state are checked against their
  * domain's robots rules BEFORE any fetch is scheduled. The robots
  * snapshot rides the stream as a plain broadcast value (domains-sized,
  * refreshed by redeploy — the BpeStream/QualityGateStream contract),
  * so the stage is STATELESS: no shuffle, no state store, replays
  * re-emit identical verdicts. Rules are parsed lazily once per
  * (domain, partition) through the same memo [[RobotsTxt.evalDF]] uses,
  * and the verdict arithmetic is the batch gate's evaluator verbatim —
  * RobotsGateStreamSpec pins the streamed grid equal to batch qx72
  * across splits and replay. */
object RobotsGateStream {

  case class UrlEvent(doc_id: Long, domain: String, path: String)
  case class FetchVerdict(doc_id: Long, domain: String, path: String,
                          fetchable: Boolean, rule_len: Long, crawl_delay: Long)

  /** Evaluate a URL stream under a fixed robots snapshot
    * (domain → robots.txt content). Unknown domains are allow-all with
    * zero delay (no robots file = no restrictions, RFC 9309 §2.3.1.4). */
  def verdicts(urls: Dataset[UrlEvent], robotsByDomain: Map[String, String],
               ua: String): Dataset[FetchVerdict] = {
    implicit val enc = Encoders.product[FetchVerdict]
    urls.mapPartitions { it =>
      val memo = scala.collection.mutable.HashMap.empty[String, RobotsTxt.Robots]
      it.map { u =>
        val robots = memo.getOrElseUpdate(u.domain,
          robotsByDomain.get(u.domain)
            .map(c => RobotsTxt.parse(c, ua))
            .getOrElse(RobotsTxt.Robots(Vector.empty, 0L)))
        val v = RobotsTxt.evaluate(robots, u.path)
        FetchVerdict(u.doc_id, u.domain, u.path, v.fetchable, v.ruleLen.toLong,
          robots.crawlDelay)
      }
    }
  }
}
