package graft.warc

/** Minimal robots.txt (RFC 9309) group parser + the longest-match
  * evaluation rule — the compliance half of a crawl pipeline. Public
  * format, implemented from the spec (the WarcIO discipline).
  *
  * Semantics implemented (and spec-pinned in RobotsRulesSpec):
  *  - lines are `key: value`, keys case-insensitive, `#` comments
  *    stripped, blank/garbage lines ignored;
  *  - a GROUP is one or more consecutive `User-agent` lines followed by
  *    its rules; a `User-agent` line after rules starts a new group;
  *  - the agent picks the union of all groups naming it exactly
  *    (case-insensitive product token match); if none name it, the
  *    union of all `*` groups applies; no group at all → allow all;
  *  - evaluation is LONGEST-PREFIX-WINS over the matched group's
  *    Allow/Disallow prefixes, ties broken toward Allow (the
  *    documented Google rule RFC 9309 standardized);
  *  - an empty `Disallow:` value is "no rule" (allows everything) —
  *    the classic allow-all idiom.
  */
object RobotsRules {

  /** One path rule: `allow` verdict for paths starting with `prefix`. */
  final case class Rule(allow: Boolean, prefix: String)

  /** Parse `body` and return the rules governing `agent` (possibly
    * empty = everything allowed).
    */
  def parse(body: String, agent: String): Seq[Rule] = {
    val want = agent.toLowerCase
    val exact = Vector.newBuilder[Rule]
    val wild = Vector.newBuilder[Rule]
    var groupAgents: Set[String] = Set.empty
    var inRules = false // are we past the group's User-agent block?
    var sawExact = false
    for (raw <- body.linesIterator) {
      val line = raw.indexOf('#') match {
        case -1 => raw.trim
        case i => raw.substring(0, i).trim
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) { groupAgents = Set.empty; inRules = false }
            groupAgents += value.toLowerCase
          case "allow" | "disallow" =>
            inRules = true
            if (value.nonEmpty) { // empty Disallow: = no rule
              val r = Rule(key == "allow", value)
              if (groupAgents.contains(want)) { exact += r; sawExact = true }
              else if (groupAgents.contains("*")) wild += r
            } else if (groupAgents.contains(want)) sawExact = true
          case _ => () // crawl-delay, sitemap, unknown: ignored
        }
      }
    }
    if (sawExact) exact.result() else wild.result()
  }

  /** Longest-prefix verdict for `path` under `rules`; ties toward
    * Allow; no matching rule → allowed.
    */
  def allowed(rules: Seq[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    for (r <- rules if path.startsWith(r.prefix)) {
      val l = r.prefix.length
      if (l > bestLen || (l == bestLen && r.allow)) {
        bestLen = l; bestAllow = r.allow
      }
    }
    bestAllow
  }
}
