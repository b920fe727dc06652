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
  *  - rule values are PATTERNS per RFC 9309 §2.2.3: `*` matches any
  *    run of characters (including `/`), a trailing `$` anchors the
  *    match to the end of the path, anything else is a literal
  *    prefix match;
  *  - percent-encoding normalization per §2.2.2: unreserved
  *    percent-escapes are decoded in both pattern and path before
  *    comparison; RFC 3986 reserved characters (and `%` itself) stay
  *    encoded with canonical uppercase hex, so `%2F` never turns into
  *    a path `/` and an encoded `%2A` never becomes a wildcard `*`;
  *  - evaluation is MOST-SPECIFIC-WINS over the matched group's
  *    Allow/Disallow patterns — longest pattern in octets, ties broken
  *    toward Allow (the documented Google rule RFC 9309 standardized);
  *  - an empty `Disallow:` value is "no rule" (allows everything) —
  *    the classic allow-all idiom.
  */
object RobotsRules {

  /** One path rule: `allow` verdict for paths matching `pattern`
    * (literal prefix unless it contains `*` / trailing `$`). The field
    * keeps its historical name `prefix`; it holds the full RFC 9309
    * pattern, percent-normalized at parse time.
    */
  final case class Rule(allow: Boolean, prefix: String)

  /** RFC 3986 reserved characters (gen-delims + sub-delims) plus `%`:
    * these stay percent-encoded under §2.2.2 normalization — decoding
    * them would change path structure (`%2F` → `/`) or rule syntax
    * (`%2A` → `*`, `%24` → `$`).
    */
  private val Reserved: Set[Char] = ":/?#[]@!$&'()*+,;=%".toSet

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** §2.2.2 normalization: decode unreserved percent-escapes; keep
    * reserved (and malformed) escapes, canonicalized to uppercase hex
    * so `%2f` and `%2F` compare equal. Escapes ≥ 0x80 are left encoded
    * (a UTF-8 byte sequence compares equal encoded-vs-encoded, which is
    * all the longest-match rule needs).
    */
  private[warc] def pctNormalize(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16)
        if (v < 0x80 && !Reserved.contains(v.toChar)) sb.append(v.toChar)
        else sb.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Does RFC 9309 pattern `pattern` match `path`? `*` matches any run
    * (including empty, including `/`); a trailing `$` anchors to
    * end-of-path; otherwise a match of the whole pattern against any
    * PREFIX of the path suffices. Iterative two-pointer glob with
    * single-star backtracking — O(|pattern|·|path|) worst case, zero
    * allocation, because this runs per (url, rule) pair inside the
    * broadcast-join gate at corpus scale.
    *
    * Both arguments are assumed percent-normalized (parse() normalizes
    * patterns; use [[ruleMatches]] for a raw path).
    */
  private[warc] def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    var i = 0; var j = 0
    var starI = -1; var starJ = -1
    while (true) {
      if (i == p.length && (!anchored || j == path.length)) return true
      if (i < p.length && p.charAt(i) == '*') { starI = i; starJ = j; i += 1 }
      else if (i < p.length && j < path.length && p.charAt(i) == path.charAt(j)) {
        i += 1; j += 1
      } else if (starI >= 0 && starJ < path.length) {
        starJ += 1; i = starI + 1; j = starJ
      } else return false
    }
    false // unreachable
  }

  /** Pattern match against a RAW (not yet normalized) path — the entry
    * point for distributed gates that evaluate rules per URL.
    */
  def ruleMatches(pattern: String, path: String): Boolean =
    matches(pattern, pctNormalize(path))

  /** Parse `body` and return the rules governing `agent` (possibly
    * empty = everything allowed). Patterns are percent-normalized here,
    * once, so per-path evaluation never re-normalizes the rule side.
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
              val r = Rule(key == "allow", pctNormalize(value))
              if (groupAgents.contains(want)) { exact += r; sawExact = true }
              else if (groupAgents.contains("*")) wild += r
            } else if (groupAgents.contains(want)) sawExact = true
          case _ => () // crawl-delay, sitemap, unknown: ignored
        }
      }
    }
    if (sawExact) exact.result() else wild.result()
  }

  /** Most-specific verdict for `path` under `rules` (longest pattern in
    * octets wins; ties toward Allow; no matching rule → allowed).
    * Patterns are re-normalized here (idempotent) so rules constructed
    * directly — not through [[parse]] — get the same §2.2.2 semantics.
    */
  def allowed(rules: Seq[Rule], path: String): Boolean = {
    val p = pctNormalize(path)
    var bestLen = -1
    var bestAllow = true
    for (r <- rules) {
      val pat = pctNormalize(r.prefix)
      if (matches(pat, p)) {
        val l = pat.length
        if (l > bestLen || (l == bestLen && r.allow)) {
          bestLen = l; bestAllow = r.allow
        }
      }
    }
    bestAllow
  }
}
