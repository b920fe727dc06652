package graft.warc

import org.scalatest.funsuite.AnyFunSuite
import RobotsRules.{allowed, parse, Rule}

/** The RFC 9309 semantics web_robots_gate relies on, pinned line by
  * line: grouping, agent selection, longest-match, and the allow-all
  * idioms — a compliance component that misreads a robots.txt is a
  * crawler that gets a dataset's source banned.
  */
class RobotsRulesSpec extends AnyFunSuite {

  test("groups: UA lines stack, rules close a group, comments ignored") {
    val body =
      """# policy
        |User-agent: alpha
        |User-agent: beta
        |Disallow: /a   # trailing comment
        |
        |User-agent: gamma
        |Allow: /b
        |Disallow: /
        |not a directive
        |""".stripMargin
    assert(parse(body, "beta") === Seq(Rule(false, "/a")))
    assert(parse(body, "ALPHA") === Seq(Rule(false, "/a")))
    assert(parse(body, "gamma") ===
      Seq(Rule(true, "/b"), Rule(false, "/")))
    assert(parse(body, "other") === Seq.empty) // no * group at all
  }

  test("exact-agent groups beat *, and multiple exact groups union") {
    val body =
      """User-agent: *
        |Disallow: /
        |
        |User-agent: bot
        |Disallow: /x
        |
        |User-agent: bot
        |Allow: /x/ok
        |""".stripMargin
    assert(parse(body, "bot").toSet ===
      Set(Rule(false, "/x"), Rule(true, "/x/ok")))
    assert(parse(body, "stranger") === Seq(Rule(false, "/")))
  }

  test("empty Disallow is the allow-all idiom, even for exact agents") {
    val body = "User-agent: bot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    // bot HAS a group (so * must not apply) but the group has no rules
    assert(parse(body, "bot") === Seq.empty)
    assert(allowed(parse(body, "bot"), "/anything"))
    assert(!allowed(parse(body, "other"), "/anything"))
  }

  test("longest prefix wins; equal length ties go to Allow") {
    val rules = Seq(Rule(false, "/doc/"), Rule(true, "/doc/1"))
    assert(!allowed(rules, "/doc/2"))
    assert(allowed(rules, "/doc/1"))
    assert(allowed(rules, "/doc/15")) // prefix, not equality
    assert(allowed(Seq(Rule(false, "/p"), Rule(true, "/p")), "/p/x"))
    assert(allowed(rules, "/elsewhere")) // no rule matches → allowed
  }

  // ---- RFC 9309 §2.2.3 special characters (round-14 ADVICE fix) ----

  test("'*' matches any run including '/' and empty") {
    val rules = Seq(Rule(false, "/*.php"))
    assert(!allowed(rules, "/index.php"))
    assert(!allowed(rules, "/a/b/index.php"))
    assert(!allowed(rules, "/.php")) // '*' may match empty
    assert(!allowed(rules, "/x.php?q=1")) // prefix match past pattern end
    assert(allowed(rules, "/index.phtml")) // '.php' never aligns fully
    assert(allowed(rules, "/php")) // no '.' before php
  }

  test("'$' anchors to end of path") {
    val rules = Seq(Rule(false, "/private$"))
    assert(!allowed(rules, "/private"))
    assert(allowed(rules, "/private/")) // not end-anchored match
    assert(allowed(rules, "/privateer"))
    // star + anchor compose: block exactly *.php, allow trailing data
    val px = Seq(Rule(false, "/*.php$"))
    assert(!allowed(px, "/deep/path/x.php"))
    assert(allowed(px, "/x.php?q=1"))
    // backtracking: the star must be able to retry later alignments
    assert(!allowed(Seq(Rule(false, "/a*b$")), "/abxb"))
  }

  test("most-specific still wins with patterns, ties to Allow") {
    val rules = Seq(Rule(false, "/*.php"), Rule(true, "/shared/*.php"))
    assert(!allowed(rules, "/x.php"))
    assert(allowed(rules, "/shared/x.php")) // longer pattern wins
  }

  test("percent-encoding normalization: unreserved decodes, reserved stays") {
    // %61 = 'a' (unreserved) decodes in both pattern and path
    assert(!allowed(Seq(Rule(false, "/p%61th")), "/path"))
    assert(!allowed(Seq(Rule(false, "/path")), "/p%61th"))
    // %2F (reserved '/') must NOT decode into a path separator,
    // and lowercase hex canonicalizes to uppercase so both sides agree
    assert(!allowed(Seq(Rule(false, "/a%2Fb")), "/a%2fb"))
    assert(allowed(Seq(Rule(false, "/a%2Fb")), "/a/b"))
    // an encoded '*' (%2A) stays encoded and is never a wildcard: it
    // matches the same encoded octets (any hex case), not arbitrary runs
    assert(!allowed(Seq(Rule(false, "/x%2Ay")), "/x%2ay"))
    assert(allowed(Seq(Rule(false, "/x%2Ay")), "/xZZZy"))
    ()
  }

  test("parse normalizes pattern escapes once") {
    val body = "User-agent: *\nDisallow: /p%61th\n"
    assert(parse(body, "bot") === Seq(Rule(false, "/path")))
  }
}
