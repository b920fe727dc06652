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
}
