package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene. The driver contract flattens `SparkEntry.all` into
  * Maps, where a DUPLICATE name silently last-wins — two queries under
  * one name means one of them stops being gated (and benches under the
  * other's baseline) with zero signal anywhere. Round 13 hit exactly
  * this (two `ev_seasonality` registrations); this spec makes the next
  * collision a loud failure instead.
  */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique across the whole registry") {
    val names = SparkEntry.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty,
      s"duplicate query registrations (last-wins would shadow one): $dups")
    assert(names.size === SparkEntry.queries.size)
  }

  test("every oracle belongs to a registered query, names well-formed") {
    val names = SparkEntry.all.map(_.name).toSet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
    names.foreach(n => assert(n.matches("[a-z0-9_]+"), n))
  }
}
