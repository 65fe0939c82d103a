package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants ANY replacement snapshot must keep — the
  * frozen-artifact discipline: swapping in a fuller/newer PSL snapshot
  * is a data edit, and this spec is the contract it must satisfy
  * before [[UrlOps.registrableDomain]] (and its generated DuckDB twin)
  * will interpret it correctly.
  */
class PslSnapshotSpec extends AnyFunSuite {
  private val all = PslSnapshot.icannTwoLabel ++ PslSnapshot.privateTwoLabel ++
    PslSnapshot.threeLabel ++ PslSnapshot.wildcardParents ++ PslSnapshot.exceptions

  test("every rule is lowercase ASCII labels joined by dots (matching lowercased hosts)") {
    val ok = "^[a-z0-9-]+(\\.[a-z0-9-]+)*$".r
    all.foreach(r => assert(ok.findFirstIn(r).isDefined, s"malformed rule: '$r'"))
  }

  test("no duplicate rules within or across sections") {
    assert(all.size == all.distinct.size, {
      val dups = all.groupBy(identity).collect { case (r, v) if v.size > 1 => r }
      s"duplicated rules: ${dups.mkString(", ")}"
    })
  }

  test("label-count grouping is consistent and bounded by maxSuffixLabels") {
    PslSnapshot.exactByLen.foreach { case (k, rules) =>
      rules.foreach(r => assert(r.count(_ == '.') + 1 == k, s"'$r' grouped under $k")) }
    assert(PslSnapshot.exactByLen.keySet == Set(2, 3))
    assert(PslSnapshot.wildcardByLen.keySet.max + 1 <= PslSnapshot.maxSuffixLabels)
    assert(PslSnapshot.maxSuffixLabels == 4)
  }

  test("every exception rule is covered by a wildcard parent (PSL well-formedness)") {
    PslSnapshot.exceptions.foreach { e =>
      val parent = e.split("\\.", 2)(1)
      assert(PslSnapshot.wildcardParents.contains(parent),
        s"exception '$e' has no wildcard parent '*.${parent}'")
    }
  }

  test("the round-13 heuristic's 16 suffixes are all still present (no regression)") {
    val old = Seq("co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
      "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
      "co.kr", "co.za")
    val exact2 = PslSnapshot.exactByLen(2).toSet
    old.foreach(s => assert(exact2.contains(s), s"lost suffix $s"))
  }

  test("the private section carries the platform suffixes the cap story depends on") {
    val exact2 = PslSnapshot.exactByLen(2).toSet
    Seq("github.io", "blogspot.com", "wordpress.com", "netlify.app", "herokuapp.com")
      .foreach(s => assert(exact2.contains(s), s"missing private suffix $s"))
  }
}
