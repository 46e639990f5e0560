package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.mentions.AhoCorasick

class AhoCorasickSpec extends AnyFunSuite {

  val gaz = Seq(
    "Korea" -> "e:korea",
    "South Korea" -> "e:south_korea",
    "Qatar" -> "e:qatar",
    "Quxland" -> "e:quxland")
  val ac = AhoCorasick.build(gaz)

  def surfaces(hits: List[ac.Hit]): List[String] = hits.map(h => ac.patterns(h.patternIdx)._1)

  test("findAll emits overlapping matches (contains semantics)") {
    val hits = surfaces(ac.findAll("I visited South Korea today"))
    assert(hits.toSet == Set("South Korea", "Korea"))
  }

  test("findNonOverlapping prefers leftmost-longest (South Korea beats Korea)") {
    assert(surfaces(ac.findNonOverlapping("I visited South Korea today")) ==
      List("South Korea"))
    assert(surfaces(ac.findNonOverlapping("Korea and South Korea")) ==
      List("Korea", "South Korea"))
  }

  test("word boundaries: no match inside words") {
    assert(ac.findAll("QatarAirways").isEmpty)
    assert(ac.findAll("NorthKorean peninsula").isEmpty)
    assert(surfaces(ac.findAll("Qatar, (Korea)")).toSet == Set("Qatar", "Korea"))
    assert(surfaces(ac.findAll("QatarAirways", wordBoundary = false)) == List("Qatar"))
  }

  test("word boundaries are ASCII \\b (oracle-regex parity, ADVICE r1)") {
    // underscore IS a word char under \b: Qatar_x must NOT match
    assert(ac.findAll("Qatar_x is here").isEmpty)
    // a non-ASCII letter is NOT a word char under RE2 \b: Qataré DOES match
    assert(surfaces(ac.findAll("Qataré airlines")) == List("Qatar"))
  }

  test("precision: distractors never match fixture text") {
    import graft.fixtures.Fixtures
    val full = AhoCorasick.build(Fixtures.gazetteer)
    (0L until 200L).foreach { i =>
      val t = Fixtures.textOf(Fixtures.recOf(i))
      val hits = full.findNonOverlapping(t).map(h => full.patterns(h.patternIdx)._1)
      assert(!hits.exists(Set("Quxland", "Blorptopia")), s"false positive in: $t")
      assert(hits == List(Fixtures.recOf(i).country), s"expected 1 mention in: $t, got $hits")
    }
  }

  test("offsets are exact") {
    val hits = ac.findAll("xx Qatar yy")
    assert(hits.map(h => (h.begin, h.end)) == List((3, 8)))
  }

  test("empty text / no patterns edge cases") {
    assert(ac.findAll("").isEmpty)
    val empty = AhoCorasick.build(Seq.empty)
    assert(empty.findAll("anything").isEmpty)
  }
}
