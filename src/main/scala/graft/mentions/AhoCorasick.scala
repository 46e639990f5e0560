package graft.mentions

import scala.collection.mutable

/** Serializable Aho-Corasick automaton for gazetteer mention detection.
  *
  * Built ONCE on the driver from the (small) gazetteer table and
  * broadcast to executors; matching is a single linear pass per page —
  * the Spark-first replacement for a mention join (SURVEY.md §4.2:
  * "trie is broadcast as an object, not a join at all").
  *
  * The transition table is FLAT ARRAYS (per-node sorted char[] +
  * target int[], binary-searched): this loop touches every character
  * of every page, and the boxed `Map[Char,Int]` formulation profiled
  * as the single hottest call site in the whole pipeline (HashMap
  * probe + Char boxing per input char) with enough allocation to put
  * GC on the critical path at high thread counts. The automaton is
  * built with maps and frozen into arrays.
  *
  * `findAll` emits every occurrence of every pattern (overlaps
  * included — equivalent to per-pattern `contains`+offsets, which the
  * DuckDB oracle can check); `findNonOverlapping` applies
  * leftmost-longest selection (so "South Korea" beats its suffix
  * "Korea") — the linking-grade mode.
  */
final class AhoCorasick private (
    val patterns: Array[(String, String)], // (surface, entity_id)
    nodeChars: Array[Array[Char]],  // sorted transition chars per node
    nodeTargets: Array[Array[Int]], // parallel target states
    fail: Array[Int],
    out: Array[Array[Int]]          // pattern indices emitted at state
) extends Serializable {

  final case class Hit(begin: Int, end: Int, patternIdx: Int) {
    def surface(pats: Array[(String, String)]): String = pats(patternIdx)._1
  }

  @inline private def goTo(state: Int, c: Char): Int = {
    val chars = nodeChars(state)
    var lo = 0
    var hi = chars.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mc = chars(mid)
      if (mc == c) return nodeTargets(state)(mid)
      else if (mc < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  @inline private def step(state0: Int, c: Char): Int = {
    var state = state0
    var t = goTo(state, c)
    while (t < 0 && state != 0) { state = fail(state); t = goTo(state, c) }
    if (t < 0) 0 else t
  }

  /** ASCII `\b` word character — EXACTLY the class the regex oracles
    * use (RE2/DuckDB `\b` = [0-9A-Za-z_]): underscore is a word char,
    * non-ASCII letters are not. Round 1 used isLetterOrDigit, which
    * silently diverged on 'spark_x' (engine matched, oracle didn't)
    * and 'sparké' (oracle matched, engine didn't) — ADVICE round 1.
    */
  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  private def boundaryOk(text: String, b: Int, e: Int): Boolean = {
    val okL = b == 0 || !isWordChar(text.charAt(b - 1))
    val okR = e >= text.length || !isWordChar(text.charAt(e))
    okL && okR
  }

  /** All matches: (begin, endExclusive, patternIdx). */
  def findAll(text: String, wordBoundary: Boolean = true): List[Hit] = {
    val hits = mutable.ListBuffer.empty[Hit]
    var state = 0
    var i = 0
    while (i < text.length) {
      state = step(state, text.charAt(i))
      val o = out(state)
      var k = 0
      while (k < o.length) {
        val pi = o(k)
        val len = patterns(pi)._1.length
        val b = i + 1 - len
        if (!wordBoundary || boundaryOk(text, b, i + 1)) hits += Hit(b, i + 1, pi)
        k += 1
      }
      i += 1
    }
    hits.toList
  }

  /** Leftmost-longest non-overlapping selection. Deterministic:
    * ties (same span) broken by pattern index.
    */
  def findNonOverlapping(text: String, wordBoundary: Boolean = true): List[Hit] = {
    val all = findAll(text, wordBoundary)
      .sortBy(h => (h.begin, -(h.end - h.begin), h.patternIdx))
    val sel = mutable.ListBuffer.empty[Hit]
    var lastEnd = 0
    for (h <- all) {
      if (h.begin >= lastEnd) { sel += h; lastEnd = h.end }
    }
    sel.toList
  }
}

object AhoCorasick {

  def build(gaz: Seq[(String, String)]): AhoCorasick = {
    val patterns = gaz.filter(_._1.nonEmpty).toArray
    val gotoMaps = mutable.ArrayBuffer[mutable.Map[Char, Int]](mutable.Map.empty)
    val outB = mutable.ArrayBuffer[List[Int]](Nil)

    // trie
    patterns.zipWithIndex.foreach { case ((surf, _), pi) =>
      var state = 0
      surf.foreach { c =>
        state = gotoMaps(state).getOrElseUpdate(c, {
          gotoMaps += mutable.Map.empty
          outB += Nil
          gotoMaps.size - 1
        })
      }
      outB(state) = pi :: outB(state)
    }

    // fail links (BFS)
    val fail = Array.fill(gotoMaps.size)(0)
    val queue = mutable.Queue.empty[Int]
    gotoMaps(0).values.foreach(queue.enqueue)
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      gotoMaps(r).foreach { case (c, s) =>
        queue.enqueue(s)
        var st = fail(r)
        while (st != 0 && !gotoMaps(st).contains(c)) st = fail(st)
        fail(s) = if (s != gotoMaps(st).getOrElse(c, 0)) gotoMaps(st).getOrElse(c, 0) else 0
        outB(s) = outB(s) ++ outB(fail(s))
      }
    }

    // freeze into flat sorted arrays (the matching-time representation)
    val n = gotoMaps.size
    val nodeChars = new Array[Array[Char]](n)
    val nodeTargets = new Array[Array[Int]](n)
    var i = 0
    while (i < n) {
      val entries = gotoMaps(i).toArray.sortBy(_._1)
      nodeChars(i) = entries.map(_._1)
      nodeTargets(i) = entries.map(_._2)
      i += 1
    }
    new AhoCorasick(patterns, nodeChars, nodeTargets, fail, outB.map(_.toArray).toArray)
  }
}
