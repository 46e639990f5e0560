package graft.ops

/** SQL-portable deterministic hash/PRNG toolkit.
  *
  * Every approximate operator (MinHash+LSH, SimHash, random-hyperplane
  * ANN, IVF) derives ALL of its randomness from the functions here,
  * which are chosen so the exact same values are computable in plain
  * SQL (the DuckDB oracle) with BIGINT arithmetic:
  *
  *  - integer state stays in [0, 2^31), so every product fits a signed
  *    64-bit integer — Spark 4 ANSI mode and DuckDB both RAISE on
  *    BIGINT overflow, which rules out the classic wraparound hash
  *    families (xxhash/fnv/splitmix) on the SQL side;
  *  - floating-point values are only produced by exact operations
  *    (int-to-double of values < 2^53, division by a power of two) and
  *    consumed in fixed sequential fold order, so Spark executors and
  *    the SQL engine agree BITWISE, not just approximately.
  *
  * This is what turns the approximate operators from "rows-only
  * checked" into hash-exact oracle rows (VERDICT.md round 1, "Next
  * round" item 2): the oracle re-derives signatures/buckets/planes
  * from the same published formulas and must reproduce the engine's
  * candidate sets identically.
  */
object Portable {

  /** Hash modulus: the Mersenne prime 2^31 - 1. */
  val P31: Long = 2147483647L

  /** Mixer modulus: 2^31 (so `% M31` == `& 0x7fffffff` on non-negatives). */
  val M31: Long = 2147483648L

  /** 3-round LCG + xorshift mixer on [0, 2^31). Weak as one LCG step
    * (affine in the seed), adequate after the xorshift interleave; its
    * merit is being expressible verbatim in SQL — see [[mix31Sql]].
    *
    * The first reduction is `floorMod`, not `%` (ADVICE round 4): the
    * Column twin ([[Sampling.mix31Col]]) uses `pmod` so negative ids
    * stay in [0, 2^31), and all three formulations (Scala, Column,
    * SQL) must agree on ANY 64-bit id — a signed-`%` SQL twin would
    * go negative on negative ids and pass every sampling threshold.
    */
  def mix31(k: Long): Long = {
    var x = (1103515245L * Math.floorMod(k, M31) + 12345L) % M31
    x ^= (x >>> 13)
    x = (1103515245L * x + 12345L) % M31
    x ^= (x >>> 7)
    x = (1103515245L * x + 12345L) % M31
    x
  }

  /** DuckDB expression computing [[mix31]] of BIGINT expression `k`.
    * Single-element list_transform calls are used as let-bindings so
    * each round's value is written once (linear, not exponential,
    * expression size).
    */
  def mix31Sql(k: String): String =
    // (k % 2^31 + 2^31) % 2^31 is DuckDB's pmod spelling: signed `%`
    // keeps the dividend's sign, and a negative mix value would compare
    // below every sampling threshold's positive literal. Intermediates
    // stay < 2^62 (pmod result < 2^31, times the 2^30 multiplier).
    s"list_transform([(1103515245*((($k) % 2147483648 + 2147483648) % 2147483648) + 12345) % 2147483648], " +
      "m1 -> list_transform([(1103515245*xor(m1, m1 >> 13) + 12345) % 2147483648], " +
      "m2 -> (1103515245*xor(m2, m2 >> 7) + 12345) % 2147483648)[1])[1]"

  /** Polynomial 31-bit string hash over Unicode code points:
    * h := (h*31 + cp) mod (2^31-1). The corpus is ASCII; for non-BMP
    * input the SQL twin's per-"character" split may differ from code
    * points — documented ASCII-exact.
    */
  def polyhash31(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % P31
      i += Character.charCount(cp)
    }
    h
  }

  /** DuckDB expression computing [[polyhash31]] of VARCHAR expression
    * `s` (fold over per-character code points; list_prepend supplies
    * the 0 seed).
    */
  def polyhash31Sql(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($s, ''), ch -> CAST(unicode(ch) AS BIGINT))), " +
      "(a, x) -> (a*31 + x) % 2147483647)"

  /** Universal-hash family member j: h_j(x) = (a_j * x + b_j) mod P31,
    * with (a_j, b_j) drawn from [[mix31]]. Products stay < 2^62.
    */
  def seedA(j: Int): Long = 1L + mix31(2L * j + 1L) % (P31 - 1L)
  def seedB(j: Int): Long = mix31(2L * j + 2L) % P31

  /** Hyperplane component d of plane (table t, bit b): an exact dyadic
    * rational in [-1, 1). `mix31(t*1000003 + b*10007 + d) / 2^30 - 1`
    * — int-to-double and power-of-two division are exact, so the SQL
    * twin reproduces the double bitwise.
    */
  def planeComponent(t: Int, b: Int, d: Int): Double =
    mix31(t.toLong * 1000003L + b.toLong * 10007L + d.toLong).toDouble / 1073741824.0 - 1.0

  /** DuckDB expression for [[planeComponent]] with BIGINT expressions
    * t, b, d in scope.
    */
  def planeComponentSql(t: String, b: String, d: String): String =
    s"CAST(${mix31Sql(s"($t)*1000003 + ($b)*10007 + ($d)")} AS DOUBLE)/1073741824.0 - 1.0"

  /** Band-bucket fold: combine a band's signature rows into one
    * bucket id: acc := (acc*1000003 + v) mod 2^31. 31-bit buckets can
    * collide across distinct signatures (~(n_bands·n_docs)²/2^32
    * expected collisions); a collision only ADDS a candidate pair that
    * the exact-similarity verify step re-checks, and both engines
    * compute the same collision, so parity is unaffected.
    */
  def bandBucket(sig: Array[Long], from: Int, len: Int): Long = {
    var acc = 0L
    var i = from
    while (i < from + len) { acc = (acc * 1000003L + sig(i)) % M31; i += 1 }
    acc
  }

  /** Sequential-fold dot product, ascending index, accumulated in
    * double — the ONLY dot-product order any operator may use, because
    * it is the order the SQL twin's list_reduce uses. Inputs are float
    * (parquet) widened exactly to double. Folds the common prefix when
    * lengths differ (an embedding wider than the configured plane dim
    * must not throw mid-job; same contract as CosineSim).
    */
  def dot(a: Array[Float], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i).toDouble * b(i); i += 1 }
    acc
  }

  /** SQL twin of [[dot]]: fold of v[d+1]*w[d+1] with a prepended 0.0
    * seed (`v`, `w` are DOUBLE[] expressions of length `dim`).
    */
  def dotSql(v: String, w: String, dim: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(0, $dim), " +
      s"d -> ($v)[d+1] * ($w)[d+1])), (a, x) -> a + x)"

  /** Cosine via three sequential folds and `dot/sqrt(na*nb)` — matches
    * [[Dedup.cosineOf]] bitwise (each accumulator is its own ascending
    * fold; IEEE ops at fixed order and width are deterministic).
    */
  def cosineSql(v: String, w: String, dim: Int): String =
    s"(${dotSql(v, w, dim)} / sqrt(${dotSql(v, v, dim)} * ${dotSql(w, w, dim)}))"

  /** Literal BIGINT list for SQL interpolation. */
  def sqlLongList(xs: Seq[Long]): String = xs.mkString("[", ", ", "]")
}
