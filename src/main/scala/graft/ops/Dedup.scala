package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data curation, each designed
  * around its 100 TB shuffle shape:
  *
  *  - exact: one hash-groupBy shuffle on a 32-byte key (never on the
  *    document body itself — map-side partial agg absorbs hot groups).
  *  - n-gram Jaccard: inverted-index self-join with a document-frequency
  *    cap (`maxDf`) so a stop-shingle ("of the and") can never create an
  *    O(n²) bucket — the cap is the scale knob.
  *  - MinHash+LSH: signatures are pure Column trees (higher-order
  *    functions over the shingle array, codegen'd); the only shuffle is
  *    the band-bucket self-join, whose bucket sizes LSH bounds with high
  *    probability; candidates are verified with exact Jaccard.
  *  - SimHash: 64-bit signature, banded into 4×16-bit chunks (any
  *    near-dup pair within Hamming distance 3 shares ≥1 exact chunk —
  *    pigeonhole), then verified with bit_count(xor).
  *
  * All signatures derive from content only (xxhash64 of shingle text),
  * never from row position — results are invariant under partitioning
  * and parallelism (SURVEY.md §4.3).
  */
object Dedup {

  // ---------- exact ----------

  /** Exact dedup via content hash: one row per distinct text, keeping
    * the smallest doc_id (deterministic representative election).
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("group_size"))

  /** Normalized-exact dedup (case/punct-insensitive fingerprint). */
  def normalizedExact(docs: DataFrame): DataFrame =
    docs.groupBy(TextOps.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("group_size"))

  // ---------- shingling ----------

  /** Distinct word n-gram shingles of a text column. */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextOps.tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
  }

  /** Exact n-gram Jaccard near-dup pairs via inverted index.
    *
    * Shingles with document frequency 1 can't contribute to any pair
    * and are dropped before the self-join; shingles with df > maxDf are
    * treated as stop-shingles (scale guard — at web scale a handful of
    * boilerplate shingles would otherwise quadratically dominate).
    * Set sizes are computed BEFORE any df filtering so the Jaccard
    * denominator is the true |A ∪ B|.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, tau: Double = 0.5,
      maxDf: Long = Long.MaxValue): DataFrame = {
    val sh = docs
      .select(col("doc_id"), shingles(col("text"), n).as("sh"))
      .withColumn("sz", size(col("sh")).cast("long"))
      .filter(col("sz") > 0)
    val posting = sh.select(col("doc_id"), col("sz"), explode(col("sh")).as("shingle"))
    val keep = posting.groupBy("shingle")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select("shingle")
    val p = posting.join(keep, "shingle")
    p.as("a").join(p.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", round(
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")), 5))
      .filter(col("jaccard") >= tau)
      .select("id_a", "id_b", "jaccard")
  }

  // ---------- MinHash + LSH ----------

  /** MinHash signature as a Column: numHashes independent seeded
    * rehashes min'd over the shingle set — the i-th hash family member
    * is xxhash64(shingle, i), which avoids affine a*h+b arithmetic
    * entirely (Spark 4 ANSI mode makes long overflow an error, and
    * wrap-around is exactly what an affine rehash relies on). All
    * higher-order built-ins — one narrow projection, no UDF, no
    * shuffle.
    */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(sh, s => xxhash64(s, i))))

  /** MinHash/LSH near-dup pairs: band the signature, self-join on
    * (band, bucket), verify candidates with EXACT Jaccard over the
    * shingle sets (LSH only prunes; it never asserts).
    *
    * numHashes = bands * rowsPerBand. With (16 bands × 8 rows) the
    * collision probability at J=0.8 is ~0.93, at J=0.3 is ~0.001 —
    * the classic S-curve.
    */
  def minhashLshPairs(docs: DataFrame, n: Int = 3, tau: Double = 0.5,
      bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sh = docs
      .select(col("doc_id"), shingles(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val banded = sh.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            xxhash64(slice(col("sig"), b * lit(rowsPerBand) + lit(1),
              lit(rowsPerBand))).as("bucket")))).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val sets = sh.select(col("doc_id"), col("sh"))
    cand
      .join(sets.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")), 5))
      .filter(col("jaccard") >= tau)
      .select("id_a", "id_b", "jaccard")
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash over the distinct token set: per bit, sum ±1 votes
    * from each token's xxhash64, take the sign. Pure higher-order
    * Column fold (zip_with accumulator over 64 lanes).
    */
  def simhash(text: Column): Column = {
    val toks = array_distinct(TextOps.tokens(text))
    val lanes = sequence(lit(0), lit(63))
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, lanes, (a, j) =>
          a + when(call_function("shiftrightunsigned", h, j).bitwiseAND(lit(1L)) === 1L,
            lit(1L)).otherwise(lit(-1L)))
      })
    aggregate(lanes, lit(0L), (acc, j) =>
      when(element_at(votes, j.cast("int") + lit(1)) > 0,
        acc.bitwiseOR(call_function("shiftleft", lit(1L), j))).otherwise(acc))
  }

  /** SimHash near-dup pairs within Hamming distance maxHamming (≤ 3
    * with 4 chunks, by pigeonhole): block on exact 16-bit chunks, then
    * verify with bit_count(xor).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col("doc_id"), simhash(col("text")).as("sig"))
    val chunked = sigs.select(col("doc_id"), col("sig"),
        explode(transform(sequence(lit(0), lit(3)), c => struct(c.as("chunk"),
          call_function("shiftrightunsigned", col("sig"), c * lit(16))
            .bitwiseAND(lit(0xffffL)).as("key")))).as("ck"))
      .select(col("doc_id"), col("sig"), col("ck.chunk").as("chunk"), col("ck.key").as("key"))
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---------- embedding near-dup ----------

  /** Cosine similarity of two float-array columns, accumulated in
    * double. Single sequential fold per side — deterministic.
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = aggregate(
      zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))
  }

  /** Embedding-cosine near-dup pairs, blocked by a coarse key (here:
    * the `label` column stands in for the LSH/IVF bucket a production
    * run would block on) so the self-join is per-block, not global.
    */
  def embeddingNearDupPairs(emb: DataFrame, tau: Double = 0.95,
      blockCol: String = "label"): DataFrame = {
    val e = emb.select(col("vec_id"), col(blockCol).as("blk"), col("embedding"))
    e.as("a").join(e.as("b"),
        col("a.blk") === col("b.blk") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", round(cosine(col("a.embedding"), col("b.embedding")), 5))
      .filter(col("sim") >= tau)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), col("sim"))
  }
}
