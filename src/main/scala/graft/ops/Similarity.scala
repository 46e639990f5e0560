package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - brute-force top-k: broadcast the (small) query set against the
  *    corpus — one narrow stage computing cosines + one shuffle for the
  *    per-query top-k. This is the exactness baseline and the right
  *    plan whenever |queries| is broadcastable, at ANY corpus size
  *    (the corpus side streams; nothing is collected).
  *  - LSH-bucketed: random-hyperplane signatures put each vector into
  *    2^bits sign buckets × `tables` independent tables; queries probe
  *    their own buckets only, so the join touches ~corpus/2^bits ×
  *    tables candidates per query instead of the full corpus. Recall
  *    is tunable via (bits, tables); candidates are re-ranked by TRUE
  *    cosine. At 100 TB the bucketed join is the only viable shape —
  *    the bucket id is a shuffle-friendly integer key and skewed
  *    buckets split under AQE.
  *
  * Hyperplanes are seeded deterministically (splitmix-based), so
  * signatures — and therefore results — are partitioning-invariant.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector (brute force).
    * Output: (query_id, rank, neighbor_id, sim).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = corpus.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(Dedup.cosine(col("q_emb"), col("embedding")), 5))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id", "sim")
  }

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic pseudo-random hyperplanes: tables × bits planes of
    * dim components in [-1, 1]. Driver-side constants, folded into the
    * plan as literals.
    */
  def hyperplanes(tables: Int, bits: Int, dim: Int): Seq[Seq[Seq[Double]]] =
    (0 until tables).map(t => (0 until bits).map(b => (0 until dim).map { d =>
      val h = splitmix64(t.toLong * 1000003L + b.toLong * 10007L + d)
      (h.toDouble / Long.MaxValue.toDouble)
    }))

  /** Sign-bucket id of an embedding under one table's planes. */
  def lshBucket(emb: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val lits = typedLit(p)
      val dotp = aggregate(
        zip_with(emb, lits, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(dotp >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed approximate top-k: multi-table sign-hash blocking,
    * exact cosine re-rank within the candidate union.
    * Output: (query_id, rank, neighbor_id, sim) — ranks are per-query
    * over candidates found (≤ k rows per query; fewer if recall misses).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      tables: Int = 8, bits: Int = 8, dim: Int = 64): DataFrame = {
    val hp = hyperplanes(tables, bits, dim)
    def bucketed(df: DataFrame, idCol: String) = df.select(
      col("vec_id").as(idCol), col("embedding").as(s"${idCol}_emb"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("table"), lshBucket(col("embedding"), hp(t)).as("bucket"))): _*)).as("tb"))
      .select(col(idCol), col(s"${idCol}_emb"), col("tb.table").as("table"), col("tb.bucket").as("bucket"))

    val c = bucketed(corpus, "neighbor_id")
    val q = bucketed(queries, "query_id")
    val cand = c.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        col("query_id_emb").as("q_emb"), col("neighbor_id_emb").as("n_emb"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("sim", round(Dedup.cosine(col("q_emb"), col("n_emb")), 5))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    cand.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id", "sim")
  }
}
