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

  /** IVF (inverted-file) approximate top-k — the other classic ANN
    * scale path: k-means-lite centroids (seeded from the lowest ids,
    * refined by `iters` Lloyd steps, all DataFrame ops), an inverted
    * index (centroid → vector list) materialized once, and queries
    * probing only their `nprobe` nearest lists. The index build is
    * shuffle-bounded by (nLists × dim); the search join touches
    * ~corpus × nprobe / nLists rows per query instead of the corpus.
    * Candidates re-rank by exact cosine.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nLists: Int = 16, nprobe: Int = 4, iters: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val corp = corpus.select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // seed centroids: deterministic (lowest vec_ids), then Lloyd steps
    var centroids: Array[(Int, Seq[Double])] = corp.orderBy("vec_id").limit(nLists)
      .collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Float](1).map(_.toDouble) }

    def assign(df: DataFrame): DataFrame = {
      // argmin over centroid cosine distance, computed as a when-chain
      // over the (small, driver-side) centroid set — stays codegen'd
      val sims = centroids.map { case (cid, c) =>
        val lits = typedLit(c)
        val s = Dedup.cosine(col("embedding"), lits)
        struct(s.as("sim"), lit(cid).as("cid"))
      }
      df.withColumn("best", greatest(sims: _*))
        .withColumn("list_id", col("best.cid")).drop("best")
    }

    (1 to iters).foreach { _ =>
      val means = assign(corp)
        .select(col("list_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("list_id", "pos").agg(avg(col("v")).as("m"))
        .groupBy("list_id")
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("ps"))
        .select(col("list_id"), expr("transform(ps, x -> x.m)").as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1))
      // keep any list that emptied out at its previous centroid
      val byId = means.toMap
      centroids = centroids.map { case (cid, c) => cid -> byId.getOrElse(cid, c) }
    }

    val index = assign(corp).select(col("list_id"),
      col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"))

    // queries probe their nprobe nearest centroids (struct sort on
    // (sim, cid), reversed -> deterministic descending order)
    val qsims = centroids.map { case (cid, c) =>
      struct(Dedup.cosine(col("q_emb"), typedLit(c)).as("sim"), lit(cid).as("cid"))
    }
    val probes = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .withColumn("lists",
        slice(reverse(array_sort(array(qsims: _*))), 1, nprobe))

    val out = probes
      .select(col("query_id"), col("q_emb"),
        explode(transform(col("lists"), x => x.getField("cid"))).as("list_id"))
      .join(index, "list_id")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(Dedup.cosine(col("q_emb"), col("n_emb")), 5))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    val res = out.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id", "sim")
    res
  }

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
