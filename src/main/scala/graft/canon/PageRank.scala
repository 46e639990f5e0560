package graft.canon

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.Cut

/** Integer fixed-point PageRank over an edge table — entity/host
  * importance for the KG-materialize side (which canonical URIs matter,
  * which hosts dominate a crawl), kept ORACLE-EXACT by doing every step
  * in scaled integer arithmetic:
  *
  *  - ranks are longs scaled by `scale` (default 10^12 per node),
  *  - per-edge contribution = `pr div outdeg` (truncating integral
  *    division — all values non-negative, so it equals floor and
  *    DuckDB's `//`),
  *  - damping 0.85 as the exact rational 17/20:
  *    `pr' = (3·scale) div 20 + (17·Σ contributions) div 20`.
  *
  * Long sums are associative/commutative, so the result is
  * bit-identical under ANY partitioning or aggregation order — unlike
  * floating-point PageRank, where the reduce order perturbs low bits
  * and no exact oracle can exist. Dangling nodes (no out-edges) leak
  * their mass — the documented semantics (no redistribution), shared
  * by engine and oracle.
  *
  * Scale shape: edges carry their out-degree from one precomputed
  * pass (`Cut`, reused every iteration — no per-iteration degree
  * join); each iteration is one join shuffle (ranks to the edge
  * partitioning) + one map-side-combined aggregation on dst + one left
  * join back to the node set. That is the canonical distributed
  * PageRank exchange pattern; hot dst nodes (hubs) are handled by
  * partial aggregation, not a window. Overflow bound: `17·Σ in-mass`
  * must stay under 2^63 — Σ in-mass ≤ |V|·scale, so pick
  * `scale ≤ 2^63 / (17·|V|)` (10^12 covers |V| up to ~5·10^5; pass
  * e.g. 10^6 for billion-node graphs). ANSI mode makes a violation a
  * loud error, never silent wraparound.
  *
  * Reference scope: cattle materializes its quad graph as a whole
  * (src/cattle.py:307-311) with no graph analytics; centrality over
  * the emitted triple graph is part of this engine's
  * KG-construction brief beyond the reference surface.
  */
object PageRank {

  /** @param edges DataFrame with integral columns (src, dst); parallel
    *              edges are legitimate multi-edges (each contributes).
    * @return DataFrame (id, pr) — pr after `iterations` rounds, scaled
    *         by `scale`.
    */
  def run(edges: DataFrame, iterations: Int = 5,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      s"iterations out of range: $iterations")
    require(scale >= 20L, s"scale too small for 17/20 damping: $scale")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    // out-degree folded onto the edges ONCE — consumed every iteration
    val ed = Cut.cut(e.join(
      e.groupBy("src").agg(count(lit(1)).as("deg")), "src"))
    val nodes = Cut.cut(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
        .distinct())
    val base = scale * 3L / 20L
    // iterations chain LAZILY (round 6): `ed` and `nodes` are the only
    // frames read more than once and they are cut above, so the k-round
    // plan re-computes nothing — each round appears once, inline. The
    // round-5 per-iteration Cut materialized every rank table and paid
    // one scheduling round-trip per iteration; dropping it lets ONE
    // action run the whole k-round DAG with AQE planning every stage
    // from runtime sizes. Exact long arithmetic ⇒ bit-identical either
    // way. (A deep-k caller can re-cut outside; k is bounded at 100.)
    var pr = nodes.withColumn("pr", lit(scale))
    for (_ <- 1 to iterations) {
      val inMass = ed.join(pr.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(expr("pr div deg")).as("m"))
      pr = nodes.join(inMass, Seq("id"), "left").select(col("id"),
        (lit(base) + expr("(17 * coalesce(m, 0L)) div 20")).as("pr"))
    }
    pr
  }
}
