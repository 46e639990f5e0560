package graft.canon

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.Cut

/** Distributed transitive closure with shortest hop-distance — the
  * taxonomy/ontology primitive (rdfs:subClassOf*, skos:broader*) a KG
  * needs after construction: every (node, ancestor) pair reachable
  * through the edge relation, labelled with the minimum number of
  * hops. The reference's data model stops at direct triples; closure
  * is what makes `?x rdf:type/rdfs:subClassOf* ?c` queries cheap, by
  * materializing the `*` once.
  *
  * Algorithm: level-synchronous semi-naive BFS. The frontier at
  * round i holds exactly the pairs first reached in i hops, so the
  * anti-join against the accumulated result both deduplicates AND
  * yields min-dist for free (a pair reachable by several paths is
  * kept at its first — shortest — level). Cycles terminate naturally:
  * the pair space is finite and every round must add a new pair or
  * stop.
  *
  * Scale shape: each round is one equi-join of the frontier against
  * the edge table plus one anti-join against the result — all hash
  * shuffles keyed on node ids; rounds = graph DEPTH (taxonomies:
  * tens), not size. The frontier and result are lineage-cut every
  * round ([[graft.util.Cut]]) so round k's plan never re-runs rounds
  * 1..k-1 — the classic iterative-Spark trap. The edge table is
  * cut once and re-read each round. The per-round `isEmpty` is a
  * driver-side convergence probe on an already-materialized cut
  * frame (a cheap limit-1 scan, not a recompute).
  *
  * @param edges    DataFrame with `child`, `parent` columns
  * @param maxIters hard bound on rounds (defence against unexpectedly
  *                 deep or adversarial graphs); hitting it throws
  *                 rather than silently truncating the closure
  * @return `child, ancestor, dist` (dist = min hops, >= 1)
  */
object Closure {

  def ancestors(edges: DataFrame, maxIters: Int = 30): DataFrame = {
    val e = Cut.cut(edges.select(col("child"), col("parent")))
    var paths = Cut.cut(
      e.select(col("child"), col("parent").as("ancestor"), lit(1L).as("dist")))
    var frontier = paths
    var round = 1
    var done = false
    while (!done) {
      val stepped = frontier.alias("f")
        .join(e.alias("e"), col("f.ancestor") === col("e.child"))
        .select(col("f.child"), col("e.parent").as("ancestor"),
          (col("f.dist") + 1).as("dist"))
        .distinct()
      val fresh = Cut.cut(
        stepped.join(paths, Seq("child", "ancestor"), "left_anti"))
      if (fresh.isEmpty) {
        done = true
      } else {
        round += 1
        if (round > maxIters) throw new IllegalStateException(
          s"transitive closure did not converge within $maxIters rounds — " +
            "graph deeper than expected; raise maxIters deliberately")
        paths = Cut.cut(paths.unionByName(fresh))
        frontier = fresh
      }
    }
    paths
  }
}
