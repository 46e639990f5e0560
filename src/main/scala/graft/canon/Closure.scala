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
  * the edge table, then the anti-join against the accumulated result,
  * then the per-level dedup — in that order, because the anti-join's
  * (child, ancestor) clustering already covers the distinct (dist is
  * level-constant), so the dedup adds no exchange. Rounds = graph
  * DEPTH (taxonomies: tens), not size. Each round's fresh frontier is
  * lineage-cut ([[graft.util.Cut]]) so round k's plan never re-runs
  * rounds 1..k-1 — the classic iterative-Spark trap; the result is
  * the union of the materialized rounds, never re-materialized as a
  * whole. The per-round `isEmpty` is a driver-side convergence probe
  * on an already-materialized cut frame (a cheap limit-1 scan, not a
  * recompute). AQE re-plans every round over the cut RDDs' true
  * sizes (runtime broadcast of a small frontier, partition
  * coalescing); a MEASURED dead end: pre-partitioning + persisting
  * the edge table to save its per-round exchange pins the cached
  * partition count, blocks those AQE decisions, and ran ~2.5x SLOWER
  * at bench scale — the same class of result as the round-4 carried-
  * union finding (BENCH.md).
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
    var frontier = Cut.cut(
      e.select(col("child"), col("parent").as("ancestor"), lit(1L).as("dist"))
        .distinct()) // multi-edges collapse to one dist-1 pair
    val rounds = scala.collection.mutable.ArrayBuffer(frontier)
    def paths = rounds.reduce(_ unionByName _)
    var round = 1
    var done = false
    while (!done) {
      val stepped = frontier.alias("f")
        .join(e.alias("e"), col("f.ancestor") === col("e.child"))
        .select(col("f.child"), col("e.parent").as("ancestor"),
          (col("f.dist") + 1).as("dist"))
      // anti-join first, then dedup: the join's (child, ancestor)
      // clustering already covers the distinct (dist is
      // level-constant), so the dedup adds no exchange
      val fresh = Cut.cut(
        stepped.join(paths, Seq("child", "ancestor"), "left_anti").distinct())
      if (fresh.isEmpty) {
        done = true
      } else {
        round += 1
        if (round > maxIters) throw new IllegalStateException(
          s"transitive closure did not converge within $maxIters rounds — " +
            "graph deeper than expected; raise maxIters deliberately")
        rounds += fresh
        frontier = fresh
      }
    }
    paths // union of the materialized per-round RDDs
  }

  /** Seeded variant: the nodes that REACH `target` through 1+ hops,
    * with min hop-distance — `child, dist`. Same level-synchronous
    * BFS as [[ancestors]], but grown backwards from one constant, so
    * it materializes only the pairs a `(?x, p+, <target>)` query
    * keeps instead of the full |V|·depth closure and then a filter.
    * For forward reachability (nodes reachable FROM a constant), pass
    * the edge table with `child`/`parent` swapped.
    */
  def reaching(edges: DataFrame, target: String, maxIters: Int = 30): DataFrame = {
    val e = Cut.cut(edges.select(col("child"), col("parent")))
    var frontier = Cut.cut(
      e.filter(col("parent") === lit(target))
        .select(col("child"), lit(1L).as("dist")).distinct())
    val rounds = scala.collection.mutable.ArrayBuffer(frontier)
    def seen = rounds.reduce(_ unionByName _)
    var round = 1
    var done = false
    while (!done) {
      val stepped = frontier.withColumnRenamed("child", "mid").alias("f")
        .join(e.alias("e"), col("e.parent") === col("f.mid"))
        .select(col("e.child"), (col("f.dist") + 1).as("dist"))
      val fresh = Cut.cut(
        stepped.join(seen, Seq("child"), "left_anti").distinct())
      if (fresh.isEmpty) {
        done = true
      } else {
        round += 1
        if (round > maxIters) throw new IllegalStateException(
          s"seeded closure did not converge within $maxIters rounds — " +
            "graph deeper than expected; raise maxIters deliberately")
        rounds += fresh
        frontier = fresh
      }
    }
    seen
  }
}
