package graft.canon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DataFrame-native connected components over same-as candidate edges,
  * for entity canonicalization (canonical URI = min URI per component —
  * SURVEY.md §2.2 "canonical-URI election").
  *
  * Algorithm: min-label propagation fused with pointer jumping (path
  * doubling), the DataFrame formulation of the alternating large/small
  * star idea (Kiveris et al. 2014): each round every node takes the min
  * of its own label and its neighbors' labels, then labels are
  * shortcut through one level of indirection. Converges in O(log d)
  * rounds; labels are STRINGS (URIs) ordered lexicographically so the
  * elected canonical is deterministic under any partitioning.
  *
  * Each round is two shuffles (one agg, one self-join); intermediate
  * results are checkpointed to cut lineage — RELIABLE `checkpoint`
  * when the session has a checkpoint dir (the cluster config),
  * `localCheckpoint` otherwise (see [[cut]]). The convergence test
  * compares round hashes via an aggregate, not a driver collect of
  * the labels.
  *
  * GraphFrames is unavailable in this environment and GraphX would
  * drop to RDDs (forbidden by input_hint unless forced) — DataFrame CC
  * is both compliant and shuffle-equivalent (SURVEY.md §4.2).
  */
object ConnectedComponents {

  /** Edge-count threshold below which CC runs as driver-side
    * union-find — the graph analogue of a broadcast join: when the
    * DISTINCT same-as edge set (not the page corpus!) fits on the
    * driver, the iterative shuffle loop's per-round scheduling cost
    * dwarfs the actual work. Real web same-as graphs are sparse
    * relative to the corpus; above the threshold the distributed loop
    * takes over.
    */
  val localEdgeThreshold: Long = 2000000L

  /** Exact min-label union-find (union-to-min keeps every root the
    * lexicographically smallest member, so results are identical to
    * the distributed loop).
    */
  def localCC(pairs: Iterator[(String, String)]): Iterator[(String, String)] = {
    val parent = scala.collection.mutable.HashMap.empty[String, String]
    def find(x: String): String = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for ((a, b) <- pairs) {
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
      parent.getOrElseUpdate(ra, ra); parent.getOrElseUpdate(rb, rb)
    }
    val nodes = parent.keys.toArray
    nodes.iterator.map(n => n -> find(n))
  }

  /** Lineage cut for the iterative loop — delegates to
    * [[graft.util.Cut.cut]]: reliable `checkpoint` under the cluster
    * config (checkpoint dir + cleanCheckpoints, persisted around the
    * checkpoint write), executor-local `localCheckpoint` otherwise.
    */
  private def cut(df: DataFrame): DataFrame = graft.util.Cut.cut(df)

  /** @param edges DataFrame with string columns (src, dst)
    * @return DataFrame (node, component) — component = min URI in the
    *         node's connected component
    */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 25,
      localThreshold: Long = localEdgeThreshold): DataFrame =
    runCounted(spark, edges, maxIter, localThreshold)._1

  /** [[run]] plus the distributed round count actually executed (0 for
    * the driver union-find path) — the observable the skew-stress spec
    * pins to the O(log diameter) bound.
    */
  def runCounted(spark: SparkSession, edges: DataFrame, maxIter: Int = 25,
      localThreshold: Long = localEdgeThreshold): (DataFrame, Int) = {
    import spark.implicits._
    // checkpoint the distinct edge set ONCE: everything downstream
    // re-reads it, and without truncation each action would re-execute
    // the full upstream lineage (pages scan -> mention detection ->
    // linking) — measured as the dominant serial cost
    val e0 = cut(edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct())

    if (e0.count() <= localThreshold) {
      val pairs = e0.as[(String, String)].collect()
      return (localCC(pairs.iterator).toSeq.toDF("node", "comp"), 0)
    }

    val sym = cut(e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct())

    val nodes = sym.select(col("src").as("node")).distinct()

    // labels only ever decrease, so any change flips the hash-sum; one
    // aggregate per round (previous round's hash is remembered, not
    // recomputed), no label collect (decimal sum: exact, no ANSI
    // long-overflow at any row count that fits 38 digits)
    def hsum(df: DataFrame) = df
      .agg(sum(xxhash64(col("node"), col("comp")).cast("decimal(20,0)")))
      .first().getDecimal(0)

    var comp = cut(nodes.withColumn("comp", col("node")))
    var prevHash = hsum(comp)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // neighbor-min: comp'(u) = min(comp(u), min_{v in N(u)} comp(v))
      val nbrMin = sym
        .join(comp.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"))
        .agg(min(col("comp")).as("nbr_comp"))
      val propagated = comp.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
      // double pointer jump: comp -> comp² -> comp⁴ per round (two
      // joins; ~path-quartering, so round count ~log₄(diameter)). The
      // second jump reuses the first's exchange within one action.
      def jump(m: DataFrame): DataFrame = m.as("a")
        .join(m.select(col("node").as("jn"), col("comp").as("jc")).as("b"),
          col("a.comp") === col("b.jn"), "left")
        .select(col("a.node").as("node"), coalesce(col("jc"), col("a.comp")).as("comp"))
      val jumped = cut(jump(jump(propagated)))

      val h = hsum(jumped)
      done = h == prevHash
      prevHash = h
      comp = jumped
      iter += 1
    }
    (comp, iter)
  }

  /** Canonical mapping only for nodes whose canonical differs. */
  def canonicalMap(cc: DataFrame): DataFrame =
    cc.filter(col("node") =!= col("comp"))
      .select(col("node").as("uri"), col("comp").as("canonical"))
}
