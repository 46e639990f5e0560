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
  * results are `localCheckpoint`ed to cut lineage (on a cluster this
  * becomes a reliable `checkpoint` against the checkpoint dir). The
  * convergence test compares round hashes via an aggregate, not a
  * driver collect of the labels.
  *
  * GraphFrames is unavailable in this environment and GraphX would
  * drop to RDDs (forbidden by input_hint unless forced) — DataFrame CC
  * is both compliant and shuffle-equivalent (SURVEY.md §4.2).
  */
object ConnectedComponents {

  /** @param edges DataFrame with string columns (src, dst)
    * @return DataFrame (node, component) — component = min URI in the
    *         node's connected component
    */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()

    val nodes = sym.select(col("src").as("node")).distinct()

    var comp = nodes.withColumn("comp", col("node")).localCheckpoint(true)
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
      // pointer jump: comp''(u) = comp'(comp'(u))
      val jumped = propagated.as("a")
        .join(propagated.select(col("node").as("jn"), col("comp").as("jc")).as("b"),
          col("a.comp") === col("b.jn"), "left")
        .select(col("a.node").as("node"), coalesce(col("jc"), col("a.comp")).as("comp"))
        .localCheckpoint(true)

      // labels only ever decrease, so any change flips the hash-sum;
      // a single aggregate, no label collect (decimal sum: no ANSI
      // long-overflow, exact at any row count that fits 38 digits)
      def hsum(df: DataFrame) = df
        .agg(sum(xxhash64(col("node"), col("comp")).cast("decimal(20,0)")))
        .first().getDecimal(0)
      done = hsum(jumped) == hsum(comp)
      comp = jumped
      iter += 1
    }
    comp
  }

  /** Canonical mapping only for nodes whose canonical differs. */
  def canonicalMap(cc: DataFrame): DataFrame =
    cc.filter(col("node") =!= col("comp"))
      .select(col("node").as("uri"), col("comp").as("canonical"))
}
