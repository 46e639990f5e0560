package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — the downsampling step of a
  * training-data pipeline (rebalance a web corpus by language, quality
  * tier, source domain…).
  *
  * Membership is CONTENT-KEYED, never positional or RNG-stateful: a
  * row is kept iff `mix31(id) < floor(fraction(stratum) · 2^31)` —
  * [[Portable.mix31]] is the engine's SQL-portable mixer, so
  *  - the sample is identical under any partitioning/parallelism
  *    (re-runs, AQE re-plans and cluster resizes cannot change it),
  *  - subsampling is MONOTONE in the fraction: the 10% sample is a
  *    subset of the 20% sample (same threshold comparison), the
  *    property that makes ablation ladders comparable,
  *  - the DuckDB oracle re-derives the exact member set (hash-exact
  *    correctness, not statistical assertions).
  *
  * Pure Column tree (no UDF): one narrow codegen stage, predicate
  * evaluated at scan speed; at 100 TB this is a filter pushed against
  * the scan, nothing more.
  */
object Sampling {

  /** [[Portable.mix31]] as Column arithmetic — every intermediate stays
    * under 2^62, ANSI-safe. The first reduction uses `pmod`, not `%`:
    * Spark's `%` keeps the dividend's sign, so a negative id would
    * carry a negative value through the pipeline and pass EVERY
    * threshold — even fraction 0.0 (code-review round 4). Since
    * round 5 all three formulations are TOTAL and agree on any 64-bit
    * id: [[Portable.mix31]] floor-mods its first reduction and
    * [[Portable.mix31Sql]] spells pmod as `(x % m + m) % m`
    * (ADVICE round 4; pinned by the OpsSpec pmod-alignment test over
    * Long.MinValue..Long.MaxValue).
    */
  def mix31Col(k: Column): Column = {
    def lcg(x: Column) = (lit(1103515245L) * x + lit(12345L)) % lit(Portable.M31)
    val x1 = lcg(pmod(k, lit(Portable.M31)))
    val x2 = lcg(x1.bitwiseXOR(shiftright(x1, 13)))
    lcg(x2.bitwiseXOR(shiftright(x2, 7)))
  }

  /** Integer keep-threshold for a fraction — computed ONCE driver-side
    * so the engine literal and the SQL oracle literal are the same
    * number by construction.
    */
  def threshold(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of [0,1]: $fraction")
    math.floor(fraction * Portable.M31).toLong
  }

  /** Stratified Bernoulli sample: keep each row with its stratum's
    * fraction (`default` for unlisted strata; 0 drops them).
    */
  def sampleStratified(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      default: Double = 0.0): DataFrame = {
    val th = fractions.toSeq.sortBy(_._1).foldLeft(lit(threshold(default))) {
      case (acc, (s, f)) => when(col(strataCol) === s, lit(threshold(f))).otherwise(acc)
    }
    df.filter(mix31Col(col(idCol).cast("long")) < th)
  }

  /** Un-stratified fixed-rate sample. */
  def sample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(mix31Col(col(idCol).cast("long")) < lit(threshold(fraction)))

  /** Per-host (domain) cap — the corpus-rebalancing step that stops a
    * handful of giant hosts from dominating a web corpus: keep at most
    * `k` documents per host, chosen DETERMINISTICALLY as the k
    * smallest by `(mix31(id), id)` — content-keyed like the sampler,
    * so membership is invariant under partitioning/re-runs, and two
    * runs with k and k' > k produce NESTED selections (the order is a
    * fixed total order; a larger cap only extends each host's prefix).
    *
    * Two-phase at scale: a partition-local top-k prune (bounded heap
    * per host inside mapPartitions — tight JVM loop) cuts the shuffle
    * input to ≤ k rows per (partition, host), THEN the exact global
    * rank runs as one window over the survivors. Correct because the
    * global k smallest of a host are contained in the union of its
    * per-partition k smallest; the window never sees more than k·P
    * rows per host, so the classic "one giant host = one giant window
    * task" failure mode is structurally bounded (the plain-window twin
    * it is spec-checked against funnels the whole host through one
    * task).
    *
    * Returns (idCol, hostCol, rk) with rk ∈ [1, k] the host-local rank.
    */
  def capPerHost(docs: DataFrame, k: Int, idCol: String = "doc_id",
      hostCol: String = "source"): DataFrame = {
    require(k >= 1, s"cap must be >= 1: $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val pruned = docs
      .select(col(idCol).cast("long"), col(hostCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val heaps = scala.collection.mutable.HashMap
          .empty[String, scala.collection.mutable.PriorityQueue[(Long, Long)]]
        it.foreach { case (id, host) =>
          val key = (Portable.mix31(id), id)
          val h = heaps.getOrElseUpdate(host,
            scala.collection.mutable.PriorityQueue.empty[(Long, Long)])
          if (h.size < k) h.enqueue(key)
          else if (Ordering[(Long, Long)].lt(key, h.head)) {
            h.dequeue(); h.enqueue(key)
          }
        }
        heaps.iterator.flatMap { case (host, h) =>
          h.iterator.map { case (_, id) => (id, host) }
        }
      }
      .toDF(idCol, hostCol)
    val w = Window.partitionBy(col(hostCol))
      .orderBy(mix31Col(col(idCol)), col(idCol))
    pruned
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col(idCol), col(hostCol), col("rk"))
  }
}
