package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join — the second operator class the task
  * brief names that Spark's built-ins don't cover well: a raw
  * `l.ts BETWEEN r.start AND r.end` predicate has no equi-key, so
  * Catalyst plans BroadcastNestedLoopJoin (or a cartesian product) —
  * |left|×|right| comparisons per key, the first plan to die at scale.
  *
  * This implementation buckets by FIXED-WIDTH BINS: each interval is
  * exploded into every bin it overlaps, each point lands in exactly
  * one bin, and the join becomes an EQUI join on (key…, bin) followed
  * by the exact containment filter. Because the point appears in one
  * bin only, every true (point, interval) pair matches exactly once —
  * no post-join dedup. With binWidth chosen ≥ the typical interval
  * length, the explode factor is ≤ 2 per interval; shuffle keys are
  * (key…, bin) integers, AQE-splittable on skew.
  *
  * `binWidth` is the scale knob: pick it near the p99 interval length
  * (a pathological interval spanning k·binWidth explodes into k bin
  * rows — bounded blowup, visible in the plan, never quadratic).
  *
  * @return one row per matching (point, interval) pair: all point
  *         columns + the interval's start/end columns.
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      ptCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val ivals = intervals
      .filter(col(endCol) >= col(startCol)) // degenerate intervals match nothing
      .withColumn("__bin",
        explode(sequence(expr(s"$startCol div $binWidth"), expr(s"$endCol div $binWidth"))))
    val pts = points.withColumn("__bin", expr(s"$ptCol div $binWidth"))
    pts.join(ivals, keyCols :+ "__bin")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol)) // inclusive
      .drop("__bin")
  }
}
