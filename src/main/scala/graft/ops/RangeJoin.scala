package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DateType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

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
  * Column types: integral columns bin by `div` (truncating integer
  * division); TIMESTAMP/TIMESTAMP_NTZ columns bin on epoch
  * microseconds (binWidth in µs) and DATE columns on epoch days
  * (binWidth in days) — point and bound columns must share one of
  * those families, since the containment filter compares them raw.
  * Any binning that is monotone non-decreasing and shared by both
  * sides is correct: s ≤ pt ≤ e implies bin(s) ≤ bin(pt) ≤ bin(e), so
  * the point's bin is always among the interval's bins; the exact
  * filter removes bin-admitted non-matches.
  *
  * @return one row per matching (point, interval) pair: all point
  *         columns + the interval's start/end columns.
  */
object RangeJoin {

  /** Backtick-quoted column reference — a raw name interpolated into
    * `expr(...)` breaks (or silently resolves as SQL) when the name
    * needs quoting (spaces, dots, hyphens); ADVICE round 3.
    */
  private def q(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Bin index of a point/bound column: truncating integer division of
    * the column's natural epoch-integer form.
    */
  private def bin(df: DataFrame, name: String, binWidth: Long): Column = {
    val base = df.schema(name).dataType match {
      case TimestampType    => s"unix_micros(${q(name)})"
      case TimestampNTZType =>
        // NTZ → instant through the session zone (the engine pins UTC);
        // any fixed zone keeps the map monotone, and the exact filter
        // compares the raw columns anyway
        s"unix_micros(cast(${q(name)} as timestamp))"
      case DateType         => s"unix_date(${q(name)})"
      case ByteType | ShortType | IntegerType | LongType => q(name)
      // mirror AsOf.tsLong (ADVICE round 4): reject unbinnable types at
      // PLAN time — a raw string/double interpolated into `div` either
      // throws an ANSI cast error mid-job or (ANSI off) null-bins every
      // row into a silently empty join
      case other => throw new IllegalArgumentException(
        s"range-join column '$name' has unbinnable type $other " +
          "(supported: timestamp, timestamp_ntz, date, integral)")
    }
    expr(s"$base div $binWidth")
  }

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
        explode(sequence(bin(intervals, startCol, binWidth), bin(intervals, endCol, binWidth))))
    val pts = points.withColumn("__bin", bin(points, ptCol, binWidth))
    pts.join(ivals, keyCols :+ "__bin")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol)) // inclusive
      .drop("__bin")
  }
}
