package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the "most recent right row at or
  * before each left row's time, per key" operator the task brief names
  * as a classic gap in Spark's built-in surface.
  *
  * Implementation is the UNION-AND-CARRY shape, not an inequality
  * join: tag both sides, union them, and run ONE
  * `last(value, ignoreNulls)` window ordered by (ts, side) with right
  * rows sorting before left rows at equal timestamps (inclusive
  * semantics). Cost at any scale is a single shuffle on the key plus a
  * per-key sort — Spark's external spillable sort, so a hot key never
  * materializes in memory. The naive formulation
  * (`l JOIN r ON l.k = r.k AND r.ts <= l.ts` + windowed max) produces
  * |matches| ∝ left×right per key BEFORE pruning — quadratic on hot
  * keys, the plan that dies first at 100 TB; the spec pins this
  * operator's output equal to that naive oracle at test scale.
  *
  * Determinism contract: the right side must be unique per (key, ts) —
  * pre-aggregate duplicates (the harness query does) — otherwise
  * "the" most recent row at a tied timestamp is not well defined in
  * ANY engine (DuckDB's ASOF JOIN has the same caveat).
  *
  * @param left  rows to enrich
  * @param right (key, ts, value) rows providing the carried value;
  *              unique per (key, ts)
  * @return left rows + `asofCol` = value of the most recent right row
  *         with ts_r <= ts_l for the same key (NULL when none)
  */
object AsOf {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      asofCol: String = "asof_val"): DataFrame = {
    val valType = right.schema(valCol).dataType
    val leftCols = left.columns
    val r = right.select(
      (col(keyCol) +: col(tsCol) +: col(valCol).as("__rval") +: lit(0).as("__side") +:
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)).toSeq): _*)
    val l = left
      .withColumn("__rval", lit(null).cast(valType))
      .withColumn("__side", lit(1))
    val u = l.unionByName(r)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn(asofCol, last(col("__rval"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) :+ col(asofCol): _*)
  }
}
