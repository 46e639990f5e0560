package graft.emit

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Triple-side sinks: N-Quads formatting (the reference's native
  * output — reference: src/cattle.py:301 locates `*.csv.nq`, parsed
  * named-graph-aware at :308-309), content dedup, and the partitioned
  * parquet materialize with per-partition lineage rows (north rule).
  *
  * All string work is built-in `Column` trees (codegen'd); the NQ sink
  * is a distributed text write, never a driver collect (the
  * reference's export path loads the whole graph in one process,
  * src/cattle.py:307-311 — the scalability cliff we avoid).
  */
object TripleEmitter {

  /** N-Triples string escaping (grammar: ECHAR). Literal `replace`
    * chain — backslash FIRST. Codegen'd; no regex, no UDF.
    */
  def nqEscape(c: Column): Column =
    replace(
      replace(
        replace(
          replace(
            replace(c, lit("\\"), lit("\\\\")),
            lit("\""), lit("\\\"")),
          lit("\n"), lit("\\n")),
        lit("\r"), lit("\\r")),
      lit("\t"), lit("\\t"))

  /** One N-Quads line from the flat triple columns. */
  def nqLine: Column = {
    val obj = when(col("o_kind") === "iri", concat(lit("<"), col("o_lex"), lit(">")))
      .otherwise(
        concat(
          lit("\""), nqEscape(col("o_lex")), lit("\""),
          when(col("o_lang").isNotNull, concat(lit("@"), col("o_lang")))
            .otherwise(
              when(col("o_datatype").isNotNull,
                concat(lit("^^<"), col("o_datatype"), lit(">")))
                .otherwise(lit("")))))
    concat(
      lit("<"), col("s"), lit("> <"), col("p"), lit("> "),
      obj, lit(" <"), col("g"), lit("> ."))
  }

  /** Content-identity dedup over the full quad (SURVEY.md §2.1 D1). */
  def dedup(triples: DataFrame): DataFrame =
    triples.dropDuplicates("s", "p", "o_kind", "o_lex", "o_datatype", "o_lang", "g")

  /** Distributed N-Quads sink (optionally gzip — reference K3,
    * src/cattle.py:313-319).
    */
  def writeNq(triples: DataFrame, path: String, gzip: Boolean = false): Unit = {
    val w = triples.select(nqLine.as("value")).write.mode(SaveMode.Overwrite)
    (if (gzip) w.option("compression", "gzip") else w).text(path)
  }

  /** Deterministic page/triple bucket — identity from content (url),
    * NEVER from physical row position (SURVEY.md §4.3).
    */
  def bucketOf(c: Column, n: Int): Column = pmod(xxhash64(c), lit(n)).cast("int")

  /** Materialize triples partitioned by bucket + commit lineage rows.
    * Lineage is the completion signal AND the resume index (replaces
    * the reference's delete-the-inputs signal, src/cattle_process.py:18-29).
    *
    * Crash-safety contract (orphaned-partition semantics): lineage
    * commits strictly AFTER the triples append, so a run killed
    * in between leaves ORPHANED triple rows with no lineage row. The
    * bucket is then not in [[doneBuckets]], re-runs on resume, and
    * appends a second copy — tolerated by design, because stage B's
    * content-identity dedup collapses exact duplicates: the final
    * triple set converges to the single-shot result (proven by the
    * mid-write crash spec). The inverse order would be the unsafe one:
    * a lineage row without its triples silently loses a bucket.
    */
  def writeStage(
      spark: SparkSession,
      triples: DataFrame,
      outDir: String,
      ruleSetHash: String,
      runId: String): Unit = {
    val t = triples.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t.write.mode(SaveMode.Append).partitionBy("bucket").parquet(s"$outDir/triples")
    val lineage = t.groupBy("bucket").agg(
      count(lit(1)).as("triples"),
      countDistinct(col("s")).as("subjects"))
      .withColumn("rule_set_hash", lit(ruleSetHash))
      .withColumn("run_id", lit(runId))
      .withColumn("status", lit("ok"))
    lineage.coalesce(1).write.mode(SaveMode.Append).parquet(s"$outDir/lineage")
    t.unpersist()
  }

  /** Buckets already materialized for this rule-set (resume skip).
    * Collected EAGERLY to the driver (≤ nBuckets ints): a lazy
    * DataFrame here would re-read lineage after this run's own commits
    * and silently empty the remaining work; a literal `isin` filter is
    * also partition-prunable at the scan, which an anti-join is not.
    */
  def doneBuckets(spark: SparkSession, outDir: String, ruleSetHash: String): Set[Int] = {
    val p = new java.io.File(s"$outDir/lineage")
    if (!p.exists()) Set.empty
    else spark.read.parquet(s"$outDir/lineage")
      .filter(col("status") === "ok" && col("rule_set_hash") === ruleSetHash)
      .select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
  }
}
