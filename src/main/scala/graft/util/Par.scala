package graft.util

import org.apache.spark.sql.DataFrame

/** Minimum-parallelism guard for CPU-bound narrow stages (optimization
  * guide §2.5/§6.1): a parquet scan parallelizes by FILE SPLITS
  * (`spark.sql.files.maxPartitionBytes`), so a small input — one
  * modest file — yields a ONE-TASK scan stage, and every narrow,
  * CPU-heavy pass chained onto it (shingling, signatures, regex
  * gates, media synthesis, date parsing) runs on a single core
  * regardless of cluster size. AQE cannot help: its partition sizing
  * is byte-based, and these stages are expensive per ROW, not per
  * byte.
  *
  * [[spread]] round-robin-repartitions to the cluster's default
  * parallelism ONLY when the plan's current partitioning is below it.
  * On a production corpus the scan already carries >= cluster
  * parallelism and this is a no-op (no exchange is added), so the
  * knob is scale-adaptive — derived from input split count and
  * cluster size — never a constant tuned for local mode. Every
  * operator that applies it is content-keyed (results are
  * partitioning-invariant by construction), so the rebalance cannot
  * change results.
  *
  * Call it on narrow, scan-rooted frames only: probing the partition
  * count materializes the physical RDD, which for a scan/projection
  * plans file splits without running a job, but for a plan containing
  * exchanges would execute them.
  */
object Par {

  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions < p) df.repartition(p) else df
  }
}
