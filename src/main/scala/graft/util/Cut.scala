package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Result-owning cache lifecycle for operator intermediates (VERDICT
  * round 2, item 8 / ADVICE round 2).
  *
  * Operators that feed one frame into both sides of a self-join (or an
  * iterative loop) used to `persist()` it and push the unpersist
  * obligation to callers via scaladoc — so a long-lived library
  * session running many operators accumulated unbounded cache unless
  * it remembered `spark.catalog.clearCache()`. [[cut]] replaces that
  * contract with an EAGER lineage cut whose storage is owned by the
  * result: the blocks belong to the cut frame's RDD, which the
  * returned query plan references, so they live exactly as long as the
  * operator's result is reachable and are dropped by the
  * ContextCleaner once it is not (`spark.cleaner.referenceTracking`,
  * on by default). No caller-side cache management exists at all.
  *
  * Two mechanisms (ADVICE round 3):
  *
  *  - RELIABLE `checkpoint` when the session has a checkpoint dir
  *    configured (`Submit --checkpoint-dir` — the cluster setting,
  *    where executor loss must not recompute the cut's upstream) AND
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true` (Submit
  *    sets it). Without that conf the ContextCleaner never deletes
  *    checkpoint FILES, so every operator cut would leak DFS data for
  *    the app's lifetime — exactly the unbounded accumulation this
  *    class exists to prevent — and the fallback below is safer.
  *    The frame is persisted BEFORE checkpointing and unpersisted
  *    after: `checkpoint(eager)` writes the checkpoint by re-running
  *    the RDD as a second job, which without the persist would compute
  *    the whole upstream plan twice (e.g. a dedup shingling pass).
  *  - executor-local `localCheckpoint` otherwise: blocks live in
  *    executor storage at MEMORY_AND_DISK — hot in memory, spills
  *    under pressure, never OOMs — and are reference-tracked like any
  *    cached RDD. Fine single-node; lost with an executor (acceptable
  *    outside the explicit cluster config).
  */
object Cut {

  private[graft] def cleanCheckpointsEnabled(df: DataFrame): Boolean =
    df.sparkSession.sparkContext.getConf
      .getBoolean("spark.cleaner.referenceTracking.cleanCheckpoints", false)

  @volatile private var warnedDowngrade = false

  def cut(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isDefined) {
      if (cleanCheckpointsEnabled(df)) {
        df.persist(StorageLevel.MEMORY_AND_DISK)
        try df.checkpoint(eager = true) // second pass reads the cache, not the upstream plan
        finally df.unpersist(blocking = false)
      } else {
        // the downgrade must not be silent: an embedder who set a
        // checkpoint dir for executor-loss resilience needs to know the
        // cleaner conf (context-creation-time only) is what gates it
        if (!warnedDowngrade) {
          warnedDowngrade = true
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            "checkpoint dir is set but spark.cleaner.referenceTracking.cleanCheckpoints " +
              "is false — lineage cuts fall back to localCheckpoint (no executor-loss " +
              "recovery) to avoid leaking checkpoint files; set the conf at context " +
              "creation (graft.Submit does) to enable reliable cuts")
        }
        df.localCheckpoint(eager = true)
      }
    } else df.localCheckpoint(eager = true)
  }
}
