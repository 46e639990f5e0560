package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Page

/** Thin table facade over the page/triple stores (SURVEY.md §7.0:
  * "Iceberg is represented by a TripleStore/PageStore facade over
  * partitioned Parquet — identical read/write surface; swap to
  * format("iceberg") is a one-liner when the runtime has the jar").
  *
  * The layout rules are the scale-relevant part and survive the swap:
  *  - pages partition by `bucket = pmod(xxhash64(url), nBuckets)` —
  *    content-derived, never positional, so writes are deterministic
  *    under any parallelism and resume keys are stable;
  *  - the BINARY `html` column lives in its own parquet column so any
  *    reader that doesn't select it never deserializes it (input_hint:
  *    html dominates page size — PlanAuditSpec pins this);
  *  - readers get plain DataFrames/Datasets; all pruning/pushdown is
  *    Catalyst's.
  */
object PageStore {

  /** Swap point: "parquet" locally; "iceberg" when the catalog+jar
    * exist. Nothing else in the engine changes.
    */
  val format: String = sys.env.getOrElse("SPARK_GRAFT_TABLE_FORMAT", "parquet")

  def bucketCol(n: Int) = pmod(xxhash64(col("url")), lit(n)).cast("int").as("bucket")

  def write(pages: Dataset[Page], path: String, nBuckets: Int = 64,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    pages.toDF()
      .withColumn("bucket", bucketCol(nBuckets))
      .write.mode(mode).partitionBy("bucket").format(format).save(path)

  def read(spark: SparkSession, path: String): Dataset[Page] = {
    import spark.implicits._
    spark.read.format(format).load(path)
      .select("url", "warc_ts", "html", "text", "lang").as[Page]
  }

  /** Bucket-pruned read (resume path): pushes a partition filter so
    * finished buckets are never scanned.
    */
  def readBuckets(spark: SparkSession, path: String, buckets: Seq[Int]): Dataset[Page] = {
    import spark.implicits._
    spark.read.format(format).load(path)
      .filter(col("bucket").isin(buckets: _*))
      .select("url", "warc_ts", "html", "text", "lang").as[Page]
  }
}
