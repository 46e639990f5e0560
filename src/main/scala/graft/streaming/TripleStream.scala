package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.rules.RuleCompiler
import graft.spec.TableSpec

/** Streaming face of the KG mapping. [[RuleCompiler.triples]] compiles
  * a descriptor to ONE narrow stateless stage (explode over compiled
  * column expression arrays), so the identical plan runs over a
  * streaming source with no watermark and no state store — pages
  * arriving from a crawl become triples micro-batch by micro-batch at
  * scan speed. The reference converts only completed uploads
  * (/root/reference/src/cattle.py:206 — whole-file jobs); continuous
  * conversion of an arriving feed is part of this engine's brief.
  *
  * Exactly-once: [[runTriplePipe]] is the triple-sink analogue of
  * [[EventStream.runFilePipe]] — parquet source → mapping → parquet
  * sink with offsets + sink metadata under `checkpointDir`.
  * `AvailableNow` drains what is present and stops; re-running with
  * the same checkpoint reprocesses NOTHING, landing new input files
  * emits only their triples. That is the streaming twin of the batch
  * pipeline's bucket-level lineage resume, with the same end state:
  * output ≡ one-shot batch conversion of everything that arrived.
  */
object TripleStream {

  /** records (streaming or batch) → quads via the same compiled
    * mapping — callers pass the SAME descriptor both faces use.
    */
  def triples(records: DataFrame, ts: TableSpec): DataFrame =
    RuleCompiler.triples(records, ts, ts.graph)

  def runTriplePipe(spark: SparkSession, inDir: String,
      schema: org.apache.spark.sql.types.StructType, descriptorJson: String,
      outDir: String, checkpointDir: String): StreamingQuery = {
    val ts = TableSpec.fromJson(descriptorJson)
    triples(spark.readStream.schema(schema).parquet(inDir), ts)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
