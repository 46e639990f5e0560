package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque BINARY columns with typed metadata structs; decode /
  * feature-extract runs as a typed `mapPartitions` over batches so a
  * real decoder (libjpeg / ffmpeg / soundfile) can amortize per-batch
  * init. The decoders themselves are STUBBED deterministically — the
  * image/audio libraries are not in this container — but the Spark
  * plumbing (schema, batching, partitioning, null handling) is real
  * and tested.
  *
  * At 100 TB the binary column dominates page size; the layout rule is
  * the same as for `html` (SURVEY.md §4.2): keep the payload in its own
  * parquet column so queries that only touch metadata never deserialize
  * it (column pruning), and size `spark.sql.files.maxPartitionBytes`
  * to the payload, not the metadata.
  */
object Multimodal {

  /** Typed metadata produced by the (stubbed) decoder. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      ok: Boolean)

  /** STUB decoder: a real implementation would parse the container
    * header (JPEG SOF / WAV fmt / MP4 moov). Deterministic fake derived
    * from payload length so tests and oracles are exact.
    */
  def decodeHeaderStub(bytes: Array[Byte]): (Long, Long, Long) = {
    val n = if (bytes == null) 0L else bytes.length.toLong
    (16L + n % 64L, 16L + (n / 64L) % 64L, 1L + n % 8L)
  }

  /** Decode a (doc_id, media BINARY) frame into metadata rows.
    * mapPartitions (not a per-row UDF) so a real decoder initializes
    * once per partition; narrow — no shuffle.
    */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real decoder init would go here (once per partition)
        it.map { case (id, bytes) =>
          val n = if (bytes == null) 0L else bytes.length.toLong
          val (w, h, f) = decodeHeaderStub(bytes)
          MediaMeta(id, n, w, h, f, n > 0)
        }
      }
  }
}
