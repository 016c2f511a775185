package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * per partition in bounded batches.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * container): [[decodeImageStub]] derives deterministic fake dimensions
  * from the payload bytes. The Spark-side plumbing — schema, partition
  * batching, column pruning (metadata queries never touch the payload
  * bytes) — is real and tested. At 100 TB the payload column lives in its
  * own parquet column chunk, so metadata-only queries scan only the small
  * columns.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, byte_len: Int, magic: Int,
      width: Int, height: Int)

  /** Attach a binary payload column (here synthesized from text; in a real
    * pipeline this is the raw media bytes) plus cheap metadata columns.
    */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), encode(col(textCol), "UTF-8").as("payload"))
      .withColumn("byte_len", length(col("payload")))
      .withColumn("magic", expr("CAST(conv(hex(substring(payload, 1, 1)), 16, 10) AS INT)"))

  /** STUB media decoder: a real implementation would parse image headers /
    * decode frames here. Deterministic fake so the distributed plumbing is
    * testable: width/height derived from the payload's first bytes.
    */
  def decodeImageStub(payload: Array[Byte]): (Int, Int) = {
    val w = 64 + (if (payload.length > 0) payload(0) & 0x7F else 0)
    val h = 64 + (if (payload.length > 1) payload(1) & 0x7F else 0)
    (w, h)
  }

  /** Batched per-partition decode — the Scala analog of mapInPandas: one
    * decoder context per partition, streaming through rows without
    * materializing the partition.
    */
  def decodeFeatures(spark: SparkSession, payloads: DataFrame,
      idCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder setup would go here (codec contexts etc.)
        it.map { case (id, bytes) =>
          val (w, h) = decodeImageStub(bytes)
          MediaMeta(id, bytes.length, if (bytes.nonEmpty) bytes(0) & 0xFF else -1, w, h)
        }
      }
  }

  case class Resized(doc_id: Long, payload: Array[Byte], width: Int,
      height: Int, orig_len: Int)

  /** Resize plumbing: payload → bounded-size payload + target dimension
    * metadata. The pixel resample is the stub (deterministic stride
    * sampling of the byte stream down to targetW×targetH bytes — a real
    * image library plugs into the same mapPartitions); the distributed
    * shape is real: per-partition streaming transform, output size bounded
    * by the target regardless of input size (the property that matters at
    * 100 TB — resized corpora shrink to target × row-count).
    */
  def resizeStub(spark: SparkSession, payloads: DataFrame, idCol: String,
      targetW: Int, targetH: Int): Dataset[Resized] = {
    import spark.implicits._
    val target = targetW * targetH
    payloads.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val out =
            if (bytes.length <= target) bytes
            else {
              // stride sampling: element k of the output takes byte
              // floor(k * len / target) — deterministic downsample
              val o = new Array[Byte](target)
              var k = 0
              while (k < target) {
                o(k) = bytes((k.toLong * bytes.length / target).toInt)
                k += 1
              }
              o
            }
          Resized(id, out, targetW, targetH, bytes.length)
        }
      }
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte],
      offset: Int)

  /** Frame sampling plumbing for video-shaped payloads: each payload yields
    * `n` evenly spaced frames. The frame EXTRACTION is the stub (byte
    * slices standing in for decoded frames — a real codec plugs into the
    * same mapPartitions); the distributed shape is real: one pass, output
    * fan-out n× without shuffles, frame bytes stay off the driver.
    */
  def sampleFrames(spark: SparkSession, payloads: DataFrame, idCol: String,
      n: Int): Dataset[Frame] = {
    import spark.implicits._
    payloads.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val len = bytes.length
          (0 until n).iterator.map { k =>
            // frame k = bytes [k*len/n, (k+1)*len/n) — deterministic slice
            val from = (k.toLong * len / n).toInt
            val until = ((k + 1).toLong * len / n).toInt
            Frame(id, k, java.util.Arrays.copyOfRange(bytes, from, until), from)
          }
        }
      }
  }
}
