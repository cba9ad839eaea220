package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2 L12): media payloads as
  * opaque binary columns + typed metadata, processed per-partition in
  * batches — the Scala analog of a Pandas-UDF/mapInPandas pipeline.
  *
  * The codec itself is STUBBED (this container has no image/audio
  * libs): `StubCodec.decode` derives deterministic metadata from the
  * bytes. Everything around it — schema, encoders, per-partition
  * batch iteration, partitioning behavior — is the real 100 TB path:
  * swap `StubCodec` for a JNI/FFmpeg binding and nothing else changes.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long,
                       n_frames: Long, est_raw_bytes: Long)

  /** Deterministic fake decoder: metadata derived from payload length
    * and first bytes. A real decoder reads container headers the same
    * way — O(header), not O(payload). */
  object StubCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      val seed = if (n == 0) 0 else (payload(0) & 0xFF) + n
      val width = 16 + (seed % 625)
      val height = 16 + ((seed * 7) % 465)
      val frames = 1 + (n % 24)
      (width, height, frames)
    }
  }

  /** Decode a binary media column into typed metadata, one partition
    * at a time (batch-friendly: a real codec would reuse a native
    * context across the iterator). */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    media.mapPartitions { rows =>
      // per-partition: a real impl would open one native codec context
      // here and close it after the iterator drains
      rows.map { r =>
        val (w, h, f) = StubCodec.decode(r.payload)
        MediaMeta(r.doc_id, r.payload.length.toLong, w.toLong, h.toLong,
          f.toLong, w.toLong * h.toLong * 3L * f.toLong)
      }
    }(Encoders.product[MediaMeta])
  }

  /** Frame-sampling stub: pick every `stride`-th frame index — the
    * plumbing for "explode a video into frame rows" (row count
    * multiplies; partitioning by doc_id keeps frames co-located). */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int): DataFrame =
    meta.toDF().select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}
