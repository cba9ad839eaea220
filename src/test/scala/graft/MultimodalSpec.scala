package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaFeatures, MediaMeta, MediaRow}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("resize plan caps the longest side, preserves aspect, never upscales") {
    val meta = Seq(
      MediaMeta(1L, 0L, 640L, 320L, 1L, 0L),  // downscale 640->256, 320->128
      MediaMeta(2L, 0L, 100L, 50L, 1L, 0L),   // under the cap: untouched
      MediaMeta(3L, 0L, 200L, 500L, 1L, 0L))  // portrait: height capped
      .toDS()
    val out = Multimodal.resizePlan(meta, maxDim = 256)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == (256L, 128L))
    assert(out(2L) == (100L, 50L))
    assert(out(3L) == (102L, 256L)) // floor(200*256/500) = 102
  }

  test("feature extraction: deterministic byte histogram and mean") {
    val rows = Seq(MediaRow(9L, "abc".getBytes("UTF-8"))).toDS()
    val f: MediaFeatures = Multimodal.extractFeatures(rows).collect().head
    // bytes 97,98,99 -> bins 1,2,3 each 1/3; mean 98
    assert(f.doc_id == 9L)
    assert(f.mean_byte == 98.0)
    assert(f.histogram.toSeq == Seq(0.0, 1.0 / 3, 1.0 / 3, 1.0 / 3, 0.0, 0.0, 0.0, 0.0))
  }
}
