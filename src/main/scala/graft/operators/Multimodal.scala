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

  // ImageIO defaults to DISK-cached image streams: every
  // createImageInputStream/read/write spins up a temp FILE under a
  // registry lock, which serializes (and thrashes the filesystem) the
  // moment decode tasks run in parallel inside one JVM — measured 32
  // concurrent decode tasks burning ~30x the single-task CPU time on
  // lock/IO spin. All payloads here are in-memory byte arrays;
  // memory-cached streams are strictly better at any scale.
  javax.imageio.ImageIO.setUseCache(false)

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long,
                       n_frames: Long, est_raw_bytes: Long)

  /** Deterministic fake decoder: metadata derived from payload length
    * and first bytes. A real decoder reads container headers the same
    * way — O(header), not O(payload). */
  object StubCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      // seed math in Long: Int would overflow (seed * 7) past ~306 MB
      // payloads and emit negative dimensions
      val seed: Long = if (n == 0) 0L else (payload(0) & 0xFF).toLong + n
      val width = 16 + (seed % 625).toInt
      val height = 16 + ((seed * 7) % 465).toInt
      val frames = 1 + (n % 24)
      (width, height, frames)
    }
  }

  /** Real image decoder via the JDK's own ImageIO (PNG/BMP/GIF/JPEG
    * readers ship with every JDK — no new dependency). Header-only
    * cost: `ImageReader.getWidth/getHeight` parse container metadata
    * without decoding pixel data, so this is O(header) per row like a
    * production codec, not O(payload). Returns None when no
    * registered reader recognizes the bytes — callers fall back to
    * [[StubCodec]] for synthetic payloads, which keeps the byte-walk
    * oracles (q_multimodal_*) byte-identical. */
  object ImageIoCodec {
    def decode(payload: Array[Byte]): Option[(Int, Int, Int)] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      if (iis == null) return None
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            // allowSearch=false: -1 means "unknown without a full
            // scan" — treat as single-image (the common still case)
            val n = try r.getNumImages(false) catch { case _: Exception => -1 }
            Some((r.getWidth(0), r.getHeight(0), if (n > 0) n else 1))
          } catch { case _: Exception => None
          } finally r.dispose()
        }
      } finally iis.close()
    }
  }

  /** [[decodeMeta]] with the REAL codec in front: genuine image
    * payloads (PNG/BMP/GIF/JPEG) decode through [[ImageIoCodec]];
    * anything unrecognized falls back to the deterministic stub.
    * Same mapPartitions batch shape — swapping the codec changes
    * nothing about schema, partitioning, or cost model. The oracled
    * queries stay on [[decodeMeta]] (all-stub) so their DuckDB
    * byte-walk replays remain exact. */
  def decodeMetaReal(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, f) = ImageIoCodec.decode(r.payload)
          .getOrElse(StubCodec.decode(r.payload))
        MediaMeta(r.doc_id, r.payload.length.toLong, w.toLong, h.toLong,
          f.toLong, w.toLong * h.toLong * 3L * f.toLong)
      }
    }(Encoders.product[MediaMeta])
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

  case class FrameRow(doc_id: Long, frame_idx: Long, width: Long,
                      height: Long, payload: Array[Byte])

  /** [[sampleFrames]] with the REAL codec in front: payloads whose
    * ImageIO reader reports multiple images (animated GIF — the one
    * multi-frame container the JDK decodes natively) get every
    * `stride`-th frame DECODED and re-encoded as its own PNG payload —
    * the genuine "explode a video into frame rows" path, frame count
    * from the container, pixels real. Single-image payloads emit
    * frame 0; unrecognized payloads fall back to [[StubCodec]]
    * metadata with the payload passed through per sampled index, so
    * the synthetic corpus flows end-to-end and oracles exactly. Row
    * count multiplies by frames/stride — the same fan-out shape as
    * the plan-only twin; partitioning by doc_id keeps a document's
    * frames co-located. */
  def sampleFramesReal(media0: Dataset[MediaRow], stride: Int): Dataset[FrameRow] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    // decode is the per-row CPU wall (guide §8.3); a corpus small
    // enough to scan as one split must not decode on one core
    val media = Scale.fan(media0)
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // executor JVMs too
      rows.flatMap { r =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val decoded: Option[Seq[FrameRow]] =
          if (iis == null) None
          else try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) None
            else {
              val rd = readers.next()
              try {
                rd.setInput(iis)
                // allowSearch=true: we decode the frames anyway, so a
                // full scan for the true count is already paid for
                val n = math.max(1,
                  try rd.getNumImages(true) catch { case _: Exception => 1 })
                Some((0 until n by stride).map { i =>
                  val img = rd.read(i)
                  val baos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(img, "png", baos)
                  FrameRow(r.doc_id, i.toLong, img.getWidth.toLong,
                    img.getHeight.toLong, baos.toByteArray)
                })
              } catch { case _: Exception => None
              } finally rd.dispose()
            }
          } finally iis.close()
        decoded.getOrElse {
          val (w, h, f) = StubCodec.decode(r.payload)
          (0 until f by stride).map(i =>
            FrameRow(r.doc_id, i.toLong, w.toLong, h.toLong, r.payload))
        }
      }
    }(Encoders.product[FrameRow])
  }

  /** Resize plan: longest side capped at `maxDim`, aspect preserved,
    * never upscaled. Integer-exact arithmetic (floor((w*maxDim)/side))
    * so the plan is engine-portable; a real impl would hand (payload,
    * out_w, out_h) to the native scaler in the same mapPartitions
    * batch as [[decodeMeta]]. */
  def resizePlan(meta: Dataset[MediaMeta], maxDim: Int): DataFrame = {
    val side = greatest(col("width"), col("height"))
    val outW = when(side <= maxDim, col("width"))
      .otherwise(floor(col("width") * maxDim / side).cast("long"))
    val outH = when(side <= maxDim, col("height"))
      .otherwise(floor(col("height") * maxDim / side).cast("long"))
    meta.toDF().select(col("doc_id"), col("width"), col("height"),
      outW.as("out_w"), outH.as("out_h"),
      (outW * outH * 3L).as("out_bytes"))
  }

  /** The integer-exact output-dimension rule shared by [[resizePlan]]
    * (SQL form) and [[resizeReal]] (kernel form): longest side capped
    * at maxDim, aspect preserved via floor(d·maxDim/side), never
    * upscaled. */
  private[operators] def outDims(w: Int, h: Int, maxDim: Int): (Int, Int) = {
    val side = math.max(w, h)
    if (side <= maxDim) (w, h)
    else ((w.toLong * maxDim / side).toInt, (h.toLong * maxDim / side).toInt)
  }

  /** Box-filter area-average RGB downscale — own pixel loop (the
    * [[pixelPHash]] cell geometry per channel, not AWT scaling, so the
    * result is platform-deterministic). Integer sums per cell; each
    * output pixel is the exact truncated mean of its source cell. */
  def boxResize(img: java.awt.image.BufferedImage, outW: Int,
                outH: Int): java.awt.image.BufferedImage = {
    val w = img.getWidth; val h = img.getHeight
    val out = new java.awt.image.BufferedImage(
      outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var by = 0
    while (by < outH) {
      var bx = 0
      while (bx < outW) {
        val x0 = (bx.toLong * w / outW).toInt
        val x1 = math.max(x0 + 1, ((bx + 1).toLong * w / outW).toInt)
        val y0 = (by.toLong * h / outH).toInt
        val y1 = math.max(y0 + 1, ((by + 1).toLong * h / outH).toInt)
        var sr = 0L; var sg = 0L; var sb = 0L; var c = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
            c += 1; x += 1
          }
          y += 1
        }
        out.setRGB(bx, by,
          (((sr / c).toInt & 0xFF) << 16) | (((sg / c).toInt & 0xFF) << 8) |
            ((sb / c).toInt & 0xFF))
        bx += 1
      }
      by += 1
    }
    out
  }

  case class ResizedRow(doc_id: Long, width: Long, height: Long,
                        out_w: Long, out_h: Long, out_bytes: Long,
                        payload: Array[Byte])

  /** [[resizePlan]] with the REAL pixel path in front (the r12
    * verdict's ask): payloads ImageIO recognizes get a full decode,
    * the deterministic [[boxResize]] downscale, and a PNG re-encode —
    * `payload` holds the ACTUAL resized image and `out_bytes` its true
    * encoded size. Unrecognized payloads fall back to [[StubCodec]]
    * dims + [[resizePlan]] arithmetic with the payload passed through,
    * so synthetic corpora flow unchanged and the oracled
    * q_multimodal_resize chain (all-stub, metadata-only) stays exact.
    * Same mapPartitions batch shape as every L12 operator — one codec
    * context per partition. */
  def resizeReal(media0: Dataset[MediaRow], maxDim: Int): Dataset[ResizedRow] = {
    require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim")
    val media = Scale.fan(media0) // decode wall: see sampleFramesReal
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // executor JVMs too
      rows.map { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case _: Exception => null }
        if (img != null) {
          val (w, h) = (img.getWidth, img.getHeight)
          val (ow, oh) = outDims(w, h, maxDim)
          val resized = if (ow == w && oh == h) img else boxResize(img, ow, oh)
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(resized, "png", baos)
          val png = baos.toByteArray
          ResizedRow(r.doc_id, w.toLong, h.toLong, ow.toLong, oh.toLong,
            png.length.toLong, png)
        } else {
          val (w, h, _) = StubCodec.decode(r.payload)
          val (ow, oh) = outDims(w, h, maxDim)
          ResizedRow(r.doc_id, w.toLong, h.toLong, ow.toLong, oh.toLong,
            ow.toLong * oh.toLong * 3L, r.payload)
        }
      }
    }(Encoders.product[ResizedRow])
  }

  case class PHashRow(doc_id: Long, phash: Long)

  /** L12e: perceptual hash over the decoded payload — the image
    * near-dup fingerprint (pHash shape: 64 block means thresholded
    * against the global mean; a real impl runs the same comparison
    * over DCT coefficients of decoded pixels — swap the byte walk for
    * the decoder, the bit construction is identical). Integer-exact:
    * bit b = 1 iff sum_b·n > total·n_b (cross-multiplied means, no
    * division), so the fingerprint is engine-portable and the
    * downstream Hamming dedup ([[Dedup.hammingPairs]]) is oracled.
    * Blocks with no bytes (payload < 64 bytes) contribute 0 bits. */
  /** The deterministic byte-walk fingerprint shared by
    * [[perceptualHash]] (always) and [[perceptualHashReal]]'s
    * unrecognized-payload fallback — one definition so the two paths
    * can never drift on synthetic corpora. */
  private[operators] def byteWalkHash(payload: Array[Byte]): Long = {
    val n = payload.length
    // sums(blk)·n ≤ 255n²/64 must stay inside Long — wraps (wrong
    // bits, silent oracle divergence) past ~1.5e9 bytes; a payload
    // that size belongs in chunked storage anyway. Fail loudly.
    require(n <= 1_000_000_000,
      s"payload is $n bytes; perceptualHash supports <= 1e9")
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < n) {
      val b = (payload(i) & 0xFF).toLong
      val blk = ((i.toLong * 64L) / n).toInt
      sums(blk) += b; cnts(blk) += 1L; total += b
      i += 1
    }
    var fp = 0L
    var blk = 0
    while (blk < 64) {
      if (cnts(blk) > 0L && sums(blk) * n > total * cnts(blk))
        fp |= (1L << blk)
      blk += 1
    }
    fp
  }

  def perceptualHash(media: Dataset[MediaRow]): Dataset[PHashRow] = {
    media.mapPartitions { rows =>
      // real impl: one native decoder context per partition, as above
      rows.map(r => PHashRow(r.doc_id, byteWalkHash(r.payload)))
    }(Encoders.product[PHashRow])
  }

  /** Classic DCT pHash over REAL pixels (the r11 verdict's ask): box-
    * filter area-average grayscale downscale to 32×32 (own loop, not
    * AWT scaling — platform-deterministic), 2-D DCT-II, and the 8×8
    * low-frequency block thresholded against its AC mean. Every step
    * is the published pHash construction; the decode is the JDK's own
    * ImageIO (PNG/BMP/GIF/JPEG), so this is a REAL image near-dup
    * fingerprint with zero new dependencies. */
  def pixelPHash(img: java.awt.image.BufferedImage): Long = {
    val N = 32
    val w = img.getWidth; val h = img.getHeight
    val g = Array.ofDim[Double](N, N)
    var by = 0
    while (by < N) {
      var bx = 0
      while (bx < N) {
        // cell [x0,x1)×[y0,y1): non-empty for any image size (max
        // guard handles w,h < 32 — cells then overlap-sample pixels)
        val x0 = (bx.toLong * w / N).toInt
        val x1 = math.max(x0 + 1, ((bx + 1).toLong * w / N).toInt)
        val y0 = (by.toLong * h / N).toInt
        val y1 = math.max(y0 + 1, ((by + 1).toLong * h / N).toInt)
        var s = 0L; var c = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            // integer Rec.601 luma ×1000 — exact, portable
            s += 299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
              114L * (rgb & 0xFF)
            c += 1; x += 1
          }
          y += 1
        }
        g(by)(bx) = s.toDouble / c
        bx += 1
      }
      by += 1
    }
    val dct = Array.ofDim[Double](8, 8)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < N) {
          var x = 0
          while (x < N) {
            s += g(y)(x) *
              math.cos((2 * y + 1) * u * math.Pi / (2 * N)) *
              math.cos((2 * x + 1) * v * math.Pi / (2 * N))
            x += 1
          }
          y += 1
        }
        dct(u)(v) = s
        v += 1
      }
      u += 1
    }
    var tot = 0.0
    var i = 0
    while (i < 64) {
      if (i != 0) tot += dct(i / 8)(i % 8) // exclude DC
      i += 1
    }
    val mean = tot / 63.0
    var fp = 0L
    i = 0
    while (i < 64) {
      if (dct(i / 8)(i % 8) > mean) fp |= 1L << i
      i += 1
    }
    fp
  }

  /** [[perceptualHash]] with the REAL codec in front (the
    * [[decodeMetaReal]] contract): payloads a registered ImageIO
    * reader recognizes get full pixel decode + [[pixelPHash]] — true
    * resize/re-encode-robust image fingerprints; anything
    * unrecognized falls back to the deterministic byte-walk, so
    * synthetic corpora and the oracled q_multimodal_phash chain are
    * untouched. Same mapPartitions batch shape (a production build
    * swaps ImageIO for a native decoder in the same loop). */
  def perceptualHashReal(media0: Dataset[MediaRow]): Dataset[PHashRow] = {
    val stubHash: Array[Byte] => Long = byteWalkHash
    val media = Scale.fan(media0) // decode wall: see sampleFramesReal
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // executor JVMs too
      rows.map { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case _: Exception => null }
        val fp = if (img != null) pixelPHash(img) else stubHash(r.payload)
        PHashRow(r.doc_id, fp)
      }
    }(Encoders.product[PHashRow])
  }

  /** L12f: cross-modal alignment scoring — the LAION/DataComp shape
    * (keep an (image, caption) pair only if the two modalities'
    * embeddings agree): media-side features and text-side features
    * meet in a doc-keyed join and score by cosine. HONEST STUB, same
    * contract as the rest of L12: a real pipeline embeds both sides
    * with a dual encoder (CLIP) inside [[extractFeatures]]'
    * per-partition batch loop; here the media embedding is the
    * deterministic byte histogram and the text embedding the 8-dim
    * hashed bag-of-words — fake features, REAL plumbing (partition
    * batch shape, modality join, quantized score, threshold keep),
    * and the whole chain still carries a hash oracle. Returns
    * (doc_id, align, keep). */
  def alignmentScore(media: Dataset[MediaRow],
                     texts: org.apache.spark.sql.DataFrame,
                     idCol: String, textCol: String,
                     minAlign: Double = 0.5): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val img = extractFeatures(media).toDF()
      .select(col("doc_id"), col("histogram").as("img_vec"))
    val txt = texts.select(col(idCol).as("doc_id"),
      graft.functions.hashed_bow(
        graft.functions.tokenize_ws(col(textCol)), 8).as("txt_vec"))
    img.join(txt, "doc_id")
      .withColumn("align", graft.functions.round_portable(
        graft.functions.cosine_sim(col("img_vec"), col("txt_vec")), 4))
      .withColumn("keep", (col("align") >= minAlign).cast("long"))
      .select("doc_id", "align", "keep")
  }

  case class MediaFeatures(doc_id: Long, histogram: Array[Double], mean_byte: Double)

  /** [[extractFeatures]] with the REAL pixel path in front (the
    * perceptualHashReal discipline): payloads ImageIO decodes get an
    * 8-bin LUMINANCE histogram + mean luminance computed from actual
    * pixels — content statistics invariant to the container encoding
    * (the byte-histogram stub changes when the same image is
    * re-encoded; the pixel histogram does not, which is the property
    * a dedup/quality signal needs). Luminance is the integer ITU-R
    * BT.601 weighting (299 r + 587 g + 114 b) / 1000 — all-integer,
    * deterministic. Unrecognized payloads keep the stub byte
    * features, so the oracled synthetic chain (text payloads) is
    * bit-untouched; MultimodalSpec pins codec-invariance on a planted
    * image delivered as both PNG and BMP. */
  def extractFeaturesReal(media0: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val media = Scale.fan(media0) // decode wall: see sampleFramesReal
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // executor JVMs too
      rows.map { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case _: Exception => null }
        if (img != null) {
          val counts = new Array[Double](8)
          var sum = 0.0
          val (w, h) = (img.getWidth, img.getHeight)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xFF) * 299 +
                ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
              counts(lum * 8 / 256) += 1
              sum += lum
              x += 1
            }
            y += 1
          }
          val n = math.max(1, w.toLong * h)
          MediaFeatures(r.doc_id, counts.map(_ / n), sum / n)
        } else {
          val counts = new Array[Double](8)
          var sum = 0.0
          r.payload.foreach { b =>
            val v = b & 0xFF
            counts(v % 8) += 1
            sum += v
          }
          val n = math.max(1, r.payload.length)
          MediaFeatures(r.doc_id, counts.map(_ / n), sum / n)
        }
      }
    }(Encoders.product[MediaFeatures])
  }

  case class AudioFeatures(doc_id: Long, real: Boolean, sample_rate: Long,
                           channels: Long, n_frames: Long, mean_square: Long,
                           zero_crossings: Long, peak_abs: Long)

  /** L12j: REAL audio feature extraction — the audio leg of the
    * real-media discipline (pHash/resize/frames/features all decode
    * actual pixels; this decodes actual PCM samples). Payloads
    * `javax.sound.sampled` recognizes (WAV/AIFF/AU — the JDK's native
    * audio containers, no external lib) are decoded to PCM and get
    * ALL-INTEGER content statistics: mean square energy
    * floor(Σs²/count) (the RMS surrogate without a libm sqrt — the
    * loudness/silence gate), zero crossings on channel 0 (the classic
    * voiced/unvoiced & noise discriminator), and peak amplitude (the
    * clipping detector). Integer stats are the portability rule: a
    * second engine or a replay re-derives them bit-exactly, no float
    * accumulation order to disagree on. Unrecognized payloads fall
    * back to a deterministic signed-8-bit interpretation of the raw
    * bytes with `real = false` and `sample_rate = 0` — SQL-replayable
    * byte arithmetic, so the synthetic corpus chain stays fully
    * hash-oracled while MultimodalSpec pins the real branch on a
    * planted WAV (square wave → exact ZCR, constant tone → exact
    * mean square). Same `mapPartitions` batch shape as the other
    * codecs (a production build loads its decoder context once per
    * partition here); map-side, zero shuffles. */
  def extractAudioReal(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    // NOT fanned (unlike the image decoders): javax.sound's provider
    // lookup serializes on a static registry lock, so parallel decode
    // tasks in one JVM burn more time spinning than the serial pass
    // costs (measured 0.95 s serial vs 3.05 s fanned at the bench SF)
    media.mapPartitions { rows =>
      rows.map { r =>
        decodePcm(r.payload) match {
          case Some((rate, ch, samples)) =>
            var ss = 0L; var peak = 0L; var zc = 0L
            var i = 0
            val n = samples.length
            while (i < n) {
              val s = samples(i).toLong
              ss += s * s
              val a = math.abs(s)
              if (a > peak) peak = a
              i += 1
            }
            // zero crossings on channel 0 (frame stride = channels)
            var prevNeg = n > 0 && samples(0) < 0
            i = ch
            while (i < n) {
              val neg = samples(i) < 0
              if (neg != prevNeg) zc += 1
              prevNeg = neg
              i += ch
            }
            val frames = if (ch > 0) n / ch else 0
            AudioFeatures(r.doc_id, real = true, rate.toLong, ch.toLong,
              frames.toLong, if (n > 0) ss / n else 0L, zc, peak)
          case None =>
            // deterministic fallback: raw bytes as signed 8-bit mono
            val b = r.payload
            var ss = 0L; var peak = 0L; var zc = 0L
            var prevNeg = b.nonEmpty && b(0) < 0
            var i = 0
            while (i < b.length) {
              val s = b(i).toLong
              ss += s * s
              val a = math.abs(s)
              if (a > peak) peak = a
              if (i > 0) {
                val neg = b(i) < 0
                if (neg != prevNeg) zc += 1
                prevNeg = neg
              }
              i += 1
            }
            AudioFeatures(r.doc_id, real = false, 0L, 1L, b.length.toLong,
              if (b.nonEmpty) ss / b.length else 0L, zc, peak)
        }
      }
    }(Encoders.product[AudioFeatures])
  }

  /** PCM decode via the JDK audio stack: Some((rate, channels,
    * interleaved samples)) for recognized PCM containers (8/16-bit,
    * signed/unsigned, either endianness), None otherwise. 16-bit
    * samples keep their full range; 8-bit unsigned recenters at 128
    * (the WAV convention) so silence is 0 in every branch. */
  private[operators] def decodePcm(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        val enc = f.getEncoding
        val bits = f.getSampleSizeInBits
        val ok = (enc == AudioFormat.Encoding.PCM_SIGNED ||
          enc == AudioFormat.Encoding.PCM_UNSIGNED) &&
          (bits == 8 || bits == 16)
        if (!ok) None
        else {
          val raw = in.readAllBytes()
          val signed = enc == AudioFormat.Encoding.PCM_SIGNED
          val out =
            if (bits == 8) {
              val a = new Array[Int](raw.length)
              var i = 0
              while (i < raw.length) {
                a(i) = if (signed) raw(i).toInt else (raw(i) & 0xFF) - 128
                i += 1
              }
              a
            } else {
              val n = raw.length / 2
              val a = new Array[Int](n)
              val be = f.isBigEndian
              var i = 0
              while (i < n) {
                val lo = raw(2 * i + (if (be) 1 else 0)) & 0xFF
                val hi = raw(2 * i + (if (be) 0 else 1)) & 0xFF
                val u = (hi << 8) | lo
                a(i) = if (signed) u.toShort.toInt else u - 32768
                i += 1
              }
              a
            }
          Some((f.getSampleRate.toInt, f.getChannels, out))
        }
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Feature extraction stub: 8-bin byte-value histogram (normalized)
    * + mean byte — the per-partition batch shape of a real embedding
    * model (load weights once per partition, run the batch through). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    media.mapPartitions { rows =>
      // real impl: load the model/native context once per partition here
      rows.map { r =>
        val counts = new Array[Double](8)
        var sum = 0.0
        r.payload.foreach { b =>
          val v = b & 0xFF
          counts(v % 8) += 1
          sum += v
        }
        val n = math.max(1, r.payload.length)
        MediaFeatures(r.doc_id, counts.map(_ / n), sum / n)
      }
    }(Encoders.product[MediaFeatures])
  }

  /** L12k (r14): deterministic REAL-media planting — the query-scale
    * driver for the ImageIO branches. The r13 `*_real` operators'
    * decode paths were only exercised at spec scale (planted payloads
    * in MultimodalSpec); a synthetic-text corpus routes every query
    * row down the stub fallback, so a user pointing graft at actual
    * images runs code volume never sees. This closes that: each id
    * becomes a GENUINE PNG (solid RGB, dims and color pure integer
    * functions of the id) that `ImageIO.read` must decode — and
    * because the pixels are a known constant, the DuckDB oracle
    * re-derives the decoded luminance statistics and resize dims from
    * the same arithmetic, making the real decode→process→re-encode
    * chain hash-oracled END TO END at corpus scale.
    *
    * dims: w = 8 + id mod 33, h = 8 + (7·id) mod 29 (small on purpose
    * — the point is branch coverage per row, not pixel volume);
    * color: (id, 3·id, 5·id) mod 256. Map-side mapPartitions, one
    * encoder context per partition, zero shuffles. */
  private[graft] def plantDims(id: Long): (Int, Int) =
    ((8 + id % 33).toInt, (8 + (id * 7) % 29).toInt)

  private[graft] def plantColor(id: Long): (Int, Int, Int) =
    ((id % 256).toInt, ((id * 3) % 256).toInt, ((id * 5) % 256).toInt)

  def plantRealPngs(docs: DataFrame, idCol: String): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val (w, h) = plantDims(id)
        val (r, g, b) = plantColor(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (r << 16) | (g << 8) | b
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        MediaRow(id, baos.toByteArray)
      }
    }(Encoders.product[MediaRow])
  }

  /** The multi-frame twin of [[plantRealPngs]]: ids where
    * id mod `every` == 0 become genuine ANIMATED GIFs with
    * nf = 2 + id mod 5 solid-gray frames at [[plantDims]] dims — the
    * one multi-frame container the JDK decodes — so
    * [[sampleFramesReal]]'s container loop (getNumImages, per-frame
    * read) runs at query scale with an oracle-predictable frame
    * count. Gray level 32 + 24·f per frame (GIF palettes quantize
    * color, never dims/count — the oracled columns). */
  def plantRealGifs(docs: DataFrame, idCol: String,
                    every: Int): Dataset[MediaRow] = {
    require(every >= 1, s"every must be >= 1, got $every")
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .filter((id: Long) => id % every == 0)
      .mapPartitions { ids =>
        ids.map { id =>
          val (w, h) = plantDims(id)
          val nf = (2 + id % 5).toInt
          val baos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
          val writer = javax.imageio.ImageIO
            .getImageWritersByFormatName("gif").next()
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nf) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val v = 32 + 24 * f
            val rgb = (v << 16) | (v << 8) | v
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { img.setRGB(x, y, rgb); x += 1 }
              y += 1
            }
            val meta = writer.getDefaultImageMetadata(
              javax.imageio.ImageTypeSpecifier
                .createFromRenderedImage(img), null)
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, meta), null)
            f += 1
          }
          writer.endWriteSequence()
          ios.close()
          MediaRow(id, baos.toByteArray)
        }
      }(Encoders.product[MediaRow])
  }
}
