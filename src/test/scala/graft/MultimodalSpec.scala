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

  test("perceptual hash: copies collide at 0, distinct payloads separate") {
    import org.apache.spark.sql.functions.col
    val base = ("low " * 40 + "HIGH " * 40).getBytes("UTF-8")
    val other = ("HIGH " * 40 + "low " * 40).getBytes("UTF-8")
    val rows = Seq(MediaRow(1L, base), MediaRow(2L, base.clone()),
      MediaRow(3L, other), MediaRow(4L, Array.emptyByteArray)).toDS()
    val fp = Multimodal.perceptualHash(rows).collect()
      .map(r => r.doc_id -> r.phash).toMap
    assert(fp(1L) == fp(2L), "identical payloads must collide")
    assert(fp(1L) != fp(3L), "reordered blocks must differ")
    assert(fp(4L) == 0L, "empty payload is the zero print")
    // the generic hamming join surfaces exactly the copy pair at r=0
    val pairs = graft.operators.Dedup.hammingPairs(
        Multimodal.perceptualHash(rows).toDF(), "doc_id", "phash",
        maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0)))
  }

  test("real codec: planted PNG/BMP decode via ImageIO, synthetic falls back to stub") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff8040) // non-trivial pixel so the file is real
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"JDK must ship a $fmt writer")
      bos.toByteArray
    }
    val png = encode("png", 37, 21)
    val bmp = encode("bmp", 5, 9)
    val synthetic = "not an image at all".getBytes("UTF-8")
    val rows = Seq(MediaRow(1L, png), MediaRow(2L, bmp),
      MediaRow(3L, synthetic)).toDS()
    val meta = Multimodal.decodeMetaReal(rows).collect()
      .map(m => m.doc_id -> m).toMap
    // genuine payloads: TRUE container dimensions, not stub arithmetic
    assert(meta(1L).width == 37L && meta(1L).height == 21L &&
      meta(1L).n_frames == 1L, s"PNG decoded wrong: ${meta(1L)}")
    assert(meta(2L).width == 5L && meta(2L).height == 9L,
      s"BMP decoded wrong: ${meta(2L)}")
    // unrecognized payloads: byte-identical to the stub path (the
    // oracled q_multimodal_* contract)
    val stub = Multimodal.decodeMeta(Seq(MediaRow(3L, synthetic)).toDS())
      .collect().head
    assert(meta(3L) == stub, "synthetic payload must fall back to the stub")
    // and the stub path itself never consults ImageIO results
    assert(Multimodal.ImageIoCodec.decode(synthetic).isEmpty)
  }

  test("pixel pHash: resize/re-encode collide, distinct content separates, stub fallback intact") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // the same continuous pattern sampled at two resolutions and two
    // container formats — a REAL near-duplicate pair (the case the
    // byte-walk cannot catch: the bytes share nothing)
    def render(w: Int, h: Int, waves: Boolean): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val fx = x.toDouble / w; val fy = y.toDouble / h
        // base: smooth diagonal gradient. other: low-frequency (3,2)
        // sinusoid — energy lands on DIFFERENT cells of the 8×8 DCT
        // block, so the sign pattern (the fingerprint) flips broadly
        val v =
          if (waves) (128 + 120 * math.sin(2 * math.Pi * 3 * fx) *
            math.sin(2 * math.Pi * 2 * fy)).toInt.max(0).min(255)
          else math.min(255, (200 * fx + 55 * fy).toInt)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def encode(img: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"JDK must ship a $fmt writer")
      bos.toByteArray
    }
    val base = encode(render(64, 48, waves = false), "png")
    val neardup = encode(render(48, 36, waves = false), "bmp") // resized + re-encoded
    val other = encode(render(64, 48, waves = true), "png")    // different content
    val synthetic = "definitely not pixels".getBytes("UTF-8")
    val fp = Multimodal.perceptualHashReal(Seq(
        MediaRow(1L, base), MediaRow(2L, neardup), MediaRow(3L, other),
        MediaRow(4L, synthetic)).toDS())
      .collect().map(r => r.doc_id -> r.phash).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // resize + re-encode: DCT low frequencies survive, fingerprints collide
    assert(ham(fp(1L), fp(2L)) <= 8,
      s"near-dup pair must collide: hamming ${ham(fp(1L), fp(2L))}")
    // transposed content: far apart
    assert(ham(fp(1L), fp(3L)) >= 16,
      s"distinct content must separate: hamming ${ham(fp(1L), fp(3L))}")
    // unrecognized payloads: byte-identical to the oracled byte-walk
    val stub = Multimodal.perceptualHash(Seq(MediaRow(4L, synthetic)).toDS())
      .collect().head.phash
    assert(fp(4L) == stub, "synthetic payload must fall back to the byte-walk")
  }

  test("real pixel features: codec-invariant luminance stats, exact on flat image, stub fallback") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def flat(v: Int, w: Int, h: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      img
    }
    def encode(img: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"JDK must ship a $fmt writer")
      bos.toByteArray
    }
    val img = flat(100, 16, 8) // gray 100 -> luminance exactly 100
    val asPng = encode(img, "png")
    val asBmp = encode(img, "bmp")
    val synthetic = "not an image at all".getBytes("UTF-8")
    val feats = Multimodal.extractFeaturesReal(Seq(
        MediaRow(1L, asPng), MediaRow(2L, asBmp), MediaRow(3L, synthetic))
        .toDS())
      .collect().map(r => r.doc_id -> r).toMap
    // exact stats on the flat image: every pixel has luminance 100 ->
    // bin 100*8/256 = 3 holds all mass, mean is exactly 100
    assert(feats(1L).mean_byte === 100.0)
    assert(feats(1L).histogram.toSeq === Seq(0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0))
    // codec invariance — the property the byte stub CANNOT have: the
    // same pixels through png and bmp yield identical pixel features
    // but different byte-level features
    assert(feats(1L).histogram.toSeq === feats(2L).histogram.toSeq &&
      feats(1L).mean_byte === feats(2L).mean_byte)
    val stubFeats = Multimodal.extractFeatures(Seq(
        MediaRow(1L, asPng), MediaRow(2L, asBmp)).toDS())
      .collect().map(r => r.doc_id -> r).toMap
    assert(stubFeats(1L).mean_byte !== stubFeats(2L).mean_byte,
      "byte features must differ across containers (that's the stub's flaw)")
    // unrecognized payloads fall back byte-identically to the stub
    val stub3 = Multimodal.extractFeatures(Seq(MediaRow(3L, synthetic)).toDS())
      .collect().head
    assert(feats(3L).histogram.toSeq === stub3.histogram.toSeq &&
      feats(3L).mean_byte === stub3.mean_byte)
  }

  test("real audio: planted WAVs decode to exact integer PCM stats, text falls back") {
    import java.io.ByteArrayOutputStream
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def wav(samples: Array[Short], channels: Int, rate: Float,
            bigEndian: Boolean = false): Array[Byte] = {
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16,
        channels, 2 * channels, rate, bigEndian)
      val bytes = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        if (bigEndian) {
          bytes(2 * i) = (s >> 8).toByte; bytes(2 * i + 1) = s.toByte
        } else {
          bytes(2 * i) = s.toByte; bytes(2 * i + 1) = (s >> 8).toByte
        }
      }
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt,
        samples.length / channels)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // constant tone: every sample 1000 -> mean_square exactly 10^6,
    // zero crossings 0, peak 1000
    val tone = wav(Array.fill(200)(1000.toShort), 1, 8000f)
    // square wave alternating ±2000 -> a crossing at EVERY step
    val square = wav(Array.tabulate(100)(i =>
      (if (i % 2 == 0) 2000 else -2000).toShort), 1, 16000f)
    // stereo: channel 0 alternates ±500 (99 crossings), channel 1
    // constant 3000 (the peak) — ZCR must follow channel 0 only
    val stereo = wav(Array.tabulate(200)(i =>
      (if (i % 2 == 0) { if ((i / 2) % 2 == 0) 500 else -500 } else 3000)
        .toShort), 2, 44100f)
    val text = "not audio".getBytes("UTF-8")
    val out = Multimodal.extractAudioReal(Seq(
        MediaRow(1L, tone), MediaRow(2L, square), MediaRow(3L, stereo),
        MediaRow(4L, text)).toDS())
      .collect().map(r => r.doc_id -> r).toMap
    val t = out(1L)
    assert(t.real && t.sample_rate == 8000L && t.channels == 1L &&
      t.n_frames == 200L && t.mean_square == 1000000L &&
      t.zero_crossings == 0L && t.peak_abs == 1000L)
    val q = out(2L)
    assert(q.real && q.sample_rate == 16000L && q.n_frames == 100L &&
      q.mean_square == 4000000L && q.zero_crossings == 99L &&
      q.peak_abs == 2000L)
    val st = out(3L)
    assert(st.real && st.channels == 2L && st.n_frames == 100L &&
      st.zero_crossings == 99L && st.peak_abs == 3000L &&
      // interleaved energy: (500² + 3000²) / 2 = 4625000
      st.mean_square == 4625000L)
    // unrecognized payload: deterministic signed-8-bit fallback
    val f = out(4L)
    val sb = text.map(_.toLong)
    assert(!f.real && f.sample_rate == 0L && f.channels == 1L &&
      f.n_frames == text.length.toLong &&
      f.mean_square == sb.map(s => s * s).sum / text.length &&
      f.peak_abs == sb.map(math.abs).max && f.zero_crossings == 0L)
    // endianness: the same samples big-endian decode to the same stats
    val toneBe = wav(Array.fill(200)(1000.toShort), 1, 8000f, bigEndian = true)
    val be = Multimodal.extractAudioReal(Seq(MediaRow(9L, toneBe)).toDS())
      .collect().head
    assert(be.real && be.mean_square == 1000000L && be.peak_abs == 1000L)
  }

  test("real resize: planted PNG decodes, box-downscales, re-encodes; stub falls back") {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO
    // 64×32 horizontal gradient: after a 4× box downscale each output
    // pixel is the exact truncated mean of its 4×4 source cell
    val img = new BufferedImage(64, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 64) {
      val v = x * 4 // 0..252
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", bos))
    val synthetic = "not pixels".getBytes("UTF-8")
    val out = Multimodal.resizeReal(Seq(
        MediaRow(1L, bos.toByteArray), MediaRow(2L, synthetic)).toDS(),
        maxDim = 16)
      .collect().map(r => r.doc_id -> r).toMap
    val real = out(1L)
    assert(real.width == 64L && real.height == 32L &&
      real.out_w == 16L && real.out_h == 8L,
      s"dims wrong: $real")
    // the payload IS a decodable image of the declared output size
    val back = ImageIO.read(new ByteArrayInputStream(real.payload))
    assert(back.getWidth == 16 && back.getHeight == 8,
      "re-encoded payload must decode at the resized dimensions")
    assert(real.out_bytes == real.payload.length.toLong)
    // box filter: output pixel (0,0) = mean of x∈[0,4) values {0,4,8,12}=6
    assert((back.getRGB(0, 0) & 0xFF) == 6,
      s"area-average wrong: ${back.getRGB(0, 0) & 0xFF}")
    // stub path: resizePlan arithmetic over StubCodec dims, payload through
    val stub = out(2L)
    val (sw, sh, _) = Multimodal.StubCodec.decode(synthetic)
    val side = math.max(sw, sh)
    assert(stub.width == sw.toLong && stub.height == sh.toLong &&
      stub.out_w == (sw.toLong * 16 / side) && stub.out_h == (sh.toLong * 16 / side))
    assert(stub.payload.sameElements(synthetic))
  }

  test("real frame sampling: planted animated GIF explodes to decoded frames") {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    // 6-frame 10×8 animated GIF, each frame a distinct solid gray
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until 6) {
      val img = new BufferedImage(10, 8, BufferedImage.TYPE_INT_RGB)
      val v = 40 * f
      for (y <- 0 until 8; x <- 0 until 10)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      val meta = writer.getDefaultImageMetadata(
        ImageTypeSpecifier.createFromRenderedImage(img), null)
      writer.writeToSequence(new IIOImage(img, null, meta), null)
    }
    writer.endWriteSequence(); ios.close()
    val gif = baos.toByteArray
    val synthetic = "not a container".getBytes("UTF-8")
    val out = Multimodal.sampleFramesReal(Seq(
        MediaRow(1L, gif), MediaRow(2L, synthetic)).toDS(), stride = 2)
      .collect().groupBy(_.doc_id)
    // frames 0, 2, 4 decoded at true dims, each payload a real PNG
    val frames = out(1L).sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0L, 2L, 4L),
      s"stride-2 over 6 frames: ${frames.map(_.frame_idx).toSeq}")
    frames.foreach { f =>
      assert(f.width == 10L && f.height == 8L)
      val img = ImageIO.read(new ByteArrayInputStream(f.payload))
      assert(img.getWidth == 10 && img.getHeight == 8,
        "frame payload must decode at the container dimensions")
    }
    // GIF palettes may quantize, but frame ORDER must survive: the
    // sampled grays are strictly increasing (frames 0 < 2 < 4)
    val grays = frames.map(f => ImageIO
      .read(new ByteArrayInputStream(f.payload)).getRGB(0, 0) & 0xFF)
    assert(grays(0) < grays(1) && grays(1) < grays(2),
      s"frame order lost: ${grays.toSeq}")
    // stub fallback: StubCodec frame count, payload passthrough
    val stub = out(2L)
    val (_, _, nf) = Multimodal.StubCodec.decode(synthetic)
    assert(stub.length == (0 until nf by 2).length)
    assert(stub.forall(_.payload.sameElements(synthetic)))
  }

  test("plantRealPngs drives the REAL decode branch with oracle-exact stats") {
    import javax.imageio.ImageIO
    import java.io.ByteArrayInputStream
    val sp = spark
    import sp.implicits._
    val ids = Seq(0L, 7L, 200L, 499L)
    val docs = ids.toDF("doc_id")
    val media = Multimodal.plantRealPngs(docs, "doc_id").collect()
    media.foreach { m =>
      val img = ImageIO.read(new ByteArrayInputStream(m.payload))
      val (w, h) = Multimodal.plantDims(m.doc_id)
      assert(img != null, s"planted payload for ${m.doc_id} must be a real PNG")
      assert(img.getWidth == w && img.getHeight == h)
      val (r, g, b) = Multimodal.plantColor(m.doc_id)
      assert((img.getRGB(0, 0) & 0xFFFFFF) == ((r << 16) | (g << 8) | b))
    }
    // decoded stats equal the planted-color arithmetic — the REAL
    // branch's answer; the byte-histogram fallback on a PNG byte
    // stream could not produce a single-bin histogram
    val feats = Multimodal.extractFeaturesReal(
        Multimodal.plantRealPngs(docs, "doc_id"))
      .collect().map(f => f.doc_id -> f).toMap
    ids.foreach { id =>
      val (r, g, b) = Multimodal.plantColor(id)
      val lum = (r * 299 + g * 587 + b * 114) / 1000
      assert(feats(id).mean_byte == lum.toDouble)
      assert(feats(id).histogram(lum * 8 / 256) == 1.0)
    }
    // GIF twin: frame count + dims survive the container round-trip
    val gifs = Multimodal.plantRealGifs(Seq(14L, 23L, 21L).toDF("doc_id"),
      "doc_id", every = 7)
    val frames = Multimodal.sampleFramesReal(gifs, stride = 1)
      .collect().groupBy(_.doc_id)
    assert(!frames.contains(23L), "23 % 7 != 0 — must not plant")
    Seq(14L, 21L).foreach { id =>
      val (w, h) = Multimodal.plantDims(id)
      val nf = (2 + id % 5).toInt
      assert(frames(id).length == nf, s"gif $id frame count")
      assert(frames(id).forall(f => f.width == w && f.height == h))
    }
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
