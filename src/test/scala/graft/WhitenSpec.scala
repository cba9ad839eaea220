package graft

import org.apache.spark.sql.functions._

import graft.operators.Whiten

/** All-but-the-top invariants (SURVEY.md §2 L113). The value-level
  * gate is q_embed_whiten's DuckDB replay; these pin the linear
  * algebra a hash can't express: direction recovery on a planted
  * dominant component, projection annihilation, partition invariance,
  * the sign convention, and the degenerate-input guard.
  */
class WhitenSpec extends SparkSpec {
  import spark.implicits._

  /** Planted corpus: points along u = (3,4,0,0)/5 with a small fixed
    * per-dim offset pattern — the top principal direction of the
    * centered data is u by construction. */
  private def planted(flip: Boolean = false) = {
    val u = Seq(0.6, 0.8, 0.0, 0.0)
    val sgn = if (flip) -1.0 else 1.0
    (1 to 40).map { i =>
      val a = sgn * (i - 20.5) / 20.0 // centered coefficients
      val noise = Seq(0.001 * (i % 3), -0.001 * (i % 2), 0.002, -0.002)
      (i.toLong, u.zip(noise).map { case (uj, nj) =>
        (0.05 * i) * 0.0 + a * uj + nj }.map(_.toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("fit recovers a planted dominant direction; sign convention holds") {
    val (_, _, v) = Whiten.fit(planted(), "vec_id", "embedding", rounds = 4)
    val vd = v.map(_.toDouble)
    val norm = math.sqrt(vd.map(x => x * x).sum)
    val cos = (vd(0) * 0.6 + vd(1) * 0.8) / norm
    assert(math.abs(cos) > 0.999, s"direction off: cos=$cos v=${v.toSeq}")
    // first nonzero component positive — regardless of the sign the
    // iteration happens to converge to
    assert(v(v.indexWhere(_ != 0L)) > 0L, s"sign convention: ${v.toSeq}")
    val (_, _, v2) = Whiten.fit(planted(flip = true), "vec_id",
      "embedding", rounds = 4)
    assert(v2(v2.indexWhere(_ != 0L)) > 0L,
      s"sign convention under flipped data: ${v2.toSeq}")
  }

  test("processed table annihilates the top direction, keeps the rest") {
    val out = Whiten.allButTheTop(planted(), "vec_id", "embedding",
      rounds = 4)
    val (_, _, v) = Whiten.fit(planted(), "vec_id", "embedding", rounds = 4)
    val vLit = array(v.map(lit).toIndexedSeq: _*)
    // residual projection of every processed row on v must be tiny
    // relative to the original projections (quantization-level only)
    val res = out.select(
        abs(aggregate(zip_with(col("processed"), vLit, (a, b) => a * b),
          lit(0L), (acc, t) => acc + t)).as("r"),
        abs(col("proj_q")).as("p"))
      .agg(max("r").cast("double").as("rmax"), max("p").cast("double").as("pmax"))
      .head()
    // r is in 2^40 units (processed·v), p in 2^20; compare on one scale
    val rmaxQ = res.getDouble(0) / Whiten.Scale
    assert(rmaxQ <= res.getDouble(1) * 0.01 + 64,
      s"projection not removed: residual $rmaxQ vs original ${res.getDouble(1)}")
    // centered-mean sanity: per-dim mean of processed is near zero
    // (trunc-quantization drifts at most ~1 unit/row + projection of
    // the mean shift)
    val meanAbs = out.select(posexplode(col("processed")).as(Seq("j", "x")))
      .groupBy("j").agg(abs(avg("x")).as("m"))
      .agg(max("m")).head().getDouble(0)
    assert(meanAbs < Whiten.Scale * 0.05,
      s"processed mean too far from zero: $meanAbs")
  }

  test("deflation removes two planted directions; handoff is lossless") {
    // two dominant directions: u1 = (0.6, 0.8, 0, 0) strong,
    // u2 = (0, 0, 1, 0) weaker; after removing 2 components the
    // residual projections on BOTH must be quantization-small
    val data = (1 to 40).map { i =>
      val a = (i - 20.5) / 10.0
      val b = (if (i % 2 == 0) 1.0 else -1.0) * (i % 7) / 14.0
      (i.toLong, Seq(a * 0.6, a * 0.8, b, 0.003 * (i % 5)).map(_.toFloat))
    }.toDF("vec_id", "embedding")
    val out2 = Whiten.removeTopComponents(data, "vec_id", "embedding",
      components = 2, rounds = 4)
    // residual energy along the planted directions, in raw units
    val res = out2.selectExpr(
        "CAST(abs(processed[0] * 6 + processed[1] * 8) AS DOUBLE) / 10.0 AS r1",
        "abs(processed[2]) AS r2")
      .agg(max("r1").as("m1"), max("r2").as("m2")).head()
    // original projections were ~a·2^20 (up to ~2e6 units); residuals
    // must be orders smaller (quantization + convergence slack)
    assert(res.getDouble(0) < 20000,
      s"direction-1 residual too large: ${res.getDouble(0)}")
    assert(res.getLong(1) < 20000,
      s"direction-2 residual too large: ${res.getLong(1)}")
    // the de-quantize -> re-quantize handoff is exact: removing ONE
    // component via the multi API equals the single-pass operator
    val one = Whiten.removeTopComponents(data, "vec_id", "embedding",
        components = 1, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val direct = Whiten.allButTheTop(data, "vec_id", "embedding", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(one == direct, "1-component deflation must equal the single pass")
  }

  test("moment-derived model aligns with the batch fit (C13al parity pin)") {
    // modelFromMoments documents "bit-equality NOT promised" vs fit
    // (fit truncates per-row projections; the moment path iterates on
    // exact centered moments). This pins the parity that IS promised,
    // so silent divergence between the streaming-maintained model and
    // the batch model is caught: μ must be IDENTICAL (both are the
    // trunc-mean of the same quantized table) and the directions must
    // align to cos ≥ 0.999 on the planted corpus.
    val (nF, muF, vF) = Whiten.fit(planted(), "vec_id", "embedding", rounds = 4)
    val moments = Whiten.momentStats(planted(), "vec_id", "embedding")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1),
        BigDecimal(r.getDecimal(2)))).toSeq
    val (nM, muM, vM) = Whiten.modelFromMoments(moments, rounds = 4)
    assert(nM == nF, s"row counts diverge: $nM vs $nF")
    assert(muM.toSeq == muF.toSeq,
      s"trunc-means must be identical: ${muM.toSeq} vs ${muF.toSeq}")
    val dot = vF.zip(vM).map { case (a, b) => a.toDouble * b }.sum
    val cos = dot / (math.sqrt(vF.map(x => x.toDouble * x).sum) *
      math.sqrt(vM.map(x => x.toDouble * x).sum))
    assert(cos > 0.999,
      s"moment-path direction off the batch fit: cos=$cos " +
        s"fit=${vF.toSeq} moments=${vM.toSeq}")
  }

  test("partition invariance and degenerate-input guard") {
    val a = Whiten.allButTheTop(planted(), "vec_id", "embedding", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val b = Whiten.allButTheTop(planted().repartition(7), "vec_id",
        "embedding", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(a == b, "whitening changed under repartitioning")
    // all rows identical -> centered table is zero -> loud error, not
    // a silently-arbitrary direction
    val flat = (1 to 8).map(i => (i.toLong, Seq(0.5f, 0.5f, 0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val err = intercept[IllegalArgumentException] {
      Whiten.fit(flat, "vec_id", "embedding")
    }
    assert(err.getMessage.contains("collapsed"))
  }
}
