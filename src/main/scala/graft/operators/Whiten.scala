package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** L113: "All-but-the-top" embedding post-processing (Mu & Viswanath,
  * ICLR'18): mean-center the embedding table and remove the top
  * principal direction — the two transformations that paper shows
  * dominate the anisotropy of learned embeddings, standard prep
  * before cosine-based dedup/retrieval (SemDeDup, ANN) on raw model
  * embeddings.
  *
  * Everything is INTEGER-QUANTIZED so the whole chain hash-oracles in
  * a second engine (the L63f/SGNS discipline):
  *  - vectors quantize once to xq = ⌊x·2^20⌋ (exact in any engine);
  *  - the principal direction comes from synchronous POWER-ITERATION
  *    rounds where the only corpus-sized work per round is ONE
  *    aggregate: s_i = (xq_i − μ)·v (integer dot), u = Σ_i s'_i·(xq_i − μ)
  *    — the d-vector u is collected (bounded: d rows), normalized
  *    driver-side with a FIXED-ORDER double fold, and re-quantized;
  *  - every division that can see a negative numerator goes through
  *    trunc-division written as CASE WHEN a < 0 THEN −((−a) DIV b)
  *    ELSE a DIV b END — Spark's `div` truncates while DuckDB's `//`
  *    floors, so the sign-split form is the only portable spelling;
  *  - the eigenvector's sign is fixed by convention (first nonzero
  *    component positive) — the direction is defined only up to sign.
  *
  * Scale shape: rounds move only (row, scalar) frames and d-vector
  * aggregates — the model state is d longs on the driver (like Lloyd
  * centroids), never a d×d covariance and never a collect of rows.
  * Integer bounds at 2^20 scaling: |s| ≤ d·2^40, per-round sums reach
  * n·2^44 — BIGINT-safe to ~10^5 rows per partition-group and summed
  * via decimal(38,0) beyond (both engines widened identically).
  */
object Whiten {

  val ScaleBits = 20
  val Scale: Long = 1L << ScaleBits // 1048576

  /** Portable trunc-division of a possibly-negative SQL column. */
  private def tdivSql(a: String, b: Long): String =
    s"CASE WHEN ($a) < 0 THEN -((-($a)) DIV ${b}L) ELSE ($a) DIV ${b}L END"

  private def tdiv(a: Long, b: Long): Long = a / b // JVM: trunc toward zero

  /** Quantized embedding frame (id, xq: array<long>): one pass, pinned
    * because the fit re-reads it rounds+2 times. */
  private def quantized(df: DataFrame, idCol: String,
                        vecCol: String): DataFrame =
    Lineage.pin(df.select(col(idCol).as("id"),
      expr(s"transform($vecCol, e -> CAST(FLOOR(CAST(e AS DOUBLE) * " +
        s"${Scale}L) AS BIGINT))").as("xq")))

  /** Fit the model: (n, μq, vq) — quantized mean and top principal
    * direction of the centered table after `rounds` synchronous power
    * iterations from the e₁ seed. */
  def fit(df: DataFrame, idCol: String, vecCol: String,
          rounds: Int = 3): (Long, Array[Long], Array[Long]) = {
    require(rounds >= 1, s"need >= 1 power-iteration round, got $rounds")
    val xq = quantized(df, idCol, vecCol)
    val d = xq.select(size(col("xq"))).head().getInt(0)
    val n = xq.count()
    require(n > 0, "allButTheTop needs a non-empty embedding table")
    // μq: per-dimension trunc-mean (sum widened through decimal)
    val sums = xq.select(posexplode(col("xq")).as(Seq("j", "x")))
      .groupBy("j")
      .agg(sum(col("x").cast("decimal(38,0)")).as("sx"))
      .collect()
      .map(r => r.getAs[Int]("j") ->
        r.getAs[java.math.BigDecimal]("sx").longValueExact()).toMap
    val mu = Array.tabulate(d)(j => tdiv(sums(j), n))
    val muLit = array(mu.map(lit).toIndexedSeq: _*)
    val xc = Lineage.pin(xq.select(col("id"),
      zip_with(col("xq"), muLit, (a, b) => a - b).as("xc")))
    var v = Array.tabulate(d)(j => if (j == 0) Scale else 0L)
    for (_ <- 1 to rounds) {
      val vLit = array(v.map(lit).toIndexedSeq: _*)
      val u = xc
        .select(col("xc"),
          aggregate(zip_with(col("xc"), vLit, (a, b) => a * b),
            lit(0L), (acc, t) => acc + t).as("s"))
        .selectExpr("xc", s"${tdivSql("s", Scale)} AS sq")
        .select(posexplode(col("xc")).as(Seq("j", "x")), col("sq"))
        .groupBy("j")
        .agg(sum((col("sq") * col("x")).cast("decimal(38,0)")).as("u"))
        .collect()
        .map(r => r.getAs[Int]("j") ->
          r.getAs[java.math.BigDecimal]("u").longValueExact()).toMap
      val us = Array.tabulate(d)(j => tdiv(u(j), Scale))
      // fixed-order double fold (ascending dim) — the oracle's
      // list_reduce replays the identical sequence of IEEE ops
      val norm = math.sqrt(
        us.map(x => x.toDouble * x).reduceLeft(_ + _))
      require(norm > 0, "power iteration collapsed to the zero vector " +
        "(degenerate input: all rows equal the mean)")
      v = us.map(x => math.floor(x * (Scale.toDouble / norm) + 0.5).toLong)
    }
    // sign convention: first nonzero component positive
    val j0 = v.indexWhere(_ != 0L)
    if (j0 >= 0 && v(j0) < 0L) v = v.map(x => -x)
    (n, mu, v)
  }

  /** L113b: remove the top `components` principal directions by
    * DEFLATION — the full "all-but-the-top" prescription (the paper
    * removes the top D≈d/100 directions, not just one): each pass
    * fits the current residual table's top direction and projects it
    * out; the de-quantize → re-quantize handoff between passes is
    * EXACT (÷2^20 then ⌊·2^20⌋ is lossless on binary powers), so the
    * composition stays integer-deterministic end to end. Cost is
    * `components` × the single-pass cost — each a handful of d-vector
    * aggregates. Returns (id, processed: array<long>). */
  def removeTopComponents(df: DataFrame, idCol: String, vecCol: String,
                          components: Int, rounds: Int = 3): DataFrame = {
    require(components >= 1, s"need >= 1 component, got $components")
    var cur = df.select(col(idCol).as("id"),
      expr(s"transform($vecCol, e -> CAST(e AS DOUBLE))").as("vec"))
    for (_ <- 1 to components) {
      cur = allButTheTop(cur, "id", "vec", rounds)
        .selectExpr("id",
          s"transform(processed, x -> CAST(x AS DOUBLE) / ${Scale}L) AS vec")
    }
    cur.selectExpr("id",
      s"transform(vec, x -> CAST(FLOOR(x * ${Scale}L) AS BIGINT)) AS processed")
  }

  /** Quantized second-moment sufficient statistics of an embedding
    * frame — the EXACTLY-ADDITIVE state behind the whitening model:
    * rows (i, j, v) with (-2,-2) = n, (-1, j) = Σ xq_j and
    * (i, j) i ≤ j = Σ xq_i·xq_j, all decimal(38,0) so shard/batch
    * folds are plain sums at any scale. d(d+1)/2 + d + 1 rows total
    * (d=64 → 2 145) — bounded model state, never row data. The
    * streaming twin folds these per trigger; [[modelFromMoments]]
    * derives (μ, v) off the state alone. */
  def momentStats(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val xq = quantized(df, idCol, vecCol)
    val pairs = xq.select(posexplode(col("xq")).as(Seq("i", "xi")), col("xq"))
      .select(col("i"), col("xi"), posexplode(col("xq")).as(Seq("j", "xj")))
      .filter(col("i") <= col("j"))
      .groupBy("i", "j")
      .agg(sum((col("xi") * col("xj")).cast("decimal(38,0)")).as("v"))
    val sums = xq.select(posexplode(col("xq")).as(Seq("j", "x")))
      .groupBy("j")
      .agg(sum(col("x").cast("decimal(38,0)")).as("v"))
      .select(lit(-1).as("i"), col("j"), col("v"))
    val n = xq.agg(count(lit(1)).cast("decimal(38,0)").as("v"))
      .select(lit(-2).as("i"), lit(-2).as("j"), col("v"))
    pairs.select("i", "j", "v").unionByName(sums).unionByName(n)
  }

  /** Derive the whitening model (n, μq, vq) from folded moment rows —
    * a DRIVER-side power iteration on the d×d centered second-moment
    * matrix (bounded: d² longs), so the streaming path never replays
    * row history. Deterministic: the matrix entries are exact
    * integers, iteration order is fixed. Direction quality matches
    * the batch [[fit]] (same operator, same seed, same rounds — the
    * spec gates alignment); bit-level equality is NOT promised: fit
    * truncates per-row projections, this iterates on exact moments. */
  def modelFromMoments(moments: Seq[(Int, Int, BigDecimal)],
                       rounds: Int = 3): (Long, Array[Long], Array[Long]) = {
    val n = moments.collectFirst { case (-2, -2, v) => v.toLongExact }
      .getOrElse(throw new IllegalArgumentException("missing n row (-2,-2)"))
    require(n > 0, "empty moment state")
    val d = moments.collect { case (-1, j, _) => j }.max + 1
    val sx = Array.ofDim[Long](d)
    moments.foreach { case (-1, j, v) => sx(j) = v.toLongExact; case _ => }
    val sxx = Array.ofDim[BigDecimal](d, d)
    for (i <- 0 until d; j <- 0 until d) sxx(i)(j) = BigDecimal(0)
    moments.foreach {
      case (i, j, v) if i >= 0 => sxx(i)(j) = v; sxx(j)(i) = v
      case _ =>
    }
    val mu = Array.tabulate(d)(j => tdiv(sx(j), n))
    // centered moment matrix (integer-exact): C_ij = Σ(x_i x_j)
    //   − μ_i Σx_j − μ_j Σx_i + n μ_i μ_j
    val c = Array.tabulate(d, d) { (i, j) =>
      (sxx(i)(j) - BigDecimal(mu(i)) * sx(j) - BigDecimal(mu(j)) * sx(i)
        + BigDecimal(n) * mu(i) * mu(j)).toDouble
    }
    var v = Array.tabulate(d)(j => if (j == 0) 1.0 else 0.0)
    for (_ <- 1 to rounds) {
      val u = Array.tabulate(d)(i =>
        (0 until d).map(j => c(i)(j) * v(j)).reduceLeft(_ + _))
      val norm = math.sqrt(u.map(x => x * x).reduceLeft(_ + _))
      require(norm > 0, "power iteration collapsed to the zero vector " +
        "(degenerate state: all rows equal the mean)")
      v = u.map(_ / norm)
    }
    var vq = v.map(x => math.floor(x * Scale + 0.5).toLong)
    val j0 = vq.indexWhere(_ != 0L)
    if (j0 >= 0 && vq(j0) < 0L) vq = vq.map(x => -x)
    (n, mu, vq)
  }

  /** The processed table: out_i = (xq_i − μ) − ⌊s'_i·v / 2^20⌋ with
    * s'_i the quantized projection of the centered row on the top
    * direction — integer end to end, so the output hash-oracles.
    * Returns (id, processed: array<long>, proj_q: long). */
  def allButTheTop(df: DataFrame, idCol: String, vecCol: String,
                   rounds: Int = 3): DataFrame = {
    val (_, mu, v) = fit(df, idCol, vecCol, rounds)
    val muLit = array(mu.map(lit).toIndexedSeq: _*)
    val vLit = array(v.map(lit).toIndexedSeq: _*)
    quantized(df, idCol, vecCol)
      .select(col("id"),
        zip_with(col("xq"), muLit, (a, b) => a - b).as("xc"))
      .select(col("id"), col("xc"),
        aggregate(zip_with(col("xc"), vLit, (a, b) => a * b),
          lit(0L), (acc, t) => acc + t).as("s"))
      .selectExpr("id", "xc", s"${tdivSql("s", Scale)} AS proj_q")
      .selectExpr("id",
        s"zip_with(xc, array(${v.mkString("L, ")}L), (c, vj) -> " +
          s"c - (${tdivSql("proj_q * vj", Scale)})) AS processed",
        "proj_q")
  }
}
