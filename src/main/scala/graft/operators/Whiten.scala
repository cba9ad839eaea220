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
