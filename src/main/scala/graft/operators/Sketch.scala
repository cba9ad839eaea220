package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R17f: mergeable power-of-2 log-histogram quantile sketch — the
  * HdrHistogram/DDSketch idea at γ=2, stripped to builtins so it is
  * integer-exact and hash-oracle-able (which log-γ bucketing, via libm
  * log, is not). Bucket = bit length of the non-negative long value
  * (length(bin(v)): 0 → 1, v > 0 → floor(log2 v)+1) — pure
  * integer/string builtins, bit-identical on any engine.
  *
  * The sketch is a ≤ 63-row (bucket, n) frame. Error model: a
  * quantile's true value lies in the reported [lo, hi] bucket bounds,
  * so the estimate is within 2× of truth (relative) — the right trade
  * for monitoring latency/size/price distributions at corpus scale.
  *
  * Scale shape: the ONLY corpus-size work is one groupBy over ≤ 63
  * keys — low cardinality means map-side partial aggregation collapses
  * every task's output to ≤ 63 rows before the (trivial) shuffle; hot
  * buckets cannot skew a reducer because partials already absorbed
  * them. Shard sketches MERGE BY ADDITION ([[merge]]), so per-shard /
  * per-day sketches roll up without rescanning anything — the same
  * contract as the count-min and Space-Saving aggregates (R17d/R17e).
  * Everything after the build touches sketch-sized frames only.
  */
object Sketch {

  /** Build the sketch: one (bucket, n) row per occupied bucket.
    * `valueCol` must be integral (cast upstream; floor-quantize
    * doubles) and ≥ 0 — negatives raise rather than silently folding
    * into a sign-bit bucket. */
  def logHistogram(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("long")
    df.select(
        when(v < 0, raise_error(concat(
            lit("logHistogram: negative value "), v.cast("string"))))
          .otherwise(length(bin(v)))
          .cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
  }

  /** Merge shard sketches: counts add (union + re-agg over ≤ 63 keys).
    * merge(build(A), build(B)) ≡ build(A ∪ B) exactly — hash-proven by
    * q_quantile_sketch's single-pass oracle. */
  def merge(hs: DataFrame*): DataFrame = {
    require(hs.nonEmpty, "merge needs at least one sketch")
    hs.reduce(_ unionByName _).groupBy("bucket").agg(sum("n").as("n"))
  }

  /** Grouped build: one (key, bucket, n) row per occupied (key,
    * bucket) — the per-service-latency / per-type-size monitoring
    * shape. Same scale contract as [[logHistogram]]: the corpus-size
    * work is one groupBy over |keys| · ≤ 63 cells with map-side
    * partials; grouped sketches also merge by addition ([[mergeBy]]).
    */
  def logHistogramBy(df: DataFrame, keyCol: String,
                     valueCol: String): DataFrame = {
    val v = col(valueCol).cast("long")
    df.select(col(keyCol).as("key"),
        when(v < 0, raise_error(concat(
            lit("logHistogramBy: negative value "), v.cast("string"))))
          .otherwise(length(bin(v)))
          .cast("long").as("bucket"))
      .groupBy("key", "bucket").agg(count(lit(1)).as("n"))
  }

  /** Merge grouped shard sketches: counts add per (key, bucket). */
  def mergeBy(hs: DataFrame*): DataFrame = {
    require(hs.nonEmpty, "mergeBy needs at least one sketch")
    hs.reduce(_ unionByName _).groupBy("key", "bucket").agg(sum("n").as("n"))
  }

  /** Per-key quantile probes — [[quantiles]]' integer rank rule inside
    * each key's own cumulative window. The input is sketch-sized
    * (|keys| · ≤ 63 rows), so the per-row probe explosion is frame
    * work, not corpus work. */
  def quantilesBy(hist: DataFrame, perMille: Seq[Int]): DataFrame = {
    require(perMille.nonEmpty && perMille.forall(q => q >= 1 && q <= 1000),
      s"per-mille ranks must be in [1, 1000], got $perMille")
    hist
      .withColumn("cum", sum("n").over(
        Window.partitionBy("key").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("total", sum("n").over(Window.partitionBy("key")))
      .withColumn("q", explode(array(perMille.distinct.sorted.map(lit): _*)))
      .filter(col("cum") >= expr("(q * total + 999L) div 1000L"))
      .groupBy("key", "q").agg(min("bucket").as("bucket"))
      .select(col("key"), col("q").cast("long").as("q"), col("bucket"),
        when(col("bucket") === 1, 0L)
          .otherwise(expr("shiftleft(1L, cast(bucket - 1 as int))")).as("lo"),
        when(col("bucket") >= 63, lit(Long.MaxValue))
          .otherwise(expr("shiftleft(1L, cast(bucket as int)) - 1L")).as("hi"))
  }

  /** Probe quantiles at per-mille ranks (500 = median, 999 = p99.9 —
    * integer ranks, never a double fraction): for each q the smallest
    * bucket whose cumulative count reaches ceil(q·N/1000), with its
    * value bounds lo = 2^(b-1) (0 for b = 1) and hi = 2^b − 1. The
    * input is a sketch (≤ 63 rows), so the unpartitioned windows here
    * are frame-sized, not corpus-sized. Empty sketch → empty result. */
  def quantiles(hist: DataFrame, perMille: Seq[Int]): DataFrame = {
    require(perMille.nonEmpty && perMille.forall(q => q >= 1 && q <= 1000),
      s"per-mille ranks must be in [1, 1000], got $perMille")
    val cum = hist
      .withColumn("cum", sum("n").over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("total", sum("n").over(
        Window.orderBy(lit(1)).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    val probes = hist.sparkSession.range(1)
      .select(explode(array(perMille.distinct.sorted.map(lit): _*)).as("q"))
    probes
      .join(cum, col("cum") >= expr("(q * total + 999L) div 1000L"))
      .groupBy("q").agg(min("bucket").as("bucket"))
      .select(col("q").cast("long").as("q"), col("bucket"),
        when(col("bucket") === 1, 0L)
          .otherwise(expr("shiftleft(1L, cast(bucket - 1 as int))")).as("lo"),
        when(col("bucket") >= 63, lit(Long.MaxValue))
          .otherwise(expr("shiftleft(1L, cast(bucket as int)) - 1L")).as("hi"))
  }

  /** R49: corpus-overlap matrix via Theta set-operation sketches —
    * the release-to-release question HLL structurally cannot answer:
    * |A ∩ B| ("how much do releases/sources share"), |A \ B| ("how
    * much is new"), and the Jaccard they imply, WITHOUT ever joining
    * the underlying sets. One corpus pass builds a sketch per group
    * (map-side combined partial aggregation); everything after —
    * pairwise intersections, differences, unions — happens on the
    * S-row sketch frame (S² pairs of kilobyte sketches; corpus size
    * is GONE from the cost model, the L85b discipline with exact-set
    * semantics instead of shingle resemblance). Sketches persist and
    * merge, so per-day sketches answer any release pair forever.
    *
    * Exact regime (the oracle trick): per-group distinct keys ≤ 2^lgK
    * keeps θ = 1 — every estimate is the exact cardinality and the
    * whole matrix hash-oracles; at 100 TB the same code degrades to
    * the published ~1/√(2^lgK) relative error. */
  /** R50: pre-flight join-size estimation from count-min sketches —
    * |A ⋈_k B| = Σ_k f_A(k)·f_B(k) estimated as the min-over-rows
    * cellwise inner product of the two tables' CM sketches (AGMS /
    * Cormode-Muthukrishnan): an upper bound within ε·N_A·N_B, EXACT
    * whenever one hash row maps both key multisets collision-free.
    * The sizing answer an optimizer (or a human gating a 100 TB
    * join) needs BEFORE running it, from persistable mergeable
    * per-table sketches — per-day sketches vector_sum to any grain,
    * no data joins, no scan at decision time. One map-side-combined
    * pass per table; the product runs on two 1-row sketch frames. */
  def joinSizeEstimate(a: DataFrame, keyA: String, b: DataFrame,
                       keyB: String, depth: Int = 5,
                       width: Int = 2048): DataFrame = {
    import graft.functions._
    val sa = a.agg(
      count_min_agg(col(keyA).cast("string"), depth, width).as("ska"),
      count(col(keyA)).as("n_a"))
    val sb = b.agg(
      count_min_agg(col(keyB).cast("string"), depth, width).as("skb"),
      count(col(keyB)).as("n_b"))
    sa.crossJoin(sb)
      .select(col("n_a"), col("n_b"),
        cm_inner_product(col("ska"), col("skb"), depth, width)
          .as("est_join_rows"))
  }

  def overlapMatrix(df: DataFrame, grpCol: String, keyCol: String,
                    lgK: Int = 14): DataFrame = {
    import graft.functions._
    val sk = df.groupBy(col(grpCol).as("grp"))
      .agg(theta_agg(col(keyCol).cast("string"), lgK).as("sk"))
    val a = sk.select(col("grp").as("grp_a"), col("sk").as("sk_a"))
    val b = sk.select(col("grp").as("grp_b"), col("sk").as("sk_b"))
    a.join(b, col("grp_a") < col("grp_b"))
      .select(col("grp_a"), col("grp_b"),
        theta_estimate(col("sk_a")).as("n_a"),
        theta_estimate(col("sk_b")).as("n_b"),
        theta_estimate(theta_union2(col("sk_a"), col("sk_b"), lgK))
          .as("n_union"),
        theta_estimate(theta_intersect(col("sk_a"), col("sk_b")))
          .as("n_inter"),
        theta_estimate(theta_anotb(col("sk_a"), col("sk_b")))
          .as("n_a_not_b"))
      .withColumn("jaccard_ppm",
        expr("n_inter * 1000000L div greatest(n_union, 1L)"))
  }
}
