package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Output-layout control — the small-files/giant-files problem that
  * dominates 100 TB table maintenance. `partitionBy` alone emits one
  * file per (task × partition-value); with hundreds of tasks touching
  * every value that's a small-files explosion, and with a pre-shuffle
  * on the partition column alone it's one giant file per value (plus
  * full key skew). The fix: repartition on (partition values, a
  * deterministic id-hash bucket) so every partition directory gets
  * exactly `filesPerPartition` writer tasks — bounded file count AND
  * bounded file size, no RNG (re-runs produce identical layouts).
  */
object Layout {

  /** Write `df` partitioned by `partCols` with a bounded, deterministic
    * number of files per partition directory. */
  def writeSized(df: DataFrame, path: String, partCols: Seq[String],
                 filesPerPartition: Int, idCol: String): Unit = {
    val bucketed = df.withColumn("__file_bucket",
      pmod(xxhash64(col(idCol)), lit(filesPerPartition)))
    bucketed
      .repartition((partCols :+ "__file_bucket").map(col): _*)
      .drop("__file_bucket")
      .write.mode("overwrite")
      .partitionBy(partCols: _*)
      .parquet(path)
  }

  /** R24c: idempotent partition backfill — recompute ONE partition's
    * data and splice it into an existing partitioned table without
    * touching the others (the daily-reprocessing move: a bug fix or
    * late data invalidates day=X; rewriting the whole table at 100 TB
    * is a non-starter, and a plain `overwrite` would DELETE every
    * other day). Uses dynamic partition overwrite: only the partition
    * values present in `slice` are replaced. The write is idempotent —
    * re-running the same backfill rewrites the same directories to the
    * same content. `slice` must carry `partCols`; pass it through
    * [[writeSized]]-style bucketing upstream if file-count bounds
    * matter for the backfilled day. */
  def backfillPartitions(slice: DataFrame, path: String,
                         partCols: Seq[String],
                         filesPerPartition: Int, idCol: String): Unit = {
    val bucketed = slice.withColumn("__file_bucket",
      pmod(xxhash64(col(idCol)), lit(filesPerPartition)))
    bucketed
      .repartition((partCols :+ "__file_bucket").map(col): _*)
      .drop("__file_bucket")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*)
      .parquet(path)
  }

  /** Morton/Z-value of two bucketized dimensions: bit i of `x` lands at
    * z-bit 2i, bit i of `y` at 2i+1. Inputs must already be in
    * [0, 2^bits). Pure long bit ops — whole-stage codegen'd. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** Morton/Z-value of THREE bucketized dimensions: bit i of x/y/z
    * lands at z-bit 3i / 3i+1 / 3i+2. Inputs in [0, 2^bits),
    * bits ≤ 20 (3·bits ≤ 62 keeps the interleave in a long). */
  def zValue3(x: Column, y: Column, z: Column, bits: Int): Column = {
    require(bits <= 20, s"3-dim interleave overflows a long past 20 bits, got $bits")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (3 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (3 * i + 1)) +
        shiftright(z, i).bitwiseAND(lit(1L)) * lit(1L << (3 * i + 2))
    }.reduce(_ + _)
  }

  /** Z-order clustered write. A linear sort on one column gives tight
    * per-file min/max stats for that column only; interleaving the bits
    * of BOTH columns (scaled into 2^bits range buckets from
    * driver-collected min/max — two scalar aggregates, no sample RNG)
    * and sorting by the Morton key bounds the per-file range of *each*
    * dimension by ~2^-floor(log4 files), so parquet row-group pruning
    * works for predicates on either column. This is the standard
    * data-layout move for multi-dimensional scan pruning at 100 TB
    * (one shuffle: the range partition on the z-key). */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    numFiles: Int, bits: Int = 16): Unit =
    writeCurveOrdered(df, path, xCol, yCol, numFiles, bits,
      (x, y) => zValue(x, y, bits))

  /** R24e: Hilbert-curve clustered write — same contract and cost as
    * [[writeZOrdered]] (two scalar aggregates + ONE range-partition
    * shuffle on the curve key) with a better locality constant:
    * consecutive Hilbert distances are always ADJACENT cells, so each
    * range-partitioned file covers one compact blob of the (x, y)
    * plane, where the Z curve's corner jumps let a file's bounding box
    * span whole quadrants. Same per-file min/max pruning mechanism,
    * tighter boxes (LayoutSpec measures both). */
  def writeHilbertOrdered(df: DataFrame, path: String, xCol: String,
                          yCol: String, numFiles: Int,
                          bits: Int = 16): Unit =
    writeCurveOrdered(df, path, xCol, yCol, numFiles, bits,
      (x, y) => graft.functions.hilbert_d2(x, y, bits))

  private def writeCurveOrdered(df: DataFrame, path: String, xCol: String,
                                yCol: String, numFiles: Int, bits: Int,
                                curve: (Column, Column) => Column): Unit = {
    val Seq(xLo, xHi, yLo, yHi) =
      df.agg(min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
          min(col(yCol)).cast("double"), max(col(yCol)).cast("double"))
        .head().toSeq.map(_.asInstanceOf[Double])
    val n = (1L << bits) - 1
    def scaled(c: String, lo: Double, hi: Double): Column = {
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(lit(n), floor((col(c).cast("double") - lo) / span * (n + 1)).cast("long"))
    }
    df.withColumn("__z", curve(scaled(xCol, xLo, xHi), scaled(yCol, yLo, yHi)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** THREE-dimensional clustered writes — the write path for the
    * R24d/R24f ordering keys: per-file min/max of all three predicate
    * columns stay bounded. `curve` selects the key: `"hilbert"`
    * (Skilling — adjacency in all dims, tightest boxes) or `"z"`
    * (Morton interleave). Same cost shape as the 2-D writer: three
    * scalar aggregates + ONE range-partition shuffle. bits <= 20. */
  def writeCurve3Ordered(df: DataFrame, path: String, xCol: String,
                         yCol: String, zCol: String, numFiles: Int,
                         bits: Int = 8, curve: String = "hilbert"): Unit = {
    require(curve == "hilbert" || curve == "z", s"unknown curve $curve")
    require(bits <= 20, s"3-dim keys overflow a long past 20 bits, got $bits")
    val Seq(xLo, xHi, yLo, yHi, zLo, zHi) =
      df.agg(min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
          min(col(yCol)).cast("double"), max(col(yCol)).cast("double"),
          min(col(zCol)).cast("double"), max(col(zCol)).cast("double"))
        .head().toSeq.map(_.asInstanceOf[Double])
    val n = (1L << bits) - 1
    def scaled(c: String, lo: Double, hi: Double): Column = {
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(lit(n), floor((col(c).cast("double") - lo) / span * (n + 1)).cast("long"))
    }
    val sx = scaled(xCol, xLo, xHi)
    val sy = scaled(yCol, yLo, yHi)
    val sz = scaled(zCol, zLo, zHi)
    val key =
      if (curve == "hilbert") graft.functions.hilbert_d3(sx, sy, sz, bits)
      else zValue3(sx, sy, sz, bits)
    df.withColumn("__c", key)
      .repartitionByRange(numFiles, col("__c"))
      .sortWithinPartitions("__c")
      .drop("__c")
      .write.mode("overwrite").parquet(path)
  }
}
