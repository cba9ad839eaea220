package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed prefix sums (SURVEY §2 L20/L63d supporting kernel).
  *
  * A running total under a global (or per-group) order is the one
  * aggregate Spark's Window cannot compute scale-free: an ORDER BY
  * window with no partition key plans as a single-partition sort, so
  * the frame's entire row count funnels through one task. The fix is
  * the classic two-level scan (Blelloch '90): cumsum WITHIN
  * order-aligned buckets (widest task = one bucket), then add each
  * bucket's exclusive offset — B bucket totals, prefix-summed where B
  * rows are trivially cheap (driver broadcast for a global sum, a
  * B-row window per group for a keyed one). The result is provably
  * identical to the one-ORDER-BY formulation, which is exactly what
  * the DuckDB oracles run — same cum values, different plan.
  *
  * [[Pack.assignShards]] inlines this pattern for token packing; this
  * object is the reusable form for the walk/negative-sampling chain
  * (and any future cumulative-weight table).
  */
object PrefixSum {

  /** GLOBAL inclusive prefix sum of `valueCol` (long) under the total
    * order `orderCols`, returned as `outCol`.
    *
    * `bucket` must be order-aligned with `orderCols` (a <= b under the
    * order implies bucket(a) <= bucket(b)) and non-null — e.g. a
    * leading substring for a string key, a range cell for a numeric
    * one. Cost beyond the within-bucket window: one B-row collect
    * (bucket totals, prefix-summed on the driver) and one broadcast
    * join — the [[Pack]] recipe. */
  def bucketed(df: DataFrame, orderCols: Seq[String], valueCol: Column,
               bucket: Column, outCol: String = "cum"): DataFrame = {
    val b = df.withColumn("__ps_v", valueCol.cast("long"))
      .withColumn("__ps_bkt", bucket)
    val wIn = Window.partitionBy("__ps_bkt")
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumIn = b.withColumn("__ps_in", sum(col("__ps_v")).over(wIn))
    // bucket totals -> exclusive offsets: B rows, driver-side prefix.
    // orderBy before collect so the driver sees the ENGINE's bucket
    // order (no Scala-side comparator to drift from Spark's collation)
    val tots = b.groupBy("__ps_bkt").agg(sum(col("__ps_v")).as("__ps_t"))
      .orderBy("__ps_bkt").collect()
    var acc = 0L
    val offRows: Seq[Row] = tots.toSeq.map { r =>
      require(!r.isNullAt(0),
        "prefix-sum bucket must be non-null (null keys would drop " +
          "rows at the offsets join)")
      val out = Row(r.get(0), acc); acc += r.getLong(1); out
    }
    val spark = df.sparkSession
    val schema = StructType(Seq(
      cumIn.schema("__ps_bkt").copy(nullable = false),
      StructField("__ps_off", LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    val offs = spark.createDataFrame(offRows.asJava, schema)
    cumIn.join(broadcast(offs), Seq("__ps_bkt"))
      .withColumn(outCol, col("__ps_off") + col("__ps_in"))
      .drop("__ps_v", "__ps_bkt", "__ps_in", "__ps_off")
  }

  /** [[bucketed]] for TWO value columns in one pass: one within-bucket
    * window scan, one B-row totals collect, one broadcast join — the
    * two-sided CDF shape (ksDrift/rankSumDrift) previously paid the
    * whole ladder twice. Values identical to two bucketed() calls. */
  def bucketed2(df: DataFrame, orderCols: Seq[String],
                v1: Column, out1: String, v2: Column, out2: String,
                bucket: Column): DataFrame = {
    val b = df.withColumn("__ps_v1", v1.cast("long"))
      .withColumn("__ps_v2", v2.cast("long"))
      .withColumn("__ps_bkt", bucket)
    val wIn = Window.partitionBy("__ps_bkt")
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumIn = b
      .withColumn("__ps_in1", sum(col("__ps_v1")).over(wIn))
      .withColumn("__ps_in2", sum(col("__ps_v2")).over(wIn))
    val tots = b.groupBy("__ps_bkt")
      .agg(sum(col("__ps_v1")).as("__ps_t1"), sum(col("__ps_v2")).as("__ps_t2"))
      .orderBy("__ps_bkt").collect()
    var acc1 = 0L; var acc2 = 0L
    val offRows: Seq[Row] = tots.toSeq.map { r =>
      require(!r.isNullAt(0),
        "prefix-sum bucket must be non-null (null keys would drop " +
          "rows at the offsets join)")
      val out = Row(r.get(0), acc1, acc2)
      acc1 += r.getLong(1); acc2 += r.getLong(2); out
    }
    val spark = df.sparkSession
    val schema = StructType(Seq(
      cumIn.schema("__ps_bkt").copy(nullable = false),
      StructField("__ps_off1", LongType, nullable = false),
      StructField("__ps_off2", LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    val offs = spark.createDataFrame(offRows.asJava, schema)
    cumIn.join(broadcast(offs), Seq("__ps_bkt"))
      .withColumn(out1, col("__ps_off1") + col("__ps_in1"))
      .withColumn(out2, col("__ps_off2") + col("__ps_in2"))
      .drop("__ps_v1", "__ps_v2", "__ps_bkt",
        "__ps_in1", "__ps_in2", "__ps_off1", "__ps_off2")
  }

  /** PER-GROUP inclusive prefix sum: cum of `valueCol` within each
    * `partCols` group under `orderCols`, as `outCol`; also emits the
    * group total as `totCol` (both sides of the pick-containment test
    * need it). Fully distributed — no driver collect: bucket offsets
    * come from a window over the per-group bucket-totals frame (<= B
    * rows per group), joined back on (partCols, bucket). Widest window
    * partition anywhere = one bucket of one group, so a skewed group
    * (a hub node's neighbor list) spreads over ~groupRows/B tasks
    * instead of serializing. */
  def keyed(df: DataFrame, partCols: Seq[String], orderCols: Seq[String],
            valueCol: Column, bucket: Column, outCol: String = "cum",
            totCol: String = "tot"): DataFrame = {
    val b = df.withColumn("__ps_v", valueCol.cast("long"))
      .withColumn("__ps_bkt", bucket)
    val wIn = Window
      .partitionBy((partCols :+ "__ps_bkt").map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumIn = b.withColumn("__ps_in", sum(col("__ps_v")).over(wIn))
    val wOff = Window.partitionBy(partCols.map(col): _*)
      .orderBy("__ps_bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(partCols.map(col): _*)
    val offs = b.groupBy((partCols :+ "__ps_bkt").map(col): _*)
      .agg(sum(col("__ps_v")).as("__ps_t"))
      .withColumn("__ps_off",
        coalesce(sum(col("__ps_t")).over(wOff), lit(0L)))
      .withColumn(totCol, sum(col("__ps_t")).over(wTot))
      .drop("__ps_t")
    cumIn.join(offs, partCols :+ "__ps_bkt")
      .withColumn(outCol, col("__ps_off") + col("__ps_in"))
      .drop("__ps_v", "__ps_bkt", "__ps_in", "__ps_off")
  }
}
