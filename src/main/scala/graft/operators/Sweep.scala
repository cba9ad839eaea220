package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed sweep-line primitives (SURVEY.md §2 R39): a GLOBAL
  * event-time running sum without a global sort — the building block
  * for interval-overlap analytics (concurrent sessions, resource
  * occupancy, active-connection profiles).
  *
  * A naive `Window.orderBy(ts)` with no partition key serializes the
  * whole table through ONE task. Here the prefix sum is distributed
  * the same way Pack's shard cutter is:
  *   1. rows bucket on `ts div bucketNs` (order-aligned ranges);
  *   2. one window per bucket computes the within-bucket running sum
  *      in (ts, delta DESC) order — +1s sweep before -1s at equal ts,
  *      so touching intervals count as overlapping;
  *   3. bucket totals (B rows, B = time range / bucketNs) get
  *      exclusive prefix offsets through one tiny window, and come
  *      back via a broadcast-sized join.
  * Every full-size shuffle is keyed on the well-spread bucket id; the
  * only unpartitioned window runs over the B-row bucket summary.
  */
object Sweep {

  /** Adds `running` = global running sum of `deltaCol` in
    * (ts, delta DESC) order. Rows tied on both ts and delta receive
    * the same multiset of running values under any order, so
    * aggregates over `running` (max/min per bucket) are deterministic
    * even though per-row attribution within a tie is not. */
  def runningSum(df: DataFrame, tsCol: String, deltaCol: String,
                 bucketNs: Long): DataFrame = {
    val b = df.withColumn("__bkt", expr(s"$tsCol div ${bucketNs}L"))
    val inBkt = Window.partitionBy("__bkt")
      .orderBy(col(tsCol), col(deltaCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withIn = b.withColumn("__run_in", sum(col(deltaCol)).over(inBkt))
    val offW = Window.orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = b.groupBy("__bkt").agg(sum(col(deltaCol)).as("__tot"))
      .withColumn("__off", coalesce(sum("__tot").over(offW), lit(0L)))
      .select("__bkt", "__off")
    withIn.join(broadcast(offsets), "__bkt")
      .withColumn("running", col("__off") + col("__run_in"))
      .drop("__bkt", "__run_in", "__off")
  }

  /** Interval-concurrency profile: intervals `[startCol, endCol]`
    * (closed — touching intervals overlap) swept into per-bucket
    * `(bucket, peak, eod_active)`: the highest number of concurrently
    * active intervals inside each `bucketNs` bucket, and the active
    * count at the bucket's end. Only buckets containing an interval
    * boundary appear. */
  def concurrency(intervals: DataFrame, startCol: String, endCol: String,
                  bucketNs: Long): DataFrame = {
    val deltas = intervals
      .select(col(startCol).as("ts"), lit(1L).as("delta"))
      .unionByName(intervals.select(col(endCol).as("ts"), lit(-1L).as("delta")))
    val run = runningSum(deltas, "ts", "delta", bucketNs)
      .withColumn("bucket", expr(s"ts div ${bucketNs}L"))
    val peaks = run.groupBy("bucket").agg(max("running").as("peak"))
    val eodW = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val eod = run.groupBy("bucket").agg(sum("delta").as("__ds"))
      .withColumn("eod_active", sum("__ds").over(eodW))
      .select("bucket", "eod_active")
    peaks.join(eod, "bucket").orderBy("bucket")
  }
}
