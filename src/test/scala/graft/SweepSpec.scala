package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Sweep

/** R39 distributed sweep line: bucketed prefix sum ≡ the single-task
  * global window, and interval concurrency on hand-checked layouts. */
class SweepSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed running sum equals the single-window global sum") {
    val deltas = table("events")
      .select(col("ts"), when(col("event_id") % 2 === 0, 1L).otherwise(-1L)
        .as("delta"))
    val dist = Sweep.runningSum(deltas, "ts", "delta", 3600000000000L)
    // single-task reference (fine at spec scale, the thing to avoid at 100 TB)
    val w = Window.orderBy(col("ts"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = deltas.withColumn("running", sum("delta").over(w))
    // per-(ts,delta) multiset of running values must agree
    def key(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("ts", "delta")
      .agg(sort_array(collect_list("running")).as("rs"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getSeq[Long](2)).toMap
    assert(key(dist) == key(ref))
  }

  test("concurrency: hand-computed peaks, touching intervals overlap") {
    val day = 100L // tiny bucket for readability
    val iv = Seq(
      (0L, 10L),    // A
      (5L, 20L),    // B overlaps A -> peak 2
      (20L, 30L),   // C touches B's end: +1 sweeps first -> 2 concurrent
      (250L, 260L)) // D alone in bucket 2
      .toDF("s", "e")
    val got = Sweep.concurrency(iv, "s", "e", day)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // bucket 0: peak 2 (A∩B and B∩C at ts=20), all closed by 30 -> eod 0
    // bucket 2: peak 1, eod 0
    assert(got == Seq((0L, 2L, 0L), (2L, 1L, 0L)))
  }

  test("concurrency: interval spanning buckets raises the later bucket's floor") {
    val iv = Seq((0L, 350L), (120L, 130L)).toDF("s", "e")
    val got = Sweep.concurrency(iv, "s", "e", 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // bucket 0: open A -> peak 1, eod 1; bucket 1: B inside A -> peak 2,
    // eod 1; bucket 3: only A's close (-1) -> running 0 there, eod 0
    assert(got == Seq((0L, 1L, 1L), (1L, 2L, 1L), (3L, 0L, 0L)))
  }
}
