package graft

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed range join: overlaps, boundaries, misses — each match once") {
    val points = Seq((1L, 10L, 100L), (1L, 11L, 250L), (1L, 12L, 999L),
        (2L, 13L, 100L))
      .toDF("k", "pt_id", "ts")
    val intervals = Seq(
      (1L, 100L, 50L, 260L),   // contains pts 10 and 11
      (1L, 101L, 240L, 900L),  // overlaps the first; contains pt 11
      (1L, 102L, 100L, 100L),  // degenerate [100,100]: boundary hit on pt 10
      (2L, 103L, 500L, 600L))  // contains nothing
      .toDF("k", "iv_id", "start_ts", "end_ts")
    // bucket (10) much smaller than interval lengths: heavy explode path
    val out = RangeJoin.byBucket(points, intervals, Seq("k"),
        "ts", "start_ts", "end_ts", bucketSize = 10L)
      .select("pt_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((10L, 100L), (10L, 102L), (11L, 100L), (11L, 101L)))
    // and each match exactly once (Set comparison above plus count)
    val n = RangeJoin.byBucket(points, intervals, Seq("k"),
      "ts", "start_ts", "end_ts", bucketSize = 10L).count()
    assert(n == 4)
    // coarse bucket (wider than everything): same result
    val coarse = RangeJoin.byBucket(points, intervals, Seq("k"),
        "ts", "start_ts", "end_ts", bucketSize = 100000L)
      .select("pt_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(coarse == out)
  }
}
