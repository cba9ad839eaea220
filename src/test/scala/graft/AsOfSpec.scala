package graft

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asof join: latest at-or-before, inclusive ties, unmatched nulls") {
    val left = Seq((1L, 10L, 100L, 1.0), (1L, 11L, 50L, 2.0), (2L, 12L, 10L, 3.0))
      .toDF("k", "event_id", "ts", "v")
    val right = Seq((1L, 1L, 40L, 9.0), (1L, 2L, 100L, 8.0), (1L, 3L, 100L, 7.0))
      .toDF("k", "event_id", "ts", "v")
    val out = AsOf.join(left, right, Seq("k"), "ts", "ts", "event_id",
        Seq("event_id", "v"), outPrefix = "m_")
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(1), Option(r.get(4)), Option(r.get(5))))
      .toSeq
    assert(out == Seq(
      (10L, Some(3L), Some(7.0)), // two right rows at ts=100: max tie wins
      (11L, Some(1L), Some(9.0)), // strictly-before match
      (12L, None, None)))         // no right rows for k=2
  }

  test("asof tolerance expires matches older than the bound") {
    val left = Seq((1L, 10L, 100L, 1.0), (1L, 11L, 50L, 2.0))
      .toDF("k", "event_id", "ts", "v")
    val right = Seq((1L, 1L, 40L, 9.0), (1L, 2L, 98L, 8.0))
      .toDF("k", "event_id", "ts", "v")
    val out = AsOf.join(left, right, Seq("k"), "ts", "ts", "event_id",
        Seq("event_id"), outPrefix = "m_", tolerance = 5L)
      .orderBy("event_id")
      .collect().map(r => (r.getLong(1), Option(r.get(4)))).toSeq
    assert(out == Seq(
      (10L, Some(2L)), // ts 100 - 98 = 2 <= 5: kept
      (11L, None)))    // ts 50 - 40 = 10 > 5: expired
  }
}
