package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Double, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getLong(4))).toSeq

  test("salted equals plain: sessions crossing bucket boundaries") {
    // gap=100, bucket=1000 (nanos): a session continues across the
    // 990->1010 boundary; a mid-bucket gap starts a new session
    val ev = Seq(
      (1L, 1L, 990L, 1.0), (1L, 2L, 1010L, 2.0),   // one session, spans buckets
      (1L, 3L, 1500L, 3.0),                          // gap 490 > 100: new session
      (1L, 4L, 1550L, 4.0),
      (2L, 5L, 5L, 9.0))                             // other user untouched
      .toDF("user_id", "event_id", "ts", "value")
    val p = rows(Sessionize.plain(ev, "user_id", 100L))
    val s = rows(Sessionize.salted(ev, "user_id", 100L, 1000L))
    assert(p == s)
    assert(p.map(t => (t._1, t._2, t._3)) ==
      Seq((1L, 1L, 2L), (1L, 2L, 2L), (2L, 1L, 1L)))
  }

  test("salted equals plain: session spanning entirely empty buckets") {
    // gap=2500 > bucket=1000: events in buckets 0 and 2 stay one
    // session while buckets 1 is empty; a wider silence still splits
    val ev = Seq(
      (7L, 1L, 500L, 1.0), (7L, 2L, 2900L, 1.0),    // diff 2400 < 2500: same session
      (7L, 3L, 9000L, 1.0))                          // diff 6100 > 2500: new session
      .toDF("user_id", "event_id", "ts", "value")
    val p = rows(Sessionize.plain(ev, "user_id", 2500L))
    val s = rows(Sessionize.salted(ev, "user_id", 2500L, 1000L))
    assert(p == s)
    assert(p.map(t => (t._1, t._2, t._3)) == Seq((7L, 1L, 2L), (7L, 2L, 1L)))
  }

  test("salted equals plain on the hot-keyed events table") {
    val ev = Sessionize.hotKeyed(table("events"), "user_id")
    val p = rows(Sessionize.plain(ev, "user_id", 60000000000L))
    val s = rows(Sessionize.salted(ev, "user_id", 60000000000L, 3600000000000L))
    assert(p.nonEmpty && p == s)
  }
}
