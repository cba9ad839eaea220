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

  test("pointInTime: half-open validity, holes null out, before-first null") {
    // dim history for key 1: v1 [10, 20), v2 [20, 30), HOLE [30, 50),
    // v3 [50, null) — a deliberately non-tiled history
    val dims = Seq(
      (1L, 1L, "a", 10L, Some(20L)),
      (1L, 2L, "b", 20L, Some(30L)),
      (1L, 3L, "c", 50L, None: Option[Long])
    ).toDF("k", "version", "attr", "valid_from", "valid_to")
    val facts = Seq(
      (1L, 100L, 5L),   // before first version -> null
      (1L, 101L, 10L),  // == v1.valid_from -> v1 (inclusive start)
      (1L, 102L, 19L),  // inside v1
      (1L, 103L, 20L),  // == v1.valid_to -> v2 (exclusive end)
      (1L, 104L, 35L),  // in the HOLE -> null, not v2
      (1L, 105L, 50L),  // v3 start
      (1L, 106L, 999L), // open current version
      (2L, 107L, 15L)   // key with no history -> null
    ).toDF("k", "fid", "t")
    val out = AsOf.pointInTime(facts, dims, Seq("k"), "t",
        "valid_from", "valid_to", Seq("version", "attr"))
      .collect()
      .map(r => r.getAs[Long]("fid") ->
        Option(r.getAs[java.lang.Long]("pit_version")).map(_.toLong)).toMap
    assert(out == Map(
      100L -> None, 101L -> Some(1L), 102L -> Some(1L), 103L -> Some(2L),
      104L -> None, 105L -> Some(3L), 106L -> Some(3L), 107L -> None))
    // attr payload nulls in lockstep with version
    val attrs = AsOf.pointInTime(facts, dims, Seq("k"), "t",
        "valid_from", "valid_to", Seq("version", "attr"))
      .collect()
      .map(r => r.getAs[Long]("fid") ->
        Option(r.getAs[String]("pit_attr"))).toMap
    assert(attrs(104L).isEmpty && attrs(103L).contains("b") &&
      attrs(106L).contains("c"))
    // partition invariance
    val rep = AsOf.pointInTime(facts.repartition(5), dims.repartition(3),
        Seq("k"), "t", "valid_from", "valid_to", Seq("version", "attr"))
      .collect()
      .map(r => r.getAs[Long]("fid") ->
        Option(r.getAs[java.lang.Long]("pit_version")).map(_.toLong)).toMap
    assert(rep == out)
  }

  test("attribution: window bounds, tie rule, unattributed fallback") {
    import spark.implicits._
    import graft.operators.AsOf
    val clicks = Seq((1L, 101L, 10L), (1L, 102L, 20L), (1L, 103L, 30L),
      (1L, 107L, 40L), (1L, 108L, 40L), (2L, 201L, 100L))
      .toDF("u", "id", "ts")
    val purchases = Seq((1L, 901L, 25L), (1L, 902L, 35L), (1L, 903L, 5L),
      (1L, 904L, 41L), (2L, 905L, 90L)).toDF("u", "id", "ts")
    val out = AsOf.attribution(purchases, clicks, Seq("u"),
        "ts", "id", "ts", "id", lookback = 15L)
      .collect().map(r => r.getLong(1) -> r.toSeq.drop(3)).toMap
    // 901 @25, window [11,25]: click 20 only
    assert(out(901L) == Seq(1L, 102L, 20L, 102L, 20L), s"${out(901L)}")
    // 902 @35, window [21,35]: click 30 only (20 fell out)
    assert(out(902L) == Seq(1L, 103L, 30L, 103L, 30L), s"${out(902L)}")
    // 903 @5: nothing before it → zero-touch fallback
    assert(out(903L) == Seq(0L, -1L, -1L, -1L, -1L), s"${out(903L)}")
    // 904 @41, window [27,41]: clicks 30, and the 40/40 tie — first
    // is the earliest ts (30), last breaks the equal-ts tie HIGH (108)
    assert(out(904L) == Seq(3L, 103L, 30L, 108L, 40L), s"${out(904L)}")
    // keys separate users; user 2's click at 100 is in 905's future
    assert(out(905L) == Seq(0L, -1L, -1L, -1L, -1L), s"${out(905L)}")
    // a wider lookback picks up the full history (first = 10)
    val wide = AsOf.attribution(purchases, clicks, Seq("u"),
        "ts", "id", "ts", "id", lookback = 30L)
      .collect().map(r => r.getLong(1) -> r.toSeq.drop(3)).toMap
    assert(wide(902L) == Seq(3L, 101L, 10L, 103L, 30L), s"${wide(902L)}")
    // partition invariance
    val a = AsOf.attribution(purchases.repartition(5), clicks.repartition(3),
        Seq("u"), "ts", "id", "ts", "id", lookback = 15L)
      .orderBy("conv_id").collect().map(_.toSeq)
    val b = AsOf.attribution(purchases, clicks, Seq("u"),
        "ts", "id", "ts", "id", lookback = 15L)
      .orderBy("conv_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
