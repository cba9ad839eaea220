package graft

import graft.operators.LabelSpread

class LabelSpreadSpec extends SparkSpec {
  import spark.implicits._

  test("seeds stay clamped; unlabeled nodes take their neighborhood's label") {
    // two components: {1,2,3} around seed 1 (label 10), {4,5,6} around
    // seed 4 (label 20); node 7 bridges into component 1 only
    val edges = Seq(
      (2L, 1L), (3L, 1L), (2L, 3L), (3L, 2L),
      (5L, 4L), (6L, 4L), (5L, 6L), (6L, 5L),
      (7L, 2L), (7L, 3L),
      (1L, 2L), (4L, 5L) // seeds also have out-edges: clamp must hold
    ).toDF("id", "nb")
    val seeds = Seq((1L, 10), (4L, 20)).toDF("node", "label")
    val out = LabelSpread.spread(edges, "id", "nb", seeds, "node", "label",
        iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(3))).toMap
    // seeds keep their own labels, flagged
    assert(out(1L) == (10, 1L) && out(4L) == (20, 1L))
    // each component converges to its seed's label
    Seq(2L, 3L, 7L).foreach(n => assert(out(n)._1 == 10, s"node $n: ${out(n)}"))
    Seq(5L, 6L).foreach(n => assert(out(n)._1 == 20, s"node $n: ${out(n)}"))
    // spreading is deterministic under repartitioning
    val again = LabelSpread.spread(edges.repartition(5), "id", "nb", seeds,
        "node", "label", iters = 3)
      .orderBy("node").collect().map(_.toSeq)
    val base = LabelSpread.spread(edges, "id", "nb", seeds,
        "node", "label", iters = 3)
      .orderBy("node").collect().map(_.toSeq)
    assert(again.toSeq == base.toSeq)
  }

  test("conflicting neighborhoods: argmax follows the heavier label, ties break low") {
    // node 9 hears label 10 from two neighbors and label 20 from one
    val edges = Seq((9L, 1L), (9L, 2L), (9L, 3L)).toDF("id", "nb")
    val seeds = Seq((1L, 10), (2L, 10), (3L, 20)).toDF("node", "label")
    val out = LabelSpread.spread(edges, "id", "nb", seeds, "node", "label", 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(9L) == 10, s"2:1 majority must win: $out")
    // exact tie: two labels at equal mass -> smaller label wins
    val e2 = Seq((9L, 1L), (9L, 3L)).toDF("id", "nb")
    val out2 = LabelSpread.spread(e2, "id", "nb", seeds, "node", "label", 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out2(9L) == 10, s"tie must break to the smaller label: $out2")
  }
}
