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


  test("label-noise audit: majority flags, low-tie rule, agreement counts") {
    // labels: 1→0, 2→0, 3→0, 4→1, 5→1; planted disagreements:
    // node 4's neighbors are all label 0 (flagged), node 5 ties 1-1
    // (majority breaks LOW → 0, flagged), node 1 agrees (0,0,1 → 0)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L),
      (4L, 1L), (4L, 2L),
      (5L, 1L), (5L, 4L)).toDF("id", "nb")
    val labels = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 1), (5L, 1))
      .toDF("node", "label")
    val out = LabelSpread.labelNoiseAudit(edges, "id", "nb",
        labels, "node", "label")
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(out(1L) == Seq(1L, 0L, 0L, 3L, 2L, 2L, false), s"${out(1L)}")
    assert(out(4L) == Seq(4L, 1L, 0L, 2L, 2L, 0L, true), s"${out(4L)}")
    assert(out(5L) == Seq(5L, 1L, 0L, 2L, 1L, 1L, true), s"${out(5L)}")
    // only nodes WITH edges appear
    assert(out.keySet == Set(1L, 4L, 5L))
    // partition invariance
    val a = LabelSpread.labelNoiseAudit(edges.repartition(5), "id", "nb",
        labels.repartition(3), "node", "label")
      .orderBy("id").collect().map(_.toSeq)
    val b = LabelSpread.labelNoiseAudit(edges, "id", "nb",
        labels, "node", "label").orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
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
