package graft

import org.apache.spark.sql.functions._

import graft.operators.Walk

class WalkSpec extends SparkSpec {
  import spark.implicits._

  private val edges = Seq(
    ("a", "b"), ("a", "c"), ("b", "a"), ("b", "c"),
    ("c", "a"), ("c", "d") // d is dangling: walks entering d stop
  ).toDF("src", "dst")

  test("every walk hop is a real edge; walks start at step 0 at the start node") {
    val w = Walk.deterministicWalks(edges, "src", "dst", nWalks = 3, len = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val edgeSet = edges.collect().map(r => (r.getString(0), r.getString(1))).toSet
    // step 0 = the start node itself, for every (start, walk)
    w.filter(_._3 == 0L).foreach { case (st, _, _, n) => assert(n == st) }
    // consecutive steps within a (start, walk) are edges
    w.groupBy(t => (t._1, t._2)).values.foreach { rows =>
      val path = rows.sortBy(_._3).map(_._4).toSeq
      path.sliding(2).foreach { hop =>
        if (hop.length == 2)
          assert(edgeSet.contains((hop(0), hop(1))),
            s"hop ${hop(0)}->${hop(1)} is not an edge (path ${path.mkString("->")})")
      }
    }
    // a dangling end stops the walk instead of erroring: any walk that
    // reaches d has no further steps
    w.filter(_._4 == "d").foreach { case (st, wk, stp, _) =>
      assert(!w.exists(t => t._1 == st && t._2 == wk && t._3 == stp + 1),
        "walk must stop at the dangling node")
    }
  }

  test("node2vec bias windows: pure-backtrack weights force alternating walks") {
    // wBack=1, wCommon=0, wFar=0: after the uniform first hop every
    // step MUST return to the predecessor (only the return edge has
    // weight, and zero-weight neighbors get an empty cumulative
    // window) — a crisp closed-form proof the weight windows and the
    // pick arithmetic implement the bias, not just some valid hop
    val w = Walk.node2vecWalks(edges, "src", "dst", nWalks = 2, len = 4,
        wBack = 1L, wCommon = 0L, wFar = 0L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    w.groupBy(t => (t._1, t._2)).values.foreach { rows =>
      val path = rows.sortBy(_._3).map(_._4).toSeq
      path.indices.foreach { i =>
        if (i >= 2) assert(path(i) == path(i - 2),
          s"pure backtrack must alternate: ${path.mkString("->")}")
      }
    }
    // and the default bias still produces real edges deterministically
    val b1 = Walk.node2vecWalks(edges, "src", "dst", 2, 4)
      .orderBy("start", "walk", "step").collect().map(_.toSeq)
    val b2 = Walk.node2vecWalks(edges.repartition(5), "src", "dst", 2, 4)
      .orderBy("start", "walk", "step").collect().map(_.toSeq)
    assert(b1.toSeq == b2.toSeq, "biased walks must be partition-invariant")
    val edgeSet = edges.collect().map(r => (r.getString(0), r.getString(1))).toSet
    Walk.node2vecWalks(edges, "src", "dst", 1, 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(t => (t._1, t._2)).values.foreach { rows =>
        val path = rows.sortBy(_._3).map(_._4).toSeq
        path.sliding(2).foreach { hop =>
          if (hop.length == 2)
            assert(edgeSet.contains((hop(0), hop(1))),
              s"biased hop ${hop(0)}->${hop(1)} not an edge")
        }
      }
  }

  test("negative sampling: exactly one negative per (center, k); bias follows weight") {
    // skip-gram-shaped pair counts with one dominant context: the
    // cumulative windows must partition [0, Σw) — every pick lands in
    // EXACTLY one interval — and the heavy node must absorb most picks
    val pairs = (Seq.tabulate(40)(i => (s"c$i", "hub", 50L)) ++
      Seq.tabulate(40)(i => (s"c$i", "rare", 1L)))
      .toDF("center", "context", "n_pairs")
    val neg = Walk.negativeSamples(pairs, "center", "context", "n_pairs", k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // exactly one negative for every (center, k): windows are disjoint
    // AND complete (no pick lost at a boundary, none double-matched)
    assert(neg.length == 40 * 4, s"expected 160 picks, got ${neg.length}")
    assert(neg.map(t => (t._1, t._2)).distinct.length == 160,
      "every (center, k) must resolve to exactly one negative")
    // unigram^(3/4): hub weight ~ (40*50)^(3/4) vs rare ~ 40^(3/4) —
    // ~19:1, so the hub must dominate the sample
    val hub = neg.count(_._3 == "hub")
    assert(hub > 120, s"hub should absorb most picks, got $hub/160")
    // determinism under repartitioning
    val n2 = Walk.negativeSamples(pairs.repartition(7), "center", "context",
        "n_pairs", 4)
      .orderBy("center", "k").collect().map(_.toSeq)
    assert(n2.toSeq == Walk.negativeSamples(pairs, "center", "context",
      "n_pairs", 4).orderBy("center", "k").collect().map(_.toSeq).toSeq)
  }

  test("walks are invariant to input partitioning (deterministic corpus)") {
    val w1 = Walk.deterministicWalks(edges, "src", "dst", 2, 4)
      .orderBy("start", "walk", "step").collect().map(_.toSeq)
    val w2 = Walk.deterministicWalks(edges.repartition(7), "src", "dst", 2, 4)
      .orderBy("start", "walk", "step").collect().map(_.toSeq)
    assert(w1.toSeq == w2.toSeq, "partitioning must not change the walks")
  }

  test("grouped walks == per-group solo runs (bit-exact)") {
    // two tenants; t1 is the shared fixture graph, t2 reuses NODE
    // NAMES with different edges — per-group adjacency must fully
    // isolate them (a cross-group leak changes degrees and picks)
    val g = edges.withColumn("grp", lit("t1"))
      .unionByName(Seq(("a", "c"), ("c", "a"), ("a", "b"))
        .toDF("src", "dst").withColumn("grp", lit("t2")))
    val grouped = Walk.deterministicWalksGrouped(g, "grp", "src", "dst", 2, 4)
    val got = grouped.orderBy("grp", "start", "walk", "step")
      .collect().map(_.toSeq).toSeq
    val solo = Seq("t1", "t2").flatMap { tn =>
      Walk.deterministicWalks(g.filter(col("grp") === tn).drop("grp"),
          "src", "dst", 2, 4)
        .withColumn("grp", lit(tn))
        .select("grp", "start", "walk", "step", "node")
        .collect().map(_.toSeq)
    }.sortBy(_.map(_.toString).mkString("|"))
    assert(got.sortBy(_.map(_.toString).mkString("|")) == solo,
      "each group's walks must equal a solo run over its subgraph")
  }

  test("extendWalks == full rebuild across appends (seam discipline)") {
    // G1: fixture graph (d dangling). Delta 1: d gains out-edges (the
    // stopped walks must resume THROUGH d) and a brand-new source e
    // appears. Delta 2: an existing node's neighbor list grows, which
    // re-routes every walk from its first visit of that node.
    val g1 = edges
    val d1 = Seq(("d", "a"), ("d", "e"), ("e", "a")).toDF("src", "dst")
    val d2 = Seq(("a", "e"), ("b", "e")).toDF("src", "dst")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("start", "walk", "step").collect().map(_.toSeq).toSeq
    val w1 = Walk.deterministicWalks(g1, "src", "dst", 2, 5)
    val g2 = g1.unionByName(d1)
    val inc2 = Walk.extendWalks(g2, d1, w1, "src", "dst", 2, 5)
    assert(canon(inc2) == canon(Walk.deterministicWalks(g2, "src", "dst", 2, 5)),
      "increment 1 (dangling node resumes + new start) must equal rebuild")
    val g3 = g2.unionByName(d2)
    val inc3 = Walk.extendWalks(g3, d2, inc2, "src", "dst", 2, 5)
    assert(canon(inc3) == canon(Walk.deterministicWalks(g3, "src", "dst", 2, 5)),
      "increment 2 (changed adjacency mid-walk) must equal rebuild")
    // a duplicate-edge delta is a no-op (wasted replay, same table)
    val inc3b = Walk.extendWalks(g3, d2, inc3, "src", "dst", 2, 5)
    assert(canon(inc3b) == canon(inc3), "duplicate delta must be idempotent")
  }
}
