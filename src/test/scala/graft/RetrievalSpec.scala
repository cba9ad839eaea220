package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Hybrid-retrieval invariants (SURVEY.md §2 L41). The value-level
  * gate is q_hybrid_retrieval's DuckDB replay; these pin the algebra a
  * hash can't express: the RRF contribution formula, cross-side
  * reinforcement, and denseTopK's no-self-filter contract.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse: doc on both sides outranks better-placed single-side docs") {
    // query 1: doc 10 is rank 3 lexically AND rank 2 semantically;
    // docs 20/30 are rank 1 on one side only. 1e6/63 + 1e6/62 beats
    // 1e6/61 by far, so cross-side agreement must win.
    val lex = Seq((1L, 20L, 1), (1L, 11L, 2), (1L, 10L, 3))
      .toDF("query_id", "doc_id", "rank")
    val sem = Seq((1L, 30L, 1), (1L, 10L, 2), (1L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(lex, sem), k = 10).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(out.head.getAs[Long]("doc_id") == 10L)
    // contribution formula is exactly 1e6 div (60 + rank), summed
    val expected = 1000000L / 63 + 1000000L / 62
    assert(out.head.getAs[Long]("rrf_score") == expected)
    // single-side docs carry exactly their one contribution
    val byDoc = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rrf_score")).toMap
    assert(byDoc(20L) == 1000000L / 61)
    assert(byDoc(30L) == 1000000L / 61)
  }

  test("rrfFuse: ties break on doc_id and k caps each query independently") {
    val a = Seq((1L, 5L, 1), (1L, 3L, 2), (2L, 7L, 1))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 3L, 1), (1L, 5L, 2), (2L, 8L, 1))
      .toDF("query_id", "doc_id", "rank")
    // q1: docs 3 and 5 each score 1e6/61 + 1e6/62 — tie, doc 3 first
    val out = Retrieval.rrfFuse(Seq(a, b), k = 1).collect()
    assert(out.length == 2)
    val q1 = out.find(_.getAs[Long]("query_id") == 1L).get
    assert(q1.getAs[Long]("doc_id") == 3L && q1.getAs[Int]("rank") == 1)
    val q2 = out.find(_.getAs[Long]("query_id") == 2L).get
    assert(q2.getAs[Long]("doc_id") == 7L)
  }

  test("denseTopK matches manual cosine order and keeps same-id hits") {
    // query id 1 collides with corpus id 1 — the hit must NOT be
    // suppressed (different namespaces), unlike Ann.bruteForceTopK.
    val corpus = Seq(
      (1L, Array(1.0, 0.0)),   // exactly the query direction
      (2L, Array(1.0, 1.0)),   // cos = 0.7071
      (3L, Array(0.0, 1.0)))   // orthogonal
      .toDF("doc_id", "vec")
    val q = Seq((1L, Array(2.0, 0.0))).toDF("query_id", "vec")
    val out = Retrieval.denseTopK(corpus, q, "doc_id", "query_id",
        "vec", "vec", k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getAs[Double]("sim")).toSeq == Seq(1.0, 0.7071, 0.0))
  }

  test("prfSearch: expansion recalls vocabulary-mismatched docs, pure query unchanged") {
    // planted corpus: the seed query is "alpha"; docs about the same
    // topic consistently co-mention "beta" (the expansion signal);
    // doc 30 NEVER says "alpha" — only expansion can reach it
    val topic = (0L to 9L).map(i =>
      (i, "alpha beta beta filler" + (" pad" * i.toInt)))
    val mismatched = Seq((30L, "beta beta beta lonely"))
    val noise = (40L to 49L).map(i => (i, "filler filler pad pad"))
    val docs = (topic ++ mismatched ++ noise).toDF("doc_id", "text")
    val out = Retrieval.prfSearch(docs, "doc_id", "text",
        Seq("alpha"), fbK = 5, expandK = 1, k = 20)
      .collect().map(r => r.getAs[Long]("doc_id")).toSet
    assert(out.contains(30L),
      "expansion must recall the doc that never says 'alpha'")
    assert(!out.exists(id => id >= 40L),
      "docs with neither seed nor expansion terms must not score")
    // with expandK terms absent from feedback... degenerate corpus:
    // a query whose feedback docs contain ONLY query terms expands to
    // nothing new and reduces to plain BM25
    val pure = Seq((1L, "solo"), (2L, "solo solo"), (3L, "unrelated"))
      .toDF("doc_id", "text")
    val reduced = Retrieval.prfSearch(pure, "doc_id", "text",
        Seq("solo"), fbK = 2, expandK = 3, k = 10)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(reduced == Set(1L, 2L))
    // determinism: repartitioned corpus gives the identical ranking
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    def run(frame: org.apache.spark.sql.DataFrame) =
      Retrieval.prfSearch(frame, "doc_id", "text",
          Seq("spark", "join"), 10, 5, 20)
        .orderBy(col("score_q").desc, col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getAs[Long]("score_q"))).toSeq
    assert(run(d) == run(d.repartition(11)))
  }

  test("hybrid query fuses exactly the per-side top-10 lists") {
    val out = graft.queries.AnalyticsQueries
      .queries("q_hybrid_retrieval")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == Set(1L, 2L, 3L))
    byQuery.values.foreach { rows =>
      // ranks are 1..n contiguous and scores non-increasing
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rows.length))
      val scores = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("rrf_score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      // max possible score is two rank-1 contributions
      assert(scores.head <= 2 * (1000000L / 61))
    }
  }

  test("rankingMetrics: textbook values, zero rows for total misses, dedup'd truth") {
    import graft.operators.Retrieval
    val w = Retrieval.ndcgWeightsPpb(4)
    // q1: truth {1,2,3}; system top-4 = [9, 1, 5, 2] -> hits at ranks
    // 2 and 4. recall = 2/3; MRR = 1/2; DCG = w(2)+w(4),
    // IDCG = w(1)+w(2)+w(3) (min(n_rel, k) = 3).
    // q2: truth {7}; system returns nothing relevant -> all zeros.
    // q3: truth {8} (duplicated rows must count once); absent from
    // results entirely -> zeros row still emitted.
    val results = Seq(
      (1L, 9L, 1), (1L, 1L, 2), (1L, 5L, 3), (1L, 2L, 4),
      (2L, 9L, 1), (2L, 5L, 2))
      .toDF("query_id", "doc_id", "rank")
    val truth = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 7L),
      (3L, 8L), (3L, 8L)).toDF("query_id", "doc_id")
    val m = Retrieval.rankingMetrics(results, truth,
        "query_id", "doc_id", "rank", k = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(m(1L) == ((3L, 2L, 666666L, 500000L,
      (w(1) + w(3)) * 1000000L / (w(0) + w(1) + w(2)))),
      s"q1 metrics: ${m(1L)}")
    assert(m(2L) == ((1L, 0L, 0L, 0L, 0L)), s"q2 must be zeros: ${m(2L)}")
    assert(m(3L) == ((1L, 0L, 0L, 0L, 0L)),
      s"q3 absent from results must still report zeros: ${m(3L)}")
    // perfect ranking: every metric pins 1e6 exactly
    val perfect = Retrieval.rankingMetrics(
        Seq((5L, 1L, 1), (5L, 2L, 2)).toDF("query_id", "doc_id", "rank"),
        Seq((5L, 1L), (5L, 2L)).toDF("query_id", "doc_id"),
        "query_id", "doc_id", "rank", k = 4)
      .head()
    assert(perfect.getLong(3) == 1000000L && perfect.getLong(4) == 1000000L
      && perfect.getLong(5) == 1000000L, s"perfect run: $perfect")
    // weight table itself: monotone decreasing, w(1) = 1e9 exactly
    assert(w.head == 1000000000L && w == w.sorted.reverse)
  }

  test("rankingMetrics: duplicate (query, doc) results count once at min rank") {
    import graft.operators.Retrieval
    val w = Retrieval.ndcgWeightsPpb(4)
    // doc 1 relevant, repeated at ranks 1 AND 3 by a malformed system:
    // must count as ONE hit at rank 1 — not two hits (which would push
    // recall to 2e6/2 = 1e6 despite doc 2 missing, and double-count DCG)
    val m = Retrieval.rankingMetrics(
        Seq((1L, 1L, 1), (1L, 1L, 3), (1L, 9L, 2)).toDF("query_id", "doc_id", "rank"),
        Seq((1L, 1L), (1L, 2L)).toDF("query_id", "doc_id"),
        "query_id", "doc_id", "rank", k = 4)
      .head()
    assert(m.getLong(2) == 1L, s"n_hits must dedup to 1: $m")
    assert(m.getLong(3) == 500000L, s"recall 1/2: $m")
    assert(m.getLong(4) == 1000000L, s"mrr at min rank 1: $m")
    assert(m.getLong(5) == w(0) * 1000000L / (w(0) + w(1)),
      s"dcg counts the dup once at rank 1: $m")
  }

  test("packContext: prefix rule truncates at first overflow, queries independent") {
    import spark.implicits._
    import graft.operators.Retrieval
    // q1 tokens by rank: 100, 150, 200, 50 — budget 300 keeps ranks
    // 1-2 (cum 100, 250); rank 3 overflows (450) and rank 4 must NOT
    // sneak back in even though 50 alone would fit (prefix rule)
    val hits = Seq((1L, 1, 11L, 100L), (1L, 2, 12L, 150L),
      (1L, 3, 13L, 200L), (1L, 4, 14L, 50L),
      (2L, 1, 21L, 280L), (2L, 2, 22L, 30L)).toDF("q", "rank", "doc", "tok")
    val out = Retrieval.packContext(hits, "q", "rank", "tok", 300L)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(4)).toMap
    assert(out.keySet == Set((1L, 1), (1L, 2), (2L, 1)), s"$out")
    assert(out((1L, 2)) == 250L && out((2L, 1)) == 280L, s"$out")
    // a first hit larger than the budget empties that query's context
    val big = Retrieval.packContext(
      Seq((9L, 1, 91L, 999L)).toDF("q", "rank", "doc", "tok"),
      "q", "rank", "tok", 300L)
    assert(big.isEmpty)
    intercept[IllegalArgumentException] {
      Retrieval.packContext(hits, "q", "rank", "tok", 0L)
    }
  }
}
