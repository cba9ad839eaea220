package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Hybrid (lexical + semantic) retrieval composition (SURVEY.md §2
  * L41): fuse independently-ranked result lists into one ranking via
  * reciprocal rank fusion — the standard trick for combining BM25 with
  * dense-vector search when their scores live on incomparable scales
  * (Cormack et al., SIGIR'09: RRF outperforms either list alone and
  * needs no score calibration).
  *
  * Scale shape: fusion never touches the corpus — each side has
  * already reduced to (query, doc, rank) rows bounded by queries × k,
  * so the union + group-by here moves tiny frames regardless of corpus
  * size. The expensive work stays in the per-side engines (bucketed
  * BM25 postings probe, IVF/PQ-indexed ANN), which keep their own
  * 100 TB contracts.
  */
object Retrieval {

  /** nDCG discount weights, parts-per-billion: w(r) = ⌊1e9 / log2(r+1)⌋
    * for ranks 1..k. Computed ONCE here and embedded as literals in
    * both engines (the Bm25Batch lockstep pattern) — log2 itself is
    * libm-dependent, but a pinned integer table of its values is
    * engine-portable by construction. */
  def ndcgWeightsPpb(k: Int): Seq[Long] =
    (1 to k).map(r =>
      math.floor(1e9 / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /** L112: exact ranking-evaluation metrics — recall@k, MRR@k and
    * nDCG@k (binary relevance) per query, the retrieval-QA report
    * every search/RAG pipeline gates releases on. All three are
    * integer-exact: recall and MRR are rational (ppm via integer
    * division), DCG/IDCG sum the pinned [[ndcgWeightsPpb]] table, so
    * the whole report hash-oracles in a second engine.
    *
    * `results` carries the SYSTEM ranking (query, doc, 1-based rank);
    * `truth` the relevant (query, doc) pairs. Queries present in
    * `truth` but absent from `results` (or with no hits in the top k)
    * report zeros rather than dropping — a silent drop would inflate
    * averages exactly when the system fails hardest.
    *
    * Scale shape: both inputs are eval-set-bounded (queries × k and
    * the relevance inventory); the corpus never enters — joins are
    * against the broadcast k-row weight table and the hit set. */
  def rankingMetrics(results: DataFrame, truth: DataFrame,
                     queryCol: String, docCol: String, rankCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = results.sparkSession
    import spark.implicits._
    val wdf = broadcast(ndcgWeightsPpb(k).zipWithIndex
      .map { case (w, i) => (i + 1L, w) }.toDF("__r", "__w"))
    val res = results.select(col(queryCol).as("query_id"),
        col(docCol).as("doc_id"), col(rankCol).cast("long").as("__r"))
      .filter(col("__r") <= k)
      // malformed system output can repeat a (query, doc) inside the
      // top k; without this min-rank dedup the duplicates double-count
      // n_hits and DCG, silently pushing recall/ndcg past 10^6 (r15
      // ADVICE). Truth is dedup'd below for the same reason.
      .groupBy("query_id", "doc_id").agg(min("__r").as("__r"))
    val tr = truth.select(col(queryCol).as("query_id"),
      col(docCol).as("doc_id")).distinct()
    val nrel = tr.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val hits = res.join(tr, Seq("query_id", "doc_id"))
      .join(wdf, Seq("__r"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_hits"), min("__r").as("__first"),
        sum("__w").as("__dcg"))
    // ideal DCG: the weight-table prefix up to min(n_rel, k)
    val idcg = nrel
      .select(col("query_id"), least(col("n_rel"), lit(k.toLong)).as("__m"))
      .join(wdf, col("__r") <= col("__m"))
      .groupBy("query_id").agg(sum("__w").as("__idcg"))
    nrel.join(idcg, Seq("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr("coalesce(n_hits, 0L) * 1000000 div n_rel").as("recall_ppm"),
        expr("case when __first is null then 0L " +
          "else 1000000 div __first end").as("mrr_ppm"),
        expr("case when __dcg is null then 0L " +
          "else __dcg * 1000000 div __idcg end").as("ndcg_ppm"))
  }

  /** Dense side of hybrid retrieval: exact cosine top-k of a broadcast
    * query-vector set against a featurized corpus. Unlike
    * [[Ann.bruteForceTopK]] there is NO self-id filter — query ids and
    * doc ids are different namespaces here (a query is free text, not
    * a corpus row), so equal ids must not suppress a hit. Sim is
    * round-quantized to 4 decimals (engine-portable ordering; ties
    * break on doc id). */
  /** L119 (r16): token-budgeted context packing — the serving step
    * between retrieval and the prompt: fill the context window with
    * top-ranked hits IN RANK ORDER until the token budget is spent.
    * Prefix rule: the first hit whose tokens would overflow the
    * budget truncates the list (no skip-and-continue — a context
    * builder that reorders or gaps the ranking changes what the
    * model sees, so the deterministic prefix is the contract).
    *
    * Scale shape: one cumulative-sum window per query, bounded by
    * the retrieval k (never corpus-sized); the token counts ride the
    * hits frame, so packing adds zero extra scans. Keeps the input
    * columns and adds `cum_tokens`. */
  def packContext(hits: DataFrame, queryCol: String, rankCol: String,
                  tokenCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0,
      s"token budget must be positive, got $budgetTokens")
    val w = Window.partitionBy(queryCol).orderBy(col(rankCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hits.withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      .filter(col("cum_tokens") <= budgetTokens)
  }

  def denseTopK(corpus: DataFrame, queries: DataFrame, docIdCol: String,
                queryIdCol: String, vecCol: String, queryVecCol: String,
                k: Int): DataFrame =
    Ann.cosineTopK(
        corpus.select(col(docIdCol).as("nn_id"),
          as_double_array(col(vecCol)).as("nn_vec")),
        queries.select(col(queryIdCol).as("query_id"),
          as_double_array(col(queryVecCol)).as("q_vec")),
        k, excludeSameId = false)
      .withColumnRenamed("nn_id", "doc_id")

  /** Reciprocal rank fusion over N ranked sides. Each input frame
    * carries (query_id, doc_id, rank) — any extra columns are ignored.
    * A doc's fused score is the sum over sides of
    * `1000000 div (k0 + rank)` (integer-quantized 1/(k0+rank), so the
    * sum is order-insensitive and engine-exact; k0=60 per the RRF
    * paper). Docs absent from a side contribute 0 from it. Returns
    * (query_id, rank, doc_id, rrf_score) with the fused top `k` per
    * query, ties on doc id. */
  def rrfFuse(sides: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(sides.nonEmpty, "rrfFuse needs at least one ranked side")
    require(k0 >= 1, s"need k0 >= 1, got $k0")
    val contribs = sides.map(_.select(col("query_id"), col("doc_id"),
        expr(s"1000000 div (${k0.toLong} + rank)").cast("long").as("c")))
      .reduce(_ unionAll _)
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
    contribs.groupBy("query_id", "doc_id")
      .agg(sum(col("c")).as("rrf_score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "rrf_score")
  }

  /** L97: Rocchio pseudo-relevance feedback (Rocchio 1971; the PRF
    * formulation of Salton & Buckley '90) — automatic query expansion,
    * the classical fix for vocabulary mismatch: score the original
    * query, take the top-`fbK` documents as pseudo-relevant, pick the
    * `expandK` terms that best characterize that feedback set
    * (tf-in-feedback × corpus idf, the Rocchio centroid under the
    * BM25 idf), and re-score with the expanded query. Every step is
    * the engine's rational-idf BM25 arithmetic (one IEEE double chain
    * + floor-quantization — the q_bm25 recipe that hash-oracles), and
    * every selection breaks ties deterministically (score desc, then
    * id/term asc), so the WHOLE two-round chain replays in SQL.
    *
    * Scale shape: term frames are query-bounded (feedback docs ≤ fbK,
    * candidate vocabulary ≤ the feedback docs' tokens); the corpus is
    * tokenized per round straight off the scan — at 100 TB route the
    * tf/df lookups through the persisted inverted index
    * ([[Lexical.searchBm25]]) instead; driver state is fbK ids +
    * expandK terms, both parameters. Returns the expanded-query
    * top-`k` as (doc_id, score_q, n_terms). */
  def prfSearch(raw: DataFrame, idCol: String, textCol: String,
                queryTerms: Seq[String], fbK: Int, expandK: Int,
                k: Int): DataFrame = {
    require(queryTerms.nonEmpty && fbK >= 1 && expandK >= 1 && k >= 1,
      s"prfSearch needs terms/fbK/expandK/k >= 1")
    val docs = raw.select(col(idCol).as("doc_id"),
      tokenize_ws(coalesce(col(textCol), lit(""))).as("toks"))
    val dl = docs.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val toks = docs.select(col("doc_id"), explode(col("toks")).as("tok"))

    def bm25(terms: Seq[String]): DataFrame = {
      val tf = toks.filter(col("tok").isin(terms: _*))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dfT = tf.groupBy("tok").agg(countDistinct(col("doc_id")).as("df"))
      tf.join(broadcast(dfT), Seq("tok"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
        .withColumn("idf",
          (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
        .withColumn("tfn",
          col("tf") * 2.2 / (col("tf") +
            lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl")))))
        .withColumn("contrib",
          floor(col("idf") * col("tfn") * 1e6 + 0.5).cast("long"))
        .groupBy("doc_id").agg(sum("contrib").as("score_q"),
          count(lit(1)).as("n_terms"))
    }

    // round 1 → pseudo-relevant set (fbK ids; driver-bounded)
    val fbIds = bm25(queryTerms)
      .orderBy(col("score_q").desc, col("doc_id")).limit(fbK)
      .select("doc_id").collect().map(_.get(0)).toSeq
    // candidate terms = the feedback docs' vocabulary minus the query
    val cand = toks.filter(col("doc_id").isin(fbIds: _*))
      .filter(!col("tok").isin(queryTerms: _*))
      .groupBy("tok").agg(count(lit(1)).as("tf_fb"))
    // corpus df for the candidates (broadcast term probe — the corpus
    // never shuffles against the candidate set)
    val dfc = toks.join(broadcast(cand.select("tok")), Seq("tok"))
      .groupBy("tok").agg(countDistinct(col("doc_id")).as("df"))
    val expansion = cand.join(dfc, Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("escore",
        floor(((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          col("tf_fb") * 1e6 + 0.5).cast("long"))
      .orderBy(col("escore").desc, col("tok").asc).limit(expandK)
      .select("tok").collect().map(_.getString(0)).toSeq
    // round 2: the expanded query
    bm25(queryTerms ++ expansion)
      .orderBy(col("score_q").desc, col("doc_id")).limit(k)
  }
}
