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

  /** Dense side of hybrid retrieval: exact cosine top-k of a broadcast
    * query-vector set against a featurized corpus. Unlike
    * [[Ann.bruteForceTopK]] there is NO self-id filter — query ids and
    * doc ids are different namespaces here (a query is free text, not
    * a corpus row), so equal ids must not suppress a hit. Sim is
    * round-quantized to 4 decimals (engine-portable ordering; ties
    * break on doc id). */
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
}
