package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2 L6-L7).
  */
object Ann {

  /** L6: brute-force cosine top-k — the exact baseline. The query set
    * is broadcast (small by contract), the corpus streams through one
    * codegen'd cosine per (query, vector): O(|corpus|·|queries|) work,
    * zero shuffle on the corpus side, top-k via per-query window. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"),
      as_double_array(col(vecCol)).as("nn_vec"))
    val q = queries.select(col(idCol).as("query_id"),
      as_double_array(col(vecCol)).as("q_vec"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("nn_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("sim", round(cosine_sim(col("q_vec"), col("nn_vec")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "nn_id", "sim")
  }

  /** L7: the scale path — hyperplane-LSH bucketed search. Corpus is
    * bucketed once (reusable, like an IVF index); each query probes
    * its own bucket only, so per-query cost is |corpus|/2^bits. Recall
    * traded via `bits`; verified against brute force in AnnSpec. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, bits: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"),
      as_double_array(col(vecCol)).as("nn_vec"))
      .withColumn("bucket", hyperplane_lsh(col("nn_vec"), bits))
    val q = queries.select(col(idCol).as("query_id"),
      as_double_array(col(vecCol)).as("q_vec"))
      .withColumn("bucket", hyperplane_lsh(col("q_vec"), bits))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("nn_id").asc)
    c.join(broadcast(q), "bucket")
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("sim", round(cosine_sim(col("q_vec"), col("nn_vec")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "nn_id", "sim")
  }
}
