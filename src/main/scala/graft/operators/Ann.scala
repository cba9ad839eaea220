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

  /** L7b: IVF (inverted-file) ANN — the other scale path. A coarse
    * k-means quantizer is trained with a few DataFrame-only Lloyd
    * iterations (assignment = broadcast-centroid argmax, update =
    * exploded per-dimension mean — both shuffle O(n·C) narrow rows).
    * Each query probes its `nProbe` nearest cells, so per-query cost
    * is ~nProbe/nClusters of the corpus. Centroids are reusable: at
    * 100 TB you train once, store the centroid table, and every
    * search reuses it (a real IVF index).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nClusters: Int = 16, nProbe: Int = 2,
              iters: Int = 2): DataFrame = {
    val v = corpus.select(col(idCol).as("nn_id"),
      as_double_array(col(vecCol)).as("vec"))

    // deterministic seed centroids: the nClusters lowest-id vectors
    var centroids = v.orderBy("nn_id").limit(nClusters)
      .select(col("nn_id").cast("int").as("cluster"), col("vec").as("cvec"))
    // row_number over sim gives each point its best cell(s)
    def assign(points: DataFrame, cent: DataFrame, n: Int, idC: String): DataFrame = {
      val w = Window.partitionBy(idC)
        .orderBy(col("csim").desc, col("cluster").asc)
      points.crossJoin(broadcast(cent))
        .withColumn("csim", cosine_sim(col("vec"), col("cvec")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= n)
        .drop("csim", "crank", "cvec")
    }
    (1 to iters).foreach { _ =>
      centroids = assign(v, centroids, 1, "nn_id")
        .select(col("cluster"), posexplode(col("vec")))
        .groupBy("cluster", "pos").agg(avg("col").as("m"))
        .groupBy("cluster")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("cvec"))
    }

    val indexed = assign(v, centroids, 1, "nn_id") // (nn_id, vec, cluster)
    val q = queries.select(col(idCol).as("query_id"),
      as_double_array(col(vecCol)).as("vec"))
    val probes = assign(q, centroids, nProbe, "query_id")
      .select(col("query_id"), col("vec").as("q_vec"), col("cluster"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("nn_id").asc)
    indexed.join(broadcast(probes), "cluster")
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("sim", round(cosine_sim(col("q_vec"), col("vec")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "nn_id", "sim")
  }
}
