package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** L64: label spreading over a neighbor graph (Zhu & Ghahramani '02
  * label propagation, clamped seeds) — the semi-supervised labeling
  * step of a data pipeline: a small seed set with trusted labels
  * propagates over the kNN graph until every reachable document
  * carries a label distribution, at a fraction of the labeling cost.
  *
  * Integer-exact: scores live in 2^20 micro-units; each round sums
  * neighbor scores per (node, label), row-normalizes with a floor
  * division (score·2^20 div rowsum — engine-exact), and re-clamps
  * seeds to their own label at full mass. Deterministic and fully
  * hash-oracled via unrolled round CTEs (the quantized-iteration
  * pattern shared with PageRank and k-means training).
  *
  * Scale: each round is one edge-keyed join (edges × current scores,
  * grouped per node-label) + a node-sized normalize join — the same
  * shuffle shape as a PageRank round; scores hold ≤ |labels| rows
  * per node. Rounds localCheckpoint so the plan stays bounded.
  */
object LabelSpread {

  /** @param edges  (idCol, nbCol) neighbor pairs — info flows FROM nb
    *               INTO id (a kNN edge list works as-is)
    * @param seeds  (nodeCol, labelCol) trusted labels, clamped every
    *               round
    * @return (node, pred_label, score_q, is_seed): each scored node's
    *         argmax label (ties: smaller label) with its 2^20-unit
    *         score */
  def spread(edges: DataFrame, idCol: String, nbCol: String,
             seeds: DataFrame, nodeCol: String, labelCol: String,
             iters: Int): DataFrame = {
    require(iters >= 1, "need iters >= 1")
    val e = edges.select(col(idCol).as("eid"), col(nbCol).as("enb"))
      .transform(graft.operators.Lineage.pin)
    val seed = seeds.select(col(nodeCol).as("node"),
      col(labelCol).as("label"), lit(1048576L).as("score"))
      .transform(graft.operators.Lineage.pin)
    var scores = seed
    for (_ <- 1 to iters) {
      val prop = e.join(scores, e("enb") === scores("node"))
        .groupBy(col("eid").as("pnode"), col("label"))
        .agg(sum("score").as("raw"))
      val sums = prop.groupBy("pnode").agg(sum("raw").as("rs"))
      val norm = prop.join(sums, "pnode")
        .select(col("pnode").as("node"), col("label"),
          expr("raw * 1048576 div rs").as("score"))
      scores = norm
        .join(seed.select("node"), Seq("node"), "left_anti")
        .unionByName(seed)
        .transform(graft.operators.Lineage.pin)
    }
    val w = Window.partitionBy("node")
      .orderBy(col("score").desc, col("label").asc)
    scores.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .join(seed.select(col("node"), lit(1L).as("is_seed")), Seq("node"), "left")
      .select(col("node"), col("label").as("pred_label"),
        col("score").as("score_q"),
        coalesce(col("is_seed"), lit(0L)).as("is_seed"))
  }
}
