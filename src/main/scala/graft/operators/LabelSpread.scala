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

  /** L117 (r16): kNN label-noise audit (confident-learning lite,
    * Northcutt et al. flavor) — flag examples whose OWN label
    * disagrees with the majority label of their k nearest neighbors:
    * the standard first-pass sweep for mislabeled rows before a
    * labeled set trains a filter model. Majority = the neighbor
    * label with the highest vote, ties broken to the SMALLEST label
    * (deterministic); `flagged` = majority ≠ own.
    *
    * Scale shape: one equi-join of the k·N edge list with the label
    * table on the neighbor key, one (id, label) groupBy, and a
    * per-id window over ≤ |labels| vote rows (bounded partitions —
    * never a global window). No broadcasts of corpus-sized tables.
    *
    * Returns (id, label, maj_label, n_nb, n_maj, n_agree, flagged)
    * for every node with ≥ 1 labeled neighbor. */
  def labelNoiseAudit(edges: DataFrame, idCol: String, nbCol: String,
                      labels: DataFrame, nodeCol: String,
                      labelCol: String): DataFrame = {
    val lab = labels.select(col(nodeCol).as("__n"),
      col(labelCol).cast("long").as("__l"))
    val votes = edges.select(col(idCol).as("id"), col(nbCol).as("nb"))
      .join(lab.select(col("__n").as("nb"), col("__l").as("nb_label")), "nb")
      .groupBy("id", "nb_label").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("id")
      .orderBy(col("c").desc, col("nb_label").asc)
    val maj = votes
      .withColumn("__rk", row_number().over(w))
      .withColumn("n_nb", sum("c").over(Window.partitionBy("id")))
    val top = maj.filter(col("__rk") === 1)
      .select(col("id"), col("nb_label").as("maj_label"),
        col("c").as("n_maj"), col("n_nb"))
    val own = lab.select(col("__n").as("id"), col("__l").as("label"))
    val agree = votes.select(col("id"),
      col("nb_label").as("label"), col("c").as("n_agree"))
    top.join(own, "id")
      .join(agree, Seq("id", "label"), "left")
      .withColumn("n_agree", coalesce(col("n_agree"), lit(0L)))
      .withColumn("flagged", col("maj_label") =!= col("label"))
      .select("id", "label", "maj_label", "n_nb", "n_maj", "n_agree",
        "flagged")
  }

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
