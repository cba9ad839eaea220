package graft

import org.apache.spark.sql.functions._

import graft.operators.Train

/** Distributed-training invariants (SURVEY.md §2 L44). The value gate
  * is q_classifier_train's unrolled DuckDB replay; these pin what the
  * hash can't: partitioning invariance, parity with a sequential
  * reference implementation, and that the model actually learns.
  */
class TrainSpec extends SparkSpec {
  import spark.implicits._

  private def feats = {
    import graft.functions.{hashed_bow, tokenize_ws}
    spark.read.parquet(s"$sfDir/documents.parquet").select(
      hashed_bow(tokenize_ws(col("text")), 64).as("x"),
      when(col("lang") === "en", 1L).otherwise(0L).as("y"))
  }

  test("weights are invariant to partitioning and re-runs") {
    val w1 = Train.logisticGd(feats.repartition(13), "x", "y", 64, rounds = 2)
    val w2 = Train.logisticGd(feats.repartition(2), "x", "y", 64, rounds = 2)
    assert(w1.toSeq == w2.toSeq)
  }

  test("distributed aggregate equals a sequential reference loop") {
    val rows = feats.select(
        graft.functions.as_double_array(col("x")).as("x"), col("y"))
      .collect()
      .map(r => (r.getSeq[Double](0).toArray :+ 1.0, r.getLong(1).toDouble))
    val w = Array.fill(65)(0L)
    for (_ <- 1 to 3) {
      val s = Array.fill(65)(0.0)
      rows.foreach { case (x, y) =>
        val mm = x.zipWithIndex.map { case (v, b) => v * w(b) }.sum
        val m = mm / 1048576.0
        val sig = 0.5 + m / (2.0 * (1.0 + math.abs(m)))
        val g = math.floor((y - sig) * 1048576.0)
        var b = 0
        while (b < 65) { s(b) += g * x(b); b += 1 }
      }
      var b = 0
      while (b < 65) {
        w(b) += math.floor(s(b) / rows.length.toDouble).toLong; b += 1
      }
    }
    val dist = Train.logisticGd(feats, "x", "y", 64, rounds = 3)
    assert(dist.toSeq == w.toSeq)
  }

  test("model separates a linearly separable synthetic set") {
    import graft.functions.{hashed_bow, tokenize_ws}
    val docs = ((1 to 60).map(i => (s"positive marker text number $i", 1L)) ++
      (1 to 60).map(i => (s"plain negative filler words $i", 0L)))
      .toDF("text", "y")
      .select(hashed_bow(tokenize_ws(col("text")), 64).as("x"), col("y"))
    val w = Train.logisticGd(docs, "x", "y", 64, rounds = 8)
    val preds = docs.select(
        (Train.marginMicro(col("x"), w) > 0L).as("pred"), col("y"))
      .collect()
    val acc = preds.count(r => r.getBoolean(0) == (r.getLong(1) == 1L))
      .toDouble / preds.length
    assert(acc == 1.0, s"separable set not separated, accuracy $acc")
  }

  test("skipgram SGNS: positive pairs end closer than negatives; deterministic") {
    import spark.implicits._
    // two 4-cliques wired as positives within, negatives across: the
    // trained embeddings must score within-clique dots above
    // cross-clique dots on average (the SGNS learning signal)
    val nodesA = Seq("a1", "a2", "a3", "a4")
    val nodesB = Seq("b1", "b2", "b3", "b4")
    def pairs(ns: Seq[String]) =
      for (x <- ns; y <- ns if x != y) yield (x, y, 1L)
    val pos = pairs(nodesA) ++ pairs(nodesB)
    val neg = for (x <- nodesA; y <- nodesB) yield (x, y, 0L)
    val ex = (pos ++ neg).toDF("center", "x", "y")
    val emb = Train.skipgramSgd(ex, "center", "x", "y", dims = 8,
        rounds = 4, dampDen = 4096L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    def dot(u: String, v: String): Double =
      (0L until 8L).map(d => emb((u, d)).toDouble * emb((v, d))).sum
    val posAvg = pos.map { case (u, v, _) => dot(u, v) }.sum / pos.size
    val negAvg = neg.map { case (u, v, _) => dot(u, v) }.sum / neg.size
    assert(posAvg > negAvg,
      s"training must pull positives together: pos $posAvg <= neg $negAvg")
    // determinism: hash-seeded init + full-batch rounds — identical
    // embeddings at any partitioning
    val again = Train.skipgramSgd(ex.repartition(7), "center", "x", "y",
        dims = 8, rounds = 4, dampDen = 4096L)
      .orderBy("node", "d").collect().map(_.toSeq)
    val base = Train.skipgramSgd(ex, "center", "x", "y", dims = 8,
        rounds = 4, dampDen = 4096L)
      .orderBy("node", "d").collect().map(_.toSeq)
    assert(again.toSeq == base.toSeq, "SGNS must be partition-invariant")
  }
}
