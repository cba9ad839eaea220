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
}
