package graft

import org.apache.spark.sql.functions._

import graft.operators.Ann

class AnnSpec extends SparkSpec {

  test("brute force returns k exact neighbors per query, ranked") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val out = Ann.bruteForceTopK(e, e.filter(col("vec_id") < 3), "vec_id",
      "embedding", k = 5).collect()
    assert(out.length == 15)
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { rows =>
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.sameElements(sims.sortBy(-_.toDouble)), "ranks follow sim desc")
    }
  }

  test("lsh search only compares within buckets and stays exact on hits") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val bf = Ann.bruteForceTopK(e, e.filter(col("vec_id") < 20), "vec_id",
        "embedding", k = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"),
        r.getAs[Double]("sim"))).toSet
    val lsh = Ann.lshTopK(e, e.filter(col("vec_id") < 20), "vec_id",
        "embedding", k = 3, bits = 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"),
        r.getAs[Double]("sim")))
    // any (q, nn) the LSH returns must carry the same exact sim value
    // the brute force computed for that pair when brute force kept it
    val bfMap = bf.map { case (q, n, s) => (q, n) -> s }.toMap
    lsh.foreach { case (q, n, s) =>
      bfMap.get((q, n)).foreach(exp => assert(exp == s))
    }
    // with only 4 buckets, recall should be non-trivial
    val hit = lsh.count { case (q, n, _) => bfMap.contains((q, n)) }
    assert(hit > 0)
  }

  test("ivf probes beat or match single-bucket lsh recall") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val bf = Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    // tiny corpus: train on all of it (trainFraction=1 exercises the
    // same sampled-training path with pct=100)
    val ivf = Ann.ivfTopK(e, q, "vec_id", "embedding", k = 5,
        nClusters = 8, nProbe = 4, iters = 3, trainFraction = 1.0).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(ivf.nonEmpty)
    assert(recall >= 0.8, s"ivf recall $recall below gate")
  }
}
