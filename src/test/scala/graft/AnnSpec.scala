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

  test("mmr rerank trades relevance for diversity, greedily and deterministically") {
    import spark.implicits._
    // planted geometry: the query (1,1) sits between two clusters —
    // twins 10/11 near the x-axis (11 slightly more relevant), the
    // diverse 12 near the y-axis at the SAME relevance as 10. Pure
    // top-2 takes {11, 10} (the twin edges 12 on the id tiebreak);
    // MMR must take 11 then SKIP the twin for the diverse 12, because
    // 10's penalty (≈1.0 sim to the picked 11) dwarfs 12's (≈0.02).
    val vecs = Seq(
      (0L, Array(1.0f, 1.0f)),          // the query
      (10L, Array(1.0f, 0.01f)),
      (11L, Array(1.0f, 0.012f)),       // 10's near-duplicate twin
      (12L, Array(0.01f, 1.0f)),        // diverse second cluster
      (13L, Array(-1.0f, -1.0f))        // filler, anti-relevant
    ).toDF("vec_id", "embedding")
    val out = Ann.mmrRerank(vecs, vecs.filter(col("vec_id") === 0L),
        "vec_id", "embedding", nCandidates = 4, k = 2)
      .orderBy("mmr_rank").collect()
      .map(r => (r.getAs[Int]("mmr_rank"), r.getAs[Long]("nn_id")))
    assert(out.length == 2)
    assert(out(0)._2 == 11L, s"round 1 is pure relevance: ${out.toSeq}")
    assert(out(1)._2 == 12L,
      s"round 2 must skip the near-duplicate twin (10) for the diverse 12: ${out.toSeq}")
    // control: plain top-2 DOES take the twin (10 beats 12 on the id
    // tiebreak at equal relevance)
    val top2 = Ann.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0L),
        "vec_id", "embedding", k = 2).collect().map(_.getAs[Long]("nn_id"))
    assert(top2.toSet == Set(11L, 10L), s"control: ${top2.toSeq}")
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

  test("grouped top-k searches only the query's own group, exactly") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    val got = Ann.groupedTopK(e, q, "vec_id", "embedding", "label", k = 3)
      .collect()
    assert(got.nonEmpty)
    val labelOf = e.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every neighbor shares the query's label
    got.foreach { r =>
      assert(labelOf(r.getAs[Long]("nn_id")) == r.getAs[Int]("grp"))
      assert(labelOf(r.getAs[Long]("query_id")) == r.getAs[Int]("grp"))
    }
    // and per group the result equals brute force restricted to it
    val grp = got.head.getAs[Int]("grp")
    val sub = e.filter(col("label") === grp)
    val bf = Ann.bruteForceTopK(sub, q.filter(col("label") === grp),
        "vec_id", "embedding", k = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("nn_id"))).toSet
    val gotGrp = got.filter(_.getAs[Int]("grp") == grp)
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("nn_id"))).toSet
    assert(gotGrp == bf)
    // scale shape: broadcast equi-join on the group, never a cartesian
    val plan = Ann.groupedTopK(e, q, "vec_id", "embedding", "label", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("grouped top-k isolates tenants whose query ids collide") {
    import spark.implicits._
    // two tenants, SAME vec_ids; tenant 0 vectors near (1,0), tenant 1
    // near (0,1) — a shared ranking window would starve one tenant
    val rows = Seq(
      (1L, 0, Seq(1.0f, 0.0f)), (2L, 0, Seq(0.9f, 0.1f)), (3L, 0, Seq(0.8f, 0.2f)),
      (1L, 1, Seq(0.0f, 1.0f)), (2L, 1, Seq(0.1f, 0.9f)), (3L, 1, Seq(0.2f, 0.8f)))
      .toDF("vec_id", "label", "embedding")
    val q = rows.filter(col("vec_id") === 1L)
    val got = Ann.groupedTopK(rows, q, "vec_id", "embedding", "label", k = 2)
      .collect()
      .map(r => (r.getAs[Int]("grp"), r.getAs[Long]("query_id"),
        r.getAs[Int]("rank"), r.getAs[Long]("nn_id")))
    // each tenant's query 1 gets its own full top-2 within its group
    assert(got.count(_._1 == 0) == 2 && got.count(_._1 == 1) == 2)
    assert(got.filter(_._1 == 0).map(_._4).toSet == Set(2L, 3L))
    assert(got.filter(_._1 == 1).map(_._4).toSet == Set(2L, 3L))
  }

  test("grouped ivf keeps high recall vs grouped exact search") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val exact = Ann.groupedTopK(e, q, "vec_id", "embedding", "label", k = 5)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val ivf = Ann.groupedIvfTopK(e, q, "vec_id", "embedding", "label",
        k = 5, nClusters = 8, nProbe = 4, iters = 2, trainFraction = 1.0)
      .collect()
    assert(ivf.nonEmpty)
    // neighbors never leave the query's group
    val labelOf = e.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    ivf.foreach(r =>
      assert(labelOf(r.getAs[Long]("nn_id")) == r.getAs[Int]("grp")))
    val got = ivf
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.8, s"grouped-ivf recall $recall below gate")
    // oracle-exact (quantized) variant: same floor, same containment
    val ivfQ = Ann.groupedIvfTopKQuantized(e, q, "vec_id", "embedding",
        "label", k = 5, nClusters = 8, nProbe = 4, iters = 2,
        trainFraction = 1.0)
      .collect()
    ivfQ.foreach(r =>
      assert(labelOf(r.getAs[Long]("nn_id")) == r.getAs[Int]("grp")))
    val gotQ = ivfQ
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val recallQ = (exact & gotQ).size.toDouble / exact.size
    assert(recallQ >= 0.8, s"quantized grouped-ivf recall $recallQ below gate")
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

  test("pq: recall vs brute force, code contract, deterministic") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val bf = Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    def run() = Ann.pqTopK(e, q, "vec_id", "embedding", k = 5, m = 16,
      ksub = 32, iters = 3, trainFraction = 1.0, refine = 6).collect()
    val pq = run()
    assert(pq.nonEmpty)
    val got = pq.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val recall = (bf & got).size.toDouble / bf.size
    assert(recall >= 0.8, s"pq recall $recall below gate")
    // oracle-exact (quantized) variant: same floor
    val gotQ = Ann.pqTopKQuantized(e, q, "vec_id", "embedding", k = 5,
        m = 16, ksub = 32, iters = 3, trainFraction = 1.0, refine = 6)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val recallQ = (bf & gotQ).size.toDouble / bf.size
    assert(recallQ >= 0.8, s"quantized pq recall $recallQ below gate")
    // exact re-rank: every returned sim equals the brute-force sim for
    // that pair when brute force kept it
    val bfSim = Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id")) ->
        r.getAs[Double]("sim")).toMap
    pq.foreach { r =>
      bfSim.get((r.getAs[Long]("query_id"), r.getAs[Long]("nn_id")))
        .foreach(exp => assert(exp == r.getAs[Double]("sim")))
    }
    // two runs agree bit-for-bit (training, encode, and rank are all
    // deterministic)
    assert(run().map(_.toString).sorted.sameElements(pq.map(_.toString).sorted))
    // codes contract: m entries, each inside its codebook
    val books = Ann.trainPqCodebooks(
      e.select(col("vec_id").as("nn_id"),
        graft.functions.as_double_array(col("embedding")).as("vec")),
      m = 16, ksub = 32, iters = 1, trainFraction = 1.0)
    assert(books.length == 16)
    val dsub = 64 / 16
    val ksubActual = books.head.length / dsub
    val codes = e.limit(50)
      .select(graft.functions.pq_encode(
        graft.functions.as_double_array(col("embedding")),
        typedLit(books.map(_.toSeq).toSeq)).as("c"))
      .collect().map(_.getSeq[Int](0))
    codes.foreach { cs =>
      assert(cs.length == 16)
      cs.foreach(c => assert(c >= 0 && c < ksubActual))
    }
  }

  test("persisted grouped ivf index prunes per tenant and keeps recall") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val path = java.nio.file.Files.createTempDirectory("givfidx").toString
    Ann.buildGroupedIvfIndex(e, "vec_id", "embedding", "label", path,
      nClusters = 8, iters = 2, trainFraction = 1.0)
    // layout: grp=<label>/cluster=<cell> directories
    val grpDirs = new java.io.File(s"$path/assignments").listFiles()
      .filter(_.getName.startsWith("grp="))
    assert(grpDirs.nonEmpty)
    assert(grpDirs.forall(_.listFiles().exists(_.getName.startsWith("cluster="))))
    val res = Ann.searchGroupedIvfIndex(spark, path, q, "vec_id",
      "embedding", "label", k = 5, nProbe = 4)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("grp"),
      s"expected partition pruning on (grp, cluster):\n$plan")
    val exact = Ann.groupedTopK(e, q, "vec_id", "embedding", "label", k = 5)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val got = res.collect()
    val labelOf = e.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach(r =>
      assert(labelOf(r.getAs[Long]("nn_id")) == r.getAs[Int]("grp")))
    val gotSet = got
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val recall = (exact & gotSet).size.toDouble / exact.size
    assert(recall >= 0.8, s"grouped persisted-index recall $recall below gate")
  }

  test("persisted ivfpq index: pruning + compressed scan + append keep recall") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val path = java.nio.file.Files.createTempDirectory("ivfpqidx").toString
    // hold out a slice to append afterwards
    val base = e.filter(col("vec_id") % 7 =!= 0)
    val extra = e.filter(col("vec_id") % 7 === 0)
    Ann.buildIvfPqIndex(base, "vec_id", "embedding", path,
      nClusters = 8, m = 16, ksub = 32, iters = 3, trainFraction = 1.0)
    Ann.appendToIvfPqIndex(extra, "vec_id", "embedding", path)
    val res = Ann.searchIvfPqIndex(spark, path, q, "vec_id", "embedding",
      k = 5, nProbe = 6, refine = 6)
    // probed-cell filter reaches the codes scan as a partition filter
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"),
      s"expected partition pruning on cluster:\n$plan")
    val bf = Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val out = res.collect()
    val got = out.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    // appended vectors are searchable (some appended id should surface
    // across the 20 queries' top-5s given a 1/7 slice)
    assert(got.exists { case (_, nn) => nn % 7 == 0 },
      "appended vectors never surfaced in any top-5")
    val recall = (bf & got).size.toDouble / bf.size
    assert(recall >= 0.8, s"ivfpq recall $recall below gate")
    // oracle-exact (quantized) build+search: same floor over a full
    // build (append path stays double — quantizers fixed either way)
    val pathQ = java.nio.file.Files.createTempDirectory("ivfpqidxq").toString
    Ann.buildIvfPqIndexQuantized(e, "vec_id", "embedding", pathQ,
      nClusters = 8, m = 16, ksub = 32, iters = 3, trainFraction = 1.0)
    val gotQ = Ann.searchIvfPqIndexQuantized(spark, pathQ, q, "vec_id",
        "embedding", k = 5, nProbe = 6, refine = 6).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val recallQ = (bf & gotQ).size.toDouble / bf.size
    assert(recallQ >= 0.8, s"quantized ivfpq recall $recallQ below gate")
    // exact re-rank parity: returned sims equal brute-force sims
    val bfSim = Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id")) ->
        r.getAs[Double]("sim")).toMap
    out.foreach { r =>
      bfSim.get((r.getAs[Long]("query_id"), r.getAs[Long]("nn_id")))
        .foreach(exp => assert(exp == r.getAs[Double]("sim")))
    }
  }

  test("persisted ivf index prunes to probed cells and keeps recall") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val path = java.nio.file.Files.createTempDirectory("ivfidx").toString
    Ann.buildIvfIndex(e, "vec_id", "embedding", path,
      nClusters = 8, iters = 3, trainFraction = 1.0)
    // index layout: one cluster= partition dir per non-empty cell
    val cellDirs = new java.io.File(s"$path/assignments").listFiles()
      .filter(_.getName.startsWith("cluster=")).map(_.getName).toSeq
    assert(cellDirs.nonEmpty && cellDirs.size <= 8)
    val res = Ann.searchIvfIndex(spark, path, q, "vec_id", "embedding",
      k = 5, nProbe = 4)
    // probed-cell filter reaches the scan as a partition filter
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"),
      s"expected partition pruning on cluster:\n$plan")
    val bf = Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val got = res.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val recall = (bf & got).size.toDouble / bf.size
    assert(recall >= 0.8, s"persisted-index recall $recall below gate")
  }

  test("grouped ivf append: per-tenant assignment, new tenants refused") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // seed keeps every tenant (label) so each has a trained quantizer
    val seed = e.filter(col("vec_id") % 5 =!= 0)
    val batch = e.filter(col("vec_id") % 5 === 0)
    val path = java.nio.file.Files.createTempDirectory("givfapp").toString
    Ann.buildGroupedIvfIndex(seed, "vec_id", "embedding", "label", path,
      nClusters = 8, iters = 2, trainFraction = 1.0)
    Ann.appendToGroupedIvfIndex(batch, "vec_id", "embedding", "label", path)
    val q = e.filter(col("vec_id") < 20)
    val got = Ann.searchGroupedIvfIndex(spark, path, q, "vec_id",
        "embedding", "label", k = 5, nProbe = 4).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    assert(got.exists(_._2 % 5 == 0), "no appended vector ever surfaced")
    val exact = Ann.groupedTopK(e, q, "vec_id", "embedding", "label", k = 5)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.8, s"post-append grouped recall $recall below gate")
    // a tenant with no trained quantizer is refused, not dropped
    val alien = batch.withColumn("label", col("label") + 1000)
    intercept[IllegalArgumentException](
      Ann.appendToGroupedIvfIndex(alien, "vec_id", "embedding", "label", path))
  }

  test("ivf append: searches see appended vectors and keep recall over the union") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val seed = e.filter(col("vec_id") % 5 =!= 0)
    val batch = e.filter(col("vec_id") % 5 === 0)
    val path = java.nio.file.Files.createTempDirectory("ivfapp").toString
    Ann.buildIvfIndex(seed, "vec_id", "embedding", path,
      nClusters = 8, iters = 3, trainFraction = 1.0)
    Ann.appendToIvfIndex(batch, "vec_id", "embedding", path)
    val q = e.filter(col("vec_id") < 20)
    val got = Ann.searchIvfIndex(spark, path, q, "vec_id", "embedding",
        k = 5, nProbe = 4).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    // appended vectors are reachable as neighbors
    assert(got.exists(_._2 % 5 == 0), "no appended vector ever surfaced")
    // recall over the UNION corpus holds — the appended cells serve
    // searches exactly like build-time cells
    val bf = Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val recall = (bf & got).size.toDouble / bf.size
    assert(recall >= 0.8, s"post-append recall $recall below gate")
  }

  test("ivf delete: equals survivor-filtered index, emptied cells leave no bytes") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("ivfdel").toString
    val ref = java.nio.file.Files.createTempDirectory("ivfdelref").toString
    Ann.buildIvfIndex(e, "vec_id", "embedding", path,
      nClusters = 8, iters = 3, trainFraction = 1.0)
    // delete every 3rd id PLUS one whole cell — build the exact
    // reference index first: same centroids, survivor assignments
    val asg = spark.read.parquet(s"$path/assignments").localCheckpoint(true)
    val someCell = asg.select("cluster").head().getInt(0)
    val delIds = asg.filter(col("nn_id") % 3 === 0 ||
        col("cluster") === someCell)
      .select("nn_id").collect().map(_.getLong(0)).toSet
    val fs = java.nio.file.Paths.get(ref, "assignments").toString
    asg.filter(!col("nn_id").isin(delIds.toSeq: _*))
      .write.partitionBy("cluster").parquet(fs)
    spark.read.parquet(s"$path/centroids").write.parquet(s"$ref/centroids")
    Ann.deleteFromIvfIndex(spark, path, delIds.toSeq.toDF("vec_id"), "vec_id")
    val q = e.filter(col("vec_id") < 20)
    def res(p: String) = Ann.searchIvfIndex(spark, p, q, "vec_id",
        "embedding", k = 5, nProbe = 4).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("nn_id"), r.getAs[Double]("sim"))).toSet
    val got = res(path)
    assert(got == res(ref), "post-delete search diverges from survivor index")
    assert(!got.exists(r => delIds.contains(r._3)), "deleted id surfaced")
    // the emptied cell's directory is physically gone
    assert(!new java.io.File(s"$path/assignments/cluster=$someCell").exists(),
      "stale bytes survived a full-cell delete")
    // unknown ids: a no-op
    Ann.deleteFromIvfIndex(spark, path, Seq(-5L).toDF("vec_id"), "vec_id")
    assert(res(path) == got)
  }

  test("ivfpq delete: codes and refine vectors both forget the ids") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("ivfpqdel").toString
    Ann.buildIvfPqIndex(e, "vec_id", "embedding", path,
      nClusters = 8, m = 16, ksub = 16, iters = 2, trainFraction = 1.0)
    val q = e.filter(col("vec_id") < 10)
    val before = Ann.searchIvfPqIndex(spark, path, q, "vec_id", "embedding",
        k = 5, nProbe = 4, refine = 4).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id")))
    // delete exactly the ids that were just serving as neighbors
    val delIds = before.map(_._2).distinct.take(10).toSeq
    Ann.deleteFromIvfPqIndex(spark, path, delIds.toDF("vec_id"), "vec_id")
    val after = Ann.searchIvfPqIndex(spark, path, q, "vec_id", "embedding",
        k = 5, nProbe = 4, refine = 4).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id")))
    assert(after.nonEmpty, "index unusable after delete")
    assert(!after.exists(r => delIds.contains(r._2)), "deleted id surfaced")
    // both physical tables forgot the ids
    val codesIds = spark.read.parquet(s"$path/codes")
      .select("nn_id").collect().map(_.getLong(0)).toSet
    val vecIds = spark.read.parquet(s"$path/vectors")
      .select("nn_id").collect().map(_.getLong(0)).toSet
    assert(delIds.forall(id => !codesIds.contains(id) && !vecIds.contains(id)))
  }

  test("quantized ivf/knn/bulk: recall gates unchanged, training deterministic") {
    // the oracle-exact (integer-quantized) variants must hold the SAME
    // recall floors as their double-path twins, and training must be
    // partitioning-independent (run twice over different layouts)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val bf = Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val ivf = Ann.ivfTopKQuantized(e, q, "vec_id", "embedding", k = 5,
        nClusters = 8, nProbe = 4, iters = 3, trainFraction = 1.0).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.8, s"quantized ivf recall $recall below gate")
    // determinism across physical layouts: 1-partition vs 32-partition
    // training must yield identical centroids (exact integer sums)
    val v1 = e.coalesce(1).select(col("vec_id").as("nn_id"),
      graft.functions.as_double_array(col("embedding")).as("vec"),
      col("embedding").as("e0")).withColumn("vq", Ann.quantized(col("e0"))).drop("e0")
    val v32 = e.repartition(32).select(col("vec_id").as("nn_id"),
      graft.functions.as_double_array(col("embedding")).as("vec"),
      col("embedding").as("e0")).withColumn("vq", Ann.quantized(col("e0"))).drop("e0")
    val c1 = Ann.trainCentroidsIntL2(v1, 8, 2, 0.25)
    val c32 = Ann.trainCentroidsIntL2(v32, 8, 2, 0.25)
    assert(c1.length == 8 && c1.zip(c32).forall { case (a, b) => a.sameElements(b) },
      "quantized training diverged across partitionings")
  }

  test("knn graph: bounded degree, no self edges, recall vs brute force") {
    import graft.functions.{as_double_array, cosine_sim, round_portable}
    import org.apache.spark.sql.expressions.Window
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val g = Ann.knnGraph(e, "vec_id", "embedding", k = 5,
      nClusters = 8, iters = 2, trainFraction = 1.0)
    val rows = g.collect()
    assert(rows.forall(_.getLong(1) <= 5), "degree exceeded k")
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)), "self edge")
    val edges = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    // exact kNN via all-pairs (500 vecs -> 250k cosines, fine in-spec)
    val v = e.select(col("vec_id"), as_double_array(col("embedding")).as("vec"))
    val w = Window.partitionBy("id").orderBy(col("cos").desc, col("nb").asc)
    val truth = v.as("a").crossJoin(v.as("b"))
      .filter(col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("id"), col("b.vec_id").as("nb"),
        round_portable(cosine_sim(col("a.vec"), col("b.vec")), 6).as("cos"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (edges & truth).size.toDouble / truth.size
    assert(recall >= 0.6, s"knn-graph recall $recall below gate")
    // oracle-exact variant: same floor
    val gq = Ann.knnGraphQuantized(e, "vec_id", "embedding", k = 5,
        nClusters = 8, iters = 2, trainFraction = 1.0).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recallQ = (gq & truth).size.toDouble / truth.size
    assert(recallQ >= 0.6, s"quantized knn-graph recall $recallQ below gate")
  }

  test("bulk cross-corpus knn: recall vs brute force, no id bleed") {
    import graft.functions.{as_double_array, cosine_sim}
    import org.apache.spark.sql.expressions.Window
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qs = e.filter(col("label") === 0)
    val corpus = e.filter(col("label") =!= 0)
    val got = Ann.bulkTopK(qs, corpus, "vec_id", "embedding", k = 5,
      nClusters = 8, nProbe = 3, iters = 2, trainFraction = 1.0).collect()
    val corpusIds = corpus.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.forall(r => corpusIds.contains(r.getLong(2))),
      "a neighbor came from outside the corpus side")
    val qv = qs.select(col("vec_id").as("query_id"),
      as_double_array(col("embedding")).as("q_vec"))
    val cv = corpus.select(col("vec_id").as("nn_id"),
      as_double_array(col("embedding")).as("vec"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("nn_id").asc)
    val truth = qv.crossJoin(cv)
      .withColumn("sim", round(cosine_sim(col("q_vec"), col("vec")), 4))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val edges = got.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (edges & truth).size.toDouble / truth.size
    assert(recall >= 0.6, s"bulk-knn recall $recall below gate")
    // oracle-exact variant: same floor, same corpus-side containment
    val gotQ = Ann.bulkTopKQuantized(qs, corpus, "vec_id", "embedding", k = 5,
      nClusters = 8, nProbe = 3, iters = 2, trainFraction = 1.0).collect()
    assert(gotQ.forall(r => corpusIds.contains(r.getLong(2))),
      "quantized: a neighbor came from outside the corpus side")
    val edgesQ = gotQ.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recallQ = (edgesQ & truth).size.toDouble / truth.size
    assert(recallQ >= 0.6, s"quantized bulk-knn recall $recallQ below gate")
  }

  test("knn classify: planted clusters vote correctly, ties break low-label") {
    import spark.implicits._
    import graft.operators.Ann
    // two tight direction clusters: label 1 along +x, label 2 along +y
    val labeled = Seq(
      (1L, Array(1.0f, 0.05f), 1), (2L, Array(1.0f, 0.0f), 1),
      (3L, Array(0.95f, 0.1f), 1),
      (4L, Array(0.0f, 1.0f), 2), (5L, Array(0.05f, 1.0f), 2),
      (6L, Array(0.1f, 0.95f), 2))
      .toDF("vec_id", "embedding", "label")
    val queries = Seq(
      (100L, Array(1.0f, 0.1f)),    // x-cluster -> label 1
      (200L, Array(0.1f, 1.0f)))    // y-cluster -> label 2
      .toDF("vec_id", "embedding")
    val out = Ann.knnClassify(labeled, queries, "vec_id", "embedding",
        "label", k = 3).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Int]("pred_label"), r.getAs[Long]("n_votes"))).toMap
    assert(out(100L) == (1, 3L))
    assert(out(200L) == (2, 3L))
    // k=6 uses all neighbors: 3 votes each, tie -> smaller label wins
    val tied = Ann.knnClassify(labeled, queries, "vec_id", "embedding",
        "label", k = 6).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Int]("pred_label")).toMap
    assert(tied(100L) == 1 && tied(200L) == 1)
  }

  test("top_centroids survives NaN similarities; hyperplane_lsh bounds bits") {
    import spark.implicits._
    // NaN query vector: every cosine is NaN; selection must still emit
    // nProbe deterministic indices (lowest-first) instead of crashing
    val cents = array(
      array(lit(1.0), lit(0.0)), array(lit(0.0), lit(1.0)),
      array(lit(1.0), lit(1.0)))
    val got = Seq(Tuple1(Seq(Double.NaN, 1.0))).toDF("v")
      .select(graft.functions.top_centroids(col("v"), cents, 2).as("c"))
      .head().getSeq[Int](0)
    assert(got == Seq(0, 1), s"expected deterministic fallback, got $got")
    // bits outside [1, 64] would silently wrap the bucket-bit shift
    val err = intercept[Exception] {
      Seq(Tuple1(Seq(1.0, 2.0))).toDF("v")
        .select(graft.functions.hyperplane_lsh(col("v"), 65)).head()
    }
    assert(err.getMessage.contains("hyperplane_lsh") ||
      err.getCause != null, s"unexpected error: ${err.getMessage}")
  }

  test("hyperplane_probes survives NaN and zero vectors deterministically") {
    import spark.implicits._
    // zero vector: every margin is exactly 0 — ties break by plane
    // index, so the flip order is planes 0,1,2 and the result is
    // stable at any parallelism
    def probes(v: Seq[Double]) = Seq(Tuple1(v)).toDF("v")
      .select(graft.functions.hyperplane_probes(col("v"), 4, 4).as("p"))
      .head().getSeq[Long](0)
    val z = probes(Seq(0.0, 0.0, 0.0))
    assert(z.size == 4 && z.toSet.size == 4)
    z.tail.zipWithIndex.foreach { case (b, i) =>
      assert((b ^ z.head) == (1L << i), "zero margins flip planes in index order")
    }
    assert(z == probes(Seq(0.0, 0.0, 0.0)), "deterministic on re-eval")
    // NaN vector: all margins NaN; must still emit nProbe distinct
    // one-bit-flip buckets rather than crash or repeat
    val nan = probes(Seq(Double.NaN, 1.0))
    assert(nan.size == 4 && nan.toSet.size == 4)
    nan.tail.foreach(b =>
      assert(java.lang.Long.bitCount(b ^ nan.head) == 1))
  }

  test("multi-probe lsh: superset of single-probe, recall strictly helped") {
    val e = table("embeddings")
    val q = e.filter(col("vec_id") < 30)
    val bf = Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val single = pairs(Ann.lshTopK(e, q, "vec_id", "embedding", k = 3, bits = 4))
    val multi = pairs(Ann.lshMultiProbeTopK(e, q, "vec_id", "embedding",
      k = 3, bits = 4, nProbe = 4))
    val rs = (bf & single).size.toDouble / bf.size
    val rm = (bf & multi).size.toDouble / bf.size
    assert(rm >= rs, s"multi-probe recall $rm below single-probe $rs")
    assert(rm > rs, s"4 probes over 16 buckets should strictly improve " +
      s"recall on this corpus (single $rs, multi $rm)")
    // probe-list contract: first probe IS the home bucket; the others
    // differ from it in exactly one bit each, all distinct
    val probes = e.limit(5)
      .select(graft.functions.hyperplane_probes(
        graft.functions.as_double_array(col("embedding")), 4, 4).as("p"),
        graft.functions.hyperplane_lsh(
          graft.functions.as_double_array(col("embedding")), 4).as("b"))
      .collect()
    probes.foreach { r =>
      val p = r.getSeq[Long](0)
      assert(p.head == r.getLong(1), "first probe must be the home bucket")
      assert(p.toSet.size == p.size, "probe buckets must be distinct")
      p.tail.foreach(x =>
        assert(java.lang.Long.bitCount(x ^ p.head) == 1,
          "first-order probes differ from home in exactly one bit"))
    }
  }

  test("hard negatives: never the anchor's label, ranked by sim, k-bounded") {
    val e = table("embeddings")
    val labelOf = e.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = Ann.hardNegatives(e, e.filter(col("vec_id") < 10), "vec_id",
      "embedding", "label", k = 4).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (q, n) = (r.getAs[Long]("query_id"), r.getAs[Long]("neg_id"))
      assert(labelOf(n) != labelOf(q), s"negative $n shares $q's label")
      assert(r.getAs[Int]("neg_label") == labelOf(n))
    }
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { rows =>
      assert(rows.length <= 4)
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.sameElements(sims.sortBy(-_.toDouble)), "ranks follow sim desc")
    }
    // the mined negatives are HARD: rank-1 negative sim must meet or
    // beat the anchor's median same-label sim (near-miss property)
    val bf = Ann.bruteForceTopK(e, e.filter(col("vec_id") < 10), "vec_id",
      "embedding", k = 40).collect()
    val hardest = byQ.map { case (q, rows) =>
      q -> rows.filter(_.getAs[Int]("rank") == 1).head.getAs[Double]("sim") }
    hardest.foreach { case (q, s) =>
      val sameLabel = bf.filter(r => r.getAs[Long]("query_id") == q &&
        labelOf(r.getAs[Long]("nn_id")) == labelOf(q)).map(_.getAs[Double]("sim"))
      if (sameLabel.nonEmpty) {
        val med = sameLabel.sorted.apply(sameLabel.length / 2)
        assert(s >= med,
          s"anchor $q: hardest negative $s below same-label median $med")
      }
    }
  }

  // ---- L7h: measured recall curves / parameter auto-tuning ----

  test("probe recall curve is monotone, ends at 1.0, and predicts ivf recall") {
    val e = table("embeddings")
    val v = e.select(col("vec_id").as("nn_id"),
      graft.functions.as_double_array(col("embedding")).as("vec"))
    val cents = Ann.trainCentroids(v, nClusters = 8, iters = 3,
      trainFraction = 1.0)
    val curve = Ann.probeRecallCurve(e, "vec_id", "embedding", k = 5, cents,
      sampleSize = 32)
    assert(curve.length == 8)
    assert(curve.zip(curve.tail).forall { case (a, b) => a <= b },
      s"curve not monotone: ${curve.mkString(",")}")
    assert(math.abs(curve.last - 1.0) < 1e-12,
      "probing every cell must reach every true neighbor")
    // the tuned depth's ACTUAL recall on the sampled queries clears the
    // floor the tuner promised (the curve is exact for those queries)
    val p = Ann.tuneNProbe(e, "vec_id", "embedding", k = 5, cents,
      recallFloor = 0.8, sampleSize = 32)
    assert(p >= 1 && p <= 8)
    assert(curve(p - 1) >= 0.8 || p == 8)
    if (p > 1) assert(curve(p - 2) < 0.8, s"tuner overshot: nProbe $p")
  }

  test("auto-tuned ivf keeps recall >= floor vs brute force") {
    val e = table("embeddings")
    val q = e.filter(col("vec_id") < 20)
    val bf = Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val auto = Ann.ivfTopKAuto(e, q, "vec_id", "embedding", k = 5,
        nClusters = 8, iters = 3, trainFraction = 1.0, recallFloor = 0.9,
        sampleSize = 64).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val recall = (bf & auto).size.toDouble / bf.size
    assert(recall >= 0.8, s"auto-tuned ivf recall $recall below gate")
    // oracle-exact variant: same floor, tuner decision deterministic
    val autoQ = Ann.ivfTopKAutoQuantized(e, q, "vec_id", "embedding", k = 5,
        nClusters = 8, iters = 3, trainFraction = 1.0,
        recallPerMille = 900, sampleSize = 64).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val recallQ = (bf & autoQ).size.toDouble / bf.size
    assert(recallQ >= 0.8, s"quantized auto-ivf recall $recallQ below gate")
  }

  test("cluster purity: totals, bounds, true majority labels") {
    val e = table("embeddings")
    val out = Ann.clusterPurity(e, "vec_id", "embedding", "label",
      nClusters = 8, iters = 2, trainFraction = 1.0).collect()
    assert(out.length == 8)
    assert(out.map(_.getAs[Long]("n_vecs")).sum == e.count())
    val shares = out.map(_.getAs[Long]("share_pm"))
    assert(shares.sum <= 1000L && shares.sum > 1000L - out.length)
    val nLabels = e.select("label").distinct().count()
    out.foreach { r =>
      val p = r.getAs[Long]("purity_pm")
      // the modal label's share is at least 1/nLabels (pigeonhole)
      assert(p >= 1000L / nLabels - 1 && p <= 1000L, s"purity $p out of range")
      assert(r.getAs[Long]("n_top") <= r.getAs[Long]("n_vecs"))
    }
    // the reported majority really is the cell's modal label
    val centsV = e.select(col("vec_id").as("nn_id"),
      graft.functions.as_double_array(col("embedding")).as("vec"),
      Ann.quantized(col("embedding")).as("vq"))
    val cents = Ann.trainCentroidsIntL2(centsV, 8, 2, 1.0)
    val asg = centsV
      .withColumn("cluster", graft.functions.nearest_centroid_l2(col("vq"),
        org.apache.spark.sql.functions.typedLit(cents.map(_.toSeq).toSeq)))
      .join(e.select(col("vec_id").as("nn_id"), col("label")), "nn_id")
      .collect().map(r => r.getAs[Int]("cluster") -> r.getAs[Int]("label"))
      .groupBy(_._1)
    out.foreach { r =>
      val c = r.getAs[Int]("cluster")
      val hist = asg(c).groupBy(_._2).view.mapValues(_.size).toMap
      val best = hist.toSeq.sortBy { case (l, n) => (-n, l) }.head
      assert(r.getAs[Int]("top_label") == best._1 &&
        r.getAs[Long]("n_top") == best._2.toLong)
    }
  }

  test("assign recall curve matches knn-graph edge discovery exactly") {
    val e = table("embeddings")
    val v = e.select(col("vec_id").as("nn_id"),
      graft.functions.as_double_array(col("embedding")).as("vec"))
    val cents = Ann.trainCentroids(v, nClusters = 8, iters = 3,
      trainFraction = 1.0)
    val curve = Ann.assignRecallCurve(e, "vec_id", "embedding", k = 5, cents,
      sampleSize = 32)
    assert(curve.length == 8 && math.abs(curve.last - 1.0) < 1e-12)
    assert(curve.zip(curve.tail).forall { case (a, b) => a <= b })
    // symmetric discovery is at least as easy as one-sided probing: the
    // pair is found if EITHER ordering reaches the shared cell first
    val probe = Ann.probeRecallCurve(e, "vec_id", "embedding", k = 5, cents,
      sampleSize = 32)
    // curves come from the same sampled truth set, so compare pointwise:
    // shared top-1 cell (assign) is strictly harder than nb-cell-in-top-1
    // is false in general, but depth C equality must hold and depth-a
    // assign recall can exceed probe recall (two chances to meet)
    assert(curve.last == probe.last)
    val a = Ann.tuneNAssign(e, "vec_id", "embedding", k = 5, cents,
      recallFloor = 0.8, sampleSize = 32)
    assert(a >= 1 && a <= 8)
    assert(curve(a - 1) >= 0.8 || a == 8)
  }

  test("auto-tuned knn graph keeps recall >= floor vs brute force") {
    val e = table("embeddings")
    val ids = e.select(col("vec_id")).limit(40)
    val bf = Ann.bruteForceTopK(e, e.join(ids, "vec_id"), "vec_id",
        "embedding", k = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val g = Ann.knnGraphAuto(e, "vec_id", "embedding", k = 3,
        nClusters = 8, iters = 3, trainFraction = 1.0, recallFloor = 0.9,
        sampleSize = 64)
      .join(ids.select(col("vec_id").as("id")), "id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("nb"))).toSet
    val recall = (bf & g).size.toDouble / bf.size
    assert(recall >= 0.8, s"auto-tuned knn-graph recall $recall below gate")
  }

  test("bitext margin mining: twins mined, non-aligned pairs score below") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 16
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n).toSeq
    }
    val base = (0 until 10).map(_ => Array.fill(dim)(rnd.nextGaussian()))
    // A = even ids; B = odd-id noisy twins of each A row, except id 17
    // (src 16 has no twin), plus a HUB (id 1001) = the mean direction,
    // moderately similar to everything
    val aRows = base.zipWithIndex.map { case (v, i) => (i.toLong * 2, unit(v)) }
    val bRows = base.zipWithIndex.collect {
      case (v, i) if i != 8 =>
        (i.toLong * 2 + 1,
          unit(v.map(x => x + rnd.nextGaussian() * 0.05)))
    } :+ (1001L, unit(Array.tabulate(dim)(d => base.map(_(d)).sum)))
    val a = aRows.toDF("vec_id", "embedding")
    val b = bRows.toDF("vec_id", "embedding")
    val mined = Ann.marginPairs(a, b, "vec_id", "embedding", k = 3,
      minMarginQ = 0L).collect()
    val pair = mined.map(r =>
      r.getAs[Long]("src_id") -> r.getAs[Long]("tgt_id")).toMap
    val marg = mined.map(r =>
      r.getAs[Long]("src_id") -> r.getAs[Long]("margin_q")).toMap
    // every twinned source mines exactly its twin
    base.indices.filter(_ != 8).foreach { i =>
      assert(pair(i.toLong * 2) == i.toLong * 2 + 1,
        s"src ${i * 2} mined ${pair(i.toLong * 2)}, expected twin ${i * 2 + 1}")
    }
    // the twinless source has only non-aligned candidates (the hub or
    // stray near-orthogonal vectors) — whatever it mines, the margin
    // criterion scores it BELOW every true twin pair
    val twinMargins = base.indices.filter(_ != 8).map(i => marg(i.toLong * 2))
    assert(twinMargins.min > marg(16L),
      s"non-aligned margin ${marg(16L)} not below twin margins " +
        s"(min ${twinMargins.min})")
    // partitioning invariance (integer margins, deterministic argmax)
    val re = Ann.marginPairs(a.repartition(5), b.repartition(3),
        "vec_id", "embedding", k = 3, minMarginQ = 0L)
      .collect().map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"),
        r.getAs[Long]("margin_q"))).toSet
    assert(re == mined.map(r => (r.getAs[Long]("src_id"),
      r.getAs[Long]("tgt_id"), r.getAs[Long]("margin_q"))).toSet)
  }

  test("bitext mining scale path recovers the exact path's twin pairs") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val a = e.filter(col("vec_id") % 2 === 0)
    val b = e.filter(col("vec_id") % 2 =!= 0)
    val exact = Ann.marginPairs(a, b, "vec_id", "embedding", k = 4,
        minMarginQ = 1000000L).collect()
      .map(r => r.getAs[Long]("src_id") -> r.getAs[Long]("tgt_id")).toMap
    // cluster-keyed candidates instead of the broadcast brute force:
    // neither corpus broadcasts; the mined pair set must substantially
    // agree (candidate recall is the only difference)
    val approx = Ann.marginPairs(a, b, "vec_id", "embedding", k = 4,
        minMarginQ = 1000000L, exact = false,
        nClusters = 8, nProbe = 4).collect()
      .map(r => r.getAs[Long]("src_id") -> r.getAs[Long]("tgt_id")).toMap
    assert(approx.nonEmpty)
    val agree = exact.count { case (s, t) => approx.get(s).contains(t) }
    val recall = agree.toDouble / exact.size
    assert(recall >= 0.6,
      s"approx bitext path recovered $agree/${exact.size} exact pairs")
  }

  test("jl projection is integral and partition-invariant") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      Ann.jlProject(df, "vec_id", "embedding", 64, 16)
        .select(col("vec_id"), col("pvec")).collect()
        .map(r => (r.getAs[Long]("vec_id"),
          r.getAs[Seq[Double]]("pvec").toList)).sortBy(_._1).toSeq
    val a = run(e)
    assert(a == run(e.repartition(7)))
    assert(a.head._2.length == 16)
    assert(a.forall(_._2.forall(x => x == math.rint(x))),
      "projected coordinates must be exact integers")
  }

  test("jl audit equals a local integer recomputation, recall flags included") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val out = Ann.jlTopKAudit(e, e.filter(col("vec_id") < 8), "vec_id",
        "embedding", k = 10, inDim = 64, outDim = 16)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("nn_id"), r.getAs[Long]("dist_proj"),
        r.getAs[Int]("hit"))).toSeq
    val vecs = e.select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding")
          .map(x => math.floor(x.toDouble * 65536 + 0.5)).toArray)
      .toMap
    val mat = Ann.jlSignMatrix(64, 16)
    def proj(v: Array[Double]): Array[Double] =
      mat.map(row => row.zip(v).map { case (s, x) => s * x }.sum)
    val pvecs = vecs.map { case (id, v) => id -> proj(v) }
    def sqd(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = vecs.keys.filter(_ < 8).toSeq.sorted.flatMap { qid =>
      val others = vecs.keys.filter(_ != qid).toSeq
      val fullK = others.map(id => (sqd(vecs(qid), vecs(id)), id))
        .sorted.take(10).map(_._2).toSet
      others.map(id => (sqd(pvecs(qid), pvecs(id)), id))
        .sorted.take(10).zipWithIndex.map { case ((d, id), i) =>
          (qid, i + 1, id, d.toLong, if (fullK(id)) 1 else 0) }
    }
    assert(out == expected)
    // the synthetic embeddings are isotropic — the JL worst case for
    // RANKING (distances concentrate; measured recall@10 ~0.13 at 16
    // dims). The audit exists to SURFACE that number; the guard only
    // pins it well above the k/(n-1) random floor (~0.02).
    val meanRecall = out.map(_._5).sum.toDouble / out.size
    val randomFloor = 10.0 / (vecs.size - 1)
    assert(meanRecall > 3 * randomFloor,
      s"JL recall@10 $meanRecall should clear 3x the random floor $randomFloor")
  }

  test("jl: an exact duplicate is rank-1 in the projected space, dist 0, hit") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0L until 20L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = (base :+ ((99L, base.head._2.clone))).toDF("vec_id", "embedding")
    val out = Ann.jlTopKAudit(df, df.filter(col("vec_id") === 0L), "vec_id",
        "embedding", k = 3, inDim = 64, outDim = 16)
      .orderBy("rank").collect()
    assert(out.head.getAs[Long]("nn_id") == 99L)
    assert(out.head.getAs[Long]("dist_proj") == 0L)
    assert(out.head.getAs[Int]("hit") == 1)
  }

  test("jl_project_q16 is value-identical to per-row quantized dot products") {
    // The fused kernel replaced outDim sibling dot_product(vq, row_j)
    // columns (the CollapseProject re-evaluation hazard q_ann_jl's r12
    // re-pin absorbed); every coordinate is an exact integer, so the
    // two forms must agree exactly.
    import graft.functions.{dot_product, jl_project_q16, quantize_q16}
    import org.apache.spark.sql.functions.typedLit
    val (inDim, outDim) = (64, 16)
    val mat = Ann.jlSignMatrix(inDim, outDim)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(100)
    val both = e.select(
      jl_project_q16(col("embedding"), inDim, outDim).as("fused"),
      array(mat.toIndexedSeq.map(row =>
        dot_product(quantize_q16(col("embedding")), typedLit(row.toSeq))): _*)
        .as("unfused"))
    assert(both.filter(col("fused") =!= col("unfused")).isEmpty,
      "fused JL projection diverged from the unfused form")
  }

  test("prototypicality: outlier lands in tail, ranks follow distance, bands partition") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = Array.fill(16)(rnd.nextFloat() * 0.1f)
    // 20 near-copies of a prototype + 1 far outlier, one cell
    val rows = (0L until 20L).map { i =>
      (i, base.zipWithIndex.map { case (x, j) =>
        x + (if (j == (i % 16).toInt) 0.001f * (i + 1) else 0f) })
    } :+ ((99L, Array.fill(16)(0.9f)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Ann.prototypicality(df, "vec_id", "embedding",
        nClusters = 1, iters = 1, headPermille = 100, tailPermille = 100)
      .orderBy("rk").collect()
    assert(out.length == 21)
    // ranks are 1..n and dist_q is nondecreasing along them
    assert(out.map(_.getAs[Long]("rk")).toSeq == (1L to 21L))
    val dists = out.map(_.getAs[Long]("dist_q"))
    assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    // the planted outlier is the farthest row and lands in the tail band
    assert(out.last.getAs[Long]("vec_id") == 99L)
    assert(out.last.getAs[String]("band") == "tail")
    // band sizes: head = floor-bound 2, tail = 3, keep = the rest
    val bands = out.groupBy(_.getAs[String]("band")).view.mapValues(_.length).toMap
    assert(bands("head") == 2 && bands("tail") == 3 && bands("keep") == 16,
      s"band partition wrong: $bands")
  }

  test("numeric-vector kernels fail analysis on non-float/double arrays") {
    import spark.implicits._
    import graft.functions.{as_double_array, l2_norm, quantize_q16}
    val ints = Seq((1L, Array(1, 2, 3))).toDF("id", "v")
    Seq(l2_norm(col("v")), quantize_q16(col("v")), as_double_array(col("v")))
      .foreach { c =>
        val err = intercept[org.apache.spark.sql.AnalysisException] {
          ints.select(c).collect()
        }
        assert(err.getMessage.contains("array<float> or array<double>"),
          s"wrong analysis error: ${err.getMessage}")
      }
  }
}
