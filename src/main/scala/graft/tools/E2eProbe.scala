package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Stage decomposition of q_pipeline_e2e (r16 measurement). */
object E2eProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "e2e-probe")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[e2] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    graft.SparkEntry.prime(spark, sfDir, Set("q_pipeline_e2e"))
    time("whole query x1") {
      graft.SparkEntry.queries("q_pipeline_e2e")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    import graft.operators.{Curate, Dedup, Lineage, Pack}
    import graft.queries.RelationalQueries.t
    val d = t(spark, sfDir, "documents")
    val keep = time("s1 gopher") {
      val k = Curate.gopherFlags(d, "doc_id", "text",
          stopWords = Seq("the", "a"))
        .filter(col("keep") === 1).select("doc_id")
      Lineage.pin(d.join(k, "doc_id").select("doc_id", "lang", "text"))
    }
    val s2 = time("s2 cluster dedup") {
      val pairs = spark.read.parquet(
          "spark-warehouse/graft_pairs_" +
            graft.queries.RelationalQueries.dirKey(sfDir))
        .join(keep.select(col("doc_id").as("doc_id1")), "doc_id1")
        .join(keep.select(col("doc_id").as("doc_id2")), "doc_id2")
      Lineage.pin(Dedup.removeNearDupsClusteredLabels(
        keep, "doc_id", Dedup.clusters(pairs)))
    }
    val s3 = time("s3 winnow decontam") {
      val eval = d.filter(col("doc_id") % 23 === 0)
      val train = s2.filter(col("doc_id") % 23 =!= 0)
      val flagged = Dedup.winnowedAgainst(train, "doc_id", "text",
          eval, "doc_id", "text", k = 8, w = 16,
          minShared = 8L, maxDf = 16L)
        .select(col("id").as("doc_id")).distinct()
      Lineage.pin(train.join(flagged, Seq("doc_id"), "left_anti"))
    }
    val s4 = time("s4 mix") {
      val rates = Curate.mixThresholds(s3, "lang",
        when(col("lang") === "en", lit(0.4)).otherwise(lit(0.15)))
      Lineage.pin(s3.join(broadcast(rates), "lang")
        .filter(substring(md5(col("text")), 1, 4) < col("thr"))
        .select("doc_id", "lang", "text"))
    }
    (1 to 3).foreach { i =>
      time(s"s2 clusters only rep$i") {
        val pairs = spark.read.parquet(
            "spark-warehouse/graft_pairs_" +
              graft.queries.RelationalQueries.dirKey(sfDir))
          .join(keep.select(col("doc_id").as("doc_id1")), "doc_id1")
          .join(keep.select(col("doc_id").as("doc_id2")), "doc_id2")
        Dedup.clusters(pairs).write.format("noop").mode("overwrite").save()
      }
    }
    time("s5 pack + union + noop") {
      Pack.assignShards(s4, "doc_id", graft.functions.token_count(col("text")),
          budgetTokens = 4096, buckets = 32)
        .groupBy("shard").agg(count(lit(1)).as("sc"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
