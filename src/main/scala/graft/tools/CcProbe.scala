package graft.tools

import org.apache.spark.sql.functions._

/** Scratch decomposition of Dedup.clusters cost (r17 measurement). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "cc-probe")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    graft.SparkEntry.prime(spark, sfDir, Set("q_pipeline_e2e"))
    import graft.operators.{Curate, Dedup, Lineage}
    import graft.queries.RelationalQueries.t
    val d = t(spark, sfDir, "documents")
    val keep = time("s1") {
      val k = Curate.gopherFlags(d, "doc_id", "text", stopWords = Seq("the", "a"))
        .filter(col("keep") === 1).select("doc_id")
      Lineage.pin(d.join(k, "doc_id").select("doc_id", "lang", "text"))
    }
    def pairs = spark.read.parquet(
        "spark-warehouse/graft_pairs_" + graft.queries.RelationalQueries.dirKey(sfDir))
      .join(keep.select(col("doc_id").as("doc_id1")), "doc_id1")
      .join(keep.select(col("doc_id").as("doc_id2")), "doc_id2")
    (1 to 4).foreach { i =>
      time(s"clusters rep$i") {
        Dedup.clusters(pairs).write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
