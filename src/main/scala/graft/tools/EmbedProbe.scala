package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Stage decomposition of q_embed_train (r16 measurement). */
object EmbedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "embed-probe")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ep] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    graft.SparkEntry.prime(spark, sfDir, Set("q_embed_train"))
    // replicate the query body piecewise
    val w = time("walk table read + count") {
      val w = spark.read.parquet(
        "spark-warehouse/graft_walks_" +
          graft.queries.RelationalQueries.dirKey(sfDir))
      w.count(); w
    }
    val sg = time("sg pair join+agg+pin") {
      w.as("a").join(w.as("b"),
          col("a.start") === col("b.start") &&
            col("a.walk") === col("b.walk") &&
            col("a.step") =!= col("b.step") &&
            abs(col("a.step") - col("b.step")) <= 2)
        .groupBy(col("a.node").as("center"), col("b.node").as("context"))
        .agg(count(lit(1)).as("n_pairs"))
        .transform(graft.operators.Lineage.pin)
    }
    println("[ep] sg rows " + sg.count())
    val pos = sg.select(col("center"), col("context").as("x"),
      lit(1L).as("y"))
    val neg = time("negativeSamples build") {
      val n = graft.operators.Walk.negativeSamples(sg, "center",
          "context", "n_pairs", k = 5)
        .select(col("center"), col("neg_node").as("x"), lit(0L).as("y"))
      n.write.format("noop").mode("overwrite").save(); n
    }
    val emb = time("skipgramSgd rounds") {
      graft.operators.Train.skipgramSgd(pos.unionByName(neg),
        "center", "x", "y", dims = 8, rounds = 2)
    }
    time("final orderBy + noop") {
      emb.orderBy("node", "d").write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
