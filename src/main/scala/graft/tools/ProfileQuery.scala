package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions._

/** One-query timing loop + stage breakdown for the jaccard family. */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q_dedup_ngram"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "profile1")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[p1] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
    }
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val B = 8
    val toks = d.select(col("doc_id").as("id"),
        shingle_id_set(tokenize_ws(col("text")), 3).as("ids"), col("lang"))
      .withColumn("bkt", pmod(col("id"), lit(B)).cast("int"))
    time("shingle sets")(toks.count())
    time("avg set size")(toks.agg(avg(size(col("ids")))).collect()
      .head.getDouble(0).toLong)
    val a = toks.withColumn("bv", explode(sequence(col("bkt"), lit(B - 1))))
      .withColumnRenamed("bkt", "bu").as("a")
    val b = toks.withColumn("bu", explode(sequence(lit(0), col("bkt"))))
      .withColumnRenamed("bkt", "bv").as("b")
    val joined = a.join(b, col("a.lang") === col("b.lang") &&
      col("a.bu") === col("b.bu") && col("a.bv") === col("b.bv") &&
      (col("a.bu") < col("a.bv") || col("a.id") < col("b.id")))
    time("pairs, arrays riding")(joined.select(col("a.id")).count())
    time("pairs + jaccard")(joined
      .withColumn("jac", jaccard_sorted(col("a.ids"), col("b.ids")))
      .filter(col("jac") >= 0.8).count())
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[p1] $name full run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
