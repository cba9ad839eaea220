package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.operators.Observe

class ObserveSpec extends SparkSpec {

  test("funnel metrics equal per-stage counts, from one terminal action") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val stages: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
      "ingest" -> identity,
      "lang_en" -> (_.filter(col("lang") === "en")),
      "min_len" -> (_.filter(length(col("text")) >= 200)))
    // independent truth: one count() per stage
    val expected = stages.scanLeft(d) { case (df, (_, f)) => f(df) }
      .drop(1).map(_.count())

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val (fin, obs) = Observe.funnel(d, stages)
      fin.write.format("noop").mode("overwrite").save()
      // listener delivery is async; wait for the count to go stable
      var last = -1
      while (jobs.get() != last) { last = jobs.get(); Thread.sleep(200) }
      // all three stage metrics were populated by the single write —
      // the noop sink runs O(1) jobs, nowhere near one scan per stage
      assert(jobs.get() <= 2, s"expected a single-action funnel, saw ${jobs.get()} jobs")
      val rep = Observe.report(spark, obs).orderBy("stage_idx").collect()
      assert(rep.map(_.getString(1)).toSeq === stages.map(_._1))
      assert(rep.map(_.getLong(2)).toSeq === expected)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("extra aggregate columns ride the same pass") {
    import spark.implicits._
    val d = Seq(("a", 2L), ("b", 3L), ("c", 5L)).toDF("k", "v")
    val (out, obs) = Observe.stage(d, "sums",
      sum(col("v")).as("v_sum"), max(col("v")).as("v_max"))
    out.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("rows") === 3L && m("v_sum") === 10L && m("v_max") === 5L)
  }

  test("report fails loudly when no action ran; duplicate stage names rejected") {
    import spark.implicits._
    val d = Seq(1, 2).toDF("x")
    val (_, obs) = Observe.funnel(d, Seq("only" -> identity))
    val e = intercept[IllegalArgumentException](
      Observe.report(spark, obs, scala.concurrent.duration.Duration(2, "s")))
    assert(e.getMessage.contains("never populated"))
    intercept[IllegalArgumentException](
      Observe.funnel(d, Seq("dup" -> identity, "dup" -> identity)))
  }
}
