package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Pack, Sessionize, Sketch}
import graft.queries.RelationalQueries

/** End-to-end event-log analytics over the library surface — the
  * behavioral-data companion to [[PipelineDemo]]'s document pipeline:
  * read → sessionize → funnel conversion → cohort retention →
  * per-type value percentiles (mergeable sketches) → training-sequence
  * construction. One line per stage.
  * `sbt "runMain graft.tools.EventDemo [sfDir]"`
  */
object EventDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"),
      "event-demo")
    def line(name: String, v: String): Unit = println(f"[events] $name%-22s $v")

    val ev = RelationalQueries.t(spark, sfDir, "events")
    line("ingest", s"${ev.count()} events, " +
      s"${ev.select("user_id").distinct().count()} users")

    // gaps-and-islands sessionization (60 s gap, event-time nanos)
    val sessions = Sessionize.plain(ev, "user_id", 60000000000L)
    val sStats = sessions.agg(count(lit(1)).as("n"),
      avg("n_events").as("len")).head()
    line("sessions (60s gap)", f"${sStats.getLong(0)} sessions, " +
      f"${sStats.getDouble(1)}%.1f events/session")

    // ordered funnel: view -> click -> purchase
    val funnel = Sessionize.funnelReport(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("stage_idx").collect()
    funnel.foreach { r =>
      line(s"funnel ${r.getAs[String]("stage")}",
        s"${r.getAs[Long]("n_users")} users " +
          s"(${r.getAs[Long]("conv_per_mille")} per-mille)")
    }

    // cohort retention: day-0 size and day-1/2 retention of the first cohort
    val day = expr("ts div 86400000000000L")
    val firstDay = ev.select(col("user_id"), day.as("day"))
      .groupBy("user_id").agg(min("day").as("cohort_day"))
    val ret = ev.select(col("user_id"), day.as("day"))
      .join(firstDay, "user_id")
      .groupBy("cohort_day", "day").agg(countDistinct("user_id").as("n"))
      .orderBy("cohort_day", "day").limit(3).collect()
    line("cohort retention", ret.map(r =>
      s"d${r.getLong(1) - r.getLong(0)}=${r.getLong(2)}").mkString(" "))

    // per-type value percentiles from the mergeable grouped sketch
    val cents = ev.select(col("event_type"),
      floor(col("value") * 100).cast("long").as("c"))
    val qs = Sketch.quantilesBy(
        Sketch.logHistogramBy(cents, "event_type", "c"), Seq(500, 990))
      .orderBy("key", "q").collect()
    qs.groupBy(_.getAs[String]("key")).toSeq.sortBy(_._1).foreach {
      case (k, rows) =>
        line(s"value sketch $k", rows.sortBy(_.getAs[Long]("q")).map(r =>
          s"p${r.getAs[Long]("q") / 10}<=${r.getAs[Long]("hi")}c").mkString(" "))
    }

    // training sequences: 32-event rows per user
    val seqs = Pack.eventSequences(ev, "user_id", "ts", "event_id",
      "event_type", seqLen = 32)
    val sq = seqs.agg(count(lit(1)), sum("n_events")).head()
    line("training sequences", s"${sq.getLong(0)} rows " +
      s"covering ${sq.getLong(1)} events")

    // r9 third push: the incremental daily path — last 20% of the log
    // merges into the persisted session frames (no history re-shuffle),
    // provably equal to the full recompute
    val bounds = ev.agg(min("ts"), max("ts")).head()
    val cutoff = bounds.getLong(0) + (bounds.getLong(1) - bounds.getLong(0)) / 5L * 4L
    val prior = Sessionize.sessionFrames(
      ev.filter(col("ts") < cutoff), "user_id", 60000000000L)
    val inc = Sessionize.finishFrames(
      Sessionize.incremental(prior, ev.filter(col("ts") >= cutoff),
        "user_id", 60000000000L), "user_id")
    line("incremental merge", s"${inc.count()} sessions " +
      s"(= ${sessions.count()} from full recompute)")

    // concurrency profile: peak simultaneous sessions per day via the
    // distributed sweep line
    val conc = graft.operators.Sweep.concurrency(
        Sessionize.sessionFrames(ev, "user_id", 60000000000L),
        "start_ts", "end_ts", 86400000000000L)
      .agg(max("peak")).head().getLong(0)
    line("peak concurrency", s"$conc simultaneous sessions")

    // bounded funnel: the 1h-window conversion next to the unbounded one
    val bf = Sessionize.funnelReport(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), withinNs = 3600000000000L)
      .orderBy("stage_idx").collect()
    line("funnel (1h bound)", bf.map(r =>
      s"${r.getAs[String]("stage")}=${r.getAs[Long]("n_users")}").mkString(" "))

    // event-type transition matrix: the top next-event probability
    val byTime = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val topTrans = ev.withColumn("prev", lag("event_type", 1).over(byTime))
      .filter(col("prev").isNotNull)
      .groupBy("prev", "event_type").count()
      .orderBy(desc("count")).head()
    line("top transition", s"${topTrans.getString(0)} -> " +
      s"${topTrans.getString(1)} (${topTrans.getLong(2)} times)")
    spark.stop()
  }
}
