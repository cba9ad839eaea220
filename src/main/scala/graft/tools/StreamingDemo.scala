package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.GraftSession
import graft.queue.ParquetQueue
import graft.schema.{GraftSchema, GraftType}
import graft.streaming.QueueStreaming

/** Example: push events into a ParquetQueue, consume them with the
  * Structured Streaming subscriber, and run the streaming operators
  * (windowed stats, sessionization, dedup) on the live stream.
  * Run with `sbt "runMain graft.tools.StreamingDemo"`.
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("4", "streaming-demo")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-sdemo").toString
    val schema = GraftSchema(("user_id", GraftType.INTEGER),
      ("event_id", GraftType.INTEGER), ("ts_ms", GraftType.INTEGER),
      ("value", GraftType.REAL))
    val q = new ParquetQueue(spark, dir, schema)

    // two bursts per user, 2s apart; duplicate event_id 4 re-delivered
    q.push(Seq((1L, 1L, 1000L, 1.0), (1L, 2L, 1400L, 2.0),
      (2L, 3L, 1200L, 7.0)).toDF("user_id", "event_id", "ts_ms", "value"))
    q.push(Seq((1L, 4L, 9000L, 5.0), (1L, 4L, 9000L, 5.0),
      (2L, 5L, 9500L, 1.0)).toDF("user_id", "event_id", "ts_ms", "value"))

    val stream = q.readStream()
      .withColumn("ts", timestamp_millis(col("ts_ms")))

    def ckpt() = java.nio.file.Files.createTempDirectory("sdemo-ckpt").toString

    // 1. windowed stats with watermark
    val w = QueueStreaming.windowedStats(stream, "ts", "user_id", "value",
        "5 seconds", "1 second")
      .writeStream.format("memory").queryName("wstats")
      .outputMode("append").option("checkpointLocation", ckpt())
      .trigger(Trigger.AvailableNow()).start()
    // 2. sessionization (1s gap, data-driven closure)
    val sess = QueueStreaming.sessionize(
        stream.select(col("user_id"), col("event_id"), col("ts_ms"), col("value"))
          .as[QueueStreaming.Event], gapMs = 1000L, wallClockTimeout = false)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").option("checkpointLocation", ckpt())
      .trigger(Trigger.AvailableNow()).start()
    // 3. streaming dedup on event_id
    val dd = QueueStreaming.dedupStream(stream, "ts", "event_id", "10 seconds")
      .writeStream.format("memory").queryName("deduped")
      .option("checkpointLocation", ckpt())
      .trigger(Trigger.AvailableNow()).start()

    Seq(w, sess, dd).foreach(_.awaitTermination(180000))

    println("wstats=" + spark.sql(
      "SELECT user_id, n_events, sum_value FROM wstats ORDER BY window_start, user_id")
      .collect().map(r => s"u${r.getLong(0)}:n=${r.getLong(1)},v=${r.getDouble(2)}")
      .mkString(";"))
    println("sessions=" + spark.sql(
      "SELECT user_id, n_events, sum_value, duration_ms FROM sessions ORDER BY user_id")
      .collect().map(r => s"u${r.getLong(0)}:n=${r.getLong(1)},v=${r.getDouble(2)},d=${r.getLong(3)}")
      .mkString(";"))
    println("deduped=" + spark.sql(
      "SELECT count(*) n, count(DISTINCT event_id) d FROM deduped")
      .collect().map(r => s"rows=${r.getLong(0)},distinct=${r.getLong(1)}").head)

    // 4. r9: streaming funnel — real-time stage progress off the queue
    val fev = stream.select(col("user_id"), col("ts_ms").as("ts"),
        when(col("event_id") % 2 === 0, "view").otherwise("click")
          .as("event_type"))
      .as[QueueStreaming.FunnelEvent]
    val fq = QueueStreaming.funnelStream(fev, Seq("view", "click"))
      .writeStream.format("memory").queryName("funnel")
      .outputMode("append").option("checkpointLocation", ckpt())
      .trigger(Trigger.AvailableNow()).start()
    // 5. r9: continuously-maintained session table off the same queue
    val store = java.nio.file.Files.createTempDirectory("sdemo-store")
      .toString + "/frames"
    val sq2 = QueueStreaming.sessionStoreStream(
      stream.select(col("user_id"), col("event_id"),
        (col("ts_ms") * 1000000L).as("ts"), col("value")),
      "user_id", 1000000000L, store, ckpt())
    Seq(fq, sq2).foreach(_.awaitTermination(180000))
    println("funnel=" + spark.sql(
      "SELECT user_id, stage, stage_ts FROM funnel ORDER BY user_id, stage")
      .collect().map(r => s"u${r.getLong(0)}:s${r.getInt(1)}@${r.getLong(2)}")
      .mkString(";"))
    println("session_store=" + graft.operators.Sessionize.finishFrames(
        QueueStreaming.latestSessionFrames(spark, store), "user_id")
      .collect().map(r => s"u${r.getLong(0)}#${r.getLong(1)}:n=${r.getLong(2)}")
      .mkString(";"))

    q.dispose()
    spark.stop()
  }
}
