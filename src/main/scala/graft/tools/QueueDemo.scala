package graft.tools

import graft.GraftSession
import graft.queue.ParquetQueue
import graft.schema.{GraftSchema, GraftType, IncompatibleSchemaException}

/** Example: the reference's README walkthrough (push / pop / latest /
  * TTL / capacity / reopen) on the Spark-native queue. Run with
  * `sbt "runMain graft.tools.QueueDemo"`.
  */
object QueueDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("4", "queue-demo")
    import spark.implicits._
    val dir = if (args.nonEmpty) args(0)
      else java.nio.file.Files.createTempDirectory("graft-queue").toString

    val schema = GraftSchema(("id", GraftType.INTEGER), ("text", GraftType.TEXT))
    val q = new ParquetQueue(spark, dir, schema, capacity = 10)

    println("push1=" + q.push(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")))
    println("push2=" + q.push(Seq((4L, "d"), (5L, "e")).toDF("id", "text")))
    println("size=" + q.size())
    println("pop2=" + q.pop(2).mkString(";"))
    println("pop9=" + q.pop(9).mkString(";"))
    println("size_after=" + q.size())
    println("latest=" + q.latest)
    println("empty_pop=" + q.pop(1).mkString(";"))
    println("diskSpace>0=" + (q.diskSpace > 0))
    println("tryPush_overcap=" + q.tryPush(Seq.fill(11)((9L, "z")).toDF("id", "text")))

    // expired entry is skipped by pop
    q.push(Seq((6L, "expired")).toDF("id", "text"), lifetimeMs = 1,
      nowMs = System.currentTimeMillis() - 10000)
    q.push(Seq((7L, "alive")).toDF("id", "text"))
    println("ttl_pop=" + q.pop(5).mkString(";"))

    try { q.push(Seq(("x", 1)).toDF("a", "b")); println("schema-reject=MISSED") }
    catch { case e: IncompatibleSchemaException => println("schema-reject=ok: " + e.getMessage) }

    val q2 = new ParquetQueue(spark, dir, schema)
    println("reopen_latest=" + q2.latest)
    println("reopen_highwater=" + q2.highwater)

    // streaming subscriber: consume the queue via Structured Streaming
    val ckpt = java.nio.file.Files.createTempDirectory("demo-ckpt").toString
    val stream = q.readStream()
      .writeStream.format("memory").queryName("demo_sub")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    stream.awaitTermination(120000)
    val consumed = spark.sql(
      "SELECT seq, id, text FROM demo_sub ORDER BY seq").collect()
    println("stream_consumed=" + consumed.map(r =>
      s"${r.getLong(1)}:${r.getString(2)}").mkString(";"))

    q.dispose()
    println("disposed_diskSpace=" + q.diskSpace)

    // torn write: segment on disk without a highwater commit is invisible
    val tornDir = java.nio.file.Files.createTempDirectory("graft-torn").toString
    val qt = new ParquetQueue(spark, tornDir, schema)
    qt.push(Seq((1L, "committed")).toDF("id", "text"))
    Seq((99L, "torn")).toDF("id", "text")
      .selectExpr("CAST(1 AS BIGINT) seq", "CAST(0 AS BIGINT) enq_ts",
        "CAST(-1 AS BIGINT) lifetime_ms", "id", "text")
      .write.parquet(tornDir + "/data/batch=1")
    println("torn_size=" + qt.size() + " torn_pop=" + qt.pop(10).mkString(";"))
    qt.dispose()

    // pushAll: capacity-limited ordered accept, caller retries the rest
    val paDir = java.nio.file.Files.createTempDirectory("graft-pa").toString
    val qp = new ParquetQueue(spark, paDir, schema, capacity = 3)
    val batch = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("id", "text")
    println("pushAll_1=" + qp.pushAll(batch, orderCols = Seq("id")))
    println("pushAll_drained=" + qp.pop(10).map(_.getLong(0)).mkString(","))
    println("pushAll_2=" + qp.pushAll(
      Seq((4L, "d"), (5L, "e")).toDF("id", "text"), Seq("id")))
    println("pushAll_full=" + qp.pushAll(batch.limit(0), Seq("id")))
    qp.dispose()

    // per-segment codec: gzip queue round-trips, files carry .gz marker
    val gzDir = java.nio.file.Files.createTempDirectory("graft-gz").toString
    val qz = new ParquetQueue(spark, gzDir, schema, codec = "gzip")
    qz.push(Seq((1L, "x" * 500)).toDF("id", "text"))
    val gzFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(gzDir))
      .toArray.map(_.toString).filter(_.endsWith(".parquet"))
    println("gzip_pop_len=" + qz.pop(1).map(_.getString(1).length).mkString +
      " gzip_files=" + gzFiles.count(_.contains(".gz.")) + "/" + gzFiles.length)
    qz.dispose()
    spark.stop()
  }
}
