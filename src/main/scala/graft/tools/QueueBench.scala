package graft.tools

import java.nio.file.Files

import graft.GraftSession
import graft.queue.ParquetQueue
import graft.schema.{GraftSchema, GraftType}

/** Queue-ops microbench sidecar — the mechanical twin of the
  * reference's `Performance.scala` (quebic publishes ~3.6 ms/push,
  * ~2.2 ms/pop single-thread at ~1 kB items). ParquetQueue is
  * deliberately batch-oriented (vectorized parquet segments, not
  * per-item byte framing), so the honest comparable is BATCH
  * latency: 1 kB-payload rows pushed/popped in 1 k-row batches.
  *
  * Writes `queue_bench.json` (flat name→seconds, the
  * `bench_queries.json` shape) so `tools/bench_compare.py
  * queue_bench.json QUEUE_BASELINE.json` gates queue-path
  * regressions exactly like query perf, and prints one JSON line
  * with the derived per-item rates for the SURVEY comparison.
  *
  * Run: `sbt "runMain graft.tools.QueueBench"`.
  */
object QueueBench {
  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus, "queue-bench")
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val schema = GraftSchema(("id", GraftType.INTEGER),
      ("text", GraftType.TEXT))
    val payload = "x" * 1024
    val nBatches = 16
    val rows = 1000
    def batch(b: Int) = Seq.tabulate(rows)(i =>
      ((b.toLong * rows + i), payload)).toDF("id", "text")

    // warmup queue: absorb JIT/codegen/parquet-footer costs so the
    // timed numbers measure the queue, not JVM startup
    locally {
      val wdir = Files.createTempDirectory("graft-qbench-warm").toString
      val wq = new ParquetQueue(spark, wdir, schema)
      wq.push(batch(0)); wq.pop(rows); wq.dispose()
    }

    val dir = Files.createTempDirectory("graft-qbench").toString
    val q = new ParquetQueue(spark, dir, schema)

    val pushSec = time { (0 until nBatches).foreach(b => q.push(batch(b))) }
    val sizeSec = time { assert(q.size() == nBatches.toLong * rows) }
    val popSec = time {
      var got = 0L
      (0 until nBatches).foreach(_ => got += q.pop(rows).length)
      assert(got == nBatches.toLong * rows)
    }
    // popWait fast path: data already committed — the latency floor a
    // consumer loop pays per drained batch
    q.push(batch(nBatches))
    val popWaitSec = time { assert(q.popWait(rows).length == rows) }
    // reopen: meta/highwater recovery cost for a successor process
    val reopenSec = time {
      val q2 = new ParquetQueue(spark, dir, schema)
      assert(q2.highwater > 0)
      q2.close()
    }
    q.dispose()

    // ---- payload-size sweep (r14 verdict item 9): the reference's
    // Performance.scala matrix shape — per-item latency as a function
    // of payload size, 1 B → 1 MiB, so the per-item-rate comparison
    // is curve-backed instead of pinned at one batch shape. Row
    // counts scale down with payload so each cell moves a bounded
    // ~4-64 MB total; 4 batches per cell amortize fixed per-push
    // costs the same way at every size.
    val sweep: Seq[(Int, Int)] = Seq( // (payloadBytes, rowsPerBatch)
      1 -> 1000, 64 -> 1000, 1024 -> 1000, 65536 -> 128, 1048576 -> 16)
    val sweepMetrics = sweep.flatMap { case (bytes, n) =>
      val pl = "x" * bytes
      val sdir = Files.createTempDirectory(s"graft-qbench-p$bytes").toString
      val sq = new ParquetQueue(spark, sdir, schema)
      def sbatch(b: Int) = Seq.tabulate(n)(i =>
        ((b.toLong * n + i), pl)).toDF("id", "text")
      val push = time { (0 until 4).foreach(b => sq.push(sbatch(b))) }
      val pop = time {
        var got = 0L
        (0 until 4).foreach(_ => got += sq.pop(n).length)
        assert(got == 4L * n)
      }
      sq.dispose()
      Seq(s"queue_push_p$bytes" -> push, s"queue_pop_p$bytes" -> pop,
        s"queue_push_ms_item_p$bytes" -> (push * 1000.0 / (4 * n)),
        s"queue_pop_ms_item_p$bytes" -> (pop * 1000.0 / (4 * n)))
    }

    val metrics = Seq(
      s"queue_push_${nBatches}x${rows}" -> pushSec,
      s"queue_pop_${nBatches}x${rows}" -> popSec,
      s"queue_popwait_1x${rows}" -> popWaitSec,
      "queue_size" -> sizeSec,
      "queue_reopen" -> reopenSec) ++ sweepMetrics
    // Locale.ROOT: the default-locale formatter writes comma decimals
    // on e.g. de_DE, which breaks the JSON sidecar (r14 ADVICE)
    def num(v: Double, digits: Int = 3): String =
      String.format(java.util.Locale.ROOT, s"%.${digits}f",
        java.lang.Double.valueOf(v))
    val sidecar = metrics.map { case (k, v) => s""""$k":${num(v)}""" }
      .mkString("{", ",", "}")
    Files.write(java.nio.file.Paths.get("queue_bench.json"),
      sidecar.getBytes("UTF-8"))

    val pushMsPerItem = pushSec * 1000.0 / (nBatches * rows)
    val popMsPerItem = popSec * 1000.0 / (nBatches * rows)
    // one JSON line, the Bench contract
    println(s"""{"metric":"queue_ops","unit":"sec",""" +
      metrics.map { case (k, v) => s""""$k":${num(v)}""" }
        .mkString("", ",", ",") +
      s""""push_ms_per_item":${num(pushMsPerItem, 4)},""" +
      s""""pop_ms_per_item":${num(popMsPerItem, 4)},""" +
      s""""items":${(nBatches + 1) * rows},"payload_bytes":1024}""")
    spark.stop()
  }
}
