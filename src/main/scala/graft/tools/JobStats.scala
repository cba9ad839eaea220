package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

import graft.{GraftSession, SparkEntry}

/** Min-of-2 noop-sink timing + scheduler-shape counters (jobs, stages,
  * tasks, summed task time) for named queries — tells whether a query
  * is compute-bound or job/stage-latency-bound (guide §1: decide
  * whether time goes to compute, scheduling or shuffle before touching
  * anything). `sbt "runMain graft.tools.JobStats q_a,q_b [sfDir]"` */
object JobStats {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-jobstats")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskMs = new AtomicLong
    val shufW = new AtomicLong; val shufR = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })
    names.foreach { n =>
      val dts = (1 to 2).map { i =>
        if (i == 2) { // count only the warm (min) run's shape
          jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
          shufW.set(0); shufR.set(0)
        }
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // listener events drain asynchronously; give the bus a beat
      Thread.sleep(300)
      println(f"[js] $n%-30s min ${dts.min}%6.2f s  warm ${dts(1)}%6.2f s  " +
        f"jobs ${jobs.get}%3d  stages ${stages.get}%4d  tasks ${tasks.get}%5d  " +
        f"taskTime ${taskMs.get / 1000.0}%7.2f s  shufW ${shufW.get / 1048576.0}%7.1f MB")
    }
    spark.stop()
  }
}
