package graft.tools

import graft.{GraftSession, SparkEntry}

/** Min-of-2 noop-sink timing for a named subset of queries — the
  * targeted iteration loop (Bench times all of them).
  * `sbt "runMain graft.tools.TimeQueries q_a,q_b [sfDir]"`
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-time")
    names.foreach { n =>
      val dts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $n%-28s ${dts.min}%6.2f s  (runs: ${dts.map(d => f"$d%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
