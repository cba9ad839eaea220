package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus, "graft-bench")
    // warm codegen/JIT on the representative flagship plan (scans,
    // broadcast joins, decimal aggs) so the first timed queries don't
    // absorb JVM warmup
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    // Two timed passes per query, min reported: BENCH_r01 vs _r02 ran
    // identical code and differed 3.5x (cold page cache / JIT), so a
    // single sample mostly measures the environment. min-of-2 is the
    // steady-state number.
    val timed = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // a failed run must not enter the min (its fast failure time would
      // masquerade as the query's benchmark number) — keep only the
      // durations of runs that completed
      val dts = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        // noop sink forces evaluation of every output column (count()
        // would let Catalyst prune the projections being measured)
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable => System.err.println(s"[bench] $name FAILED: $e"); None
        }
      }
      val dt = if (dts.nonEmpty) Some(dts.min) else None
      System.err.println(f"[bench] $name%-24s ${dt.fold("FAILED")(d => f"$d%8.2f s")}  (runs: ${dts.map(d => f"$d%.2f").mkString(", ")})")
      name -> dt
    }
    val ok = timed.collect { case (k, Some(v)) => k -> v }
    val failed = timed.collect { case (k, None) => k }
    // one compact JSON line: 3-decimal values keep the whole line inside
    // the driver's bounded stdout-tail capture (full-precision doubles
    // pushed it past the window in r1-r3 → "parsed": null every round)
    val qs = ok.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val failedJson =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
