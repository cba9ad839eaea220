package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory: one place for the engine's scale knobs so
  * Verify/Bench/tests agree. local[N] here; on a real cluster the same
  * configs apply minus master.
  */
object GraftSession {
  def local(cpus: String, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // event time: the canonical in-engine `ts` is Long nanos; the
      // shared loader (queries.RelationalQueries.t) normalizes whatever
      // parquet timestamp unit the testdata carries. No legacy configs —
      // Spark 4.1.2 no longer honors parquet.nanosAsLong.
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
