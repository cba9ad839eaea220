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
      // testdata events.ts is parquet TIMESTAMP(NANOS): Spark 4 has no
      // nanos timestamp type; read as Long nanoseconds since epoch.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
