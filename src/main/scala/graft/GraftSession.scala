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
      // reliable-checkpoint retention (r14 ADVICE): with
      // graft.checkpoint.reliable=true every iterative round pin
      // (PageRank/LPA/Lloyd/MW) writes a reliable checkpoint; the
      // ContextCleaner only deletes those files when this flag is on,
      // so long iterative jobs would otherwise accumulate unbounded
      // checkpoint-dir storage. localCheckpoint blocks (the default
      // mode) are reclaimed either way. Must be set before the
      // context starts — it is read at ContextCleaner construction.
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      // event time: the canonical in-engine `ts` is Long nanos; the
      // shared loader (queries.RelationalQueries.t) normalizes whatever
      // parquet timestamp unit the testdata carries. No legacy configs —
      // Spark 4.1.2 no longer honors parquet.nanosAsLong.
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
