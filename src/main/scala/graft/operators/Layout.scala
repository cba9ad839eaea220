package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output-layout control — the small-files/giant-files problem that
  * dominates 100 TB table maintenance. `partitionBy` alone emits one
  * file per (task × partition-value); with hundreds of tasks touching
  * every value that's a small-files explosion, and with a pre-shuffle
  * on the partition column alone it's one giant file per value (plus
  * full key skew). The fix: repartition on (partition values, a
  * deterministic id-hash bucket) so every partition directory gets
  * exactly `filesPerPartition` writer tasks — bounded file count AND
  * bounded file size, no RNG (re-runs produce identical layouts).
  */
object Layout {

  /** Write `df` partitioned by `partCols` with a bounded, deterministic
    * number of files per partition directory. */
  def writeSized(df: DataFrame, path: String, partCols: Seq[String],
                 filesPerPartition: Int, idCol: String): Unit = {
    val bucketed = df.withColumn("__file_bucket",
      pmod(xxhash64(col(idCol)), lit(filesPerPartition)))
    bucketed
      .repartition((partCols :+ "__file_bucket").map(col): _*)
      .drop("__file_bucket")
      .write.mode("overwrite")
      .partitionBy(partCols: _*)
      .parquet(path)
  }
}
