package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located (bucketed) joins — the pre-shuffle strategy for keys that
  * are joined repeatedly at scale. Writing both sides `bucketBy(n, key)
  * .sortBy(key)` pays the shuffle ONCE at write time; every subsequent
  * join on that key is exchange-free AND sort-free (SortMergeJoin reads
  * bucket files already hash-partitioned and sorted). At 100 TB this is
  * the difference between re-shuffling the fact table per query and
  * never shuffling it again — the bucket count is chosen once for the
  * cluster (e.g. 4096) and both sides must agree on it.
  */
object CoLocated {

  /** Persist `df` as a bucketed+sorted catalog table on `key`. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    key: String): Unit = {
    // fresh catalog over an old warehouse dir: clear the leftover
    // managed location or this rebuild trips LOCATION_ALREADY_EXISTS
    Lexical.dropManaged(df.sparkSession, table)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket keys. When both were
    * written with the same bucket count, the plan contains no Exchange
    * and no Sort — verify with `explain("formatted")` (BucketingSpec
    * asserts it). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   leftKey: String, rightKey: String): DataFrame = {
    // build the condition from the SAME Dataset instances being
    // joined — fresh spark.table() calls inside the condition are
    // ambiguous for self-joins (left == right)
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
