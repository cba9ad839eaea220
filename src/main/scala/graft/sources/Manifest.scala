package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Release manifest + validation for an exported corpus directory —
  * the integrity layer of a dataset release: every shard gets a row
  * `(shard, n_rows, key_xor, bytes)` where `key_xor` is the XOR of
  * `xxhash64(keyCol)` over the shard's rows (order-insensitive, so the
  * checksum is stable under row reordering within a shard and cheap to
  * combine). A consumer re-derives the same frame from the data it
  * received and diffs — any dropped/duplicated/bit-flipped row flips
  * the count or the XOR of exactly the shard that carried it.
  *
  * Works over any format the reader fn can load (parquet, [[Jsonl]],
  * [[Csv]]) because the shard attribution comes from
  * `input_file_name()`, not the format.
  */
object Manifest {

  /** Per-shard manifest of the rows `df` yields, attributed by input
    * file. `df` must be a freshly-read frame (input_file_name is
    * defined); `keyCol` should identify a row (dup keys still checksum
    * correctly — XOR of a multiset). NOTE: Spark caches file listings
    * (including sizes) per path — when re-validating a directory that
    * changed IN PLACE, call `spark.catalog.refreshByPath(path)` first
    * or the read serves the stale listing. */
  def build(df: DataFrame, keyCol: String): DataFrame = {
    // basename only: the manifest must survive the release moving dirs
    val shard = element_at(split(input_file_name(), "/"), -1)
    df.select(shard.as("shard"), xxhash64(col(keyCol)).as("h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        // no xor aggregate in Spark SQL: fold via bit tricks — XOR of a
        // multiset = reduce over bit_xor partial aggregate
        expr("bit_xor(h)").as("key_xor"))
  }

  /** Manifest for a JSONL/CSV/parquet directory read with `reader`. */
  def forDir(spark: SparkSession, path: String, schema: StructType,
             keyCol: String,
             format: String = "parquet"): DataFrame = {
    val df = format match {
      case "parquet" => spark.read.schema(schema).parquet(path)
      case "jsonl" => Jsonl.read(spark, path, schema)
      case "csv" => Csv.read(spark, path, schema)
      case other => throw new IllegalArgumentException(s"unknown format $other")
    }
    build(df, keyCol)
  }

  /** Diff a received release against its published manifest: rows
    * `(shard, status)` with status in ok / missing_shard / extra_shard
    * / mismatch. Empty result (no non-ok rows) = release intact. */
  def validate(received: DataFrame, published: DataFrame): DataFrame = {
    val r = received.select(col("shard"), col("n_rows").as("r_rows"),
      col("key_xor").as("r_xor"))
    val p = published.select(col("shard"), col("n_rows").as("p_rows"),
      col("key_xor").as("p_xor"))
    r.join(p, Seq("shard"), "full")
      .withColumn("status",
        when(col("p_rows").isNull, lit("extra_shard"))
          .when(col("r_rows").isNull, lit("missing_shard"))
          .when(col("r_rows") === col("p_rows") &&
            col("r_xor") === col("p_xor"), lit("ok"))
          .otherwise(lit("mismatch")))
      .select("shard", "status")
      .filter(col("status") =!= "ok")
  }
}
