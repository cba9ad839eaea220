package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink with the same scale contracts as [[Jsonl]]:
  * explicit schema on read (CSV inference is a second full scan AND
  * type-guessy — a column of "1e5"-looking strings silently becomes
  * double), PERMISSIVE corrupt-line capture, writer-controlled shard
  * count, gzip per shard. Quoting/escaping is round-trip safe for
  * embedded delimiters, quotes, and newlines (`multiLine` on read
  * pairs with the writer's quoting); q_csv_roundtrip hash-gates
  * byte-fidelity end-to-end against the parquet-side oracle. */
object Csv {

  /** Write `df` as gzip CSV shards with a header under `path`. */
  def write(df: DataFrame, path: String, compression: String = "gzip",
            partitions: Option[Int] = None): Unit = {
    val out = partitions.fold(df)(n => df.repartition(n))
    out.write.mode("overwrite")
      .option("compression", compression)
      .option("header", "true")
      .option("escape", "\"") // RFC-4180 doubled quotes, not backslash
      // the WRITER trims by default — byte fidelity demands it off
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
  }

  /** Read CSV under `path` with an EXPLICIT schema; `multiLine`
    * honors quoted embedded newlines (at the cost of shard-level
    * rather than line-level splits — the documented tradeoff of
    * newline-bearing payloads in CSV). */
  def read(spark: SparkSession, path: String, schema: StructType,
           multiLine: Boolean = false): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("escape", "\"")
      .option("multiLine", multiLine.toString)
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Write-then-read with the writing frame's own schema. */
  def roundtrip(df: DataFrame, path: String, compression: String = "gzip",
                partitions: Option[Int] = None,
                multiLine: Boolean = false): DataFrame = {
    write(df, path, compression, partitions)
    read(df.sparkSession, path, df.schema, multiLine)
  }
}
