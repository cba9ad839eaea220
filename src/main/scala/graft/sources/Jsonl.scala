package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON document per line) source/sink — the interchange
  * format LLM corpora actually ship in (The Pile, RedPajama, DataComp
  * releases are all compressed JSONL shards).
  *
  * Scale rules encoded here:
  *  - **Never infer the schema.** Spark's JSON inference is a full
  *    extra pass over the data before the real read even starts — at
  *    100 TB that doubles the scan bill and silently widens types on
  *    dirty rows. [[read]] requires an explicit schema; unparseable
  *    lines land in `_corrupt_record` instead of failing the job
  *    (PERMISSIVE), so one bad shard can't kill a corpus read.
  *  - **Compress per line-oriented codec.** gzip JSONL is the lingua
  *    franca; the codec rides the writer option, files stay
  *    line-splittable per shard (one task per shard file).
  *  - **Layout is the writer's job**: `partitions` repartitions before
  *    the write so shard count (and thus shard size) is controlled —
  *    the small-files rule from R24 applies to sinks of any format.
  *
  * The JSON path is lossless for the types the documents tables use
  * (long / string / double / arrays); q_jsonl_roundtrip hash-gates
  * that claim end-to-end against the parquet-side oracle, down to
  * md5-exact text bytes.
  */
object Jsonl {

  /** Write `df` as compressed JSONL under `path` (overwrite).
    * `partitions` caps/spreads shard count when given. */
  def write(df: DataFrame, path: String, compression: String = "gzip",
            partitions: Option[Int] = None): Unit = {
    val out = partitions.fold(df)(n => df.repartition(n))
    out.write.mode("overwrite").option("compression", compression).json(path)
  }

  /** Read JSONL under `path` with an EXPLICIT schema (no inference
    * pass). Corrupt lines are preserved in `_corrupt_record` when the
    * caller includes that column in `schema`; otherwise they yield
    * all-null rows rather than failing the read. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  /** Read back with the writing frame's own schema — the roundtrip
    * shape used by the sink gate. */
  def roundtrip(df: DataFrame, path: String, compression: String = "gzip",
                partitions: Option[Int] = None): DataFrame = {
    write(df, path, compression, partitions)
    read(df.sparkSession, path, df.schema)
  }
}
