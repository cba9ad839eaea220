package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC source/sink — the third interchange format next to [[Jsonl]]
  * and [[Csv]], using Spark's built-in ORC datasource (orc-core ships
  * in the Spark distribution; no extra dependency). Same scale
  * contracts: writer-controlled shard count (the small-files lever),
  * per-stripe compression, and columnar predicate
  * pushdown/column-pruning on read — unlike the text formats, ORC
  * carries types and statistics, so a read with a filter prunes
  * stripes the way the parquet scans do (PlanContract-style
  * PushedFilters apply). `q_orc_roundtrip` hash-gates byte-fidelity
  * end-to-end against the same parquet-side oracle as the JSONL/CSV
  * roundtrips: one oracle, three sink/source paths. */
object Orc {

  /** Write `df` as ORC shards under `path`. `compression`: zlib
    * (default — universally readable), snappy, lz4, zstd, none. */
  def write(df: DataFrame, path: String, compression: String = "zlib",
            partitions: Option[Int] = None): Unit = {
    val out = partitions.fold(df)(n => df.repartition(n))
    out.write.mode("overwrite")
      .option("compression", compression)
      .orc(path)
  }

  /** Read ORC under `path`. Schema is optional for ORC (self-
    * describing), but passing one pins the CONTRACT the caller
    * expects — a producer-side type drift fails loudly at analysis
    * instead of surfacing as a downstream cast. */
  def read(spark: SparkSession, path: String,
           schema: StructType = null): DataFrame = {
    val r = spark.read
    (if (schema != null) r.schema(schema) else r).orc(path)
  }
}
