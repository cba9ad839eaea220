package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-packing shard assignment (SURVEY.md §2 L20): documents in
  * a deterministic global order (by id) are packed into consecutive
  * ~`budgetTokens`-token shards — the training-batch layout step of an
  * LLM data pipeline.
  *
  * The global running token sum is computed as a DISTRIBUTED prefix
  * sum, never a single-partition global window:
  *   1. rows are range-bucketed on id (order-aligned buckets);
  *   2. a window cumsum runs WITHIN each bucket (widest partition =
  *      one bucket, ~n/B rows);
  *   3. the B bucket totals (B rows, driver-side prefix) come back as
  *      a broadcast offset table.
  * The result is provably identical to the one-ORDER-BY cumsum
  * formulation, which is exactly what the DuckDB oracle runs.
  */
object Pack {

  /** Returns (idCol, n_tokens, shard): shard = floor(prefix_before /
    * budgetTokens) under the global id order. Documents larger than
    * the budget simply span shards (next doc starts a later shard) —
    * assignment stays a pure function of the token prefix. Two extra
    * bounded actions: a min/max agg and a B-row totals collect. */
  def assignShards(df: DataFrame, idCol: String, tokensCol: Column,
                   budgetTokens: Long, buckets: Int = 64): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val spark = df.sparkSession
    import spark.implicits._
    // ids normalized to long so the min/max read below is type-safe
    val base = df.select(col(idCol).cast("long").as("id"),
      tokensCol.cast("long").as("n_tokens"))
    val mm = base.agg(min("id").as("lo"), max("id").as("hi")).head()
    if (mm.isNullAt(0))
      return base.withColumn("shard", lit(0L))
        .select(col("id").as(idCol), col("n_tokens"), col("shard"))
    val lo = mm.getLong(0)
    val hi = mm.getLong(1)
    val width = math.max(1L, (hi - lo) / buckets + 1)
    val b = base.withColumn("bucket",
      ((col("id") - lit(lo)) / lit(width)).cast("long"))
    val w = Window.partitionBy("bucket").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = b.withColumn("cum_in", sum(col("n_tokens")).over(w))
    // bucket totals -> exclusive prefix offsets (B rows, driver-side)
    val tots = b.groupBy("bucket").agg(sum(col("n_tokens")).as("tot"))
      .collect().sortBy(_.getLong(0))
    var acc = 0L
    val offs = tots.map { r =>
      val pair = (r.getLong(0), acc); acc += r.getLong(1); pair
    }.toSeq.toDF("bucket", "off")
    cum.join(broadcast(offs), "bucket")
      .withColumn("shard",
        floor((col("off") + col("cum_in") - col("n_tokens")) /
          lit(budgetTokens.toDouble)).cast("long"))
      .select(col("id").as(idCol), col("n_tokens"), col("shard"))
  }

  /** Epoch-shuffle packing: [[assignShards]] under a deterministic
    * PSEUDO-RANDOM global order — order key = (md5(content), id), so
    * every engine/re-run/partitioning agrees on the permutation (the
    * reproducible "shuffle the corpus, then cut training batches"
    * step). Buckets are the key's first two hex chars: 256
    * order-aligned ranges, uniform by construction, so the distributed
    * prefix sum needs no range statistics at all. */
  def assignShardsShuffled(df: DataFrame, idCol: String, tokensCol: Column,
                           contentCol: Column, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val spark = df.sparkSession
    import spark.implicits._
    // null content hashes as empty string: total order, no null buckets
    val b = df.select(col(idCol).cast("long").as("id"),
        tokensCol.cast("long").as("n_tokens"),
        md5(coalesce(contentCol.cast("string"), lit(""))).as("shuffle_key"))
      .withColumn("bucket", substring(col("shuffle_key"), 1, 2))
    val w = Window.partitionBy("bucket").orderBy("shuffle_key", "id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = b.withColumn("cum_in", sum(col("n_tokens")).over(w))
    val tots = b.groupBy("bucket").agg(sum(col("n_tokens")).as("tot"))
      .collect().sortBy(_.getString(0))
    var acc = 0L
    val offs = tots.map { r =>
      val pair = (r.getString(0), acc); acc += r.getLong(1); pair
    }.toSeq.toDF("bucket", "off")
    cum.join(broadcast(offs), "bucket")
      .withColumn("shard",
        floor((col("off") + col("cum_in") - col("n_tokens")) /
          lit(budgetTokens.toDouble)).cast("long"))
      .select(col("id").as(idCol), col("shuffle_key"), col("n_tokens"),
        col("shard"))
  }
}
