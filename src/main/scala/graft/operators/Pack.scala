package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence-packing shard assignment (SURVEY.md §2 L20/L20b/L20c):
  * documents in a deterministic global order are packed into
  * consecutive ~`budgetTokens`-token shards — the training-batch
  * layout step of an LLM data pipeline. Three orders: by id
  * ([[assignShards]]), by a deterministic md5 permutation
  * ([[assignShardsShuffled]] — epoch shuffle), and by an arbitrary
  * integer key ([[assignShardsOrdered]] — e.g. quality-descending
  * curriculum).
  *
  * The global running token sum is computed as a DISTRIBUTED prefix
  * sum, never a single-partition global window:
  *   1. rows are bucketed by an order-aligned function of the order
  *      key (range for numeric keys, hex prefix for md5);
  *   2. a window cumsum runs WITHIN each bucket (widest partition =
  *      one bucket);
  *   3. the B bucket totals (B rows, driver-side prefix) come back as
  *      a broadcast offset table.
  * The result is provably identical to the one-ORDER-BY cumsum
  * formulation, which is exactly what the DuckDB oracles run.
  */
object Pack {

  /** Shared prefix-sum core: `b` must carry `bucket` (order-aligned,
    * any orderable type), `n_tokens`, and the within-bucket order
    * columns. Adds `shard` = floor(global prefix_before / budget). */
  private def cutShards(b: DataFrame, orderCols: Seq[String],
                        budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val w = Window.partitionBy("bucket").orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = b.withColumn("cum_in", sum(col("n_tokens")).over(w))
    // bucket totals -> exclusive prefix offsets (B rows, driver-side)
    val tots = b.groupBy("bucket").agg(sum(col("n_tokens")).as("tot"))
      .orderBy("bucket").collect()
    var acc = 0L
    val offRows: Seq[Row] = tots.toSeq.map { r =>
      val out = Row(r.get(0), acc); acc += r.getLong(1); out
    }
    val spark = b.sparkSession
    val schema = StructType(Seq(b.schema("bucket").copy(nullable = false),
      StructField("off", LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    val offs = spark.createDataFrame(offRows.asJava, schema)
    // integral floor-division: prefixes are non-negative longs, so
    // `div` is exact at any scale where a double division would round
    // near shard boundaries once prefixes pass 2^53
    cum.join(broadcast(offs), "bucket")
      .withColumn("shard",
        expr(s"(off + cum_in - n_tokens) div ${budgetTokens}L"))
  }

  /** Range-bucket a long column into ~`buckets` order-aligned cells
    * from one min/max agg; None when the frame is empty. The bucket
    * arithmetic runs in decimal so hash-scale keys spanning the full
    * long range (hi - lo overflowing) still bucket order-aligned. */
  private def rangeBucket(base: DataFrame, keyCol: String,
                          buckets: Int): Option[Column] = {
    val mm = base.agg(min(keyCol).as("lo"), max(keyCol).as("hi"),
      sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("nulls")).head()
    if (mm.isNullAt(0)) None
    else {
      require(mm.getLong(2) == 0L,
        s"packing requires non-null $keyCol values (they would be " +
          "silently dropped by the offsets join)")
      val lo = BigInt(mm.getLong(0))
      val width = (BigInt(mm.getLong(1)) - lo) / buckets + 1
      Some(floor((col(keyCol).cast("decimal(38,0)") - lit(BigDecimal(lo))) /
        lit(BigDecimal(width))).cast("long"))
    }
  }

  /** Pack under the global id order. Returns (idCol, n_tokens, shard);
    * shard = floor(prefix_before / budgetTokens). Documents larger
    * than the budget simply span shards — assignment stays a pure
    * function of the token prefix. Two extra bounded actions: a
    * min/max agg and a B-row totals collect. */
  def assignShards(df: DataFrame, idCol: String, tokensCol: Column,
                   budgetTokens: Long, buckets: Int = 64): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    // ids normalized to long so the range math is type-safe
    val base = df.select(col(idCol).cast("long").as("id"),
      tokensCol.cast("long").as("n_tokens"))
    rangeBucket(base, "id", buckets) match {
      case None => base.withColumn("shard", lit(0L))
        .select(col("id").as(idCol), col("n_tokens"), col("shard"))
      case Some(bucket) =>
        cutShards(base.withColumn("bucket", bucket), Seq("id"), budgetTokens)
          .select(col("id").as(idCol), col("n_tokens"), col("shard"))
    }
  }

  /** Epoch-shuffle packing: [[assignShards]] under a deterministic
    * PSEUDO-RANDOM global order — order key = (md5(content), id), so
    * every engine/re-run/partitioning agrees on the permutation (the
    * reproducible "shuffle the corpus, then cut training batches"
    * step). Buckets are the key's first two hex chars: 256
    * order-aligned ranges, uniform by construction, so the prefix sum
    * needs no range statistics at all. */
  def assignShardsShuffled(df: DataFrame, idCol: String, tokensCol: Column,
                           contentCol: Column, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    // null content hashes as empty string: total order, no null buckets
    val b = df.select(col(idCol).cast("long").as("id"),
        tokensCol.cast("long").as("n_tokens"),
        md5(coalesce(contentCol.cast("string"), lit(""))).as("shuffle_key"))
      .withColumn("bucket", substring(col("shuffle_key"), 1, 2))
    cutShards(b, Seq("shuffle_key", "id"), budgetTokens)
      .select(col("id").as(idCol), col("shuffle_key"), col("n_tokens"),
        col("shard"))
  }

  /** Curriculum packing: [[assignShards]] under an arbitrary integer
    * order key (ascending; ties broken by id) — e.g. a quantized
    * quality score, negated for hardest-last curricula. Null keys
    * order as 0. Returns (idCol, order_key, n_tokens, shard). */
  def assignShardsOrdered(df: DataFrame, idCol: String, tokensCol: Column,
                          keyCol: Column, budgetTokens: Long,
                          buckets: Int = 64): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val base = df.select(col(idCol).cast("long").as("id"),
      tokensCol.cast("long").as("n_tokens"),
      coalesce(keyCol.cast("long"), lit(0L)).as("order_key"))
    rangeBucket(base, "order_key", buckets) match {
      case None => base.withColumn("shard", lit(0L))
        .select(col("id").as(idCol), col("order_key"), col("n_tokens"),
          col("shard"))
      case Some(bucket) =>
        cutShards(base.withColumn("bucket", bucket),
            Seq("order_key", "id"), budgetTokens)
          .select(col("id").as(idCol), col("order_key"), col("n_tokens"),
            col("shard"))
    }
  }

  /** L56: training-sequence construction from event logs — the
    * behavioral-corpus shape (session-recommendation / user-model
    * pretraining): each user's events in event-time order, cut into
    * consecutive fixed-`seqLen` training rows. The [[assignShards]]
    * family packs DOCUMENTS by token budget; this packs a keyed event
    * STREAM by position — the two layout steps of an events-to-
    * training-data pipeline.
    *
    * One user-keyed window shuffle orders the stream; the chunk
    * grouping reuses the same (user, ts, tie) clustering, and each
    * output row's payload list is bounded by `seqLen` (collect_list
    * can never accumulate a whole user). Order within a user is made
    * total by (tsCol, tieCol) — REQUIRED unique per user, or the
    * sequence fingerprint would be partitioning-dependent. A
    * pathologically hot user is a data bug to cap upstream
    * (source-cap semantics), not a plan problem.
    *
    * Returns (user_id, chunk_idx, n_events, first_ts, last_ts,
    * seq_md5) where seq_md5 fingerprints the ordered payload joined
    * by single spaces. */
  def eventSequences(events: DataFrame, userCol: String, tsCol: String,
                     tieCol: String, payloadCol: String,
                     seqLen: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("chunk_idx", expr(s"(__rn - 1L) div ${seqLen}L"))
      .groupBy(col(userCol).as("user_id"), col("chunk_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("first_ts"),
        max(col(tsCol)).as("last_ts"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("__rn").as("o"),
            col(payloadCol).cast("string").as("p")))),
          s => s.getField("p")))).as("seq_md5"))
  }
}
