package graft.queue

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.GraftSchema

/** Write-path scale-out facade (SURVEY §2 C14): N independent
  * [[ParquetQueue]] shards behind one API.
  *
  * The reference's 1:1 writer lock (Queue ↔ journal, quebic
  * Queue.scala / JournaledFile.scala) makes a single queue
  * single-writer BY CONTRACT — correct, and at 100 TB/day ingest the
  * single writer is the bottleneck. The standard fix is the
  * partitioned-log recipe: N queues, each with its OWN exclusive
  * writer (locks stay 1:1 per shard, so the reference contract is
  * preserved shard-locally), rows routed by a deterministic hash of a
  * routing key. Ordering semantics are exactly a partitioned log's:
  * FIFO per shard — and therefore per routing key, since a key always
  * lands on the same shard — with cross-shard order unspecified.
  *
  * Consumer semantics compose from the per-shard C12c shared-name
  * contract: offsets live per (shard, consumer name) in the shard's
  * own meta files, so any number of cooperating processes draining
  * the same name see each entry EXACTLY ONCE across the whole
  * facade; independent names replay independently. Capacity,
  * lifetime, codec, and crash recovery are untouched per-shard
  * behaviors.
  */
class ShardedQueue(
    val spark: SparkSession,
    val root: String,
    val schema: GraftSchema,
    val nShards: Int,
    capacityPerShard: Long = Long.MaxValue,
    codec: String = "snappy",
    exclusiveWriter: Boolean = false) {
  require(nShards >= 1, s"need at least one shard, got $nShards")

  val shards: IndexedSeq[ParquetQueue] = (0 until nShards).map { i =>
    new ParquetQueue(spark, s"$root/shard-$i", schema, capacityPerShard,
      codec, exclusiveWriter)
  }

  /** Deterministic shard router — the SAME hash the push path applies
    * as a column, exposed for producers that pre-partition upstream
    * (e.g. a Kafka-style writer per shard). */
  def shardColumn(keyCol: String): org.apache.spark.sql.Column =
    pmod(xxhash64(col(keyCol)), lit(nShards.toLong)).cast("int")

  /** Route `df` by hash(keyCol) and push each slice to its shard.
    * One source pass (cached), one push per non-empty shard; returns
    * rows accepted. Cross-shard arrival order is unspecified (the
    * partitioned-log contract); per-key order is push order because a
    * key's rows always route to one shard. */
  def push(df: DataFrame, keyCol: String, lifetimeMs: Long = -1L): Long = {
    val routed = df.withColumn("__shard", shardColumn(keyCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      routed.count()
      (0 until nShards).map { i =>
        val slice = routed.filter(col("__shard") === i).drop("__shard")
        shards(i).push(slice, lifetimeMs)
      }.sum
    } finally { routed.unpersist(); () }
  }

  /** FIFO pop from ONE shard — the per-partition consumer shape (one
    * worker pinned per shard drains in parallel across workers). */
  def pop(shard: Int, n: Int, consumer: String = "default"): Seq[Row] =
    shards(shard).pop(n, consumer)

  /** Drain up to `n` entries across shards round-robin, FIFO within
    * each shard — the single-consumer convenience path. */
  def popAny(n: Int, consumer: String = "default"): Seq[Row] = {
    val out = Seq.newBuilder[Row]
    var remaining = n
    var i = 0
    while (remaining > 0 && i < nShards) {
      val got = shards(i).pop(remaining, consumer)
      out ++= got
      remaining -= got.length
      i += 1
    }
    out.result()
  }

  def size(consumer: String = "default"): Long =
    shards.map(_.size(consumer)).sum
  def isEmpty(consumer: String = "default"): Boolean = size(consumer) == 0
  def diskSpace: Long = shards.map(_.diskSpace).sum

  /** Per-shard (shard, consumer, offset, lag) — the monitoring view. */
  def consumerLags(): Seq[(Int, String, Long, Long)] =
    shards.zipWithIndex.flatMap { case (q, i) =>
      q.consumerLags().map { case (c, off, lag) => (i, c, off, lag) }
    }

  def close(): Unit = shards.foreach(_.close())
  def dispose(): Unit = shards.foreach(_.dispose())
}
