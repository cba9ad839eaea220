package graft.queue

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.GraftSchema

/** Durable FIFO queue on parquet segments — the Spark-native
  * re-expression of the reference's double-stack journaling queue
  * (reference: Queue.scala, JournaledFile.scala).
  *
  * Mapping of semantics (see SURVEY.md §2 C4-C12):
  *  - journal append      → append-only parquet segment dirs
  *                          `data/batch=<firstSeq>/`, rows carry a
  *                          totally-ordered `seq`, `enq_ts`,
  *                          `lifetime_ms` envelope + payload columns.
  *  - double-stack + migration → unnecessary: `seq` gives a total FIFO
  *                          order directly; "migration" is free.
  *  - pop                 → offset checkpoint per consumer (Kafka-style);
  *                          segments are pruned by the `batch` partition
  *                          column, so a pop never scans consumed data.
  *  - latest (survives empty queue) → segments are retained after
  *                          consumption (offsets move, data stays),
  *                          `latest` = row at highwater-1.
  *  - lifetime/TTL        → read-side filter `enq_ts + lifetime > now`.
  *  - capacity + tryPush  → highwater - offset bound before append.
  *  - crash recovery      → segment dirs are committed by atomic rename
  *                          of the meta highwater file; a torn write
  *                          leaves an orphan dir that readers ignore
  *                          (the analog of the reference's magic-number
  *                          skip, JournaledFile.scala:562).
  *  - 1:1 locking         → single-writer protocol; readers are
  *                          lock-free snapshot scans.
  *
  * At 100 TB scale: segments land on an object store; batch-partition
  * pruning bounds every pop/size scan to the unconsumed tail; the
  * streaming subscriber is an ordinary Structured Streaming file
  * source over the same layout.
  */
class ParquetQueue(
    spark: SparkSession,
    val root: String,
    val schema: GraftSchema,
    val capacity: Long = Long.MaxValue,
    val codec: String = "snappy") {

  private val dataDir = s"$root/data"
  private val metaDir = Paths.get(root, "_meta")
  private val highwaterFile = metaDir.resolve("highwater")
  Files.createDirectories(metaDir)
  Files.createDirectories(Paths.get(dataDir))

  private val envelope: StructType = StructType(
    StructField("seq", LongType, nullable = false) ::
    StructField("enq_ts", LongType, nullable = false) ::
    StructField("lifetime_ms", LongType, nullable = false) ::
    schema.sparkSchema.fields.toList)

  /** Next sequence number to be assigned (== total rows ever pushed). */
  def highwater: Long =
    if (Files.exists(highwaterFile))
      new String(Files.readAllBytes(highwaterFile), StandardCharsets.UTF_8).trim.toLong
    else 0L

  private def commitHighwater(v: Long): Unit = {
    val tmp = metaDir.resolve(s"highwater.tmp")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, highwaterFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Append a batch. Sequence numbers are assigned per-partition from a
    * counted offset table (classic zipWithIndex two-pass) — no global
    * shuffle, scales to any batch size. Returns the number pushed.
    */
  def push(df: DataFrame, lifetimeMs: Long = -1L,
           nowMs: Long = System.currentTimeMillis()): Long = {
    val payload = schema.validate(df)
    val first = highwater
    val rdd = payload.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq((first + i) +: nowMs +: lifetimeMs +: row.toSeq)
    }
    val out = spark.createDataFrame(rdd, envelope)
    val n = out.count() // rdd is cheap to recompute; count before commit
    if (n > 0) {
      // per-segment codec = the reference's per-entry Codec (PLAIN/GZIP)
      // generalized: parquet page compression (snappy/gzip/zstd/none)
      out.write.mode("errorifexists").option("compression", codec)
        .parquet(s"$dataDir/batch=$first")
      commitHighwater(first + n)
    }
    n
  }

  /** tryPush semantics (reference Queue.scala:152): refuse when the
    * unconsumed backlog for `consumer` has reached capacity. */
  def tryPush(df: DataFrame, consumer: String = "default",
              lifetimeMs: Long = -1L): Boolean = {
    val n = df.count()
    if (highwater - offsetOf(consumer) + n > capacity) false
    else { push(df, lifetimeMs); true }
  }

  /** pushAll semantics (reference Queue.scala:216): accept as many
    * entries as capacity permits, in `orderCols` order, and report how
    * many were accepted — the caller retries the remainder. */
  def pushAll(df: DataFrame, orderCols: Seq[String],
              consumer: String = "default", lifetimeMs: Long = -1L): Long = {
    val room = capacity - (highwater - offsetOf(consumer))
    if (room <= 0) 0L
    else {
      val permitted =
        if (room >= df.count()) df
        else df.orderBy(orderCols.map(col): _*).limit(room.toInt)
      push(permitted, lifetimeMs)
    }
  }

  private def offsetFile(consumer: String): Path = metaDir.resolve(s"offset-$consumer")

  def offsetOf(consumer: String): Long = {
    val f = offsetFile(consumer)
    if (Files.exists(f))
      new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim.toLong
    else 0L
  }

  private def commitOffset(consumer: String, v: Long): Unit = {
    val tmp = metaDir.resolve(s"offset-$consumer.tmp")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, offsetFile(consumer), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def hasData: Boolean = highwater > 0

  /** All live (uncommitted-batches excluded) rows with envelope. */
  def journal: DataFrame =
    if (!hasData) spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      envelope.add(StructField("batch", LongType)))
    else spark.read.option("basePath", dataDir).parquet(dataDir)
      .filter(col("seq") < highwater) // ignore torn/uncommitted appends

  private def notExpired(nowMs: Long) =
    col("lifetime_ms") < 0 || (col("enq_ts") + col("lifetime_ms")) > nowMs

  /** Unconsumed, unexpired view for a consumer; batch-partition pruned. */
  def pending(consumer: String = "default",
              nowMs: Long = System.currentTimeMillis()): DataFrame = {
    val off = offsetOf(consumer)
    journal.filter(col("seq") >= off && notExpired(nowMs))
  }

  /** Number of unconsumed entries (expired included, as the reference's
    * `size` counts journal+queue bytes-resident items). O(metadata). */
  def size(consumer: String = "default"): Long = highwater - offsetOf(consumer)

  def isEmpty(consumer: String = "default"): Boolean = size(consumer) == 0

  /** Bytes on disk across segment + meta files (reference diskSpace). */
  def diskSpace: Long = {
    val p = Paths.get(root)
    if (!Files.exists(p)) 0L
    else {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_)).mapToLong(f => Files.size(f)).sum()
      finally s.close()
    }
  }

  /** FIFO pop of up to `n` entries: reads only batches past the offset,
    * advances the checkpoint past everything seen (consumed or
    * expired), returns payload rows in seq order. */
  def pop(n: Int, consumer: String = "default",
          nowMs: Long = System.currentTimeMillis()): Seq[Row] = {
    val off = offsetOf(consumer)
    if (off >= highwater) return Seq.empty
    val taken = journal
      .filter(col("seq") >= off)
      .orderBy("seq")
      .limit(n + 1) // +1 to learn whether more remain without a count
      .collect()
      .toSeq
    val popped = taken.take(n)
    if (popped.nonEmpty) commitOffset(consumer, popped.last.getAs[Long]("seq") + 1)
    popped
      .filter { r =>
        val lt = r.getAs[Long]("lifetime_ms")
        lt < 0 || r.getAs[Long]("enq_ts") + lt > nowMs
      }
      .map(r => Row.fromSeq(r.toSeq.drop(3).dropRight(1))) // strip envelope+batch
  }

  /** The most recently pushed entry — survives full consumption, like
    * the reference's `Publisher.latest` (Queue.scala:248): offsets
    * advance but segments are retained. Prunes to the last batch. */
  def latest: Option[Row] = {
    if (!hasData) return None
    val hw = highwater
    journal.filter(col("seq") === (hw - 1)).collect().headOption
      .map(r => Row.fromSeq(r.toSeq.drop(3).dropRight(1)))
  }

  /** Structured Streaming subscriber over the same segment layout —
    * the reference's consume-process loop (Subscriber.pop in a while
    * loop) becomes a declarative stream. */
  def readStream(maxBatchesPerTrigger: Int = 8): DataFrame =
    spark.readStream
      .schema(envelope)
      .option("basePath", dataDir)
      .option("maxFilesPerTrigger", maxBatchesPerTrigger)
      .parquet(dataDir)

  /** Drop everything (reference dispose, Queue.scala:134). */
  def dispose(): Unit = {
    val p = Paths.get(root)
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }
  }
}
