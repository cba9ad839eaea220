package graft.queue

import org.apache.spark.sql.{Dataset, Encoder, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.schema.{GraftSchema, GraftType, IncompatibleSchemaException}

/** Typed queue API — the reference's generic `Queue[T]` surface
  * (reference: Queue.scala:26 takes a `Value2Struct[T]` type-class
  * converter; Queue.scala:302-306 round-trips case-class-like values).
  * The Spark-native converter is an `Encoder[T]`: the 5-type payload
  * contract derives from the encoder's schema, pushes validate against
  * the persisted contract exactly like untyped pushes (a mismatched
  * `T` is refused with IncompatibleSchemaException at handle-open, the
  * analog of the reference's read-time schema check), and pops/latest
  * rebuild `T` through the same encoder.
  *
  * Field mapping (positional, like the reference's tuple schema):
  * long/int/short/byte → INTEGER, double/float/decimal → REAL,
  * String → TEXT, Array[Byte] → BINARY, a (shape, values) struct →
  * TENSOR. Anything else has no graft type and is refused.
  */
object TypedQueue {

  /** Derive the queue's 5-type schema contract from `T`'s encoder. */
  def schemaOf[T](implicit enc: Encoder[T]): GraftSchema = GraftSchema(
    enc.schema.fields.toSeq.map { f =>
      val gt = f.dataType match {
        case LongType | IntegerType | ShortType | ByteType => GraftType.INTEGER
        case DoubleType | FloatType | _: DecimalType => GraftType.REAL
        case StringType => GraftType.TEXT
        case BinaryType => GraftType.BINARY
        case s: StructType if s.fieldNames.sameElements(Array("shape", "values")) =>
          GraftType.TENSOR
        case other => throw new IncompatibleSchemaException(
          s"field ${f.name}: ${other.simpleString} has no graft type " +
            "(int/real/text/binary/tensor)")
      }
      f.name -> gt
    })

  /** Open (or create) a queue at `root` with the contract derived from
    * `T`. Reopening with a different `T` throws — same persisted-schema
    * guarantee as the untyped constructor. */
  def open[T](spark: SparkSession, root: String, capacity: Long = Long.MaxValue,
              codec: String = "snappy", exclusiveWriter: Boolean = false)
             (implicit enc: Encoder[T]): TypedQueue[T] =
    new TypedQueue[T](new ParquetQueue(spark, root, schemaOf[T], capacity,
      codec, exclusiveWriter))
}

/** Typed facade over an existing [[ParquetQueue]]. Constructing one
  * verifies `T`'s derived contract against the queue's (positional
  * name+type equality) and throws IncompatibleSchemaException on any
  * mismatch — a wrong case class fails at open, not at first pop. */
class TypedQueue[T](val queue: ParquetQueue)(implicit enc: Encoder[T]) {
  private val spark: SparkSession = queue.spark

  locally {
    val derived = TypedQueue.schemaOf[T]
    if (derived.toString != queue.schema.toString)
      throw new IncompatibleSchemaException(
        s"encoder schema $derived does not match queue contract ${queue.schema}")
  }

  /** Driver-local Row → `T` decoder: the encoder's deserializer bound
    * once against the contract schema — plain function application per
    * row, no Spark job. Resolution uses `as[T]`'s up-cast rules, so a
    * narrowing field (an Int field against the contract's stored long)
    * fails LOUDLY — and it fails HERE at construction, before any pop
    * could consume (and so lose) an entry it cannot decode. Declare
    * widened fields (Long/Double) in `T`. */
  private val fromRow: Row => T =
    org.apache.spark.sql.graft.Bridge.rowDeserializer(enc, queue.schema.sparkSchema)

  private def toTyped(rows: Seq[Row]): Seq[T] = rows.map(fromRow)

  def push(ds: Dataset[T], lifetimeMs: Long = -1L): Long =
    queue.push(ds.toDF(), lifetimeMs)

  def push(items: Seq[T]): Long = push(spark.createDataset(items)(enc))

  def tryPush(ds: Dataset[T], consumer: String = "default",
              lifetimeMs: Long = -1L): Boolean =
    queue.tryPush(ds.toDF(), consumer, lifetimeMs)

  def pushWait(ds: Dataset[T], timeoutMs: Long = -1L,
               consumer: String = "default"): Boolean =
    queue.pushWait(ds.toDF(), timeoutMs, consumer)

  def pop(n: Int, consumer: String = "default"): Seq[T] =
    toTyped(queue.pop(n, consumer))

  def tryPop(consumer: String = "default"): Option[T] =
    toTyped(queue.tryPop(consumer).toSeq).headOption

  def popWait(n: Int, timeoutMs: Long = -1L,
              consumer: String = "default"): Seq[T] =
    toTyped(queue.popWait(n, timeoutMs, consumer))

  /** Consume-with-error-permits over typed values (see
    * [[ParquetQueue.consume]] for the at-least-once/quarantine
    * semantics; conversion happens inside `f`'s attempt, so a
    * conversion failure consumes an error permit like any other
    * processing failure). Decode is the bound deserializer — no Spark
    * job per entry. */
  def consume[R](n: Int, consumer: String = "default", errorPermit: Int = 3)
                (f: T => R): Seq[R] =
    queue.consume(n, consumer, errorPermit)(row => f(fromRow(row)))

  def latest: Option[T] = toTyped(queue.latest.toSeq).headOption

  /** Typed Structured Streaming subscriber: the untyped envelope
    * stream with the payload decoded through the encoder (same
    * exactly-once checkpoint semantics as [[ParquetQueue.readStream]];
    * `as[T]`'s up-cast rules — narrowing fields fail loudly). */
  def readStream(maxBatchesPerTrigger: Int = 8): Dataset[T] =
    queue.readStream(maxBatchesPerTrigger)
      .select(enc.schema.fields.toSeq.map(f => col(f.name)): _*)
      .as[T](enc)

  def size(consumer: String = "default"): Long = queue.size(consumer)
  def isEmpty(consumer: String = "default"): Boolean = queue.isEmpty(consumer)
  def close(): Unit = queue.close()
  def dispose(): Unit = queue.dispose()
}
