package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed data model mirroring the reference's 5-type schema
  * (reference: DataType.scala:31-69, Schema.scala:17-63) re-expressed
  * on Spark SQL's type system. The reference serializes tuples to a
  * byte stream; on Spark the columnar equivalent is a `StructType`
  * whose fields use the exact Spark types below — parquet and Tungsten
  * then own the wire format (varint/RLE/dictionary), which strictly
  * dominates the reference's hand-rolled bitcoin-varint encoding.
  */
sealed abstract class GraftType(val id: Byte, val name: String) {
  /** Spark SQL type this graft type maps onto. */
  def sparkType: DataType
}

object GraftType {
  /** i64 (reference DataType.INTEGER — varint on disk; Long here). */
  case object INTEGER extends GraftType(0, "int") { val sparkType: DataType = LongType }
  /** f64 (reference DataType.REAL). */
  case object REAL extends GraftType(1, "real") { val sparkType: DataType = DoubleType }
  /** utf8 (reference DataType.TEXT). */
  case object TEXT extends GraftType(2, "text") { val sparkType: DataType = StringType }
  /** bytes (reference DataType.BINARY). */
  case object BINARY extends GraftType(3, "binary") { val sparkType: DataType = BinaryType }
  /** n-dim tensor: shape + row-major values (reference DataType.TENSOR). */
  case object TENSOR extends GraftType(4, "tensor") {
    val sparkType: DataType = StructType(Seq(
      StructField("shape", ArrayType(IntegerType, containsNull = false)),
      StructField("values", ArrayType(DoubleType, containsNull = false))))
  }

  val values: Seq[GraftType] = Seq(INTEGER, REAL, TEXT, BINARY, TENSOR)
  private val byId = values.map(t => t.id -> t).toMap
  private val byName = values.map(t => t.name -> t).toMap
  def valueOf(id: Byte): GraftType = byId(id)
  def valueOf(name: String): GraftType = byName(name)
}

class IncompatibleSchemaException(msg: String) extends RuntimeException(msg)

/** Ordered, named field list — the queue's payload contract.
  * The reference's Schema is positional (unnamed); names are required
  * for columnar storage, so fields carry both position and name.
  */
case class GraftSchema(fields: Seq[(String, GraftType)]) {
  require(fields.length <= 0xFF, s"too many schema types: ${fields.length} > 255")

  def sparkSchema: StructType =
    StructType(fields.map { case (n, t) => StructField(n, t.sparkType, nullable = false) })

  /** Validate that `df`'s columns structurally conform; throws
    * IncompatibleSchemaException like the reference's serialize
    * (Schema.scala:24-37) — but set-at-plan-time instead of per-row.
    *
    * Every field of the contract is NON-NULL (`sparkSchema` declares
    * nullable=false). Type conformance is checked here at plan time;
    * null VALUES can only be seen at runtime, so the normalized output
    * carries a codegen'd null guard per field that raises a clear
    * "non-null contract" error the moment one appears — instead of the
    * opaque encoder failure a consumer would otherwise hit mid-write.
    */
  def validate(df: DataFrame): DataFrame = {
    val actual = df.schema
    if (actual.length != fields.length)
      throw new IncompatibleSchemaException(
        s"struct values are incompatible for schema: ${actual.length} fields != ${fields.length}")
    fields.zip(actual.fields).foreach { case ((name, gt), af) =>
      val ok = (gt, af.dataType) match {
        case (GraftType.INTEGER, LongType | IntegerType | ShortType | ByteType) => true
        case (GraftType.REAL, DoubleType | FloatType | _: DecimalType) => true
        case (GraftType.TEXT, StringType) => true
        case (GraftType.BINARY, BinaryType) => true
        case (GraftType.TENSOR, s: StructType) =>
          s.fieldNames.sameElements(Array("shape", "values"))
        case _ => false
      }
      if (!ok) throw new IncompatibleSchemaException(
        s"incompatible struct field type: expect ${gt.name}, actual ${af.dataType.simpleString} ($name)")
    }
    // Normalize to canonical spark types + names (positional contract),
    // with a per-field null guard enforcing the non-null contract.
    df.select(fields.zip(df.columns).map { case ((name, gt), c) =>
      val v = col(c).cast(gt.sparkType)
      when(v.isNotNull, v)
        .otherwise(raise_error(lit(
          s"null value for non-null schema field '$name' (${gt.name})")))
        .as(name)
    }: _*)
  }

  /** Compact binary descriptor (4-bit ids like Schema.toByteArray) for
    * embedding in queue segment metadata. */
  def descriptor: Array[Byte] =
    fields.length.toByte +: fields.map(_._2.id).grouped(2).map { g =>
      (((g.head & 0x0F) << 4) | (if (g.length > 1) g(1) & 0x0F else 0)).toByte
    }.toArray

  override def toString: String =
    fields.map { case (n, t) => s"$n:${t.name}" }.mkString("[", ",", "]")
}

object GraftSchema {
  def apply(first: (String, GraftType), rest: (String, GraftType)*): GraftSchema =
    GraftSchema(first +: rest)

  def fromDescriptor(bytes: Array[Byte]): Seq[GraftType] = {
    val n = bytes.head & 0xFF
    bytes.tail.flatMap(b => Seq(((b >> 4) & 0x0F).toByte, (b & 0x0F).toByte))
      .take(n).map(GraftType.valueOf).toSeq
  }

  /** Build the tensor struct column from shape + values arrays,
    * enforcing the reference's shape.product == values.length invariant
    * (Struct.scala:64-66) at runtime via a null-on-mismatch guard.
    */
  def tensor(shape: Column, values: Column): Column =
    when(aggregate(shape, lit(1), (a, x) => a * x) === size(values),
      struct(shape.as("shape"), values.as("values")))

  def vector(values: Column): Column =
    struct(array(size(values)).as("shape"), values.as("values"))
}
