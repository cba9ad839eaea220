package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise sum of `array<double>` vectors — a native aggregate with
  * partial (map-side) aggregation, so a k-means / IVF centroid update
  * shuffles one partial sum per (partition, cluster) instead of n·d
  * exploded rows (the scale-killer the exploded-avg formulation had).
  * Ragged inputs are zero-extended to the longest vector seen.
  *
  * Input is coerced to `array<double>` at analysis time
  * (ImplicitCastInputTypes), so `vector_sum` over an `array<long>` /
  * `array<int>` / `array<float>` column — e.g. a count-min sketch row
  * from [[CountMinAgg]] — sums the numeric VALUES rather than failing
  * (GenericArrayData path) or reinterpreting raw long bits as IEEE
  * doubles (UnsafeArrayData path after a shuffle).
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  // return type inferred: AbstractDataType is private[sql]
  override def inputTypes = Seq(ArrayType(DoubleType))

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def add(buf: Array[Double], v: Array[Double]): Array[Double] =
    if (buf.isEmpty) v
    else if (v.isEmpty) buf
    else {
      val out =
        if (buf.length >= v.length) buf
        else java.util.Arrays.copyOf(buf, v.length)
      var i = 0
      while (i < v.length) { out(i) += v(i); i += 1 }
      out
    }

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer
    else add(buffer, v.asInstanceOf[ArrayData].toDoubleArray())
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = add(b1, b2)

  override def eval(buffer: Array[Double]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_sum"
  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSum =
    copy(child = newChild)
}
