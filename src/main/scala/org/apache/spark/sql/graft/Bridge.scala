package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, Encoder, Row}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.StructType

/** Column ↔ Expression bridge. Spark 4 made the classic constructors
  * `private[sql]`; extensions conventionally reach them from a package
  * under org.apache.spark.sql (same pattern every Spark connector and
  * spark-sketches-style library uses).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Driver-side Row → T decoder for rows shaped like `schema`,
    * resolved through `enc` — no Spark job per conversion. Resolution
    * applies the same up-cast rules as `Dataset.as[T]`: a narrowing
    * mismatch (e.g. stored long into an Int field) fails loudly at
    * first use instead of silently wrapping. */
  def rowDeserializer[T](enc: Encoder[T], schema: StructType): Row => T = {
    val base = enc match {
      case e: ExpressionEncoder[T @unchecked] => e
      case a: org.apache.spark.sql.catalyst.encoders.AgnosticEncoder[T @unchecked] =>
        ExpressionEncoder(a)
      case other => throw new IllegalArgumentException(
        s"unsupported encoder type: ${other.getClass.getName}")
    }
    val exprEnc = base.resolveAndBind(DataTypeUtils.toAttributes(schema))
    val toInternal = CatalystTypeConverters.createToCatalystConverter(schema)
    val deser = exprEnc.createDeserializer()
    (r: Row) => deser(toInternal(r).asInstanceOf[InternalRow])
  }
}
