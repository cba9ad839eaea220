package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream, Deflater}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Per-entry compression codecs (reference: Codec.scala:14-43 —
  * PLAIN/GZIP) re-expressed as native Catalyst expressions over binary
  * columns, so compression composes with any plan (and parquet's own
  * page compression handles the at-rest case the reference used GZIP
  * for). Codegen emits a direct static call — stays inside
  * WholeStageCodegen rather than falling back to interpreted eval.
  */
object Codecs {
  def gzipCompress(bytes: Array[Byte]): Array[Byte] = {
    val baos = new ByteArrayOutputStream(bytes.length / 2 + 16)
    val out = new GZIPOutputStream(baos) { `def`.setLevel(Deflater.BEST_SPEED) }
    out.write(bytes)
    out.close()
    baos.toByteArray
  }

  def gzipDecompress(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
    val out = new ByteArrayOutputStream(bytes.length * 2 + 16)
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }
}

abstract class GzipCodecExpression extends UnaryExpression {
  override def dataType: DataType = BinaryType
  protected def fn: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Codecs.$fn($c)")
}

case class GzipCompress(child: Expression) extends GzipCodecExpression {
  override def prettyName: String = "gzip_compress"
  protected def fn: String = "gzipCompress"
  override def nullSafeEval(v: Any): Any = Codecs.gzipCompress(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): GzipCompress = copy(c)
}

case class GzipDecompress(child: Expression) extends GzipCodecExpression {
  override def prettyName: String = "gzip_decompress"
  protected def fn: String = "gzipDecompress"
  override def nullSafeEval(v: Any): Any = Codecs.gzipDecompress(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): GzipDecompress = copy(c)
}
