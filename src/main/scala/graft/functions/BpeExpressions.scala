package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static BPE apply kernel. The merge table is learned driver-side on a
  * bounded sample ([[graft.operators.Bpe.train]] -- the tokenizer-trainer
  * shape: models are driver-bounded artifacts, corpora are not), then
  * applied map-side here: one static call per row from generated code,
  * no shuffle of the corpus against the model.
  */
object BpeKernel {

  /** End-of-word sentinel appended as a separate final symbol, so
    * merges distinguish word-final from word-internal contexts (the
    * classic Sennrich et al. formulation). */
  final val EndOfWord = "</w>"

  // pair-key separator: symbols come from whitespace-split tokens'
  // characters, so a space can never appear inside a symbol
  private final val Sep = " "

  /** (left, right) -> merge priority (0 = learned first, applied first). */
  def rankMap(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + Sep + b, Int.box(i))
    }
    m
  }

  /** Split a word into per-CODE-POINT symbols — surrogate pairs stay
    * whole, so non-BMP input (emoji, CJK extensions) keeps distinct
    * identities instead of decomposing into lone surrogates that
    * UTF8String mangles into identical replacement bytes. The trainers
    * ([[graft.operators.Bpe]]) use the same split for parity. */
  def initialSymbols(word: String): Array[String] = {
    val out = new Array[String](word.codePointCount(0, word.length) + 1)
    var i = 0
    var k = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val len = Character.charCount(cp)
      out(k) = word.substring(i, i + len)
      k += 1
      i += len
    }
    out(k) = EndOfWord
    out
  }

  /** Greedy BPE segmentation of one word: start from code points +
    * end-of-word sentinel, repeatedly apply the LOWEST-rank adjacent
    * merge present until none applies. Deterministic for any input. */
  def encodeWord(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var syms = initialSymbols(word)
    var done = syms.length <= 1
    while (!done) {
      // find the lowest-rank adjacent pair
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.get(syms(j) + Sep + syms(j + 1))
        if (r != null && r < bestRank) bestRank = r
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        // merge every occurrence of the best pair, left to right
        val out = new Array[String](syms.length)
        var w = 0
        j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && {
            val r = ranks.get(syms(j) + Sep + syms(j + 1))
            r != null && r == bestRank
          }) {
            out(w) = syms(j) + syms(j + 1); w += 1; j += 2
          } else { out(w) = syms(j); w += 1; j += 1 }
        }
        syms = java.util.Arrays.copyOf(out, w)
        done = syms.length <= 1
      }
    }
    syms
  }

  /** Encode a token array: concatenation of each word's BPE segments. */
  def encode(tokens: ArrayData, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val n = tokens.numElements()
    val out = new java.util.ArrayList[UTF8String](n * 2)
    var i = 0
    while (i < n) {
      val segs = encodeWord(tokens.getUTF8String(i).toString, ranks)
      var j = 0
      while (j < segs.length) { out.add(UTF8String.fromString(segs(j))); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Map-side BPE apply: token array -> subword token array under a
  * driver-trained merge table (embedded in the plan; the model is
  * vocabulary-bounded by construction, see [[graft.operators.Bpe]]). */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"
  @transient private lazy val ranks = BpeKernel.rankMap(merges)
  override def nullSafeEval(v: Any): Any =
    BpeKernel.encode(v.asInstanceOf[ArrayData], ranks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // raw type: the codegen backend (Janino) does not parse generics
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeKernel.encode($c, $ranksRef)")
  }
  override protected def withNewChildInternal(c: Expression): BpeEncode = copy(child = c)
}
