package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern substring automaton (Aho & Corasick,
  * CACM 1975) — the scale shape for SUBSTRING blocklists. The token
  * blocklist (L51, `blocklist_stats`) only matches whole whitespace
  * tokens; published unsafe-content lists are largely PHRASES and
  * sub-token strings, which naively cost O(len(text) · Σ|pattern|)
  * per row (one `contains` scan per pattern — real CPU at 10³
  * patterns × 100 TB). The automaton matches ALL patterns in ONE
  * left-to-right pass: O(len(text) + matches) per row regardless of
  * pattern count.
  *
  * Build: trie over the patterns' UTF-16 units, BFS failure links
  * goto-completed into a dense DFA over the COMPACT alphabet (the
  * distinct chars appearing in any pattern; any other char resets to
  * root in O(1)), and per-state output lists merged through the
  * failure chain into one flat CSR array — the scan never walks
  * failure links. Matches are counted at every end position
  * (overlapping and nested matches all count, the classic AC
  * semantics), which is exactly replayable in SQL as "number of start
  * offsets where substring(text, i, len(p)) = p".
  *
  * The instance is plan-embedded via `addReferenceObj` (the
  * BlocklistStats discipline): built once on the driver, serialized
  * as the pattern array only, rebuilt lazily per executor JVM.
  */
final class AcAutomaton(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "ac_match_stats needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "ac_match_stats patterns must be non-empty")
  require(patterns.distinct.length == patterns.length,
    s"ac_match_stats patterns must be distinct")

  /** Number of patterns (P); the stats array is P + 2 long. */
  def nPatterns: Int = patterns.length

  // All automaton state is @transient and rebuilt from `patterns` on
  // first use in each JVM — only the pattern array travels with the
  // plan.
  @transient private lazy val built: (Array[Int], Array[Int], Int, Array[Int], Array[Int]) = {
    import scala.collection.mutable
    // 1. alphabet: distinct UTF-16 units across all patterns
    val alphaChars = patterns.flatMap(_.toCharArray).distinct.sorted
    val alpha = alphaChars.length
    val charMap = Array.fill(Char.MaxValue.toInt + 1)(-1)
    var ci = 0
    while (ci < alpha) { charMap(alphaChars(ci)) = ci; ci += 1 }
    // 2. trie
    val children = mutable.ArrayBuffer(mutable.Map.empty[Int, Int]) // node -> (alphaIdx -> node)
    val ends = mutable.ArrayBuffer(List.empty[Int])                 // node -> pattern ids ending here
    var p = 0
    while (p < patterns.length) {
      val s = patterns(p)
      var node = 0
      var i = 0
      while (i < s.length) {
        val a = charMap(s.charAt(i))
        node = children(node).getOrElseUpdate(a, {
          children += mutable.Map.empty[Int, Int]
          ends += Nil
          children.length - 1
        })
        i += 1
      }
      ends(node) = p :: ends(node)
      p += 1
    }
    val n = children.length
    // 3. goto-completed DFA + failure links (BFS)
    val dfa = new Array[Int](n * alpha)
    val fail = new Array[Int](n)
    val queue = mutable.Queue.empty[Int]
    var a = 0
    while (a < alpha) {
      children(0).get(a) match {
        case Some(c) => dfa(a) = c; fail(c) = 0; queue += c
        case None    => dfa(a) = 0
      }
      a += 1
    }
    // merged outputs built in BFS order (fail(v) always dequeued first)
    val outs = Array.fill(n)(List.empty[Int])
    outs(0) = ends(0)
    while (queue.nonEmpty) {
      val v = queue.dequeue()
      outs(v) = ends(v) ::: outs(fail(v))
      var b = 0
      while (b < alpha) {
        children(v).get(b) match {
          case Some(c) =>
            fail(c) = dfa(fail(v) * alpha + b)
            dfa(v * alpha + b) = c
            queue += c
          case None =>
            dfa(v * alpha + b) = dfa(fail(v) * alpha + b)
        }
        b += 1
      }
    }
    // 4. flatten outputs to CSR
    val outStart = new Array[Int](n + 1)
    var v = 0
    while (v < n) { outStart(v + 1) = outStart(v) + outs(v).length; v += 1 }
    val outPat = new Array[Int](outStart(n))
    v = 0
    while (v < n) {
      var k = outStart(v)
      outs(v).foreach { pid => outPat(k) = pid; k += 1 }
      v += 1
    }
    (dfa, charMap, alpha, outStart, outPat)
  }

  /** One-pass scan: `[n_matches_total, n_distinct_patterns,
    * count_0, …, count_{P-1}]` (counts index-aligned with the
    * constructor's pattern order). */
  def matchStats(text: UTF8String): ArrayData = {
    val (dfa, charMap, alpha, outStart, outPat) = built
    val s = text.toString
    val counts = new Array[Long](patterns.length + 2)
    var st = 0
    var i = 0
    while (i < s.length) {
      val a = charMap(s.charAt(i))
      st = if (a < 0) 0 else dfa(st * alpha + a)
      var k = outStart(st)
      val end = outStart(st + 1)
      while (k < end) { counts(outPat(k) + 2) += 1; k += 1 }
      i += 1
    }
    var total = 0L
    var distinct = 0L
    var j = 2
    while (j < counts.length) {
      total += counts(j)
      if (counts(j) > 0) distinct += 1
      j += 1
    }
    counts(0) = total
    counts(1) = distinct
    new GenericArrayData(counts)
  }
}

/** Fused Aho–Corasick substring-blocklist statistics: ONE codegen'd
  * pass over the text against a plan-embedded automaton. Returns
  * `[n_matches, n_distinct_patterns, c_0, …, c_{P-1}]` — see
  * [[AcAutomaton.matchStats]]. */
case class AcMatchStats(child: Expression, acPatterns: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ac_match_stats"
  @transient private lazy val ac = new AcAutomaton(acPatterns.toArray)
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got ${other.catalogString}")
    }
  override def nullSafeEval(v: Any): Any =
    ac.matchStats(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", ac, "graft.functions.AcAutomaton")
    defineCodeGen(ctx, ev, c => s"$acRef.matchStats($c)")
  }
  override protected def withNewChildInternal(c: Expression): AcMatchStats =
    copy(child = c)
}
