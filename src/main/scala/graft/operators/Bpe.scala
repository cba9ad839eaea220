package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._
import graft.functions.BpeKernel.EndOfWord

/** L28: BPE tokenizer training — the tokenizer-prep step of a training
  * pipeline (Sennrich et al. byte-pair encoding, word-internal merges
  * with an end-of-word sentinel).
  *
  * Scale contract: training runs over the corpus's WORD-FREQUENCY
  * table, not its documents — one distributed groupBy(word) pass, then
  * the top-`maxWords` head (deterministic cut: count desc, word asc) is
  * collected driver-side and merges are learned there. By Zipf's law
  * the head covers almost all token mass at any corpus size, so the
  * driver-side work is bounded regardless of corpus bytes (the same
  * sample-bounded-training contract as `Ann.trainCentroids`). The
  * learned merge table is a driver-bounded artifact applied MAP-SIDE
  * via the codegen'd [[graft.functions.BpeEncode]] kernel — the corpus
  * never shuffles against the model.
  */
object Bpe {

  /** Learn `nMerges` BPE merges from the corpus's word-frequency head.
    * Deterministic: candidate pairs rank by (count desc, pair asc). */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            maxWords: Int = 10000): Seq[(String, String)] = {
    val head = df.select(explode(tokenize_ws(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    trainFromCounts(head, nMerges)
  }

  /** Classic BPE over a (word, count) table: repeatedly merge the
    * most frequent adjacent symbol pair (ties broken lexicographically
    * on the pair, so training is order- and engine-independent). */
  def trainFromCounts(wordCounts: Seq[(String, Long)],
                      nMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] = wordCounts.toArray.map {
      case (w, c) => (w.map(String.valueOf(_)).toArray :+ EndOfWord, c)
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (mergePair(syms, best), c) }
        round += 1
      }
    }
    merges.toSeq
  }

  private def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = new Array[String](syms.length)
    var w = 0
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out(w) = syms(i) + syms(i + 1); w += 1; i += 2
      } else { out(w) = syms(i); w += 1; i += 1 }
    }
    java.util.Arrays.copyOf(out, w)
  }

  /** Train on `df` and return it tokenized: doc rows with the subword
    * token array (map-side apply of the learned merges). */
  def tokenize(df: DataFrame, textCol: String, nMerges: Int,
               maxWords: Int = 10000): DataFrame = {
    val merges = train(df, textCol, nMerges, maxWords)
    df.withColumn("bpe_tokens", bpe_encode(tokenize_ws(col(textCol)), merges))
  }
}
