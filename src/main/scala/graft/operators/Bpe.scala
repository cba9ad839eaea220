package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._
import graft.functions.BpeKernel

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
    * on the pair, so training is order- and engine-independent).
    *
    * Incremental trainer (the Sennrich reference-implementation shape):
    * pair counts and a pair -> containing-word index are built once,
    * then each merge touches ONLY the words that contain the merged
    * pair — per-round cost is proportional to the merged pair's
    * occurrence mass, not the whole head. Candidate selection uses a
    * lazy max-heap (stale entries skipped on dequeue, touched pairs
    * re-enqueued after each merge), so a production-sized vocabulary
    * (30-50k merges) stays tractable where the naive recount-everything
    * loop is O(nMerges x head x avgLen). */
  def trainFromCounts(wordCounts: Seq[(String, Long)],
                      nMerges: Int): Seq[(String, String)] = {
    type Pair = (String, String)
    // Code-point split (shared with the apply kernel) — surrogate-pair
    // safe, so training and encoding agree on non-BMP input.
    val words: Array[Array[String]] = wordCounts.toArray.map {
      case (w, _) => BpeKernel.initialSymbols(w)
    }
    val wCount: Array[Long] = wordCounts.map(_._2).toArray

    val pairCount = mutable.HashMap.empty[Pair, Long]
    // Word-index posting list per pair. Entries can go stale after a
    // merge rewrites a word; consumers re-verify with containsPair.
    val pairWords = mutable.HashMap.empty[Pair, mutable.HashSet[Int]]

    def applyWord(wi: Int, sign: Long): Unit = {
      val syms = words(wi); val c = wCount(wi) * sign
      var i = 0
      while (i < syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        val nc = pairCount.getOrElse(k, 0L) + c
        if (nc == 0L) pairCount.remove(k) else pairCount.update(k, nc)
        if (sign > 0L) pairWords.getOrElseUpdate(k, mutable.HashSet.empty) += wi
        i += 1
      }
    }
    var wi = 0
    while (wi < words.length) { applyWord(wi, 1L); wi += 1 }

    // Max-heap on count; ties prefer the lexicographically SMALLEST
    // pair — identical selection rule to minBy((-c, a, b)).
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](
      new Ordering[(Long, String, String)] {
        def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(x._1, y._1)
          if (c != 0) c
          else {
            val a = y._2.compareTo(x._2)
            if (a != 0) a else y._3.compareTo(x._3)
          }
        }
      })
    pairCount.foreach { case ((a, b), c) => heap.enqueue((c, a, b)) }

    val merges = mutable.ArrayBuffer.empty[Pair]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      var best: Pair = null
      while (best == null && heap.nonEmpty) {
        val (c, a, b) = heap.dequeue()
        if (pairCount.getOrElse((a, b), -1L) == c) best = (a, b)
      }
      if (best == null) exhausted = true
      else {
        merges += best
        val affected = pairWords.getOrElse(best, mutable.HashSet.empty).toArray
        val touched = mutable.HashSet.empty[Pair]
        var j = 0
        while (j < affected.length) {
          val w = affected(j)
          val old = words(w)
          if (containsPair(old, best)) {
            var i = 0
            while (i < old.length - 1) { touched += ((old(i), old(i + 1))); i += 1 }
            applyWord(w, -1L)
            words(w) = mergePair(old, best)
            applyWord(w, 1L)
            val ns = words(w)
            i = 0
            while (i < ns.length - 1) { touched += ((ns(i), ns(i + 1))); i += 1 }
          }
          j += 1
        }
        pairWords.remove(best)
        touched.foreach { k =>
          val c = pairCount.getOrElse(k, 0L)
          if (c > 0L) heap.enqueue((c, k._1, k._2))
        }
        round += 1
      }
    }
    merges.toSeq
  }

  /** Naive recount-every-round trainer, kept as the parity reference
    * for the incremental one (BpeSpec asserts merge-for-merge
    * equality). Selection rule: minBy((-count, a, b)). */
  private[graft] def trainFromCountsNaive(wordCounts: Seq[(String, Long)],
                                          nMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] = wordCounts.toArray.map {
      case (w, c) => (BpeKernel.initialSymbols(w), c)
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

  private def containsPair(syms: Array[String], pair: (String, String)): Boolean = {
    var i = 0
    while (i < syms.length - 1) {
      if (syms(i) == pair._1 && syms(i + 1) == pair._2) return true
      i += 1
    }
    false
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
