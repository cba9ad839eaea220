package graft

import org.apache.spark.sql.functions._

import graft.functions._
import graft.functions.BpeKernel
import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "low lower lowest low low"),
    (2L, "new newer newest new"),
    (3L, "low newer low lowest"),
    (4L, "wider wide widest newer"))
    .toDF("doc_id", "text")

  test("training is deterministic and merges rank by weighted frequency") {
    val m1 = Bpe.train(corpus, "text", nMerges = 20)
    val m2 = Bpe.train(corpus, "text", nMerges = 20)
    assert(m1 == m2)
    assert(m1.nonEmpty)
    // 'lo' is the most frequent first pair ("low" x6-ish weighted):
    // the first merge must involve the corpus's heaviest adjacent pair
    val naive = Bpe.trainFromCounts(
      Seq(("low", 6L), ("lower", 1L), ("lowest", 2L), ("new", 3L),
        ("newer", 3L), ("newest", 1L), ("wider", 1L), ("wide", 1L),
        ("widest", 1L)), 1)
    assert(m1.head == naive.head)
  }

  test("incremental trainer is merge-for-merge equal to the naive recount trainer") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val head = d.select(explode(tokenize_ws(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(2000)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val fast = Bpe.trainFromCounts(head, 300)
    val naive = Bpe.trainFromCountsNaive(head, 300)
    assert(fast == naive)
    // exhaustion path: ask for more merges than exist in a tiny head
    val tiny = Seq(("ab", 3L), ("ba", 2L))
    assert(Bpe.trainFromCounts(tiny, 1000) == Bpe.trainFromCountsNaive(tiny, 1000))
  }

  test("encodeWord parity with a naive reference implementation") {
    val merges = Bpe.train(corpus, "text", nMerges = 30)
    val ranks = BpeKernel.rankMap(merges)
    // naive reference: apply merges strictly in learned order, each
    // fully, repeatedly from the start after any change
    def naiveEncode(word: String): List[String] = {
      var syms = word.map(String.valueOf(_)).toList :+ BpeKernel.EndOfWord
      var changed = true
      while (changed) {
        changed = false
        // lowest-rank pair present anywhere
        val present = syms.zip(syms.tail).filter(p =>
          ranks.containsKey(p._1 + " " + p._2))
        if (present.nonEmpty) {
          val best = present.minBy(p => ranks.get(p._1 + " " + p._2).toInt)
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.toList
          changed = true
        }
      }
      syms
    }
    for (w <- Seq("low", "lowest", "newer", "widest", "unseen", "x"))
      assert(BpeKernel.encodeWord(w, ranks).toList == naiveEncode(w),
        s"mismatch on '$w'")
  }

  test("encoding round-trips: concatenated segments rebuild each word") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = Bpe.train(d, "text", nMerges = 50)
    val bad = d.select(tokenize_ws(col("text")).as("t"))
      .select(col("t"), bpe_encode(col("t"), merges).as("b"))
      .select(concat_ws("", col("t")).as("orig"),
        regexp_replace(concat_ws("", col("b")), "</w>", "").as("rebuilt"))
      .filter(col("orig") =!= col("rebuilt"))
      .count()
    assert(bad == 0L)
  }

  test("encoding is partitioning-invariant (map-side determinism)") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = Bpe.train(d, "text", nMerges = 30)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
          concat_ws(" ", bpe_encode(tokenize_ws(col("text")), merges)).as("enc"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(run(d) == run(d.repartition(13)))
  }

  test("more merges never increase the token count; merges compress") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val m10 = Bpe.train(d, "text", nMerges = 10)
    val m80 = Bpe.train(d, "text", nMerges = 80)
    def total(merges: Seq[(String, String)]) =
      d.select(sum(size(bpe_encode(tokenize_ws(col("text")), merges))))
        .head().getLong(0)
    val chars = d.select(sum(length(regexp_replace(col("text"), " ", "")) +
      token_count(col("text")))).head().getLong(0) // chars + one </w> per word
    val t10 = total(m10)
    val t80 = total(m80)
    assert(t10 < chars, "10 merges should compress below char count")
    assert(t80 <= t10, "80 merges must compress at least as much as 10")
  }

  test("non-BMP code points keep distinct identities (surrogate-pair safe)") {
    // two different emoji: one UTF-16 surrogate pair each. A char-level
    // split would decompose them into lone surrogates that UTF8String
    // mangles into identical replacement bytes.
    val grin = new String(Character.toChars(0x1F600))
    val joy = new String(Character.toChars(0x1F602))
    assert(BpeKernel.initialSymbols(grin).toSeq == Seq(grin, BpeKernel.EndOfWord))
    val docs = Seq((1L, s"$grin $grin $joy"), (2L, s"$joy $grin $joy"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", nMerges = 5)
    val enc = docs.select(col("doc_id"),
        bpe_encode(tokenize_ws(col("text")), merges).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // rebuilt text must round-trip the original code points exactly
    assert(enc(1L).mkString.replace(BpeKernel.EndOfWord, "") == grin + grin + joy)
    // distinct emoji never collide to the same token sequence
    assert(enc(1L) != enc(2L))
  }
}
