package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Curate, Dedup, Erase, Lexical}

/** L65 composed erasure: after one `Erase.erase` call the erased ids
  * stop answering on EVERY persisted surface, survivors keep working,
  * and the DSIR model forgets the erased content. */
class EraseSpec extends SparkSpec {
  import spark.implicits._

  test("erase removes the ids from lexical, IVF, signatures, and DSIR at once") {
    val docs = table("documents").localCheckpoint(true)
    val emb = table("embeddings").localCheckpoint(true)
    val erasedIds = Seq(3L, 7L, 11L)
    val idsDf = erasedIds.toDF("doc_id")

    // build all four surfaces
    val lex = "erase_spec_lex"
    Lexical.buildIndex(docs, "doc_id", "text", lex)
    val ivf = java.nio.file.Files.createTempDirectory("erase_ivf").toString + "/idx"
    Ann.buildIvfIndex(emb.withColumnRenamed("vec_id", "doc_id"),
      "doc_id", "embedding", ivf, nClusters = 4, iters = 1, trainFraction = 1.0)
    val sig = "erase_spec_sig"
    Dedup.buildSignatureTable(docs, "doc_id", "text", sig)
    val dsir = "erase_spec_dsir"
    Curate.buildDsirCounts(docs, "doc_id", "text", col("lang") === "en", dsir)

    // the erased docs are visible everywhere beforehand
    val probeText = docs.filter(col("doc_id") === 3L)
      .select("text").head().getString(0)
    val probeTerm = probeText.split("\\s+").head
    assert(Lexical.searchBm25(spark, lex, Seq(probeTerm), k = 1000)
      .filter(col("doc_id").isin(erasedIds: _*)).count() > 0)
    // synthetic query id: searchIvfIndex excludes self-matches, so the
    // probe must not share an id with the target
    val probeVec = emb.filter(col("vec_id") === 3L)
      .select(lit(900000L).as("qid"), col("embedding"))
    assert(Ann.searchIvfIndex(spark, ivf, probeVec, "qid", "embedding",
        k = 3, nProbe = 4)
      .filter(col("nn_id") === 3L).count() == 1,
      "the erased doc's vector matches itself before erase")
    assert(Dedup.minhashAgainstTable(
        docs.filter(col("doc_id") === 3L)
          .select(col("doc_id") + 100000L as "doc_id", col("text")),
        "doc_id", "text", sig)
      .filter(col("corpus_id") === 3L).count() > 0, "signature hit before erase")

    // one call
    Erase.erase(spark, idsDf, "doc_id", Erase.Surfaces(
      lexIndex = Some(lex), ivfIndexPath = Some(ivf),
      signatureTable = Some(sig)))
    Erase.eraseDsir(docs.filter(col("doc_id").isin(erasedIds: _*)),
      "doc_id", "text", col("lang") === "en", dsir)

    // gone from every surface; survivors still answer
    val lexAfter = Lexical.searchBm25(spark, lex, Seq(probeTerm), k = 1000)
    assert(lexAfter.filter(col("doc_id").isin(erasedIds: _*)).isEmpty)
    assert(lexAfter.count() > 0, "survivors still searchable")
    val ivfAfter = Ann.searchIvfIndex(spark, ivf, probeVec, "qid",
      "embedding", k = 3, nProbe = 4)
    assert(ivfAfter.filter(col("nn_id").isin(erasedIds: _*)).isEmpty)
    assert(ivfAfter.count() > 0)
    assert(Dedup.minhashAgainstTable(
        docs.filter(col("doc_id") === 3L)
          .select(col("doc_id") + 100000L as "doc_id", col("text")),
        "doc_id", "text", sig)
      .filter(col("corpus_id").isin(erasedIds: _*)).isEmpty,
      "an erased doc must stop matching future ingest probes")

    // DSIR model equals one trained WITHOUT the erased docs
    val expected = {
      val t2 = "erase_spec_dsir_ref"
      Curate.buildDsirCounts(docs.filter(!col("doc_id").isin(erasedIds: _*)),
        "doc_id", "text", col("lang") === "en", t2)
      spark.table(s"${t2}_dsir_counts").orderBy("f")
        .collect().map(_.toSeq).toSeq
    }
    val got = spark.table(s"${dsir}_dsir_counts").orderBy("f")
      .collect().map(_.toSeq).toSeq
    assert(got == expected, "erased counts ≡ never-ingested counts")
  }
}
