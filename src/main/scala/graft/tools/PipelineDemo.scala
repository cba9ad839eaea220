package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions._
import graft.operators.{Decontaminate, Dedup, Layout, Pack}

/** End-to-end training-data pipeline over the library surface:
  * read → repetition gate → calibrated quality gate → language gate →
  * per-source cap → exact dedup → block-level dedup accounting →
  * clustered near-dup removal → decontamination vs an eval slice →
  * target-mix resample → BPE tokenize → chunk → deterministic sample →
  * shard packing → sized partitioned write.
  * Prints one line per stage (rows surviving).
  * `sbt "runMain graft.tools.PipelineDemo [sfDir]"`
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"),
      "pipeline-demo")
    def stage(name: String, n: Long): Unit = println(f"[pipeline] $name%-22s $n%7d rows")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    stage("ingest", docs.count())

    // Gopher rule battery first (the published pre-filter order):
    // word-count/word-length/symbol/line/alpha/stop-word flags, keep
    // the conjunction; flags stay available for per-rule audits
    val ruled = docs.join(
      graft.operators.Curate.gopherFlags(docs, "doc_id", "text",
          stopWords = Seq("the", "a"))
        .filter(col("keep") === 1).select("doc_id"),
      "doc_id")
    stage("gopher rules", ruled.count())

    // C4-style token blocklist, by the DERIVED ratio policy rather
    // than zero-tolerance (the synthetic vocabulary makes any doc hit
    // eventually): keep docs whose blocklisted-token rate is <= 2.0%.
    // One fused codegen pass; the flags would also feed per-source
    // attrition via Curate.scorecard.
    val unblocked = ruled.join(
      graft.operators.Curate.blocklistFlags(ruled, "doc_id", "text",
          Seq("slow"))
        .filter(col("hits_per_mille") <= 20).select("doc_id"),
      "doc_id")
    stage("blocklist (<=2.0%)", unblocked.count())

    // Gopher-style repetition gate: kernelized per-row signals
    val unrepeated = unblocked.filter(
      (size(tokenize_ws(col("text"))) - size(token_id_set(tokenize_ws(col("text")))))
        .cast("double") / greatest(size(tokenize_ws(col("text"))), lit(1)) <= 0.65 &&
      max_adjacent_pair_count(tokenize_ws(col("text"))).cast("double") /
        greatest(size(tokenize_ws(col("text"))) - 1, lit(1)) <= 0.08)
    stage("repetition gate", unrepeated.count())

    // per-language calibrated cut: each lang keeps its upper half
    // (shared implementation: operators.Curate, same as q_quality_calibrated)
    val q1e4 = floor(quality_score(col("text")) * 10000 + 0.5).cast("long")
    val scored = unrepeated.withColumn("q1e4", q1e4)
    val med = graft.operators.Curate.groupMedian(scored, "lang", "q1e4", "doc_id", "med")
    val quality = scored.join(broadcast(med), "lang")
      .filter(col("q1e4") >= col("med")).drop("q1e4", "med")
    stage("calibrated quality", quality.count())

    val langOk = quality.filter(col("lang").isin("en", "de", "es", "fr"))
    stage("lang gate", langOk.count())

    // DSIR importance gate: keep documents whose hashed n-gram profile
    // is at least neutral toward the target (en) distribution — the
    // model is a B-row broadcast, the gate a map-side join
    val dsirKeep = graft.operators.Curate.dsirScores(langOk, "doc_id",
        "text", col("lang") === "en")
      .filter(col("score_q") >= 1000000L).select("doc_id")
    val targeted = langOk.join(dsirKeep, "doc_id")
    stage("dsir importance", targeted.count())

    // membership audit (report-only): docs whose bottom-20% bigrams
    // still average >= 0.5 probability under the corpus LM — the
    // min-k signature of duplicated/memorized text (rides the
    // registered suspect-list query)
    val suspects = graft.SparkEntry.queries("q_mink_contamination")(spark, sfDir)
      .filter(col("mink_q") >= 50000000L).count()
    println(f"[pipeline] ${"min-k audit"}%-22s $suspects%7d docs with high-prob tails")

    // label-noise audit: train the en-vs-rest classifier (L44, three
    // one-aggregate rounds, broadcast integer weights) on the corpus's
    // OWN lang tags and count docs whose margin disagrees with the
    // tag — the mislabeled-data check a pipeline runs before trusting
    // upstream language metadata
    val wts = graft.operators.Train.logisticGd(
      docs.select(hashed_bow(tokenize_ws(col("text")), 64).as("x"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y")),
      "x", "y", dims = 64, rounds = 3)
    val disagree = docs.select(col("lang"),
        (graft.operators.Train.marginMicro(
          hashed_bow(tokenize_ws(col("text")), 64), wts) > 0L).as("pred_en"))
      .filter((col("lang") === "en") =!= col("pred_en")).count()
    println(f"[pipeline] ${"label-noise audit"}%-22s $disagree%7d docs disagree with lang tag")

    // domain balancing: no source contributes more than 200 docs
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(md5(col("text")), col("doc_id"))
    val capped = targeted.withColumn("rk", row_number().over(wc))
      .filter(col("rk") <= 200).drop("rk")
    stage("source cap (200)", capped.count())

    val exactKept = Dedup.exact(capped, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val afterExact = capped.join(exactKept, "doc_id")
    stage("exact dedup", afterExact.count())

    // block-level accounting: how much repeated-span mass remains
    // (coalesce: an emptied pipeline must report 0, not NPE)
    val blockMass = Dedup.dedupBlocks(afterExact, "doc_id", "text")
      .agg(coalesce(sum(col("n_blocks")), lit(0L)).as("nb"),
        coalesce(sum(col("n_kept")), lit(0L)).as("nk")).head()
    println(f"[pipeline] ${"block dedup mass"}%-22s ${blockMass.getLong(1)}%7d" +
      f" of ${blockMass.getLong(0)}%d blocks unique")

    val pairs = Dedup.minhashPairs(afterExact, "doc_id", "text", minJaccard = 0.9)
    val afterNear = Dedup.removeNearDupsClustered(afterExact, "doc_id", pairs)
    stage("near-dup clusters", afterNear.count())

    // asymmetric pass: drop docs >=90% shingle-contained in a
    // surviving doc (quote/digest redundancy the symmetric pass
    // keeps). Cut the lineage first: the probe references its input
    // several times, and each reference would otherwise re-execute
    // the whole upstream pipeline
    val nearCut = afterNear.transform(graft.operators.Lineage.pin)
    val afterContain = Dedup.removeContained(nearCut, "doc_id", "text",
      num = 9L, den = 10L, shingleN = 3).transform(graft.operators.Lineage.pin)
    stage("containment removal", afterContain.count())

    // novelty floor: a doc owning <10% of its shingles is assembled
    // from passages the survivors already carry
    val novel = graft.operators.Curate
      .shingleNovelty(afterContain, "doc_id", "text", 3)
      .filter(col("novelty_ppm") >= 100000)
      .select("doc_id")
    val afterNovel = afterContain.join(novel, "doc_id")
    stage("novelty floor (10%)", afterNovel.count())

    val evalSlice = docs.filter(col("doc_id") % 23 === 0)
    val clean = Decontaminate.removeContaminated(afterNovel, evalSlice,
      "doc_id", "text", shingleN = 3, minMatched = 5)
    stage("decontaminated", clean.count())

    // target-mix resample: en to 40% of output, others 15% each
    // (shared implementation: operators.Curate, same as q_mix_target)
    val rates = graft.operators.Curate.mixThresholds(clean, "lang",
      when(col("lang") === "en", lit(0.4)).otherwise(lit(0.15)))
    val mixed = clean.join(broadcast(rates), "lang")
      .filter(substring(md5(col("text")), 1, 4) < col("thr")).drop("thr")
    stage("target mix", mixed.count())

    // distribution audit: how far did curation move the corpus?
    // (TV distance between the ingest and post-mix n-gram profiles —
    // B-row comparison, no corpus re-read beyond the two profiles)
    val drift = graft.operators.Curate.profileDrift(
        graft.operators.Curate.corpusProfile(docs, "doc_id", "text"),
        graft.operators.Curate.corpusProfile(mixed, "doc_id", "text"))
      .head().getAs[Long]("tv_q")
    println(f"[pipeline] ${"distribution drift"}%-22s ${drift / 10000.0}%7.2f%% TV vs ingest")

    // leakage-safe split: dedup removed >=0.9 near-dups above, but
    // moderately-similar docs remain — split on the 0.7-Jaccard
    // cluster key so they never straddle train/test (the real-world
    // recipe: dedup hard at 0.9, split leakage-safe at 0.7)
    val softPairs = Dedup.minhashPairs(clean, "doc_id", "text",
      minJaccard = 0.7)
    val splitDf = graft.operators.Curate.leakageSafeSplit(clean, "doc_id",
      softPairs, Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    val splitCounts = splitDf.groupBy("split").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(", ")
    println(f"[pipeline] ${"leakage-safe split"}%-22s $splitCounts")

    // BPE tokenize: merges from the word-frequency head, applied map-side
    val merges = graft.operators.Bpe.train(mixed, "text", nMerges = 100)
    val bpeTokens = mixed
      .select(coalesce(sum(size(bpe_encode(tokenize_ws(col("text")), merges))
        .cast("long")), lit(0L)))
      .head().getLong(0)
    println(f"[pipeline] ${"bpe tokens"}%-22s $bpeTokens%7d (merges: ${merges.size})")

    val chunks = mixed.select(col("doc_id"), col("lang"),
        explode(chunk_windows(col("text"), 32, 8)).as("c"))
      .select(col("doc_id"), col("lang"), col("c.chunk_idx"),
        col("c.chunk_text"), col("c.n_chunk_tokens"))
    stage("chunked (32/8)", chunks.count())

    val sampled = chunks.filter(substring(md5(col("chunk_text")), 1, 2) < "c0")
    stage("sampled (~75%)", sampled.count())

    val shards = Pack.assignShardsShuffled(
      sampled.withColumn("cid",
        col("doc_id") * 100000 + col("chunk_idx")),
      "cid", col("n_chunk_tokens"), col("chunk_text"), budgetTokens = 4096)
    stage("packed shards", shards.select("shard").distinct().count())

    val out = Files.createTempDirectory("pipeline_out").toString
    Layout.writeSized(sampled, out, Seq("lang"), filesPerPartition = 2,
      idCol = "doc_id")
    val written = spark.read.parquet(out)
    stage("written", written.count())
    println(s"[pipeline] layout dirs: " +
      new java.io.File(out).listFiles().count(_.getName.startsWith("lang=")))

    // serving tail: index the curated corpus once, answer a query
    // batch from the committed index (build-once / probe-many)
    import graft.operators.Lexical
    import spark.implicits._
    Lexical.buildIndex(mixed, "doc_id", "text", "pipeline_demo_idx")
    val hits = Lexical.searchBm25Batch(
      Seq((1L, "spark join"), (2L, "vector stream")).toDF("qid", "qtext"),
      "qid", "qtext", "pipeline_demo_idx", k = 5)
    println(f"[pipeline] ${"served queries"}%-22s ${hits.count()}%7d hits " +
      s"(top doc per query: ${hits.filter(col("rank") === 1).orderBy("query_id")
        .collect().map(r => s"${r.getLong(0)}->${r.getLong(2)}").mkString(", ")})")

    // semantic serving tail: featurize the curated corpus natively
    // (hashed_bow — no external embedding model) and serve neighbors
    // from a persisted IVF+PQ index (pruned + compressed probes)
    val vecs = mixed.select(col("doc_id"),
      hashed_bow(tokenize_ws(col("text")), 64).as("emb"))
    val ivfpqDir = Files.createTempDirectory("pipeline_ivfpq").toString
    graft.operators.Ann.buildIvfPqIndex(vecs, "doc_id", "emb", ivfpqDir,
      nClusters = 8, m = 16, ksub = 16, iters = 2, trainFraction = 1.0)
    val qIds = vecs.orderBy("doc_id").limit(2)
    val semHits = graft.operators.Ann.searchIvfPqIndex(spark, ivfpqDir,
      qIds, "doc_id", "emb", k = 3, nProbe = 4, refine = 4)
    println(f"[pipeline] ${"semantic neighbors"}%-22s ${semHits.count()}%7d hits " +
      s"(ivf+pq index over hashed_bow)")

    // hybrid serving tail: the SAME text queries answered by BOTH
    // committed indexes — BM25 over the lexical index, cosine over the
    // IVF+PQ index (queries featurized with the corpus's hashed_bow) —
    // fused by reciprocal rank fusion. Query ids start past the
    // corpus's max doc id (not a fixed 9xxx guess, which a larger sf
    // would collide with) so the index's same-id guard never fires.
    val qBase = mixed.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val hq = Seq((qBase, "spark join"), (qBase + 1L, "vector stream"))
      .toDF("qid", "qtext")
    val hLex = Lexical.searchBm25Batch(hq, "qid", "qtext",
      "pipeline_demo_idx", k = 5)
    val hSem = graft.operators.Ann.searchIvfPqIndex(spark, ivfpqDir,
        hq.select(col("qid"), hashed_bow(tokenize_ws(col("qtext")), 64).as("emb")),
        "qid", "emb", k = 5, nProbe = 4, refine = 4)
      .withColumnRenamed("nn_id", "doc_id")
    val fused = graft.operators.Retrieval.rrfFuse(Seq(hLex, hSem), k = 5)
    println(f"[pipeline] ${"hybrid serving"}%-22s ${fused.count()}%7d hits " +
      s"(top doc per query: ${fused.filter(col("rank") === 1).orderBy("query_id")
        .collect().map(r => s"${r.getLong(0)}->${r.getLong(2)}").mkString(", ")})")

    // r9 third push: canonical source accounting + UniMax mixing +
    // JSONL export — the tail stages that turn a curated corpus into
    // a training release.
    val docsAll = graft.queries.RelationalQueries.t(spark, sfDir, "documents")
    val canon = graft.operators.Resolve.canonicalMap(docsAll, "source", 2)
    println(f"[pipeline] ${"canonical sources"}%-22s " +
      f"${canon.select("canon").distinct().count()}%7d entities " +
      s"from ${canon.count()} raw source spellings")
    val sizes = docsAll.groupBy("lang")
      .agg(sum(graft.functions.token_count(col("text"))).as("t_tok"))
    val alloc = graft.operators.Curate.unimaxAlloc(sizes, "lang", 3L, 2L, 1L)
    val remixed = graft.operators.Curate.unimaxApply(docsAll, "text", "lang", alloc)
    println(f"[pipeline] ${"unimax mix (2x, e<=3)"}%-22s " +
      f"${remixed.count()}%7d rows from ${docsAll.count()} docs")
    val relDir = java.nio.file.Files
      .createTempDirectory("graft_release").toString + "/corpus"
    graft.sources.Jsonl.write(remixed.drop("epoch"), relDir, "gzip", Some(4))
    val back = graft.sources.Jsonl.read(spark, relDir,
      remixed.drop("epoch").schema)
    println(f"[pipeline] ${"jsonl release"}%-22s ${back.count()}%7d rows " +
      s"re-read from ${relDir.split('/').last}/ (gzip shards)")

    // r10: the release ships with its corpus card — composition,
    // mixture, rule attrition, and the shard manifest in one document
    val card = graft.operators.CorpusCard.cardRows(docsAll, "doc_id",
      "text", "lang", "source", stopWords = Seq("the", "a"),
      blocklist = Seq("slow", "stream"))
    val manifest = graft.sources.Manifest.build(back, "doc_id")
    val cardMd = graft.operators.CorpusCard.markdownWithManifest(
      card, manifest, "graft demo release")
    println(s"[pipeline] corpus card: ${cardMd.linesIterator.size} lines, " +
      s"${manifest.count()} manifest shards; head:")
    cardMd.linesIterator.take(6).foreach(l => println(s"[pipeline]   $l"))
    spark.stop()
  }
}
