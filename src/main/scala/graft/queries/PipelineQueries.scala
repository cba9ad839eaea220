package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._
import graft.operators.{Ann, Curate, Decontaminate, Dedup, Multimodal, Pack}
import RelationalQueries.t

/** LLM-training-data pipeline queries (SURVEY.md §2 L1-L12) over the
  * `documents` and `embeddings` tables. LSH-based near-dup queries
  * (minhash/simhash/embed) have no SQL oracle — the hash families are
  * engine-native — so they get rows-only checks here and recall
  * verification against exact baselines in DedupSpec/AnnSpec.
  */
object PipelineQueries {

  /** Shared jaccard≥0.9 pair graph for the cluster twins, persisted
    * build-once/probe-many (`Dedup.buildPairTable`): the exact O(m²)
    * verify the recursive-CTE oracle requires runs once per (JVM,
    * corpus dir), and both graph consumers probe the committed narrow
    * table — the same amortization contract as the BM25 index and the
    * ingest signature table. Memo keyed by dir so a different SF in
    * the same JVM rebuilds; a fresh JVM always rebuilds (stale
    * warehouse tables are never trusted). */
  private val pairTableMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def jaccardPairGraph(s: SparkSession, dir: String): DataFrame = {
    val table = pairTableMemo.computeIfAbsent(dir, d => {
      val name = "graft_pairs_" + RelationalQueries.dirKey(d)
      Dedup.buildPairTable(t(s, d, "documents"), "doc_id", "text",
        Seq("lang"), name, minJaccard = 0.9, parallelBuckets = 8)
      name
    })
    s.table(table)
  }

  /** Shared cluster labels over the persisted pair graph, computed
    * once per (JVM, corpus dir): label propagation is iterative (the
    * most expensive consumer of the pair graph), and FOUR queries need
    * the labels (cluster listing, apply, best-member apply, savings
    * report) — re-deriving per query repeated the whole propagation.
    * Like the neighboring memos (pair graph, IVF+PQ index) the memo
    * stores a PATH, not a DataFrame: a cached localCheckpoint'ed frame
    * is bound to the session/executors that materialized it, so a
    * recycled session would leave every labels consumer holding
    * unrecoverable checkpoint blocks. Persisting once and re-reading
    * per call is session-agnostic and costs one narrow parquet scan. */
  private val clusterLabelsMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def clusterLabels(s: SparkSession, dir: String): DataFrame = {
    val path = clusterLabelsMemo.computeIfAbsent(dir, d => {
      val p = "spark-warehouse/graft_clusters_" + RelationalQueries.dirKey(d)
      Dedup.clusters(jaccardPairGraph(s, d))
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** Shared persisted IVF+PQ index, built once per (JVM, corpus dir) —
    * same amortization as the pair graph and the lexical index. */
  private val ivfPqMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ivfPqIndex(s: SparkSession, dir: String): String =
    ivfPqMemo.computeIfAbsent(dir, d => {
      val path = "spark-warehouse/graft_ivfpq_" + RelationalQueries.dirKey(d)
      Ann.buildIvfPqIndexQuantized(t(s, d, "embeddings"), "vec_id",
        "embedding", path,
        nClusters = 16, m = 16, ksub = 32, iters = 2, trainFraction = 1.0)
      path
    })

  /** Shared gzip-JSONL export of the documents table, written once per
    * (JVM, corpus dir) — the sink side of the L58 roundtrip gate. */
  private val jsonlMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def jsonlExport(s: SparkSession, dir: String): String =
    jsonlMemo.computeIfAbsent(dir, d => {
      val p = "spark-warehouse/graft_jsonl_" + RelationalQueries.dirKey(d)
      graft.sources.Jsonl.write(t(s, d, "documents"), p, "gzip", Some(8))
      p
    })

  /** Shared gzip-CSV export — the sink side of the L58b roundtrip. */
  private val csvMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def csvExport(s: SparkSession, dir: String): String =
    csvMemo.computeIfAbsent(dir, d => {
      val p = "spark-warehouse/graft_csv_" + RelationalQueries.dirKey(d)
      graft.sources.Csv.write(t(s, d, "documents"), p, "gzip", Some(8))
      p
    })

  /** Shared fixed-width export — the sink side of the L58d
    * roundtrip. The long free-text column ships as its fixed-length
    * md5 surrogate (the format's documented contract: fixed width is
    * for the structured slice), so the SAME parquet-side oracle
    * aggregations hold. */
  private val fwMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  val fwLayout: Seq[(String, Int)] = Seq(
    "doc_id" -> 20, "lang" -> 8, "source" -> 24, "n_chars" -> 10,
    "text_md5" -> 32)
  private def fwExport(s: SparkSession, dir: String): String =
    fwMemo.computeIfAbsent(dir, d => {
      val p = "spark-warehouse/graft_fw_" + RelationalQueries.dirKey(d)
      graft.sources.FixedWidth.write(
        t(s, d, "documents").select(col("doc_id"), col("lang"),
          col("source"), col("n_chars"), md5(col("text")).as("text_md5")),
        p, fwLayout, "gzip", Some(8))
      p
    })

  /** Shared ORC export — the sink side of the L58c roundtrip. */
  private val orcMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def orcExport(s: SparkSession, dir: String): String =
    orcMemo.computeIfAbsent(dir, d => {
      val p = "spark-warehouse/graft_orc_" + RelationalQueries.dirKey(d)
      graft.sources.Orc.write(t(s, d, "documents"), p, "zlib", Some(8))
      p
    })

  /** Shared two-era evolved export (R48): era 1 = the first half of
    * documents WITHOUT source/n_chars (the day-one schema), era 2 =
    * the rest with the full schema. */
  private val evolveMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def evolveExport(s: SparkSession, dir: String): String =
    evolveMemo.computeIfAbsent(dir, d => {
      val p = "spark-warehouse/graft_evolve_" + RelationalQueries.dirKey(d)
      val docs = t(s, d, "documents")
      graft.sources.Evolve.writeEra(
        docs.filter(col("doc_id") < 250)
          .select("doc_id", "text", "lang"), p, era = 1, Some(4))
      graft.sources.Evolve.writeEra(
        docs.filter(col("doc_id") >= 250), p, era = 2, Some(4))
      p
    })

  private def mediaMeta(s: SparkSession, dir: String) = {
    import s.implicits._
    Multimodal.decodeMeta(
      t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[Multimodal.MediaRow])
  }

  /** Shared persisted containment pair table (L82), built once per
    * (JVM, corpus dir) — the [[jaccardPairGraph]] amortization: the
    * prefix-probe join is the expensive step and both containment
    * consumers (pair listing, removal) probe the same narrow table.
    * Path-memoized for the same session-agnostic reason as the
    * cluster labels. */
  private val containPairsMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** L106 oracle scaffold: the winnow fingerprint INVENTORY of a
    * release relation — distinct (source, fp) rows via the same
    * gram → window-min chain as [[Shared.winnowCteSql]], parameterized
    * over the release's FROM expression and a CTE-name prefix so both
    * releases coexist in one statement. */
  private def winnowInvCteSql(relExpr: String, p: String): String =
    s"""${p}g AS (
       |  SELECT source,
       |    CASE WHEN len(cps) = 0 THEN []
       |         WHEN len(cps) < 8 THEN [list_reduce(
       |            list_prepend(CAST(0 AS BIGINT), cps),
       |            (a, b) -> (a * 31 + b) % 1000000007)]
       |         ELSE list_transform(range(1, len(cps) - 8 + 2),
       |            i -> list_reduce(
       |              list_prepend(CAST(0 AS BIGINT),
       |                list_slice(cps, i, i + 7)),
       |              (a, b) -> (a * 31 + b) % 1000000007)) END AS grams
       |  FROM (
       |    SELECT source, list_transform(regexp_extract_all(text, '.'),
       |      c -> CAST(unicode(c) AS BIGINT)) AS cps
       |    FROM $relExpr)),
       |${p}i AS (
       |  SELECT DISTINCT source AS grp, u.fp
       |  FROM (
       |    SELECT source,
       |      CASE WHEN len(grams) = 0 THEN []
       |           WHEN len(grams) <= 16 THEN [list_aggregate(grams, 'min')]
       |           ELSE list_transform(range(1, len(grams) - 16 + 2),
       |              j -> list_aggregate(list_slice(grams, j, j + 15),
       |                'min')) END AS wins
       |    FROM ${p}g), UNNEST(wins) AS u(fp))""".stripMargin

  private def containmentPairTable(s: SparkSession, dir: String): DataFrame = {
    val path = containPairsMemo.computeIfAbsent(dir, d => {
      val p = "spark-warehouse/graft_contain_" + RelationalQueries.dirKey(d)
      Dedup.containmentPairs(t(s, d, "documents"), "doc_id", "text",
          num = 9L, den = 10L, shingleN = 3)
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** Untimed memo warm-up (see [[CurationQueries.prime]]): pair
    * graph, cluster labels, IVF+PQ index, interchange exports. */
  def prime(s: SparkSession, dir: String, names: Set[String]): Unit = {
    if (Seq("q_dedup_threshold_curve", "q_dup_source_matrix",
        "q_dup_triangles", "q_dup_kcore",
        "q_dup_communities", "q_pipeline_e2e").exists(names))
      jaccardPairGraph(s, dir)
    if (Seq("q_dedup_containment", "q_dedup_contain_apply",
        "q_dedup_containment_grouped").exists(names))
      containmentPairTable(s, dir)
    if (Seq("q_dedup_cluster", "q_dedup_cluster_apply",
        "q_dedup_cluster_best", "q_split_leakage_safe",
        "q_dedup_savings").exists(names)) clusterLabels(s, dir)
    if (names("q_ann_ivfpq")) ivfPqIndex(s, dir)
    if (names("q_jsonl_roundtrip")) jsonlExport(s, dir)
    if (names("q_csv_roundtrip")) csvExport(s, dir)
    if (names("q_orc_roundtrip")) orcExport(s, dir)
    if (names("q_fixedwidth_roundtrip")) fwExport(s, dir)
    if (names("q_schema_evolution")) evolveExport(s, dir)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // L1: exact dedup via content hash.
    "q_dedup_exact" -> { (s, dir) =>
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("keep_id")
    },

    // L2: word-set Jaccard near-dup, blocked by language.
    // parallelBuckets=8 halves the salted explode duplication; 5 langs
    // x 36 cells still saturates local[32] (raise B on a cluster).
    "q_dedup_jaccard" -> { (s, dir) =>
      Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
          Seq("lang"), minJaccard = 0.9, parallelBuckets = 8)
        .orderBy("doc_id1", "doc_id2")
    },

    // L5c (r11): exact-threshold similarity join by PREFIX FILTERING
    // (AllPairs/PPJoin) — the LSH-free exact path: candidates from a
    // join on each doc's rarest-df prefix tokens, rational 9/10
    // threshold so every bound is integer arithmetic (theorem-exact,
    // oracle-exact). Complements q_dedup_jaccard's blocked all-pairs
    // and q_dedup_minhash's banding: same pair semantics, different
    // candidate generation with zero false negatives by construction.
    "q_dedup_prefix" -> { (s, dir) =>
      // CPU-dense low-byte plan (prefix-salted join + early-abort merge
      // verify): under the default AQE floor its verify stages coalesce
      // to single reducers and serialize seconds of kernel time —
      // measured 7.2 s -> 2.1 s with the scoped floor (Scale.cpuDense;
      // inert at production shuffle volumes).
      Dedup.prefixJaccardPairs(
          t(graft.operators.Scale.cpuDense(s), dir, "documents"),
          "doc_id", "text", num = 9L, den = 10L)
        .orderBy("id1", "id2")
    },

    // L82: containment (asymmetric) dedup — ordered pairs where ≥90%
    // of the contained doc's 3-shingle set lives inside the container
    // (Broder containment over shingles, his original universe).
    // Catches what symmetric Jaccard is blind to: a passage quoted
    // whole inside a long doc scores containment 1.0 while its
    // Jaccard vanishes with the container's size. Shingles (not word
    // sets) because the 31-word vocabulary makes word-set containment
    // generic (2.7 M chance pairs at sf0.1 vs 505 genuine shingle
    // inclusions) and starves the prefix filter. One-sided prefix +
    // inverted container probe, exact by the same integer-rational
    // discipline as q_dedup_prefix. (DuckDB's brute-force twin needs
    // 583 s at sf0.1 for what the prefix path does in ~2 s.)
    "q_dedup_containment" -> { (s, dir) =>
      containmentPairTable(s, dir)
        .orderBy("contained_id", "container_id")
    },

    // L82d: per-tenant containment — tenant isolation (a doc quoted
    // in ANOTHER tenant's corpus never pairs, the L63e/L7c contract).
    // Blocking only REMOVES cross-tenant pairs (the containment
    // predicate is block-free), so with the global pair table already
    // memoized the grouped view is a tenant-equality filter over it —
    // the production answer when both views ship. The blocked-join
    // OPERATOR (containmentPairs(blockCols=...), the scale path when
    // tenants are many and cross-tenant pairs dominate) is gated by
    // DedupSpec's grouped ≡ per-tenant-solo-union equality.
    "q_dedup_containment_grouped" -> { (s, dir) =>
      val src = t(s, dir, "documents").select(col("doc_id"), col("source"))
      containmentPairTable(s, dir)
        .join(src.select(col("doc_id").as("contained_id"),
          col("source")), "contained_id")
        .join(src.select(col("doc_id").as("container_id"),
          col("source").as("__src2")), "container_id")
        .filter(col("source") === col("__src2"))
        .select("contained_id", "container_id", "cont_micro", "source")
        .orderBy("contained_id", "container_id")
    },

    // L2c: n-gram (3-shingle) Jaccard near-dup — order-sensitive
    // variant of q_dedup_jaccard (reordered text stops matching).
    // parallelBuckets=8: shingle id arrays are ~3x word sets, so halving
    // the salted explode duplication beats extra cells at local[32]
    // (5 langs x 36 cells still saturates 32 cores; raise B on a
    // cluster).
    "q_dedup_ngram" -> { (s, dir) =>
      Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
          Seq("lang"), minJaccard = 0.8, parallelBuckets = 8, shingleN = 3)
        .orderBy("doc_id1", "doc_id2")
    },

    // L16: dedup-at-ingest — the incoming slice (doc_id % 5 = 0)
    // deduped against the already-ingested corpus plus within-batch
    // (exact; oracled).
    "q_dedup_incremental" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      Dedup.incrementalExact(
          d.filter(col("doc_id") % 5 === 0),
          d.filter(col("doc_id") % 5 =!= 0), "doc_id", "text")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // L16b: near-dup at ingest — incoming batch MinHash-probed against
    // the corpus only, no corpus self-pairs (rows-only; recall gated
    // in DedupSpec).
    "q_dedup_against" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      Dedup.minhashAgainst(
          d.filter(col("doc_id") % 5 === 0),
          d.filter(col("doc_id") % 5 =!= 0), "doc_id", "text")
        .orderBy("incoming_id", "corpus_id")
    },

    // L3: MinHash-LSH candidates verified at Jaccard ≥ 0.9 (rows-only).
    "q_dedup_minhash" -> { (s, dir) =>
      Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
          k = 64, bands = 8, minJaccard = 0.9)
        .orderBy("doc_id1", "doc_id2")
    },

    // L4: SimHash hamming ≤ 3 near-dup. Oracled in the completeness
    // regime: at radius ≤ maxHamming the pigeonhole banding generates
    // EVERY qualifying pair (DedupSpec proves this vs brute force), so
    // a DuckDB brute-force hamming join over recomputed fingerprints
    // (FNV-1a in HUGEINT mod-2^64 arithmetic + majority vote) is an
    // exact oracle, hash-proving the whole banded plan.
    "q_dedup_simhash" -> { (s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
          maxHamming = 3)
        .orderBy("doc_id1", "doc_id2")
    },

    // L5: embedding-cosine near-dup via banded hyperplane LSH
    // (rows-only; threshold tuned to this corpus's similarity range).
    "q_dedup_embed" -> { (s, dir) =>
      Dedup.embeddingPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
          bands = 8, bitsPerBand = 4, minCosine = 0.4)
        .orderBy("id1", "id2")
    },

    // L99: winnowing fingerprints (MOSS, Schleimer et al. '03) — the
    // per-doc profile: distinct window-min 8-gram hashes at w=16, so
    // any 23-char substring match is guaranteed a shared fingerprint.
    // Kernel pass is map-side; the profile columns hash-oracle the
    // whole gram→window-min→distinct chain.
    "q_winnow" -> { (s, dir) =>
      // no filter on the kernel output: predicate pushdown substitutes
      // a filtered alias through the producing Project and re-evaluates
      // the kernel in the Filter condition (the r12 CollapseProject
      // lesson's pushdown twin) — empty docs instead surface as
      // n_fps = 0 rows with null profile slots (lazy CASE WHEN guards
      // keep ANSI element_at off empty arrays)
      t(s, dir, "documents")
        .select(col("doc_id"),
          winnow_fps(coalesce(col("text"), lit("")), 8, 16).as("fps"))
        .select(col("doc_id"),
          size(col("fps")).cast("long").as("n_fps"),
          when(size(col("fps")) > 0, element_at(col("fps"), 1)).as("fp_min"),
          when(size(col("fps")) > 0,
            element_at(col("fps"), size(col("fps")))).as("fp_max"),
          when(size(col("fps")) > 0,
            aggregate(col("fps"), lit(0L), (a, x) => a + x)).as("fp_sum"))
        .orderBy("doc_id")
    },

    // L99b: winnowed-overlap pairs — the MOSS matcher: candidates from
    // rare-fingerprint postings (df ≤ 8 — boilerplate fingerprints are
    // excluded from matching by design), verify = exact shared count
    // over the full sorted sets. Detects shared PASSAGES resemblance
    // and containment both miss.
    "q_winnow_pairs" -> { (s, dir) =>
      Dedup.winnowedPairs(t(s, dir, "documents"), "doc_id", "text",
          k = 8, w = 16, minShared = 8L, maxDf = 8L)
        .orderBy("id1", "id2")
    },

    // L99d: span localization — WHERE each winnowed pair's shared
    // material sits: matched positional anchors aggregated to per-pair
    // from/extent in both docs (the MOSS attribution report).
    "q_winnow_spans" -> { (s, dir) =>
      Dedup.winnowedSpanPairs(t(s, dir, "documents"), "doc_id", "text",
          k = 8, w = 16, minShared = 8L, maxDf = 8L)
        .orderBy("id1", "id2")
    },

    // L99f: lang-blocked winnow matching — the blocking discipline
    // (L2/L82d) applied to the passage matcher: candidates restricted
    // to same-language pairs (cross-language byte-identical passages
    // are code/boilerplate, handled by the unblocked gate), cutting
    // candidate volume by the language mix while df stays global.
    "q_winnow_pairs_blocked" -> { (s, dir) =>
      Dedup.winnowedPairs(t(s, dir, "documents"), "doc_id", "text",
          k = 8, w = 16, minShared = 8L, maxDf = 8L, blockCols = Seq("lang"))
        .orderBy("id1", "id2")
    },

    // L99e: winnow-based dedup APPLY — survivors after dropping the
    // larger id of every winnowed pair (the greedy min-id-survives
    // convention every pair family's apply member uses): removes docs
    // whose PASSAGE overlap with a kept doc clears the gate even when
    // resemblance and containment both pass them.
    "q_winnow_apply" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      Dedup.removeNearDups(d, "doc_id",
          Dedup.winnowedPairs(d, "doc_id", "text", k = 8, w = 16,
              minShared = 8L, maxDf = 8L)
            .withColumnRenamed("id2", "doc_id2"))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // L84: sampled near-dup rate — dedup QA at scale: a deterministic
    // 1/8 id-hash sample probed against the whole corpus (one-sided
    // prefix filter, lang-blocked) for a jaccard>=0.9 partner; the
    // measured ppm sizes the dedup problem without an all-pairs pass.
    "q_dup_rate_sampled" -> { (s, dir) =>
      Dedup.sampledDupRate(t(s, dir, "documents"), "doc_id", "text",
        Seq("lang"), num = 9L, den = 10L)
    },

    // L2b: apply the dedup - survivors after dropping the larger id of
    // every jaccard>=0.9 pair (greedy representative selection).
    "q_dedup_apply" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      Dedup.removeNearDups(d, "doc_id",
          Dedup.jaccardPairs(d, "doc_id", "text", Seq("lang"),
            minJaccard = 0.9, parallelBuckets = 8))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // L82b: containment-based removal — survivors after dropping
    // every doc ≥90%-contained (3-shingles) in another; mutual
    // containment keeps the min id so exact dups never double-drop.
    "q_dedup_contain_apply" -> { (s, dir) =>
      Dedup.removeContainedPairs(t(s, dir, "documents"), "doc_id",
          containmentPairTable(s, dir))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // L83: shingle novelty — the fraction of each doc's distinct
    // 3-shingles it OWNS (is the min-id first holder of): near-0 docs
    // are assembled from passages the corpus already has even when no
    // pair detector fires; the linear (no pair graph) novelty signal.
    "q_novelty" -> { (s, dir) =>
      graft.operators.Curate
        .shingleNovelty(t(s, dir, "documents"), "doc_id", "text", 3)
        .orderBy("doc_id")
    },

    // L19: connected-components clustering of the jaccard≥0.9 pair
    // graph — cluster id = min member id (oracled via a DuckDB
    // recursive CTE: min-label propagation equals transitive closure).
    // The pair graph comes from the persisted build-once table shared
    // with q_dedup_cluster_apply (see jaccardPairGraph).
    "q_dedup_cluster" -> { (s, dir) =>
      clusterLabels(s, dir)
        .select(col("id").as("doc_id"), col("cluster"))
        .orderBy("doc_id")
    },

    // L19b: clustered dedup apply — exactly one survivor per connected
    // component (transitive dups collapse even when their direct pair
    // missed the threshold; contrast with greedy q_dedup_apply).
    "q_dedup_cluster_apply" -> { (s, dir) =>
      Dedup.removeNearDupsClusteredLabels(t(s, dir, "documents"), "doc_id",
          clusterLabels(s, dir))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // L19c: quality-aware clustered dedup — each near-dup cluster
    // keeps its BEST member (longest doc; ties to lowest id) instead
    // of an arbitrary min-id representative: the curation-grade apply.
    // Probes the same persisted pair graph as the other cluster twins.
    "q_dedup_cluster_best" -> { (s, dir) =>
      Dedup.removeNearDupsClusteredBestLabels(t(s, dir, "documents"),
          "doc_id", "n_chars", clusterLabels(s, dir))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // L6: exact brute-force cosine top-5 for a small query set.
    "q_ann_bruteforce" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), "vec_id",
          "embedding", k = 5)
        .orderBy("query_id", "rank")
    },

    // L7i: Johnson–Lindenstrauss random projection (64 → 16 dims,
    // md5-derived ±1 matrix) + per-row recall audit vs the full-space
    // quantized-L2 top-10. All-integer (2^16-quantized inputs, ±1
    // signs, squared-L2 via three dot products), so the ENTIRE lossy
    // chain — projection, both rankings, the hit flags — hash-oracles.
    // mean(hit) is measured recall@10: the number that tunes outDim
    // at scale, where the 4× bandwidth cut is the win. On THIS
    // corpus it reads ~0.16 — the synthetic embeddings are isotropic
    // (distance concentration, the ranking worst case), and honestly
    // surfacing that is exactly the audit's job: a deployment would
    // see the number and raise outDim or keep IVF on raw vectors.
    "q_ann_jl" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Ann.jlTopKAudit(emb, emb.filter(col("vec_id") < 8), "vec_id",
          "embedding", k = 10, inDim = 64, outDim = 16)
        .orderBy("query_id", "rank")
    },

    // L6d (r11): MMR diversity rerank — the RAG context-selection
    // post-step: greedy λ·rel − (1−λ)·max-sim-to-picked over each
    // query's top-16 exact candidates, all-integer scoring (sims at
    // 1e-4 units, λ=7/10 cross-multiplied), so the 5 greedy rounds
    // replay as unrolled CTEs — the quantized-training trick applied
    // to iterative SELECTION.
    "q_retrieval_mmr" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Ann.mmrRerank(emb, emb.filter(col("vec_id") < 5), "vec_id",
          "embedding", nCandidates = 16, k = 5)
        .orderBy("query_id", "mmr_rank")
    },

    // L43: kNN classification — a 5% holdout labeled by majority vote
    // of its 5 nearest labeled neighbors (exact cosine; ties on
    // (votes desc, label asc)). Reported against the true labels.
    // The search rides the broadcast-queries contract; corpus-scale
    // inference swaps in bulkTopK per the operator doc (oracled).
    "q_knn_classify" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val hold = e.filter(col("vec_id") % 20 === 0)
      Ann.knnClassify(e.filter(col("vec_id") % 20 =!= 0), hold,
          "vec_id", "embedding", "label", k = 5)
        .join(hold.select(col("vec_id").as("query_id"),
          col("label").as("true_label")), "query_id")
        .withColumn("correct", col("pred_label") === col("true_label"))
        .orderBy("query_id")
    },

    // L49: hard-negative mining — per anchor, the 5 most-similar
    // vectors with a DIFFERENT label (near-miss negatives for a
    // contrastive loss; random negatives are trivially separable).
    // Exact cosine, label exclusion before ranking (oracled).
    "q_hard_negatives" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Ann.hardNegatives(emb, emb.filter(col("vec_id") < 25), "vec_id",
          "embedding", "label", k = 5)
        .orderBy("query_id", "rank")
    },

    // L53: margin-based bitext mining (Artetxe & Schwenk ratio
    // margin) — A = even vec_ids, B = odd; exact directional top-4,
    // integer µ-unit margin, per-source argmax above 1.0. Fully
    // oracled (the margin arithmetic is all-integer).
    "q_bitext_margin" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Ann.marginPairs(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 =!= 0),
          "vec_id", "embedding", k = 4, minMarginQ = 1000000L)
        .orderBy("src_id")
    },

    // L7: LSH-bucketed ANN — the scale path (rows-only; recall vs L6
    // measured in AnnSpec).
    "q_ann_lsh" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Ann.lshTopK(emb, emb.filter(col("vec_id") < 50), "vec_id",
          "embedding", k = 5, bits = 4)
        .orderBy("query_id", "rank")
    },

    // L7f: multi-probe LSH — same bucketed corpus as q_ann_lsh, each
    // query additionally probes its lowest-margin neighbor buckets
    // (rows-only; recall >= single-probe gated in AnnSpec).
    "q_ann_lsh_multi" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Ann.lshMultiProbeTopK(emb, emb.filter(col("vec_id") < 50), "vec_id",
          "embedding", k = 5, bits = 4, nProbe = 4)
        .orderBy("query_id", "rank")
    },

    // L7b: IVF-indexed ANN (k-means coarse quantizer, rows-only;
    // recall vs brute force measured in AnnSpec).
    // L7: IVF — integer-quantized Lloyd training + squared-L2 cell
    // assignment/probe order (Ann.ivfTopKQuantized): every training
    // and routing step is exact integer arithmetic in doubles, so the
    // FULL chain (2 Lloyd iterations included) replays as an unrolled
    // CTE in the oracle — a hash gate over a trained index, upgraded
    // from the r1-r9 rows-only gate.
    "q_ann_ivf" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Ann.ivfTopKQuantized(emb, emb.filter(col("vec_id") < 50), "vec_id",
          "embedding", k = 5, nClusters = 16, nProbe = 4, iters = 2,
          trainFraction = 0.25)
        .orderBy("query_id", "rank")
    },

    // L76: cluster-purity audit — quantized cells + per-cell corpus
    // share and majority-label purity: the embedding-space QA report
    // (is the space label-separable enough for stratified ops?).
    // Fully oracled, training included.
    "q_cluster_purity" -> { (s, dir) =>
      Ann.clusterPurity(t(s, dir, "embeddings"), "vec_id", "embedding",
          "label", nClusters = 8, iters = 2, trainFraction = 1.0)
        .orderBy("cluster")
    },

    // L7h: IVF with the probe depth chosen from a MEASURED recall floor
    // (one exact pass over a hash-held-out sample yields the whole
    // recall-vs-nProbe curve) instead of a hand-picked constant. On
    // the quantized path even the TUNING DECISION replays in the
    // oracle (md5-ordered sample, integer probe ranks, per-mille floor
    // compare) — upgraded from rows-only in r10; curve exactness +
    // recall still gated in AnnSpec.
    "q_ann_ivf_auto" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Ann.ivfTopKAutoQuantized(emb, emb.filter(col("vec_id") < 50),
          "vec_id", "embedding", k = 5, nClusters = 16, iters = 2,
          trainFraction = 0.25, recallPerMille = 900, sampleSize = 64)
        .orderBy("query_id", "rank")
    },

    // L6b: grouped (per-label) exact top-k — multi-tenant search: each
    // query scans only its own group's vectors (oracled).
    "q_ann_grouped" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Ann.groupedTopK(emb, emb.filter(col("vec_id") < 50), "vec_id",
          "embedding", "label", k = 5)
        .orderBy("query_id", "rank")
    },

    // L7c: per-group IVF — one coarse quantizer per tenant (rows-only;
    // recall vs grouped exact search gated in AnnSpec).
    // L7c: per-tenant IVF on the integer-quantized path — per-group
    // trained cells replay in the oracle (upgraded from rows-only).
    "q_ann_grouped_ivf" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Ann.groupedIvfTopKQuantized(emb, emb.filter(col("vec_id") < 50),
          "vec_id", "embedding", "label", k = 5, nClusters = 8, nProbe = 4,
          iters = 2, trainFraction = 1.0)
        .orderBy("query_id", "rank")
    },

    // L7d: PQ-compressed ANN — scan 16 small codes/vector instead of
    // the 64-double vector, exact re-rank on the ADC shortlist only
    // (rows-only; recall vs brute force gated in AnnSpec; m=16 because
    // the synthetic near-random embeddings need fine subspaces —
    // dsub=4 — for the ADC ranking to separate a tight sim range).
    // L7d: PQ on the integer-quantized path — sub-codebook training,
    // encode, and the ADC shortlist ORDER all replay in the oracle
    // (upgraded from rows-only in r10).
    "q_ann_pq" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Ann.pqTopKQuantized(emb, emb.filter(col("vec_id") < 50), "vec_id",
          "embedding", k = 5, m = 16, ksub = 32, iters = 3,
          trainFraction = 1.0, refine = 6)
        .orderBy("query_id", "rank")
    },

    // L7e: persisted IVF+PQ search — partition pruning (nProbe cells)
    // AND compressed candidate scan (residual PQ codes) from one
    // index; build amortized across calls. On the integer-quantized
    // path both trainings (coarse + residual PQ) replay in the oracle
    // — a full hash gate over a persisted two-stage index (upgraded
    // from rows-only in r10); recall + pruning + append still gated
    // in AnnSpec.
    "q_ann_ivfpq" -> { (s, dir) =>
      Ann.searchIvfPqIndexQuantized(s, ivfPqIndex(s, dir),
          t(s, dir, "embeddings").filter(col("vec_id") < 50),
          "vec_id", "embedding", k = 5, nProbe = 6, refine = 6)
        .orderBy("query_id", "rank")
    },

    // L26b: leakage-safe split — near-dup clusters (the persisted
    // jaccard≥0.9 pair graph) move into train/val/test as atomic
    // units, so eval rows never share a near-duplicate with training
    // rows (oracled: cluster CTE + the same md5-threshold CASE).
    "q_split_leakage_safe" -> { (s, dir) =>
      Curate.leakageSafeSplitLabels(t(s, dir, "documents"), "doc_id",
          clusterLabels(s, dir),
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .select("doc_id", "cluster", "split")
        .orderBy("doc_id")
    },

    // L26c: split-leakage matrix — the measurable comparison behind
    // L26b: the naive per-doc md5 fold split scatters dup clusters
    // across folds (off-diagonal n_pairs > 0 = train/test leakage),
    // while the cluster-atomic split keeps every near-dup pair on the
    // diagonal — the hash gate PROVES its cross-split mass is zero.
    "q_split_leakage" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val pairs = jaccardPairGraph(s, dir)
      val naive = docs.select(col("doc_id").as("id"),
        concat(lit("fold"),
          ((expr("locate(substring(md5(text), 1, 1), '0123456789abcdef')") - 1)
            % 4).cast("long").cast("string")).as("grp"))
      val safe = Curate.leakageSafeSplitLabels(docs, "doc_id",
          clusterLabels(s, dir),
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .select(col("doc_id").as("id"), col("split").as("grp"))
      Curate.splitLeakageMatrix(pairs, naive)
        .withColumn("method", lit("fold_md5"))
        .unionByName(Curate.splitLeakageMatrix(pairs, safe)
          .withColumn("method", lit("cluster_atomic")))
        .select("method", "grp_a", "grp_b", "n_pairs", "is_cross")
        .orderBy("method", "grp_a", "grp_b")
    },

    // L58: JSONL sink/source roundtrip — the corpus is exported as
    // gzip JSONL shards (the format LLM corpora actually ship in) and
    // read back with an EXPLICIT schema (no inference pass), then
    // aggregated per (lang, source) down to md5-exact text bytes. The
    // oracle computes the same aggregate from the PARQUET table, so
    // the hash gate proves the JSON encode→gzip→decode path is
    // byte-lossless end-to-end.
    "q_jsonl_roundtrip" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.sources.Jsonl.read(s, jsonlExport(s, dir), docs.schema)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_texts"),
          min(md5(col("text"))).as("lo_md5"),
          max(md5(col("text"))).as("hi_md5"),
          sum(col("doc_id")).as("sum_ids"))
        .orderBy("lang", "source")
    },

    // L67: embedding outlier audit — each vector's squared distance to
    // its OWN class centroid, top-5 farthest per label (the mislabeled/
    // corrupt-embedding sweep before the embeddings feed dedup or
    // retrieval). Components floor-quantize to integers BEFORE any
    // cross-row aggregation (float sums re-associate across engines;
    // integer sums don't), the centroid is a floored integer mean, the
    // distance a pure integer dot — value-exact end to end. One
    // (label, dim) shuffle of narrow quantized rows.
    "q_embed_outliers" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), posexplode(col("embedding")))
        .select(col("vec_id"), col("label"), col("pos"),
          floor(col("col").cast("double") * 1e6).cast("long").as("vq"))
      val cent = e.groupBy("label", "pos")
        .agg(floor(sum("vq").cast("double") / count(lit(1))).cast("long")
          .as("cq"))
      val d2 = e.join(cent, Seq("label", "pos"))
        .withColumn("dq", col("vq") - col("cq"))
        .groupBy("vec_id", "label")
        .agg(sum(col("dq") * col("dq")).as("d2"))
      val w = Window.partitionBy("label").orderBy(desc("d2"), col("vec_id"))
      d2.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select("label", "rank", "vec_id", "d2")
        .orderBy("label", "rank")
    },

    // L71: packing efficiency audit — per-shard fill and utilization
    // of the L20 assignment (padding waste IS wasted training compute;
    // the report that justifies or indicts a budget/bucketing choice).
    // One tiny rollup over the assignment frame.
    "q_pack_efficiency" -> { (s, dir) =>
      Pack.assignShards(t(s, dir, "documents"), "doc_id",
          graft.functions.token_count(col("text")),
          budgetTokens = 4096, buckets = 32)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("fill_tokens"))
        .withColumn("util_per_mille", expr("fill_tokens * 1000 div 4096"))
        .orderBy("shard")
    },

    // L69: dedup threshold-sensitivity curve — pair counts per 0.01
    // Jaccard bucket from the persisted graph (one narrow scan): the
    // evidence for CHOOSING a dedup threshold instead of inheriting
    // 0.9 from a paper — a spike just below the current cut means the
    // threshold sits on a cliff.
    "q_dedup_threshold_curve" -> { (s, dir) =>
      jaccardPairGraph(s, dir)
        .groupBy(floor(col("jac") * 100).cast("long").as("jac_pct"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("jac_pct")
    },

    // L69b: dedup savings ranking — the clusters whose collapse saves
    // the most tokens (total minus the kept max-token member): the
    // prioritized cleanup report, and the denominator for "dedup saved
    // X% of the corpus" claims. Cluster labels + token counts join on
    // well-spread ids; top-10 deterministic.
    "q_dedup_savings" -> { (s, dir) =>
      import graft.functions.token_count
      val cl = clusterLabels(s, dir)
      val tk = t(s, dir, "documents")
        .select(col("doc_id").as("id"), token_count(col("text")).as("tk"))
      cl.join(tk, "id")
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_docs"), sum("tk").as("total_tokens"),
          max("tk").as("keep_tokens"))
        .withColumn("wasted_tokens", col("total_tokens") - col("keep_tokens"))
        .orderBy(desc("wasted_tokens"), col("cluster"))
        .limit(10)
    },

    // L63: cross-source duplication matrix — which sources duplicate
    // which (mirror/syndication detection, the report that turns
    // pairwise dedup into crawl policy: a source pair with heavy
    // cross-duplication gets one of its crawls cut). Probes the
    // persisted pair graph and joins the narrow (doc, source) metadata
    // twice — the corpus text never re-reads.
    "q_dup_source_matrix" -> { (s, dir) =>
      val meta = t(s, dir, "documents").select(col("doc_id"), col("source"))
      jaccardPairGraph(s, dir)
        .join(meta.select(col("doc_id").as("doc_id1"), col("source").as("src1")),
          "doc_id1")
        .join(meta.select(col("doc_id").as("doc_id2"), col("source").as("src2")),
          "doc_id2")
        .select(least(col("src1"), col("src2")).as("source_a"),
          greatest(col("src1"), col("src2")).as("source_b"))
        .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_a", "source_b")
    },

    // L85 (r13): corpus-level resemblance matrix from bottom-64
    // minhash sketches (k=256) — the S·k-state answer to "how much do two
    // sources overlap" (L63 counts near-dup PAIRS, this measures
    // content-universe Jaccard without any pair graph). The exact
    // audit twin rides along so j_est vs j_exact is a measured error
    // column per pair — at 100 TB only the sketch path runs.
    "q_corpus_resemblance" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val k = 256 // ~6% rel. std-err at J~2.5%; state stays S·k
      val est = Dedup.sketchResemblance(
        Dedup.corpusSketch(d, "text", "source", k), k)
      val exact = Dedup.corpusResemblanceExact(d, "text", "source")
      est.join(exact, Seq("g1", "g2"), "left")
        .select(col("g1").as("src1"), col("g2").as("src2"),
          col("m"), col("n_common"), col("j_est_ppm"),
          coalesce(col("j_exact_ppm"), lit(0L)).as("j_exact_ppm"),
          col("c_ab_est_ppm"),
          coalesce(col("c_ab_exact_ppm"), lit(0L)).as("c_ab_exact_ppm"),
          col("c_ba_est_ppm"),
          coalesce(col("c_ba_exact_ppm"), lit(0L)).as("c_ba_exact_ppm"))
        .orderBy("src1", "src2")
    },

    // L61: dup-graph triangle audit — per-node triangle counts +
    // clustering coefficient over the persisted jaccard pair graph
    // (compact-forward degree orientation: out-degree bounded O(√m),
    // wedge join hub-safe). Coefficient ≈ 1000 marks true dup cliques;
    // low values mark chain components where transitive collapse is
    // merging docs that never directly matched.
    "q_dup_triangles" -> { (s, dir) =>
      // CPU-dense low-byte wedge plan: scoped AQE floor keeps the
      // wedge/closing stages off a single reducer (Scale.cpuDense —
      // a fanned-edge-list variant measured WORSE, 5.8 -> 9.2 s: the
      // explicit exchange broke the broadcast probe pipeline).
      Dedup.triangleStats(jaccardPairGraph(
          graft.operators.Scale.cpuDense(s), dir))
        .select(col("id").as("doc_id"), col("deg"), col("n_tri"),
          col("clus_per_mille"))
        .orderBy("doc_id")
    },

    // L79: 3-core of the dup graph — iterative peeling to fixpoint.
    // Chains/stars (what CC would still merge) peel away; only the
    // dense re-upload communities (template farms, mirror rings)
    // survive with their in-core degree. The oracle unrolls 8 peel
    // rounds (idempotent at fixpoint, so over-unrolling is safe; the
    // spec pins convergence within the unroll budget at gate SF).
    "q_dup_kcore" -> { (s, dir) =>
      Dedup.kCore(jaccardPairGraph(s, dir), k = 3L)
        .select(col("id").as("doc_id"), col("core_deg"))
        .orderBy("doc_id")
    },

    // L80: LPA communities over the dup graph — the detector BETWEEN
    // CC (merges across any bridge) and k-core (discards the fringe):
    // every node gets a community, dense regions outvote bridges.
    // Defined as labels after EXACTLY 4 synchronous self-vote rounds
    // (min-label ties), so the oracle unrolls the same 4 rounds.
    "q_dup_communities" -> { (s, dir) =>
      Dedup.labelPropagation(jaccardPairGraph(s, dir), rounds = 4)
        .select(col("id").as("doc_id"), col("community"))
        .orderBy("doc_id")
    },

    // L58b: CSV sink/source roundtrip — same gate as L58 over the
    // quoting/escaping-sensitive format (RFC-4180 doubled quotes); the
    // parquet-side oracle makes a hash match prove the CSV path is
    // byte-lossless on this corpus.
    "q_csv_roundtrip" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.sources.Csv.read(s, csvExport(s, dir), docs.schema)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_texts"),
          min(md5(col("text"))).as("lo_md5"),
          max(md5(col("text"))).as("hi_md5"),
          sum(col("doc_id")).as("sum_ids"))
        .orderBy("lang", "source")
    },

    // L58c: ORC sink/source roundtrip — the typed columnar
    // interchange format (orc-core ships in Spark). Same aggregate +
    // oracle as the JSONL/CSV roundtrips: a hash match proves the ORC
    // write/read path is lossless on this corpus, including the
    // columns' exact bytes (md5 min/max over text).
    // L58d: fixed-width roundtrip — the layout-file interchange path.
    // Same parquet-side oracle as CSV/ORC: the re-read export must
    // reproduce the aggregations bit-for-bit (text rides as its
    // fixed-length md5 surrogate, so n_texts/lo/hi are computed over
    // the SAME values both ways).
    "q_fixedwidth_roundtrip" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text_md5",
          org.apache.spark.sql.types.StringType)))
      graft.sources.FixedWidth.read(s, fwExport(s, dir), schema, fwLayout)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("text_md5")).as("n_texts"),
          min(col("text_md5")).as("lo_md5"),
          max(col("text_md5")).as("hi_md5"),
          sum(col("doc_id")).as("sum_ids"))
        .orderBy("lang", "source")
    },

    // R48: schema-evolution-tolerant read — two physical eras (the
    // day-one one missing source/n_chars entirely) read back as ONE
    // frame via mergeSchema, defaults backfilled in the plan; the
    // per-era aggregate replays exactly from the source-of-truth
    // table with the same split rule and CASE defaults.
    "q_schema_evolution" -> { (s, dir) =>
      graft.sources.Evolve.readEvolved(s, evolveExport(s, dir),
          Map("source" -> lit("legacy"), "n_chars" -> lit(-1L)))
        .groupBy("era", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_texts"),
          min(col("lang")).as("lo_lang"))
        .withColumn("era", col("era").cast("long"))
        .orderBy("era", "source")
    },

    "q_orc_roundtrip" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.sources.Orc.read(s, orcExport(s, dir), docs.schema)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_texts"),
          min(md5(col("text"))).as("lo_md5"),
          max(md5(col("text"))).as("hi_md5"),
          sum(col("doc_id")).as("sum_ids"))
        .orderBy("lang", "source")
    },

    // L20: sequence-packing shard assignment — distributed prefix sum
    // (per-bucket window + broadcast offsets), provably equal to the
    // oracle's single ORDER BY cumsum.
    "q_pack_shards" -> { (s, dir) =>
      Pack.assignShards(t(s, dir, "documents"), "doc_id",
          token_count(col("text")), budgetTokens = 4096, buckets = 32)
        .orderBy("doc_id")
    },

    // L23: vocabulary induction + coverage — build the top-V token
    // vocabulary (frequency desc, token asc tie-break: deterministic
    // at the cut) and report each language's out-of-vocabulary rate,
    // the tokenizer-prep step of a training pipeline. The vocab is
    // driver-bounded and broadcast; the corpus side is one explode +
    // broadcast join + lang-keyed aggregate.
    // L23b: vocabulary coverage curve — the minimum number of types
    // (descending frequency) covering each occurrence-ppm target; the
    // number that sizes a tokenizer vocab. Desc cumulative derived
    // from one ascending PrefixSum scan (no global sort).
    "q_vocab_curve" -> { (s, dir) =>
      graft.operators.Curate
        .vocabCoverageCurve(t(s, dir, "documents"), "text",
          Seq(500000L, 900000L, 950000L, 990000L, 1000000L))
        .orderBy("target_ppm")
    },

    "q_vocab_coverage" -> { (s, dir) =>
      val toks = t(s, dir, "documents")
        .select(col("lang"), explode(tokenize_ws(col("text"))).as("tok"))
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc).limit(1000)
        .select(col("tok"), lit(1L).as("in_v"))
      toks.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_rate",
          floor(col("n_oov").cast("double") / col("n_tokens") * 10000 + 0.5) / 10000)
        .orderBy("lang")
    },

    // L22: corpus accounting — the bookkeeping view a pipeline run
    // reports per (lang, source): volume, distinct contents, token
    // mass, mean quality. Mean quality uses the quantize-then-int-sum
    // trick so the aggregate is order-insensitive across engines.
    "q_corpus_stats" -> { (s, dir) =>
      t(s, dir, "documents")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_distinct"),
          sum(token_count(col("text"))).as("sum_tokens"),
          (floor(sum(floor(quality_score(col("text")) * 10000 + 0.5)
              .cast("long")).cast("double") / count(lit(1)) + 0.5) / 10000)
            .as("avg_quality"))
        .orderBy("lang", "source")
    },

    // L44: single-action funnel accounting — a four-stage curation
    // chain (lang gate → length gate → exact dedup) instrumented with
    // `Dataset.observe`: every stage's surviving-row count is an
    // accumulator riding the ONE terminal action (map-side, no extra
    // scan or shuffle), where a count() per stage would re-read the
    // corpus once per stage. The report frame is built from the
    // populated observations; the oracle replays each stage's count
    // declaratively in SQL.
    "q_pipeline_funnel" -> { (s, dir) =>
      val stages: Seq[(String, DataFrame => DataFrame)] = Seq(
        "ingest" -> identity,
        "lang_en" -> (_.filter(col("lang") === "en")),
        "min_len" -> (_.filter(length(col("text")) >= 200)),
        "exact_dedup" -> (df => df
          .withColumn("__rk", row_number().over(
            Window.partitionBy(md5(col("text"))).orderBy("doc_id")))
          .filter(col("__rk") === 1).drop("__rk")))
      val (fin, obs) = graft.operators.Observe.funnel(t(s, dir, "documents"), stages)
      fin.write.format("noop").mode("overwrite").save()
      graft.operators.Observe.report(s, obs).orderBy("stage_idx")
    },

    // L111 (r15): the COMPOSED end-to-end curation pipeline — the r14
    // verdict's item 2. Each stage below is individually green; this
    // gate oracles their COMPOSITION, the surface a real user actually
    // runs: ingest → Gopher rule battery → clustered near-dup removal
    // (connected components over the persisted jaccard≥0.9 pair graph
    // RESTRICTED to the survivors — pairwise predicates commute with
    // upstream filters, so the build-once table serves any stage
    // position) → winnow decontamination against the eval suite
    // (doc_id % 23 = 0 of the raw corpus — the benchmark is external,
    // never pipeline-filtered) → target-mix resampling (per-lang
    // md5-threshold keep) → greedy shard packing. Output is the
    // per-stage funnel: (stage, docs, tokens) + the pack row's shard
    // count and max shard load, every number integer-exact and
    // replayed stage-by-stage by one DuckDB chain. Stage frames pin
    // (Lineage) so each feeds both its statistics row and the next
    // stage from one materialization — at 100 TB these pins are the
    // stage tables a production pipeline persists anyway.
    "q_pipeline_e2e" -> { (s, dir) =>
      import graft.operators.Lineage
      val d = t(s, dir, "documents")
      def stageRow(i: Int, name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_docs"),
            coalesce(sum(token_count(col("text"))), lit(0L)).as("n_tokens"))
          .select(lit(i.toLong).as("stage_idx"), lit(name).as("stage"),
            col("n_docs"), col("n_tokens"), lit(0L).as("n_shards"),
            lit(0L).as("max_shard_tokens"))
      // stage 1: Gopher battery (corpus-adapted stop list, the
      // q_gopher_rules configuration)
      val keep = Curate.gopherFlags(d, "doc_id", "text",
          stopWords = Seq("the", "a"))
        .filter(col("keep") === 1).select("doc_id")
      val s1 = Lineage.pin(d.join(keep, "doc_id")
        .select("doc_id", "lang", "text"))
      // stage 2: clustered dedup over survivors — the persisted pair
      // graph restricted to pairs whose BOTH endpoints survived
      val pairs = jaccardPairGraph(s, dir)
        .join(s1.select(col("doc_id").as("doc_id1")), "doc_id1")
        .join(s1.select(col("doc_id").as("doc_id2")), "doc_id2")
      val s2 = Lineage.pin(Dedup.removeNearDupsClusteredLabels(
        s1, "doc_id", Dedup.clusters(pairs)))
      // stage 3: winnow decontamination — drop eval members and any
      // survivor sharing >= 8 winnow fingerprints with an eval doc
      val eval = d.filter(col("doc_id") % 23 === 0)
      val train = s2.filter(col("doc_id") % 23 =!= 0)
      val flagged = Dedup.winnowedAgainst(train, "doc_id", "text",
          eval, "doc_id", "text", k = 8, w = 16,
          minShared = 8L, maxDf = 16L)
        .select(col("id").as("doc_id")).distinct()
      val s3 = Lineage.pin(train.join(flagged, Seq("doc_id"), "left_anti"))
      // stage 4: target-mix resampling (en 0.4 / rest 0.15, rates
      // computed over THIS stage's input — the L33 discipline)
      val rates = Curate.mixThresholds(s3, "lang",
        when(col("lang") === "en", lit(0.4)).otherwise(lit(0.15)))
      val s4 = Lineage.pin(s3.join(broadcast(rates), "lang")
        .filter(substring(md5(col("text")), 1, 4) < col("thr"))
        .select("doc_id", "lang", "text"))
      // stage 5: greedy shard packing of the final corpus
      val perShard = Pack.assignShards(s4, "doc_id",
          token_count(col("text")), budgetTokens = 4096, buckets = 32)
        .groupBy("shard")
        .agg(count(lit(1)).as("sc"), sum("n_tokens").as("st"))
      val packRow = perShard
        .agg(coalesce(sum("sc"), lit(0L)).as("n_docs"),
          coalesce(sum("st"), lit(0L)).as("n_tokens"),
          count(lit(1)).as("n_shards"),
          coalesce(max("st"), lit(0L)).as("max_shard_tokens"))
        .select(lit(5L).as("stage_idx"), lit("pack").as("stage"),
          col("n_docs"), col("n_tokens"), col("n_shards"),
          col("max_shard_tokens"))
      stageRow(0, "ingest", d)
        .unionByName(stageRow(1, "gopher", s1))
        .unionByName(stageRow(2, "dedup_cluster", s2))
        .unionByName(stageRow(3, "decontam_winnow", s3))
        .unionByName(stageRow(4, "mix_target", s4))
        .unionByName(packRow)
        .orderBy("stage_idx")
    },

    // L20c: curriculum packing — shards cut along descending quality
    // (order key = 10000 - quantized score, ascending), so early
    // shards hold the cleanest documents. Same distributed prefix sum.
    "q_pack_curriculum" -> { (s, dir) =>
      Pack.assignShardsOrdered(t(s, dir, "documents"), "doc_id",
          token_count(col("text")),
          lit(10000L) - floor(quality_score(col("text")) * 10000 + 0.5)
            .cast("long"),
          budgetTokens = 4096, buckets = 32)
        .orderBy("doc_id")
    },

    // L21: benchmark decontamination — training docs sharing >= 5
    // distinct 3-gram shingles with the eval slice (doc_id % 23 = 0)
    // are flagged (oracled).
    "q_decontaminate" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      Decontaminate.contaminated(
          d.filter(col("doc_id") % 23 =!= 0),
          d.filter(col("doc_id") % 23 === 0),
          "doc_id", "text", shingleN = 3, minMatched = 5)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },

    // L21c: multi-suite decontamination — two synthetic benchmark
    // slices (id%23 and id%29), one shared training-side pass,
    // per-(doc, suite) attribution. Fully oracled.
    "q_decontaminate_suites" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val evals =
        d.filter(col("doc_id") % 23 === 0)
          .withColumn("suite", lit("eval_a"))
          .unionByName(d.filter(col("doc_id") % 29 === 0)
            .withColumn("suite", lit("eval_b")))
      Decontaminate.contaminatedBySuite(
          d.filter(col("doc_id") % 23 =!= 0 && col("doc_id") % 29 =!= 0),
          evals, "doc_id", "text", "suite", shingleN = 3, minMatched = 5)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "suite")
    },

    // L105: winnow decontamination — the GUARANTEED mode next to the
    // n-gram (sampled) and semantic (embedded) gates: any verbatim
    // overlap of >= 23 chars with an eval doc contributes a shared
    // fingerprint, so a long quoted benchmark passage cannot hide.
    // Same %23 suite split as q_decontaminate; train-side df cap
    // excludes corpus-boilerplate fingerprints from matching.
    "q_decontaminate_winnow" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      Dedup.winnowedAgainst(
          d.filter(col("doc_id") % 23 =!= 0), "doc_id", "text",
          d.filter(col("doc_id") % 23 === 0), "doc_id", "text",
          k = 8, w = 16, minShared = 8L, maxDf = 16L)
        .withColumnRenamed("id", "doc_id")
        .withColumnRenamed("ref_id", "eval_id")
        .orderBy("doc_id", "eval_id")
    },

    // L106: content-level release diff — chunking-robust corpus diff:
    // release B drops every 5th doc and edits every 7th; the
    // fingerprint-inventory diff reports per-source added/removed/
    // common content in per-mille-of-union, where row-level CDC (R30)
    // would also fire on any re-chunking.
    "q_content_diff" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val relB = d.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" amended release note appended here")))
          .otherwise(col("text")))
      Dedup.contentDiff(d, relB, "doc_id", "text", "source")
        .withColumnRenamed("grp", "source")
        .orderBy("source")
    },

    // L48: Min-K% membership audit — the suspect list: documents whose
    // k=20% least-likely bigrams still score high under the corpus LM
    // (memorization/duplication leaves no low-probability tail). Rides
    // the L14 integer-exact bigram scaffold, so the membership signal
    // carries a hash oracle; one window shuffle, TakeOrdered top-50.
    "q_mink_contamination" -> { (s, dir) =>
      val scored = Shared.bigramScored(t(s, dir, "documents"),
        "doc_id", "text")
      Decontaminate.minkScores(scored.select(col("doc_id"), col("q")),
          "doc_id", "q", kNum = 1, kDen = 5)
        .orderBy(col("mink_q").desc, col("doc_id").asc)
        .limit(50)
    },

    // L21b: semantic decontamination — training vectors within cosine
    // 0.4 of ANY eval vector are flagged (best match reported). The
    // n-gram pass (L21) catches verbatim quotes; this catches
    // paraphrases that share no shingle. Eval side broadcast, corpus
    // map-side; oracled via exact DuckDB cosine (integer-free double
    // chain, same ROUND(.,4) contract as q_ann_bruteforce).
    "q_decontaminate_semantic" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      Decontaminate.semanticContaminated(
          e.filter(col("vec_id") % 23 =!= 0),
          e.filter(col("vec_id") % 23 === 0),
          "vec_id", "embedding", minCosine = 0.4)
        .orderBy("id")
    },

    // L42: token-budget corpus selection — each source contributes its
    // highest-quality docs until a per-source token budget is
    // exhausted (the budget-capped variant of the L37 row cap: caps
    // follow token mass, not row count, which is what a training run
    // actually budgets). One window shuffle on source; quality and the
    // running total are integer-exact.
    "q_budget_select" -> { (s, dir) =>
      val d = t(s, dir, "documents")
        .withColumn("q1e4",
          floor(quality_score(col("text")) * 10000 + 0.5).cast("long"))
        .withColumn("n_tok", token_count(col("text")))
      val w = Window.partitionBy("source")
        .orderBy(col("q1e4").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.withColumn("cum_tokens", sum(col("n_tok")).over(w))
        .filter(col("cum_tokens") <= 1000)
        .select("doc_id", "source", "q1e4", "n_tok", "cum_tokens")
        .orderBy("doc_id")
    },

    // L20b: epoch-shuffle packing — deterministic md5 permutation of
    // the corpus, then budget-token batch cuts (oracled).
    "q_pack_shuffled" -> { (s, dir) =>
      Pack.assignShardsShuffled(t(s, dir, "documents"), "doc_id",
          token_count(col("text")), col("text"), budgetTokens = 4096)
        .orderBy("doc_id")
    },

    // L18: end-to-end retrieval — ANN top-k joined back to document
    // metadata (the search-pipeline composition: embed -> search ->
    // hydrate). Neighbor side joins on its id; at scale the hydrate
    // join shuffles only k rows per query.
    "q_retrieval" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val hits = Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 3)
      hits.join(t(s, dir, "documents"), col("nn_id") === col("doc_id"))
        .select(col("query_id"), col("rank"), col("nn_id"), col("sim"),
          col("lang"), col("source"))
        .orderBy("query_id", "rank")
    },

    // L119 (r16): token-budgeted context packing — the RAG serving
    // step after retrieval: top-10 hits per query, kept in rank
    // order until the 300-token budget is spent (prefix rule: first
    // overflow truncates). One per-query cumulative window bounded
    // by k.
    "q_retrieval_pack" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val hits = Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 10)
      val toks = t(s, dir, "documents").select(col("doc_id"),
        size(tokenize_ws(col("text"))).cast("long").as("tokens"))
      graft.operators.Retrieval.packContext(
          hits.join(toks, col("nn_id") === col("doc_id")).drop("doc_id"),
          "query_id", "rank", "tokens", budgetTokens = 300L)
        .select("query_id", "rank", "nn_id", "tokens", "cum_tokens")
        .orderBy("query_id", "rank")
    },

    // L8: language ID by marker-stopword scoring, argmax with
    // alphabetical tie-break. All five marker lists count in ONE
    // fused marker_counts pass (r13 — the per-list HOF filters were
    // CodegenFallback, interpreted per row).
    "q_lang_id" -> { (s, dir) =>
      val scores = LangMarkers.toSeq.sortBy(_._1)
      val counts = marker_counts(col("text"), scores.map(_._2))
      val withCounts = scores.zipWithIndex.foldLeft(t(s, dir, "documents")) {
        case (df, ((lang, _), i)) =>
          df.withColumn(s"c_$lang", element_at(counts, i + 1))
      }
      val m = greatest(scores.map { case (l, _) => col(s"c_$l") }: _*)
      val pred = scores.foldRight(lit("und")) { case ((lang, _), acc) =>
        when(col(s"c_$lang") === m, lit(lang)).otherwise(acc)
      }
      // foldRight gives priority to the alphabetically-first max
      withCounts
        .select(col("doc_id") +: col("lang").as("actual_lang") +:
          scores.map { case (l, _) => col(s"c_$l") } :+ pred.as("pred_lang"): _*)
        .orderBy("doc_id")
    },

    // L108 (r14): inter-annotator agreement — Cohen's κ between the
    // corpus's DECLARED language labels and the L8 detector's
    // verdicts, the label-QA number that subtracts majority-class
    // luck from raw percent agreement. The two "raters" union into
    // the long (item, rater, label) shape the operator contracts on.
    "q_label_agreement" -> { (s, dir) =>
      val scores = LangMarkers.toSeq.sortBy(_._1)
      val counts = marker_counts(col("text"), scores.map(_._2))
      val d = t(s, dir, "documents")
      val withCounts = scores.zipWithIndex.foldLeft(d) {
        case (df, ((lang, _), i)) =>
          df.withColumn(s"c_$lang", element_at(counts, i + 1))
      }
      val m = greatest(scores.map { case (l, _) => col(s"c_$l") }: _*)
      val pred = scores.foldRight(lit("und")) { case ((lang, _), acc) =>
        when(col(s"c_$lang") === m, lit(lang)).otherwise(acc)
      }
      val labels = d.select(col("doc_id").as("item"),
          lit("declared").as("rater"), col("lang").as("label"))
        .unionByName(withCounts.select(col("doc_id").as("item"),
          lit("detected").as("rater"), pred.as("label")))
      Curate.annotatorAgreement(labels, "item", "rater", "label",
        "declared", "detected")
    },

    // L9: quality scoring + keep decision.
    "q_text_quality" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), token_count(col("text")).as("n_tokens"),
          quality_score(col("text")).as("quality"))
        .withColumn("keep", col("quality") >= 0.5)
        .orderBy("doc_id")
    },

    // L102: readability scoring — Flesch–Kincaid grade and Flesch
    // reading ease in exact integer milli-units: syllables via the
    // vowel-run heuristic (runs of [aeiouy] per token, floor 1 —
    // "words = vowel-containing tokens + vowel-free tokens" turns the
    // per-word max(1, runs) into three corpus-wide regex counts, no
    // per-word explode), sentences = [.!?]+ runs floored at 1. Both
    // formulas are rational in (w, sy, s) so the integer-div milli
    // rendering replays bit-for-bit; all counting is codegen'd
    // builtin regex, map-side, zero shuffles.
    "q_readability" -> { (s, dir) =>
      Curate.readability(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // L10: token counting — whitespace and BPE-ish pre-tokenizer.
    "q_token_count" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          token_count(col("text")).as("n_ws_tokens"),
          size(tokenize_bpe(col("text"))).cast("long").as("n_bpe_tokens"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    },

    // L13: scrubbing - digit-run redaction over the event payloads
    // (the PII-masking shape: pattern rewrite + grouped accounting).
    "q_text_redact" -> { (s, dir) =>
      t(s, dir, "events")
        .select(redact_numbers(col("props")).as("redacted"))
        .groupBy("redacted")
        .agg(count(lit(1)).as("n"))
        .orderBy("redacted")
    },

    // L13b: Luhn-validated PAN detection — checksum-gated redaction
    // (flag the digit runs that are REAL card-shaped numbers, not
    // every long number). The corpus has no 13+-digit runs, so the
    // payload text is synthesized in deterministic lockstep with the
    // oracle (16-digit candidate per order; the trailing digit is
    // o_orderkey mod 10, so ~10% pass Luhn NATURALLY — both branches
    // of the detector exercised); the DETECTOR (extract distinct
    // 13-19-digit runs, validate via the right-anchored double-every-
    // second sum, mask to last4) never sees the synthesis rule.
    // L101: secret/credential scan — the PII family's patternless
    // member: API keys/tokens have no regex, but they are LONG,
    // digit+letter MIXED and near-uniform over their alphabet (token
    // Simpson concentration <= 250000 = >= 4 effective symbols; random
    // hex sits near 92000, prose concentrates higher and fails the
    // length gate anyway). Synthetic config-dump lines derive from
    // orders (the q_pan_luhn precedent — the [a-z ] documents corpus
    // carries no credentials): every order has one md5 "token", every
    // 4th a second "backup" key (n_secrets=2), every 5th a planted
    // LOW-entropy 20-char negative control that must NOT flag.
    "q_secret_scan" -> { (s, dir) =>
      // fan below the entropy-scan kernel (serial on a one-split scan)
      graft.operators.Scale.fan(t(s, dir, "orders")
        .select("o_orderkey", "o_custkey"))
        .select(col("o_orderkey"),
          concat(lit("auth user"), col("o_custkey").cast("string"),
            lit(" token "), md5(col("o_orderkey").cast("string")),
            when(col("o_orderkey") % 4 === 0,
              concat(lit(" backup "), md5(col("o_custkey").cast("string"))))
              .otherwise(lit("")),
            when(col("o_orderkey") % 5 === 0,
              concat(lit(" ref "), lit("x" * 18), lit("99")))
              .otherwise(lit("")),
            lit(" amount "), (col("o_orderkey") % 997).cast("string"),
            lit(" status ok")).as("ptext"))
        .select(col("o_orderkey").as("order_key"),
          secret_scan(col("ptext"), 20, 250000L).as("__s"))
        .select(col("order_key"),
          col("__s.n_tokens").as("n_tokens"),
          col("__s.n_secrets").as("n_secrets"),
          col("__s.n_masked_cp").as("n_masked_cp"),
          col("__s.redacted").as("redacted"))
        .orderBy("order_key")
    },

    "q_pan_luhn" -> { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          concat(lit("pay card="),
            expr("lpad(cast(pmod(o_orderkey * 1000003 + o_custkey, " +
              "1000000000000000) as string), 15, '0')"),
            expr("cast(pmod(o_orderkey, 10) as string)"),
            lit(";")).as("ptext"))
        .withColumn("cand", explode(expr(
          "array_distinct(regexp_extract_all(ptext, '[0-9]{13,19}', 0))")))
        .withColumn("luhn_valid", luhn_valid(col("cand")))
        .withColumn("masked", concat(
          expr("repeat('*', length(cand) - 4)"),
          expr("substr(cand, length(cand) - 3, 4)")))
        .select(col("o_orderkey").as("order_key"), col("masked"),
          col("luhn_valid"))
        .orderBy("order_key", "masked")
    },

    // L110 (r14): structured-PII scan — email/IPv4/+phone counted and
    // redacted in sequential stages over synthesized contact lines
    // (planted from order keys, like the L101/L66 hygiene family);
    // every fourth line carries a +phone, every line an email and an
    // IP, so all three patterns and the nesting rule are exercised.
    "q_pii_scan" -> { (s, dir) =>
      val src = t(s, dir, "orders").select(
        col("o_orderkey").as("order_key"),
        concat(
          lit("contact user"), col("o_custkey").cast("string"),
          lit("@example."),
          element_at(array(lit("com"), lit("org"), lit("net")),
            (pmod(col("o_orderkey"), lit(3)) + 1).cast("int")),
          lit(" from 10."), pmod(col("o_orderkey"), lit(256)).cast("string"),
          lit("."), pmod(col("o_custkey"), lit(256)).cast("string"),
          lit("."), pmod(col("o_orderkey"), lit(100)).cast("string"),
          when(pmod(col("o_orderkey"), lit(4)) === 0,
            concat(lit(" call +"),
              (pmod(col("o_orderkey"), lit(900000000L)) + 100000000L)
                .cast("string"))).otherwise(lit("")),
          lit(" amount "), pmod(col("o_orderkey"), lit(997)).cast("string"),
          lit(" ok")).as("ptext"))
      graft.operators.Curate.piiScan(src, "order_key", "ptext")
        .withColumnRenamed("doc_id", "order_key")
        .orderBy("order_key")
    },

    // L14: bigram-LM scoring ("perplexity-ish"): score each document by
    // the mean conditional probability p(cur|prev) of its bigrams under
    // a model trained on the corpus itself. Rare/garbled word sequences
    // score low. Uses probabilities, not log-probs, so all arithmetic
    // is IEEE-exact across engines (libm log differs in the last ulp);
    // each p is quantized to an int before the order-insensitive
    // integer SUM. Scale shape: the model tables are vocabulary-bounded
    // aggregates; the per-bigram joins shuffle on well-distributed
    // token keys.
    "q_lm_score" -> { (s, dir) =>
      Shared.bigramScored(t(s, dir, "documents"), "doc_id", "text")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          (floor(sum(col("q")).cast("double") / count(lit(1)) / 100.0 + 0.5) / 1e6)
            .as("lm_score"))
        .orderBy("doc_id")
    },

    // L62: interpolated TRIGRAM LM scoring — the next rung up from the
    // bigram model (L14): per trigram the interpolation
    // (2·p(w3|w1w2) + p(w3|w2) + p(w3)) / 4 with each conditional
    // floor-quantized to an integer BEFORE the combine (the bigram
    // LM's quantize-then-int rule, so the per-doc mean is an
    // order-insensitive integer aggregate — no libm, no float sums).
    // Count tables are vocab-bounded; the corpus pays one trigram
    // explode + token-keyed joins against them.
    "q_lm_trigram" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val toks = docs.select(col("doc_id"), tokenize_ws(col("text")).as("t"))
      val uni = toks.select(explode(col("t")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cu"))
      val nTok = toks.agg(sum(size(col("t"))).as("n_tok"))
      val bg = Shared.bigramPairs(docs, "doc_id", "text")
        .groupBy("prev", "cur").agg(count(lit(1)).as("cb"))
      val tri = toks.filter(size(col("t")) >= 3)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("t")) - 2),
          i => struct(element_at(col("t"), i).as("w1"),
            element_at(col("t"), i + 1).as("w2"),
            element_at(col("t"), i + 2).as("w3")))).as("g"))
        .select(col("doc_id"), col("g.w1"), col("g.w2"), col("g.w3"))
      val tc = tri.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("ct"))
      def q(num: org.apache.spark.sql.Column,
            den: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        floor(num.cast("double") / den * 1e8 + 0.5).cast("long")
      tri
        .join(tc, Seq("w1", "w2", "w3"))
        .join(bg.select(col("prev").as("w1"), col("cur").as("w2"),
          col("cb").as("c12")), Seq("w1", "w2"))
        .join(bg.select(col("prev").as("w2"), col("cur").as("w3"),
          col("cb").as("c23")), Seq("w2", "w3"))
        .join(uni.select(col("w").as("w2"), col("cu").as("c2")), "w2")
        .join(uni.select(col("w").as("w3"), col("cu").as("c3")), "w3")
        .crossJoin(broadcast(nTok))
        .withColumn("q3", q(col("ct"), col("c12")))
        .withColumn("q2", q(col("c23"), col("c2")))
        .withColumn("q1", q(col("c3"), col("n_tok")))
        .withColumn("sc", expr("(2 * q3 + q2 + q1) div 4"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tri"),
          expr("sum(sc) div count(1)").as("lm3_q"))
        .orderBy("doc_id")
    },

    // L15: deterministic content sampling — the reproducible-subsets
    // primitive for training pipelines: membership is a pure function
    // of the content hash (md5 prefix < threshold ⇒ ~12.5% sample), so
    // re-runs, engines, and partitionings all agree; per-stratum
    // accounting shows the realized rate. Scan-parallel, no RNG state.
    "q_sample_det" -> { (s, dir) =>
      val d = t(s, dir, "documents")
        .withColumn("in_sample", substring(md5(col("text")), 1, 2) < "20")
      d.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("in_sample"), 1L).otherwise(0L)).as("n_sampled"))
        .orderBy("lang")
    },

    // L14b: broadcast-model LM scoring — the production shape: the
    // model is pruned to the top-K bigrams (deterministic tie-break)
    // and BROADCAST, unseen bigrams take a backoff probability. The
    // scoring pass is then map-side (no shuffle of the corpus against
    // the model), which is the only shape that works when the corpus
    // is 100 TB and the model is megabytes.
    "q_lm_score_topk" -> { (s, dir) =>
      val pairs = Shared.bigramPairs(t(s, dir, "documents"), "doc_id", "text")
      val (bc, pc) = Shared.bigramCounts(pairs)
      val model = bc.join(pc, "prev")
        .withColumn("q", Shared.condProbQ)
        .orderBy(col("cpc").desc, col("prev").asc, col("cur").asc)
        .limit(1000)
        .select("prev", "cur", "q")
      pairs.join(broadcast(model), Seq("prev", "cur"), "left")
        .withColumn("qq", coalesce(col("q"), lit(100L))) // backoff p=1e-6
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          (floor(sum(col("qq")).cast("double") / count(lit(1)) / 100.0 + 0.5) / 1e6)
            .as("lm_score"))
        .orderBy("doc_id")
    },

    // L15b: balanced stratified resample — every language downsampled
    // to the smallest stratum, membership decided by a deterministic
    // content-hash order (re-runs/engines agree). One window shuffle +
    // a broadcast scalar; the mix-rebalancing primitive for training
    // data.
    "q_sample_balanced" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents")
      val mn = d.groupBy("lang").agg(count(lit(1)).as("n")).agg(min("n").as("mn"))
      val w = Window.partitionBy("lang").orderBy(md5(col("text")), col("doc_id"))
      d.withColumn("rn", row_number().over(w))
        .crossJoin(broadcast(mn))
        .filter(col("rn") <= col("mn"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // L17: document chunking — 32-token windows, 8-token overlap
    // (the embedding/training chunk shape); one row per chunk.
    "q_text_chunk" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(chunk_windows(col("text"), chunkTokens = 32, overlap = 8)).as("c"))
        .select(col("doc_id"), col("c.chunk_idx"), col("c.n_chunk_tokens"),
          col("c.chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    },

    // L15c: weighted mixture sampling — per-source keep rates (the
    // data-mixing primitive: upweight curated sources, downsample
    // web), content-hash deterministic.
    "q_sample_weighted" -> { (s, dir) =>
      val weights =
        (0 until 5).map(i => s"src$i" -> 1.0).toMap ++
          (5 until 10).map(i => s"src$i" -> 0.5).toMap
      graft.operators.Mix.weightedSample(
          t(s, dir, "documents"), "source", "text", weights,
          defaultWeight = 0.25)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"))
        .orderBy("source")
    },

    // L98: priority sampling — bounded-size weighted sample with
    // unbiased subset-sum estimators (Duffield–Lund–Thorup); u from
    // md5(doc_id), so the sample AND the calibrated weights replay
    // exactly. k=100 over 500 docs weighted by n_chars.
    "q_priority_sample" -> { (s, dir) =>
      graft.operators.Mix.prioritySample(
          t(s, dir, "documents"), "doc_id", "n_chars", k = 100)
        .withColumnRenamed("key", "doc_id")
        .orderBy("rk")
    },

    // L11: document fingerprint (polynomial rolling hash, codegen'd).
    "q_fingerprint" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), rolling_hash(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    // L12a: multimodal metadata decode via per-partition stub codec.
    "q_multimodal_meta" -> { (s, dir) =>
      mediaMeta(s, dir).toDF().orderBy("doc_id")
    },

    // L12e: perceptual-hash near-dup over media payloads — the image
    // dedup pipeline: per-partition stub pHash (block means vs global
    // mean, integer-exact) + the generic pigeonhole Hamming join
    // (complete at the radius, so the DuckDB byte-walk replay is an
    // exact oracle). The corpus is unioned with a re-ingested twin of
    // every payload (id + 1e6) — the canonical "same file uploaded
    // twice" case — which the fingerprint catches at hamming 0.
    "q_multimodal_phash" -> { (s, dir) =>
      import s.implicits._
      val d = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val media = d.unionAll(
          d.select(col("doc_id") + 1000000L, col("payload")))
        .toDF("doc_id", "payload")
        .as[Multimodal.MediaRow]
      Dedup.hammingPairs(Multimodal.perceptualHash(media).toDF(),
          "doc_id", "phash", maxHamming = 6)
        .orderBy("doc_id1", "doc_id2")
    },

    // L12b: frame-sampling explosion (every 4th frame).
    "q_multimodal_frames" -> { (s, dir) =>
      Multimodal.sampleFrames(mediaMeta(s, dir), stride = 4)
        .orderBy("doc_id", "frame_idx")
    },

    // L12c: resize plan — aspect-preserving cap at 256px, integer-exact.
    "q_multimodal_resize" -> { (s, dir) =>
      Multimodal.resizePlan(mediaMeta(s, dir), maxDim = 256)
        .orderBy("doc_id")
    },

    // L12h (r13): the REAL frame-sampling operator — animated GIFs
    // decode to per-frame PNG rows (spec-gated on a planted 6-frame
    // GIF: MultimodalSpec); this corpus's synthetic payloads exercise
    // the stub-fallback branch end-to-end, fully hash-oracled
    // including the passed-through payload bytes.
    "q_multimodal_frames_real" -> { (s, dir) =>
      import s.implicits._
      // Byte-exactness is still asserted — via sha2(payload) rather
      // than the raw bytes, because the driver comparator cannot sort
      // binary columns (pandas bytearray is unhashable).
      Multimodal.sampleFramesReal(
          t(s, dir, "documents")
            .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
            .as[Multimodal.MediaRow], stride = 7)
        .toDF()
        .withColumn("payload_sha", sha2(col("payload"), 256))
        .drop("payload")
        .orderBy("doc_id", "frame_idx")
    },

    // L12g (r13): the REAL resize operator over the media column —
    // decode → deterministic box downscale → PNG re-encode for
    // ImageIO-recognized payloads (that branch is spec-gated on a
    // planted PNG: MultimodalSpec); this corpus's synthetic payloads
    // exercise the stub-fallback branch end-to-end, which is fully
    // hash-oracled including the passed-through payload bytes.
    "q_multimodal_resize_real" -> { (s, dir) =>
      import s.implicits._
      // sha2 digest instead of raw bytes — see q_multimodal_frames_real.
      Multimodal.resizeReal(
          t(s, dir, "documents")
            .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
            .as[Multimodal.MediaRow], maxDim = 64)
        .toDF()
        .withColumn("payload_sha", sha2(col("payload"), 256))
        .drop("payload")
        .orderBy("doc_id")
    },

    // L12k (r14): REAL pixel decode at QUERY scale — every row's
    // payload is a genuine planted PNG (plantRealPngs), so
    // ImageIO.read must succeed on every row (no stub fallback), and
    // because the pixels are a known solid color the decoded
    // luminance histogram + mean replay exactly in SQL. This is the
    // row the r13 *_real family lacked: the decode branch driven by
    // the corpus, not just by spec plants.
    "q_multimodal_real_pixels" -> { (s, dir) =>
      val feats = Multimodal.extractFeaturesReal(
        Multimodal.plantRealPngs(t(s, dir, "documents"), "doc_id")).toDF()
      val bins = (0 until 8).map(i =>
        element_at(col("histogram"), i + 1).as(s"h$i"))
      feats.select(col("doc_id") +: bins :+ col("mean_byte"): _*)
        .orderBy("doc_id")
    },

    // L12k (r14): the full encode→decode→boxResize→PNG-re-encode→
    // re-decode chain at query scale: resize real planted PNGs, then
    // DECODE THE RESIZED OUTPUT and assert its content — a solid
    // color is invariant under the exact box average, so the
    // re-decoded mean luminance must equal the planted one while the
    // dims follow the floor arithmetic. Pin the resized frame: it
    // feeds both the dims projection and the re-decode, and an
    // unpinned lineage would run the ImageIO chain twice.
    "q_multimodal_resize_decoded" -> { (s, dir) =>
      import s.implicits._
      val resized = Multimodal.resizeReal(
          Multimodal.plantRealPngs(t(s, dir, "documents"), "doc_id"),
          maxDim = 16)
        .toDF().transform(graft.operators.Lineage.pin)
      val feats = Multimodal.extractFeaturesReal(
          resized.select(col("doc_id"), col("payload"))
            .as[Multimodal.MediaRow])
        .toDF().select(col("doc_id"), col("mean_byte"))
      resized.select("doc_id", "width", "height", "out_w", "out_h")
        .join(feats, "doc_id")
        .orderBy("doc_id")
    },

    // L12k (r14): the GIF container loop at query scale — ids
    // divisible by 7 (coprime with the frame-count modulus, so nf
    // actually sweeps 2..6) become genuine animated GIFs with an
    // id-derived frame count; sampleFramesReal must run
    // getNumImages + per-frame decode (not the stub), and the frame
    // grid replays in SQL.
    "q_multimodal_frames_decoded" -> { (s, dir) =>
      Multimodal.sampleFramesReal(
          Multimodal.plantRealGifs(t(s, dir, "documents"), "doc_id",
            every = 7), stride = 2)
        .toDF().select("doc_id", "frame_idx", "width", "height")
        .orderBy("doc_id", "frame_idx")
    },

    // L12i (r13): the REAL feature extractor — decoded-pixel
    // luminance histogram + mean for ImageIO-recognized payloads
    // (codec-invariance spec-gated on a planted flat image delivered
    // as PNG and BMP); this corpus's synthetic payloads exercise the
    // stub-fallback branch end-to-end, which shares the
    // q_multimodal_features oracle bit-for-bit.
    "q_multimodal_features_real" -> { (s, dir) =>
      import s.implicits._
      val feats = Multimodal.extractFeaturesReal(
        t(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
          .as[Multimodal.MediaRow])
        .toDF()
      val bins = (0 until 8).map(i =>
        element_at(col("histogram"), i + 1).as(s"h$i"))
      feats.select(col("doc_id") +: bins :+ col("mean_byte"): _*)
        .orderBy("doc_id")
    },

    // L12j (r13): REAL audio feature extraction — PCM decode via the
    // JDK audio stack with all-integer content stats (mean-square
    // energy, zero crossings, peak). The real branch is spec-gated on
    // planted WAVs (square wave → exact ZCR, constant tone → exact
    // energy); this corpus's synthetic payloads exercise the
    // signed-8-bit fallback branch end-to-end, fully hash-oracled.
    "q_multimodal_audio" -> { (s, dir) =>
      import s.implicits._
      Multimodal.extractAudioReal(
          t(s, dir, "documents")
            .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
            .as[Multimodal.MediaRow])
        .toDF().orderBy("doc_id")
    },

    // L12d: feature extraction (8-bin byte histogram per partition
    // batch). Oracled since r8: the DuckDB side replays the UTF-8 byte
    // walk via the hex-nibble trick (same as the simhash oracle), and
    // count/n and sum/n are integer-exact in double on both engines so
    // the hash gate holds bit-exactly. The histogram vector is
    // flattened to scalar columns (the comparator sorts with pandas,
    // which cannot order array-typed cells — the one red row in r3).
    // L12f: cross-modal alignment (LAION-style pair filter) — byte
    // histogram vs 8-dim hashed-bow cosine, threshold keep. Honest
    // stub features, real plumbing, fully oracled.
    "q_multimodal_align" -> { (s, dir) =>
      import s.implicits._
      val d = t(s, dir, "documents")
      Multimodal.alignmentScore(
          d.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
            .as[Multimodal.MediaRow],
          d, "doc_id", "text", minAlign = 0.5)
        .orderBy("doc_id")
    },

    "q_multimodal_features" -> { (s, dir) =>
      import s.implicits._
      val feats = Multimodal.extractFeatures(
        t(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
          .as[Multimodal.MediaRow])
        .toDF()
      val bins = (0 until 8).map(i =>
        element_at(col("histogram"), i + 1).as(s"h$i"))
      feats.select(col("doc_id") +: bins :+ col("mean_byte"): _*)
        .orderBy("doc_id")
    })

  /** Full MinHash-LSH replay: FNV-1a token hashes (the simhash
    * oracle's HUGEINT byte walk), the EXACT k=64 affine permutations
    * (constants exported by `Kernels.minhashParams` and embedded as
    * literals — 64-bit wrap reproduced via mod-2^64, signed
    * reinterpretation, then floorMod by the Mersenne prime), 8-row
    * band SLICES joined on list equality (the value-level truth that
    * the Spark side's xxhash64 bucket keys proxy — w.h.p. identical,
    * same standing contract as id/string agreement), the same
    * size-ratio prefilter, and the exact-Jaccard verify over the FNV
    * id sets. This makes the PROBABILISTIC candidate generator itself
    * hash-provable: both engines miss the same pairs.
    */
  private def minhashParamValues: String =
    graft.functions.Kernels.minhashParams(64).zipWithIndex
      .map { case ((a, b), j) =>
        s"($j, ${java.lang.Long.toUnsignedString(a)}::HUGEINT, " +
          s"${java.lang.Long.toUnsignedString(b)}::HUGEINT)"
      }.mkString(", ")

  /** Shared signature CTEs for the MinHash oracles: distinct FNV token
    * hashes (hs), per-doc 64-value signatures (sig), 8-row band slices
    * (slices), set sizes (sz). */
  private def minhashSigCtes: String =
    s"""toks AS (
       |  SELECT doc_id,
       |    unnest(list_distinct(list_filter(string_split(text,' '), x->len(x)>0))) AS tok
       |  FROM documents),
       |hs AS (
       |  SELECT DISTINCT doc_id, CAST(list_reduce(
       |    list_prepend(14695981039346656037::HUGEINT,
       |      list_transform(range(octet_length(encode(tok))),
       |        i -> (strpos('0123456789ABCDEF', hex(encode(tok))[2*i+1]) * 16
       |            + strpos('0123456789ABCDEF', hex(encode(tok))[2*i+2]) - 17)::HUGEINT)),
       |    (acc, b) -> ((acc // 256) * 256 + xor((acc % 256)::BIGINT, b::BIGINT)::HUGEINT)
       |                * 1099511628211 % 18446744073709551616::HUGEINT) AS HUGEINT) AS hu
       |  FROM toks),
       |hpos AS (SELECT doc_id, hu % 9223372036854775808::HUGEINT AS h FROM hs),
       |params(j, au, bu) AS (VALUES $minhashParamValues),
       |affine AS (
       |  SELECT doc_id, j,
       |    (au * h + bu) % 18446744073709551616::HUGEINT AS t
       |  FROM hpos CROSS JOIN params),
       |vals AS (
       |  SELECT doc_id, j,
       |    (((CASE WHEN t >= 9223372036854775808::HUGEINT
       |            THEN t - 18446744073709551616::HUGEINT ELSE t END)
       |       % 2305843009213693951) + 2305843009213693951)
       |      % 2305843009213693951 AS x
       |  FROM affine),
       |sig AS (SELECT doc_id, j, MIN(x) AS m FROM vals GROUP BY doc_id, j),
       |slices AS (
       |  SELECT doc_id, j // 8 AS band, list(m ORDER BY j) AS sl
       |  FROM sig GROUP BY doc_id, j // 8),
       |sz AS (SELECT doc_id, COUNT(*) AS sz FROM hs GROUP BY doc_id)""".stripMargin

  /** Cross-set (dedup-at-ingest) replay: incoming (id%5=0) band
    * slices probe the corpus side (id%5≠0) — no self-pairs, no size
    * prefilter (the operator has none on this path), exact-Jaccard
    * verify. Same signature machinery as minhashOracleSql. */
  private val minhashAgainstOracleSql: String =
    s"""WITH $minhashSigCtes,
       |cand AS (
       |  SELECT DISTINCT i.doc_id AS incoming_id, c.doc_id AS corpus_id
       |  FROM slices i
       |  JOIN slices c ON i.band = c.band AND i.sl = c.sl
       |  WHERE i.doc_id % 5 = 0 AND c.doc_id % 5 <> 0),
       |inter AS (
       |  SELECT p.incoming_id, p.corpus_id, COUNT(*) AS n_inter
       |  FROM cand p
       |  JOIN hs x ON x.doc_id = p.incoming_id
       |  JOIN hs y ON y.doc_id = p.corpus_id AND y.hu = x.hu
       |  GROUP BY p.incoming_id, p.corpus_id),
       |scored AS (
       |  SELECT i.incoming_id, i.corpus_id,
       |    FLOOR(CAST(i.n_inter AS DOUBLE) / (sa.sz + sb.sz - i.n_inter)
       |      * 10000 + 0.5) / 10000 AS jac
       |  FROM inter i
       |  JOIN sz sa ON sa.doc_id = i.incoming_id
       |  JOIN sz sb ON sb.doc_id = i.corpus_id)
       |SELECT incoming_id, corpus_id, jac
       |FROM scored WHERE jac >= 0.9
       |ORDER BY incoming_id, corpus_id""".stripMargin

  private val minhashOracleSql: String = {
    val vals = minhashParamValues
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    unnest(list_distinct(list_filter(string_split(text,' '), x->len(x)>0))) AS tok
       |  FROM documents),
       |hs AS (
       |  SELECT DISTINCT doc_id, CAST(list_reduce(
       |    list_prepend(14695981039346656037::HUGEINT,
       |      list_transform(range(octet_length(encode(tok))),
       |        i -> (strpos('0123456789ABCDEF', hex(encode(tok))[2*i+1]) * 16
       |            + strpos('0123456789ABCDEF', hex(encode(tok))[2*i+2]) - 17)::HUGEINT)),
       |    (acc, b) -> ((acc // 256) * 256 + xor((acc % 256)::BIGINT, b::BIGINT)::HUGEINT)
       |                * 1099511628211 % 18446744073709551616::HUGEINT) AS HUGEINT) AS hu
       |  FROM toks),
       |hpos AS (SELECT doc_id, hu % 9223372036854775808::HUGEINT AS h FROM hs),
       |params(j, au, bu) AS (VALUES $vals),
       |affine AS (
       |  SELECT doc_id, j,
       |    (au * h + bu) % 18446744073709551616::HUGEINT AS t
       |  FROM hpos CROSS JOIN params),
       |vals AS (
       |  SELECT doc_id, j,
       |    (((CASE WHEN t >= 9223372036854775808::HUGEINT
       |            THEN t - 18446744073709551616::HUGEINT ELSE t END)
       |       % 2305843009213693951) + 2305843009213693951)
       |      % 2305843009213693951 AS x
       |  FROM affine),
       |sig AS (SELECT doc_id, j, MIN(x) AS m FROM vals GROUP BY doc_id, j),
       |slices AS (
       |  SELECT doc_id, j // 8 AS band, list(m ORDER BY j) AS sl
       |  FROM sig GROUP BY doc_id, j // 8),
       |sz AS (SELECT doc_id, COUNT(*) AS sz FROM hs GROUP BY doc_id),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM slices a
       |  JOIN slices b ON a.band = b.band AND a.sl = b.sl AND a.doc_id < b.doc_id
       |  JOIN sz sa ON sa.doc_id = a.doc_id
       |  JOIN sz sb ON sb.doc_id = b.doc_id
       |  WHERE LEAST(sa.sz, sb.sz) * 10000 >= GREATEST(sa.sz, sb.sz) * 8990),
       |inter AS (
       |  SELECT c.id1, c.id2, COUNT(*) AS n_inter
       |  FROM cand c
       |  JOIN hs x ON x.doc_id = c.id1
       |  JOIN hs y ON y.doc_id = c.id2 AND y.hu = x.hu
       |  GROUP BY c.id1, c.id2),
       |scored AS (
       |  SELECT i.id1, i.id2,
       |    FLOOR(CAST(i.n_inter AS DOUBLE) / (sa.sz + sb.sz - i.n_inter)
       |      * 10000 + 0.5) / 10000 AS jac
       |  FROM inter i
       |  JOIN sz sa ON sa.doc_id = i.id1
       |  JOIN sz sb ON sb.doc_id = i.id2)
       |SELECT id1 AS doc_id1, id2 AS doc_id2, jac
       |FROM scored WHERE jac >= 0.9
       |ORDER BY doc_id1, doc_id2""".stripMargin
  }

  /** Hyperplane-LSH replay: the (bits × dim) splitmix weight matrix is
    * a pure constant of (j, i), so it embeds as shortest-repr double
    * literals (round-trip exact through both parsers); per-plane
    * accumulators replay Java's sequential add order via an ordered
    * list_reduce (IEEE adds are deterministic given the order), bucket
    * bits re-pack with an integer sum, and the search is a bucket
    * equi-join + the standard exact-cosine ranking. This makes the
    * BUCKETING itself hash-provable — both engines drop the same
    * out-of-bucket true neighbors. */
  private def hyperplaneWeightRows(bits: Int, dim: Int): String =
    graft.functions.Kernels.hyperplaneWeights(bits, dim).zipWithIndex
      .map { case (wl, j) => s"($j, [${wl.map(_.toString).mkString(", ")}])" }
      .mkString(",\n    ")

  private def lshOracleSql(bits: Int, dim: Int, maxQueryId: Long,
                           k: Int): String = {
    val rows = hyperplaneWeightRows(bits, dim)
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
       |  FROM embeddings),
       |w(j, wl) AS (VALUES
       |    $rows),
       |acc AS (
       |  SELECT v.vec_id, w.j,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(len(vec)), i -> vec[i+1] * wl[i+1])),
       |      (a, b) -> a + b) AS acc
       |  FROM v CROSS JOIN w),
       |bkt AS (
       |  SELECT vec_id,
       |    CAST(SUM(CASE WHEN acc >= 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS bucket
       |  FROM acc GROUP BY vec_id),
       |c AS (SELECT v.vec_id AS nn_id, vec, bucket
       |      FROM v JOIN bkt USING (vec_id)),
       |q AS (SELECT v.vec_id AS query_id, vec AS qv, bucket
       |      FROM v JOIN bkt USING (vec_id) WHERE vec_id < $maxQueryId),
       |sims AS (
       |  SELECT q.query_id, c.nn_id,
       |    ${Shared.cosineSimSql("qv", "vec")} AS sim
       |  FROM c JOIN q ON c.bucket = q.bucket AND c.nn_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, nn_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY sim DESC, nn_id ASC) AS rank
       |  FROM sims)
       |SELECT query_id, rank, nn_id, sim FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Embedding-LSH near-dup replay: the same bit-exact 32-plane
    * signature (8 bands × 4 bits), band buckets via shift+mask, the
    * OR-of-ANDs band join, and the exact-cosine verify — the whole
    * probabilistic candidate generator is value-proven, both engines
    * drop the same cross-bucket pairs. */
  private val embedOracleSql: String = {
    val rows = hyperplaneWeightRows(32, 64)
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
       |  FROM embeddings),
       |w(j, wl) AS (VALUES
       |    $rows),
       |acc AS (
       |  SELECT v.vec_id, w.j,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(len(vec)), i -> vec[i+1] * wl[i+1])),
       |      (a, b) -> a + b) AS acc
       |  FROM v CROSS JOIN w),
       |sig AS (
       |  SELECT vec_id,
       |    CAST(SUM(CASE WHEN acc >= 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS sig
       |  FROM acc GROUP BY vec_id),
       |banded AS (
       |  SELECT vec_id, b AS band, (sig >> CAST(b * 4 AS INT)) & 15 AS bucket
       |  FROM sig, UNNEST(range(8)) t(b)),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
       |  FROM banded a
       |  JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
       |    AND a.vec_id < b.vec_id),
       |scored AS (
       |  SELECT c.id1, c.id2,
       |    ${Shared.cosineSimSql("x.vec", "y.vec")} AS cos
       |  FROM cand c
       |  JOIN v x ON x.vec_id = c.id1
       |  JOIN v y ON y.vec_id = c.id2)
       |SELECT id1, id2, cos FROM scored WHERE cos >= 0.4
       |ORDER BY id1, id2""".stripMargin
  }

  /** Multi-probe LSH replay: the same bit-exact planes; each query's
    * probe list = home bucket + one-bit flips of its nProbe−1
    * lowest-|margin| planes (ties by plane index), exactly the
    * hyperplane_probes contract. The probe ORDER ITSELF is replayed,
    * so the hash match proves the perturbation choice too. */
  private def lshMultiProbeOracleSql(bits: Int, dim: Int, nProbe: Int,
                                     maxQueryId: Long, k: Int): String = {
    val rows = hyperplaneWeightRows(bits, dim)
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
       |  FROM embeddings),
       |w(j, wl) AS (VALUES
       |    $rows),
       |acc AS (
       |  SELECT v.vec_id, w.j,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(len(vec)), i -> vec[i+1] * wl[i+1])),
       |      (a, b) -> a + b) AS acc
       |  FROM v CROSS JOIN w),
       |bkt AS (
       |  SELECT vec_id,
       |    CAST(SUM(CASE WHEN acc >= 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS bucket
       |  FROM acc GROUP BY vec_id),
       |ord AS (
       |  SELECT vec_id, j,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY abs(acc), j) AS r
       |  FROM acc),
       |qprobes AS (
       |  SELECT vec_id, bucket AS probe FROM bkt WHERE vec_id < $maxQueryId
       |  UNION ALL
       |  SELECT o.vec_id, xor(b.bucket, 1::BIGINT << o.j) AS probe
       |  FROM ord o JOIN bkt b USING (vec_id)
       |  WHERE o.vec_id < $maxQueryId AND o.r <= ${nProbe - 1}),
       |sims AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
       |    ${Shared.cosineSimSql("qv.vec", "c0.vec")} AS sim
       |  FROM qprobes q
       |  JOIN bkt c ON c.bucket = q.probe AND c.vec_id <> q.vec_id
       |  JOIN v qv ON qv.vec_id = q.vec_id
       |  JOIN v c0 ON c0.vec_id = c.vec_id),
       |ranked AS (
       |  SELECT query_id, nn_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY sim DESC, nn_id ASC) AS rank
       |  FROM sims)
       |SELECT query_id, rank, nn_id, sim FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  private val jaccardSqlBase =
    """WITH toksets AS (
      |  SELECT doc_id, lang,
      |    list_filter(list_distinct(string_split(text, ' ')), x -> len(x) > 0) AS toks
      |  FROM documents)
      |SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2,
      |  FLOOR(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |        len(list_distinct(list_concat(a.toks, b.toks))) * 10000 + 0.5) / 10000 AS jac
      |FROM toksets a JOIN toksets b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |WHERE FLOOR(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |        len(list_distinct(list_concat(a.toks, b.toks))) * 10000 + 0.5) / 10000 >= 0.9
      |ORDER BY doc_id1, doc_id2""".stripMargin

  /** Shared lang-marker CTE chain: toksets → counted (per-language
    * marker counts; reused by the L8 replay and the L108 κ oracle). */
  private val langCountedCteSql: String = {
    val counts = LangMarkers.toSeq.sortBy(_._1).map { case (l, ms) =>
      val lst = ms.map(m => s"'$m'").mkString("[", ", ", "]")
      s"len(list_filter(toks, x -> list_contains($lst, x))) AS c_$l"
    }.mkString(",\n    ")
    s"""WITH toksets AS (
       |  SELECT doc_id, lang AS actual_lang,
       |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
       |  FROM documents),
       |counted AS (
       |  SELECT doc_id, actual_lang,
       |    $counts
       |  FROM toksets)""".stripMargin
  }

  /** The argmax-with-alphabetical-tie-break CASE over counted. */
  private val langPredCaseSql: String = {
    val langs = LangMarkers.keys.toSeq.sorted
    val m = langs.map(l => s"c_$l").mkString("GREATEST(", ", ", ")")
    langs.reverse.foldLeft("'und'") { (acc, l) =>
      s"CASE WHEN c_$l = $m THEN '$l' ELSE $acc END"
    }
  }

  private val langMarkerSql: String = {
    val langs = LangMarkers.keys.toSeq.sorted
    s"""$langCountedCteSql
       |SELECT doc_id, actual_lang, ${langs.map(l => s"c_$l").mkString(", ")},
       |  $langPredCaseSql AS pred_lang
       |FROM counted ORDER BY doc_id""".stripMargin
  }

  /** L108: κ replay — predicted labels from the shared CTE, the
    * |labels|²-bounded confusion marginals, pe in HUGEINT, and the
    * sign-split division matching the Spark side. */
  private val labelAgreementSql: String =
    s"""$langCountedCteSql,
       |pred AS (
       |  SELECT doc_id, actual_lang, $langPredCaseSql AS pred_lang
       |  FROM counted),
       |marg AS (
       |  SELECT actual_lang AS la, pred_lang AS lb, COUNT(*) AS c
       |  FROM pred GROUP BY 1, 2),
       |nn AS (
       |  SELECT CAST(SUM(c) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN la = lb THEN c ELSE 0 END) AS BIGINT)
       |      AS agree
       |  FROM marg),
       |ca AS (SELECT la, CAST(SUM(c) AS BIGINT) AS ca FROM marg GROUP BY la),
       |cb AS (SELECT lb, CAST(SUM(c) AS BIGINT) AS cb FROM marg GROUP BY lb),
       |pe AS (
       |  SELECT SUM(CAST(ca.ca AS HUGEINT) * cb.cb) AS pe_raw
       |  FROM ca JOIN cb ON ca.la = cb.lb),
       |st AS (
       |  SELECT n AS n_items,
       |    agree * 1000000 // n AS po_ppm,
       |    CAST(COALESCE(pe_raw, 0) * 1000000
       |      // (CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_ppm
       |  FROM nn, pe)
       |SELECT n_items, po_ppm, pe_ppm,
       |  CASE WHEN pe_ppm < 1000000 THEN
       |    (CASE WHEN po_ppm >= pe_ppm THEN 1 ELSE -1 END)
       |      * (ABS(po_ppm - pe_ppm) * 1000000 // (1000000 - pe_ppm))
       |  END AS kappa_micro
       |FROM st""".stripMargin

  /** Shared sink-roundtrip oracle (computed from the PARQUET table —
    * the roundtrip queries read the JSONL/CSV exports, so a hash
    * match proves the respective path byte-lossless). */
  private val roundtripOracleSql: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_texts,
      |  MIN(md5(text)) AS lo_md5, MAX(md5(text)) AS hi_md5,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
      |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin

  /** Full replay of the integer-quantized IVF chain
    * (Ann.ivfTopKQuantized): quantize → md5-threshold train sample →
    * seed (lowest-id sampled vectors) → `iters` unrolled Lloyd
    * iterations (squared-L2 argmin assignment, floor-of-mean update,
    * empty cells keep their centroid) → cell assignment of the full
    * corpus → per-query probe ranking → exact-cosine re-rank. Every
    * pre-cosine quantity is an integer represented in double, so both
    * engines agree bit-for-bit; the cosine tail is the same
    * Shared.cosineSimSql as the (passing) brute-force oracle. */
  private def ivfOracleSql(nClusters: Int, nProbe: Int, k: Int, iters: Int,
                           maxQueryId: Long, trainThrHex: String): String = {
    def dist(v: String, c: String) = Shared.l2qDistSql(v, c)
    val centsFinal = s"c$iters"
    s"""WITH ${Shared.ivfTrainCtesSql(nClusters, iters, trainThrHex)},
       |idx AS (
       |  SELECT nn_id, vec, c AS cluster FROM (
       |    SELECT x.nn_id, x.vec, s.c,
       |      ROW_NUMBER() OVER (PARTITION BY x.nn_id
       |        ORDER BY ${dist("x.vq", "s.cent")} ASC, s.c ASC) AS rn
       |    FROM v x CROSS JOIN $centsFinal s) z WHERE rn = 1),
       |qs AS (SELECT nn_id AS query_id, vec AS q_vec, vq AS q_vq
       |       FROM v WHERE nn_id < $maxQueryId),
       |probes AS (
       |  SELECT query_id, q_vec, c AS cluster FROM (
       |    SELECT q.query_id, q.q_vec, s.c,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |        ORDER BY ${dist("q.q_vq", "s.cent")} ASC, s.c ASC) AS rn
       |    FROM qs q CROSS JOIN $centsFinal s) z WHERE rn <= $nProbe),
       |cand AS (
       |  SELECT p.query_id, i.nn_id,
       |    ${Shared.cosineSimSql("p.q_vec", "i.vec")} AS sim
       |  FROM probes p JOIN idx i USING (cluster)
       |  WHERE i.nn_id <> p.query_id),
       |ranked AS (
       |  SELECT query_id, nn_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY sim DESC, nn_id ASC) AS rank
       |  FROM cand)
       |SELECT query_id, rank, nn_id, sim FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Grouped (per-tenant) replay of the quantized IVF chain
    * (Ann.groupedIvfTopKQuantized): every CTE of ivfOracleSql with the
    * group key threaded through seed/assignment/update/probe. Pins the
    * full-sample train regime ('g0'), where the missing-tenant
    * fallback is provably empty. */
  private def groupedIvfOracleSql(nClusters: Int, nProbe: Int, k: Int,
                                  iters: Int, maxQueryId: Long): String = {
    def dist(v: String, c: String) = Shared.l2qDistSql(v, c)
    def lloydIter(n: Int, prev: String) =
      s"""a$n AS (
         |  SELECT grp, nn_id, vq, c FROM (
         |    SELECT t.grp, t.nn_id, t.vq, s.c,
         |      ROW_NUMBER() OVER (PARTITION BY t.grp, t.nn_id
         |        ORDER BY ${dist("t.vq", "s.cent")} ASC, s.c ASC) AS rn
         |    FROM train t JOIN $prev s ON s.grp = t.grp) z WHERE rn = 1),
         |u$n AS (
         |  SELECT a.grp, a.c, d.i, floor(SUM(a.vq[d.i]) / COUNT(*)) AS ci
         |  FROM a$n a CROSS JOIN dims d GROUP BY a.grp, a.c, d.i),
         |c$n AS (
         |  SELECT s.grp, s.c, COALESCE(u.cent, s.cent) AS cent
         |  FROM $prev s LEFT JOIN (
         |    SELECT grp, c, list(ci ORDER BY i) AS cent
         |    FROM u$n GROUP BY grp, c) u
         |  ON u.grp = s.grp AND u.c = s.c)""".stripMargin
    val iterCtes = (1 to iters)
      .map(n => lloydIter(n, if (n == 1) "seed" else s"c${n - 1}"))
      .mkString(",\n")
    val cf = s"c$iters"
    s"""WITH v AS (
       |  SELECT label AS grp, vec_id AS nn_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec,
       |    list_transform(embedding,
       |      x -> floor(CAST(x AS DOUBLE) * 65536 + 0.5)) AS vq
       |  FROM embeddings),
       |dims AS (SELECT UNNEST(range(1, (SELECT MAX(len(vq)) FROM v) + 1)) AS i),
       |train AS (
       |  SELECT * FROM v
       |  WHERE substring(md5(CAST(nn_id AS VARCHAR)), 1, 2) < 'g0'),
       |seed AS (
       |  SELECT grp, rn - 1 AS c, vq AS cent FROM (
       |    SELECT grp, nn_id, vq,
       |      ROW_NUMBER() OVER (PARTITION BY grp ORDER BY nn_id) AS rn
       |    FROM train) z WHERE rn <= $nClusters),
       |$iterCtes,
       |idx AS (
       |  SELECT grp, nn_id, vec, c AS cluster FROM (
       |    SELECT x.grp, x.nn_id, x.vec, s.c,
       |      ROW_NUMBER() OVER (PARTITION BY x.grp, x.nn_id
       |        ORDER BY ${dist("x.vq", "s.cent")} ASC, s.c ASC) AS rn
       |    FROM v x JOIN $cf s ON s.grp = x.grp) z WHERE rn = 1),
       |qs AS (SELECT grp, nn_id AS query_id, vec AS q_vec, vq AS q_vq
       |       FROM v WHERE nn_id < $maxQueryId),
       |probes AS (
       |  SELECT grp, query_id, q_vec, c AS cluster FROM (
       |    SELECT q.grp, q.query_id, q.q_vec, s.c,
       |      ROW_NUMBER() OVER (PARTITION BY q.grp, q.query_id
       |        ORDER BY ${dist("q.q_vq", "s.cent")} ASC, s.c ASC) AS rn
       |    FROM qs q JOIN $cf s ON s.grp = q.grp) z WHERE rn <= $nProbe),
       |cand AS (
       |  SELECT p.query_id, p.grp, i.nn_id,
       |    ${Shared.cosineSimSql("p.q_vec", "i.vec")} AS sim
       |  FROM probes p JOIN idx i
       |    ON i.grp = p.grp AND i.cluster = p.cluster
       |   AND i.nn_id <> p.query_id),
       |ranked AS (
       |  SELECT query_id, grp, nn_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY grp, query_id
       |                       ORDER BY sim DESC, nn_id ASC) AS rank
       |  FROM cand)
       |SELECT query_id, grp, rank, nn_id, sim FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Grouped Lloyd iteration CTEs over `train(grp, nn_id, vq)` /
    * `seed(grp, c, cent)` / `dims(i)` — shared by the grouped-IVF and
    * PQ (group = subspace) oracle replays. */
  private def groupedLloydCtesSql(iters: Int, p: String = ""): String = {
    def lloydIter(n: Int, prev: String) =
      s"""${p}a$n AS (
         |  SELECT grp, nn_id, vq, c FROM (
         |    SELECT t.grp, t.nn_id, t.vq, s.c,
         |      ROW_NUMBER() OVER (PARTITION BY t.grp, t.nn_id
         |        ORDER BY ${Shared.l2qDistSql("t.vq", "s.cent")} ASC, s.c ASC) AS rn
         |    FROM ${p}train t JOIN $prev s ON s.grp = t.grp) z WHERE rn = 1),
         |${p}u$n AS (
         |  SELECT a.grp, a.c, d.i, floor(SUM(a.vq[d.i]) / COUNT(*)) AS ci
         |  FROM ${p}a$n a CROSS JOIN ${p}dims d GROUP BY a.grp, a.c, d.i),
         |${p}c$n AS (
         |  SELECT s.grp, s.c, COALESCE(u.cent, s.cent) AS cent
         |  FROM $prev s LEFT JOIN (
         |    SELECT grp, c, list(ci ORDER BY i) AS cent
         |    FROM ${p}u$n GROUP BY grp, c) u
         |  ON u.grp = s.grp AND u.c = s.c)""".stripMargin
    (1 to iters)
      .map(n => lloydIter(n, if (n == 1) s"${p}seed" else s"${p}c${n - 1}"))
      .mkString(",\n")
  }

  /** Full replay of Ann.pqTopKQuantized: per-row L2 normalization +
    * quantization, per-SUBSPACE grouped Lloyd training (group = the
    * subspace index — the same CTEs as the grouped IVF replay), encode
    * (per-subspace argmin), ADC = summed dtable lookups (exact
    * integers, so the shortlist ORDER replays), exact-cosine re-rank
    * of the shortlist over the raw vectors. */
  private def pqOracleSql(dim: Int, m: Int, ksub: Int, k: Int, iters: Int,
                          refine: Int, maxQueryId: Long,
                          trainThrHex: String): String = {
    val dsub = dim / m
    val short = math.max(k, refine * k)
    s"""WITH v0 AS (
       |  SELECT vec_id AS nn_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
       |  FROM embeddings),
       |nv AS (
       |  SELECT nn_id, vec,
       |    list_transform(vec, x -> floor(
       |      (CASE WHEN nrm = 0 THEN x ELSE x / nrm END) * 65536 + 0.5)) AS nvq
       |  FROM (SELECT nn_id, vec,
       |          sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
       |        FROM v0) z),
       |grps AS (SELECT UNNEST(range(0, $m)) AS grp),
       |sub AS (
       |  SELECT nn_id, grp,
       |    list_transform(range(1, $dsub + 1), j -> nvq[grp * $dsub + j]) AS vq
       |  FROM nv CROSS JOIN grps),
       |dims AS (SELECT UNNEST(range(1, $dsub + 1)) AS i),
       |train AS (
       |  SELECT * FROM sub
       |  WHERE substring(md5(CAST(nn_id AS VARCHAR)), 1, 2) < '$trainThrHex'),
       |seed AS (
       |  SELECT grp, rn - 1 AS c, vq AS cent FROM (
       |    SELECT grp, nn_id, vq,
       |      ROW_NUMBER() OVER (PARTITION BY grp ORDER BY nn_id) AS rn
       |    FROM train) z WHERE rn <= $ksub),
       |${groupedLloydCtesSql(iters)},
       |codes AS (
       |  SELECT nn_id, grp, c AS code FROM (
       |    SELECT s2.nn_id, s2.grp, s.c,
       |      ROW_NUMBER() OVER (PARTITION BY s2.grp, s2.nn_id
       |        ORDER BY ${Shared.l2qDistSql("s2.vq", "s.cent")} ASC, s.c ASC) AS rn
       |    FROM sub s2 JOIN c$iters s ON s.grp = s2.grp) z WHERE rn = 1),
       |qs AS (SELECT nn_id AS query_id, vec AS q_vec, nvq AS q_nvq
       |       FROM nv WHERE nn_id < $maxQueryId),
       |qsub AS (
       |  SELECT query_id, grp,
       |    list_transform(range(1, $dsub + 1), j -> q_nvq[grp * $dsub + j]) AS vq
       |  FROM qs CROSS JOIN grps),
       |dt AS (
       |  SELECT q.query_id, q.grp, s.c,
       |    list_sum(list_transform(range(1, $dsub + 1),
       |      j -> q.vq[j] * s.cent[j])) AS dot
       |  FROM qsub q JOIN c$iters s ON s.grp = q.grp),
       |adcs AS (
       |  SELECT d.query_id, cd.nn_id, SUM(d.dot) AS adc
       |  FROM codes cd JOIN dt d ON d.grp = cd.grp AND d.c = cd.code
       |  WHERE cd.nn_id <> d.query_id
       |  GROUP BY d.query_id, cd.nn_id),
       |short AS (
       |  SELECT query_id, nn_id FROM (
       |    SELECT query_id, nn_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |                         ORDER BY adc DESC, nn_id ASC) AS rk
       |    FROM adcs) z WHERE rk <= $short),
       |cand AS (
       |  SELECT s.query_id, s.nn_id,
       |    ${Shared.cosineSimSql("q.q_vec", "x.vec")} AS sim
       |  FROM short s
       |  JOIN nv x ON x.nn_id = s.nn_id
       |  JOIN qs q ON q.query_id = s.query_id),
       |ranked AS (
       |  SELECT query_id, nn_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY sim DESC, nn_id ASC) AS rank
       |  FROM cand)
       |SELECT query_id, rank, nn_id, sim FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Full replay of the persisted quantized IVF+PQ chain
    * (Ann.buildIvfPqIndexQuantized + searchIvfPqIndexQuantized):
    * normalize+quantize, coarse Lloyd training (ungrouped CTEs),
    * integer residuals, per-subspace grouped Lloyd training
    * (p-prefixed CTEs), encode, probe order, coff + ADC shortlist
    * order, exact re-rank — every pre-cosine step integer-exact. */
  private def ivfPqOracleSql(dim: Int, nClusters: Int, m: Int, ksub: Int,
                             k: Int, iters: Int, nProbe: Int, refine: Int,
                             maxQueryId: Long, trainThrHex: String): String = {
    val dsub = dim / m
    val short = math.max(k, refine * k)
    val cf = s"c$iters"     // final coarse centroids
    val pf = s"pc$iters"    // final PQ codebooks
    s"""WITH v0 AS (
       |  SELECT vec_id AS nn_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
       |  FROM embeddings),
       |v AS (
       |  SELECT nn_id, vec,
       |    list_transform(vec, x -> floor(
       |      (CASE WHEN nrm = 0 THEN x ELSE x / nrm END) * 65536 + 0.5)) AS vq
       |  FROM (SELECT nn_id, vec,
       |          sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
       |        FROM v0) z),
       |${Shared.ivfTrainCoreCtesSql(nClusters, iters, trainThrHex)},
       |assigned AS (
       |  SELECT nn_id, c AS cluster FROM (
       |    SELECT x.nn_id, s.c,
       |      ROW_NUMBER() OVER (PARTITION BY x.nn_id
       |        ORDER BY ${Shared.l2qDistSql("x.vq", "s.cent")} ASC, s.c ASC) AS rn
       |    FROM v x CROSS JOIN $cf s) z WHERE rn = 1),
       |resid AS (
       |  SELECT a.nn_id, a.cluster,
       |    list_transform(range(1, $dim + 1), j -> x.vq[j] - s.cent[j]) AS rv
       |  FROM assigned a
       |  JOIN v x ON x.nn_id = a.nn_id
       |  JOIN $cf s ON s.c = a.cluster),
       |grps AS (SELECT UNNEST(range(0, $m)) AS grp),
       |psub AS (
       |  SELECT nn_id, grp,
       |    list_transform(range(1, $dsub + 1), j -> rv[grp * $dsub + j]) AS vq
       |  FROM resid CROSS JOIN grps),
       |pdims AS (SELECT UNNEST(range(1, $dsub + 1)) AS i),
       |ptrain AS (
       |  SELECT * FROM psub
       |  WHERE substring(md5(CAST(nn_id AS VARCHAR)), 1, 2) < '$trainThrHex'),
       |pseed AS (
       |  SELECT grp, rn - 1 AS c, vq AS cent FROM (
       |    SELECT grp, nn_id, vq,
       |      ROW_NUMBER() OVER (PARTITION BY grp ORDER BY nn_id) AS rn
       |    FROM ptrain) z WHERE rn <= $ksub),
       |${groupedLloydCtesSql(iters, p = "p")},
       |codes AS (
       |  SELECT nn_id, grp, c AS code FROM (
       |    SELECT s2.nn_id, s2.grp, s.c,
       |      ROW_NUMBER() OVER (PARTITION BY s2.grp, s2.nn_id
       |        ORDER BY ${Shared.l2qDistSql("s2.vq", "s.cent")} ASC, s.c ASC) AS rn
       |    FROM psub s2 JOIN $pf s ON s.grp = s2.grp) z WHERE rn = 1),
       |qs AS (SELECT nn_id AS query_id, vec AS q_vec, vq AS q_vq
       |       FROM v WHERE nn_id < $maxQueryId),
       |probes AS (
       |  SELECT query_id, cluster,
       |    list_sum(list_transform(range(1, $dim + 1),
       |      j -> q_vq[j] * cent[j])) AS coff
       |  FROM (
       |    SELECT q.query_id, q.q_vq, s.c AS cluster, s.cent,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |        ORDER BY ${Shared.l2qDistSql("q.q_vq", "s.cent")} ASC, s.c ASC) AS rn
       |    FROM qs q CROSS JOIN $cf s) z WHERE rn <= $nProbe),
       |qsub AS (
       |  SELECT query_id, grp,
       |    list_transform(range(1, $dsub + 1), j -> q_vq[grp * $dsub + j]) AS vq
       |  FROM qs CROSS JOIN grps),
       |dt AS (
       |  SELECT q.query_id, q.grp, s.c,
       |    list_sum(list_transform(range(1, $dsub + 1),
       |      j -> q.vq[j] * s.cent[j])) AS dot
       |  FROM qsub q JOIN $pf s ON s.grp = q.grp),
       |adcs AS (
       |  SELECT p.query_id, a.nn_id, p.coff + SUM(d.dot) AS adc
       |  FROM probes p
       |  JOIN assigned a ON a.cluster = p.cluster AND a.nn_id <> p.query_id
       |  JOIN codes cd ON cd.nn_id = a.nn_id
       |  JOIN dt d ON d.query_id = p.query_id AND d.grp = cd.grp
       |           AND d.c = cd.code
       |  GROUP BY p.query_id, a.nn_id, p.coff),
       |short AS (
       |  SELECT query_id, nn_id FROM (
       |    SELECT query_id, nn_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |                         ORDER BY adc DESC, nn_id ASC) AS rk
       |    FROM adcs) z WHERE rk <= $short),
       |cand AS (
       |  SELECT s.query_id, s.nn_id,
       |    ${Shared.cosineSimSql("q.q_vec", "x.vec")} AS sim
       |  FROM short s
       |  JOIN v x ON x.nn_id = s.nn_id
       |  JOIN qs q ON q.query_id = s.query_id),
       |ranked AS (
       |  SELECT query_id, nn_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY sim DESC, nn_id ASC) AS rank
       |  FROM cand)
       |SELECT query_id, rank, nn_id, sim FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Replay of Ann.ivfTopKAutoQuantized — the ivfOracleSql chain with
    * the probe depth DERIVED inside the query: md5-ordered held-out
    * sample, exact-cosine truth, integer home-cell/probe-rank
    * histogram, per-mille floor scan for the minimal depth (fallback
    * = every cell), then the standard probe/search tail reading the
    * chosen depth via a scalar subquery. */
  private def ivfAutoOracleSql(nClusters: Int, k: Int, iters: Int,
                               maxQueryId: Long, trainThrHex: String,
                               recallPerMille: Int,
                               sampleSize: Int): String = {
    def dist(v: String, c: String) = Shared.l2qDistSql(v, c)
    val cf = s"c$iters"
    s"""WITH ${Shared.ivfTrainCtesSql(nClusters, iters, trainThrHex)},
       |samp AS (
       |  SELECT nn_id AS query_id, vec AS q_vec, vq AS q_vq
       |  FROM v ORDER BY md5(CAST(nn_id AS VARCHAR)), nn_id
       |  LIMIT $sampleSize),
       |truth AS (
       |  SELECT query_id, nn_id FROM (
       |    SELECT s.query_id, x.nn_id,
       |      ROW_NUMBER() OVER (PARTITION BY s.query_id
       |        ORDER BY ${Shared.cosineSimSql("s.q_vec", "x.vec")} DESC,
       |                 x.nn_id ASC) AS rk
       |    FROM samp s CROSS JOIN v x WHERE x.nn_id <> s.query_id) z
       |  WHERE rk <= $k),
       |cellof AS (
       |  SELECT nn_id, c AS nn_cell FROM (
       |    SELECT x.nn_id, s.c,
       |      ROW_NUMBER() OVER (PARTITION BY x.nn_id
       |        ORDER BY ${dist("x.vq", "s.cent")} ASC, s.c ASC) AS rn
       |    FROM v x CROSS JOIN $cf s) z WHERE rn = 1),
       |qrank AS (
       |  SELECT q.query_id, s.c,
       |    ROW_NUMBER() OVER (PARTITION BY q.query_id
       |      ORDER BY ${dist("q.q_vq", "s.cent")} ASC, s.c ASC) AS pr
       |  FROM samp q CROSS JOIN $cf s),
       |hist AS (
       |  SELECT qr.pr AS probe_rank, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM truth t
       |  JOIN cellof co ON co.nn_id = t.nn_id
       |  JOIN qrank qr ON qr.query_id = t.query_id AND qr.c = co.nn_cell
       |  GROUP BY qr.pr),
       |tot AS (SELECT GREATEST(CAST(COALESCE(SUM(n), 0) AS BIGINT),
       |                        CAST(1 AS BIGINT)) AS total FROM hist),
       |npt AS (
       |  SELECT COALESCE(MIN(p), $nClusters) AS np FROM (
       |    SELECT ps.p,
       |      (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT)
       |       FROM hist WHERE probe_rank <= ps.p) AS cum
       |    FROM (SELECT UNNEST(range(1, $nClusters + 1)) AS p) ps) z,
       |    tot
       |  WHERE z.cum * 1000 >= tot.total * $recallPerMille),
       |idx AS (
       |  SELECT nn_id, vec, c AS cluster FROM (
       |    SELECT x.nn_id, x.vec, s.c,
       |      ROW_NUMBER() OVER (PARTITION BY x.nn_id
       |        ORDER BY ${dist("x.vq", "s.cent")} ASC, s.c ASC) AS rn
       |    FROM v x CROSS JOIN $cf s) z WHERE rn = 1),
       |qs AS (SELECT nn_id AS query_id, vec AS q_vec, vq AS q_vq
       |       FROM v WHERE nn_id < $maxQueryId),
       |probes AS (
       |  SELECT query_id, q_vec, c AS cluster FROM (
       |    SELECT q.query_id, q.q_vec, s.c,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |        ORDER BY ${dist("q.q_vq", "s.cent")} ASC, s.c ASC) AS rn
       |    FROM qs q CROSS JOIN $cf s) z
       |  WHERE rn <= (SELECT np FROM npt)),
       |cand AS (
       |  SELECT p.query_id, i.nn_id,
       |    ${Shared.cosineSimSql("p.q_vec", "i.vec")} AS sim
       |  FROM probes p JOIN idx i USING (cluster)
       |  WHERE i.nn_id <> p.query_id),
       |ranked AS (
       |  SELECT query_id, nn_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY sim DESC, nn_id ASC) AS rank
       |  FROM cand)
       |SELECT query_id, rank, nn_id, sim FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** L6d: MMR greedy selection unrolled — k−1 (pen, sel, all) CTE
    * rounds over the quantized candidate/pair sims. Every score is a
    * BIGINT cross-multiply, ties on nn_id, so each round's argmax is
    * the operator's argmax bit-for-bit. */
  private def mmrOracleSql(maxQ: Int, c: Int, k: Int,
                           num: Long, den: Long): String = {
    def cosQ(a: String, b: String) =
      s"""CAST(FLOOR((list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2])) /
         |      SQRT(list_sum(list_transform($a, x -> x * x)) *
         |           list_sum(list_transform($b, x -> x * x)))) * 10000 + 0.5) AS BIGINT)""".stripMargin
    val sb = new StringBuilder
    sb ++= s"""WITH v AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, vec AS qv FROM v WHERE vec_id < $maxQ),
      |sims AS (
      |  SELECT query_id, vec_id AS nn_id, vec,
      |    ${cosQ("qv", "vec")} AS rel_q
      |  FROM v CROSS JOIN q WHERE vec_id <> query_id),
      |cand AS (
      |  SELECT query_id, nn_id, vec, rel_q FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY rel_q DESC, nn_id ASC) AS rk FROM sims) z
      |  WHERE rk <= $c),
      |pairs AS (
      |  SELECT a.query_id, a.nn_id, b.nn_id AS other_id,
      |    ${cosQ("a.vec", "b.vec")} AS psim_q
      |  FROM cand a JOIN cand b
      |    ON a.query_id = b.query_id AND a.nn_id <> b.nn_id),
      |sel1 AS (
      |  SELECT query_id, nn_id, 1 AS mmr_rank, rel_q * $num AS score10_q
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY rel_q DESC, nn_id ASC) AS rk FROM cand) z
      |  WHERE rk = 1),
      |all1 AS (SELECT * FROM sel1),
      |""".stripMargin
    for (r <- 2 to k) {
      sb ++= s"""pen$r AS (
        |  SELECT p.query_id, p.nn_id, MAX(p.psim_q) AS pen_q
        |  FROM pairs p JOIN all${r - 1} s
        |    ON p.query_id = s.query_id AND p.other_id = s.nn_id
        |  GROUP BY p.query_id, p.nn_id),
        |sel$r AS (
        |  SELECT query_id, nn_id, $r AS mmr_rank, score10_q FROM (
        |    SELECT c.query_id, c.nn_id,
        |      c.rel_q * $num - COALESCE(p.pen_q, 0) * ${den - num} AS score10_q,
        |      ROW_NUMBER() OVER (PARTITION BY c.query_id
        |        ORDER BY c.rel_q * $num - COALESCE(p.pen_q, 0) * ${den - num} DESC,
        |                 c.nn_id ASC) AS rk
        |    FROM cand c
        |    LEFT JOIN pen$r p ON p.query_id = c.query_id AND p.nn_id = c.nn_id
        |    WHERE NOT EXISTS (SELECT 1 FROM all${r - 1} s
        |      WHERE s.query_id = c.query_id AND s.nn_id = c.nn_id)) z
        |  WHERE rk = 1),
        |all$r AS (SELECT * FROM all${r - 1} UNION ALL SELECT * FROM sel$r),
        |""".stripMargin
    }
    sb.setLength(sb.length - 2) // drop trailing ",\n"
    sb ++= s"\nSELECT query_id, mmr_rank, nn_id, score10_q FROM all$k " +
      "ORDER BY query_id, mmr_rank"
    sb.toString
  }

  // L12i shares L12d's oracle verbatim: the synthetic corpus is not
  // decodable imagery, so the real extractor's stub fallback must be
  // BIT-identical to the stub extractor — one oracle gates both.
  // (lazy: baseOracles is declared below; object-init order would
  // otherwise read it as null)
  lazy val oracles: Map[String, String] = baseOracles +
    ("q_multimodal_features_real" -> baseOracles("q_multimodal_features"))

  private lazy val baseOracles: Map[String, String] = Map(
    "q_retrieval_mmr" -> mmrOracleSql(maxQ = 5, c = 16, k = 5,
      num = 7L, den = 10L),

    // L76: quantized cells + the share/purity aggregates — training
    // replay via the shared CTEs.
    "q_cluster_purity" ->
      s"""WITH ${Shared.ivfTrainCtesSql(nClusters = 8, iters = 2,
            trainThrHex = "g0")},
         |lab AS (
         |  SELECT vec_id AS nn_id, label
         |  FROM embeddings),
         |asg AS (
         |  SELECT x.nn_id, l.label, x.c AS cluster FROM (
         |    SELECT v0.nn_id, s.c,
         |      ROW_NUMBER() OVER (PARTITION BY v0.nn_id
         |        ORDER BY ${Shared.l2qDistSql("v0.vq", "s.cent")} ASC,
         |                 s.c ASC) AS rn
         |    FROM v v0 CROSS JOIN c2 s) x
         |  JOIN lab l ON l.nn_id = x.nn_id
         |  WHERE x.rn = 1),
         |perlab AS (
         |  SELECT cluster, label, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM asg GROUP BY cluster, label),
         |percl AS (
         |  SELECT cluster, CAST(SUM(n) AS BIGINT) AS n_vecs
         |  FROM perlab GROUP BY cluster),
         |tot AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS total FROM percl),
         |top AS (
         |  SELECT cluster, label AS top_label, n AS n_top FROM (
         |    SELECT cluster, label, n,
         |      ROW_NUMBER() OVER (PARTITION BY cluster
         |                         ORDER BY n DESC, label ASC) AS rk
         |    FROM perlab) z WHERE rk = 1)
         |SELECT p.cluster, p.n_vecs,
         |  CAST(p.n_vecs * 1000 // t.total AS BIGINT) AS share_pm,
         |  tp.top_label, tp.n_top,
         |  CAST(tp.n_top * 1000 // p.n_vecs AS BIGINT) AS purity_pm
         |FROM percl p JOIN top tp ON tp.cluster = p.cluster
         |CROSS JOIN tot t
         |ORDER BY p.cluster""".stripMargin,

    // The measured-probe-depth IVF replayed INCLUDING the tuning
    // decision — see ivfAutoOracleSql.
    "q_ann_ivf_auto" -> ivfAutoOracleSql(nClusters = 16, k = 5, iters = 2,
      maxQueryId = 50L, trainThrHex = "40", recallPerMille = 900,
      sampleSize = 64),

    // The persisted quantized IVF+PQ chain replayed end to end (both
    // trainings, residual encode, probe + ADC order) — see
    // ivfPqOracleSql.
    "q_ann_ivfpq" -> ivfPqOracleSql(dim = 64, nClusters = 16, m = 16,
      ksub = 32, k = 5, iters = 2, nProbe = 6, refine = 6,
      maxQueryId = 50L, trainThrHex = "g0"),

    // The per-tenant quantized IVF chain replayed (training included,
    // group key threaded through every CTE) — see groupedIvfOracleSql.
    "q_ann_grouped_ivf" -> groupedIvfOracleSql(nClusters = 8, nProbe = 4,
      k = 5, iters = 2, maxQueryId = 50L),

    // The quantized PQ chain replayed end to end — subspace training,
    // encode, ADC shortlist order, exact re-rank; see pqOracleSql.
    "q_ann_pq" -> pqOracleSql(dim = 64, m = 16, ksub = 32, k = 5,
      iters = 3, refine = 6, maxQueryId = 50L, trainThrHex = "g0"),
    "q_dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,

    "q_dedup_jaccard" -> jaccardSqlBase,

    // L5c: the identical prefix-filter chain in SQL — global (df, tok)
    // order, integer prefix bound (9·sz+9)//10, positional filter, cross-
    // multiplied ratio and verify. Bit-for-bit the operator's arithmetic.
    "q_dedup_prefix" ->
      """WITH toks AS (
        |  SELECT DISTINCT id, tok FROM (
        |    SELECT doc_id AS id,
        |      UNNEST(list_filter(string_split(text, ' '),
        |        x -> len(x) > 0)) AS tok
        |    FROM documents)),
        |dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
        |          FROM toks GROUP BY tok),
        |sized AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS sz
        |          FROM toks GROUP BY id),
        |ordered AS (
        |  SELECT t.id, t.tok, s.sz,
        |    ROW_NUMBER() OVER (PARTITION BY t.id ORDER BY d.df, t.tok) AS rk
        |  FROM toks t JOIN dfreq d USING (tok) JOIN sized s USING (id)),
        |pre AS (
        |  SELECT id, tok, sz, rk FROM ordered
        |  WHERE rk <= sz - (9 * sz + 9) // 10 + 1),
        |cand AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2,
        |    a.sz AS sz1, b.sz AS sz2
        |  FROM pre a JOIN pre b ON a.tok = b.tok AND a.id < b.id
        |  WHERE LEAST(a.sz, b.sz) * 10 >= GREATEST(a.sz, b.sz) * 9
        |    AND 1 + LEAST(a.sz - a.rk, b.sz - b.rk)
        |        >= (9 * (a.sz + b.sz) + 18) // 19),
        |veri AS (
        |  SELECT c.id1, c.id2, c.sz1, c.sz2, CAST(COUNT(*) AS BIGINT) AS inter
        |  FROM cand c
        |  JOIN toks x ON x.id = c.id1
        |  JOIN toks y ON y.id = c.id2 AND y.tok = x.tok
        |  GROUP BY c.id1, c.id2, c.sz1, c.sz2)
        |SELECT id1, id2,
        |  CAST(inter * 1000000 // (sz1 + sz2 - inter) AS BIGINT) AS jac_micro
        |FROM veri
        |WHERE inter * 10 >= (sz1 + sz2 - inter) * 9
        |ORDER BY id1, id2""".stripMargin,

    // L99: winnow profile replay — per-position 8-gram rolling hashes
    // (the L11 base-31 scheme), width-16 window minima, distinct set;
    // the profile columns pin the whole chain.
    "q_winnow" ->
      s"""WITH ${Shared.winnowCteSql}
        |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps,
        |  fps[1] AS fp_min, fps[len(fps)] AS fp_max,
        |  CAST(list_aggregate(fps, 'sum') AS BIGINT) AS fp_sum
        |FROM f ORDER BY doc_id""".stripMargin,

    // L99b: the MOSS matcher replay — rare-fingerprint postings
    // (2 <= df <= 8) self-join for candidates, exact shared count over
    // the full distinct sets for verify.
    "q_winnow_pairs" ->
      s"""WITH ${Shared.winnowCteSql},
        |posts AS (SELECT doc_id, UNNEST(fps) AS fp FROM f),
        |dfreq AS (
        |  SELECT fp FROM posts GROUP BY fp
        |  HAVING COUNT(*) BETWEEN 2 AND 8),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        |  FROM posts a JOIN dfreq USING (fp)
        |  JOIN posts b ON a.fp = b.fp AND a.doc_id < b.doc_id),
        |ver AS (
        |  SELECT c.id1, c.id2,
        |    CAST(len(list_intersect(f1.fps, f2.fps)) AS BIGINT) AS n_shared,
        |    CAST(LEAST(len(f1.fps), len(f2.fps)) AS BIGINT) AS nmin
        |  FROM cand c
        |  JOIN f f1 ON f1.doc_id = c.id1
        |  JOIN f f2 ON f2.doc_id = c.id2)
        |SELECT id1, id2, n_shared,
        |  CAST(n_shared * 1000000 // nmin AS BIGINT) AS overlap_pm
        |FROM ver WHERE n_shared >= 8
        |ORDER BY id1, id2""".stripMargin,

    // L99d: the localization replay — the q_winnow_pairs chain for the
    // verified pairs, plus the positional-anchor CTE joined on fp for
    // both sides and folded to per-pair extents.
    "q_winnow_spans" ->
      s"""WITH ${Shared.winnowCteSql},
        |${Shared.winnowSpansCteSql},
        |posts AS (SELECT doc_id, UNNEST(fps) AS fp FROM f),
        |dfreq AS (
        |  SELECT fp FROM posts GROUP BY fp
        |  HAVING COUNT(*) BETWEEN 2 AND 8),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        |  FROM posts a JOIN dfreq USING (fp)
        |  JOIN posts b ON a.fp = b.fp AND a.doc_id < b.doc_id),
        |ver AS (
        |  SELECT c.id1, c.id2,
        |    CAST(len(list_intersect(f1.fps, f2.fps)) AS BIGINT) AS n_shared,
        |    CAST(LEAST(len(f1.fps), len(f2.fps)) AS BIGINT) AS nmin
        |  FROM cand c
        |  JOIN f f1 ON f1.doc_id = c.id1
        |  JOIN f f2 ON f2.doc_id = c.id2),
        |pairs AS (
        |  SELECT id1, id2, n_shared,
        |    CAST(n_shared * 1000000 // nmin AS BIGINT) AS overlap_pm
        |  FROM ver WHERE n_shared >= 8)
        |SELECT p.id1, p.id2, p.n_shared, p.overlap_pm,
        |  CAST(COUNT(*) AS BIGINT) AS n_anchor_pairs,
        |  MIN(s1.pos) AS from1, MAX(s1.pos) - MIN(s1.pos) + 8 AS extent1,
        |  MIN(s2.pos) AS from2, MAX(s2.pos) - MIN(s2.pos) + 8 AS extent2
        |FROM pairs p
        |JOIN sp s1 ON s1.doc_id = p.id1
        |JOIN sp s2 ON s2.doc_id = p.id2 AND s2.fp = s1.fp
        |GROUP BY p.id1, p.id2, p.n_shared, p.overlap_pm
        |ORDER BY p.id1, p.id2""".stripMargin,

    // L106: the content-diff replay — both releases' inventories in
    // one statement via the parameterized scaffold, full-outer fold.
    "q_content_diff" ->
      s"""WITH ${winnowInvCteSql("documents", "ra")},
        |${winnowInvCteSql(
          "(SELECT source, CASE WHEN doc_id % 7 = 0 THEN text || " +
            "' amended release note appended here' ELSE text END AS text " +
            "FROM documents WHERE doc_id % 5 <> 0)", "rb")},
        |j AS (
        |  SELECT COALESCE(a.grp, b.grp) AS grp,
        |    CASE WHEN a.fp IS NOT NULL THEN 1 ELSE 0 END AS in_a,
        |    CASE WHEN b.fp IS NOT NULL THEN 1 ELSE 0 END AS in_b
        |  FROM rai a FULL OUTER JOIN rbi b
        |    ON a.grp = b.grp AND a.fp = b.fp),
        |g AS (
        |  SELECT grp AS source, CAST(SUM(in_a) AS BIGINT) AS n_a,
        |    CAST(SUM(in_b) AS BIGINT) AS n_b,
        |    CAST(SUM(in_a * in_b) AS BIGINT) AS n_common
        |  FROM j GROUP BY grp)
        |SELECT source, n_a, n_b, n_common,
        |  (n_b - n_common) * 1000000 // (n_a + n_b - n_common) AS added_pm,
        |  (n_a - n_common) * 1000000 // (n_a + n_b - n_common) AS removed_pm,
        |  n_common * 1000000 // (n_a + n_b - n_common) AS jaccard_pm
        |FROM g ORDER BY source""".stripMargin,

    // L105: the winnow-decontamination replay — train/eval split,
    // train-side df cap, cross join on fp, exact intersect verify.
    "q_decontaminate_winnow" ->
      s"""WITH ${Shared.winnowCteSql},
        |tr AS (SELECT doc_id, fps FROM f WHERE doc_id % 23 <> 0),
        |ev AS (SELECT doc_id AS eval_id, fps AS efps FROM f
        |       WHERE doc_id % 23 = 0),
        |pa AS (SELECT doc_id, UNNEST(fps) AS fp FROM tr),
        |pb AS (SELECT eval_id, UNNEST(efps) AS fp FROM ev),
        |dfa AS (SELECT fp FROM pa GROUP BY fp HAVING COUNT(*) <= 16),
        |cand AS (
        |  SELECT DISTINCT a.doc_id, b.eval_id
        |  FROM pa a JOIN dfa USING (fp) JOIN pb b ON a.fp = b.fp),
        |ver AS (
        |  SELECT c.doc_id, c.eval_id,
        |    CAST(len(list_intersect(t.fps, e.efps)) AS BIGINT) AS n_shared,
        |    CAST(LEAST(len(t.fps), len(e.efps)) AS BIGINT) AS nmin
        |  FROM cand c
        |  JOIN tr t ON t.doc_id = c.doc_id
        |  JOIN ev e ON e.eval_id = c.eval_id)
        |SELECT doc_id, eval_id, n_shared,
        |  CAST(n_shared * 1000000 // nmin AS BIGINT) AS overlap_pm
        |FROM ver WHERE n_shared >= 8
        |ORDER BY doc_id, eval_id""".stripMargin,

    // L99f: the blocked-matcher replay — same chain with the lang
    // equality riding the candidate join (df global, the L82d rule).
    "q_winnow_pairs_blocked" ->
      s"""WITH ${Shared.winnowCteSql},
        |dl AS (SELECT doc_id, lang FROM documents),
        |posts AS (
        |  SELECT f.doc_id, dl.lang, UNNEST(f.fps) AS fp
        |  FROM f JOIN dl USING (doc_id)),
        |dfreq AS (
        |  SELECT fp FROM posts GROUP BY fp
        |  HAVING COUNT(*) BETWEEN 2 AND 8),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        |  FROM posts a JOIN dfreq USING (fp)
        |  JOIN posts b ON a.fp = b.fp AND a.lang = b.lang
        |    AND a.doc_id < b.doc_id),
        |ver AS (
        |  SELECT c.id1, c.id2,
        |    CAST(len(list_intersect(f1.fps, f2.fps)) AS BIGINT) AS n_shared,
        |    CAST(LEAST(len(f1.fps), len(f2.fps)) AS BIGINT) AS nmin
        |  FROM cand c
        |  JOIN f f1 ON f1.doc_id = c.id1
        |  JOIN f f2 ON f2.doc_id = c.id2)
        |SELECT id1, id2, n_shared,
        |  CAST(n_shared * 1000000 // nmin AS BIGINT) AS overlap_pm
        |FROM ver WHERE n_shared >= 8
        |ORDER BY id1, id2""".stripMargin,

    // L99e: the apply replay — drop side = distinct id2 of the pairs
    // chain, survivors via anti-join.
    "q_winnow_apply" ->
      s"""WITH ${Shared.winnowCteSql},
        |posts AS (SELECT doc_id, UNNEST(fps) AS fp FROM f),
        |dfreq AS (
        |  SELECT fp FROM posts GROUP BY fp
        |  HAVING COUNT(*) BETWEEN 2 AND 8),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        |  FROM posts a JOIN dfreq USING (fp)
        |  JOIN posts b ON a.fp = b.fp AND a.doc_id < b.doc_id),
        |drops AS (
        |  SELECT DISTINCT c.id2 AS drop_id
        |  FROM cand c
        |  JOIN f f1 ON f1.doc_id = c.id1
        |  JOIN f f2 ON f2.doc_id = c.id2
        |  WHERE len(list_intersect(f1.fps, f2.fps)) >= 8)
        |SELECT doc_id, lang, source FROM documents
        |WHERE doc_id NOT IN (SELECT drop_id FROM drops)
        |ORDER BY doc_id""".stripMargin,

    // L84: the sampled-rate replay — same id-hash sample, exact
    // cross-multiplied jaccard EXISTS per sampled doc (lang-blocked).
    "q_dup_rate_sampled" ->
      """WITH ts AS (
        |  SELECT doc_id, lang,
        |    list_filter(list_distinct(string_split(text, ' ')),
        |      x -> len(x) > 0) AS toks
        |  FROM documents),
        |tnz AS (SELECT * FROM ts WHERE len(toks) > 0),
        |samp AS (SELECT * FROM tnz
        |         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '20'),
        |dup AS (
        |  SELECT DISTINCT s.doc_id FROM samp s JOIN tnz b
        |    ON s.lang = b.lang AND s.doc_id != b.doc_id
        |  WHERE len(list_intersect(s.toks, b.toks)) * 10 >=
        |    (len(s.toks) + len(b.toks)
        |       - len(list_intersect(s.toks, b.toks))) * 9)
        |SELECT (SELECT COUNT(*) FROM samp) AS n_sampled,
        |  (SELECT COUNT(*) FROM dup) AS n_dup,
        |  CASE WHEN (SELECT COUNT(*) FROM samp) > 0
        |       THEN (SELECT COUNT(*) FROM dup) * 1000000
        |              // (SELECT COUNT(*) FROM samp)
        |       ELSE CAST(0 AS BIGINT) END AS dup_ppm""".stripMargin,

    // L82: the containment twin — the naive all-ordered-pairs replay
    // (3-shingle list_intersect per pair) of the prefix-probed chain;
    // zero-token docs are excluded on both sides (an empty set
    // satisfies any ≥-bound vacuously and divides by zero). Shingle
    // construction matches q_dedup_ngram's: < 3 tokens → the whole
    // text as one shingle.
    "q_dedup_containment" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |         ELSE list_transform(range(1, len(t) - 1),
        |                i -> array_to_string(list_slice(t, i, i + 2), ' ')) END)
        |      AS toks
        |  FROM tk WHERE len(t) > 0)
        |SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
        |  CAST(len(list_intersect(a.toks, b.toks)) * 1000000
        |       // len(a.toks) AS BIGINT) AS cont_micro
        |FROM sh a JOIN sh b ON a.doc_id != b.doc_id
        |WHERE len(list_intersect(a.toks, b.toks)) * 10 >= 9 * len(a.toks)
        |ORDER BY contained_id, container_id""".stripMargin,

    // L82d: the same replay with the tenant key riding the pair join.
    "q_dedup_containment_grouped" ->
      """WITH tk AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source,
        |    list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |         ELSE list_transform(range(1, len(t) - 1),
        |                i -> array_to_string(list_slice(t, i, i + 2), ' ')) END)
        |      AS toks
        |  FROM tk WHERE len(t) > 0)
        |SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
        |  CAST(len(list_intersect(a.toks, b.toks)) * 1000000
        |       // len(a.toks) AS BIGINT) AS cont_micro,
        |  a.source
        |FROM sh a JOIN sh b
        |  ON a.doc_id != b.doc_id AND a.source = b.source
        |WHERE len(list_intersect(a.toks, b.toks)) * 10 >= 9 * len(a.toks)
        |ORDER BY contained_id, container_id""".stripMargin,

    // L67: quantize-then-integer replay — floored component quantors,
    // floored integer centroid mean, integer squared distance.
    "q_embed_outliers" ->
      """WITH ev AS (
        |  SELECT vec_id, label, i AS pos,
        |    CAST(FLOOR(CAST(embedding[i+1] AS DOUBLE) * 1000000.0) AS BIGINT) AS vq
        |  FROM embeddings, UNNEST(range(0, len(embedding))) AS u(i)),
        |cent AS (
        |  SELECT label, pos,
        |    CAST(FLOOR(CAST(SUM(vq) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cq
        |  FROM ev GROUP BY 1, 2),
        |d2 AS (
        |  SELECT ev.vec_id, ev.label,
        |    CAST(SUM((vq - cq) * (vq - cq)) AS BIGINT) AS d2
        |  FROM ev JOIN cent USING (label, pos) GROUP BY 1, 2),
        |rk AS (
        |  SELECT label, vec_id, d2,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY label
        |      ORDER BY d2 DESC, vec_id) AS BIGINT) AS rank
        |  FROM d2)
        |SELECT label, rank, vec_id, d2 FROM rk WHERE rank <= 5
        |ORDER BY label, rank""".stripMargin,

    // L71: the pack cumsum replay rolled up per shard.
    "q_pack_efficiency" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum
        |  FROM t),
        |sh AS (
        |  SELECT CAST(FLOOR((cum - n_tokens) / 4096.0) AS BIGINT) AS shard,
        |    n_tokens
        |  FROM c)
        |SELECT shard, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS fill_tokens,
        |  CAST(SUM(n_tokens) * 1000 // 4096 AS BIGINT) AS util_per_mille
        |FROM sh GROUP BY shard ORDER BY shard""".stripMargin,

    // L69: the exact pair CTE's quantized jac, floor-bucketed.
    "q_dedup_threshold_curve" ->
      s"""${Shared.clusterReachCteSql}
        |SELECT CAST(FLOOR(jacv * 100) AS BIGINT) AS jac_pct,
        |  COUNT(*) AS n_pairs
        |FROM (
        |  SELECT FLOOR(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |    len(list_distinct(list_concat(a.toks, b.toks))) * 10000 + 0.5)
        |    / 10000 AS jacv
        |  FROM toksets a JOIN toksets b
        |    ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE FLOOR(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |    len(list_distinct(list_concat(a.toks, b.toks))) * 10000 + 0.5)
        |    / 10000 >= 0.9)
        |GROUP BY 1 ORDER BY jac_pct""".stripMargin,

    // L69b: closure clusters + token counts, top-10 by saved mass.
    "q_dedup_savings" ->
      s"""${Shared.clusterReachCteSql},
        |cl AS (
        |  SELECT e.id, MIN(r.r) AS cluster
        |  FROM (SELECT DISTINCT src AS id FROM edges) e
        |  JOIN reach r ON r.id = e.id GROUP BY e.id),
        |tk AS (
        |  SELECT doc_id AS id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0))
        |      AS BIGINT) AS tkn
        |  FROM documents)
        |SELECT cl.cluster, COUNT(*) AS n_docs,
        |  CAST(SUM(tk.tkn) AS BIGINT) AS total_tokens,
        |  CAST(MAX(tk.tkn) AS BIGINT) AS keep_tokens,
        |  CAST(SUM(tk.tkn) - MAX(tk.tkn) AS BIGINT) AS wasted_tokens
        |FROM cl JOIN tk USING (id)
        |GROUP BY cl.cluster
        |ORDER BY wasted_tokens DESC, cluster LIMIT 10""".stripMargin,

    // L63: the exact pair CTE joined to source metadata twice.
    "q_dup_source_matrix" ->
      s"""${Shared.clusterReachCteSql},
        |sm AS (
        |  SELECT LEAST(da.source, db.source) AS source_a,
        |         GREATEST(da.source, db.source) AS source_b
        |  FROM p
        |  JOIN documents da ON da.doc_id = p.id1
        |  JOIN documents db ON db.doc_id = p.id2)
        |SELECT source_a, source_b, COUNT(*) AS n_pairs
        |FROM sm GROUP BY source_a, source_b
        |ORDER BY source_a, source_b""".stripMargin,

    // L85: full bottom-k sketch replay — 3-shingle strings (the
    // q_novelty construction), FNV-1a 64 byte walk per DISTINCT
    // (source, shingle) in HUGEINT (the minhash oracle's machinery),
    // wrap to signed BIGINT so the ascending sid order matches
    // Spark's Long order, per-group bottom-64 via ROW_NUMBER, merged
    // pair rank for the estimator, and the exact inventory Jaccard
    // for the audit column.
    "q_corpus_resemblance" ->
      """WITH tk AS (
        |  SELECT source, list_filter(string_split(text, ' '),
        |    x -> len(x) > 0) AS t
        |  FROM documents),
        |shd AS (
        |  SELECT DISTINCT source AS grp, sh FROM (
        |    SELECT source,
        |      UNNEST(list_distinct(
        |        CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |             ELSE list_transform(range(1, len(t) - 1),
        |                    i -> array_to_string(list_slice(t, i, i + 2), ' '))
        |        END)) AS sh
        |    FROM tk WHERE len(t) > 0)),
        |hs AS (
        |  SELECT grp, CAST(list_reduce(
        |    list_prepend(14695981039346656037::HUGEINT,
        |      list_transform(range(octet_length(encode(sh))),
        |        i -> (strpos('0123456789ABCDEF', hex(encode(sh))[2*i+1]) * 16
        |            + strpos('0123456789ABCDEF', hex(encode(sh))[2*i+2]) - 17)::HUGEINT)),
        |    (acc, b) -> ((acc // 256) * 256 + xor((acc % 256)::BIGINT, b::BIGINT)::HUGEINT)
        |                * 1099511628211 % 18446744073709551616::HUGEINT) AS HUGEINT) AS hu
        |  FROM shd),
        |sidt AS (
        |  SELECT DISTINCT grp,
        |    CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
        |         THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS BIGINT) AS sid
        |  FROM hs),
        |sk AS (SELECT grp, sid FROM (
        |    SELECT grp, sid,
        |      ROW_NUMBER() OVER (PARTITION BY grp ORDER BY sid) AS rk
        |    FROM sidt) WHERE rk <= 256),
        |gs AS (SELECT DISTINCT grp FROM sk),
        |prs AS (SELECT a.grp AS g1, b.grp AS g2
        |        FROM gs a JOIN gs b ON a.grp < b.grp),
        |tag AS (
        |  SELECT p.g1, p.g2, s.sid, 1 AS in1, 0 AS in2
        |  FROM prs p JOIN sk s ON s.grp = p.g1
        |  UNION ALL
        |  SELECT p.g1, p.g2, s.sid, 0 AS in1, 1 AS in2
        |  FROM prs p JOIN sk s ON s.grp = p.g2),
        |mg AS (SELECT g1, g2, sid, MAX(in1) AS in1, MAX(in2) AS in2
        |       FROM tag GROUP BY 1, 2, 3),
        |mr AS (SELECT g1, g2, in1, in2,
        |         ROW_NUMBER() OVER (PARTITION BY g1, g2 ORDER BY sid) AS rk
        |       FROM mg),
        |est AS (
        |  SELECT g1, g2, CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(SUM(in1 * in2) AS BIGINT) AS n_common,
        |    CAST(SUM(in1) AS BIGINT) AS n_a,
        |    CAST(SUM(in2) AS BIGINT) AS n_b
        |  FROM mr WHERE rk <= 256 GROUP BY g1, g2),
        |szs AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS sz
        |        FROM sidt GROUP BY grp),
        |itr AS (SELECT a.grp AS g1, b.grp AS g2,
        |          CAST(COUNT(*) AS BIGINT) AS inter
        |        FROM sidt a JOIN sidt b ON a.sid = b.sid AND a.grp < b.grp
        |        GROUP BY 1, 2)
        |SELECT e.g1 AS src1, e.g2 AS src2, e.m, e.n_common,
        |  CAST(e.n_common * 1000000 // e.m AS BIGINT) AS j_est_ppm,
        |  CAST(COALESCE(i.inter * 1000000 // (sa.sz + sb.sz - i.inter), 0)
        |    AS BIGINT) AS j_exact_ppm,
        |  CAST(CASE WHEN e.n_a > 0 THEN e.n_common * 1000000 // e.n_a
        |       ELSE 0 END AS BIGINT) AS c_ab_est_ppm,
        |  CAST(COALESCE(i.inter * 1000000 // sa.sz, 0) AS BIGINT)
        |    AS c_ab_exact_ppm,
        |  CAST(CASE WHEN e.n_b > 0 THEN e.n_common * 1000000 // e.n_b
        |       ELSE 0 END AS BIGINT) AS c_ba_est_ppm,
        |  CAST(COALESCE(i.inter * 1000000 // sb.sz, 0) AS BIGINT)
        |    AS c_ba_exact_ppm
        |FROM est e
        |JOIN szs sa ON sa.grp = e.g1
        |JOIN szs sb ON sb.grp = e.g2
        |LEFT JOIN itr i ON i.g1 = e.g1 AND i.g2 = e.g2
        |ORDER BY src1, src2""".stripMargin,

    // L61: triangle replay over the exact pair CTE (reach is an unused
    // CTE here — DuckDB only evaluates referenced CTEs). The closing
    // edge reads the canonical id-ordered pair set, matching the
    // Scala wedge check exactly; orientation itself needs no replay
    // (any orientation finds the same triangle set).
    // L79: 8 unrolled peel rounds over the same pair CTE — each round
    // keeps edges whose BOTH endpoints still have degree >= 3. Peeling
    // is idempotent at fixpoint, so unused trailing rounds are no-ops;
    // DedupSpec pins that the gate graph converges well inside 8.
    "q_dup_kcore" -> {
      // each round references its predecessor ~3x, so the CTEs must be
      // MATERIALIZED — inlined they expand to 3^8 scans of the pair
      // join and exhaust the engine's file handles
      val rounds = (1 to 8).map { i =>
        s"""n$i AS MATERIALIZED (
           |  SELECT n FROM (SELECT id1 AS n FROM r${i - 1} UNION ALL
           |                 SELECT id2 FROM r${i - 1})
           |  GROUP BY n HAVING COUNT(*) >= 3),
           |r$i AS MATERIALIZED (
           |  SELECT id1, id2 FROM r${i - 1}
           |  WHERE id1 IN (SELECT n FROM n$i)
           |    AND id2 IN (SELECT n FROM n$i))""".stripMargin
      }.mkString(",\n")
      s"""${Shared.clusterReachCteSql},
        |r0 AS MATERIALIZED (SELECT id1, id2 FROM p),
        |$rounds
        |SELECT n AS doc_id, COUNT(*) AS core_deg
        |FROM (SELECT id1 AS n FROM r8 UNION ALL SELECT id2 FROM r8)
        |GROUP BY n ORDER BY doc_id""".stripMargin
    },

    // L80: 4 unrolled synchronous LPA rounds over the exact pair CTE.
    // Each round votes = neighbor labels + the node's own label
    // (self-vote), winner = max count with min-label ties — the same
    // two-step argmax the Scala rounds run, expressed as one
    // ROW_NUMBER pick. MATERIALIZED for the same reason as k-core:
    // each round references its predecessor twice.
    "q_dup_communities" -> {
      val rounds = (1 to 4).map { i =>
        s"""v$i AS MATERIALIZED (
           |  SELECT id, lab, COUNT(*) AS c FROM (
           |    SELECT e.u AS id, l.lab FROM e JOIN l${i - 1} l ON l.id = e.v
           |    UNION ALL SELECT id, lab FROM l${i - 1})
           |  GROUP BY id, lab),
           |l$i AS MATERIALIZED (
           |  SELECT id, lab FROM (
           |    SELECT id, lab,
           |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, lab ASC) AS rn
           |    FROM v$i) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""${Shared.clusterReachCteSql},
        |e AS MATERIALIZED (
        |  SELECT id1 AS u, id2 AS v FROM p
        |  UNION SELECT id2 AS u, id1 AS v FROM p),
        |l0 AS MATERIALIZED (SELECT DISTINCT u AS id, u AS lab FROM e),
        |$rounds
        |SELECT id AS doc_id, lab AS community FROM l4
        |ORDER BY doc_id""".stripMargin
    },

    "q_dup_triangles" ->
      s"""${Shared.clusterReachCteSql},
        |w AS (SELECT x.id1 AS a, x.id2 AS b, y.id2 AS c
        |      FROM p x JOIN p y ON x.id2 = y.id1),
        |tr AS (SELECT w.a, w.b, w.c FROM w
        |       JOIN p z ON z.id1 = w.a AND z.id2 = w.c),
        |nt AS (SELECT n, COUNT(*) AS n_tri FROM (
        |         SELECT a AS n FROM tr UNION ALL
        |         SELECT b FROM tr UNION ALL
        |         SELECT c FROM tr) GROUP BY n),
        |dg AS (SELECT n, COUNT(*) AS deg FROM (
        |         SELECT id1 AS n FROM p UNION ALL
        |         SELECT id2 FROM p) GROUP BY n)
        |SELECT dg.n AS doc_id, dg.deg, COALESCE(nt.n_tri, 0) AS n_tri,
        |  CAST(CASE WHEN dg.deg >= 2
        |       THEN COALESCE(nt.n_tri, 0) * 2000 // (dg.deg * (dg.deg - 1))
        |       ELSE 0 END AS BIGINT) AS clus_per_mille
        |FROM dg LEFT JOIN nt ON nt.n = dg.n
        |ORDER BY doc_id""".stripMargin,

    // L62: same quantize-then-int interpolation — each conditional
    // floor-quantized to 1e8 before the (2,1,1)/4 integer combine.
    "q_lm_trigram" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |uni AS (SELECT UNNEST(t) AS w FROM toks),
        |uc AS (SELECT w, COUNT(*) AS cu FROM uni GROUP BY w),
        |ntok AS (SELECT COUNT(*) AS n_tok FROM uni),
        |bg AS (
        |  SELECT t[i] AS prev, t[i+1] AS cur
        |  FROM toks, UNNEST(range(1, len(t))) AS u(i) WHERE len(t) >= 2),
        |bc AS (SELECT prev, cur, COUNT(*) AS cb FROM bg GROUP BY prev, cur),
        |tri AS (
        |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
        |  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3),
        |tc AS (SELECT w1, w2, w3, COUNT(*) AS ct FROM tri GROUP BY w1, w2, w3),
        |sc AS (
        |  SELECT tri.doc_id,
        |    (2 * CAST(FLOOR(CAST(tc.ct AS DOUBLE) / b12.cb * 100000000 + 0.5) AS BIGINT)
        |       + CAST(FLOOR(CAST(b23.cb AS DOUBLE) / u2.cu * 100000000 + 0.5) AS BIGINT)
        |       + CAST(FLOOR(CAST(u3.cu AS DOUBLE) / nt.n_tok * 100000000 + 0.5) AS BIGINT))
        |      // 4 AS s
        |  FROM tri
        |  JOIN tc USING (w1, w2, w3)
        |  JOIN bc b12 ON b12.prev = tri.w1 AND b12.cur = tri.w2
        |  JOIN bc b23 ON b23.prev = tri.w2 AND b23.cur = tri.w3
        |  JOIN uc u2 ON u2.w = tri.w2
        |  JOIN uc u3 ON u3.w = tri.w3
        |  CROSS JOIN ntok nt)
        |SELECT doc_id, COUNT(*) AS n_tri,
        |  CAST(SUM(s) // COUNT(*) AS BIGINT) AS lm3_q
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Computed from the PARQUET table — q_jsonl_roundtrip reads the
    // gzip-JSONL export (and q_csv_roundtrip the gzip-CSV export), so
    // a hash match proves the sink/source path is byte-lossless
    // (md5-exact text, id/char sums intact).
    "q_jsonl_roundtrip" -> roundtripOracleSql,

    // The banded-MinHash chain replayed end to end — signatures,
    // slices, size prefilter, verify (see minhashOracleSql).
    "q_dedup_minhash" -> minhashOracleSql,

    // Cross-set minhash probe replayed with the same signature
    // machinery (see minhashAgainstOracleSql).
    "q_dedup_against" -> minhashAgainstOracleSql,

    // The hyperplane-LSH bucketing replayed bit-exactly (see
    // lshOracleSql) — bits=4, dim=64, queries vec_id < 50, top-5.
    "q_ann_lsh" -> lshOracleSql(bits = 4, dim = 64, maxQueryId = 50L, k = 5),

    // The integer-quantized IVF chain replayed end to end — TRAINING
    // included (2 unrolled Lloyd iterations); see ivfOracleSql.
    // trainFraction 0.25 → md5-prefix threshold 0x40.
    "q_ann_ivf" -> ivfOracleSql(nClusters = 16, nProbe = 4, k = 5,
      iters = 2, maxQueryId = 50L, trainThrHex = "40"),

    // The banded embedding-LSH chain replayed bit-exactly (see
    // embedOracleSql).
    "q_dedup_embed" -> embedOracleSql,

    // Multi-probe LSH incl. the probe-order choice replayed (see
    // lshMultiProbeOracleSql).
    "q_ann_lsh_multi" ->
      lshMultiProbeOracleSql(bits = 4, dim = 64, nProbe = 4,
        maxQueryId = 50L, k = 5),

    // Brute-force SimHash pairs: FNV-1a 64 replayed byte-exactly (the
    // hex-nibble byte walk; products stay < 2^105, inside HUGEINT),
    // majority-vote fingerprint rebuilt with bit_or, then an all-pairs
    // hamming join — valid because the Spark side's pigeonhole banding
    // is complete at this radius.
    "q_dedup_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text,' '), x->len(x)>0)) AS tok
        |  FROM documents),
        |hashed AS (
        |  SELECT doc_id, CAST(list_reduce(
        |    list_prepend(14695981039346656037::HUGEINT,
        |      list_transform(range(octet_length(encode(tok))),
        |        i -> (strpos('0123456789ABCDEF', hex(encode(tok))[2*i+1]) * 16
        |            + strpos('0123456789ABCDEF', hex(encode(tok))[2*i+2]) - 17)::HUGEINT)),
        |    (acc, b) -> ((acc // 256) * 256 + xor((acc % 256)::BIGINT, b::BIGINT)::HUGEINT)
        |                * 1099511628211 % 18446744073709551616::HUGEINT) AS UBIGINT) AS h
        |  FROM toks),
        |bits AS (
        |  SELECT doc_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS c
        |  FROM hashed, range(64) t(j) GROUP BY doc_id, j),
        |fp AS (
        |  SELECT doc_id, bit_or(CASE WHEN c > 0 THEN 1::UBIGINT << j ELSE 0::UBIGINT END) AS fp
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2,
        |  CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 3
        |ORDER BY doc_id1, doc_id2""".stripMargin,

    // pHash replay: the same UTF-8 byte walk as the simhash oracle
    // (hex-nibble decode), block = (i·64)//n, bit via the
    // cross-multiplied mean comparison, then a brute-force hamming
    // join — valid because the banding is complete at the radius.
    "q_multimodal_phash" ->
      """WITH payloads AS (
        |  SELECT doc_id, encode(text) AS p FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, encode(text) AS p FROM documents),
        |bytes AS (
        |  SELECT doc_id, i,
        |    (strpos('0123456789ABCDEF', hex(p)[2*i+1]) * 16
        |     + strpos('0123456789ABCDEF', hex(p)[2*i+2]) - 17)::BIGINT AS b,
        |    octet_length(p)::BIGINT AS n
        |  FROM payloads, UNNEST(range(octet_length(p))) AS t(i)),
        |tot AS (SELECT doc_id, SUM(b) AS tb FROM bytes GROUP BY doc_id),
        |blocks AS (
        |  SELECT doc_id, (i * 64) // n AS blk, SUM(b) AS sb, COUNT(*) AS cb,
        |    ANY_VALUE(n) AS n
        |  FROM bytes GROUP BY doc_id, (i * 64) // n),
        |fp AS (
        |  SELECT b.doc_id,
        |    bit_or(CASE WHEN b.sb * b.n > t.tb * b.cb
        |                THEN 1::UBIGINT << CAST(b.blk AS INT)
        |                ELSE 0::UBIGINT END) AS fp
        |  FROM blocks b JOIN tot t USING (doc_id) GROUP BY b.doc_id)
        |SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2,
        |  CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 6
        |ORDER BY doc_id1, doc_id2""".stripMargin,

    "q_dedup_incremental" ->
      """WITH inc AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
        |ex AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 5 <> 0),
        |fresh AS (
        |  SELECT i.*, md5(i.text) AS h FROM inc i
        |  WHERE md5(i.text) NOT IN (SELECT h FROM ex)),
        |keep AS (SELECT h, MIN(doc_id) AS keep_id FROM fresh GROUP BY h)
        |SELECT f.doc_id, f.lang, f.source
        |FROM fresh f JOIN keep k ON f.doc_id = k.keep_id
        |ORDER BY f.doc_id""".stripMargin,

    "q_dedup_ngram" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, lang,
        |    list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |         ELSE list_transform(range(1, len(t) - 1),
        |                i -> array_to_string(list_slice(t, i, i + 2), ' ')) END) AS toks
        |  FROM toks)
        |SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2,
        |  FLOOR(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.toks, b.toks))) * 10000 + 0.5) / 10000 AS jac
        |FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE FLOOR(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.toks, b.toks))) * 10000 + 0.5) / 10000 >= 0.8
        |ORDER BY doc_id1, doc_id2""".stripMargin,

    "q_dedup_apply" ->
      """WITH toksets AS (
        |  SELECT doc_id, lang,
        |    list_filter(list_distinct(string_split(text, ' ')), x -> len(x) > 0) AS toks
        |  FROM documents),
        |drops AS (
        |  SELECT DISTINCT b.doc_id AS drop_id
        |  FROM toksets a JOIN toksets b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE FLOOR(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.toks, b.toks))) * 10000 + 0.5) / 10000 >= 0.9)
        |SELECT doc_id, lang, source FROM documents
        |WHERE doc_id NOT IN (SELECT drop_id FROM drops)
        |ORDER BY doc_id""".stripMargin,

    "q_pack_shards" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  CAST(FLOOR((cum - n_tokens) / 4096.0) AS BIGINT) AS shard
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_pack_curriculum" ->
      s"""WITH ${Shared.qualityStatsSql("doc_id")},
        |keyed AS (
        |  SELECT doc_id, CAST(tok AS BIGINT) AS n_tokens,
        |    10000 - ${Shared.q1e4Sql} AS order_key
        |  FROM stats),
        |c AS (
        |  SELECT doc_id, order_key, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY order_key, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM keyed)
        |SELECT doc_id, order_key, n_tokens,
        |  CAST(FLOOR((cum - n_tokens) / 4096.0) AS BIGINT) AS shard
        |FROM c ORDER BY doc_id""".stripMargin,

    // L82b: pair replay + the same drop rule (non-mutual drops
    // unconditionally, mutual keeps the min id).
    "q_dedup_contain_apply" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |shg AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |         ELSE list_transform(range(1, len(t) - 1),
        |                i -> array_to_string(list_slice(t, i, i + 2), ' ')) END)
        |      AS toks
        |  FROM tk WHERE len(t) > 0),
        |p AS (
        |  SELECT a.doc_id AS c1, b.doc_id AS c2
        |  FROM shg a JOIN shg b ON a.doc_id != b.doc_id
        |  WHERE len(list_intersect(a.toks, b.toks)) * 10 >= 9 * len(a.toks)),
        |drops AS (
        |  SELECT DISTINCT p.c1 AS drop_id FROM p
        |  LEFT JOIN p r ON r.c1 = p.c2 AND r.c2 = p.c1
        |  WHERE r.c1 IS NULL OR p.c1 > p.c2)
        |SELECT doc_id, lang, source FROM documents
        |WHERE doc_id NOT IN (SELECT drop_id FROM drops)
        |ORDER BY doc_id""".stripMargin,

    // L83: min-id shingle attribution replay.
    "q_novelty" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |shg AS (
        |  SELECT doc_id,
        |    UNNEST(list_distinct(
        |      CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |           ELSE list_transform(range(1, len(t) - 1),
        |                  i -> array_to_string(list_slice(t, i, i + 2), ' ')) END))
        |      AS sh
        |  FROM tk WHERE len(t) > 0),
        |own AS (SELECT sh, MIN(doc_id) AS owner FROM shg GROUP BY sh)
        |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
        |  CAST(SUM(CASE WHEN o.owner = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_novel,
        |  CAST(SUM(CASE WHEN o.owner = s.doc_id THEN 1 ELSE 0 END) * 1000000
        |    // COUNT(*) AS BIGINT) AS novelty_ppm
        |FROM shg s JOIN own o USING (sh)
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // L23b: desc-cumulative window replay (ties freq DESC, tok DESC —
    // the order the engine's ascending-scan reversal produces).
    "q_vocab_curve" ->
      """WITH tf AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        |    SELECT UNNEST(list_filter(string_split(text, ' '),
        |      x -> len(x) > 0)) AS tok
        |    FROM documents) GROUP BY tok),
        |r AS (
        |  SELECT freq,
        |    ROW_NUMBER() OVER (ORDER BY freq DESC, tok DESC) AS rk,
        |    SUM(freq) OVER (ORDER BY freq DESC, tok DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(freq) OVER () AS tot
        |  FROM tf),
        |t(target_ppm) AS (VALUES (CAST(500000 AS BIGINT)), (900000),
        |  (950000), (990000), (1000000))
        |SELECT t.target_ppm, MIN(r.rk) AS vocab_needed
        |FROM r JOIN t ON r.cum * 1000000 // r.tot >= t.target_ppm
        |GROUP BY t.target_ppm ORDER BY target_ppm""".stripMargin,

    "q_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT lang, UNNEST(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS tok
        |  FROM documents),
        |vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
        |    ORDER BY c DESC, tok ASC LIMIT 1000)),
        |j AS (
        |  SELECT t.lang, v.tok AS vt
        |  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok)
        |SELECT lang, COUNT(*) AS n_tokens,
        |  CAST(SUM(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  FLOOR(CAST(SUM(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) * 10000 + 0.5) / 10000 AS oov_rate
        |FROM j GROUP BY lang ORDER BY lang""".stripMargin,

    // q_pipeline_funnel oracle: each observe point's count replayed as
    // a CTE chain — the declarative twin of the accumulator funnel.
    // The composed chain replayed stage by stage: gopher flags ->
    // survivor jaccard components (recursive reach) -> winnow overlap
    // vs the eval slice -> per-lang mix thresholds -> prefix-sum shard
    // packing. Stage CTEs referenced more than once are MATERIALIZED
    // (un-hinted inlining re-evaluates the whole upstream chain per
    // reference).
    "q_pipeline_e2e" ->
      s"""WITH RECURSIVE ${CurationQueries.gopherMBodySql},
        |gop AS MATERIALIZED (
        |  SELECT doc_id FROM m
        |  WHERE n_words >= 50 AND n_words <= 100000
        |    AND sumlen >= n_words * 3 AND sumlen <= n_words * 10
        |    AND sym * 10 < n_words
        |    AND bullet * 10 < nl * 9 AND ell * 10 < nl * 3
        |    AND alpha * 5 >= n_words * 4
        |    AND stop >= 2),
        |tok AS MATERIALIZED (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0))
        |      AS BIGINT) AS n_tok
        |  FROM documents),
        |s1 AS MATERIALIZED (
        |  SELECT d.doc_id, d.lang, d.text
        |  FROM documents d JOIN gop USING (doc_id)),
        |toksets AS (
        |  SELECT doc_id, lang,
        |    list_filter(list_distinct(string_split(text, ' ')), x -> len(x) > 0) AS toks
        |  FROM s1),
        |p AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2
        |  FROM toksets a JOIN toksets b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE FLOOR(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.toks, b.toks))) * 10000 + 0.5) / 10000 >= 0.9),
        |edges AS (
        |  SELECT id1 AS src, id2 AS dst FROM p
        |  UNION
        |  SELECT id2 AS src, id1 AS dst FROM p),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id),
        |comp AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
        |s2 AS MATERIALIZED (
        |  SELECT * FROM s1
        |  WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> cluster)),
        |${Shared.winnowCteSql},
        |tr AS MATERIALIZED (
        |  SELECT f.doc_id, f.fps FROM f JOIN s2 USING (doc_id)
        |  WHERE f.doc_id % 23 <> 0),
        |ev AS MATERIALIZED (
        |  SELECT doc_id AS eval_id, fps AS efps FROM f WHERE doc_id % 23 = 0),
        |pa AS (SELECT doc_id, UNNEST(fps) AS fp FROM tr),
        |pb AS (SELECT eval_id, UNNEST(efps) AS fp FROM ev),
        |dfa AS (SELECT fp FROM pa GROUP BY fp HAVING COUNT(*) <= 16),
        |cand AS (
        |  SELECT DISTINCT a.doc_id, b.eval_id
        |  FROM pa a JOIN dfa USING (fp) JOIN pb b ON a.fp = b.fp),
        |flagged AS MATERIALIZED (
        |  SELECT DISTINCT c.doc_id FROM cand c
        |  JOIN tr t ON t.doc_id = c.doc_id
        |  JOIN ev e ON e.eval_id = c.eval_id
        |  WHERE len(list_intersect(t.fps, e.efps)) >= 8),
        |s3 AS MATERIALIZED (
        |  SELECT * FROM s2
        |  WHERE doc_id % 23 <> 0
        |    AND doc_id NOT IN (SELECT doc_id FROM flagged)),
        |nl AS (SELECT lang, COUNT(*) AS nlc FROM s3 GROUP BY lang),
        |ttc AS (SELECT COUNT(*) AS tt FROM s3),
        |thr AS (
        |  SELECT lang,
        |    CASE WHEN rate >= 1.0 THEN 'zzzz'
        |         ELSE printf('%04x', CAST(FLOOR(rate * 65536) AS INT)) END AS h
        |  FROM (SELECT lang,
        |          LEAST(1.0, (CASE WHEN lang = 'en' THEN 0.4 ELSE 0.15 END)
        |            * tt / nlc) AS rate
        |        FROM nl, ttc)),
        |s4 AS MATERIALIZED (
        |  SELECT s3.doc_id FROM s3 JOIN thr ON s3.lang = thr.lang
        |  WHERE SUBSTRING(md5(s3.text), 1, 4) < thr.h),
        |pc AS (
        |  SELECT s4.doc_id, tok.n_tok,
        |    CAST(SUM(tok.n_tok) OVER (ORDER BY s4.doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM s4 JOIN tok USING (doc_id)),
        |pershard AS MATERIALIZED (
        |  SELECT CAST(FLOOR((cum - n_tok) / 4096.0) AS BIGINT) AS shard,
        |    COUNT(*) AS sc, CAST(SUM(n_tok) AS BIGINT) AS st
        |  FROM pc GROUP BY 1)
        |SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage,
        |  CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_shards AS BIGINT) AS n_shards,
        |  CAST(max_shard_tokens AS BIGINT) AS max_shard_tokens
        |FROM (VALUES
        |  (0, 'ingest', (SELECT COUNT(*) FROM documents),
        |     (SELECT COALESCE(SUM(n_tok), 0) FROM tok), 0, 0),
        |  (1, 'gopher', (SELECT COUNT(*) FROM s1),
        |     (SELECT COALESCE(SUM(n_tok), 0) FROM s1 JOIN tok USING (doc_id)), 0, 0),
        |  (2, 'dedup_cluster', (SELECT COUNT(*) FROM s2),
        |     (SELECT COALESCE(SUM(n_tok), 0) FROM s2 JOIN tok USING (doc_id)), 0, 0),
        |  (3, 'decontam_winnow', (SELECT COUNT(*) FROM s3),
        |     (SELECT COALESCE(SUM(n_tok), 0) FROM s3 JOIN tok USING (doc_id)), 0, 0),
        |  (4, 'mix_target', (SELECT COUNT(*) FROM s4),
        |     (SELECT COALESCE(SUM(n_tok), 0) FROM s4 JOIN tok USING (doc_id)), 0, 0),
        |  (5, 'pack', (SELECT COALESCE(SUM(sc), 0) FROM pershard),
        |     (SELECT COALESCE(SUM(st), 0) FROM pershard),
        |     (SELECT COUNT(*) FROM pershard),
        |     (SELECT COALESCE(MAX(st), 0) FROM pershard))
        |) AS v(stage_idx, stage, n_docs, n_tokens, n_shards, max_shard_tokens)
        |ORDER BY stage_idx""".stripMargin,

    "q_pipeline_funnel" ->
      """WITH lang_en AS (SELECT * FROM documents WHERE lang = 'en'),
        |min_len AS (SELECT * FROM lang_en WHERE len(text) >= 200),
        |dedup AS (
        |  SELECT * FROM (
        |    SELECT doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
        |    FROM min_len) z
        |  WHERE rk = 1)
        |SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage,
        |  CAST(rows_out AS BIGINT) AS rows_out
        |FROM (VALUES
        |  (0, 'ingest',      (SELECT COUNT(*) FROM documents)),
        |  (1, 'lang_en',     (SELECT COUNT(*) FROM lang_en)),
        |  (2, 'min_len',     (SELECT COUNT(*) FROM min_len)),
        |  (3, 'exact_dedup', (SELECT COUNT(*) FROM dedup))
        |) AS v(stage_idx, stage, rows_out)
        |ORDER BY stage_idx""".stripMargin,

    "q_corpus_stats" ->
      s"""WITH ${Shared.qualityStatsSql("lang, source, text")},
        |q AS (
        |  SELECT lang, source, text,
        |    ${Shared.q1e4Sql} AS q1e4,
        |    CAST(tok AS BIGINT) AS tok
        |  FROM stats)
        |SELECT lang, source, COUNT(*) AS n_docs,
        |  COUNT(DISTINCT md5(text)) AS n_distinct,
        |  CAST(SUM(tok) AS BIGINT) AS sum_tokens,
        |  FLOOR(CAST(SUM(q1e4) AS DOUBLE) / COUNT(*) + 0.5) / 10000 AS avg_quality
        |FROM q GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "q_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |         ELSE list_transform(range(1, len(t) - 1),
        |                i -> array_to_string(list_slice(t, i, i + 2), ' ')) END) AS s
        |  FROM toks),
        |ev AS (SELECT DISTINCT UNNEST(s) AS es FROM sh WHERE doc_id % 23 = 0),
        |tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 23 <> 0),
        |m AS (
        |  SELECT tr.doc_id, CAST(len(tr.s) AS BIGINT) AS n_shingles,
        |    COUNT(*) AS n_matched
        |  FROM tr, UNNEST(tr.s) AS u(x) JOIN ev ON u.x = ev.es
        |  GROUP BY tr.doc_id, len(tr.s))
        |SELECT doc_id, n_shingles, CAST(n_matched AS BIGINT) AS n_matched
        |FROM m WHERE n_matched >= 5 ORDER BY doc_id""".stripMargin,

    // Multi-suite decontamination twin: (shingle, suite) inventory
    // from both slices, shared training-side unnest, (doc, suite)
    // counts — in LOCKSTEP with Decontaminate.contaminatedBySuite.
    "q_decontaminate_suites" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |         ELSE list_transform(range(1, len(t) - 1),
        |                i -> array_to_string(list_slice(t, i, i + 2), ' ')) END) AS s
        |  FROM toks),
        |inv AS (
        |  SELECT DISTINCT suite, es FROM (
        |    SELECT 'eval_a' AS suite, UNNEST(s) AS es FROM sh WHERE doc_id % 23 = 0
        |    UNION ALL
        |    SELECT 'eval_b' AS suite, UNNEST(s) AS es FROM sh WHERE doc_id % 29 = 0)),
        |tr AS (SELECT doc_id, s FROM sh
        |       WHERE doc_id % 23 <> 0 AND doc_id % 29 <> 0),
        |m AS (
        |  SELECT tr.doc_id, inv.suite,
        |    CAST(len(tr.s) AS BIGINT) AS n_shingles,
        |    COUNT(*) AS n_matched
        |  FROM tr, UNNEST(tr.s) AS u(x) JOIN inv ON u.x = inv.es
        |  GROUP BY tr.doc_id, inv.suite, len(tr.s))
        |SELECT doc_id, suite, n_shingles, CAST(n_matched AS BIGINT) AS n_matched
        |FROM m WHERE n_matched >= 5 ORDER BY doc_id, suite""".stripMargin,

    // Min-K% twin over the shared bigram-LM CTE: bottom ceil(n/5)
    // bigram probabilities per doc (row_number boundary ties are
    // sum-invariant — tied rows carry the same q), integer-div mean,
    // top-50 suspects. In LOCKSTEP with Decontaminate.minkScores.
    "q_mink_contamination" ->
      s"""WITH ${Shared.bigramScoredCteSql},
        |r AS (
        |  SELECT doc_id, q,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY q) AS rn,
        |    COUNT(*) OVER (PARTITION BY doc_id) AS n
        |  FROM scored),
        |m AS (
        |  SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_tokens,
        |    CAST(MAX((n * 1 + 4) // 5) AS BIGINT) AS k,
        |    CAST(CAST(SUM(q) AS HUGEINT) // COUNT(*) AS BIGINT) AS mink_q
        |  FROM r WHERE rn <= (n * 1 + 4) // 5
        |  GROUP BY doc_id)
        |SELECT doc_id, n_tokens, k, mink_q FROM m
        |ORDER BY mink_q DESC, doc_id ASC LIMIT 50""".stripMargin,

    // Exact-cosine replay of the semantic decontamination flagging:
    // same left-to-right dot/norm fold and ROUND(.,4) quantization as
    // the q_ann_bruteforce oracle, threshold on the rounded sim.
    "q_decontaminate_semantic" ->
      s"""WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |tr AS (SELECT vec_id AS id, vec AS tv FROM v WHERE vec_id % 23 <> 0),
        |ev AS (SELECT vec_id AS eval_id, vec AS evv FROM v WHERE vec_id % 23 = 0),
        |sims AS (
        |  SELECT id, eval_id,
        |    ${Shared.cosineSimSql("tv", "evv")} AS sim
        |  FROM tr CROSS JOIN ev),
        |hits AS (
        |  SELECT id, eval_id, sim,
        |    ROW_NUMBER() OVER (PARTITION BY id
        |                       ORDER BY sim DESC, eval_id ASC) AS rn
        |  FROM sims WHERE sim >= 0.4)
        |SELECT id, eval_id, sim FROM hits WHERE rn = 1 ORDER BY id""".stripMargin,

    // Budget selection replay: the shared quality CTE, the same
    // (quality desc, id) per-source order, and a ROWS-framed running
    // token sum cut at the budget.
    "q_budget_select" ->
      s"""WITH ${Shared.qualityStatsSql("doc_id, source")},
        |sel AS (
        |  SELECT doc_id, source, ${Shared.q1e4Sql} AS q1e4,
        |    CAST(tok AS BIGINT) AS n_tok
        |  FROM stats),
        |c AS (
        |  SELECT doc_id, source, q1e4, n_tok,
        |    CAST(SUM(n_tok) OVER (PARTITION BY source
        |      ORDER BY q1e4 DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_tokens
        |  FROM sel)
        |SELECT doc_id, source, q1e4, n_tok, cum_tokens FROM c
        |WHERE cum_tokens <= 1000 ORDER BY doc_id""".stripMargin,

    "q_pack_shuffled" ->
      """WITH t AS (
        |  SELECT doc_id, md5(text) AS shuffle_key,
        |    CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shuffle_key, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY shuffle_key, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM t)
        |SELECT doc_id, shuffle_key, n_tokens,
        |  CAST(FLOOR((cum - n_tokens) / 4096.0) AS BIGINT) AS shard
        |FROM c ORDER BY doc_id""".stripMargin,

    // Same component oracle as the cluster twins; the split CASE
    // replays Curate.leakageSafeSplit's thresholds (floor(0.8·65536) =
    // 0xcccc, floor(0.9·65536) = 0xe666) over md5 of the cluster key.
    // L26c: both assignments replayed against the exact pair CTE —
    // the cluster-atomic matrix must come back all-diagonal.
    "q_split_leakage" ->
      s"""${Shared.clusterReachCteSql},
        |comp AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
        |asg_naive AS (
        |  SELECT doc_id, 'fold' || CAST(
        |    (strpos('0123456789abcdef', substring(md5(text), 1, 1)) - 1) % 4
        |    AS VARCHAR) AS grp
        |  FROM documents),
        |asg_safe AS (
        |  SELECT d.doc_id,
        |    CASE WHEN SUBSTRING(md5(CAST(COALESCE(c.cluster, d.doc_id)
        |                AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
        |         WHEN SUBSTRING(md5(CAST(COALESCE(c.cluster, d.doc_id)
        |                AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
        |         ELSE 'test' END AS grp
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
        |m AS (
        |  SELECT 'fold_md5' AS method,
        |    LEAST(a.grp, b.grp) AS grp_a, GREATEST(a.grp, b.grp) AS grp_b
        |  FROM p JOIN asg_naive a ON p.id1 = a.doc_id
        |         JOIN asg_naive b ON p.id2 = b.doc_id
        |  UNION ALL
        |  SELECT 'cluster_atomic',
        |    LEAST(a.grp, b.grp), GREATEST(a.grp, b.grp)
        |  FROM p JOIN asg_safe a ON p.id1 = a.doc_id
        |         JOIN asg_safe b ON p.id2 = b.doc_id)
        |SELECT method, grp_a, grp_b, COUNT(*) AS n_pairs,
        |  grp_a <> grp_b AS is_cross
        |FROM m GROUP BY method, grp_a, grp_b
        |ORDER BY method, grp_a, grp_b""".stripMargin,

    "q_split_leakage_safe" ->
      s"""${Shared.clusterReachCteSql},
        |comp AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
        |j AS (
        |  SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
        |SELECT doc_id, CAST(cluster AS BIGINT) AS cluster,
        |  CASE WHEN SUBSTRING(md5(CAST(cluster AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
        |       WHEN SUBSTRING(md5(CAST(cluster AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM j ORDER BY doc_id""".stripMargin,

    "q_dedup_cluster" ->
      s"""${Shared.clusterReachCteSql}
        |SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,

    "q_dedup_cluster_apply" ->
      s"""${Shared.clusterReachCteSql},
        |comp AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id)
        |SELECT d.doc_id, d.lang, d.source FROM documents d
        |WHERE d.doc_id NOT IN (SELECT id FROM comp WHERE id <> cluster)
        |ORDER BY d.doc_id""".stripMargin,

    // Same transitive-closure component oracle as the other cluster
    // twins, with the survivor chosen by (n_chars desc, doc_id asc)
    // per component instead of min id.
    "q_dedup_cluster_best" ->
      s"""${Shared.clusterReachCteSql},
        |comp AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
        |best AS (
        |  SELECT cluster,
        |    first(doc_id ORDER BY n_chars DESC, doc_id ASC) AS keep_id
        |  FROM comp JOIN documents d ON comp.id = d.doc_id
        |  GROUP BY cluster)
        |SELECT d.doc_id, d.lang, d.source FROM documents d
        |WHERE d.doc_id NOT IN (
        |  SELECT id FROM comp WHERE id NOT IN (SELECT keep_id FROM best))
        |ORDER BY d.doc_id""".stripMargin,

    "q_ann_grouped" ->
      s"""WITH v AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, label AS grp, vec AS qv FROM v WHERE vec_id < 50),
        |sims AS (
        |  SELECT query_id, grp, vec_id AS nn_id,
        |    ${Shared.cosineSimSql("qv", "vec")} AS sim
        |  FROM v JOIN q ON v.label = q.grp WHERE vec_id <> query_id),
        |ranked AS (
        |  SELECT query_id, grp, nn_id, sim,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, nn_id ASC) AS rank
        |  FROM sims)
        |SELECT query_id, grp, rank, nn_id, sim FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "q_ann_bruteforce" ->
      s"""WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, vec AS qv FROM v WHERE vec_id < 5),
        |sims AS (
        |  SELECT query_id, vec_id AS nn_id,
        |    ${Shared.cosineSimSql("qv", "vec")} AS sim
        |  FROM v CROSS JOIN q WHERE vec_id <> query_id),
        |ranked AS (
        |  SELECT query_id, nn_id, sim,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, nn_id ASC) AS rank
        |  FROM sims)
        |SELECT query_id, rank, nn_id, sim FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // L7i: the oracle REBUILDS the md5-derived ±1 JL matrix (a pure
    // function of (i, j) — no opaque literal to trust), projects the
    // 2^16-quantized vectors, and replays both integer squared-L2
    // rankings. Every value is an integral double < 2^53, so SUM
    // order never matters and the lossy chain hash-matches exactly.
    "q_ann_jl" ->
      s"""WITH v AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> FLOOR(CAST(x AS DOUBLE) * 65536 + 0.5)) AS vq
        |  FROM embeddings),
        |mat AS (
        |  SELECT j.j AS j, i.i AS i,
        |    CASE WHEN substr(md5(CAST(i.i AS VARCHAR) || ':' ||
        |                         CAST(j.j AS VARCHAR)), 1, 1) < '8'
        |         THEN 1.0 ELSE -1.0 END AS s
        |  FROM range(16) j(j), range(64) i(i)),
        |p AS (
        |  SELECT vec_id, j, SUM(vq[i + 1] * s) AS pj
        |  FROM v, mat GROUP BY vec_id, j),
        |pv AS (SELECT vec_id, list(pj ORDER BY j) AS pvec
        |       FROM p GROUP BY vec_id),
        |b AS (SELECT v.vec_id, v.vq, pv.pvec FROM v JOIN pv USING (vec_id)),
        |q AS (SELECT vec_id AS query_id, vq AS q_vq, pvec AS q_pv
        |      FROM b WHERE vec_id < 8),
        |fulld AS (
        |  SELECT query_id, b.vec_id AS nn_id,
        |    list_sum(list_transform(list_zip(q.q_vq, b.vq),
        |      x -> (x[1] - x[2]) * (x[1] - x[2]))) AS dist
        |  FROM b CROSS JOIN q WHERE b.vec_id <> q.query_id),
        |fullk AS (
        |  SELECT query_id, nn_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |                       ORDER BY dist ASC, nn_id ASC) AS rk
        |  FROM fulld),
        |projd AS (
        |  SELECT query_id, b.vec_id AS nn_id,
        |    list_sum(list_transform(list_zip(q.q_pv, b.pvec),
        |      x -> (x[1] - x[2]) * (x[1] - x[2]))) AS dist
        |  FROM b CROSS JOIN q WHERE b.vec_id <> q.query_id),
        |projk AS (
        |  SELECT query_id, nn_id, dist,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |                       ORDER BY dist ASC, nn_id ASC) AS rk
        |  FROM projd),
        |hits AS (SELECT query_id, nn_id FROM fullk WHERE rk <= 10)
        |SELECT p.query_id, p.rk AS rank, p.nn_id,
        |  CAST(FLOOR(p.dist + 0.5) AS BIGINT) AS dist_proj,
        |  CASE WHEN h.nn_id IS NOT NULL THEN 1 ELSE 0 END AS hit
        |FROM projk p LEFT JOIN hits h
        |  ON p.query_id = h.query_id AND p.nn_id = h.nn_id
        |WHERE p.rk <= 10
        |ORDER BY p.query_id, rank""".stripMargin,

    // Same exact-cosine chain with the label-exclusion predicate in
    // the cross join — in LOCKSTEP with Ann.hardNegatives.
    "q_hard_negatives" ->
      s"""WITH v AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, label AS q_label, vec AS qv
        |      FROM v WHERE vec_id < 25),
        |sims AS (
        |  SELECT query_id, vec_id AS neg_id, label AS neg_label,
        |    ${Shared.cosineSimSql("qv", "vec")} AS sim
        |  FROM v CROSS JOIN q WHERE label <> q_label),
        |ranked AS (
        |  SELECT query_id, neg_id, neg_label, sim,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, neg_id ASC) AS rank
        |  FROM sims)
        |SELECT query_id, rank, neg_id, neg_label, sim
        |FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // Bitext-margin replay: both directional exact-cosine top-4
    // chains, integer 1e4-sim neighborhood sums, HUGEINT µ-margin
    // floor-div (positive by the sim > 0 guard, so DuckDB's floor //
    // agrees with Spark's truncating div), per-source argmax — in
    // LOCKSTEP with Ann.marginPairs.
    "q_bitext_margin" ->
      s"""WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |av AS (SELECT vec_id AS id, vec FROM v WHERE vec_id % 2 = 0),
        |bv AS (SELECT vec_id AS id, vec FROM v WHERE vec_id % 2 <> 0),
        |fsims AS (
        |  SELECT av.id AS query_id, bv.id AS nn_id,
        |    ${Shared.cosineSimSql("av.vec", "bv.vec")} AS sim
        |  FROM av CROSS JOIN bv),
        |fk AS (
        |  SELECT * FROM (
        |    SELECT query_id, nn_id, sim,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |                         ORDER BY sim DESC, nn_id ASC) AS rank
        |    FROM fsims) WHERE rank <= 4),
        |bsims AS (
        |  SELECT bv.id AS query_id, av.id AS nn_id,
        |    ${Shared.cosineSimSql("bv.vec", "av.vec")} AS sim
        |  FROM bv CROSS JOIN av),
        |bk AS (
        |  SELECT * FROM (
        |    SELECT query_id, nn_id, sim,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |                         ORDER BY sim DESC, nn_id ASC) AS rank
        |    FROM bsims) WHERE rank <= 4),
        |sf AS (SELECT query_id AS fid,
        |         SUM(CAST(floor(sim * 10000 + 0.5) AS BIGINT)) AS sum_f,
        |         COUNT(*) AS k_f
        |       FROM fk GROUP BY 1),
        |sb AS (SELECT query_id AS bid,
        |         SUM(CAST(floor(sim * 10000 + 0.5) AS BIGINT)) AS sum_b,
        |         COUNT(*) AS k_b
        |       FROM bk GROUP BY 1),
        |scored AS (
        |  SELECT fk.query_id, fk.nn_id, fk.sim,
        |    CAST((CAST(floor(fk.sim * 10000 + 0.5) AS HUGEINT)
        |          * (k_f + k_b) * 1000000)
        |      // (sum_f + sum_b) AS BIGINT) AS margin_q
        |  FROM fk JOIN sf ON fk.query_id = sf.fid
        |          JOIN sb ON fk.nn_id = sb.bid
        |  WHERE sum_f + sum_b > 0 AND fk.sim > 0),
        |best AS (
        |  SELECT query_id, nn_id, sim, margin_q,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |                       ORDER BY margin_q DESC, nn_id ASC) AS rn
        |  FROM scored)
        |SELECT query_id AS src_id, nn_id AS tgt_id, sim, margin_q
        |FROM best WHERE rn = 1 AND margin_q >= 1000000
        |ORDER BY src_id""".stripMargin,

    // kNN vote replay: exact cosine ranking (same ROUND(.,4) +
    // (sim desc, nn_id) order as q_ann_bruteforce), top-5 votes
    // grouped per query, argmax on (votes desc, label asc).
    "q_knn_classify" ->
      s"""WITH v AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, label AS true_label, vec AS qv
        |      FROM v WHERE vec_id % 20 = 0),
        |c AS (SELECT vec_id AS nn_id, label AS nn_label, vec
        |      FROM v WHERE vec_id % 20 <> 0),
        |sims AS (
        |  SELECT query_id, nn_id, nn_label,
        |    ${Shared.cosineSimSql("qv", "vec")} AS sim
        |  FROM c CROSS JOIN q),
        |nn AS (
        |  SELECT query_id, nn_label,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, nn_id ASC) AS rank
        |  FROM sims QUALIFY rank <= 5),
        |votes AS (
        |  SELECT query_id, nn_label, CAST(COUNT(*) AS BIGINT) AS n_votes
        |  FROM nn GROUP BY query_id, nn_label),
        |best AS (
        |  SELECT query_id, nn_label AS pred_label, n_votes,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |                       ORDER BY n_votes DESC, nn_label ASC) AS rn
        |  FROM votes)
        |SELECT b.query_id, b.pred_label, b.n_votes, q.true_label,
        |  b.pred_label = q.true_label AS correct
        |FROM best b JOIN q USING (query_id) WHERE rn = 1
        |ORDER BY b.query_id""".stripMargin,

    "q_retrieval" ->
      s"""WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, vec AS qv FROM v WHERE vec_id < 5),
        |sims AS (
        |  SELECT query_id, vec_id AS nn_id,
        |    ${Shared.cosineSimSql("qv", "vec")} AS sim
        |  FROM v CROSS JOIN q WHERE vec_id <> query_id),
        |ranked AS (
        |  SELECT query_id, nn_id, sim,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, nn_id ASC) AS rank
        |  FROM sims)
        |SELECT r.query_id, r.rank, r.nn_id, r.sim, d.lang, d.source
        |FROM ranked r JOIN documents d ON r.nn_id = d.doc_id
        |WHERE r.rank <= 3
        |ORDER BY r.query_id, r.rank""".stripMargin,

    // L119: the packing replay — same brute-force ranking to k=10,
    // whitespace token counts, per-query cumulative window, prefix
    // filter at 300.
    "q_retrieval_pack" ->
      s"""WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, vec AS qv FROM v WHERE vec_id < 5),
        |sims AS (
        |  SELECT query_id, vec_id AS nn_id,
        |    ${Shared.cosineSimSql("qv", "vec")} AS sim
        |  FROM v CROSS JOIN q WHERE vec_id <> query_id),
        |ranked AS (
        |  SELECT query_id, nn_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, nn_id ASC) AS rank
        |  FROM sims),
        |toks AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0))
        |      AS BIGINT) AS tokens
        |  FROM documents),
        |hits AS (
        |  SELECT r.query_id, r.rank, r.nn_id,
        |    t.tokens
        |  FROM ranked r JOIN toks t ON r.nn_id = t.doc_id
        |  WHERE r.rank <= 10),
        |cum AS (
        |  SELECT query_id, rank, nn_id, tokens,
        |    CAST(SUM(tokens) OVER (PARTITION BY query_id ORDER BY rank)
        |      AS BIGINT) AS cum_tokens
        |  FROM hits)
        |SELECT query_id, rank, nn_id, tokens, cum_tokens
        |FROM cum WHERE cum_tokens <= 300
        |ORDER BY query_id, rank""".stripMargin,

    "q_lang_id" -> langMarkerSql,
    "q_label_agreement" -> labelAgreementSql,

    // L110: the PII replay — same synthesis, same three regexes in
    // the same sequential count-then-redact order (RE2 reads the
    // classes identically to Java regex).
    "q_pii_scan" ->
      """WITH p AS (
        |  SELECT o_orderkey AS order_key,
        |    'contact user' || CAST(o_custkey AS VARCHAR) || '@example.' ||
        |    CASE o_orderkey % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
        |         ELSE 'net' END ||
        |    ' from 10.' || CAST(o_orderkey % 256 AS VARCHAR) || '.' ||
        |    CAST(o_custkey % 256 AS VARCHAR) || '.' ||
        |    CAST(o_orderkey % 100 AS VARCHAR) ||
        |    CASE WHEN o_orderkey % 4 = 0
        |         THEN ' call +' ||
        |           CAST(o_orderkey % 900000000 + 100000000 AS VARCHAR)
        |         ELSE '' END ||
        |    ' amount ' || CAST(o_orderkey % 997 AS VARCHAR) || ' ok'
        |      AS ptext
        |  FROM orders),
        |s1 AS (
        |  SELECT order_key,
        |    CAST(len(regexp_extract_all(ptext,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |      AS BIGINT) AS n_email,
        |    regexp_replace(ptext,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '<EMAIL>', 'g') AS t1
        |  FROM p),
        |s2 AS (
        |  SELECT order_key, n_email,
        |    CAST(len(regexp_extract_all(t1,
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
        |      AS BIGINT) AS n_ip,
        |    regexp_replace(t1,
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
        |      '<IP>', 'g') AS t2
        |  FROM s1)
        |SELECT order_key, n_email, n_ip,
        |  CAST(len(regexp_extract_all(t2, '\+[0-9]{7,15}')) AS BIGINT)
        |    AS n_phone,
        |  regexp_replace(t2, '\+[0-9]{7,15}', '<PHONE>', 'g') AS redacted
        |FROM s2 ORDER BY order_key""".stripMargin,

    "q_text_quality" ->
      s"""WITH ${Shared.qualityStatsSql("doc_id")}
        |SELECT doc_id, tok AS n_tokens,
        |  ${Shared.qualityDoubleSql} AS quality,
        |  (${Shared.qualityDoubleSql} >= 0.5) AS keep
        |FROM stats ORDER BY doc_id""".stripMargin,

    // L102: readability replay — same three regex counts (vowel runs,
    // vowel-bearing tokens, sentence-terminator runs) and the same
    // integer-div milli rendering of the two Flesch formulas.
    "q_readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> len(x) > 0)) AS BIGINT) AS n_words,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS runs,
        |    CAST(len(regexp_extract_all(lower(text),
        |      '[^ ]*[aeiouy][^ ]*')) AS BIGINT) AS wv,
        |    GREATEST(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
        |      AS BIGINT)) AS n_sentences
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_words, runs + (n_words - wv) AS n_syllables,
        |    n_sentences
        |  FROM c)
        |SELECT doc_id, n_words, n_syllables, n_sentences,
        |  CASE WHEN n_words > 0 THEN
        |    (390 * n_words) // n_sentences
        |      + (11800 * n_syllables) // n_words - 15590 END AS fk_milli,
        |  CASE WHEN n_words > 0 THEN
        |    206835 - (10150 * n_words) // n_sentences
        |      - (84600 * n_syllables) // n_words END AS ease_milli
        |FROM r ORDER BY doc_id""".stripMargin,

    "q_text_redact" ->
      """SELECT regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS redacted,
        |  COUNT(*) AS n
        |FROM events GROUP BY redacted ORDER BY redacted""".stripMargin,

    // L13b: synthesis in lockstep with the Spark side (16-digit
    // L101: the secret-scan replay — same synthetic config lines, then
    // per token: codepoint length, digit/letter regex classes, Simpson
    // Σc² via nested list lambdas, the flag rule, and the redacted
    // rebuild via an i-ordered list aggregate.
    "q_secret_scan" ->
      """WITH p AS (
        |  SELECT o_orderkey AS order_key,
        |    'auth user' || CAST(o_custkey AS VARCHAR) || ' token ' ||
        |    md5(CAST(o_orderkey AS VARCHAR)) ||
        |    CASE WHEN o_orderkey % 4 = 0
        |         THEN ' backup ' || md5(CAST(o_custkey AS VARCHAR))
        |         ELSE '' END ||
        |    CASE WHEN o_orderkey % 5 = 0
        |         THEN ' ref ' || repeat('x', 18) || '99' ELSE '' END ||
        |    ' amount ' || CAST(o_orderkey % 997 AS VARCHAR) ||
        |    ' status ok' AS ptext
        |  FROM orders),
        |tl AS (
        |  SELECT order_key,
        |    list_filter(string_split_regex(ptext, '[ \t\n\r\f\x0B]'),
        |      x -> len(x) > 0) AS toks
        |  FROM p),
        |tk AS (
        |  SELECT order_key, i, toks[i] AS t
        |  FROM tl, UNNEST(range(1, len(toks) + 1)) AS u(i)),
        |fl AS (
        |  SELECT order_key, i, t, length(t) AS n,
        |    CAST(list_aggregate(list_transform(
        |      list_distinct(regexp_extract_all(t, '.')),
        |      c -> CAST(len(list_filter(regexp_extract_all(t, '.'),
        |             x -> x = c)) AS BIGINT)
        |           * len(list_filter(regexp_extract_all(t, '.'),
        |             x -> x = c))), 'sum') AS BIGINT) AS ss,
        |    regexp_matches(t, '[0-9]') AS hd,
        |    regexp_matches(t, '[a-zA-Z]') AS hl
        |  FROM tk),
        |fg AS (
        |  SELECT order_key, i, t, n,
        |    (n >= 20 AND hd AND hl
        |      AND ss * 1000000 // (n * n) <= 250000) AS flagged
        |  FROM fl)
        |SELECT order_key, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN flagged THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_secrets,
        |  CAST(SUM(CASE WHEN flagged THEN n ELSE 0 END) AS BIGINT)
        |    AS n_masked_cp,
        |  array_to_string(
        |    list(CASE WHEN flagged THEN '[SECRET]' ELSE t END ORDER BY i),
        |    ' ') AS redacted
        |FROM fg GROUP BY order_key ORDER BY order_key""".stripMargin,

    // candidate per order), then the detector replayed: distinct
    // 13-19-digit runs, Luhn sum via positional digit unnest (double
    // every second from the RIGHT, −9 past 9), mask to last4.
    "q_pan_luhn" ->
      """WITH src AS (
        |  SELECT o_orderkey,
        |    'pay card=' ||
        |      lpad(CAST((o_orderkey * 1000003 + o_custkey) %
        |                1000000000000000 AS VARCHAR), 15, '0') ||
        |      CAST(o_orderkey % 10 AS VARCHAR) || ';' AS ptext
        |  FROM orders),
        |cands AS (
        |  SELECT o_orderkey, UNNEST(list_distinct(
        |    regexp_extract_all(ptext, '[0-9]{13,19}'))) AS cand
        |  FROM src),
        |dig AS (
        |  SELECT o_orderkey, cand, len(cand) AS L, i,
        |    CAST(cand[i] AS BIGINT) AS d
        |  FROM cands, UNNEST(range(1, len(cand) + 1)) AS u(i)),
        |lu AS (
        |  SELECT o_orderkey, cand,
        |    SUM(CASE WHEN (L - i) % 2 = 1
        |        THEN CASE WHEN 2 * d > 9 THEN 2 * d - 9 ELSE 2 * d END
        |        ELSE d END) AS s
        |  FROM dig GROUP BY o_orderkey, cand, L)
        |SELECT o_orderkey AS order_key,
        |  repeat('*', len(cand) - 4) || substr(cand, len(cand) - 3, 4)
        |    AS masked,
        |  (s % 10 = 0) AS luhn_valid
        |FROM lu ORDER BY order_key, masked""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_bpe_tokens,
        |  LENGTH(text) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_sample_balanced" ->
      """WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        |mn AS (SELECT MIN(n) AS mn FROM counts),
        |ranked AS (
        |  SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang FROM ranked, mn WHERE rn <= mn
        |ORDER BY doc_id""".stripMargin,

    "q_sample_weighted" ->
      """SELECT source, COUNT(*) AS n_kept FROM documents
        |WHERE SUBSTRING(md5(text), 1, 2) <
        |  CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 'g0'
        |       WHEN source IN ('src5','src6','src7','src8','src9') THEN '80'
        |       ELSE '40' END
        |GROUP BY source ORDER BY source""".stripMargin,

    // L98 twin: the md5 nibble fold rebuilds h, one IEEE double
    // division rebuilds the priority, the same (priority DESC, key)
    // rank keeps k, and τ = rank k+1 calibrates the estimates.
    "q_priority_sample" ->
      """WITH base AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, 9),
        |        i -> CAST(strpos('0123456789abcdef',
        |          substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1
        |          AS BIGINT))),
        |      (acc, d) -> acc * 16 + d) + 1 AS h
        |  FROM documents WHERE n_chars > 0),
        |p AS (
        |  SELECT doc_id, w,
        |    CAST(w AS DOUBLE) * 4294967296.0 / h AS priority
        |  FROM base),
        |r AS (
        |  SELECT doc_id, w, priority,
        |    ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id ASC) AS rk
        |  FROM p),
        |tau AS (
        |  SELECT COALESCE(MAX(CASE WHEN rk = 101 THEN priority END), 0.0) AS t
        |  FROM r WHERE rk <= 101)
        |SELECT r.doc_id, r.w, r.priority, CAST(r.rk AS BIGINT) AS rk,
        |  GREATEST(CAST(r.w AS DOUBLE), tau.t) AS est
        |FROM r, tau WHERE r.rk <= 100 ORDER BY rk""".stripMargin,

    "q_sample_det" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN SUBSTRING(md5(text), 1, 2) < '20' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_sampled
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_lm_score" ->
      s"""WITH ${Shared.bigramScoredCteSql}
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  FLOOR(CAST(SUM(q) AS DOUBLE) / COUNT(*) / 100.0 + 0.5) / 1000000 AS lm_score
        |FROM scored GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q_lm_score_topk" ->
      s"""WITH ${Shared.bigramCteSql},
        |model AS (
        |  SELECT prev, cur,
        |    CAST(FLOOR(CAST(cpc AS DOUBLE) / cp * 100000000 + 0.5) AS BIGINT) AS q
        |  FROM bc JOIN pc USING (prev)
        |  ORDER BY cpc DESC, prev ASC, cur ASC LIMIT 1000),
        |scored AS (
        |  SELECT p.doc_id, COALESCE(m.q, 100) AS qq
        |  FROM pairs p LEFT JOIN model m USING (prev, cur))
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  FLOOR(CAST(SUM(qq) AS DOUBLE) / COUNT(*) / 100.0 + 0.5) / 1000000 AS lm_score
        |FROM scored GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q_text_chunk" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |chunks AS (
        |  SELECT doc_id,
        |    UNNEST(range(0, GREATEST(1, (len(t) - 8 + 23) // 24))) AS chunk_idx, t
        |  FROM toks)
        |SELECT doc_id, chunk_idx,
        |  CAST(len(list_slice(t, chunk_idx * 24 + 1, chunk_idx * 24 + 32)) AS BIGINT)
        |    AS n_chunk_tokens,
        |  array_to_string(list_slice(t, chunk_idx * 24 + 1, chunk_idx * 24 + 32), ' ')
        |    AS chunk_text
        |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(regexp_extract_all(text, '.'),
        |        c -> CAST(unicode(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Byte-walk replay of the stub feature extractor: per-byte rows
    // from the hex-nibble transform, filtered counts per bin, exact
    // integer/LEFT-JOIN handling of empty payloads.
    // Alignment twin: byte-histogram vector (features oracle's walk)
    // vs dense 8-dim hashed-bow, cosine with the kernel's zero-norm
    // → 0.0 rule, same ROUND(.,4) quantization, threshold keep.
    "q_multimodal_align" ->
      """WITH hx AS (
        |  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
        |  FROM documents),
        |bytes AS (
        |  SELECT doc_id, n, unnest(list_transform(range(n),
        |    i -> strpos('0123456789ABCDEF', h[2*i+1]) * 16
        |       + strpos('0123456789ABCDEF', h[2*i+2]) - 17)) AS b
        |  FROM hx),
        |agg AS (
        |  SELECT doc_id, ANY_VALUE(n) AS n,
        |    COUNT(*) FILTER (b % 8 = 0) AS c0, COUNT(*) FILTER (b % 8 = 1) AS c1,
        |    COUNT(*) FILTER (b % 8 = 2) AS c2, COUNT(*) FILTER (b % 8 = 3) AS c3,
        |    COUNT(*) FILTER (b % 8 = 4) AS c4, COUNT(*) FILTER (b % 8 = 5) AS c5,
        |    COUNT(*) FILTER (b % 8 = 6) AS c6, COUNT(*) FILTER (b % 8 = 7) AS c7
        |  FROM bytes GROUP BY doc_id),
        |hist AS (
        |  SELECT doc_id,
        |    [CAST(c0 AS DOUBLE) / GREATEST(n, 1), CAST(c1 AS DOUBLE) / GREATEST(n, 1),
        |     CAST(c2 AS DOUBLE) / GREATEST(n, 1), CAST(c3 AS DOUBLE) / GREATEST(n, 1),
        |     CAST(c4 AS DOUBLE) / GREATEST(n, 1), CAST(c5 AS DOUBLE) / GREATEST(n, 1),
        |     CAST(c6 AS DOUBLE) / GREATEST(n, 1), CAST(c7 AS DOUBLE) / GREATEST(n, 1)]
        |    AS hv
        |  FROM agg),
        |ttoks AS (
        |  SELECT doc_id,
        |    UNNEST(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS tok
        |  FROM documents),
        |thash AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(regexp_extract_all(tok, '.'),
        |          c -> CAST(unicode(c) AS BIGINT))),
        |      (a, b) -> (a * 31 + b) % 1000000007) AS h
        |  FROM ttoks),
        |tvec AS (
        |  SELECT doc_id,
        |    [
        |     CAST(COALESCE(SUM(CASE WHEN h % 8 = 0 THEN CASE WHEN (h // 8) % 2 = 0 THEN 1 ELSE -1 END END), 0) AS DOUBLE),
        |     CAST(COALESCE(SUM(CASE WHEN h % 8 = 1 THEN CASE WHEN (h // 8) % 2 = 0 THEN 1 ELSE -1 END END), 0) AS DOUBLE),
        |     CAST(COALESCE(SUM(CASE WHEN h % 8 = 2 THEN CASE WHEN (h // 8) % 2 = 0 THEN 1 ELSE -1 END END), 0) AS DOUBLE),
        |     CAST(COALESCE(SUM(CASE WHEN h % 8 = 3 THEN CASE WHEN (h // 8) % 2 = 0 THEN 1 ELSE -1 END END), 0) AS DOUBLE),
        |     CAST(COALESCE(SUM(CASE WHEN h % 8 = 4 THEN CASE WHEN (h // 8) % 2 = 0 THEN 1 ELSE -1 END END), 0) AS DOUBLE),
        |     CAST(COALESCE(SUM(CASE WHEN h % 8 = 5 THEN CASE WHEN (h // 8) % 2 = 0 THEN 1 ELSE -1 END END), 0) AS DOUBLE),
        |     CAST(COALESCE(SUM(CASE WHEN h % 8 = 6 THEN CASE WHEN (h // 8) % 2 = 0 THEN 1 ELSE -1 END END), 0) AS DOUBLE),
        |     CAST(COALESCE(SUM(CASE WHEN h % 8 = 7 THEN CASE WHEN (h // 8) % 2 = 0 THEN 1 ELSE -1 END END), 0) AS DOUBLE)] AS tv
        |  FROM thash GROUP BY doc_id),
        |j AS (
        |  SELECT h.doc_id AS doc_id, hv, tv
        |  FROM hist h JOIN tvec t ON h.doc_id = t.doc_id),
        |scored AS (
        |  SELECT doc_id,
        |    FLOOR((CASE
        |      WHEN list_sum(list_transform(hv, x -> x * x)) = 0
        |        OR list_sum(list_transform(tv, x -> x * x)) = 0 THEN 0.0
        |      ELSE list_sum(list_transform(list_zip(hv, tv), x -> x[1] * x[2]))
        |           / SQRT(list_sum(list_transform(hv, x -> x * x)) *
        |                  list_sum(list_transform(tv, x -> x * x)))
        |      END) * 10000 + 0.5) / 10000 AS align
        |  FROM j)
        |SELECT doc_id, align, CAST(align >= 0.5 AS BIGINT) AS keep
        |FROM scored ORDER BY doc_id""".stripMargin,

    "q_multimodal_features" ->
      """WITH hx AS (
        |  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
        |  FROM documents),
        |bytes AS (
        |  SELECT doc_id, n, unnest(list_transform(range(n),
        |    i -> strpos('0123456789ABCDEF', h[2*i+1]) * 16
        |       + strpos('0123456789ABCDEF', h[2*i+2]) - 17)) AS b
        |  FROM hx),
        |agg AS (
        |  SELECT doc_id, ANY_VALUE(n) AS n, SUM(b) AS s,
        |    COUNT(*) FILTER (b % 8 = 0) AS c0, COUNT(*) FILTER (b % 8 = 1) AS c1,
        |    COUNT(*) FILTER (b % 8 = 2) AS c2, COUNT(*) FILTER (b % 8 = 3) AS c3,
        |    COUNT(*) FILTER (b % 8 = 4) AS c4, COUNT(*) FILTER (b % 8 = 5) AS c5,
        |    COUNT(*) FILTER (b % 8 = 6) AS c6, COUNT(*) FILTER (b % 8 = 7) AS c7
        |  FROM bytes GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(a.c0, 0) AS DOUBLE) / GREATEST(COALESCE(a.n, 0), 1) AS h0,
        |  CAST(COALESCE(a.c1, 0) AS DOUBLE) / GREATEST(COALESCE(a.n, 0), 1) AS h1,
        |  CAST(COALESCE(a.c2, 0) AS DOUBLE) / GREATEST(COALESCE(a.n, 0), 1) AS h2,
        |  CAST(COALESCE(a.c3, 0) AS DOUBLE) / GREATEST(COALESCE(a.n, 0), 1) AS h3,
        |  CAST(COALESCE(a.c4, 0) AS DOUBLE) / GREATEST(COALESCE(a.n, 0), 1) AS h4,
        |  CAST(COALESCE(a.c5, 0) AS DOUBLE) / GREATEST(COALESCE(a.n, 0), 1) AS h5,
        |  CAST(COALESCE(a.c6, 0) AS DOUBLE) / GREATEST(COALESCE(a.n, 0), 1) AS h6,
        |  CAST(COALESCE(a.c7, 0) AS DOUBLE) / GREATEST(COALESCE(a.n, 0), 1) AS h7,
        |  CAST(COALESCE(a.s, 0) AS DOUBLE) / GREATEST(COALESCE(a.n, 0), 1) AS mean_byte
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // R48 twin: the evolved read replays from the source-of-truth
    // table — same doc_id split rule, same CASE defaults for the
    // columns the day-one era physically lacks.
    "q_schema_evolution" ->
      """WITH evolved AS (
        |  SELECT doc_id, text, lang,
        |    CASE WHEN doc_id < 250 THEN 'legacy' ELSE source END AS source,
        |    CASE WHEN doc_id < 250 THEN CAST(-1 AS BIGINT)
        |         ELSE CAST(n_chars AS BIGINT) END AS n_chars,
        |    CASE WHEN doc_id < 250 THEN 1 ELSE 2 END AS era
        |  FROM documents)
        |SELECT CAST(era AS BIGINT) AS era, source,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_texts,
        |  MIN(lang) AS lo_lang
        |FROM evolved GROUP BY era, source
        |ORDER BY era, source""".stripMargin,

    // L12j twin: the fallback branch's signed-8-bit byte walk — hex
    // nibbles → byte → two's-complement reinterpretation, Σs²
    // floor-div, LAG-based sign-transition count, max |s|.
    "q_multimodal_audio" ->
      """WITH hx AS (
        |  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
        |  FROM documents),
        |bytes AS (
        |  SELECT doc_id, n, i,
        |    strpos('0123456789ABCDEF', h[2*i+1]) * 16
        |      + strpos('0123456789ABCDEF', h[2*i+2]) - 17 AS b
        |  FROM hx, UNNEST(range(n)) t(i)),
        |sgn AS (
        |  SELECT doc_id, n, i,
        |    CASE WHEN b >= 128 THEN b - 256 ELSE b END AS s
        |  FROM bytes),
        |lg AS (
        |  SELECT doc_id, n, s,
        |    LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS ps
        |  FROM sgn),
        |agg AS (
        |  SELECT doc_id, ANY_VALUE(n) AS n, SUM(s * s) AS ss,
        |    MAX(ABS(s)) AS pk,
        |    COUNT(*) FILTER (ps IS NOT NULL AND (s < 0) != (ps < 0)) AS z
        |  FROM lg GROUP BY doc_id)
        |SELECT d.doc_id, FALSE AS real, CAST(0 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(COALESCE(a.n, 0) AS BIGINT) AS n_frames,
        |  CAST(COALESCE(a.ss // GREATEST(a.n, 1), 0) AS BIGINT) AS mean_square,
        |  CAST(COALESCE(a.z, 0) AS BIGINT) AS zero_crossings,
        |  CAST(COALESCE(a.pk, 0) AS BIGINT) AS peak_abs
        |FROM documents d
        |LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_multimodal_meta" ->
      """WITH base AS (
        |  SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS n,
        |    CASE WHEN LENGTH(text) = 0 THEN 0
        |         ELSE unicode(SUBSTRING(text, 1, 1)) + OCTET_LENGTH(ENCODE(text))
        |    END AS seed
        |  FROM documents)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
        |  16 + seed % 625 AS width,
        |  16 + (seed * 7) % 465 AS height,
        |  1 + n % 24 AS n_frames,
        |  CAST(16 + seed % 625 AS BIGINT) * (16 + (seed * 7) % 465) * 3
        |    * (1 + n % 24) AS est_raw_bytes
        |FROM base ORDER BY doc_id""".stripMargin,

    "q_multimodal_frames" ->
      """WITH base AS (
        |  SELECT doc_id, 1 + OCTET_LENGTH(ENCODE(text)) % 24 AS n_frames
        |  FROM documents)
        |SELECT doc_id, n_frames, UNNEST(generate_series(0, n_frames - 1, 4)) AS frame_idx
        |FROM base ORDER BY doc_id, frame_idx""".stripMargin,

    "q_multimodal_resize" ->
      """WITH base AS (
        |  SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS n,
        |    CASE WHEN LENGTH(text) = 0 THEN 0
        |         ELSE unicode(SUBSTRING(text, 1, 1)) + OCTET_LENGTH(ENCODE(text))
        |    END AS seed
        |  FROM documents),
        |dims AS (
        |  SELECT doc_id, CAST(16 + seed % 625 AS BIGINT) AS width,
        |         CAST(16 + (seed * 7) % 465 AS BIGINT) AS height
        |  FROM base),
        |scaled AS (
        |  SELECT doc_id, width, height,
        |    CASE WHEN GREATEST(width, height) <= 256 THEN width
        |         ELSE CAST(FLOOR(width * 256 / GREATEST(width, height)) AS BIGINT)
        |    END AS out_w,
        |    CASE WHEN GREATEST(width, height) <= 256 THEN height
        |         ELSE CAST(FLOOR(height * 256 / GREATEST(width, height)) AS BIGINT)
        |    END AS out_h
        |  FROM dims)
        |SELECT doc_id, width, height, out_w, out_h, out_w * out_h * 3 AS out_bytes
        |FROM scaled ORDER BY doc_id""".stripMargin,

    // L12k: the REAL-decode replay — the planted PNG is a solid
    // (id, 3id, 5id) mod 256 color at known dims, so the DECODED
    // luminance statistics are pure integer functions of doc_id.
    "q_multimodal_real_pixels" ->
      ("""WITH lum AS (
        |  SELECT doc_id,
        |    ((doc_id % 256) * 299 + ((doc_id * 3) % 256) * 587
        |      + ((doc_id * 5) % 256) * 114) // 1000 AS lum
        |  FROM documents)
        |SELECT doc_id,
        |""".stripMargin +
        (0 until 8).map(i =>
          s"  CAST(CASE WHEN lum * 8 // 256 = $i THEN 1 ELSE 0 END" +
            s" AS DOUBLE) AS h$i,").mkString("\n") + """
        |  CAST(lum AS DOUBLE) AS mean_byte
        |FROM lum ORDER BY doc_id""".stripMargin),

    // L12k: resize-then-re-decode replay — out dims follow the floor
    // rule from the planted dims; the re-decoded mean luminance is
    // the planted one (solid color ≡ its own box average, and PNG is
    // lossless both directions).
    "q_multimodal_resize_decoded" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 33 AS BIGINT) AS width,
        |    CAST(8 + (doc_id * 7) % 29 AS BIGINT) AS height,
        |    ((doc_id % 256) * 299 + ((doc_id * 3) % 256) * 587
        |      + ((doc_id * 5) % 256) * 114) // 1000 AS lum
        |  FROM documents)
        |SELECT doc_id, width, height,
        |  CASE WHEN GREATEST(width, height) <= 16 THEN width
        |       ELSE CAST(FLOOR(width * 16 / GREATEST(width, height))
        |         AS BIGINT) END AS out_w,
        |  CASE WHEN GREATEST(width, height) <= 16 THEN height
        |       ELSE CAST(FLOOR(height * 16 / GREATEST(width, height))
        |         AS BIGINT) END AS out_h,
        |  CAST(lum AS DOUBLE) AS mean_byte
        |FROM p ORDER BY doc_id""".stripMargin,

    // L12k: the GIF frame grid — frame count 2 + id mod 5, stride 2,
    // dims from the planted arithmetic.
    "q_multimodal_frames_decoded" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 33 AS BIGINT) AS width,
        |    CAST(8 + (doc_id * 7) % 29 AS BIGINT) AS height,
        |    2 + doc_id % 5 AS nf
        |  FROM documents WHERE doc_id % 7 = 0)
        |SELECT doc_id, CAST(UNNEST(range(0, nf, 2)) AS BIGINT)
        |    AS frame_idx,
        |  width, height
        |FROM g ORDER BY doc_id, frame_idx""".stripMargin,

    // L12h: the stub-fallback branch of sampleFramesReal — StubCodec
    // dims/frame-count arithmetic, stride-7 frame indices via a
    // stepped range, payload passthrough.
    "q_multimodal_frames_real" ->
      """WITH base AS (
        |  SELECT doc_id, text, OCTET_LENGTH(ENCODE(text)) AS n,
        |    CASE WHEN LENGTH(text) = 0 THEN 0
        |         ELSE unicode(SUBSTRING(text, 1, 1)) + OCTET_LENGTH(ENCODE(text))
        |    END AS seed
        |  FROM documents),
        |dims AS (
        |  SELECT doc_id, text, CAST(16 + seed % 625 AS BIGINT) AS width,
        |         CAST(16 + (seed * 7) % 465 AS BIGINT) AS height,
        |         CAST(1 + n % 24 AS BIGINT) AS n_frames
        |  FROM base)
        |SELECT doc_id, CAST(UNNEST(range(0, n_frames, 7)) AS BIGINT)
        |    AS frame_idx,
        |  width, height, SHA256(text) AS payload_sha
        |FROM dims ORDER BY doc_id, frame_idx""".stripMargin,

    // L12g: the stub-fallback branch of resizeReal — resizePlan
    // arithmetic at maxDim 64 plus the passed-through payload bytes
    // (ENCODE(text) replays the UTF-8 payload exactly).
    "q_multimodal_resize_real" ->
      """WITH base AS (
        |  SELECT doc_id, text, OCTET_LENGTH(ENCODE(text)) AS n,
        |    CASE WHEN LENGTH(text) = 0 THEN 0
        |         ELSE unicode(SUBSTRING(text, 1, 1)) + OCTET_LENGTH(ENCODE(text))
        |    END AS seed
        |  FROM documents),
        |dims AS (
        |  SELECT doc_id, CAST(16 + seed % 625 AS BIGINT) AS width,
        |         CAST(16 + (seed * 7) % 465 AS BIGINT) AS height
        |  FROM base),
        |scaled AS (
        |  SELECT doc_id, width, height,
        |    CASE WHEN GREATEST(width, height) <= 64 THEN width
        |         ELSE CAST(FLOOR(width * 64 / GREATEST(width, height)) AS BIGINT)
        |    END AS out_w,
        |    CASE WHEN GREATEST(width, height) <= 64 THEN height
        |         ELSE CAST(FLOOR(height * 64 / GREATEST(width, height)) AS BIGINT)
        |    END AS out_h
        |  FROM dims)
        |SELECT s.doc_id, s.width, s.height, s.out_w, s.out_h,
        |  s.out_w * s.out_h * 3 AS out_bytes,
        |  SHA256(b.text) AS payload_sha
        |FROM scaled s JOIN base b USING (doc_id)
        |ORDER BY s.doc_id""".stripMargin) ++
    // the CSV and ORC roundtrips prove the same byte-fidelity claim
    // over the quoting-sensitive and typed-columnar formats: one
    // oracle, three sink/source paths
    Map("q_csv_roundtrip" -> roundtripOracleSql,
        "q_orc_roundtrip" -> roundtripOracleSql,
        "q_fixedwidth_roundtrip" -> roundtripOracleSql)
}
