package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._
import graft.operators.{Ann, Bpe, Curate, Dedup, LinkRank}
import RelationalQueries.t

/** Round-7 additions: corpus-curation operators a 100 TB training-data
  * pipeline runs between ingest and packing (SURVEY.md §2 L28-L33) —
  * repetition quality filters (Gopher-style), corpus-boilerplate
  * flagging, per-language calibrated quality cuts, TF-IDF keyword
  * induction, target-mix resampling, BPE tokenization, semantic dedup.
  * Same determinism rules as the rest of the surface: quantized
  * fractions via `round_portable`, integer rank medians (no
  * interpolated percentiles), rational idf (no libm log), content-hash
  * sampling, total ORDER BY with unique tiebreakers.
  */
object CurationQueries {

  /** Adaptive quantizer sizing shared by the kNN/SemDeDup/bulk-kNN
    * chains: C ∝ n/512 holds per-cell work constant, trainFraction
    * targets a ~65536-row md5 sample. The quantizer seeds ONLY from
    * the sample (the oracle-replay contract forbids a full-corpus
    * re-seed), so C is additionally capped at 90% of the EXPECTED
    * sample size: past ~30M rows the cells grow instead of the seed
    * requirement silently outrunning the stochastic md5 sample — an
    * infeasible configuration is reshaped here, at configuration
    * time, not thrown mid-train. At every gate SF the cap is far
    * above n/512, so trained artifacts (and their oracles) are
    * untouched. */
  private def adaptiveCells(n: Long): (Int, Double) = {
    val sampleTarget = math.min(n, 65536L)
    val c = math.min(math.max(8L, n / 512),
      math.max(1L, sampleTarget * 9 / 10))
    (c.toInt, math.min(1.0, 65536.0 / n))
  }

  /** Integer-exact en-vs-rest margin scores `(doc_id, lang, margin)` —
    * the shared core of q_classifier_margin (L36) and the L44c
    * calibration audit. Hashed-sign features per doc, class-balanced
    * integer weights, margin = Σ x·w — every step integer, so the
    * DuckDB replay is value-exact. */
  /** L107 input: classifier margin min-max normalized into a ppm
    * pseudo-probability (margin = mx → exactly 10⁶, capped into the
    * last bin by calibrationBins), with the is_en label. */
  private def calibrationScored(s: SparkSession, dir: String): DataFrame = {
    val scored = classifierMargin(s, dir)
      .withColumn("is_en", col("lang") === "en")
    val bounds = scored.agg(min("margin").as("mn"), max("margin").as("mx"))
    scored.crossJoin(broadcast(bounds))
      .withColumn("p_ppm",
        expr("cast(cast(margin - mn as decimal(38,0)) * 1000000" +
          " div greatest(mx - mn, 1) as bigint)"))
  }

  private def classifierMargin(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val feats = d
      .select(col("doc_id"), col("lang"), explode(tokenize_ws(col("text"))).as("tok"))
      .withColumn("h", rolling_hash(col("tok")))
      .select(col("doc_id"), col("lang"), pmod(col("h"), lit(64L)).as("bucket"),
        when(pmod(expr("h div 64"), lit(2L)) === 0, 1L).otherwise(-1L).as("sign"))
      .groupBy("doc_id", "lang", "bucket")
      .agg(sum(col("sign")).as("x"))
    val counts = d.agg(
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
      sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("n_other"))
    val weights = feats.groupBy("bucket")
      .agg(sum(when(col("lang") === "en", col("x")).otherwise(0L)).as("s_en"),
        sum(col("x")).as("s_all"))
      .crossJoin(broadcast(counts))
      .select(col("bucket"),
        (col("n_other") * col("s_en") -
          col("n_en") * (col("s_all") - col("s_en"))).as("wgt"))
    feats.join(broadcast(weights), "bucket")
      .groupBy("doc_id", "lang")
      .agg(sum(col("x") * col("wgt")).as("margin"))
  }

  /** Frozen merge table for the apply-side BPE hash gate
    * (q_bpe_apply): rank order = list order, pair key = "a b".
    * Deliberately includes rank INTERACTIONS — later merges whose
    * outputs re-enter earlier- and later-rank pairs ((a,n)→an feeds
    * (an,d) and (an,d</w>); (t,h)/(e,</w>) feed (th,e</w>)) — so the
    * oracle actually exercises greedy lowest-rank-first semantics,
    * not just a single left-to-right pass. */
  val BpeFixedMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "e" -> "</w>", "th" -> "e</w>", "a" -> "n",
    "i" -> "n", "o" -> "n", "e" -> "r", "an" -> "d",
    "d" -> "</w>", "an" -> "d</w>", "s" -> "</w>", "in" -> "g",
    "ing" -> "</w>", "o" -> "u", "r" -> "e", "t" -> "o",
    "to" -> "</w>", "o" -> "f", "of" -> "</w>", "e" -> "n",
    "a" -> "t", "o" -> "r", "s" -> "t", "er" -> "</w>")

  /** DuckDB literal list of the frozen pair keys — 1-based
    * list_position == merge rank, generated from [[BpeFixedMerges]]
    * so the two sides cannot drift. */
  private def bpePairsLit: String =
    BpeFixedMerges.map { case (a, b) => s"'$a $b'" }.mkString("[", ", ", "]")

  /** L87 substring-blocklist pattern set, shared by the Spark query
    * and the oracle literal so the two sides cannot drift. Chosen to
    * exercise the Aho–Corasick corner cases on the synthetic
    * vocabulary: multi-word phrases, a SELF-OVERLAPPING phrase
    * ("table table table" contains "table table" twice), a short
    * overlapping pattern ("a a a" → 2), a pattern NESTED inside a
    * longer token ("tab" fires inside every "table"), one that crosses
    * a word boundary mid-token, and a zero-hit control the attribution
    * twin must still report. */
  val SubstringPatterns: Seq[String] = Seq(
    "fast table", "table table", "scan slow", "a a",
    "value", "tab", "le t", "zzz never")

  private def acPatsLit: String = SubstringPatterns.zipWithIndex
    .map { case (p, i) => s"($i, '$p')" }.mkString(", ")

  /** DuckDB replay of [[Curate.langMixture]]: the chunk grid
    * (ceil(n/16) windows, min 1 — the chunk_windows arithmetic),
    * per-chunk marker counts with the L8 alphabetical-argmax tie rule
    * plus the 'und' zero-evidence branch, and the per-doc dominant
    * rollup with its (cnt DESC, pred ASC) rank. */
  private def langMixtureSql(chunkTokens: Int): String = {
    val langs = graft.functions.LangMarkers.keys.toSeq.sorted
    val counts = graft.functions.LangMarkers.toSeq.sortBy(_._1)
      .map { case (l, ms) =>
        val lst = ms.map(m => s"'$m'").mkString("[", ", ", "]")
        s"len(list_filter(ct, x -> list_contains($lst, x))) AS c_$l"
      }.mkString(",\n    ")
    val m = langs.map(l => s"c_$l").mkString("GREATEST(", ", ", ")")
    val argmax = langs.reverse.foldLeft("'und'") { (acc, l) =>
      s"CASE WHEN c_$l = $m THEN '$l' ELSE $acc END"
    }
    val k = chunkTokens
    s"""WITH tk AS (
       |  SELECT doc_id,
       |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
       |  FROM documents),
       |grid AS (
       |  SELECT doc_id, t,
       |    UNNEST(range(0, GREATEST(1,
       |      CAST(CEIL(len(t) / $k.0) AS BIGINT)))) AS ci
       |  FROM tk),
       |ch AS (
       |  SELECT doc_id, list_slice(t, ci * $k + 1, ci * $k + $k) AS ct
       |  FROM grid),
       |counted AS (
       |  SELECT doc_id,
       |    $counts
       |  FROM ch),
       |pred AS (
       |  SELECT doc_id,
       |    CASE WHEN $m = 0 THEN 'und' ELSE $argmax END AS pred
       |  FROM counted),
       |perlang AS (
       |  SELECT doc_id, pred, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM pred GROUP BY doc_id, pred),
       |tot AS (
       |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_chunks,
       |    CAST(SUM(CASE WHEN pred != 'und' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_langs
       |  FROM perlang GROUP BY doc_id),
       |kept AS (
       |  SELECT p.doc_id, p.pred, p.cnt, t.n_chunks, t.n_langs
       |  FROM perlang p JOIN tot t USING (doc_id)
       |  WHERE p.pred != 'und' OR t.n_langs = 0),
       |rk AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |    ORDER BY cnt DESC, pred ASC) AS rk FROM kept)
       |SELECT doc_id, n_chunks, n_langs, pred AS dom_lang,
       |  cnt AS dom_chunks,
       |  CAST(cnt * 1000000 // n_chunks AS BIGINT) AS dom_share_pm,
       |  (n_langs >= 2) AS mixed
       |FROM rk WHERE rk = 1 ORDER BY doc_id""".stripMargin
  }

  /** Unrolled-CTE DuckDB replay of [[LinkRank.hits]] (the linkRankSql
    * discipline): HUGEINT mirrors the operator's decimal(38,0)
    * widening, `//` its `div`, per-round L1 renormalization via a
    * scalar-subquery SUM. Directed customer→supplier purchase pairs
    * (no reversal — HITS needs the digraph; hubs = customers,
    * authorities = suppliers). */
  /** L100 oracle scaffold: `rounds` unrolled normalized-MW updates,
    * r0 → r`rounds`, replaying [[graft.operators.Mix.mixtureReweight]]
    * integer-for-integer (A = Σwl div Σw, ex = max(0, loss−A),
    * w' = w·(10⁶ + ex·5·10⁵ div max ex) div 10⁶; max ex = 0 keeps w).
    * MATERIALIZED per round: each round references its predecessor
    * twice and plain CTE inlining would expand the chain 2^rounds-fold. */
  private def mwRoundsSql(rounds: Int): String =
    (1 to rounds).map { i =>
      s"""a$i AS MATERIALIZED (
         |  SELECT CAST(SUM(w * loss) AS BIGINT)
         |    // CAST(SUM(w) AS BIGINT) AS a,
         |    CAST(MAX(loss) AS BIGINT) AS ml
         |  FROM r${i - 1}),
         |r$i AS MATERIALIZED (
         |  SELECT domain, loss,
         |    CASE WHEN a$i.ml - a$i.a = 0 THEN w
         |         ELSE (w * (1000000 + (GREATEST(0, loss - a$i.a) * 500000)
         |           // (a$i.ml - a$i.a))) // 1000000
         |         END AS w
         |  FROM r${i - 1}, a$i)""".stripMargin
    }.mkString(",\n")

  private def hitsSql(iters: Int, scale: Long): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH pairs AS (
              |  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
              |         's' || CAST(l_suppkey AS VARCHAR) AS dst,
              |         CAST(COUNT(*) AS BIGINT) AS w
              |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |  GROUP BY 1, 2),
              |nodes AS (
              |  SELECT src AS node FROM pairs
              |  UNION SELECT dst AS node FROM pairs),
              |h0 AS (SELECT node, CAST($scale AS HUGEINT) AS v FROM nodes),
              |""".stripMargin
    for (r <- 1 to iters) {
      sb ++= s"""ar$r AS (
                |  SELECT p.dst AS node, SUM(CAST(h.v AS HUGEINT) * p.w) AS v
                |  FROM pairs p JOIN h${r - 1} h ON p.src = h.node
                |  GROUP BY p.dst),
                |a$r AS (SELECT node,
                |  v * $scale // (SELECT SUM(v) FROM ar$r) AS v FROM ar$r),
                |hr$r AS (
                |  SELECT p.src AS node, SUM(CAST(a.v AS HUGEINT) * p.w) AS v
                |  FROM pairs p JOIN a$r a ON p.dst = a.node
                |  GROUP BY p.src),
                |h$r AS (SELECT node,
                |  v * $scale // (SELECT SUM(v) FROM hr$r) AS v FROM hr$r),
                |""".stripMargin
    }
    sb ++= s"""fin AS (SELECT 1 AS one)
              |SELECT n.node,
              |  CAST(COALESCE(h.v, 0) AS BIGINT) AS hub_micro,
              |  CAST(COALESCE(a.v, 0) AS BIGINT) AS auth_micro
              |FROM nodes n
              |LEFT JOIN h$iters h ON n.node = h.node
              |LEFT JOIN a$iters a ON n.node = a.node
              |ORDER BY n.node""".stripMargin
    sb.toString
  }

  /** Untimed memo warm-up: build the persisted shared artifacts the
    * named queries consume (walk corpora, kNN graph). Bench calls this
    * before timing so a cold subset run measures the QUERY, not the
    * one-time artifact build; idempotent and cheap once built. */
  def prime(s: SparkSession, dir: String, names: Set[String]): Unit = {
    if (Seq("q_graph_walks", "q_walk_skipgrams", "q_negative_samples",
        "q_embed_train").exists(names)) walkTable(s, dir)
    if (names("q_graph_walks_grouped")) walkGroupedTable(s, dir)
    if (names("q_node2vec_walks")) n2vTable(s, dir)
    if (Seq("q_knn_graph", "q_label_spread").exists(names)) knnEdges(s, dir)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // L60: collocation / phrase mining (word2phrase) — adjacent-bigram
    // association scored with Mikolov's discounted ratio
    // (c_ab − δ)·N / (c_a·c_b), the phrase-vocabulary induction step
    // that runs before tokenizer training ("new york" → one token).
    // Counts are integers; the score is two IEEE multiplies and one
    // divide in a FIXED shape, floor-quantized — bit-exact across
    // engines, no libm. The c_a·c_b product runs in DOUBLE (one exact
    // IEEE multiply) because bigint c_a·c_b overflows at
    // web-corpus scale. One explode + two token-keyed joins of the
    // support-filtered (Zipf-small) bigram inventory; the corpus
    // never self-joins.
    "q_phrase_mine" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val toks = docs.select(tokenize_ws(col("text")).as("t"))
      val uni = toks.select(explode(col("t")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c1"))
      val tot = toks.agg(sum(size(col("t"))).as("n_tok"))
      val bc = Shared.bigramPairs(docs, "doc_id", "text")
        .groupBy("prev", "cur").agg(count(lit(1)).as("cab"))
        .filter(col("cab") >= 5)
      bc.join(uni.select(col("tok").as("prev"), col("c1").as("ca")), "prev")
        .join(uni.select(col("tok").as("cur"), col("c1").as("cb")), "cur")
        .crossJoin(broadcast(tot))
        .withColumn("score_q",
          floor((col("cab") - lit(5L)).cast("double") * col("n_tok") /
            (col("ca").cast("double") * col("cb")) * 1e6).cast("long"))
        .select(col("prev").as("w1"), col("cur").as("w2"),
          col("cab"), col("ca"), col("cb"), col("score_q"))
        .orderBy(desc("score_q"), col("w1"), col("w2"))
        .limit(50)
    },

    // L33c: UniMax budget allocation (Chung et al. 2023) — given a
    // token budget (80% of the corpus) and a max-epoch cap (1: sample
    // without repetition), water-fill the per-language allocations:
    // languages too small to absorb an equal share get their full cap,
    // the rest split the remaining budget equally (on this corpus the
    // four small languages cap out and en takes the remainder — the
    // split point is genuinely exercised). The closed-form split makes
    // the sequential water-fill one window pass over the L-row
    // (language-count-bounded) size table — the corpus contributes
    // exactly ONE token-count aggregate. All integer arithmetic: caps,
    // prefix sums, floor-div shares — value-exact in the replay.
    "q_unimax_alloc" -> { (s, dir) =>
      val sizes = t(s, dir, "documents")
        .groupBy("lang").agg(sum(token_count(col("text"))).as("t_tok"))
      Curate.unimaxAlloc(sizes, "lang", maxEpochs = 1L,
          budNum = 4L, budDen = 5L)
        .orderBy("lang")
    },

    // L33d: the allocation MATERIALIZED — maxEpochs 3, budget 2× the
    // corpus: the smallest language replicates to 3 full epochs while
    // the rest get fractional epochs via the content-hash threshold
    // (upsample-the-tail, the multilingual-pretraining move UniMax
    // exists for). The per-lang rollup proves row counts, token mass,
    // and copy depth all land exactly where the water-fill said.
    "q_unimax_apply" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val sizes = d.groupBy("lang")
        .agg(sum(token_count(col("text"))).as("t_tok"))
      val alloc = Curate.unimaxAlloc(sizes, "lang", maxEpochs = 3L,
        budNum = 2L, budDen = 1L)
      Curate.unimaxApply(d, "text", "lang", alloc)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_rows"),
          sum(token_count(col("text"))).as("sum_tokens"),
          countDistinct(col("doc_id")).as("n_docs"),
          (max("epoch") + lit(1L)).as("max_copies"))
        .orderBy("lang")
    },

    // L73: Horvitz–Thompson corpus estimation — full-corpus statistics
    // from the deterministic content-hash sample, reweighted by the
    // EXACT inverse inclusion probability (Mix thresholds are k/256
    // rationals, so est = sampled_sum · 256 div k is integer-exact,
    // no float reweighting). The "measure 100 TB from the 25% sample
    // you can afford to scan" move, with the estimation error
    // reported against truth per language.
    "q_ht_estimate" -> { (s, dir) =>
      import graft.operators.Mix
      val d = t(s, dir, "documents")
      val sampled = Mix.weightedSample(d, "lang", "text",
          Map("en" -> 0.5), defaultWeight = 0.25)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"),
          sum(token_count(col("text"))).as("s_tok"))
        .withColumn("k", when(col("lang") === "en", 128L).otherwise(64L))
        .withColumn("est_tokens", expr("s_tok * 256 div k"))
      val actual = d.groupBy("lang")
        .agg(sum(token_count(col("text"))).as("actual_tokens"))
      sampled.join(actual, "lang")
        .withColumn("err_per_mille",
          expr("abs(est_tokens - actual_tokens) * 1000 div actual_tokens"))
        .select("lang", "n_sampled", "est_tokens", "actual_tokens",
          "err_per_mille")
        .orderBy("lang")
    },

    // L72: per-rule example sampler — three deterministic example docs
    // for every failing Gopher rule (content-hash order, so the
    // "show me what this rule kills" review set is stable across
    // runs/engines/partitionings). Rule flags come from the one fused
    // gopherFlags pass; the unpivot is rule-count-bounded.
    "q_rule_examples" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val rules = Seq("ok_words", "ok_wordlen", "ok_symbols", "ok_lines",
        "ok_alpha", "ok_stopwords")
      val fails = Curate.gopherFlags(d, "doc_id", "text",
          stopWords = Seq("the", "a"))
        .select(col("doc_id"), explode(array(rules.map(r =>
          struct(lit(r).as("rule"), col(r).as("ok"))): _*)).as("rf"))
        .filter(col("rf.ok") === 0)
        .select(col("rf.rule").as("rule"), col("doc_id"))
      val w = Window.partitionBy("rule").orderBy("k", "doc_id")
      fails.join(d.select(col("doc_id"), md5(col("text")).as("k")), "doc_id")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select("rule", "rank", "doc_id", "k")
        .orderBy("rule", "rank")
    },

    // L29: Gopher-style repetition signals — the within-document
    // repetition quality filter: duplicate-token fraction, most-frequent
    // -bigram mass, duplicate-trigram fraction, and the keep decision.
    // Everything is per-row array math: map-side, codegen'd, no shuffle
    // at any corpus size. Thresholds chosen non-vacuous on the test
    // corpus (~29% of sf0.01 docs flagged).
    // Counts come from the FNV kernels (token_id_set /
    // max_adjacent_pair_count / shingle_id_set): O(tokens) per row vs
    // the O(tokens²) generic array formulation the DuckDB oracle uses —
    // the hash gate proves the counts agree (3.6 s -> sub-second at
    // sf0.1).
    "q_repetition" -> { (s, dir) =>
      val d = t(s, dir, "documents")
        .select(col("doc_id"), tokenize_ws(col("text")).as("t"))
        .withColumn("n", size(col("t")))
        .withColumn("n_bigrams", greatest(col("n") - 1, lit(0)))
        // mirrors shingles()/the oracle: < 3 tokens => one whole-text
        // trigram (never duplicated)
        .withColumn("n_tris", when(col("n") >= 3, col("n") - 2).otherwise(lit(1)))
      d.select(col("doc_id"),
          col("n").cast("long").as("n_tokens"),
          round_portable((col("n") - size(token_id_set(col("t"))))
            .cast("double") / greatest(col("n"), lit(1)), 4)
            .as("dup_token_frac"),
          when(col("n_bigrams") === 0, lit(0.0)).otherwise(
            round_portable(max_adjacent_pair_count(col("t")).cast("double") /
              col("n_bigrams"), 4)).as("top_bigram_frac"),
          round_portable((col("n_tris") - size(shingle_id_set(col("t"), 3)))
            .cast("double") / greatest(col("n_tris"), lit(1)), 4)
            .as("dup_trigram_frac"))
        .withColumn("keep", col("dup_token_frac") <= 0.65 &&
          col("top_bigram_frac") <= 0.08 && col("dup_trigram_frac") <= 0.0)
        .orderBy("doc_id")
    },

    // L30: corpus-boilerplate flagging — 3-shingles shared by >= 5
    // distinct documents form the boilerplate inventory (headers,
    // licence blocks, navigation chrome); each doc reports how much of
    // it is boilerplate. The inventory is Zipf-small relative to the
    // corpus (broadcast it at scale); the per-doc side is one explode +
    // join + doc-keyed aggregate — the same asymmetric shape as
    // decontamination, pointed at the corpus itself.
    // Shingles travel as 8-byte FNV ids (shingle_id_set kernel), not
    // strings: the explode/groupBy/join pipeline moves longs, and the
    // oracle's string-shingle counts hash-match w.h.p. (13 s -> ~2 s at
    // sf0.1).
    "q_boilerplate" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), shingle_id_set(tokenize_ws(col("text")), 3).as("sh"))
      val ex = docs.select(col("doc_id"), explode(col("sh")).as("g"))
      val inventory = ex.groupBy("g").agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 5).select("g")
      val per = ex.join(inventory, "g")
        .groupBy("doc_id").agg(count(lit(1)).as("n_boiler"))
      docs.select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"))
        .join(per, Seq("doc_id"), "left")
        .withColumn("n_boiler", coalesce(col("n_boiler"), lit(0L)))
        .withColumn("boiler_frac", round_portable(
          col("n_boiler").cast("double") / greatest(col("n_shingles"), lit(1L)), 4))
        .withColumn("flag", col("n_boiler") >= 5)
        .orderBy("doc_id")
    },

    // L31: calibrated quality cut — keep docs at or above their OWN
    // language's median quality (adaptive thresholds: a fixed global
    // cut over- or under-prunes whole languages). The median is the
    // exact rank-(n+1)/2 element of the quantized score (integer rank
    // on integer values: no interpolation, engine-exact); the 5-row
    // median table broadcasts back. One window shuffle on lang.
    "q_quality_calibrated" -> { (s, dir) =>
      val q = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          floor(quality_score(col("text")) * 10000 + 0.5).cast("long").as("q1e4"))
      val med = Curate.groupMedian(q, "lang", "q1e4", "doc_id", "med_q1e4")
      q.join(broadcast(med), "lang")
        .withColumn("keep", col("q1e4") >= col("med_q1e4"))
        .select("doc_id", "lang", "q1e4", "med_q1e4", "keep")
        .orderBy("doc_id")
    },

    // L77: quality-signal rank ensemble (Borda fusion) — three weak
    // integer signals (token count, distinct-token ppm, mean token
    // length) ranked per language and fused by summed descending
    // ranks; keep = per-language top quartile of the fused score.
    // Ranks need no cross-signal calibration (the RRF argument applied
    // to curation), and every rank is a PrefixSum.keyed two-level scan
    // — no whole-language sort, no unpartitioned WindowExec.
    "q_quality_blend" -> { (s, dir) =>
      Curate.bordaQuality(t(s, dir, "documents"), "doc_id", "text", "lang")
        .orderBy("doc_id")
    },

    // L81: cross-source quantile normalization — every doc's length
    // score remapped onto the GLOBAL distribution's value at the
    // doc's within-source quantile (Bolstad '03 applied to curation:
    // per-source scorer drift stops biasing global thresholds). Both
    // rank tables are PrefixSum two-level scans; the quantile lookup
    // is an integer-rank equi-join.
    "q_quantile_norm" -> { (s, dir) =>
      Curate.quantileNormalize(t(s, dir, "documents"), "doc_id",
          "source", "n_chars")
        .orderBy("doc_id")
    },

    // L78: k-anonymity generalization ladder — each doc released at
    // the first level of (lang, source, len-bucket) → (lang, source,
    // wider bucket) → (lang, source) → (lang) → (all) whose group
    // holds ≥ 5 docs. Reads ONLY metadata columns (text never loads —
    // the scan prunes to 4 columns); one bounded groupBy per level.
    "q_k_anonymity" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val any = lit("ANY")
      Curate.kAnonymize(d, "doc_id", Seq(
          Seq("lang" -> col("lang"), "source" -> col("source"),
            "len_b" -> expr("cast(n_chars div 100 as string)")),
          Seq("lang" -> col("lang"), "source" -> col("source"),
            "len_b" -> expr("cast(n_chars div 1000 as string)")),
          Seq("lang" -> col("lang"), "source" -> col("source"), "len_b" -> any),
          Seq("lang" -> col("lang"), "source" -> any, "len_b" -> any),
          Seq("lang" -> any, "source" -> any, "len_b" -> any)), k = 5L)
        .orderBy("doc_id")
    },

    // L40: compressibility quality signal — gzip bytes / raw bytes, the
    // classic "too compressible = boilerplate/repetition, near-1 =
    // random noise" filter (rows-only: DuckDB has no gzip; determinism
    // and the repetitive-text ordering are gated in CurationSpec).
    // Map-side per-row codec work via the native GzipCompress
    // expression — no shuffle at any corpus size.
    "q_compress_ratio" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          length(gzip_compress(col("text").cast("binary"))).cast("long").as("n_gz"))
        .withColumn("ratio", round_portable(
          col("n_gz").cast("double") / greatest(col("n_chars"), lit(1L)), 4))
        .withColumn("keep", col("ratio") >= 0.3)
        .orderBy("doc_id")
    },

    // L39: robust per-language dispersion — median + median absolute
    // deviation of the quantized quality score, two stacked
    // Curate.groupMedian passes (all-integer: exact ranks, exact
    // |x - med| deviations — no stddev float drift anywhere). MAD is
    // the outlier-robust scale estimate quality monitoring wants when
    // a crawl slice poisons the mean.
    "q_quality_mad" -> { (s, dir) =>
      val q = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          floor(quality_score(col("text")) * 10000 + 0.5).cast("long").as("q1e4"))
      val med = Curate.groupMedian(q, "lang", "q1e4", "doc_id", "med")
      val dev = q.join(broadcast(med), "lang")
        .withColumn("adev", abs(col("q1e4") - col("med")))
      val mad = Curate.groupMedian(dev, "lang", "adev", "doc_id", "mad")
      med.join(mad, "lang").select("lang", "med", "mad").orderBy("lang")
    },

    // L32: per-language TF-IDF keywords — the corpus-characterization
    // step (what distinguishes each language/source slice). Rational
    // idf (N-df+0.5)/(df+0.5) instead of its log: same monotone
    // ordering, bit-exact across engines. Two token-keyed aggregates +
    // a broadcast scalar; the per-lang top-10 rank is WindowGroupLimit-
    // pushed (top-k applied map-side before the lang shuffle).
    "q_tfidf_keywords" -> { (s, dir) =>
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), explode(tokenize_ws(col("text"))).as("tok"))
      val dfreq = toks.select("doc_id", "tok").distinct()
        .groupBy("tok").agg(count(lit(1)).as("df"))
      val tf = toks.groupBy("lang", "tok").agg(count(lit(1)).as("tf"))
      val tot = t(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("lang").orderBy(col("score_q").desc, col("tok").asc)
      tf.join(dfreq, "tok").crossJoin(broadcast(tot))
        .withColumn("score_q", floor(col("tf").cast("double") *
          ((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) * 100 + 0.5)
          .cast("long"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select("lang", "rank", "tok", "tf", "df", "score_q")
        .orderBy("lang", "rank")
    },

    // L33: target-mix resampling — downsample each language to hit a
    // target output share (en 40%, others 15%), the mix-shaping
    // primitive. Keep rates derive from the realized counts (5-row
    // aggregate, broadcast); membership is the deterministic md5-prefix
    // order against a rate-derived hex threshold, so the sample is a
    // pure function of content at any parallelism. Languages whose
    // rate clamps at 1.0 keep everything ('zzzz' sorts above every hex
    // quad).
    "q_mix_target" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val rates = Curate.mixThresholds(d, "lang",
        when(col("lang") === "en", lit(0.4)).otherwise(lit(0.15)))
      d.join(broadcast(rates), "lang")
        .groupBy("lang")
        .agg(max(col("thr")).as("thr_hex"),
          count(lit(1)).as("n_docs"),
          sum(when(substring(md5(col("text")), 1, 4) < col("thr"), 1L)
            .otherwise(0L)).as("n_kept"))
        .orderBy("lang")
    },

    // L33b: temperature-flattened mixing (alpha=0.5) — shares follow
    // sqrt(n_lang), so low-resource languages are upweighted toward
    // parity (the XLM-R/mT5 rebalance) while 'en' stays dominant.
    // Thresholds are engine-exact: sqrt is correctly rounded
    // everywhere (unlike pow), weights quantize to BIGINTs, and the
    // rate expression has one fixed evaluation order (oracled).
    "q_mix_temperature" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val rates = Curate.temperatureThresholds(d, "lang", targetFraction = 0.5)
      d.join(broadcast(rates), "lang")
        .groupBy("lang")
        .agg(max(col("thr")).as("thr_hex"),
          count(lit(1)).as("n_docs"),
          sum(when(substring(md5(col("text")), 1, 4) < col("thr"), 1L)
            .otherwise(0L)).as("n_kept"))
        .orderBy("lang")
    },

    // L100: DoReMi-flavored mixture reweighting — derives per-source
    // weights from the corpus itself: loss = q8-scaled average bigram
    // surprisal proxy (1e8 − mean quantized cond. probability), then
    // 6 normalized multiplicative-weights rounds upweight
    // above-average-loss sources (×1.5/round at the max excess). All
    // integer, so the round-by-round trajectory hash-oracles.
    "q_mix_reweight" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val perDoc = Shared.bigramScored(d, "doc_id", "text")
        .groupBy("doc_id")
        .agg(sum("q").as("sq"), count(lit(1)).as("nb"))
      // r17: pinned once — both the MW fold's collect and the final
      // n_bigrams join read this frame, and its upstream is the full
      // bigram-scoring pass over the corpus (was re-executed per
      // reference). The pinned frame is source-grained (tiny).
      val domLoss = graft.operators.Lineage.pin(
        perDoc.join(d.select("doc_id", "source"), "doc_id")
          .groupBy("source")
          .agg(sum("sq").as("sq"), sum("nb").as("n_bigrams"))
          .select(col("source"), col("n_bigrams"),
            expr("100000000L - sq div n_bigrams").as("loss")))
      graft.operators.Mix.mixtureReweight(domLoss, "source", "loss", rounds = 6)
        .withColumnRenamed("domain", "source")
        .join(domLoss.select("source", "n_bigrams"), "source")
        .select(col("source"), col("n_bigrams"),
          col("loss").as("loss_q8"), col("w_raw"), col("w_ppm"))
        .orderBy("source")
    },

    // L29b: duplicated n-gram coverage (Gopher/MassiveText dup-ngram
    // signal, Rae et al.): per doc, the fraction of its distinct
    // 3-gram shingles that occur in at least one OTHER place in the
    // corpus — high coverage marks boilerplate/templated text that
    // per-doc repetition filters (L29) can't see. The shuffle key is
    // the FNV shingle ID (narrow longs via the codegen'd
    // shingle_id_set — no shingle string ever shuffles; the same
    // collision-free-w.h.p. contract as every Jaccard op), the df
    // comes from one whole-partition window count, and the fraction is
    // integer micro-units (n_dup·1e6 div n), exact. Two narrow
    // shuffles total; the oracle replays string shingles, which agree
    // with the ids by that contract.
    "q_dup_ngram_fraction" -> { (s, dir) =>
      val docSh = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(shingle_id_set(tokenize_ws(col("text")), 3)).as("sh"))
      docSh
        .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
        .withColumn("dup_frac_micro",
          expr("n_dup * 1000000 div n_shingles"))
        .orderBy("doc_id")
    },

    // L34: feature hashing (hashed bag-of-words, Weinberger et al.) —
    // the native text->vector featurizer feeding the ANN/semantic
    // stack. Emitted as exploded (doc_id, bucket, weight) integer rows
    // so the oracle is exact: the rolling-hash bucket/sign recurrence
    // replays in DuckDB via the same list_reduce as q_fingerprint.
    // Map-side explode + one (doc_id, bucket) shuffle; the array form
    // (hashed_bow kernel) is spec-proven equal to this grouping.
    "q_feature_hash" -> { (s, dir) =>
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(tokenize_ws(col("text"))).as("tok"))
      toks.withColumn("h", rolling_hash(col("tok")))
        .select(col("doc_id"), pmod(col("h"), lit(64L)).as("bucket"),
          when(pmod(expr("h div 64"), lit(2L)) === 0, 1L).otherwise(-1L).as("sign"))
        .groupBy("doc_id", "bucket")
        .agg(sum(col("sign")).as("weight"))
        .orderBy("doc_id", "bucket")
    },

    // L28: BPE tokenization — merges learned on the corpus's word-
    // frequency head (driver-bounded by Zipf; deterministic tie-break),
    // applied map-side by the codegen'd kernel. Rows-only: merge
    // learning is iterative and not SQL-expressible; determinism,
    // reference parity, and the roundtrip property are gated in
    // BpeSpec. Output flattened to scalars for the rows-only dump.
    "q_bpe_tokenize" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val merges = Bpe.train(d, "text", nMerges = 1000, maxWords = 10000)
      // fan below the greedy-merge encode kernel (serial on a
      // one-split corpus; no-op at production scan parallelism)
      graft.operators.Scale.fan(d.select("doc_id", "text"))
        .select(col("doc_id"), token_count(col("text")).as("n_words"),
          bpe_encode(tokenize_ws(col("text")), merges).as("bpe"))
        .select(col("doc_id"), col("n_words"),
          size(col("bpe")).cast("long").as("n_bpe_tokens"),
          concat_ws(" ", slice(col("bpe"), 1, 12)).as("head_tokens"))
        .orderBy("doc_id")
    },

    // 11b: BPE APPLY under a FIXED merge table — the deterministic
    // half of L28 split out so it carries a full hash oracle. Train
    // stays engine-native (iterative, data-dependent — rows-only via
    // q_bpe_tokenize, bounds gated in BpeSpec), but with the merge
    // table FROZEN the greedy lowest-rank-first recurrence of
    // bpe_encode is a per-word fixpoint DuckDB replays exactly: a
    // recursive CTE for the fixpoint loop + a list_reduce carry pass
    // for the left-to-right non-overlapping merge (the L5
    // ordered-reduce pattern). Runs over the distinct-word vocabulary
    // (Zipf-bounded), map-side kernel + one distinct shuffle.
    "q_bpe_apply" -> { (s, dir) =>
      val words = t(s, dir, "documents")
        .select(explode(tokenize_ws(col("text"))).as("word"))
        // cap + control-char guard: keeps the oracle's recursion
        // shallow and its per-codepoint regex split ('.' skips \n)
        // in lockstep with the kernel's codePointAt walk
        .filter(length(col("word")) <= 20 &&
          instr(col("word"), "\t") === 0 &&
          instr(col("word"), "\n") === 0 &&
          instr(col("word"), "\r") === 0)
        .distinct()
      words.select(col("word"),
          bpe_encode(array(col("word")), BpeFixedMerges).as("segs"))
        .select(col("word"),
          concat_ws(" ", col("segs")).as("bpe"),
          size(col("segs")).cast("long").as("n_segs"))
        .orderBy("word")
    },

    // R17d: mergeable Space-Saving heavy hitters — the fixed-memory
    // approx top-k for cardinalities where exact groupBy(term) is too
    // wide. Partial aggregation ships one capacity-bounded summary per
    // partition. Run here in the exact regime (capacity 4096 >> distinct
    // tokens) so the DuckDB group-count oracle hash-proves the merge
    // plumbing; the approximate regime's error bounds are gated in
    // SketchSpec.
    "q_heavy_hitters_sketch" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"), explode(tokenize_ws(col("text"))).as("tok"))
        .groupBy("lang")
        .agg(approx_top_k(col("tok"), 5, 4096).as("hh"))
        .select(col("lang"), posexplode(col("hh")))
        .select(col("lang"), (col("pos") + 1).cast("long").as("rank"),
          col("col.term").as("term"), col("col.est").as("est"),
          col("col.err").as("err"))
        .orderBy("lang", "rank")
    },

    // R11b: explicit GROUPING SETS — non-hierarchical grouping combos
    // ((lang), (source), ()) in one pass, the slice-report shape
    // rollup/cube can't express. Null ordering pinned via coalesce so
    // both engines sort identically.
    "q_grouping_sets" -> { (s, dir) =>
      t(s, dir, "documents")
        .groupingSets(Seq(Seq(col("lang")), Seq(col("source")), Seq()),
          col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(token_count(col("text"))).as("sum_tokens"))
        .orderBy(coalesce(col("lang"), lit("zz")),
          coalesce(col("source"), lit("zz")))
    },

    // L35: block-level exact dedup (Lee et al. repeated-span removal at
    // 16-token block granularity) — drop every block whose exact
    // content occurred earlier in the corpus, reassemble docs from the
    // survivors. One md5-keyed groupBy (partial-agg absorbs corpus-wide
    // hot blocks) + one hash join; the oracle replays the whole
    // explode/elect/reassemble chain and hash-checks the reassembled
    // text's fingerprint.
    "q_block_dedup" -> { (s, dir) =>
      Dedup.dedupBlocks(t(s, dir, "documents"), "doc_id", "text", blockTokens = 16)
        .orderBy("doc_id")
    },

    // L35c: ExactSubstr span dedup (Lee et al. §4.1) — sliding 8-gram
    // anchors mark every token position inside a corpus-duplicated
    // span of >= 8 tokens (pigeonhole-complete at any alignment, the
    // straddling spans fixed blocks miss); maximal merged intervals are
    // removed with first-occurrence-survives and the doc reassembled.
    // One narrow hash-window shuffle for gram election; reassembly
    // filters each doc's token array in place. The oracle replays the
    // identical chain on gram strings (hash/string agreement w.h.p.).
    "q_substr_dedup" -> { (s, dir) =>
      Dedup.dedupSpans(t(s, dir, "documents"), "doc_id", "text", spanTokens = 8)
        .orderBy("doc_id")
    },

    // L36: linear classifier inference over hashed features — the
    // fastText-shaped quality/domain-classifier step: a class-centroid
    // discriminant w_b = n_other * S_en(b) - n_en * S_other(b) trained
    // in one bucket-keyed aggregate (64 rows, broadcast back), scored
    // map-side as an integer dot product. All-integer arithmetic makes
    // the margin engine-exact; at corpus scale the weights would be
    // quantized ratios instead (same plan shape: tiny model broadcast,
    // corpus never shuffles against it).
    "q_classifier_margin" -> { (s, dir) =>
      classifierMargin(s, dir)
        .select(col("doc_id"), col("lang"), col("margin"),
          (col("margin") > 0).as("pred_en"))
        .orderBy("doc_id")
    },

    // L44c: calibration audit (reliability-diagram data) — the margin
    // scores binned FIXED-WIDTH between the global min/max (integer
    // arithmetic off one broadcast 1-row bounds frame — no global-sort
    // ntile; value bins keep the plan fully distributed), per bin the
    // observed ground-truth rate in integer per-mille. The audit that
    // tells you whether a quality/domain classifier's scores can be
    // thresholded or must be recalibrated before gating a corpus.
    "q_calibration" -> { (s, dir) =>
      val m = classifierMargin(s, dir)
      val bounds = m.agg(min("margin").as("mn"), max("margin").as("mx"))
      m.crossJoin(broadcast(bounds))
        .withColumn("bin", expr("(margin - mn) * 10 div (mx - mn + 1)"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
          min("margin").as("lo_margin"), max("margin").as("hi_margin"))
        .withColumn("en_per_mille", expr("n_en * 1000 div n"))
        .select("bin", "n", "n_en", "en_per_mille", "lo_margin", "hi_margin")
        .orderBy("bin")
    },

    // L103: exact AUC of the hashed-feature classifier (en vs rest) —
    // Mann–Whitney with tie correction via the grouped average-rank
    // closed form; no global sort (bucketed PrefixSum), decimal-
    // widened micro-units. The threshold-free twin of q_calibration.
    "q_classifier_auc" -> { (s, dir) =>
      Curate.aucExact(
        classifierMargin(s, dir).withColumn("is_en", col("lang") === "en"),
        "margin", "is_en")
    },

    // L104: per-SOURCE exact AUC — does the gating classifier rank
    // equally well on every ingest source, or does one source's
    // content defeat it? Labels vary within each source (is_en), so
    // every group carries a real ranking problem.
    "q_classifier_auc_grouped" -> { (s, dir) =>
      val scored = classifierMargin(s, dir)
        .join(t(s, dir, "documents").select("doc_id", "source"), "doc_id")
        .withColumn("is_en", col("lang") === "en")
      Curate.aucExactGrouped(scored, "source", "margin", "is_en")
        .withColumnRenamed("grp", "source")
        .orderBy("source")
    },

    // L116 (r16): 5-fold cross-validated AUC + jackknife spread —
    // the stability answer on top of L103's point estimate; one
    // keyed pass scores all folds, the K bounded rows carry the
    // scaled squared deviations and the -1 summary row.
    "q_classifier_cv" -> { (s, dir) =>
      Curate.aucCrossValidated(
          classifierMargin(s, dir).withColumn("is_en", col("lang") === "en"),
          "margin", "is_en", pmod(col("doc_id"), lit(5L)))
        .orderBy("fold")
    },

    // L103b: precision/recall at rank-decile cutoffs — what gating the
    // corpus at the top X% of classifier score costs; deterministic
    // decile boundaries via the (score DESC, doc_id) tiebreak.
    "q_classifier_pr" -> { (s, dir) =>
      Curate.prCurve(
          classifierMargin(s, dir).withColumn("is_en", col("lang") === "en"),
          "doc_id", "margin", "is_en", buckets = 10)
        .orderBy("decile")
    },

    // L107 (r14): reliability diagram with PREDICTED-vs-observed
    // gaps — the L44c calibration audit gives per-bin observed rates;
    // this adds the predicted mean per bin and the |obs − pred| gap
    // (the quantity ECE weights), over the margin min-max normalized
    // to a ppm pseudo-probability (one broadcast bounds frame). AUC
    // says the ranking is good; THIS says whether the score VALUES
    // can be thresholded as probabilities.
    "q_reliability" -> { (s, dir) =>
      Curate.calibrationBins(calibrationScored(s, dir), "p_ppm", "is_en",
          buckets = 10)
        .orderBy("bin")
    },

    // L114 (r15): isotonic calibration — the PAV monotone fit of
    // observed rates on the same score bins, via the exact max-min
    // closed form (SQL-replayable where sequential pooling is not);
    // the CALIBRATOR member of the eval family (L107 diagnoses,
    // this fixes). One corpus aggregate to B bins, O(B^3) driver
    // closed form on bounded rows.
    "q_calibration_isotonic" -> { (s, dir) =>
      Curate.isotonicCalibrate(calibrationScored(s, dir), "p_ppm",
          "is_en", buckets = 10)
        .orderBy("bin")
    },

    // L114b (r16): isotonic APPLY — the serve-time surface: every
    // row's ppm score mapped through the fitted step function
    // (driver-densified ≤64-row lookup, broadcast back map-side).
    // The scored frame is pinned once: the fit collects B-bin stats
    // from it and the apply re-reads it — unpinned, the margin
    // pipeline would execute twice.
    "q_calibration_apply" -> { (s, dir) =>
      val scored = graft.operators.Lineage.pin(calibrationScored(s, dir))
      val fit = Curate.isotonicCalibrate(scored, "p_ppm", "is_en",
        buckets = 10)
      Curate.isotonicApply(scored, "p_ppm", fit, buckets = 10)
        .select(col("doc_id"), col("p_ppm"), col("cal_ppm"))
        .orderBy("doc_id")
    },

    // L118 (r16): per-language vocabulary completeness — Good–Turing
    // unseen mass + bias-corrected Chao1 richness floor off the
    // frequency-of-frequencies; the corpus-size-planning companion
    // to L23's OOV coverage.
    "q_vocab_chao" -> { (s, dir) =>
      Curate.vocabCompleteness(t(s, dir, "documents"), "lang", "text")
        .withColumnRenamed("grp", "lang")
        .orderBy("lang")
    },

    // L115 (r16): split-conformal calibration audit — per-class
    // thresholds from a deterministic calibration fold (doc_id
    // parity), distribution-free coverage + mean-set-size efficiency
    // on the test fold, at alpha = 10% and 20%.
    "q_conformal" -> { (s, dir) =>
      Curate.conformalAudit(calibrationScored(s, dir), "p_ppm", "is_en",
          col("doc_id") % 2 === 0, alphasPm = Seq(100, 200))
        .orderBy("alpha_pm", "cls")
    },

    // L107b (r14): the one-number form — expected calibration error
    // in ppm off the same bins (B-row aggregate).
    "q_calibration_ece" -> { (s, dir) =>
      Curate.calibrationSummary(
        Curate.calibrationBins(calibrationScored(s, dir), "p_ppm", "is_en",
          buckets = 10))
    },

    // L109 (r14): exact stratified split — per-language train/val/
    // test at exact 80/10/10 within EVERY stratum (hash-threshold
    // splits are binomially noisy per stratum; a rare language can
    // land zero validation docs). Deterministic md5 order, ranked by
    // the keyed two-level prefix scan — no per-stratum global sort.
    "q_split_stratified" -> { (s, dir) =>
      Curate.stratifiedSplit(t(s, dir, "documents"), "doc_id", "lang",
          trainPm = 800, valPm = 100)
        .orderBy("id")
    },

    // L52: distributed classifier TRAINING — 3 rounds of full-batch
    // gradient descent (one vector_sum aggregate per round, model
    // broadcast) for an en-vs-rest logistic-shaped model over
    // hashed_bow features. Oracled — normally impossible for
    // iterative training — because every round is integer/rational
    // arithmetic (micro-unit weights, floor-quantized per-row
    // gradients, rational fast sigmoid, no libm), so the DuckDB
    // replay unrolls the rounds and lands on bit-identical weights.
    "q_classifier_train" -> { (s, dir) =>
      import s.implicits._
      val feats = t(s, dir, "documents").select(
        hashed_bow(tokenize_ws(col("text")), 64).as("x"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      val w = graft.operators.Train.logisticGd(feats, "x", "y",
        dims = 64, rounds = 3)
      w.zipWithIndex.map { case (wm, b) => (b.toLong, wm) }.toSeq
        .toDF("bucket", "w_micro").orderBy("bucket")
    },

    // L38b: CCNet-style perplexity bucketing — split each language into
    // LM-score terciles (head/middle/tail quality strata), the mix
    // decision CCNet/RedPajama make before sampling. Per-doc score is
    // the integer bigram-LM mass of q_lm_score (quantized conditional
    // probs, integer division — engine-exact); ntile under a unique
    // total order. One token shuffle for the model, one lang window.
    "q_ccnet_buckets" -> { (s, dir) =>
      val docScore = Shared.bigramScored(t(s, dir, "documents"), "doc_id", "text")
        .groupBy("doc_id")
        .agg(expr("sum(q) div count(1)").as("score_q"))
      val w = Window.partitionBy("lang").orderBy(col("score_q"), col("doc_id"))
      docScore.join(t(s, dir, "documents").select("doc_id", "lang"), "doc_id")
        .withColumn("bucket", ntile(3).over(w).cast("long"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"),
          min("score_q").as("min_q"), max("score_q").as("max_q"))
        .orderBy("lang", "bucket")
    },

    // L38: approximate kNN graph — every vector's k nearest neighbors
    // via shared quantizer cells (rows-only; recall vs brute force and
    // degree/self-edge contracts gated in AnnSpec). Cell count scales
    // with n like the semantic-dedup queries.
    // L38: kNN graph on the integer-quantized training path — the
    // whole candidate generator (trained cells, multi-assignment)
    // replays in the oracle, upgrading the gate from rows-only to a
    // full hash (oracle pins the sf0.01 regime: n < 4608 → 8 cells,
    // n <= 65536 → full-sample train).
    "q_knn_graph" -> { (s, dir) =>
      knnEdges(s, dir).orderBy("id", "rk")
    },

    // L64 (r11): label spreading over the kNN graph (Zhu & Ghahramani
    // label propagation, clamped seeds) — semi-supervised labeling:
    // the 5% seed slice propagates integer 2^20-unit label mass for 3
    // rounds (sum from neighbors, floor-normalize, re-clamp seeds);
    // output = per-node argmax label. Fully hash-oracled via unrolled
    // round CTEs over the same quantized knn-graph replay.
    "q_label_spread" -> { (s, dir) =>
      val seeds = t(s, dir, "embeddings")
        .filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("node"), col("label"))
      graft.operators.LabelSpread.spread(knnEdges(s, dir), "id", "nb",
          seeds, "node", "label", iters = 3)
        .orderBy("node")
    },

    // L117 (r16): kNN label-noise audit — flag vectors whose label
    // disagrees with their 5-NN majority vote (the confident-learning
    // first pass before labels train anything). Reuses the memoized
    // kNN graph; one label join + bounded per-id vote windows.
    "q_label_noise" -> { (s, dir) =>
      graft.operators.LabelSpread.labelNoiseAudit(
          knnEdges(s, dir), "id", "nb",
          t(s, dir, "embeddings"), "vec_id", "label")
        .orderBy("id")
    },

    // L38c: bulk cross-corpus kNN (semantic bulk join) — every
    // label-0 vector finds its k nearest among the rest; neither side
    // broadcasts (cluster-keyed equi-join). Rows-only; recall vs a
    // brute-force cross join is gated in AnnSpec.
    "q_bulk_knn" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val qs = e.filter(col("label") === 0)
      val corpus = e.filter(col("label") =!= 0)
      val (cells, frac) = adaptiveCells(corpus.count())
      Ann.bulkTopKQuantized(qs, corpus, "vec_id", "embedding", k = 5,
          nClusters = cells, nProbe = 3, iters = 2,
          trainFraction = frac)
        .orderBy("query_id", "rank")
    },

    // R17e: mergeable count-min sketch — the fixed-memory point-
    // frequency estimator complementing Space-Saving's top-k (ask "how
    // often did X occur", not "what are the top terms"). One
    // depth*width array per partition through the shuffle; finished
    // per-lang sketches additionally roll up to the global grain via
    // vector_sum WITHOUT rescanning tokens (counts < 2^53, so the
    // double round-trip is exact). Oracled in the exact regime (same
    // trick as q_heavy_hitters_sketch): the corpus vocabulary is tiny
    // vs width 1024, so no probe term shares all 4 rows' cells with
    // another token and every estimate equals the exact count — a
    // DuckDB group-count oracle hash-proves the sketch + vector_sum
    // rollup plumbing. The approximate regime's eps·N bound and
    // never-undercount invariants stay gated in SketchSpec.
    "q_count_min" -> { (s, dir) =>
      val probes = Seq("spark", "join", "merge", "vector", "stream")
      val perLang = t(s, dir, "documents")
        .select(col("lang"), explode(tokenize_ws(col("text"))).as("tok"))
        .groupBy("lang")
        .agg(count_min_agg(col("tok"), 4, 1024).as("cm"))
      val global = perLang
        .agg(vector_sum(transform(col("cm"), _.cast("double"))).as("cmd"))
        .select(lit("*").as("lang"), transform(col("cmd"), _.cast("long")).as("cm"))
      def probed(df: DataFrame): DataFrame = df
        .select(col("lang"), col("cm"),
          explode(array(probes.map(lit(_)): _*)).as("term"))
        .select(col("lang"), col("term"),
          count_min_estimate(col("cm"), col("term"), 4, 1024).as("est"))
      probed(perLang).union(probed(global)).orderBy("lang", "term")
    },

    // L45: link-graph centrality (weighted PageRank) — the link-based
    // source-quality signal of web curation, demonstrated on the
    // customer<->supplier purchase graph (edge weight = lineitem
    // count, both directions so the bipartite walk mixes). Integer-
    // exact fixed-point arithmetic end to end, so the iterative
    // algorithm carries a hash oracle: linkRankSql unrolls the same
    // rounds into chained DuckDB CTEs.
    "q_link_rank" -> { (s, dir) =>
      // both direction namespaces are disjoint ('c*' vs 's*' sources)
      // and each is a groupBy product, so (src, dst) is already unique
      LinkRank.pageRank(purchaseEdges(s, dir), "src", "dst", "w",
          iters = 4, assumeSummed = true)
        .orderBy(col("rank_micro").desc, col("node").asc)
    },

    // L63 (r11): deterministic DeepWalk walks over the purchase graph
    // — graph-corpus generation for node embeddings. 2 walks × 4
    // steps from every node; step = rolling_hash(node|walk|step) mod
    // degree over dst-sorted neighbors, so the full walk table is
    // reproducible AND hash-oracled (unrolled step CTEs + the
    // list_reduce hash replay).
    "q_graph_walks" -> { (s, dir) =>
      walkTable(s, dir).orderBy("start", "walk", "step")
    },

    // L63e (r12): grouped (per-tenant) walk corpora — one pass builds
    // every region's walk corpus over its own subgraph; per-group
    // bit-equivalence to a solo run is the spec gate, and the oracle
    // replays the grouped chain (grp carried through every join,
    // window, and step).
    "q_graph_walks_grouped" -> { (s, dir) =>
      walkGroupedTable(s, dir).orderBy("grp", "start", "walk", "step")
    },

    // L63b (r11): skip-gram pair extraction over the walk corpus —
    // the (center, context) training pairs a word2vec-style node
    // embedder consumes (window ±2 within each walk). One self-join
    // on the (start, walk) key + a pair groupBy; completes the
    // DeepWalk chain walk→pairs entirely hash-oracled.
    "q_walk_skipgrams" -> { (s, dir) =>
      val w = walkTable(s, dir)
      w.as("a").join(w.as("b"),
          col("a.start") === col("b.start") &&
            col("a.walk") === col("b.walk") &&
            col("a.step") =!= col("b.step") &&
            abs(col("a.step") - col("b.step")) <= 2)
        .groupBy(col("a.node").as("center"), col("b.node").as("context"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("center", "context")
    },

    // L63c (r11): node2vec biased walks — the 2nd-order variant:
    // return/stay-local/explore weights (1/6/3) resolved against
    // dst-ordered cumulative-weight windows, pick = hash mod total.
    // As deterministic and oracle-replayable as the uniform walks.
    "q_node2vec_walks" -> { (s, dir) =>
      n2vTable(s, dir).orderBy("start", "walk", "step")
    },

    // L63d (r11): word2vec-style negative sampling over the walk
    // skip-grams — K=5 negatives per center from the integer-exact
    // unigram^(3/4) distribution, picks resolved through the
    // bucketized range join. Completes the embedding-training data
    // chain walks → skip-grams → negatives, all hash-oracled.
    "q_negative_samples" -> { (s, dir) =>
      val w = walkTable(s, dir)
      val sg = w.as("a").join(w.as("b"),
          col("a.start") === col("b.start") &&
            col("a.walk") === col("b.walk") &&
            col("a.step") =!= col("b.step") &&
            abs(col("a.step") - col("b.step")) <= 2)
        .groupBy(col("a.node").as("center"), col("b.node").as("context"))
        .agg(count(lit(1)).as("n_pairs"))
      graft.operators.Walk.negativeSamples(sg, "center", "context",
          "n_pairs", k = 5)
        .orderBy("center", "k")
    },

    // L63f (r11): distributed word2vec SGNS embedding TRAINING over
    // the walk corpus — positives = skip-gram pairs, negatives = the
    // unigram^(3/4) samples; 8 dims, 2 full-batch rounds. The trained
    // (node, dim) embedding table IS the hash-gated output: a
    // node-count-sized model updated by distributed gradient sums
    // (never collected), deterministic end-to-end (hash-seeded init,
    // integer vectors, rational sigmoid, floor-quantized gradients).
    // L113 (r15): "all-but-the-top" embedding post-processing (Mu &
    // Viswanath '18) — mean-center + remove the top principal
    // direction, the standard anisotropy fix before cosine dedup/ANN.
    // Integer-quantized synchronous power iteration (3 rounds), model
    // state = two d-vectors on the driver, one aggregate per round;
    // every trunc-division sign-split so both engines agree on
    // negatives. Output is the full processed table (hash-oracled),
    // posexploded to the LONG form (vec_id, j, v) — the driver's
    // comparator sorts columns with pandas and cannot sort array
    // cells (the r15 red), and long-form is the q_embed_train shape.
    // The wide frame is PINNED before the explode: posexplode over the
    // unpinned model-literal projection forces the 64-literal zip_with
    // chain out of the fast path and the sort's sampling pass then
    // executes it twice — measured 10.0 s vs 0.36 s pinned at sf0.1
    // (the explode+sort re-reads 2 narrow columns from the checkpoint
    // instead).
    "q_embed_whiten" -> { (s, dir) =>
      graft.operators.Lineage.pin(graft.operators.Whiten.allButTheTop(
          t(s, dir, "embeddings"), "vec_id", "embedding", rounds = 3)
        .withColumnRenamed("id", "vec_id"))
        .select(col("vec_id"),
          posexplode(col("processed")).as(Seq("j", "v")), col("proj_q"))
        .orderBy("vec_id", "j")
    },

    // L113b (r16): the paper's FULL prescription — remove the top D
    // principal directions by deflation (here D=2); each pass fits the
    // residual table's top direction and projects it out, the
    // dequantize→requantize handoff between passes lossless on binary
    // powers, so the composition hash-oracles (pass b of the SQL twin
    // reads pass a's integer output directly).
    "q_embed_whiten2" -> { (s, dir) =>
      graft.operators.Lineage.pin(graft.operators.Whiten.removeTopComponents(
          t(s, dir, "embeddings"), "vec_id", "embedding",
          components = 2, rounds = 3)
        .withColumnRenamed("id", "vec_id"))
        .select(col("vec_id"), posexplode(col("processed")).as(Seq("j", "v")))
        .orderBy("vec_id", "j")
    },

    // C13al batch twin (r16): the whitening model DERIVED FROM THE
    // MOMENT STORE — momentStats (exactly-additive d(d+1)/2+d+1-row
    // state, the per-trigger streaming fold) → modelFromMoments
    // (driver-side power iteration on the exact centered second-moment
    // matrix, d² doubles, fixed-order folds). Hash-oracled: DuckDB
    // replays the HUGEINT moment arithmetic and the IEEE fold order.
    "q_whiten_model" -> { (s, dir) =>
      import s.implicits._
      val stats = graft.operators.Whiten.momentStats(
          t(s, dir, "embeddings"), "vec_id", "embedding")
        .collect()
        .map(r => (r.getInt(0), r.getInt(1),
          BigDecimal(r.getDecimal(2)))).toSeq
      val (_, mu, v) =
        graft.operators.Whiten.modelFromMoments(stats, rounds = 3)
      mu.indices.map(j => (j, mu(j), v(j))).toDF("j", "mu", "v")
        .orderBy("j")
    },

    "q_embed_train" -> { (s, dir) =>
      val w = walkTable(s, dir)
      // pinned once: the pos branch AND negativeSamples both read it
      val sg = w.as("a").join(w.as("b"),
          col("a.start") === col("b.start") &&
            col("a.walk") === col("b.walk") &&
            col("a.step") =!= col("b.step") &&
            abs(col("a.step") - col("b.step")) <= 2)
        .groupBy(col("a.node").as("center"), col("b.node").as("context"))
        .agg(count(lit(1)).as("n_pairs"))
        .transform(graft.operators.Lineage.pin)
      val pos = sg.select(col("center"), col("context").as("x"),
        lit(1L).as("y"))
      val neg = graft.operators.Walk.negativeSamples(sg, "center",
          "context", "n_pairs", k = 5)
        .select(col("center"), col("neg_node").as("x"), lit(0L).as("y"))
      graft.operators.Train.skipgramSgd(pos.unionByName(neg),
          "center", "x", "y", dims = 8, rounds = 2)
        .orderBy("node", "d")
    },

    // L45b: TrustRank — teleport mass restricted to a trusted seed set
    // (suppliers from the first five nations stand in for a vetted
    // domain allowlist); rank becomes proximity-to-trust, the
    // seed-propagated quality score that damps spam sources.
    "q_trust_rank" -> { (s, dir) =>
      val seeds = t(s, dir, "supplier")
        .filter(col("s_nationkey") < 5)
        .select(concat(lit("s"), col("s_suppkey")).as("node"))
      LinkRank.trustRank(purchaseEdges(s, dir), "src", "dst", "w",
          seeds, "node", iters = 4, assumeSummed = true)
        .orderBy(col("rank_micro").desc, col("node").asc)
    },

    // L46: DSIR importance selection — pick the documents whose hashed
    // n-gram (uni+bi) feature profile is most target-like; here the
    // target exemplar set is the English slice standing in for a
    // trusted high-quality corpus. Integer-exact quantized probability
    // ratios instead of the paper's libm log-weights, so the iterative-
    // model selection carries a hash oracle; top-k is the paper's
    // deterministic resample baseline.
    "q_dsir_select" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents")
      val scored = Curate.dsirScores(d, "doc_id", "text",
        col("lang") === "en", buckets = 1024)
      // distributed TakeOrdered first; the global rank window then only
      // ever sees the 200 survivors (never the corpus)
      val top = scored.orderBy(col("score_q").desc, col("doc_id").asc)
        .limit(200)
      val w = Window.orderBy(col("score_q").desc, col("doc_id").asc)
      top.join(d.select(col("doc_id"), col("lang")), "doc_id")
        .withColumn("rank", row_number().over(w).cast("long"))
        .select("rank", "doc_id", "lang", "n_feats", "score_q")
        .orderBy("rank")
    },

    // L46b: grouped DSIR — one importance model per source, all
    // trained in one (grp, f) shuffle; each source's docs score
    // against their OWN model's target/raw totals; top-5 per source
    // (per-group window, never a global sort). Fully oracled.
    "q_dsir_grouped" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents")
      val model = Curate.dsirModelGrouped(d, "doc_id", "text", "source",
        col("lang") === "en")
      val w = Window.partitionBy("grp")
        .orderBy(col("score_q").desc, col("doc_id").asc)
      Curate.dsirApplyGrouped(d, "doc_id", "text", "source", model)
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("grp").as("source"), col("rank"), col("doc_id"),
          col("n_feats"), col("score_q"))
        .orderBy("source", "rank")
    },

    // L50: corpus drift — TV distance between hashed n-gram profiles,
    // on two natural splits: parity halves (same distribution, small
    // drift) and en-vs-zh (different languages, large drift). The
    // magnitude ordering is data, not an assertion (oracled).
    "q_corpus_drift" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      def prof(f: org.apache.spark.sql.DataFrame) =
        Curate.corpusProfile(f, "doc_id", "text")
      val parity = Curate.profileDrift(
          prof(d.filter(col("doc_id") % 2 === 0)),
          prof(d.filter(col("doc_id") % 2 =!= 0)))
        .select(lit("parity").as("split"), col("n_a"), col("n_b"), col("tv_q"))
      val langs = Curate.profileDrift(
          prof(d.filter(col("lang") === "en")),
          prof(d.filter(col("lang") === "zh")))
        .select(lit("en_vs_zh").as("split"), col("n_a"), col("n_b"), col("tv_q"))
      parity.unionByName(langs).orderBy("split")
    },

    // R47: two-sample Kolmogorov–Smirnov drift — exact sup-norm CDF
    // distance in integer ppm (no float CDFs), the
    // mid-distribution-shift gate the profile stores can't see.
    // Distributed via two PrefixSum scans over the distinct-value
    // frame; fully hash-oracled. Probed on the returned-vs-normal
    // price distributions plus a same-distribution control (parity
    // halves of the same flag — near-zero D).
    "q_ks_drift" -> { (s, dir) =>
      val l = t(s, dir, "lineitem")
      val rn = graft.operators.Observe.ksDrift(
          l.filter(col("l_returnflag") === "R"), "l_extendedprice",
          l.filter(col("l_returnflag") === "N"), "l_extendedprice")
        .select(lit("r_vs_n").as("split"), col("n_a"), col("n_b"),
          col("d_ppm"), col("at_value"))
      val par = graft.operators.Observe.ksDrift(
          l.filter(col("l_returnflag") === "R" && col("l_orderkey") % 2 === 0),
          "l_extendedprice",
          l.filter(col("l_returnflag") === "R" && col("l_orderkey") % 2 === 1),
          "l_extendedprice")
        .select(lit("parity").as("split"), col("n_a"), col("n_b"),
          col("d_ppm"), col("at_value"))
      rn.unionByName(par).orderBy("split")
    },

    // R55 (r16): Mann–Whitney rank-sum drift — the location-shift
    // companion to R47's KS on the same two splits (R-vs-N prices:
    // real shift question; parity halves: null control whose auc_ppm
    // must sit near 500000). One support groupBy + ONE two-level
    // prefix scan + a 1-row aggregate per split; the doubled-midrank
    // trick keeps ties integer-exact.
    "q_rank_sum" -> { (s, dir) =>
      val l = t(s, dir, "lineitem")
      val rn = graft.operators.Observe.rankSumDrift(
          l.filter(col("l_returnflag") === "R"), "l_extendedprice",
          l.filter(col("l_returnflag") === "N"), "l_extendedprice")
        .select(lit("r_vs_n").as("split"), col("n_a"), col("n_b"),
          col("u2"), col("auc_ppm"), col("varpp_micro"))
      val par = graft.operators.Observe.rankSumDrift(
          l.filter(col("l_returnflag") === "R" && col("l_orderkey") % 2 === 0),
          "l_extendedprice",
          l.filter(col("l_returnflag") === "R" && col("l_orderkey") % 2 === 1),
          "l_extendedprice")
        .select(lit("parity").as("split"), col("n_a"), col("n_b"),
          col("u2"), col("auc_ppm"), col("varpp_micro"))
      rn.unionByName(par).orderBy("split")
    },

    // R56 (r16): chi-square categorical drift — the drift-family
    // member for distributions with no order (lang shares): release
    // halves src0-9 vs src10-19 (the real question) + doc_id parity
    // (null control), per-lang contributions + the __total row. One
    // C-row groupBy per split; the bounded tail math carries all the
    // width.
    "q_chi2_drift" -> { (s, dir) =>
      val d = t(s, dir, "documents")
        .withColumn("__srcnum",
          expr("cast(substr(source, 4) as int)"))
      val halves = graft.operators.Observe.chiSquareDrift(
          d.filter(col("__srcnum") < 10), "lang",
          d.filter(col("__srcnum") >= 10), "lang")
        .select(lit("halves").as("split"), col("category"),
          col("o_a"), col("o_b"), col("contrib_micro"))
      val par = graft.operators.Observe.chiSquareDrift(
          d.filter(col("doc_id") % 2 === 0), "lang",
          d.filter(col("doc_id") % 2 === 1), "lang")
        .select(lit("parity").as("split"), col("category"),
          col("o_a"), col("o_b"), col("contrib_micro"))
      halves.unionByName(par).orderBy("split", "category")
    },

    // R50: pre-flight join-size estimation from CM sketches — the
    // sizing answer an optimizer needs BEFORE running a 100 TB join,
    // from two persistable 1-row sketches. Exact-regime gate (the
    // q_count_min rule): 25 nation keys vs width 2048 leave at least
    // one collision-free hash row, so the min-row inner product
    // EQUALS the true join size and the DuckDB exact-Σ(fa·fb) replay
    // hash-proves the estimator end to end.
    "q_join_size_est" -> { (s, dir) =>
      graft.operators.Sketch.joinSizeEstimate(
        t(s, dir, "customer"), "c_nationkey",
        t(s, dir, "supplier"), "s_nationkey", depth = 5, width = 2048)
    },

    // R49: Theta-sketch overlap matrix — |A∩B| / |A\B| / Jaccard for
    // every source pair from one corpus pass + S-row sketch algebra
    // (the set-operation question HLL cannot answer). Keys are
    // 3-token shingles (source jaccards 0.01–0.08 at gate SF — the
    // flat word vocabulary is shared across every source and would be
    // degenerate); ~1300 shingles per source sit far under 2^14, so
    // θ = 1 and every estimate is the exact cardinality — fully
    // hash-oracled against DuckDB's literal set arithmetic.
    "q_theta_overlap" -> { (s, dir) =>
      val sh = graft.operators.Scale.fan(
          t(s, dir, "documents").select("source", "text"))
        .select(col("source"),
          explode(graft.functions.shingles(col("text"), 3)).as("sh"))
      graft.operators.Sketch.overlapMatrix(sh, "source", "sh", lgK = 14)
        .orderBy("grp_a", "grp_b")
    },

    // L96: memorization-canary roundtrip — deterministic injection
    // (doc_id slot rule, every 10th doc per canary) + one-AC-scan
    // audit on BOTH the injected corpus (planted rates land) and the
    // clean corpus (zero-leak gate). Fully hash-oracled: DuckDB
    // replays the injection rule and the substring detection.
    "q_canary_audit" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val canaries = Seq(
        "canary 7f3q9z alpha", "canary 2k8x1v beta",
        "canary 9p4m6w gamma", "canary 5d0n2r delta")
      val injected = Curate.injectCanaries(d, "doc_id", "text",
        canaries, everyN = 10L)
      val inj = Curate.canaryAudit(injected, "text", canaries)
        .withColumn("stage", lit("injected"))
      val clean = Curate.canaryAudit(d, "text", canaries)
        .withColumn("stage", lit("clean"))
      clean.unionByName(inj).orderBy("stage", "canary_id")
    },

    // L47: Gopher quality rules — the published web-corpus pre-filter
    // battery, one audit flag per rule + the keep conjunction; every
    // threshold a cross-multiplied integer comparison (engine-exact,
    // hash-oracled). Map-side single pass, zero shuffles.
    "q_gopher_rules" -> { (s, dir) =>
      // stop list adapted to the synthetic corpus's vocabulary (of the
      // published list only 'the' occurs at all); the operator default
      // stays Gopher's 8-word list
      Curate.gopherFlags(t(s, dir, "documents"), "doc_id", "text",
          stopWords = Seq("the", "a"))
        .orderBy("doc_id")
    },

    // L51: C4 bad-words blocklist filter — zero-tolerance keep plus
    // integer hit accounting (total, distinct, hits-per-mille) so other
    // policies derive without a second pass. The blocklist here is
    // adapted to the synthetic vocabulary ('slow'/'stream' stand in
    // for the published list's terms). Map-side, zero shuffles, fully
    // oracled.
    "q_blocklist" -> { (s, dir) =>
      Curate.blocklistFlags(t(s, dir, "documents"), "doc_id", "text",
          terms = Seq("slow", "stream"))
        .orderBy("doc_id")
    },

    // L51b: per-language blocklists — en/zh/de carry their own lists,
    // es/fr fall back to the default. One lazy CASE of fused kernels,
    // map-side, fully oracled.
    "q_blocklist_grouped" -> { (s, dir) =>
      Curate.blocklistFlagsByLang(t(s, dir, "documents"), "doc_id",
          "text", "lang",
          lists = Map(
            "en" -> Seq("slow", "stream"),
            "zh" -> Seq("slow"),
            "de" -> Seq("window")),
          default = Seq("stream"))
        .orderBy("doc_id")
    },

    // L87: SUBSTRING blocklist (Aho–Corasick) — phrases and sub-token
    // strings the whole-token L51 filter cannot see, every pattern in
    // ONE O(len + matches) codegen'd pass. Map-side, zero shuffles,
    // fully oracled (the SQL replay counts match start offsets).
    "q_substring_blocklist" -> { (s, dir) =>
      Curate.substringBlocklist(t(s, dir, "documents"), "doc_id", "text",
          SubstringPatterns)
        .orderBy("doc_id")
    },

    // L87 attribution twin: which blocklist entries fire, on how many
    // docs, how often — from the same single scan; the shuffle carries
    // <= P rows per map task (partial agg over pid), never the corpus.
    "q_substring_attr" -> { (s, dir) =>
      Curate.substringMatchProfile(t(s, dir, "documents"), "text",
          SubstringPatterns)
        .orderBy("pid")
    },

    // L89: HITS hubs & authorities over the directed customer→supplier
    // purchase graph (3 rounds, integer fixed-point, per-round L1
    // renorm) — fully hash-oracled via unrolled CTEs (hitsSql).
    "q_hits" -> { (s, dir) =>
      val pairs = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("w"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"), col("w"))
      LinkRank.hits(pairs, "src", "dst", "w", iters = 3, assumeSummed = true)
        .orderBy("node")
    },

    // L93: deterministic word-dropout augmentation — 150‰ dropout,
    // seed 7; every decision a pure function of (doc_id, pos, seed),
    // fully hash-oracled including the augmented text.
    "q_augment_dropout" -> { (s, dir) =>
      Curate.augmentDropout(t(s, dir, "documents"), "doc_id", "text",
          dropPm = 150, seed = 7L)
        .orderBy("doc_id")
    },

    // L94: character-distribution concentration — the gibberish /
    // binary-noise filter via the integer Simpson collision index
    // (rational Rényi-2 entropy surrogate, no libm). Thresholds sit
    // inside the corpus distribution (median simpson ≈ 75.8k ppm) so
    // the keep flag discriminates at gate SF. Map-side kernel, zero
    // shuffles; fully hash-oracled.
    "q_char_concentration" -> { (s, dir) =>
      Curate.charConcentration(t(s, dir, "documents"), "doc_id", "text",
          maxSimpsonPpm = 78000L, minDistinctCp = 20L)
        .orderBy("doc_id")
    },

    // L92: intra-document language-mixture audit — 16-token chunks
    // lang-id'd with the L8 marker scorer ('und' on zero evidence),
    // per-doc dominant language + share + mixed flag. One explode +
    // doc-keyed rollups; fully oracled.
    "q_lang_mixture" -> { (s, dir) =>
      Curate.langMixture(t(s, dir, "documents"), "doc_id", "text",
          chunkTokens = 16)
        .orderBy("doc_id")
    },

    // L91: n-gram diversity audit — per-source distinct/total n-gram
    // ratios (n = 1..3), the synthetic-data mode-collapse signal
    // per-doc repetition rules can't see. One explode + one
    // (grp, shingle) count per n; fully oracled.
    "q_ngram_diversity" -> { (s, dir) =>
      Curate.ngramDiversity(t(s, dir, "documents"), "text", "source",
          maxN = 3)
        .withColumnRenamed("grp", "source")
        .orderBy("source", "n")
    },

    // L54: tokenizer fertility per language — pre-tokens/word and
    // chars/token in integer µ-units; the tokenizer-equity audit.
    // Map-side kernels + one 5-key groupBy, fully oracled.
    "q_tokenizer_fertility" -> { (s, dir) =>
      Curate.tokenizerFertility(t(s, dir, "documents"), "text", "lang",
          "n_chars")
        .withColumnRenamed("grp", "lang")
        .orderBy("lang")
    },

    // L55: curation scorecard — per-source attrition across gopher /
    // repetition / blocklist rule families, ONE corpus pass (all flags
    // map-side on the same row + one 20-key groupBy). Fully oracled.
    "q_curation_scorecard" -> { (s, dir) =>
      Curate.scorecard(t(s, dir, "documents"), "doc_id", "text", "source",
          stopWords = Seq("the", "a"), blocklist = Seq("slow", "stream"))
        .withColumnRenamed("grp", "source")
        .orderBy("source")
    },

    // L75: preference pairs — chosen/rejected by token-count margin
    // within each (lang, source) pool: the DPO-shaped dataset
    // construction, margin-filtered (>= 10 tokens apart) so near-tied
    // pools never emit noisy labels. Fully oracled.
    "q_preference_pairs" -> { (s, dir) =>
      Curate.preferencePairs(
          t(s, dir, "documents")
            .withColumn("pool", concat_ws("|", col("lang"), col("source")))
            .withColumn("score", token_count(col("text"))),
          "pool", "doc_id", "score", minMargin = 10L)
        .orderBy("pool")
    },

    // L74: corpus card — the release document's numeric content
    // (per-(lang,source) accounting + language mixture + per-source
    // rule attrition) as ONE long-format integer-exact frame; fully
    // hash-oracled by composing the already-oracled stats/scorecard
    // replays. Params in LOCKSTEP with q_curation_scorecard.
    "q_corpus_card" -> { (s, dir) =>
      graft.operators.CorpusCard.cardRows(t(s, dir, "documents"),
        "doc_id", "text", "lang", "source",
        stopWords = Seq("the", "a"), blocklist = Seq("slow", "stream"))
    },

    // 11a: the per-tenant corpus card — tenant = source; composition
    // + mixture within each tenant, rule attrition per (tenant, lang).
    // Params in LOCKSTEP with q_corpus_card / q_curation_scorecard.
    "q_corpus_card_grouped" -> { (s, dir) =>
      graft.operators.CorpusCard.cardRowsGrouped(t(s, dir, "documents"),
        "doc_id", "text", "lang", "source",
        stopWords = Seq("the", "a"), blocklist = Seq("slow", "stream"))
    },

    // L5b: semantic dedup (SemDeDup) — cluster-then-verify over the
    // embedding space, on the integer-quantized training path: the
    // blocking step replays in the oracle, so the pair set is a FULL
    // hash gate (upgraded from rows-only in r10). Precision is exact
    // by construction (every pair is cosine-verified); recall vs exact
    // all-pairs gated in DedupSpec. The cell count scales with the
    // corpus (target ~512 vectors/cell): per-cell all-pairs is the
    // SemDeDup contract, so FIXED C would be O(n²/C) — quadratic again
    // at 100× the data. Adaptive C keeps the per-cell work constant
    // (one cheap count job to size it).
    "q_semantic_dedup" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val (cells, frac) = adaptiveCells(e.count())
      Dedup.semanticPairsQuantized(e, "vec_id", "embedding",
          nClusters = cells, minCosine = 0.4, iters = 2,
          trainFraction = frac)
        .orderBy("id1", "id2")
    },

    // L86 (r13): prototypicality curation — the SSL-prototypes /
    // DataComp cluster-pruning policy over the embedding space:
    // per-cell distance rank to the trained centroid, head band
    // (near-prototype redundancy) and tail band (outliers) flagged
    // for removal, middle band kept. nClusters=8 / full-sample train
    // pin the sf0.01 oracle regime (the q_semantic_dedup convention);
    // production uses the adaptive C ∝ n sizing.
    "q_prototypicality" -> { (s, dir) =>
      graft.operators.Ann.prototypicality(t(s, dir, "embeddings"),
          "vec_id", "embedding", nClusters = 8, iters = 2,
          trainFraction = 1.0, headPermille = 100, tailPermille = 100)
        .orderBy("cluster", "rk")
    },

    // L5c: embedding-FREE semantic dedup — the full native chain
    // text -> hashed_bow vector -> k-means cells -> verified cosine
    // pairs, no external embedding model anywhere; hash-oracled end to
    // end (the bow featurizer replays via the shared rolling-hash CTE,
    // the quantizer via the unrolled Lloyd CTEs).
    "q_semantic_dedup_text" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val n = d.count()
      val (cells, frac) = adaptiveCells(n)
      Dedup.semanticPairsQuantized(
          graft.operators.Scale.fan(d.select("doc_id", "text"))
            .select(col("doc_id"),
              hashed_bow(tokenize_ws(col("text")), 64).as("v")),
          "doc_id", "v",
          nClusters = cells, minCosine = 0.9, iters = 2,
          trainFraction = frac)
        .orderBy("id1", "id2")
    })

  /** DuckDB replay of [[graft.operators.Train.logisticGd]] with the
    * rounds UNROLLED into chained CTEs (w0 → m1/g1/s1/w1 → …): legal
    * as an oracle only because every step is integer or
    * fixed-order-rational arithmetic — the double chain inside g must
    * stay in LOCKSTEP with the operator. Sparse (bucket, x) features
    * from the shared hashed-bow CTE + a bias row per doc. */
  private def classifierTrainSql(dims: Int, rounds: Int,
                                 lrNum: Long, lrDen: Long): String = {
    val sb = new StringBuilder
    sb ++= s"WITH ${Shared.hashedBowCteSql("documents", "doc_id", "text", "d")},\n"
    sb ++= s"""feats AS (
              |  SELECT doc_id, bucket, x FROM (
              |    SELECT doc_id, bucket, w AS x FROM dbow
              |    UNION ALL
              |    SELECT doc_id, $dims AS bucket, CAST(1 AS BIGINT) AS x
              |    FROM documents)),
              |lbl AS (SELECT doc_id,
              |          CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
              |        FROM documents),
              |nn AS (SELECT COUNT(*) AS n FROM documents),
              |w0 AS (SELECT UNNEST(range(0, ${dims + 1})) AS bucket,
              |              CAST(0 AS BIGINT) AS wm),
              |""".stripMargin
    for (r <- 1 to rounds) {
      sb ++= s"""m$r AS (
                |  SELECT f.doc_id, CAST(SUM(f.x * w.wm) AS BIGINT) AS mm
                |  FROM feats f JOIN w${r - 1} w USING (bucket)
                |  GROUP BY f.doc_id),
                |g$r AS (
                |  SELECT m.doc_id,
                |    CAST(FLOOR((l.y - (0.5 + (mm / 1048576.0) /
                |      (2.0 * (1.0 + ABS(mm / 1048576.0))))) * 1048576.0)
                |      AS BIGINT) AS g
                |  FROM m$r m JOIN lbl l USING (doc_id)),
                |s$r AS (
                |  SELECT f.bucket, CAST(SUM(f.x * g.g) AS BIGINT) AS s
                |  FROM feats f JOIN g$r g USING (doc_id) GROUP BY f.bucket),
                |w$r AS (
                |  SELECT w.bucket,
                |    w.wm + CAST(FLOOR(CAST($lrNum * COALESCE(s.s, 0) AS DOUBLE)
                |      / ($lrDen * n.n)) AS BIGINT) AS wm
                |  FROM w${r - 1} w LEFT JOIN s$r s USING (bucket) CROSS JOIN nn n),
                |""".stripMargin
    }
    sb.setLength(sb.length - 2) // drop the trailing ",\n"
    sb ++= s"\nSELECT bucket, wm AS w_micro FROM w$rounds ORDER BY bucket"
    sb.toString
  }

  /** Bidirectional customer<->supplier purchase graph: edge weight =
    * lineitem count for the pair, node namespaces 'c<key>' / 's<key>'.
    * Both directions are groupBy products over disjoint source
    * namespaces, so (src, dst) is unique — callers pass
    * `assumeSummed = true`. */
  /** Memoized per (session, dir): q_link_rank and q_trust_rank share
    * one materialized graph build (the lineitem⋈orders groupBy is the
    * expensive half of both queries — same build-once amortization as
    * the lexical index memo). Keyed by session identity too: a frame
    * from a stopped session must not leak into a new one. */
  /** Memoized deterministic walk corpora, persisted to a PATH (the
    * r10 advisor rule: paths re-resolve in any session, cached frames
    * don't): the walks are bit-deterministic, so build-once is exact,
    * and three queries consume them (walk listing, skip-gram pairs,
    * and their bench re-runs) — same amortization as the pair graph
    * and the index memos. */
  private val walkMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def walkTable(s: SparkSession, dir: String): DataFrame = {
    val path = walkMemo.computeIfAbsent(dir, d => {
      val p = "spark-warehouse/graft_walks_" + RelationalQueries.dirKey(d)
      graft.operators.Walk.deterministicWalks(purchaseEdges(s, d),
          "src", "dst", nWalks = 2, len = 4)
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** Region-grouped purchase graph: each (customer, supplier) edge
    * belongs to its customer's region (one nation -> one region, so
    * the groups PARTITION the edge set and a group's subgraph equals
    * the solo graph restricted to it — the equivalence the grouped
    * walk spec asserts). */
  private def purchaseEdgesGrouped(s: SparkSession, dir: String): DataFrame = {
    val pairs = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("grp"), col("o_custkey"), col("l_suppkey"))
      .agg(count(lit(1)).as("w"))
    pairs.select(col("grp"),
        concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .unionByName(pairs.select(col("grp"),
        concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("c"), col("o_custkey")).as("dst")))
  }

  private val walkGroupedMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def walkGroupedTable(s: SparkSession, dir: String): DataFrame = {
    val path = walkGroupedMemo.computeIfAbsent(dir, d => {
      val p = "spark-warehouse/graft_walksg_" + RelationalQueries.dirKey(d)
      graft.operators.Walk.deterministicWalksGrouped(
          purchaseEdgesGrouped(s, d), "grp", "src", "dst",
          nWalks = 2, len = 4)
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  private val n2vMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def n2vTable(s: SparkSession, dir: String): DataFrame = {
    val path = n2vMemo.computeIfAbsent(dir, d => {
      val p = "spark-warehouse/graft_n2v_" + RelationalQueries.dirKey(d)
      graft.operators.Walk.node2vecWalks(purchaseEdges(s, d),
          "src", "dst", nWalks = 2, len = 4,
          wBack = 1L, wCommon = 6L, wFar = 3L)
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** Memoized quantized kNN graph, persisted to a PATH — the
    * training is integer-quantized (bit-deterministic), so build-once
    * is exact; q_knn_graph and q_label_spread share it. */
  private val knnEdgesMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def knnEdges(s: SparkSession, dir: String): DataFrame = {
    val path = knnEdgesMemo.computeIfAbsent(dir, d => {
      val p = "spark-warehouse/graft_knn_" + RelationalQueries.dirKey(d)
      val e = t(s, d, "embeddings")
      val (cells, frac) = adaptiveCells(e.count())
      Ann.knnGraphQuantized(e, "vec_id", "embedding", k = 5,
          nClusters = cells, iters = 2,
          trainFraction = frac)
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  private val purchaseEdgesMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def purchaseEdges(s: SparkSession, dir: String): DataFrame =
    purchaseEdgesMemo.computeIfAbsent(
      s"${System.identityHashCode(s)}:$dir", _ => {
        val pairs = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"), col("l_suppkey"))
          .agg(count(lit(1)).as("w"))
        pairs.select(
            concat(lit("c"), col("o_custkey")).as("src"),
            concat(lit("s"), col("l_suppkey")).as("dst"), col("w"))
          .unionByName(pairs.select(
            concat(lit("s"), col("l_suppkey")).as("src"),
            concat(lit("c"), col("o_custkey")).as("dst"), col("w")))
          .transform(graft.operators.Lineage.pin)
      })

  /** DuckDB replay of [[graft.operators.LinkRank.pageRank]] with the
    * power-iteration rounds UNROLLED into chained CTEs (r0 -> c1/i1/r1
    * -> ...): a valid hash oracle because every step is a floor of a
    * product/ratio of non-negative integers plus an order-insensitive
    * integer sum — the per-edge product is widened through HUGEINT to
    * mirror the operator's decimal(38,0) widening. Same sink-loss
    * dangling rule, same pre-summed parallel edges. */
  private def linkRankSql(iters: Int, dampNum: Long, dampDen: Long,
                          scale: Long,
                          seedsSql: Option[String] = None): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH pairs AS (
              |  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
              |         's' || CAST(l_suppkey AS VARCHAR) AS dst,
              |         CAST(COUNT(*) AS BIGINT) AS w
              |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |  GROUP BY 1, 2),
              |edges AS (
              |  SELECT src, dst, w FROM pairs
              |  UNION ALL
              |  SELECT dst AS src, src AS dst, w FROM pairs),
              |nodes AS (
              |  SELECT src AS node FROM edges
              |  UNION
              |  SELECT dst AS node FROM edges),
              |outw AS (SELECT src, SUM(w) AS outw FROM edges GROUP BY src),
              |""".stripMargin
    // gseeds = teleport receivers present in the graph; nt = their
    // count (uniform PageRank teleports to every node).
    seedsSql match {
      case None =>
        sb ++= """gseeds AS (SELECT node FROM nodes),
                 |""".stripMargin
      case Some(ssql) =>
        sb ++= s"""gseeds AS (
                  |  SELECT DISTINCT n.node FROM nodes n
                  |  JOIN ($ssql) s ON n.node = s.node),
                  |""".stripMargin
    }
    sb ++= s"""nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_t FROM gseeds),
              |r0 AS (
              |  SELECT n.node,
              |    CASE WHEN g.node IS NOT NULL
              |      THEN (SELECT $scale // n_t FROM nt)
              |      ELSE CAST(0 AS BIGINT) END AS rank
              |  FROM nodes n LEFT JOIN gseeds g ON n.node = g.node),
              |""".stripMargin
    for (k <- 1 to iters) {
      sb ++= s"""c$k AS (
                |  SELECT e.dst,
                |    (CAST(r.rank AS HUGEINT) * e.w) // o.outw AS c
                |  FROM edges e
                |  JOIN r${k - 1} r ON e.src = r.node
                |  JOIN outw o ON e.src = o.src),
                |i$k AS (SELECT dst, CAST(SUM(c) AS BIGINT) AS inm
                |        FROM c$k GROUP BY dst),
                |r$k AS (
                |  SELECT n.node,
                |    CASE WHEN g.node IS NOT NULL
                |      THEN (SELECT ($scale * ${dampDen - dampNum}) // ($dampDen * n_t)
                |            FROM nt)
                |      ELSE CAST(0 AS BIGINT) END
                |    + ($dampNum * COALESCE(i.inm, 0)) // $dampDen AS rank
                |  FROM nodes n
                |  LEFT JOIN gseeds g ON n.node = g.node
                |  LEFT JOIN i$k i ON n.node = i.dst),
                |""".stripMargin
    }
    sb.setLength(sb.length - 2) // drop the trailing ",\n"
    sb ++= s"\nSELECT node, CAST(rank AS BIGINT) AS rank_micro FROM r$iters" +
      " ORDER BY rank_micro DESC, node"
    sb.toString
  }

  /** DuckDB twin of Curate.gopherFlags' fused stat pass (leading WITH
    * included, ends at the `m` CTE) — shared by q_gopher_rules and the
    * L72 rule-example sampler. */
  /** Gopher-stat CTE body (no leading WITH) — shared with the
    * composed-pipeline oracle in PipelineQueries, which needs to
    * splice it into a WITH RECURSIVE chain. */
  private[queries] val gopherMBodySql: String =
    """stats AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS w,
      |    string_split(text, chr(10)) AS lines
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    CAST(len(w) AS BIGINT) AS n_words,
      |    CAST(list_sum(list_prepend(0, list_transform(w, x -> len(x)))) AS BIGINT) AS sumlen,
      |    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha,
      |    CAST(len(list_filter(w, x -> x = '#')) +
      |         len(list_filter(w, x -> x LIKE '%...')) AS BIGINT) AS sym,
      |    CAST(len(list_filter(['the','a'],
      |         s -> list_contains(w, s))) AS BIGINT) AS stop,
      |    CAST(len(lines) AS BIGINT) AS nl,
      |    CAST(len(list_filter(lines, l -> l LIKE '-%' OR l LIKE '*%')) AS BIGINT) AS bullet,
      |    CAST(len(list_filter(lines, l -> l LIKE '%...')) AS BIGINT) AS ell
      |  FROM stats)""".stripMargin

  private val gopherMCteSql: String = "WITH " + gopherMBodySql

  /** DuckDB twin of `Curate.unimaxAlloc` over per-lang token sizes
    * (leading WITH included, ends at the `ua` CTE with
    * (lang, t_tok, cap, alloc)) — parameterized exactly like the
    * Scala call sites. */
  private def unimaxCteSql(maxEpochs: Long, budNum: Long, budDen: Long): String =
    s"""WITH toks AS (
      |  SELECT lang,
      |    CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0))
      |      AS BIGINT) AS n_tok
      |  FROM documents),
      |sizes AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS t_tok
      |          FROM toks GROUP BY lang),
      |caps AS (SELECT lang, t_tok, t_tok * $maxEpochs AS cap FROM sizes),
      |idx AS (
      |  SELECT lang, t_tok, cap,
      |    CAST(ROW_NUMBER() OVER (ORDER BY cap, lang) AS BIGINT) AS i,
      |    CAST(SUM(cap) OVER (ORDER BY cap, lang
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pfx,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS l,
      |    CAST(SUM(t_tok) OVER () * $budNum // $budDen AS BIGINT) AS bud
      |  FROM caps),
      |flag AS (
      |  SELECT idx.*,
      |    cap * (l - i + 1) + (pfx - cap) <= bud AS capped
      |  FROM idx),
      |kf AS (
      |  SELECT MAX(CASE WHEN capped THEN i ELSE 0 END) AS k,
      |         MAX(CASE WHEN capped THEN pfx ELSE 0 END) AS pk
      |  FROM flag),
      |ua AS (
      |  SELECT f.lang, f.t_tok, f.cap,
      |    CAST(CASE WHEN f.i <= kf.k THEN f.cap
      |              ELSE (f.bud - kf.pk) // (f.l - kf.k) END AS BIGINT) AS alloc
      |  FROM flag f, kf)""".stripMargin

  /** DuckDB twin of [[classifierMargin]] (leading WITH included, ends
    * at the `m` CTE): kept in LOCKSTEP with the Scala frame. */
  private val classifierMarginCteSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    UNNEST(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS tok
      |  FROM documents),
      |hashed AS (
      |  SELECT doc_id, lang,
      |    list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_transform(regexp_extract_all(tok, '.'),
      |          c -> CAST(unicode(c) AS BIGINT))),
      |      (a, b) -> (a * 31 + b) % 1000000007) AS h
      |  FROM toks),
      |feats AS (
      |  SELECT doc_id, lang, h % 64 AS bucket,
      |    CAST(SUM(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS x
      |  FROM hashed GROUP BY doc_id, lang, h % 64),
      |counts AS (
      |  SELECT CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
      |    CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_other
      |  FROM documents),
      |bw AS (
      |  SELECT bucket,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN x ELSE 0 END) AS BIGINT) AS s_en,
      |    CAST(SUM(x) AS BIGINT) AS s_all
      |  FROM feats GROUP BY bucket),
      |w AS (
      |  SELECT bucket, n_other * s_en - n_en * (s_all - s_en) AS wgt
      |  FROM bw, counts),
      |m AS (
      |  SELECT f.doc_id, f.lang, CAST(SUM(f.x * w.wgt) AS BIGINT) AS margin
      |  FROM feats f JOIN w USING (bucket) GROUP BY f.doc_id, f.lang)""".stripMargin

  /** Shared tail of the SemDeDup oracle replays: multi-assignment
    * blocking (top-2 cells by quantized L2) + within-cell verified
    * cosine at `minCos`. The zero-norm guard mirrors the Spark
    * kernel's `cosine == 0.0 on zero norm` convention (NaN compares
    * GREATER in some engines, so an unguarded NaN >= threshold would
    * diverge). Expects the training CTEs (`v` .. `c2`) upstream. */
  private def semanticDedupTailSql(minCos: Double): String =
    s"""idxm AS (
       |  SELECT nn_id, vec, c AS cluster FROM (
       |    SELECT x.nn_id, x.vec, s.c,
       |      ROW_NUMBER() OVER (PARTITION BY x.nn_id
       |        ORDER BY ${Shared.l2qDistSql("x.vq", "s.cent")} ASC, s.c ASC) AS rn
       |    FROM v x CROSS JOIN c2 s) z WHERE rn <= 2),
       |cand AS (
       |  SELECT a.nn_id AS id1, b.nn_id AS id2,
       |    ${Shared.cosineSimSql("a.vec", "b.vec")} AS cos
       |  FROM idxm a JOIN idxm b
       |    ON a.cluster = b.cluster AND a.nn_id < b.nn_id
       |  WHERE list_sum(list_transform(a.vec, x -> x * x)) > 0
       |    AND list_sum(list_transform(b.vec, x -> x * x)) > 0)
       |SELECT DISTINCT id1, id2, cos FROM cand WHERE cos >= $minCos
       |ORDER BY id1, id2""".stripMargin

  /** Shared scorecard replay (see the LOCKSTEP note at its map
    * entry) — also subqueried verbatim by the corpus-card oracles.
    * `grpCols` is the comma-joined grouping key (the Spark twin is
    * Curate.scorecardBy). */
  private def scorecardOracleSqlBy(grpCols: String): String =
    s"""WITH stats AS (
        |  SELECT doc_id, $grpCols,
        |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS w,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, $grpCols, w,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_prepend(0, list_transform(w, x -> len(x)))) AS BIGINT) AS sumlen,
        |    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha,
        |    CAST(len(list_filter(w, x -> x = '#')) +
        |         len(list_filter(w, x -> x LIKE '%...')) AS BIGINT) AS sym,
        |    CAST(len(list_filter(['the','a'],
        |         s -> list_contains(w, s))) AS BIGINT) AS stop,
        |    CAST(len(lines) AS BIGINT) AS nl,
        |    CAST(len(list_filter(lines, l -> l LIKE '-%' OR l LIKE '*%')) AS BIGINT) AS bullet,
        |    CAST(len(list_filter(lines, l -> l LIKE '%...')) AS BIGINT) AS ell,
        |    CASE WHEN len(w) >= 2
        |      THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
        |      ELSE [] END AS bgs,
        |    CASE WHEN len(w) >= 3
        |      THEN list_transform(range(1, len(w) - 1),
        |             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |      ELSE [array_to_string(w, ' ')] END AS tris
        |  FROM stats),
        |f AS (
        |  SELECT doc_id, $grpCols,
        |    (n_words >= 50 AND n_words <= 100000
        |     AND sumlen >= n_words * 3 AND sumlen <= n_words * 10
        |     AND sym * 10 < n_words
        |     AND bullet * 10 < nl * 9 AND ell * 10 < nl * 3
        |     AND alpha * 5 >= n_words * 4
        |     AND stop >= 2) AS g,
        |    (FLOOR(CAST(len(w) - len(list_distinct(w)) AS DOUBLE)
        |        / GREATEST(len(w), 1) * 10000 + 0.5) / 10000 <= 0.65
        |     AND (CASE WHEN len(bgs) = 0 THEN 0.0 ELSE
        |       FLOOR(CAST(list_max(list_transform(list_distinct(bgs),
        |         x -> len(list_filter(bgs, y -> y = x)))) AS DOUBLE)
        |         / len(bgs) * 10000 + 0.5) / 10000 END) <= 0.08
        |     AND FLOOR(CAST(len(tris) - len(list_distinct(tris)) AS DOUBLE)
        |        / GREATEST(len(tris), 1) * 10000 + 0.5) / 10000 <= 0.0) AS r,
        |    (len(list_filter(w,
        |       x -> list_contains(['slow','stream'], x))) = 0) AS b
        |  FROM m)
        |SELECT $grpCols, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS pass_gopher,
        |  CAST(SUM(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT) AS pass_repetition,
        |  CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS pass_blocklist,
        |  CAST(SUM(CASE WHEN g AND r AND b THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
        |FROM f GROUP BY $grpCols ORDER BY $grpCols""".stripMargin

  private val scorecardOracleSql: String = scorecardOracleSqlBy("source")

  /** L63: the walk chain unrolled — adjacency with dst-sorted ranks,
    * then `len` step CTEs; the step hash is the rolling-hash kernel
    * replayed as a codepoint fold (ASCII node names, so the kernel's
    * byte walk and unicode() agree). */
  /** Grouped twin of [[graphWalksSql]]: the region key rides every
    * CTE (edges, adjacency rank, degree, step joins), while the step
    * hash stays group-blind — exactly the operator's construction, so
    * the replay is bit-exact per group. */
  private def graphWalksGroupedSql(nWalks: Int, len: Int): String = {
    def hashSql(keyExpr: String): String =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(regexp_extract_all($keyExpr, '.'),
         |        c -> CAST(unicode(c) AS BIGINT))),
         |      (x, y) -> (x * 31 + y) % 1000000007)""".stripMargin
    val sb = new StringBuilder
    sb ++= s"""WITH pairs AS (
      |  SELECT r_name AS grp,
      |         'c' || CAST(o_custkey AS VARCHAR) AS src,
      |         's' || CAST(l_suppkey AS VARCHAR) AS dst
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2, 3),
      |edges AS (
      |  SELECT DISTINCT grp, src, dst FROM (
      |    SELECT grp, src, dst FROM pairs
      |    UNION ALL
      |    SELECT grp, dst AS src, src AS dst FROM pairs)),
      |adj AS (
      |  SELECT grp, src, dst,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY grp, src ORDER BY dst) - 1
      |         AS BIGINT) AS nrank
      |  FROM edges),
      |deg AS (SELECT grp, src, CAST(COUNT(*) AS BIGINT) AS deg
      |        FROM adj GROUP BY grp, src),
      |adjd AS (SELECT a.grp, a.src, a.dst, a.nrank, d.deg
      |         FROM adj a JOIN deg d USING (grp, src)),
      |s0 AS (
      |  SELECT e.grp, e.src AS start, CAST(u.w AS BIGINT) AS walk,
      |         e.src AS node
      |  FROM (SELECT DISTINCT grp, src FROM edges) e,
      |       UNNEST(range(0, $nWalks)) AS u(w)),
      |""".stripMargin
    for (r <- 1 to len) {
      sb ++= s"""s$r AS (
        |  SELECT f.grp, f.start, f.walk, a.dst AS node
        |  FROM s${r - 1} f JOIN adjd a ON f.grp = a.grp AND f.node = a.src
        |  WHERE a.nrank = ${hashSql(
          s"f.node || '|' || CAST(f.walk AS VARCHAR) || '|' || '$r'")} % a.deg),
        |""".stripMargin
    }
    sb.setLength(sb.length - 2) // drop trailing ",\n"
    sb ++= "\nSELECT grp, start, walk, step, node FROM (\n"
    sb ++= (0 to len).map(r =>
      s"  SELECT grp, start, walk, CAST($r AS BIGINT) AS step, node FROM s$r")
      .mkString("\n  UNION ALL\n")
    sb ++= ") u ORDER BY grp, start, walk, step"
    sb.toString
  }

  private def graphWalksSql(nWalks: Int, len: Int): String = {
    def hashSql(keyExpr: String): String =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(regexp_extract_all($keyExpr, '.'),
         |        c -> CAST(unicode(c) AS BIGINT))),
         |      (x, y) -> (x * 31 + y) % 1000000007)""".stripMargin
    val sb = new StringBuilder
    sb ++= s"""WITH pairs AS (
      |  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
      |         's' || CAST(l_suppkey AS VARCHAR) AS dst
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2),
      |edges AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT src, dst FROM pairs
      |    UNION ALL
      |    SELECT dst AS src, src AS dst FROM pairs)),
      |adj AS (
      |  SELECT src, dst,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1
      |         AS BIGINT) AS nrank
      |  FROM edges),
      |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
      |        FROM adj GROUP BY src),
      |adjd AS (SELECT a.src, a.dst, a.nrank, d.deg
      |         FROM adj a JOIN deg d USING (src)),
      |s0 AS (
      |  SELECT e.src AS start, CAST(u.w AS BIGINT) AS walk, e.src AS node
      |  FROM (SELECT DISTINCT src FROM edges) e,
      |       UNNEST(range(0, $nWalks)) AS u(w)),
      |""".stripMargin
    for (r <- 1 to len) {
      sb ++= s"""s$r AS (
        |  SELECT f.start, f.walk, a.dst AS node
        |  FROM s${r - 1} f JOIN adjd a ON f.node = a.src
        |  WHERE a.nrank = ${hashSql(
          s"f.node || '|' || CAST(f.walk AS VARCHAR) || '|' || '$r'")} % a.deg),
        |""".stripMargin
    }
    sb.setLength(sb.length - 2) // drop trailing ",\n"
    sb ++= "\nSELECT start, walk, step, node FROM (\n"
    sb ++= (0 to len).map(r =>
      s"  SELECT start, walk, CAST($r AS BIGINT) AS step, node FROM s$r")
      .mkString("\n  UNION ALL\n")
    sb ++= ") u ORDER BY start, walk, step"
    sb.toString
  }

  /** L63c: the biased-walk chain unrolled — per step a base CTE
    * (neighbor weights via the prev-membership left join), a window
    * CTE (cumulative + total integer weights), and the pick filter.
    * Step 1 is the uniform rule (no predecessor). */
  private def node2vecWalksSql(nWalks: Int, len: Int, wBack: Long,
                               wCommon: Long, wFar: Long): String = {
    def hashSql(keyExpr: String): String =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(regexp_extract_all($keyExpr, '.'),
         |        c -> CAST(unicode(c) AS BIGINT))),
         |      (x, y) -> (x * 31 + y) % 1000000007)""".stripMargin
    val sb = new StringBuilder
    sb ++= s"""WITH pairs AS (
      |  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
      |         's' || CAST(l_suppkey AS VARCHAR) AS dst
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2),
      |edges AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT src, dst FROM pairs
      |    UNION ALL
      |    SELECT dst AS src, src AS dst FROM pairs)),
      |adj AS (
      |  SELECT src, dst,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1
      |         AS BIGINT) AS nrank
      |  FROM edges),
      |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
      |        FROM adj GROUP BY src),
      |adjd AS (SELECT a.src, a.dst, a.nrank, d.deg
      |         FROM adj a JOIN deg d USING (src)),
      |s0 AS (
      |  SELECT e.src AS start, CAST(u.w AS BIGINT) AS walk, e.src AS node
      |  FROM (SELECT DISTINCT src FROM edges) e,
      |       UNNEST(range(0, $nWalks)) AS u(w)),
      |s1 AS (
      |  SELECT f.start, f.walk, a.dst AS node, f.node AS prev
      |  FROM s0 f JOIN adjd a ON f.node = a.src
      |  WHERE a.nrank = ${hashSql(
        "f.node || '|' || CAST(f.walk AS VARCHAR) || '|' || '1'")} % a.deg),
      |""".stripMargin
    for (r <- 2 to len) {
      val h = hashSql(
        s"cur || '|' || prev || '|' || CAST(walk AS VARCHAR) || '|' || '$r'")
      sb ++= s"""b$r AS (
        |  SELECT f.start, f.walk, f.node AS cur, f.prev, a.dst,
        |    CASE WHEN a.dst = f.prev THEN CAST($wBack AS BIGINT)
        |         WHEN m.m IS NOT NULL THEN CAST($wCommon AS BIGINT)
        |         ELSE CAST($wFar AS BIGINT) END AS wgt
        |  FROM s${r - 1} f
        |  JOIN adjd a ON f.node = a.src
        |  LEFT JOIN (SELECT src AS m_src, dst AS m_dst, 1 AS m FROM edges) m
        |    ON a.dst = m.m_src AND f.prev = m.m_dst),
        |w$r AS (
        |  SELECT *,
        |    SUM(wgt) OVER (PARTITION BY start, walk ORDER BY dst) AS cum,
        |    SUM(wgt) OVER (PARTITION BY start, walk) AS tot
        |  FROM b$r),
        |s$r AS (
        |  SELECT start, walk, dst AS node, cur AS prev FROM w$r
        |  WHERE $h % GREATEST(tot, 1) >= cum - wgt
        |    AND $h % GREATEST(tot, 1) < cum),
        |""".stripMargin
    }
    sb.setLength(sb.length - 2) // drop trailing ",\n"
    sb ++= "\nSELECT start, walk, step, node FROM (\n"
    sb ++= ((0 to len).map { r =>
      val proj = if (r == 0) "start, walk, node" else "start, walk, node"
      s"  SELECT $proj, CAST($r AS BIGINT) AS step FROM s$r"
    }).mkString("\n  UNION ALL\n")
    sb ++= ") u ORDER BY start, walk, step"
    sb.toString
  }

  /** Shared q_knn_graph replay (also embedded by the label-spread oracle). */
  private val knnGraphOracleSql: String =

      s"""WITH ${Shared.ivfTrainCtesSql(nClusters = 8, iters = 2,
            trainThrHex = "g0")},
         |idxm AS (
         |  SELECT nn_id, vec, c AS cluster FROM (
         |    SELECT x.nn_id, x.vec, s.c,
         |      ROW_NUMBER() OVER (PARTITION BY x.nn_id
         |        ORDER BY ${Shared.l2qDistSql("x.vq", "s.cent")} ASC, s.c ASC) AS rn
         |    FROM v x CROSS JOIN c2 s) z WHERE rn <= 2),
         |cand AS (
         |  SELECT DISTINCT a.nn_id AS id, b.nn_id AS nb,
         |    ${Shared.cosineSimSql("a.vec", "b.vec", 6)} AS cos
         |  FROM idxm a JOIN idxm b
         |    ON a.cluster = b.cluster AND a.nn_id <> b.nn_id),
         |ranked AS (
         |  SELECT id, nb, cos,
         |    ROW_NUMBER() OVER (PARTITION BY id
         |                       ORDER BY cos DESC, nb ASC) AS rk
         |  FROM cand)
         |SELECT id, rk, nb, cos FROM ranked WHERE rk <= 5
         |ORDER BY id, rk""".stripMargin

  /** L63b skip-gram replay, no ORDER BY — shared with the
    * negative-sampling and embedding-training oracles. */
  private val skipgramsOracleSql: String =
    s"""WITH wtab AS (
      |${graphWalksSql(2, 4).replace(" ORDER BY start, walk, step", "")})
      |SELECT a.node AS center, b.node AS context,
      |  CAST(COUNT(*) AS BIGINT) AS n_pairs
      |FROM wtab a JOIN wtab b
      |  ON a.start = b.start AND a.walk = b.walk AND a.step <> b.step
      |  AND ABS(a.step - b.step) <= 2
      |GROUP BY 1, 2""".stripMargin

  /** L63d negatives replay, no ORDER BY — shared with the
    * embedding-training oracle. See the map entry for the chain
    * commentary. */
  private val negativeSamplesOracleSql: String =
    s"""WITH sg AS (
      |  SELECT * FROM (
      |${skipgramsOracleSql}
      |  ) zsg),
      |freq AS (SELECT context AS node, CAST(SUM(n_pairs) AS BIGINT) AS freq
      |         FROM sg GROUP BY 1),
      |wts AS (
      |  SELECT node,
      |    CAST(FLOOR(SQRT(FLOOR(SQRT(CAST(freq * freq * freq * 256
      |      AS DOUBLE))))) AS BIGINT) AS w
      |  FROM freq),
      |win AS (
      |  SELECT node, w,
      |    SUM(w) OVER (ORDER BY node
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(w) OVER () AS tot
      |  FROM wts),
      |pk AS (
      |  SELECT c.center, CAST(u.kk AS BIGINT) AS k,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(regexp_extract_all(
      |        c.center || '|' || CAST(u.kk AS VARCHAR), '.'),
      |        ch -> CAST(unicode(ch) AS BIGINT))),
      |      (x, y) -> (x * 31 + y) % 1000000007) % t.tot AS pick
      |  FROM (SELECT DISTINCT center FROM sg) c,
      |       UNNEST(range(1, 6)) AS u(kk),
      |       (SELECT DISTINCT tot FROM win) t)
      |SELECT p.center, p.k, w.node AS neg_node
      |FROM pk p JOIN win w ON p.pick >= w.cum - w.w AND p.pick < w.cum""".stripMargin

  /** L63f: the SGNS training rounds unrolled — per round a dot CTE
    * (example join against both embedding sides), the rational-
    * sigmoid gradient, two per-(node, dim) gradient sums, and the
    * floor-damped update. Builds on the skip-gram and negatives
    * replays. */
  /** DuckDB twin of `Whiten.allButTheTop`: quantize -> trunc-mean ->
    * `rounds` unrolled power iterations (integer dot, sign-split
    * trunc-divisions, fixed-order double normalization fold) -> sign
    * convention -> per-row projection removal. Kept in LOCKSTEP with
    * operators/Whiten.scala — the constants (2^20 scale, e1 seed,
    * round count) and the exact op order are the contract. */
  private def wtdiv(a: String, b: String): String =
    s"CASE WHEN ($a) < 0 THEN -((-($a)) // $b) ELSE ($a) // $b END"

  /** One "all-but-the-top" pass as a CTE chain over `$src(vec_id, xq)`:
    * emits `${p}proj` (vec_id, xc, proj_q), `${p}vsgn` (vl) and
    * `${p}out` (vec_id, xq = the processed integers) — composable for
    * the L113b deflation twin (the ÷2^20 / ⌊·2^20⌋ handoff between
    * Spark passes is lossless on binary powers, so pass k+1's input
    * IS pass k's integer output). */
  private def whitenPassSql(p: String, src: String, rounds: Int,
                            d: Int): String = {
    val seed = (1 to d).map(j => if (j == 1) "1048576" else "0")
      .mkString(", ")
    val roundCtes = (1 to rounds).map { r =>
      s"""${p}s$r AS (
        |  SELECT vec_id, xc,
        |    CAST(list_aggregate(list_transform(range(1, ${d + 1}),
        |      j -> xc[j] * vl[j]), 'sum') AS BIGINT) AS s
        |  FROM ${p}xc, ${p}vl${r - 1}),
        |${p}u$r AS (
        |  SELECT j, CAST(SUM((${wtdiv("s", "1048576")}) * xc[j]) AS BIGINT) AS u
        |  FROM ${p}s$r, UNNEST(range(1, ${d + 1})) AS t(j) GROUP BY j),
        |${p}usl$r AS (SELECT list(${wtdiv("u", "1048576")} ORDER BY j) AS usl
        |  FROM ${p}u$r),
        |${p}nrm$r AS (
        |  SELECT sqrt(list_reduce(list_transform(usl,
        |    x -> CAST(x AS DOUBLE) * x), (a, b) -> a + b)) AS nrm
        |  FROM ${p}usl$r),
        |${p}vl$r AS MATERIALIZED (
        |  SELECT list_transform(usl,
        |    x -> CAST(FLOOR(x * (1048576.0 / nrm) + 0.5) AS BIGINT)) AS vl
        |  FROM ${p}usl$r, ${p}nrm$r)""".stripMargin
    }.mkString(",\n")
    s"""${p}nn AS (SELECT COUNT(*) AS n FROM $src),
      |${p}musum AS (
      |  SELECT j, CAST(SUM(xq[j]) AS BIGINT) AS sx
      |  FROM $src, UNNEST(range(1, ${d + 1})) AS t(j) GROUP BY j),
      |${p}mu AS (SELECT j, ${wtdiv("sx", "n")} AS m FROM ${p}musum, ${p}nn),
      |${p}mul AS MATERIALIZED (SELECT list(m ORDER BY j) AS ml FROM ${p}mu),
      |${p}xc AS MATERIALIZED (
      |  SELECT vec_id, list_transform(range(1, ${d + 1}),
      |    j -> xq[j] - ml[j]) AS xc
      |  FROM $src, ${p}mul),
      |${p}vl0 AS (SELECT [$seed]::BIGINT[] AS vl),
      |$roundCtes,
      |${p}vsgn AS MATERIALIZED (
      |  SELECT CASE WHEN (list_filter(vl, x -> x <> 0))[1] < 0
      |    THEN list_transform(vl, x -> -x) ELSE vl END AS vl
      |  FROM ${p}vl$rounds),
      |${p}sf AS (
      |  SELECT vec_id, xc,
      |    CAST(list_aggregate(list_transform(range(1, ${d + 1}),
      |      j -> xc[j] * vl[j]), 'sum') AS BIGINT) AS s
      |  FROM ${p}xc, ${p}vsgn),
      |${p}proj AS (SELECT vec_id, xc, ${wtdiv("s", "1048576")} AS proj_q
      |  FROM ${p}sf),
      |${p}out AS MATERIALIZED (
      |  SELECT p.vec_id, list_transform(range(1, ${d + 1}),
      |    j -> p.xc[j] - (${wtdiv("p.proj_q * vl[j]", "1048576")})) AS xq
      |  FROM ${p}proj p, ${p}vsgn)""".stripMargin
  }

  private val whitenQuantizeSql: String =
    """xq0 AS MATERIALIZED (
      |  SELECT vec_id, list_transform(embedding,
      |    e -> CAST(FLOOR(CAST(e AS DOUBLE) * 1048576) AS BIGINT)) AS xq
      |  FROM embeddings)""".stripMargin

  private def whitenSql(rounds: Int, d: Int): String = {
    s"""WITH $whitenQuantizeSql,
      |${whitenPassSql("a", "xq0", rounds, d)}
      |SELECT p.vec_id, CAST(j - 1 AS INT) AS j,
      |  CAST(p.xc[j] - (${wtdiv("p.proj_q * vl[j]", "1048576")}) AS BIGINT) AS v,
      |  CAST(p.proj_q AS BIGINT) AS proj_q
      |FROM aproj p, avsgn, UNNEST(range(1, ${d + 1})) AS t(j)
      |ORDER BY p.vec_id, j""".stripMargin
  }

  /** C13al twin: replay Whiten.momentStats → modelFromMoments — the
    * exactly-additive second-moment state and the DRIVER-side double
    * power iteration it feeds. The moment/centered-matrix arithmetic
    * is HUGEINT-exact with ONE cast to double per matrix cell
    * (mirroring BigDecimal.toDouble); the iteration replays Scala's
    * fixed-order reduceLeft folds via list_reduce over lists ordered
    * by dim (the q_embed_train precedent). Output: the derived model
    * (j, mu, v) — 64 rows, hash-exact. */
  private def whitenModelSql(rounds: Int, d: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""w$r AS (
        |  SELECT c.i, list_reduce(list(c.c * v.v ORDER BY c.j),
        |    (a, b) -> a + b) AS u
        |  FROM cmat c JOIN v${r - 1} v ON v.j = c.j GROUP BY c.i),
        |n$r AS (SELECT sqrt(list_reduce(list(u * u ORDER BY i),
        |  (a, b) -> a + b)) AS nm FROM w$r),
        |v$r AS MATERIALIZED (SELECT i AS j, u / nm AS v FROM w$r, n$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $whitenQuantizeSql,
      |cnt AS (SELECT COUNT(*) AS n FROM xq0),
      |sx AS MATERIALIZED (
      |  SELECT j, CAST(SUM(xq[j]) AS BIGINT) AS sx
      |  FROM xq0, UNNEST(range(1, ${d + 1})) AS t(j) GROUP BY j),
      |mu AS MATERIALIZED (SELECT j, ${wtdiv("sx", "n")} AS m FROM sx, cnt),
      |sxx AS MATERIALIZED (
      |  SELECT i, j, SUM(CAST(xq[i] AS HUGEINT) * xq[j]) AS v
      |  FROM xq0, UNNEST(range(1, ${d + 1})) AS ti(i),
      |    UNNEST(range(1, ${d + 1})) AS tj(j)
      |  WHERE i <= j GROUP BY i, j),
      |sxxf AS (SELECT i, j, v FROM sxx
      |  UNION ALL SELECT j AS i, i AS j, v FROM sxx WHERE i < j),
      |cmat AS MATERIALIZED (
      |  SELECT s.i, s.j, CAST(s.v
      |    - CAST(m1.m AS HUGEINT) * x2.sx
      |    - CAST(m2.m AS HUGEINT) * x1.sx
      |    + CAST(cnt.n AS HUGEINT) * m1.m * m2.m AS DOUBLE) AS c
      |  FROM sxxf s
      |  JOIN mu m1 ON m1.j = s.i JOIN mu m2 ON m2.j = s.j
      |  JOIN sx x1 ON x1.j = s.i JOIN sx x2 ON x2.j = s.j, cnt),
      |v0 AS (SELECT j, CASE WHEN j = 1 THEN 1.0 ELSE 0.0 END AS v
      |  FROM UNNEST(range(1, ${d + 1})) AS t(j)),
      |$roundCtes,
      |vq AS MATERIALIZED (
      |  SELECT j, CAST(FLOOR(v * 1048576.0 + 0.5) AS BIGINT) AS vq
      |  FROM v$rounds),
      |sg AS (SELECT CASE WHEN (SELECT vq FROM vq WHERE vq <> 0
      |  ORDER BY j LIMIT 1) < 0 THEN -1 ELSE 1 END AS sg)
      |SELECT CAST(m.j - 1 AS INT) AS j, CAST(m.m AS BIGINT) AS mu,
      |  CAST(sg.sg * q.vq AS BIGINT) AS v
      |FROM mu m JOIN vq q ON q.j = m.j, sg ORDER BY j""".stripMargin
  }

  /** L113b twin: two deflation passes; pass b reads pass a's integer
    * output exactly as Whiten.removeTopComponents re-quantizes it. */
  private def whiten2Sql(rounds: Int, d: Int): String = {
    s"""WITH $whitenQuantizeSql,
      |${whitenPassSql("a", "xq0", rounds, d)},
      |${whitenPassSql("b", "aout", rounds, d)}
      |SELECT o.vec_id, CAST(j - 1 AS INT) AS j,
      |  CAST(o.xq[j] AS BIGINT) AS v
      |FROM bout o, UNNEST(range(1, ${d + 1})) AS t(j)
      |ORDER BY o.vec_id, j""".stripMargin
  }

  private def embedTrainSql(dims: Int, rounds: Int, dampDen: Long): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH negs AS MATERIALIZED (
      |  SELECT * FROM (
      |${negativeSamplesOracleSql}
      |  ) zn),
      |sg2 AS MATERIALIZED (
      |  SELECT * FROM (
      |${skipgramsOracleSql}
      |  ) zs),
      |ex AS MATERIALIZED (
      |  SELECT center, context AS x, CAST(1 AS DOUBLE) AS y FROM sg2
      |  UNION
      |  SELECT center, neg_node AS x, CAST(0 AS DOUBLE) AS y FROM negs),
      |lnodes AS (
      |  SELECT DISTINCT node FROM (
      |    SELECT center AS node FROM ex UNION ALL SELECT x AS node FROM ex) u),
      |e0 AS MATERIALIZED (
      |  SELECT n.node, CAST(u.dd AS BIGINT) AS d,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(regexp_extract_all(
      |        n.node || '|' || CAST(u.dd AS VARCHAR), '.'),
      |        ch -> CAST(unicode(ch) AS BIGINT))),
      |      (x, y) -> (x * 31 + y) % 1000000007) % 513 - 256 AS v
      |  FROM lnodes n, UNNEST(range(0, $dims)) AS u(dd)),
      |""".stripMargin
    for (r <- 1 to rounds) {
      sb ++= s"""m$r AS MATERIALIZED (
        |  SELECT e.center, e.x, e.y, CAST(SUM(c.v * t.v) AS BIGINT) AS m_int
        |  FROM ex e
        |  JOIN e${r - 1} c ON c.node = e.center
        |  JOIN e${r - 1} t ON t.node = e.x AND t.d = c.d
        |  GROUP BY 1, 2, 3),
        |g$r AS MATERIALIZED (
        |  SELECT center, x,
        |    CAST(FLOOR((y - (0.5 + (m_int / 1048576.0) /
        |      (2.0 * (1.0 + ABS(m_int / 1048576.0))))) * 1024) AS BIGINT) AS g
        |  FROM m$r),
        |cg$r AS MATERIALIZED (
        |  SELECT g.center AS node, t.d, CAST(SUM(g.g * t.v) AS BIGINT) AS gs
        |  FROM g$r g JOIN e${r - 1} t ON t.node = g.x GROUP BY 1, 2),
        |xg$r AS MATERIALIZED (
        |  SELECT g.x AS node, c.d, CAST(SUM(g.g * c.v) AS BIGINT) AS gs
        |  FROM g$r g JOIN e${r - 1} c ON c.node = g.center GROUP BY 1, 2),
        |e$r AS MATERIALIZED (
        |  SELECT n.node, n.d,
        |    n.v + CAST(FLOOR((COALESCE(c.gs, 0) + COALESCE(xx.gs, 0))
        |      / $dampDen.0) AS BIGINT) AS v
        |  FROM e${r - 1} n
        |  LEFT JOIN cg$r c ON c.node = n.node AND c.d = n.d
        |  LEFT JOIN xg$r xx ON xx.node = n.node AND xx.d = n.d),
        |""".stripMargin
    }
    sb.setLength(sb.length - 2) // drop trailing ",\n"
    sb ++= s"\nSELECT node, d, v FROM e$rounds ORDER BY node, d"
    sb.toString
  }

  val oracles: Map[String, String] = Map(
    "q_embed_whiten" -> whitenSql(rounds = 3, d = 64),
    "q_embed_whiten2" -> whiten2Sql(rounds = 3, d = 64),
    "q_whiten_model" -> whitenModelSql(rounds = 3, d = 64),

    "q_embed_train" -> embedTrainSql(dims = 8, rounds = 2, dampDen = 65536L),

    // L28: PINNED-VALUE oracle (see tools/gen_pinned_oracles.py). BPE
    // merge training is iterative and corpus-learned — not
    // SQL-expressible — but deterministic (BpeSpec gates determinism,
    // reference parity, roundtrip; q_bpe_apply hash-proves the apply
    // kernel under a frozen table). The engine-specific columns
    // (n_bpe_tokens, head_tokens) are frozen from a verified run;
    // n_words is recomputed from the parquet so a testdata change
    // fails the gate loudly.
    "q_bpe_tokenize" ->
      s"""WITH pinned(doc_id, n_bpe_tokens, head_tokens) AS (VALUES
         |${PinnedOracles.bpeTokenizeValues})
         |SELECT d.doc_id,
         |  CAST(len(list_filter(string_split(d.text, ' '), x -> len(x) > 0))
         |    AS BIGINT) AS n_words,
         |  CAST(p.n_bpe_tokens AS BIGINT) AS n_bpe_tokens,
         |  p.head_tokens
         |FROM documents d JOIN pinned p USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // L40: PINNED-VALUE oracle. DuckDB has no gzip scalar, so the
    // java.util.zip byte size is frozen from a verified run
    // (determinism + repetitive-text ordering gated in CurationSpec);
    // n_chars / ratio / keep are recomputed from the parquet (ratio
    // replays round_portable's floor(x·10⁴+0.5)/10⁴ exactly).
    "q_compress_ratio" ->
      s"""WITH pinned(doc_id, n_gz) AS (VALUES
         |${PinnedOracles.compressRatioValues}),
         |r AS (
         |  SELECT d.doc_id, CAST(len(d.text) AS BIGINT) AS n_chars,
         |    CAST(p.n_gz AS BIGINT) AS n_gz,
         |    FLOOR(CAST(p.n_gz AS DOUBLE) / GREATEST(len(d.text), 1)
         |      * 10000 + 0.5) / 10000 AS ratio
         |  FROM documents d JOIN pinned p USING (doc_id))
         |SELECT doc_id, n_chars, n_gz, ratio, ratio >= 0.3 AS keep
         |FROM r ORDER BY doc_id""".stripMargin,

    "q_graph_walks" -> graphWalksSql(nWalks = 2, len = 4),
    "q_graph_walks_grouped" -> graphWalksGroupedSql(nWalks = 2, len = 4),

    "q_node2vec_walks" -> node2vecWalksSql(nWalks = 2, len = 4,
      wBack = 1L, wCommon = 6L, wFar = 3L),

    // L63d: skip-grams → unigram^(3/4) weights (the exact double
    // chain: BIGINT product → round-to-nearest cast → correctly-
    // rounded sqrt, twice) → global cumulative windows → hash-mod
    // picks resolved by interval containment (DuckDB's IEJoin handles
    // the inequality join directly; Spark buckets it).
    "q_negative_samples" ->
      (negativeSamplesOracleSql + "\nORDER BY center, k"),

    "q_walk_skipgrams" -> (skipgramsOracleSql + "\nORDER BY 1, 2"),

    // 11b: BPE apply under the frozen merge table. Exact replay of
    // BpeKernel.encodeWord's greedy loop: the recursive CTE is the
    // until-no-pair-applies fixpoint; each step finds the lowest-rank
    // adjacent pair (list_position over the literal pair list — rank
    // = 1-based position) and merges every occurrence left-to-right
    // non-overlapping via a list_reduce carry automaton (states: I =
    // start, C = carry held, M = just merged so the next symbol may
    // not merge left — the kernel's j += 2). Symbols never contain a
    // space (words are space-split), so space-joined strings encode
    // symbol lists losslessly.
    "q_bpe_apply" ->
      s"""WITH RECURSIVE
        |w1 AS (
        |  SELECT word FROM (
        |    SELECT DISTINCT UNNEST(list_filter(string_split(text, ' '),
        |      x -> len(x) > 0)) AS word
        |    FROM documents)
        |  WHERE len(word) <= 20
        |    AND strpos(word, chr(9)) = 0 AND strpos(word, chr(10)) = 0
        |    AND strpos(word, chr(13)) = 0),
        |st AS (
        |  SELECT word,
        |    array_to_string(regexp_extract_all(word, '.'), ' ') || ' </w>' AS sym
        |  FROM w1
        |  UNION ALL
        |  SELECT word,
        |    CASE WHEN struct_extract(red, 'f') = 'C'
        |         THEN substr(struct_extract(red, 'o') || ' ' ||
        |                     struct_extract(red, 'c'), 2)
        |         ELSE substr(struct_extract(red, 'o'), 2) END AS sym
        |  FROM (
        |    SELECT word,
        |      list_reduce(
        |        list_prepend(
        |          struct_pack(f := 'I', o := '', c := ''),
        |          list_transform(string_split(sym, ' '),
        |            s -> struct_pack(f := 'S', o := '', c := s))),
        |        (a, e) -> CASE
        |          WHEN struct_extract(a, 'f') = 'I'
        |            THEN struct_pack(f := 'C', o := '',
        |                   c := struct_extract(e, 'c'))
        |          WHEN struct_extract(a, 'f') = 'C'
        |               AND COALESCE(list_position($bpePairsLit,
        |                     struct_extract(a, 'c') || ' ' ||
        |                     struct_extract(e, 'c')), 0) = best
        |            THEN struct_pack(f := 'M',
        |                   o := struct_extract(a, 'o') || ' ' ||
        |                        struct_extract(a, 'c') ||
        |                        struct_extract(e, 'c'),
        |                   c := '')
        |          WHEN struct_extract(a, 'f') = 'M'
        |            THEN struct_pack(f := 'C', o := struct_extract(a, 'o'),
        |                   c := struct_extract(e, 'c'))
        |          ELSE struct_pack(f := 'C',
        |                 o := struct_extract(a, 'o') || ' ' ||
        |                      struct_extract(a, 'c'),
        |                 c := struct_extract(e, 'c'))
        |          END) AS red
        |    FROM (
        |      SELECT word, sym,
        |        list_min(list_filter(
        |          list_transform(range(1, len(string_split(sym, ' '))),
        |            i -> COALESCE(list_position($bpePairsLit,
        |                   string_split(sym, ' ')[i] || ' ' ||
        |                   string_split(sym, ' ')[i+1]), 0)),
        |          r -> r > 0)) AS best
        |      FROM st) b
        |    WHERE best IS NOT NULL) stepped)
        |SELECT word, sym AS bpe,
        |  CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_segs
        |FROM st
        |WHERE list_min(list_filter(
        |        list_transform(range(1, len(string_split(sym, ' '))),
        |          i -> COALESCE(list_position($bpePairsLit,
        |                 string_split(sym, ' ')[i] || ' ' ||
        |                 string_split(sym, ' ')[i+1]), 0)),
        |        r -> r > 0)) IS NULL
        |ORDER BY word""".stripMargin,

    // L75: the same two window ranks + margin filter over the
    // token-count score — in LOCKSTEP with Curate.preferencePairs.
    "q_preference_pairs" ->
      """WITH s AS (
        |  SELECT lang || '|' || source AS pool, doc_id,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> len(x) > 0)) AS BIGINT) AS sc
        |  FROM documents),
        |r AS (
        |  SELECT pool, doc_id, sc,
        |    ROW_NUMBER() OVER (PARTITION BY pool
        |                       ORDER BY sc DESC, doc_id ASC) AS rt,
        |    ROW_NUMBER() OVER (PARTITION BY pool
        |                       ORDER BY sc ASC, doc_id ASC) AS rb
        |  FROM s),
        |t AS (SELECT pool, doc_id AS chosen_id, sc AS chosen_score
        |      FROM r WHERE rt = 1),
        |b AS (SELECT pool, doc_id AS rejected_id, sc AS rejected_score
        |      FROM r WHERE rb = 1)
        |SELECT t.pool, chosen_id, rejected_id, chosen_score,
        |  rejected_score, chosen_score - rejected_score AS margin
        |FROM t JOIN b USING (pool)
        |WHERE chosen_id <> rejected_id
        |  AND chosen_score - rejected_score >= 10
        |ORDER BY pool""".stripMargin,

    // L86: the full prototypicality replay — quantized Lloyd training
    // (shared CTEs), exact integral assignment distances, per-cell
    // (dist, id) ranks, cross-multiplied permille bands.
    "q_prototypicality" ->
      s"""WITH ${Shared.ivfTrainCtesSql(nClusters = 8, iters = 2,
            trainThrHex = "g0")},
         |asn AS (
         |  SELECT nn_id, c AS cluster, dist FROM (
         |    SELECT t.nn_id, s.c,
         |      ${Shared.l2qDistSql("t.vq", "s.cent")} AS dist,
         |      ROW_NUMBER() OVER (PARTITION BY t.nn_id
         |        ORDER BY ${Shared.l2qDistSql("t.vq", "s.cent")} ASC,
         |          s.c ASC) AS rn
         |    FROM v t CROSS JOIN c2 s) z WHERE rn = 1),
         |rks AS (
         |  SELECT nn_id, cluster, CAST(dist AS BIGINT) AS dist_q,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY cluster
         |      ORDER BY dist, nn_id) AS BIGINT) AS rk,
         |    CAST(COUNT(*) OVER (PARTITION BY cluster) AS BIGINT) AS n_cell
         |  FROM asn)
         |SELECT nn_id AS vec_id, CAST(cluster AS BIGINT) AS cluster,
         |  dist_q, rk, n_cell,
         |  CASE WHEN rk * 1000 <= 100 * n_cell THEN 'head'
         |       WHEN (n_cell - rk) * 1000 < 100 * n_cell THEN 'tail'
         |       ELSE 'keep' END AS band
         |FROM rks ORDER BY cluster, rk""".stripMargin,

    // The quantized SemDeDup chain over embeddings replayed end to end
    // — training, multi-assign blocking, verified cosine >= 0.4.
    "q_semantic_dedup" ->
      s"""WITH ${Shared.ivfTrainCtesSql(nClusters = 8, iters = 2,
            trainThrHex = "g0")},
         |${semanticDedupTailSql(0.4)}""".stripMargin,

    // The embedding-free SemDeDup chain: hashed-bow featurizer (shared
    // rolling-hash CTE) densified to 64 dims, then the same quantized
    // training + blocking + cosine >= 0.9.
    "q_semantic_dedup_text" ->
      s"""WITH ${Shared.hashedBowCteSql("documents", "doc_id", "text", "d")},
         |buckets AS (SELECT UNNEST(range(0, 64)) AS bucket),
         |cell AS (
         |  SELECT doc_id, bucket
         |  FROM (SELECT DISTINCT doc_id FROM documents) CROSS JOIN buckets),
         |v AS (
         |  SELECT nn_id, vec,
         |    list_transform(vec, x -> floor(x * 65536 + 0.5)) AS vq
         |  FROM (
         |    SELECT c.doc_id AS nn_id,
         |      list(CAST(COALESCE(b.w, 0) AS DOUBLE) ORDER BY c.bucket) AS vec
         |    FROM cell c LEFT JOIN dbow b
         |      ON b.doc_id = c.doc_id AND b.bucket = c.bucket
         |    GROUP BY c.doc_id) z),
         |${Shared.ivfTrainCoreCtesSql(nClusters = 8, iters = 2,
             trainThrHex = "g0")},
         |${semanticDedupTailSql(0.9)}""".stripMargin,

    // The quantized kNN-graph chain replayed end to end (training
    // included) — nClusters=8 / full-sample train pin the sf0.01
    // regime of the adaptive formula (n < 4608, n <= 65536).
    "q_knn_graph" -> knnGraphOracleSql,

    // L64: the spreading rounds unrolled over the same knn-graph
    // replay — per round a propagate CTE (edge join + per-(node,
    // label) sum), a floor-normalize CTE, and the seed re-clamp.
    "q_label_spread" -> {
      val rounds = new StringBuilder
      for (i <- 1 to 3) {
        rounds ++= s"""p$i AS (
          |  SELECT e.eid AS pnode, s.label, CAST(SUM(s.score) AS BIGINT) AS raw
          |  FROM ledges e JOIN r${i - 1} s ON e.enb = s.node
          |  GROUP BY 1, 2),
          |n$i AS (
          |  SELECT p.pnode AS node, p.label,
          |    CAST(p.raw * 1048576 // t.rs AS BIGINT) AS score
          |  FROM p$i p JOIN (SELECT pnode, CAST(SUM(raw) AS BIGINT) AS rs
          |                   FROM p$i GROUP BY 1) t USING (pnode)),
          |r$i AS (
          |  SELECT n.node, n.label, n.score FROM n$i n
          |  WHERE NOT EXISTS (SELECT 1 FROM seed s WHERE s.node = n.node)
          |  UNION ALL SELECT * FROM seed),
          |""".stripMargin
      }
      s"""WITH eg AS (
        |${knnGraphOracleSql.replace(" ORDER BY id, rk", "")}),
        |ledges AS (SELECT id AS eid, nb AS enb FROM eg),
        |seed AS (
        |  SELECT vec_id AS node, label, CAST(1048576 AS BIGINT) AS score
        |  FROM embeddings WHERE vec_id % 20 = 0),
        |r0 AS (SELECT * FROM seed),
        |${rounds.toString.stripSuffix(",\n").stripSuffix(",")}
        |SELECT node, label AS pred_label, score AS score_q,
        |  CAST(CASE WHEN EXISTS (SELECT 1 FROM seed s WHERE s.node = z.node)
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_seed
        |FROM (SELECT r.*, ROW_NUMBER() OVER (PARTITION BY node
        |        ORDER BY score DESC, label ASC) AS rk FROM r3 r) z
        |WHERE rk = 1 ORDER BY node""".stripMargin
    },



    // L117: the vote replay over the same knn-graph CTEs — per-id
    // neighbor-label counts, majority via (c DESC, label ASC)
    // ROW_NUMBER, left-joined own-label agreement.
    "q_label_noise" ->
      s"""WITH eg AS (
        |${knnGraphOracleSql.replace(" ORDER BY id, rk", "")}),
        |lab AS (SELECT vec_id AS node, CAST(label AS BIGINT) AS lab
        |        FROM embeddings),
        |votes AS MATERIALIZED (
        |  SELECT e.id, l.lab AS nb_label, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM eg e JOIN lab l ON e.nb = l.node
        |  GROUP BY e.id, l.lab),
        |nn AS (SELECT id, CAST(SUM(c) AS BIGINT) AS n_nb
        |       FROM votes GROUP BY id),
        |maj AS (
        |  SELECT id, nb_label AS maj_label, c AS n_maj FROM (
        |    SELECT id, nb_label, c, ROW_NUMBER() OVER (PARTITION BY id
        |      ORDER BY c DESC, nb_label ASC) AS rn
        |    FROM votes) z WHERE rn = 1)
        |SELECT m.id, o.lab AS label, m.maj_label, nn.n_nb, m.n_maj,
        |  COALESCE(v.c, 0) AS n_agree,
        |  m.maj_label <> o.lab AS flagged
        |FROM maj m
        |JOIN lab o ON o.node = m.id
        |JOIN nn ON nn.id = m.id
        |LEFT JOIN votes v ON v.id = m.id AND v.nb_label = o.lab
        |ORDER BY m.id""".stripMargin,

    // The quantized bulk cross-corpus kNN replayed — corpus is
    // label<>0 (training side), queries are label=0; same regime pins
    // as q_knn_graph.
    "q_bulk_knn" -> {
      s"""WITH ${Shared.ivfTrainCtesSql(nClusters = 8, iters = 2,
            trainThrHex = "g0", srcWhere = "WHERE label <> 0")},
         |idx AS (
         |  SELECT nn_id, vec, c AS cluster FROM (
         |    SELECT x.nn_id, x.vec, s.c,
         |      ROW_NUMBER() OVER (PARTITION BY x.nn_id
         |        ORDER BY ${Shared.l2qDistSql("x.vq", "s.cent")} ASC, s.c ASC) AS rn
         |    FROM v x CROSS JOIN c2 s) z WHERE rn = 1),
         |qv AS (
         |  SELECT vec_id AS query_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q_vec,
         |    list_transform(embedding,
         |      x -> floor(CAST(x AS DOUBLE) * 65536 + 0.5)) AS q_vq
         |  FROM embeddings WHERE label = 0),
         |probes AS (
         |  SELECT query_id, q_vec, c AS cluster FROM (
         |    SELECT q.query_id, q.q_vec, s.c,
         |      ROW_NUMBER() OVER (PARTITION BY q.query_id
         |        ORDER BY ${Shared.l2qDistSql("q.q_vq", "s.cent")} ASC, s.c ASC) AS rn
         |    FROM qv q CROSS JOIN c2 s) z WHERE rn <= 3),
         |cand AS (
         |  SELECT p.query_id, i.nn_id,
         |    ${Shared.cosineSimSql("p.q_vec", "i.vec")} AS sim
         |  FROM probes p JOIN idx i USING (cluster)),
         |ranked AS (
         |  SELECT query_id, nn_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, nn_id ASC) AS rank
         |  FROM cand)
         |SELECT query_id, rank, nn_id, sim FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin
    },
    // word2phrase replay: same discounted-ratio shape — (cab−5)::d
    // * n_tok, divided by (ca::d * cb), scaled 1e6, floored.
    "q_phrase_mine" ->
      """WITH toksall AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |uni AS (SELECT UNNEST(t) AS tok FROM toksall),
        |uc AS (SELECT tok, COUNT(*) AS c1 FROM uni GROUP BY tok),
        |tot AS (SELECT COUNT(*) AS n_tok FROM uni),
        |prs AS (
        |  SELECT t[i] AS prev, t[i+1] AS cur
        |  FROM toksall, UNNEST(range(1, len(t))) AS u(i)
        |  WHERE len(t) >= 2),
        |bc AS (
        |  SELECT prev, cur, COUNT(*) AS cab FROM prs
        |  GROUP BY prev, cur HAVING COUNT(*) >= 5)
        |SELECT bc.prev AS w1, bc.cur AS w2, bc.cab, a.c1 AS ca, b.c1 AS cb,
        |  CAST(FLOOR(CAST(bc.cab - 5 AS DOUBLE) * t.n_tok /
        |    (CAST(a.c1 AS DOUBLE) * b.c1) * 1000000.0) AS BIGINT) AS score_q
        |FROM bc
        |JOIN uc a ON a.tok = bc.prev
        |JOIN uc b ON b.tok = bc.cur
        |CROSS JOIN tot t
        |ORDER BY score_q DESC, w1, w2 LIMIT 50""".stripMargin,

    "q_classifier_train" -> classifierTrainSql(64, 3, 1L, 1L),

    // UniMax water-filling replay: same caps, prefix sums, split
    // point, and floor-div share — all integer.
    "q_unimax_alloc" ->
      s"""${unimaxCteSql(1, 4, 5)}
        |SELECT lang, t_tok, cap, alloc,
        |  CAST(alloc * 1000 // t_tok AS BIGINT) AS epochs_per_mille
        |FROM ua ORDER BY lang""".stripMargin,

    // L33d: the materialized allocation — full-epoch replication via
    // a lateral range, fractional epoch via the same md5-prefix
    // threshold string compare (to_hex lower-case in both engines).
    "q_unimax_apply" ->
      s"""${unimaxCteSql(3, 2, 1)},
        |ath AS (
        |  SELECT lang, t_tok, alloc, alloc // t_tok AS full_ep,
        |    CASE WHEN alloc % t_tok = 0 THEN '0000'
        |         ELSE lpad(lower(to_hex((alloc % t_tok) * 65536 // t_tok)), 4, '0')
        |    END AS thr
        |  FROM ua),
        |ex AS (
        |  SELECT d.doc_id, d.lang, e.i AS epoch, a.full_ep, a.thr,
        |    CAST(len(list_filter(string_split(d.text, ' '), x -> len(x) > 0))
        |      AS BIGINT) AS n_tok,
        |    substr(md5(d.text), 1, 4) AS h
        |  FROM documents d
        |  JOIN ath a USING (lang), UNNEST(range(0, a.full_ep + 1)) AS e(i)),
        |kept AS (SELECT * FROM ex WHERE epoch < full_ep OR h < thr)
        |SELECT lang, COUNT(*) AS n_rows,
        |  CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(MAX(epoch) + 1 AS BIGINT) AS max_copies
        |FROM kept GROUP BY lang ORDER BY lang""".stripMargin,
    "q_link_rank" -> linkRankSql(4, 85L, 100L, 1000000000000L),
    "q_trust_rank" -> linkRankSql(4, 85L, 100L, 1000000000000L,
      Some("SELECT 's' || CAST(s_suppkey AS VARCHAR) AS node " +
        "FROM supplier WHERE s_nationkey < 5")),

    // DSIR twin: the same hashed uni+bigram features (rolling-hash
    // recurrence of the q_feature_hash oracle), raw-centered Dirichlet
    // target smoothing, and the quantized ratio through HUGEINT — in
    // lockstep with Curate.dsirScores' decimal(38,0).
    "q_dsir_select" ->
      """WITH toks AS (
        |  SELECT doc_id, lang = 'en' AS is_t,
        |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, is_t, UNNEST(t) AS g FROM toks
        |  UNION ALL
        |  SELECT doc_id, is_t, t[i] || ' ' || t[i+1] AS g
        |  FROM toks, UNNEST(range(1, len(t))) AS u(i)
        |  WHERE len(t) >= 2),
        |feats AS (
        |  SELECT doc_id, is_t,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(regexp_extract_all(g, '.'),
        |          c -> CAST(unicode(c) AS BIGINT))),
        |      (a, b) -> (a * 31 + b) % 1000000007) % 1024 AS f
        |  FROM grams),
        |cnt AS (
        |  SELECT f, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
        |    COUNT(*) AS cr
        |  FROM feats GROUP BY f),
        |tot AS (
        |  SELECT SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS nt,
        |    COUNT(*) AS nr
        |  FROM feats),
        |ratio AS (
        |  SELECT f, CAST(((CAST(ct AS HUGEINT) * nr + 1024 * cr) * 1000000)
        |    // (CAST(cr AS HUGEINT) * (nt + 1024)) AS BIGINT) AS qf
        |  FROM cnt CROSS JOIN tot),
        |docscore AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
        |    CAST(CAST(SUM(qf) AS HUGEINT) // COUNT(*) AS BIGINT) AS score_q
        |  FROM feats JOIN ratio USING (f) GROUP BY doc_id),
        |ranked AS (
        |  SELECT ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id ASC) AS rank,
        |    doc_id, n_feats, score_q
        |  FROM docscore)
        |SELECT rank, r.doc_id, d.lang, n_feats, score_q
        |FROM ranked r JOIN documents d ON r.doc_id = d.doc_id
        |WHERE rank <= 200 ORDER BY rank""".stripMargin,

    // R50 twin: the exact join size Σ fa·fb — what the collision-free
    // min-row inner product equals in the exact regime.
    "q_join_size_est" ->
      """WITH ca AS (
        |  SELECT c_nationkey AS k, COUNT(*) AS fa FROM customer GROUP BY 1),
        |sb AS (
        |  SELECT s_nationkey AS k, COUNT(*) AS fb FROM supplier GROUP BY 1)
        |SELECT
        |  (SELECT CAST(COUNT(c_nationkey) AS BIGINT) FROM customer) AS n_a,
        |  (SELECT CAST(COUNT(s_nationkey) AS BIGINT) FROM supplier) AS n_b,
        |  CAST(SUM(fa * fb) AS BIGINT) AS est_join_rows
        |FROM ca JOIN sb USING (k)""".stripMargin,

    // R49 twin: literal set arithmetic over distinct (source, shingle)
    // pairs — the θ=1 regime makes the sketch matrix exactly this.
    // Shingle rule shared with q_novelty (< 3 tokens → whole text).
    "q_theta_overlap" ->
      """WITH tk AS (
        |  SELECT DISTINCT source AS g, tok FROM (
        |    SELECT source,
        |      UNNEST(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |        ELSE list_transform(range(1, len(t) - 1),
        |          i -> array_to_string(list_slice(t, i, i + 2), ' ')) END)
        |        AS tok
        |    FROM (SELECT source,
        |            list_filter(string_split(text, ' '),
        |              x -> len(x) > 0) AS t
        |          FROM documents) WHERE len(t) > 0)),
        |sizes AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM tk GROUP BY g),
        |inter AS (
        |  SELECT x.g AS ga, y.g AS gb, CAST(COUNT(*) AS BIGINT) AS ni
        |  FROM tk x JOIN tk y ON x.tok = y.tok AND x.g < y.g
        |  GROUP BY x.g, y.g),
        |pairs AS (
        |  SELECT a.g AS ga, b.g AS gb FROM sizes a JOIN sizes b ON a.g < b.g)
        |SELECT p.ga AS grp_a, p.gb AS grp_b,
        |  sa.n AS n_a, sb.n AS n_b,
        |  sa.n + sb.n - COALESCE(i.ni, 0) AS n_union,
        |  COALESCE(i.ni, 0) AS n_inter,
        |  sa.n - COALESCE(i.ni, 0) AS n_a_not_b,
        |  CAST(COALESCE(i.ni, 0) * 1000000
        |    // GREATEST(sa.n + sb.n - COALESCE(i.ni, 0), 1) AS BIGINT)
        |    AS jaccard_ppm
        |FROM pairs p
        |JOIN sizes sa ON p.ga = sa.g
        |JOIN sizes sb ON p.gb = sb.g
        |LEFT JOIN inter i ON p.ga = i.ga AND p.gb = i.gb
        |ORDER BY grp_a, grp_b""".stripMargin,

    // L96 twin: injection replayed from the doc_id slot rule, then
    // HONEST substring detection on both stages (non-overlapping
    // REPLACE count ≡ the AC end-position count here — an
    // appended-once canary cannot self-overlap; strpos gates n_docs).
    "q_canary_audit" ->
      """WITH c AS (SELECT * FROM (VALUES
        |    (0, 'canary 7f3q9z alpha'), (1, 'canary 2k8x1v beta'),
        |    (2, 'canary 9p4m6w gamma'), (3, 'canary 5d0n2r delta'))
        |  t(cid, canary)),
        |tot AS (SELECT COUNT(*) AS n FROM documents),
        |corpora AS (
        |  SELECT 'clean' AS stage, doc_id, text FROM documents
        |  UNION ALL
        |  SELECT 'injected', d.doc_id,
        |    CASE WHEN d.doc_id % 40 % 10 = 0
        |      THEN d.text || ' ' ||
        |        (SELECT canary FROM c WHERE cid = (d.doc_id % 40) // 10)
        |      ELSE d.text END
        |  FROM documents d),
        |hits AS (
        |  SELECT s.stage, c.cid, c.canary,
        |    COUNT(*) FILTER (strpos(s.text, c.canary) > 0) AS n_docs,
        |    CAST(SUM((LENGTH(s.text) - LENGTH(REPLACE(s.text, c.canary, '')))
        |      // LENGTH(c.canary)) AS BIGINT) AS n_matches
        |  FROM corpora s, c GROUP BY s.stage, c.cid, c.canary)
        |SELECT CAST(h.cid AS BIGINT) AS canary_id, h.canary,
        |  CAST(h.n_docs AS BIGINT) AS n_docs, h.n_matches,
        |  CAST(h.n_docs * 1000000 // tot.n AS BIGINT) AS docs_ppm,
        |  h.n_matches = 0 AS clean, h.stage
        |FROM hits h, tot
        |ORDER BY h.stage, canary_id""".stripMargin,

    // R47 twin: the exact KS replay — cumulative counts over the
    // merged support (one window; graft's PrefixSum form is provably
    // the same values), cross-multiplied HUGEINT sup, ties on the max
    // to the smallest attaining value.
    "q_ks_drift" ->
      """WITH src AS (
        |  SELECT l_returnflag AS flag, l_orderkey % 2 AS par,
        |    CAST(l_extendedprice AS DOUBLE) AS v
        |  FROM lineitem),
        |u AS (
        |  SELECT 'r_vs_n' AS split, v,
        |    SUM(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS da,
        |    SUM(CASE WHEN flag = 'N' THEN 1 ELSE 0 END) AS db
        |  FROM src WHERE flag IN ('R', 'N') GROUP BY v
        |  UNION ALL
        |  SELECT 'parity', v,
        |    SUM(CASE WHEN par = 0 THEN 1 ELSE 0 END),
        |    SUM(CASE WHEN par = 1 THEN 1 ELSE 0 END)
        |  FROM src WHERE flag = 'R' GROUP BY v),
        |c AS (
        |  SELECT split, v,
        |    SUM(da) OVER (PARTITION BY split ORDER BY v) AS ca,
        |    SUM(db) OVER (PARTITION BY split ORDER BY v) AS cb,
        |    SUM(da) OVER (PARTITION BY split) AS na,
        |    SUM(db) OVER (PARTITION BY split) AS nb
        |  FROM u),
        |d AS (
        |  SELECT split, v, na, nb,
        |    ABS(CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na) AS dd,
        |    ROW_NUMBER() OVER (PARTITION BY split
        |      ORDER BY ABS(CAST(ca AS HUGEINT) * nb
        |        - CAST(cb AS HUGEINT) * na) DESC, v ASC) AS rk
        |  FROM c)
        |SELECT split, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(dd * 1000000 // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS d_ppm,
        |  v AS at_value
        |FROM d WHERE rk = 1 ORDER BY split""".stripMargin,

    // R56: the chi-square replay — per-split category counts, the
    // cross-multiplied 2xC statistic through HUGEINT, per-category
    // rows + the __total fold of the QUANTIZED contributions.
    "q_chi2_drift" ->
      """WITH d AS (
        |  SELECT lang, doc_id % 2 AS par,
        |    CAST(SUBSTR(source, 4) AS INT) AS srcnum
        |  FROM documents),
        |u AS (
        |  SELECT 'halves' AS split, lang AS category,
        |    SUM(CASE WHEN srcnum < 10 THEN 1 ELSE 0 END) AS o_a,
        |    SUM(CASE WHEN srcnum >= 10 THEN 1 ELSE 0 END) AS o_b
        |  FROM d GROUP BY lang
        |  UNION ALL
        |  SELECT 'parity', lang,
        |    SUM(CASE WHEN par = 0 THEN 1 ELSE 0 END),
        |    SUM(CASE WHEN par = 1 THEN 1 ELSE 0 END)
        |  FROM d GROUP BY lang),
        |tot AS (
        |  SELECT split, SUM(o_a) AS na, SUM(o_b) AS nb
        |  FROM u GROUP BY split),
        |per AS MATERIALIZED (
        |  SELECT u.split, u.category,
        |    CAST(u.o_a AS BIGINT) AS o_a, CAST(u.o_b AS BIGINT) AS o_b,
        |    CAST(CAST(1000000 AS HUGEINT)
        |      * (CAST(u.o_a AS HUGEINT) * t.nb - CAST(u.o_b AS HUGEINT) * t.na)
        |      * (CAST(u.o_a AS HUGEINT) * t.nb - CAST(u.o_b AS HUGEINT) * t.na)
        |      // (CAST(t.na AS HUGEINT) * t.nb * (u.o_a + u.o_b))
        |      AS BIGINT) AS contrib_micro
        |  FROM u JOIN tot t USING (split))
        |SELECT split, category, o_a, o_b, contrib_micro FROM per
        |UNION ALL
        |SELECT p.split, '__total', CAST(t.na AS BIGINT), CAST(t.nb AS BIGINT),
        |  CAST(SUM(p.contrib_micro) AS BIGINT)
        |FROM per p JOIN tot t USING (split)
        |GROUP BY p.split, t.na, t.nb
        |ORDER BY split, category""".stripMargin,

    // R55: the rank-sum replay — per-value counts, one cumulative
    // window, doubled midranks 2(c−t)+t+1, HUGEINT throughout; all
    // numerators non-negative so // and Spark's div agree.
    "q_rank_sum" ->
      """WITH src AS (
        |  SELECT l_returnflag AS flag, l_orderkey % 2 AS par,
        |    CAST(l_extendedprice AS DOUBLE) AS v
        |  FROM lineitem),
        |u AS (
        |  SELECT 'r_vs_n' AS split, v,
        |    SUM(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS da,
        |    SUM(CASE WHEN flag = 'N' THEN 1 ELSE 0 END) AS db
        |  FROM src WHERE flag IN ('R', 'N') GROUP BY v
        |  UNION ALL
        |  SELECT 'parity', v,
        |    SUM(CASE WHEN par = 0 THEN 1 ELSE 0 END),
        |    SUM(CASE WHEN par = 1 THEN 1 ELSE 0 END)
        |  FROM src WHERE flag = 'R' GROUP BY v),
        |c AS (
        |  SELECT split, v, da, db, da + db AS t,
        |    SUM(da + db) OVER (PARTITION BY split ORDER BY v) AS c,
        |    SUM(da) OVER (PARTITION BY split) AS na,
        |    SUM(db) OVER (PARTITION BY split) AS nb
        |  FROM u),
        |g AS (
        |  SELECT split, MAX(na) AS na, MAX(nb) AS nb, MAX(na + nb) AS n,
        |    SUM(CAST(da AS HUGEINT) * (2 * (c - t) + t + 1)) AS r2a,
        |    SUM(CAST(t AS HUGEINT) * t * t - t) AS ties
        |  FROM c GROUP BY split)
        |SELECT split, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(r2a - CAST(na AS HUGEINT) * (na + 1) AS BIGINT) AS u2,
        |  CAST((r2a - CAST(na AS HUGEINT) * (na + 1)) * 500000
        |    // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS auc_ppm,
        |  CAST(CAST(1000000 AS HUGEINT)
        |    * (CAST(n + 1 AS HUGEINT) * n * (n - 1) - ties)
        |    // (CAST(12 AS HUGEINT) * n * (n - 1)) AS BIGINT) AS varpp_micro
        |FROM g ORDER BY split""".stripMargin,

    // Drift twin: same feature stream, per-split bucket counts, exact
    // |ca·NB − cb·NA| terms through HUGEINT, one division at the end —
    // in LOCKSTEP with Curate.profileDrift's decimal(38,0).
    "q_corpus_drift" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, lang, UNNEST(t) AS g FROM toks
        |  UNION ALL
        |  SELECT doc_id, lang, t[i] || ' ' || t[i+1] AS g
        |  FROM toks, UNNEST(range(1, len(t))) AS u(i)
        |  WHERE len(t) >= 2),
        |feats AS (
        |  SELECT doc_id, lang,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(regexp_extract_all(g, '.'),
        |          c -> CAST(unicode(c) AS BIGINT))),
        |      (a, b) -> (a * 31 + b) % 1000000007) % 1024 AS f
        |  FROM grams),
        |pa1 AS (SELECT f, COUNT(*) AS ca FROM feats WHERE doc_id % 2 = 0 GROUP BY f),
        |pb1 AS (SELECT f, COUNT(*) AS cb FROM feats WHERE doc_id % 2 <> 0 GROUP BY f),
        |t1 AS (SELECT (SELECT COUNT(*) FROM feats WHERE doc_id % 2 = 0) AS na,
        |              (SELECT COUNT(*) FROM feats WHERE doc_id % 2 <> 0) AS nb),
        |d1 AS (
        |  SELECT 'parity' AS split, na AS n_a, nb AS n_b,
        |    CAST(CAST(SUM(ABS(CAST(COALESCE(ca, 0) AS HUGEINT) * nb -
        |                      CAST(COALESCE(cb, 0) AS HUGEINT) * na)) AS HUGEINT)
        |      * 1000000 // (2 * CAST(na AS HUGEINT) * nb) AS BIGINT) AS tv_q
        |  FROM (SELECT COALESCE(pa1.f, pb1.f) AS f, ca, cb
        |        FROM pa1 FULL OUTER JOIN pb1 ON pa1.f = pb1.f)
        |  CROSS JOIN t1 GROUP BY na, nb),
        |pa2 AS (SELECT f, COUNT(*) AS ca FROM feats WHERE lang = 'en' GROUP BY f),
        |pb2 AS (SELECT f, COUNT(*) AS cb FROM feats WHERE lang = 'zh' GROUP BY f),
        |t2 AS (SELECT (SELECT COUNT(*) FROM feats WHERE lang = 'en') AS na,
        |              (SELECT COUNT(*) FROM feats WHERE lang = 'zh') AS nb),
        |d2 AS (
        |  SELECT 'en_vs_zh' AS split, na AS n_a, nb AS n_b,
        |    CAST(CAST(SUM(ABS(CAST(COALESCE(ca, 0) AS HUGEINT) * nb -
        |                      CAST(COALESCE(cb, 0) AS HUGEINT) * na)) AS HUGEINT)
        |      * 1000000 // (2 * CAST(na AS HUGEINT) * nb) AS BIGINT) AS tv_q
        |  FROM (SELECT COALESCE(pa2.f, pb2.f) AS f, ca, cb
        |        FROM pa2 FULL OUTER JOIN pb2 ON pa2.f = pb2.f)
        |  CROSS JOIN t2 GROUP BY na, nb)
        |SELECT split, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, tv_q
        |FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2)
        |ORDER BY split""".stripMargin,

    // Gopher-rules twin: identical cross-multiplied integer threshold
    // tests over the same token/line stats — in LOCKSTEP with
    // Curate.gopherFlags (thresholds 50..100000 words, wordlen 3..10,
    // sym<0.1, bullet<90% & ellipsis<30% lines, alpha>=80%, >=2 stops).
    "q_gopher_rules" ->
      s"""$gopherMCteSql
        |SELECT doc_id, n_words,
        |  CAST(n_words >= 50 AND n_words <= 100000 AS BIGINT) AS ok_words,
        |  CAST(sumlen >= n_words * 3 AND sumlen <= n_words * 10 AS BIGINT) AS ok_wordlen,
        |  CAST(sym * 10 < n_words AS BIGINT) AS ok_symbols,
        |  CAST(bullet * 10 < nl * 9 AND ell * 10 < nl * 3 AS BIGINT) AS ok_lines,
        |  CAST(alpha * 5 >= n_words * 4 AS BIGINT) AS ok_alpha,
        |  CAST(stop >= 2 AS BIGINT) AS ok_stopwords,
        |  CAST(n_words >= 50 AND n_words <= 100000
        |    AND sumlen >= n_words * 3 AND sumlen <= n_words * 10
        |    AND sym * 10 < n_words
        |    AND bullet * 10 < nl * 9 AND ell * 10 < nl * 3
        |    AND alpha * 5 >= n_words * 4
        |    AND stop >= 2 AS BIGINT) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    // L73: the same 2-hex md5 thresholds (Mix.thr: k/256 → "%02x"),
    // integer inverse-probability reweighting.
    "q_ht_estimate" ->
      """WITH toks AS (
        |  SELECT lang, text,
        |    CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0))
        |      AS BIGINT) AS n_tok
        |  FROM documents),
        |sm AS (
        |  SELECT lang, COUNT(*) AS n_sampled,
        |    CAST(SUM(n_tok) AS BIGINT) AS s_tok,
        |    CAST(CASE WHEN lang = 'en' THEN 128 ELSE 64 END AS BIGINT) AS k
        |  FROM toks
        |  WHERE substr(md5(text), 1, 2) <
        |    CASE WHEN lang = 'en' THEN '80' ELSE '40' END
        |  GROUP BY lang),
        |act AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS actual_tokens
        |        FROM toks GROUP BY lang)
        |SELECT sm.lang, sm.n_sampled,
        |  CAST(sm.s_tok * 256 // sm.k AS BIGINT) AS est_tokens,
        |  act.actual_tokens,
        |  CAST(abs(sm.s_tok * 256 // sm.k - act.actual_tokens) * 1000
        |    // act.actual_tokens AS BIGINT) AS err_per_mille
        |FROM sm JOIN act USING (lang)
        |ORDER BY sm.lang""".stripMargin,

    // L72: rule failures unpivoted from the shared stat CTE, three
    // md5-ordered examples per rule.
    "q_rule_examples" ->
      s"""$gopherMCteSql,
        |f2 AS (
        |  SELECT doc_id, 'ok_words' AS rule FROM m
        |    WHERE NOT (n_words >= 50 AND n_words <= 100000)
        |  UNION ALL
        |  SELECT doc_id, 'ok_wordlen' FROM m
        |    WHERE NOT (sumlen >= n_words * 3 AND sumlen <= n_words * 10)
        |  UNION ALL
        |  SELECT doc_id, 'ok_symbols' FROM m WHERE NOT (sym * 10 < n_words)
        |  UNION ALL
        |  SELECT doc_id, 'ok_lines' FROM m
        |    WHERE NOT (bullet * 10 < nl * 9 AND ell * 10 < nl * 3)
        |  UNION ALL
        |  SELECT doc_id, 'ok_alpha' FROM m WHERE NOT (alpha * 5 >= n_words * 4)
        |  UNION ALL
        |  SELECT doc_id, 'ok_stopwords' FROM m WHERE NOT (stop >= 2)),
        |ky AS (
        |  SELECT f2.rule, f2.doc_id, md5(d.text) AS k
        |  FROM f2 JOIN documents d USING (doc_id)),
        |rk AS (
        |  SELECT rule, doc_id, k,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY rule ORDER BY k, doc_id)
        |      AS BIGINT) AS rank
        |  FROM ky)
        |SELECT rule, rank, doc_id, k FROM rk WHERE rank <= 3
        |ORDER BY rule, rank""".stripMargin,

    // Blocklist twin: identical token membership counts + integer
    // division, in lockstep with Curate.blocklistFlags' two-term list.
    "q_blocklist" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(t) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(t,
        |      x -> list_contains(['slow','stream'], x))) AS BIGINT) AS n_hits,
        |    CAST(len(list_filter(['slow','stream'],
        |      b -> list_contains(t, b))) AS BIGINT) AS n_distinct_hits
        |  FROM toks)
        |SELECT doc_id, n_tokens, n_hits, n_distinct_hits,
        |  CAST(n_hits * 1000 // greatest(n_tokens, 1) AS BIGINT) AS hits_per_mille,
        |  CAST(n_hits = 0 AS BIGINT) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    // L87 twin: Aho–Corasick counts every (pattern, end-position)
    // match — in SQL that is exactly "start offsets i where
    // substring(text, i, |p|) = p", overlaps and nested matches
    // included. Same pattern literals via acPatsLit (no drift).
    "q_substring_blocklist" ->
      s"""WITH pats(pid, p) AS (VALUES $acPatsLit),
        |hit AS (
        |  SELECT d.doc_id, len(d.text) AS n_chars, pt.pid,
        |    CAST(len(list_filter(range(1, len(d.text) - len(pt.p) + 2),
        |      i -> substring(d.text, i, len(pt.p)) = pt.p)) AS BIGINT) AS c
        |  FROM documents d CROSS JOIN pats pt)
        |SELECT doc_id, CAST(MAX(n_chars) AS BIGINT) AS n_chars,
        |  CAST(SUM(c) AS BIGINT) AS n_matches,
        |  CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_patterns,
        |  CAST(SUM(c) * 10000 // GREATEST(MAX(n_chars), 1) AS BIGINT)
        |    AS matches_per_10k,
        |  CAST(CASE WHEN SUM(c) = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM hit GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_substring_attr" ->
      s"""WITH pats(pid, p) AS (VALUES $acPatsLit),
        |hit AS (
        |  SELECT pt.pid, pt.p,
        |    CAST(len(list_filter(range(1, len(d.text) - len(pt.p) + 2),
        |      i -> substring(d.text, i, len(pt.p)) = pt.p)) AS BIGINT) AS c
        |  FROM documents d CROSS JOIN pats pt)
        |SELECT CAST(pid AS BIGINT) AS pid, p AS pattern,
        |  CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
        |  CAST(SUM(c) AS BIGINT) AS n_matches
        |FROM hit GROUP BY pid, p ORDER BY pid""".stripMargin,

    // L89 twin: the unrolled-CTE HITS replay (3 rounds, scale 10¹²).
    "q_hits" -> hitsSql(iters = 3, scale = 1000000000000L),

    // L92 twin: chunk-grid + marker-argmax + dominant-rollup replay.
    "q_lang_mixture" -> langMixtureSql(chunkTokens = 16),

    // L93 twin: the rolling-hash (poly-31 mod 1e9+7 over ASCII bytes)
    // of 'doc_id:pos:seed' replayed per token via list_reduce, same
    // keep rule, kept tokens re-joined in position order.
    "q_augment_dropout" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, u.p AS p, u.tok AS tok FROM (
        |    SELECT doc_id, UNNEST(list_transform(range(1, len(t) + 1),
        |      i -> struct_pack(p := i, tok := t[i]))) AS u
        |    FROM tk)),
        |hs AS (
        |  SELECT doc_id, p, tok,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, len(s) + 1),
        |        i -> CAST(ascii(s[i]) AS BIGINT))),
        |      (acc, b) -> (acc * 31 + b) % 1000000007) AS h
        |  FROM (SELECT doc_id, p, tok,
        |          CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)
        |            || ':7' AS s
        |        FROM tok)),
        |agg AS (
        |  SELECT doc_id,
        |    array_to_string(list(tok ORDER BY p)
        |      FILTER (h % 1000 >= 150), ' ') AS aug_text,
        |    CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(SUM(CASE WHEN h % 1000 < 150 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_dropped
        |  FROM hs GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(a.aug_text, '') AS aug_text,
        |  COALESCE(a.n_tokens, 0) AS n_tokens,
        |  COALESCE(a.n_dropped, 0) AS n_dropped,
        |  CAST(COALESCE(a.n_dropped, 0) * 1000
        |    // GREATEST(COALESCE(a.n_tokens, 0), 1) AS BIGINT)
        |    AS drop_pm_actual
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // L94 twin: per-codepoint counts (DuckDB string indexing is
    // codepoint-based, matching the kernel's codePointAt walk), Σk²
    // through HUGEINT, floor-div micro units, same keep rule.
    "q_char_concentration" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |ch AS (
        |  SELECT doc_id,
        |    UNNEST(list_transform(range(1, length(text) + 1),
        |      i -> text[i])) AS c
        |  FROM base WHERE length(text) > 0),
        |cnt AS (SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY doc_id, c),
        |st AS (
        |  SELECT doc_id, SUM(k) AS n, COUNT(*) AS nd, SUM(k * k) AS ss,
        |    MAX(k) AS mx
        |  FROM cnt GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(st.n, 0) AS BIGINT) AS n_cp,
        |  CAST(COALESCE(st.nd, 0) AS BIGINT) AS n_distinct_cp,
        |  CAST(COALESCE(st.ss * 1000000
        |    // GREATEST(st.n * st.n, 1), 0) AS BIGINT) AS simpson_ppm,
        |  CAST(COALESCE(st.mx * 1000 // GREATEST(st.n, 1), 0) AS BIGINT)
        |    AS top_char_pm,
        |  (COALESCE(st.ss * 1000000 // GREATEST(st.n * st.n, 1), 0) <= 78000
        |    AND COALESCE(st.nd, 0) >= 20) AS keep
        |FROM base d LEFT JOIN st USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // L91 twin: the engine's shingle rule (< n tokens → whole text as
    // one shingle — the q_novelty CASE) replayed per n, counted per
    // source.
    "q_ngram_diversity" -> (1 to 3).map { n =>
      s"""SELECT source, CAST($n AS BIGINT) AS n,
        |  CAST(COUNT(*) AS BIGINT) AS n_total,
        |  CAST(COUNT(DISTINCT sh) AS BIGINT) AS n_distinct,
        |  CAST(COUNT(DISTINCT sh) * 1000000
        |    // GREATEST(COUNT(*), 1) AS BIGINT) AS diversity_ppm
        |FROM (
        |  SELECT source, UNNEST(
        |    CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')]
        |         ELSE list_transform(range(1, len(t) - $n + 2),
        |                i -> array_to_string(list_slice(t, i, i + $n - 1), ' '))
        |    END) AS sh
        |  FROM (SELECT source,
        |          list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |        FROM documents))
        |GROUP BY source""".stripMargin
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) ORDER BY source, n"),

    // Scorecard twin: the gopher + repetition + blocklist per-doc
    // replays (verbatim fragments of their standalone oracles) rolled
    // up per source — in LOCKSTEP with Curate.scorecard's thresholds.
    "q_curation_scorecard" -> scorecardOracleSql,

    // L74: the corpus card composed from the SAME replay fragments —
    // stats + mixture inline (short), rule attrition by subquerying
    // the scorecard oracle verbatim, all unpivoted to the long format.
    "q_corpus_card" ->
      s"""WITH stq AS (
        |  SELECT lang AS grp_a, source AS grp_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
        |    CAST(SUM(len(list_filter(string_split(text, ' '),
        |      x -> len(x) > 0))) AS BIGINT) AS sum_tokens
        |  FROM documents GROUP BY lang, source),
        |statsl AS (
        |  SELECT 'stats' AS section, grp_a, grp_b,
        |    'n_docs' AS metric, n_docs AS value FROM stq
        |  UNION ALL SELECT 'stats', grp_a, grp_b, 'n_distinct', n_distinct FROM stq
        |  UNION ALL SELECT 'stats', grp_a, grp_b, 'sum_tokens', sum_tokens FROM stq),
        |mixl AS (
        |  SELECT 'mix' AS section, pl.grp_a, '' AS grp_b,
        |    'share_pm' AS metric,
        |    CAST(pl.tk * 1000 // tt.tot AS BIGINT) AS value
        |  FROM (SELECT grp_a, CAST(SUM(sum_tokens) AS BIGINT) AS tk
        |        FROM stq GROUP BY grp_a) pl
        |  CROSS JOIN (SELECT CAST(SUM(sum_tokens) AS BIGINT) AS tot
        |              FROM stq) tt),
        |scq AS (SELECT * FROM ($scorecardOracleSql) z),
        |rulesl AS (
        |  SELECT 'rules' AS section, '' AS grp_a, source AS grp_b,
        |    'n_docs' AS metric, CAST(n_docs AS BIGINT) AS value FROM scq
        |  UNION ALL SELECT 'rules', '', source, 'pass_gopher', pass_gopher FROM scq
        |  UNION ALL SELECT 'rules', '', source, 'pass_repetition', pass_repetition FROM scq
        |  UNION ALL SELECT 'rules', '', source, 'pass_blocklist', pass_blocklist FROM scq
        |  UNION ALL SELECT 'rules', '', source, 'pass_all', pass_all FROM scq)
        |SELECT section, grp_a, grp_b, metric, value FROM (
        |  SELECT * FROM statsl
        |  UNION ALL SELECT * FROM mixl
        |  UNION ALL SELECT * FROM rulesl) u
        |ORDER BY section, grp_a, grp_b, metric""".stripMargin,

    

    // Grouped-blocklist twin: the same per-language CASE over token
    // membership counts — in LOCKSTEP with blocklistFlagsByLang's map.
    "q_blocklist_grouped" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, lang,
        |    CAST(len(t) AS BIGINT) AS n_tokens,
        |    CASE lang
        |      WHEN 'en' THEN ['slow','stream']
        |      WHEN 'zh' THEN ['slow']
        |      WHEN 'de' THEN ['window']
        |      ELSE ['stream'] END AS bl,
        |    t
        |  FROM toks),
        |f AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(len(list_filter(t, x -> list_contains(bl, x))) AS BIGINT) AS n_hits,
        |    CAST(len(list_filter(bl, b -> list_contains(t, b))) AS BIGINT) AS n_distinct_hits
        |  FROM m)
        |SELECT doc_id, lang, n_tokens, n_hits, n_distinct_hits,
        |  CAST(n_hits * 1000 // greatest(n_tokens, 1) AS BIGINT) AS hits_per_mille,
        |  CAST(n_hits = 0 AS BIGINT) AS keep
        |FROM f ORDER BY doc_id""".stripMargin,

    // 11a: per-tenant card replay — the q_corpus_card oracle with the
    // tenant (source) threaded through stats/mix and the scorecard
    // grouped (source, lang).
    "q_corpus_card_grouped" ->
      s"""WITH stq AS (
        |  SELECT source AS tenant, lang AS grp_a,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
        |    CAST(SUM(len(list_filter(string_split(text, ' '),
        |      x -> len(x) > 0))) AS BIGINT) AS sum_tokens
        |  FROM documents GROUP BY source, lang),
        |statsl AS (
        |  SELECT tenant, 'stats' AS section, grp_a,
        |    'n_docs' AS metric, n_docs AS value FROM stq
        |  UNION ALL SELECT tenant, 'stats', grp_a, 'n_distinct', n_distinct FROM stq
        |  UNION ALL SELECT tenant, 'stats', grp_a, 'sum_tokens', sum_tokens FROM stq),
        |mixl AS (
        |  SELECT stq.tenant, 'mix' AS section, grp_a,
        |    'share_pm' AS metric,
        |    CAST(stq.sum_tokens * 1000 // tt.tot AS BIGINT) AS value
        |  FROM stq JOIN (SELECT tenant, CAST(SUM(sum_tokens) AS BIGINT) AS tot
        |                 FROM stq GROUP BY tenant) tt USING (tenant)),
        |scq AS (SELECT * FROM (${scorecardOracleSqlBy("source, lang")}) z),
        |rulesl AS (
        |  SELECT source AS tenant, 'rules' AS section, lang AS grp_a,
        |    'n_docs' AS metric, CAST(n_docs AS BIGINT) AS value FROM scq
        |  UNION ALL SELECT source, 'rules', lang, 'pass_gopher', pass_gopher FROM scq
        |  UNION ALL SELECT source, 'rules', lang, 'pass_repetition', pass_repetition FROM scq
        |  UNION ALL SELECT source, 'rules', lang, 'pass_blocklist', pass_blocklist FROM scq
        |  UNION ALL SELECT source, 'rules', lang, 'pass_all', pass_all FROM scq)
        |SELECT tenant, section, grp_a, metric, value FROM (
        |  SELECT * FROM statsl
        |  UNION ALL SELECT * FROM mixl
        |  UNION ALL SELECT * FROM rulesl) u
        |ORDER BY tenant, section, grp_a, metric""".stripMargin,

    // Fertility twin. Dialect-portable on purpose (the r9 driver
    // hash-failed this row on a DuckDB version we cannot test): the
    // BPE pre-token count is replayed WITHOUT any regex — a per-
    // codepoint walk (unicode(text[i])) counts letter-run starts,
    // digit-run starts and other-chars arithmetically — and every
    // aggregate is CAST to BIGINT before the µ-unit floor-divs so no
    // HUGEINT (DuckDB's SUM(BIGINT) type) reaches the arithmetic.
    "q_tokenizer_fertility" ->
      """WITH m AS (
        |  SELECT lang, n_chars,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> len(x) > 0)) AS BIGINT) AS ws,
        |    list_transform(range(1, CAST(length(text) AS BIGINT) + 1),
        |                   i -> unicode(text[i])) AS cps
        |  FROM documents),
        |c AS (
        |  SELECT lang, n_chars, ws,
        |    CAST(len(list_filter(range(1, len(cps) + 1), i ->
        |      ((cps[i] BETWEEN 65 AND 90) OR (cps[i] BETWEEN 97 AND 122))
        |      AND NOT COALESCE((cps[i-1] BETWEEN 65 AND 90)
        |                    OR (cps[i-1] BETWEEN 97 AND 122), FALSE))) AS BIGINT)
        |    + CAST(len(list_filter(range(1, len(cps) + 1), i ->
        |      (cps[i] BETWEEN 48 AND 57)
        |      AND NOT COALESCE(cps[i-1] BETWEEN 48 AND 57, FALSE))) AS BIGINT)
        |    + CAST(len(list_filter(cps, cp -> NOT ((cp BETWEEN 65 AND 90)
        |        OR (cp BETWEEN 97 AND 122) OR (cp BETWEEN 48 AND 57)
        |        OR cp = 32))) AS BIGINT) AS bpe
        |  FROM m),
        |g AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(ws) AS BIGINT) AS ws_tokens,
        |    CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |  FROM c GROUP BY lang)
        |SELECT lang, n_docs, ws_tokens, bpe_tokens, n_chars,
        |  CAST(bpe_tokens * 1000000 // greatest(ws_tokens, CAST(1 AS BIGINT)) AS BIGINT)
        |    AS fertility_q,
        |  CAST(n_chars * 1000000 // greatest(bpe_tokens, CAST(1 AS BIGINT)) AS BIGINT)
        |    AS chars_per_token_q
        |FROM g ORDER BY lang""".stripMargin,

    // Grouped-DSIR twin: the per-source replay of the q_dsir_select
    // chain (GROUP BY source threaded through counts, totals, ratio,
    // and the per-group ranking window).
    "q_dsir_grouped" ->
      """WITH toks AS (
        |  SELECT doc_id, source, lang = 'en' AS is_t,
        |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, source, is_t, UNNEST(t) AS g FROM toks
        |  UNION ALL
        |  SELECT doc_id, source, is_t, t[i] || ' ' || t[i+1] AS g
        |  FROM toks, UNNEST(range(1, len(t))) AS u(i)
        |  WHERE len(t) >= 2),
        |feats AS (
        |  SELECT doc_id, source, is_t,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(regexp_extract_all(g, '.'),
        |          c -> CAST(unicode(c) AS BIGINT))),
        |      (a, b) -> (a * 31 + b) % 1000000007) % 1024 AS f
        |  FROM grams),
        |cnt AS (
        |  SELECT source, f, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
        |    COUNT(*) AS cr
        |  FROM feats GROUP BY source, f),
        |tot AS (
        |  SELECT source, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS nt,
        |    COUNT(*) AS nr
        |  FROM feats GROUP BY source),
        |ratio AS (
        |  SELECT cnt.source, f,
        |    CAST(((CAST(ct AS HUGEINT) * nr + 1024 * cr) * 1000000)
        |      // (CAST(cr AS HUGEINT) * (nt + 1024)) AS BIGINT) AS qf
        |  FROM cnt JOIN tot ON cnt.source = tot.source),
        |docscore AS (
        |  SELECT feats.doc_id, feats.source,
        |    CAST(COUNT(*) AS BIGINT) AS n_feats,
        |    CAST(CAST(SUM(qf) AS HUGEINT) // COUNT(*) AS BIGINT) AS score_q
        |  FROM feats JOIN ratio
        |    ON feats.source = ratio.source AND feats.f = ratio.f
        |  GROUP BY feats.doc_id, feats.source),
        |ranked AS (
        |  SELECT source, doc_id, n_feats, score_q,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |                       ORDER BY score_q DESC, doc_id ASC) AS rank
        |  FROM docscore)
        |SELECT source, rank, doc_id, n_feats, score_q
        |FROM ranked WHERE rank <= 5
        |ORDER BY source, rank""".stripMargin,

    // Exact-regime count-min oracle: with the corpus's vocabulary far
    // below the sketch width, estimates are collision-free and equal
    // exact token counts at both the per-lang and rolled-up grains.
    "q_count_min" ->
      """WITH toks AS (
        |  SELECT lang, unnest(list_filter(string_split(text,' '), x->len(x)>0)) AS tok
        |  FROM documents),
        |all_toks AS (SELECT lang, tok FROM toks UNION ALL SELECT '*' AS lang, tok FROM toks),
        |grains AS (SELECT DISTINCT lang FROM all_toks),
        |probes(term) AS (VALUES ('join'),('merge'),('spark'),('stream'),('vector')),
        |grid AS (SELECT g.lang AS lang, p.term AS term FROM grains g CROSS JOIN probes p),
        |cnt AS (SELECT lang AS clang, tok, CAST(COUNT(*) AS BIGINT) AS c
        |        FROM all_toks GROUP BY 1, 2)
        |SELECT grid.lang, grid.term, CAST(COALESCE(cnt.c, 0) AS BIGINT) AS est
        |FROM grid LEFT JOIN cnt ON grid.lang = cnt.clang AND grid.term = cnt.tok
        |ORDER BY grid.lang, grid.term""".stripMargin,

    "q_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, t,
        |    CASE WHEN len(t) >= 2
        |      THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
        |      ELSE [] END AS bgs,
        |    CASE WHEN len(t) >= 3
        |      THEN list_transform(range(1, len(t) - 1),
        |             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |      ELSE [array_to_string(t, ' ')] END AS tris
        |  FROM toks),
        |f AS (
        |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        |    FLOOR(CAST(len(t) - len(list_distinct(t)) AS DOUBLE)
        |      / GREATEST(len(t), 1) * 10000 + 0.5) / 10000 AS dup_token_frac,
        |    CASE WHEN len(bgs) = 0 THEN 0.0 ELSE
        |      FLOOR(CAST(list_max(list_transform(list_distinct(bgs),
        |        x -> len(list_filter(bgs, y -> y = x)))) AS DOUBLE)
        |        / len(bgs) * 10000 + 0.5) / 10000 END AS top_bigram_frac,
        |    FLOOR(CAST(len(tris) - len(list_distinct(tris)) AS DOUBLE)
        |      / GREATEST(len(tris), 1) * 10000 + 0.5) / 10000 AS dup_trigram_frac
        |  FROM bg)
        |SELECT doc_id, n_tokens, dup_token_frac, top_bigram_frac, dup_trigram_frac,
        |  (dup_token_frac <= 0.65 AND top_bigram_frac <= 0.08
        |    AND dup_trigram_frac <= 0.0) AS keep
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_boilerplate" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |      ELSE list_transform(range(1, len(t) - 1),
        |             i -> array_to_string(list_slice(t, i, i + 2), ' ')) END) AS s
        |  FROM toks),
        |ex AS (SELECT doc_id, UNNEST(s) AS g FROM sh),
        |inv AS (SELECT g FROM ex GROUP BY g HAVING COUNT(*) >= 5),
        |per AS (
        |  SELECT e.doc_id, COUNT(*) AS n_boiler
        |  FROM ex e JOIN inv ON e.g = inv.g GROUP BY e.doc_id)
        |SELECT sh.doc_id, CAST(len(sh.s) AS BIGINT) AS n_shingles,
        |  CAST(COALESCE(per.n_boiler, 0) AS BIGINT) AS n_boiler,
        |  FLOOR(CAST(COALESCE(per.n_boiler, 0) AS DOUBLE)
        |    / GREATEST(len(sh.s), 1) * 10000 + 0.5) / 10000 AS boiler_frac,
        |  COALESCE(per.n_boiler, 0) >= 5 AS flag
        |FROM sh LEFT JOIN per ON sh.doc_id = per.doc_id
        |ORDER BY sh.doc_id""".stripMargin,

    // L78: window counts per ladder level + first-satisfying CASE —
    // the declarative twin of the groupBy-and-join-back chain.
    "q_k_anonymity" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source,
        |    CAST(n_chars // 100 AS VARCHAR) AS b0,
        |    CAST(n_chars // 1000 AS VARCHAR) AS b1
        |  FROM documents),
        |c AS (
        |  SELECT *,
        |    COUNT(*) OVER (PARTITION BY lang, source, b0) AS c0,
        |    COUNT(*) OVER (PARTITION BY lang, source, b1) AS c1,
        |    COUNT(*) OVER (PARTITION BY lang, source) AS c2,
        |    COUNT(*) OVER (PARTITION BY lang) AS c3,
        |    COUNT(*) OVER () AS c4
        |  FROM d),
        |lv AS (
        |  SELECT *,
        |    CASE WHEN c0 >= 5 THEN 0 WHEN c1 >= 5 THEN 1
        |         WHEN c2 >= 5 THEN 2 WHEN c3 >= 5 THEN 3 ELSE 4 END AS level
        |  FROM c)
        |SELECT doc_id, level,
        |  CASE WHEN level <= 3 THEN lang ELSE 'ANY' END AS lang,
        |  CASE WHEN level <= 2 THEN source ELSE 'ANY' END AS source,
        |  CASE WHEN level = 0 THEN b0 WHEN level = 1 THEN b1
        |       ELSE 'ANY' END AS len_b,
        |  CASE level WHEN 0 THEN c0 WHEN 1 THEN c1 WHEN 2 THEN c2
        |             WHEN 3 THEN c3 ELSE c4 END AS n_group,
        |  (CASE level WHEN 0 THEN c0 WHEN 1 THEN c1 WHEN 2 THEN c2
        |              WHEN 3 THEN c3 ELSE c4 END) >= 5 AS safe
        |FROM lv ORDER BY doc_id""".stripMargin,

    // L77: the oracle replays the naive ROW_NUMBER formulation — the
    // PrefixSum.keyed two-level scans produce identical rank values
    // (PrefixSumSpec pins the equivalence). Descending ranks tie on
    // doc_id DESC (the reversal of the engine's (sig ASC, id ASC)
    // scan order); all signals are integer floor-divs.
    "q_quality_blend" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split(text, ' '),
        |                         x -> len(x) > 0)) AS BIGINT) AS n_tok,
        |    CAST(len(list_distinct(list_filter(string_split(text, ' '),
        |                         x -> len(x) > 0))) AS BIGINT) AS n_dist,
        |    CAST(LENGTH(text) AS BIGINT) AS n_chars
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id, lang, n_tok AS s_len,
        |    n_dist * 1000000 // GREATEST(n_tok, 1) AS s_div,
        |    n_chars * 1000 // GREATEST(n_tok, 1) AS s_wlen,
        |    COUNT(*) OVER (PARTITION BY lang) AS n_lang
        |  FROM base),
        |rk AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |                       ORDER BY s_len DESC, doc_id DESC) AS d_len,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |                       ORDER BY s_div DESC, doc_id DESC) AS d_div,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |                       ORDER BY s_wlen DESC, doc_id DESC) AS d_wlen
        |  FROM sig),
        |bd AS (SELECT *, d_len + d_div + d_wlen AS borda FROM rk),
        |fin AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
        |                               ORDER BY borda ASC, doc_id ASC)
        |    AS r_final
        |  FROM bd)
        |SELECT doc_id, lang, s_len, s_div, s_wlen, d_len, d_div, d_wlen,
        |  borda, r_final, r_final <= (n_lang + 3) // 4 AS keep
        |FROM fin ORDER BY doc_id""".stripMargin,

    // L81: the oracle replays the naive one-window formulation —
    // identical values by the PrefixSum equivalence. Mid-rank ppm =
    // (2r−1)·500000 // n_src; normalized value = the global order
    // statistic at rank 1 + ppm·N // 1e6 (ties (score, id) ASC on
    // both sides).
    "q_quantile_norm" ->
      """WITH sc AS (
        |  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS s
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source, s,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY s, doc_id) AS r,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM sc),
        |gl AS (
        |  SELECT s, ROW_NUMBER() OVER (ORDER BY s, doc_id) AS gr FROM sc),
        |nt AS (SELECT COUNT(*) AS n_total FROM sc),
        |t AS (
        |  SELECT doc_id, source, s, (2 * r - 1) * 500000 // n AS ppm
        |  FROM g)
        |SELECT t.doc_id, t.source, t.s AS score, t.ppm,
        |  gl.s AS norm_score
        |FROM t, nt
        |JOIN gl ON gl.gr = 1 + t.ppm * nt.n_total // 1000000
        |ORDER BY t.doc_id""".stripMargin,

    "q_quality_calibrated" ->
      s"""WITH ${Shared.qualityStatsSql("doc_id, lang")},
         |q AS (
         |  SELECT doc_id, lang, ${Shared.q1e4Sql} AS q1e4
         |  FROM stats),
         |r AS (
         |  SELECT doc_id, lang, q1e4,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY q1e4, doc_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY lang) AS n
         |  FROM q),
         |m AS (SELECT lang, q1e4 AS med_q1e4 FROM r
         |      WHERE rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT))
         |SELECT q.doc_id, q.lang, q.q1e4, m.med_q1e4,
         |  q.q1e4 >= m.med_q1e4 AS keep
         |FROM q JOIN m ON q.lang = m.lang
         |ORDER BY q.doc_id""".stripMargin,

    "q_quality_mad" ->
      s"""WITH ${Shared.qualityStatsSql("doc_id, lang")},
         |q AS (
         |  SELECT doc_id, lang, ${Shared.q1e4Sql} AS q1e4
         |  FROM stats),
         |r1 AS (
         |  SELECT doc_id, lang, q1e4,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY q1e4, doc_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY lang) AS n
         |  FROM q),
         |m1 AS (SELECT lang, q1e4 AS med FROM r1
         |       WHERE rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT)),
         |d AS (
         |  SELECT q.doc_id, q.lang, ABS(q.q1e4 - m1.med) AS adev
         |  FROM q JOIN m1 USING (lang)),
         |r2 AS (
         |  SELECT doc_id, lang, adev,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY adev, doc_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY lang) AS n
         |  FROM d),
         |m2 AS (SELECT lang, adev AS mad FROM r2
         |       WHERE rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT))
         |SELECT m1.lang, m1.med, m2.mad FROM m1 JOIN m2 USING (lang)
         |ORDER BY m1.lang""".stripMargin,

    "q_tfidf_keywords" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    UNNEST(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS tok
        |  FROM documents),
        |dfreq AS (
        |  SELECT tok, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM toks)
        |  GROUP BY tok),
        |tf AS (SELECT lang, tok, COUNT(*) AS tf FROM toks GROUP BY lang, tok),
        |tot AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.lang, tf.tok, tf.tf, dfreq.df,
        |    CAST(FLOOR(CAST(tf.tf AS DOUBLE) *
        |      ((tot.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)) * 100 + 0.5)
        |      AS BIGINT) AS score_q
        |  FROM tf JOIN dfreq ON tf.tok = dfreq.tok CROSS JOIN tot),
        |ranked AS (
        |  SELECT lang, tok, tf, df, score_q,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |                       ORDER BY score_q DESC, tok ASC) AS rank
        |  FROM scored)
        |SELECT lang, rank, tok, tf, df, score_q FROM ranked WHERE rank <= 10
        |ORDER BY lang, rank""".stripMargin,

    // The rolling-hash bow recurrence now lives in
    // Shared.hashedBowCteSql (also the dense side of q_hybrid_retrieval).
    "q_feature_hash" ->
      s"""WITH ${Shared.hashedBowCteSql("documents", "doc_id", "text", "d")}
        |SELECT doc_id, bucket, w AS weight FROM dbow
        |ORDER BY doc_id, bucket""".stripMargin,

    "q_heavy_hitters_sketch" ->
      """WITH toks AS (
        |  SELECT lang,
        |    UNNEST(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS term
        |  FROM documents),
        |c AS (SELECT lang, term, COUNT(*) AS est FROM toks GROUP BY lang, term),
        |r AS (
        |  SELECT lang, term, est,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |                       ORDER BY est DESC, term ASC) AS rank
        |  FROM c)
        |SELECT lang, rank, term, est, CAST(0 AS BIGINT) AS err
        |FROM r WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,

    "q_grouping_sets" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(len(list_filter(string_split(text, ' '), x -> len(x) > 0)))
        |    AS BIGINT) AS sum_tokens
        |FROM documents
        |GROUP BY GROUPING SETS ((lang), (source), ())
        |ORDER BY COALESCE(lang, 'zz'), COALESCE(source, 'zz')""".stripMargin,

    "q_ccnet_buckets" ->
      s"""WITH ${Shared.bigramScoredCteSql},
        |docscore AS (
        |  SELECT doc_id, CAST(SUM(q) AS BIGINT) // COUNT(*) AS score_q
        |  FROM scored GROUP BY doc_id),
        |b AS (
        |  SELECT d.lang, s.doc_id, s.score_q,
        |    NTILE(3) OVER (PARTITION BY d.lang
        |                   ORDER BY s.score_q, s.doc_id) AS bucket
        |  FROM docscore s JOIN documents d USING (doc_id))
        |SELECT lang, CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_docs,
        |  MIN(score_q) AS min_q, MAX(score_q) AS max_q
        |FROM b GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin,

    "q_block_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |nb AS (
        |  SELECT doc_id, t,
        |    GREATEST(1, CAST(CEIL(len(t) / 16.0) AS BIGINT)) AS n_blocks
        |  FROM toks),
        |blocks AS (
        |  SELECT doc_id,
        |    UNNEST(range(n_blocks)) AS bidx,
        |    UNNEST(list_transform(range(n_blocks),
        |      i -> array_to_string(list_slice(t, i * 16 + 1, i * 16 + 16), ' ')))
        |      AS btext
        |  FROM nb),
        |ranked AS (
        |  SELECT doc_id, bidx, btext,
        |    ROW_NUMBER() OVER (PARTITION BY md5(btext)
        |                       ORDER BY doc_id, bidx) AS rn
        |  FROM blocks),
        |kept AS (
        |  SELECT doc_id, COUNT(*) AS n_kept,
        |    md5(string_agg(btext, ' ' ORDER BY bidx)) AS dedup_md5
        |  FROM ranked WHERE rn = 1 GROUP BY doc_id)
        |SELECT n.doc_id, n.n_blocks,
        |  CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
        |  FLOOR(CAST(COALESCE(k.n_kept, 0) AS DOUBLE) / n.n_blocks * 10000 + 0.5)
        |    / 10000 AS kept_frac,
        |  COALESCE(k.dedup_md5, md5('')) AS dedup_md5
        |FROM nb n LEFT JOIN kept k ON n.doc_id = k.doc_id
        |ORDER BY n.doc_id""".stripMargin,

    // q_substr_dedup oracle: the full ExactSubstr chain replayed on
    // gram STRINGS — sliding 8-gram windows, corpus-first election by
    // (doc_id, pos), islands interval merge, coverage-filtered
    // reassembly, md5 fingerprint. Hash-vs-string identity is the
    // standing w.h.p. contract.
    "q_substr_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |n0 AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n FROM toks),
        |occ AS (
        |  SELECT doc_id,
        |    UNNEST(range(n - 7)) AS pos,
        |    UNNEST(list_transform(range(n - 7),
        |      i -> array_to_string(list_slice(t, i + 1, i + 8), ' '))) AS gram
        |  FROM n0 WHERE n >= 8),
        |dup AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos,
        |      COUNT(*) OVER (PARTITION BY gram) AS c,
        |      ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rk
        |    FROM occ) z
        |  WHERE c >= 2 AND rk > 1),
        |isl AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN pos > COALESCE(MAX(pos + 8) OVER (
        |        PARTITION BY doc_id ORDER BY pos
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |      THEN 1 ELSE 0 END AS s_new
        |  FROM dup),
        |sid0 AS (
        |  SELECT doc_id, pos,
        |    SUM(s_new) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM isl),
        |spans AS (
        |  SELECT doc_id, sid, MIN(pos) AS s, MAX(pos) + 8 AS e
        |  FROM sid0 GROUP BY doc_id, sid),
        |rm AS (
        |  SELECT doc_id, SUM(e - s) AS n_removed FROM spans GROUP BY doc_id),
        |tok_pos AS (
        |  SELECT doc_id, UNNEST(range(len(t))) AS pos, UNNEST(t) AS tok FROM n0),
        |cov AS (
        |  SELECT tp.doc_id, tp.pos, tp.tok,
        |    EXISTS (SELECT 1 FROM spans s
        |            WHERE s.doc_id = tp.doc_id
        |              AND tp.pos >= s.s AND tp.pos < s.e) AS covered
        |  FROM tok_pos tp),
        |kept AS (
        |  SELECT doc_id,
        |    COALESCE(string_agg(tok, ' ' ORDER BY pos) FILTER (WHERE NOT covered),
        |             '') AS kept_text
        |  FROM cov GROUP BY doc_id)
        |SELECT n0.doc_id, n0.n AS n_tokens,
        |  CAST(COALESCE(rm.n_removed, 0) AS BIGINT) AS n_removed,
        |  FLOOR((n0.n - COALESCE(rm.n_removed, 0)) / GREATEST(n0.n, 1) * 10000 + 0.5)
        |    / 10000 AS kept_frac,
        |  md5(COALESCE(k.kept_text, '')) AS dedup_md5
        |FROM n0
        |LEFT JOIN rm ON rm.doc_id = n0.doc_id
        |LEFT JOIN kept k ON k.doc_id = n0.doc_id
        |ORDER BY n0.doc_id""".stripMargin,

    "q_classifier_margin" ->
      s"""$classifierMarginCteSql
        |SELECT doc_id, lang, margin, margin > 0 AS pred_en
        |FROM m ORDER BY doc_id""".stripMargin,

    // L44c: fixed-width value bins off the global margin bounds —
    // integer arithmetic in lockstep with the Spark expression.
    // L103: the AUC replay — grouped tie form, cumulative count
    // window, HUGEINT-widened micro division.
    "q_classifier_auc" ->
      s"""$classifierMarginCteSql,
        |g AS (
        |  SELECT margin AS mv, COUNT(*) AS c,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS p
        |  FROM m GROUP BY margin),
        |cg AS (SELECT mv, c, p, SUM(c) OVER (ORDER BY mv) AS cumc FROM g),
        |st AS (
        |  SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
        |    CAST(SUM(c - p) AS BIGINT) AS n_neg,
        |    CAST(SUM(p * (2 * (cumc - c) + c + 1)) AS HUGEINT) AS s2r
        |  FROM cg)
        |SELECT n_pos, n_neg,
        |  CAST((s2r - n_pos * (n_pos + 1)) * 1000000
        |    // (CAST(n_pos AS HUGEINT) * 2 * n_neg) AS BIGINT) AS auc_micro
        |FROM st""".stripMargin,

    // L104: the grouped-AUC replay — same tie form per source with a
    // per-group cumulative window; degenerate groups yield NULL.
    "q_classifier_auc_grouped" ->
      s"""$classifierMarginCteSql,
        |g AS (
        |  SELECT d.source AS grp, m.margin AS mv, COUNT(*) AS c,
        |    CAST(SUM(CASE WHEN m.lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS p
        |  FROM m JOIN documents d USING (doc_id)
        |  GROUP BY d.source, m.margin),
        |cg AS (
        |  SELECT grp, mv, c, p,
        |    SUM(c) OVER (PARTITION BY grp ORDER BY mv) AS cumc
        |  FROM g),
        |st AS (
        |  SELECT grp, CAST(SUM(p) AS BIGINT) AS n_pos,
        |    CAST(SUM(c - p) AS BIGINT) AS n_neg,
        |    CAST(SUM(p * (2 * (cumc - c) + c + 1)) AS HUGEINT) AS s2r
        |  FROM cg GROUP BY grp)
        |SELECT grp AS source, n_pos, n_neg,
        |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |    CAST((s2r - n_pos * (n_pos + 1)) * 1000000
        |      // (CAST(n_pos AS HUGEINT) * 2 * n_neg) AS BIGINT) END
        |    AS auc_micro
        |FROM st ORDER BY source""".stripMargin,

    // L116: the CV replay — the grouped-AUC CTEs with fold = doc_id %
    // 5, then the K-row jackknife arithmetic and the -1 summary fold.
    "q_classifier_cv" ->
      s"""$classifierMarginCteSql,
        |g AS (
        |  SELECT m.doc_id % 5 AS fold, m.margin AS mv, COUNT(*) AS c,
        |    CAST(SUM(CASE WHEN m.lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS p
        |  FROM m GROUP BY m.doc_id % 5, m.margin),
        |cg AS (
        |  SELECT fold, mv, c, p,
        |    SUM(c) OVER (PARTITION BY fold ORDER BY mv) AS cumc
        |  FROM g),
        |st AS (
        |  SELECT fold, CAST(SUM(p) AS BIGINT) AS n_pos,
        |    CAST(SUM(c - p) AS BIGINT) AS n_neg,
        |    CAST(SUM(p * (2 * (cumc - c) + c + 1)) AS HUGEINT) AS s2r
        |  FROM cg GROUP BY fold),
        |pf AS MATERIALIZED (
        |  SELECT CAST(fold AS BIGINT) AS fold, n_pos, n_neg,
        |    CAST((s2r - n_pos * (n_pos + 1)) * 1000000
        |      // (CAST(n_pos AS HUGEINT) * 2 * n_neg) AS BIGINT)
        |      AS auc_micro
        |  FROM st),
        |t AS (SELECT COUNT(*) AS k, SUM(auc_micro) AS s FROM pf),
        |dev AS MATERIALIZED (
        |  SELECT pf.fold, pf.n_pos, pf.n_neg, pf.auc_micro,
        |    (t.k * pf.auc_micro - t.s) * (t.k * pf.auc_micro - t.s)
        |      AS dev2_q
        |  FROM pf, t)
        |SELECT fold, n_pos, n_neg, auc_micro,
        |  CAST(dev2_q AS BIGINT) AS dev2_q
        |FROM dev
        |UNION ALL
        |SELECT -1, CAST(SUM(d.n_pos) AS BIGINT),
        |  CAST(SUM(d.n_neg) AS BIGINT),
        |  CAST(MAX(t.s) // MAX(t.k) AS BIGINT),
        |  CAST(SUM(d.dev2_q) AS BIGINT)
        |FROM dev d, t
        |ORDER BY fold""".stripMargin,

    // L103b: the PR-curve replay — ROW_NUMBER under the same
    // (margin DESC, doc_id) tiebreak, decile fold, cumulative window.
    "q_classifier_pr" ->
      s"""$classifierMarginCteSql,
        |b AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS np
        |  FROM m),
        |r AS (
        |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |    ROW_NUMBER() OVER (ORDER BY margin DESC, doc_id ASC) AS rk
        |  FROM m),
        |d AS (
        |  SELECT (rk - 1) * 10 // (SELECT n FROM b) AS decile,
        |    COUNT(*) AS n_bucket, CAST(SUM(y) AS BIGINT) AS pos_bucket
        |  FROM r GROUP BY 1),
        |cw AS (
        |  SELECT decile,
        |    SUM(n_bucket) OVER (ORDER BY decile) AS cum_n,
        |    SUM(pos_bucket) OVER (ORDER BY decile) AS cum_pos
        |  FROM d)
        |SELECT decile, CAST(cum_n AS BIGINT) AS cum_n,
        |  CAST(cum_pos AS BIGINT) AS cum_pos,
        |  CAST(cum_pos * 1000000 // cum_n AS BIGINT) AS precision_ppm,
        |  CAST(cum_pos * 1000000 // (SELECT np FROM b) AS BIGINT)
        |    AS recall_ppm
        |FROM cw ORDER BY decile""".stripMargin,

    "q_calibration" ->
      s"""$classifierMarginCteSql,
        |bounds AS (SELECT MIN(margin) AS mn, MAX(margin) AS mx FROM m),
        |binned AS (
        |  SELECT m.lang, m.margin, (m.margin - b.mn) * 10 // (b.mx - b.mn + 1) AS bin
        |  FROM m, bounds b)
        |SELECT bin, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
        |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000 // COUNT(*)
        |    AS BIGINT) AS en_per_mille,
        |  MIN(margin) AS lo_margin, MAX(margin) AS hi_margin
        |FROM binned GROUP BY bin ORDER BY bin""".stripMargin,

    // L107: the reliability replay — same ppm normalization (HUGEINT
    // widening ≡ Spark's decimal(38,0)), equal-width ECE bins with
    // the last-bin cap, per-bin observed/predicted/gap.
    "q_reliability" ->
      s"""$classifierMarginCteSql,
        |bd AS (SELECT MIN(margin) AS mn, MAX(margin) AS mx FROM m),
        |pp AS (
        |  SELECT CASE WHEN m.lang = 'en' THEN 1 ELSE 0 END AS y,
        |    CAST(CAST(m.margin - bd.mn AS HUGEINT) * 1000000
        |      // GREATEST(bd.mx - bd.mn, 1) AS BIGINT) AS p
        |  FROM m, bd),
        |b AS (
        |  SELECT LEAST(9, p * 10 // 1000000) AS bin, COUNT(*) AS n,
        |    CAST(SUM(y) AS BIGINT) AS n_pos,
        |    SUM(CAST(p AS HUGEINT)) AS sp
        |  FROM pp GROUP BY 1),
        |o AS (
        |  SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
        |    CAST(n_pos * 1000000 // n AS BIGINT) AS obs_ppm,
        |    CAST(sp // n AS BIGINT) AS pred_ppm
        |  FROM b)
        |SELECT bin, n, n_pos, obs_ppm, pred_ppm,
        |  ABS(obs_ppm - pred_ppm) AS gap_ppm
        |FROM o ORDER BY bin""".stripMargin,

    // L114: the max-min closed form over cumulative bin stats —
    // pooled rate of j..k from prefix sums, quantized to ppm BEFORE
    // the min/max (both engines quantize identically).
    "q_calibration_isotonic" ->
      s"""$classifierMarginCteSql,
        |bd AS (SELECT MIN(margin) AS mn, MAX(margin) AS mx FROM m),
        |pp AS (
        |  SELECT CASE WHEN m.lang = 'en' THEN 1 ELSE 0 END AS y,
        |    CAST(CAST(m.margin - bd.mn AS HUGEINT) * 1000000
        |      // GREATEST(bd.mx - bd.mn, 1) AS BIGINT) AS p
        |  FROM m, bd),
        |c AS (
        |  SELECT LEAST(9, p * 10 // 1000000) AS bin, COUNT(*) AS n,
        |    CAST(SUM(y) AS BIGINT) AS n_pos
        |  FROM pp GROUP BY 1),
        |cum AS (
        |  SELECT bin, n, n_pos,
        |    CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS w,
        |    CAST(SUM(n_pos) OVER (ORDER BY bin) AS BIGINT) AS s
        |  FROM c),
        |pairs AS (
        |  SELECT j.bin AS jb, k.bin AS kb,
        |    CAST((k.s - j.s + j.n_pos) * 1000000
        |      // (k.w - j.w + j.n) AS BIGINT) AS q
        |  FROM cum j JOIN cum k ON j.bin <= k.bin),
        |inner_min AS (
        |  SELECT i.bin, p.jb, MIN(p.q) AS mn
        |  FROM cum i JOIN pairs p ON p.jb <= i.bin AND p.kb >= i.bin
        |  GROUP BY i.bin, p.jb),
        |iso AS (SELECT bin, CAST(MAX(mn) AS BIGINT) AS iso_ppm
        |  FROM inner_min GROUP BY bin)
        |SELECT CAST(c.bin AS BIGINT) AS bin, c.n, c.n_pos,
        |  CAST(c.n_pos * 1000000 // c.n AS BIGINT) AS raw_ppm, iso.iso_ppm
        |FROM c JOIN iso USING (bin) ORDER BY bin""".stripMargin,

    // L114b: the apply replay — same maximin iso CTEs, densified to
    // every bin via a correlated nearest-fitted-bin-below lookup
    // (10 rows), then the per-row bin join. pp feeds both the bin
    // stats and the final apply → MATERIALIZED.
    "q_calibration_apply" ->
      s"""$classifierMarginCteSql,
        |bd AS (SELECT MIN(margin) AS mn, MAX(margin) AS mx FROM m),
        |pp AS MATERIALIZED (
        |  SELECT m.doc_id, CASE WHEN m.lang = 'en' THEN 1 ELSE 0 END AS y,
        |    CAST(CAST(m.margin - bd.mn AS HUGEINT) * 1000000
        |      // GREATEST(bd.mx - bd.mn, 1) AS BIGINT) AS p
        |  FROM m, bd),
        |c AS (
        |  SELECT LEAST(9, p * 10 // 1000000) AS bin, COUNT(*) AS n,
        |    CAST(SUM(y) AS BIGINT) AS n_pos
        |  FROM pp GROUP BY 1),
        |cum AS (
        |  SELECT bin, n, n_pos,
        |    CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS w,
        |    CAST(SUM(n_pos) OVER (ORDER BY bin) AS BIGINT) AS s
        |  FROM c),
        |pairs AS (
        |  SELECT j.bin AS jb, k.bin AS kb,
        |    CAST((k.s - j.s + j.n_pos) * 1000000
        |      // (k.w - j.w + j.n) AS BIGINT) AS q
        |  FROM cum j JOIN cum k ON j.bin <= k.bin),
        |inner_min AS (
        |  SELECT i.bin, p.jb, MIN(p.q) AS mn
        |  FROM cum i JOIN pairs p ON p.jb <= i.bin AND p.kb >= i.bin
        |  GROUP BY i.bin, p.jb),
        |iso AS MATERIALIZED (SELECT bin, CAST(MAX(mn) AS BIGINT) AS iso_ppm
        |  FROM inner_min GROUP BY bin),
        |dense AS (
        |  SELECT g.b AS bin, COALESCE(
        |    (SELECT i.iso_ppm FROM iso i WHERE i.bin <= g.b
        |       ORDER BY i.bin DESC LIMIT 1),
        |    (SELECT i.iso_ppm FROM iso i ORDER BY i.bin LIMIT 1)) AS cal_ppm
        |  FROM generate_series(0, 9) g(b))
        |SELECT pp.doc_id, pp.p AS p_ppm, d.cal_ppm
        |FROM pp JOIN dense d ON d.bin = LEAST(9, pp.p * 10 // 1000000)
        |ORDER BY doc_id""".stripMargin,

    // L118: the completeness replay — token frequency table, then
    // conditional sums; unseen mass and Chao1 through exact //.
    "q_vocab_chao" ->
      """WITH toks AS (
        |  SELECT lang,
        |    UNNEST(list_filter(string_split(text, ' '), x -> len(x) > 0))
        |      AS tok
        |  FROM documents),
        |f AS (SELECT lang, tok, COUNT(*) AS c FROM toks GROUP BY lang, tok)
        |SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS vocab,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |  CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
        |    // SUM(c) AS BIGINT) AS unseen_ppm,
        |  CAST(COUNT(*) + SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
        |    * (SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1)
        |    // (2 * (SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) + 1))
        |    AS BIGINT) AS chao1_vocab
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin,

    // L115: the conformal replay — k-th smallest calibration
    // nonconformity per class via ROW_NUMBER (== the Spark min-s-with-
    // cum>=k two-level scan), ceil-div k, include-always 1000001
    // fallback, then the 4-row threshold grid against the test fold.
    "q_conformal" ->
      s"""$classifierMarginCteSql,
        |bd AS (SELECT MIN(margin) AS mn, MAX(margin) AS mx FROM m),
        |pp AS MATERIALIZED (
        |  SELECT m.doc_id,
        |    CASE WHEN m.lang = 'en' THEN 'pos' ELSE 'neg' END AS y,
        |    CAST(CAST(m.margin - bd.mn AS HUGEINT) * 1000000
        |      // GREATEST(bd.mx - bd.mn, 1) AS BIGINT) AS p
        |  FROM m, bd),
        |cal AS MATERIALIZED (
        |  SELECT y AS cls,
        |    CASE WHEN y = 'pos' THEN 1000000 - p ELSE p END AS s
        |  FROM pp WHERE doc_id % 2 = 0),
        |nc AS (SELECT cls, COUNT(*) AS n_cal FROM cal GROUP BY cls),
        |al AS (SELECT UNNEST([100, 200]) AS alpha_pm),
        |ranked AS MATERIALIZED (
        |  SELECT cls, s, ROW_NUMBER() OVER (PARTITION BY cls ORDER BY s)
        |    AS rk
        |  FROM cal),
        |thr AS (
        |  SELECT CAST(a.alpha_pm AS BIGINT) AS alpha_pm, n.cls,
        |    CAST(n.n_cal AS BIGINT) AS n_cal,
        |    COALESCE((SELECT MIN(r.s) FROM ranked r WHERE r.cls = n.cls
        |      AND r.rk >= ((n.n_cal + 1) * (1000 - a.alpha_pm) + 999)
        |        // 1000), 1000001) AS thresh_ppm
        |  FROM nc n, al a),
        |j AS (
        |  SELECT t.alpha_pm, t.cls, t.n_cal, t.thresh_ppm, te.y,
        |    (CASE WHEN t.cls = 'pos' THEN 1000000 - te.p ELSE te.p END)
        |      <= t.thresh_ppm AS incl
        |  FROM thr t, (SELECT y, p FROM pp WHERE doc_id % 2 = 1) te)
        |SELECT alpha_pm, cls, n_cal, thresh_ppm,
        |  CAST(SUM(CASE WHEN y = cls THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_test,
        |  CAST(SUM(CASE WHEN y = cls AND incl THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_cov,
        |  CAST(SUM(CASE WHEN y = cls AND incl THEN 1 ELSE 0 END) * 1000000
        |    // GREATEST(SUM(CASE WHEN y = cls THEN 1 ELSE 0 END), 1)
        |    AS BIGINT) AS coverage_ppm,
        |  CAST(SUM(CASE WHEN incl THEN 1 ELSE 0 END) AS BIGINT) AS n_incl
        |FROM j GROUP BY alpha_pm, cls, n_cal, thresh_ppm
        |ORDER BY alpha_pm, cls""".stripMargin,

    // L107b: ECE — the n-weighted mean gap over the same bins.
    "q_calibration_ece" ->
      s"""$classifierMarginCteSql,
        |bd AS (SELECT MIN(margin) AS mn, MAX(margin) AS mx FROM m),
        |pp AS (
        |  SELECT CASE WHEN m.lang = 'en' THEN 1 ELSE 0 END AS y,
        |    CAST(CAST(m.margin - bd.mn AS HUGEINT) * 1000000
        |      // GREATEST(bd.mx - bd.mn, 1) AS BIGINT) AS p
        |  FROM m, bd),
        |b AS (
        |  SELECT LEAST(9, p * 10 // 1000000) AS bin, COUNT(*) AS n,
        |    CAST(SUM(y) AS BIGINT) AS n_pos,
        |    SUM(CAST(p AS HUGEINT)) AS sp
        |  FROM pp GROUP BY 1),
        |g AS (
        |  SELECT n, ABS(CAST(n_pos * 1000000 // n AS BIGINT)
        |    - CAST(sp // n AS BIGINT)) AS gap_ppm
        |  FROM b)
        |SELECT CAST(SUM(n) AS BIGINT) AS n,
        |  CAST(SUM(CAST(n AS HUGEINT) * gap_ppm)
        |    // SUM(n) AS BIGINT) AS ece_ppm
        |FROM g""".stripMargin,

    // L109: the stratified-split replay — ROW_NUMBER under the same
    // (md5(id), id) order per stratum, exact per-mille boundaries.
    "q_split_stratified" ->
      """WITH r AS (
        |  SELECT doc_id AS id, lang AS stratum,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
        |    COUNT(*) OVER (PARTITION BY lang) AS tot
        |  FROM documents)
        |SELECT id, stratum, CAST(rk AS BIGINT) AS rk,
        |  CAST(tot AS BIGINT) AS tot,
        |  CASE WHEN rk <= tot * 800 // 1000 THEN 'train'
        |       WHEN rk <= tot * 900 // 1000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM r ORDER BY id""".stripMargin,

    // Temperature thresholds replayed with the same quantization:
    // sqrt correctly rounded in both engines, weights floor-quantized
    // to BIGINT, rate expression in the identical left-assoc order.
    "q_mix_temperature" ->
      """WITH n AS (SELECT lang, COUNT(*) AS nl FROM documents GROUP BY lang),
        |w AS (SELECT lang, nl,
        |        CAST(FLOOR(SQRT(CAST(nl AS DOUBLE)) * 1048576.0) AS BIGINT) AS w
        |      FROM n),
        |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS sw, CAST(SUM(nl) AS BIGINT) AS tt
        |        FROM w),
        |rates AS (
        |  SELECT lang, LEAST(1.0, 0.5 * tt / sw * w / nl) AS rate FROM w, tot),
        |thr AS (
        |  SELECT lang,
        |    CASE WHEN rate >= 1.0 THEN 'zzzz'
        |         ELSE printf('%04x', CAST(FLOOR(rate * 65536) AS INT)) END AS h
        |  FROM rates)
        |SELECT d.lang, MAX(thr.h) AS thr_hex, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN SUBSTRING(md5(d.text), 1, 4) < thr.h
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM documents d JOIN thr ON d.lang = thr.lang
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    // Dup-ngram coverage: same 3-gram shingle construction as the
    // q_dedup_ngram oracle (list_slice windows, whole-text fallback
    // under 3 tokens), distinct per doc, df >= 2 marks cross-corpus
    // duplication; the fraction is exact integer floor-division.
    "q_dup_ngram_fraction" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, UNNEST(list_distinct(
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |         ELSE list_transform(range(1, len(t) - 1),
        |                i -> array_to_string(list_slice(t, i, i + 2), ' ')) END)) AS sh
        |  FROM toks),
        |dfreq AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh)
        |SELECT s.doc_id, COUNT(*) AS n_shingles,
        |  CAST(SUM(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  CAST(SUM(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END) * 1000000
        |    // COUNT(*) AS BIGINT) AS dup_frac_micro
        |FROM sh s JOIN dfreq ON s.sh = dfreq.sh
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // L100: the reweighting replay — same per-source q8 loss off the
    // shared bigram CTEs, then 6 unrolled integer MW rounds. Each
    // round's CTEs are MATERIALIZED: inlining would expand the
    // 2-reference-per-round chain 2^6-fold (the SQL twin of why the
    // Spark side localCheckpoints each round).
    "q_mix_reweight" ->
      s"""WITH ${Shared.bigramScoredCteSql},
        |ds AS (
        |  SELECT doc_id, CAST(SUM(q) AS BIGINT) AS sq, COUNT(*) AS nb
        |  FROM scored GROUP BY doc_id),
        |dl AS MATERIALIZED (
        |  SELECT d.source, CAST(SUM(ds.nb) AS BIGINT) AS n_bigrams,
        |    100000000 - CAST(SUM(ds.sq) AS BIGINT)
        |      // CAST(SUM(ds.nb) AS BIGINT) AS loss
        |  FROM ds JOIN documents d USING (doc_id) GROUP BY d.source),
        |r0 AS (
        |  SELECT source AS domain, loss, CAST(1000000 AS BIGINT) AS w
        |  FROM dl),
        |${mwRoundsSql(6)},
        |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS swf FROM r6)
        |SELECT r.domain AS source, dl.n_bigrams, r.loss AS loss_q8,
        |  r.w AS w_raw, r.w * 1000000 // tot.swf AS w_ppm
        |FROM r6 r JOIN dl ON dl.source = r.domain, tot
        |ORDER BY source""".stripMargin,

    "q_mix_target" ->
      """WITH n AS (SELECT lang, COUNT(*) AS nl FROM documents GROUP BY lang),
        |tot AS (SELECT COUNT(*) AS tt FROM documents),
        |rates AS (
        |  SELECT lang,
        |    LEAST(1.0, (CASE WHEN lang = 'en' THEN 0.4 ELSE 0.15 END) * tt / nl)
        |      AS rate
        |  FROM n, tot),
        |thr AS (
        |  SELECT lang,
        |    CASE WHEN rate >= 1.0 THEN 'zzzz'
        |         ELSE printf('%04x', CAST(FLOOR(rate * 65536) AS INT)) END AS h
        |  FROM rates)
        |SELECT d.lang, MAX(thr.h) AS thr_hex, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN SUBSTRING(md5(d.text), 1, 4) < thr.h
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM documents d JOIN thr ON d.lang = thr.lang
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin)
}
