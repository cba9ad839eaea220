package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Public column-function surface of the engine (the analog of
  * `org.apache.spark.sql.functions` for graft-specific operations).
  * Everything here is either a composition of codegen'd built-ins or a
  * native Catalyst Expression from [[graft.functions]] — no Scala UDFs
  * anywhere, so every operator stays inside WholeStageCodegen.
  */
package object functions {
  import org.apache.spark.sql.graft.Bridge.{column => col2, expression => ex}

  // ---- codecs (reference Codec.scala) ----
  def gzip_compress(c: Column): Column = col2(GzipCompress(ex(c)))
  def gzip_decompress(c: Column): Column = col2(GzipDecompress(ex(c)))

  // ---- hashing / sketches ----
  def simhash64(tokens: Column): Column = col2(SimHash64(ex(tokens)))
  def minhash_sig(tokens: Column, k: Int): Column = col2(MinHashSig(ex(tokens), k))

  /** Per-band LSH bucket hashes of the k-perm MinHash signature in ONE
    * kernel pass — bit-identical to `xxhash64(slice(minhash_sig(t),
    * band*k/bands+1, k/bands))` per band, without the CollapseProject
    * re-evaluation hazard of referencing `sig` from `bands` sibling
    * expressions. */
  def minhash_band_hashes(tokens: Column, k: Int, bands: Int): Column =
    col2(MinHashBandHashes(ex(tokens), k, bands))

  /** Fused q16-quantize + Rademacher JL projection (all outDim
    * coordinates in one kernel pass) — value-identical to outDim
    * sibling `dot_product(quantize_q16(v), signRow_j)` columns without
    * their CollapseProject re-evaluation hazard. */
  def jl_project_q16(vec: Column, inDim: Int, outDim: Int): Column =
    col2(JlProjectQ16(ex(vec), inDim, outDim))
  def rolling_hash(text: Column): Column = col2(RollingHash(ex(text)))

  /** Winnowing fingerprint set (Schleimer et al. '03): sorted distinct
    * window-min character-k-gram rolling hashes; any substring match of
    * length >= w + k - 1 shares a fingerprint. */
  def winnow_fps(text: Column, k: Int, w: Int): Column =
    col2(WinnowFps(ex(text), k, w))

  /** Positional winnowing anchors (rightmost-min tie rule), flat
    * [fp, pos, ...] longs — the localization companion of
    * [[winnow_fps]]. */
  def winnow_spans(text: Column, k: Int, w: Int): Column =
    col2(WinnowSpans(ex(text), k, w))

  /** One-pass secret/credential token scan: flag + redact tokens that
    * are long, digit+letter mixed, and near-uniform over their alphabet
    * (token-level Simpson concentration <= cap). */
  def secret_scan(text: Column, minLen: Int, maxSimpsonPpm: Long): Column =
    col2(SecretScan(ex(text), minLen, maxSimpsonPpm))

  /** Fused three-stage structured-PII scan (emails → IPv4s → +phones,
    * counts consistent with the sequential redaction). */
  def pii_scan(text: Column): Column = col2(PiiScan(ex(text)))
  def fnv64(c: Column): Column = col2(Fnv64(ex(c)))
  def jaccard_sorted(a: Column, b: Column): Column = col2(JaccardSorted(ex(a), ex(b)))
  def inter_ge_sorted(a: Column, b: Column, minInter: Column): Column =
    col2(InterGeSorted(ex(a), ex(b), ex(minInter)))

  /** Distinct sorted FNV-64 token-id set — the cheap join/verify
    * representation of a document's word set. */
  def token_id_set(tokens: Column): Column = col2(TokenIdSet(ex(tokens)))

  /** Sorted distinct n-gram shingle ids straight from token hashes —
    * no shingle strings materialized (codegen kernel). */
  def shingle_id_set(tokens: Column, n: Int): Column =
    col2(ShingleIdSet(ex(tokens), n))
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Count of the most frequent adjacent token pair (top-bigram
    * repetition signal), O(tokens) via the pair-hash kernel. */
  def max_adjacent_pair_count(tokens: Column): Column =
    col2(MaxAdjacentPairCount(ex(tokens)))

  /** Feature-hashed bag-of-words vector (d signed-count buckets,
    * unnormalized — exact integer weights). The native text->vector
    * featurizer feeding the ANN/semantic-dedup stack. */
  def hashed_bow(tokens: Column, d: Int): Column = col2(HashedBow(ex(tokens), d))

  // ---- vectors ----
  def cosine_sim(a: Column, b: Column): Column = col2(CosineSim(ex(a), ex(b)))
  def dot_product(a: Column, b: Column): Column = col2(DotProduct(ex(a), ex(b)))
  def hyperplane_lsh(v: Column, bits: Int): Column = col2(HyperplaneLsh(ex(v), bits))
  def hyperplane_probes(v: Column, bits: Int, nProbe: Int): Column =
    col2(HyperplaneProbes(ex(v), bits, nProbe))
  def gopher_stats(text: Column, stops: Column): Column =
    col2(GopherStats(ex(text), ex(stops)))
  def blocklist_stats(text: Column, terms: Seq[String]): Column =
    col2(BlocklistStats(ex(text), terms))

  /** Aho–Corasick multi-pattern SUBSTRING scan in one codegen'd pass:
    * `[n_matches, n_distinct_patterns, c_0, …, c_{P-1}]` with counts
    * index-aligned to `patterns` — O(len + matches) per row at any
    * pattern count (vs one `contains` scan per pattern). */
  def ac_match_stats(text: Column, patterns: Seq[String]): Column =
    col2(AcMatchStats(ex(text), patterns))
  def nfc_normalize(text: Column): Column = col2(NfcNormalize(ex(text)))
  def nearest_centroid(v: Column, cents: Column): Column =
    col2(NearestCentroid(ex(v), ex(cents)))
  def top_centroids(v: Column, cents: Column, nProbe: Int): Column =
    col2(TopCentroids(ex(v), ex(cents), nProbe))
  def nearest_centroid_l2(v: Column, cents: Column): Column =
    col2(NearestCentroidL2(ex(v), ex(cents)))

  /** [cluster, dist] of the nearest centroid by squared L2 — one fused
    * kernel call for callers that need the winning distance too. */
  def nearest_centroid_dist_l2(v: Column, cents: Column): Column =
    col2(NearestCentroidDistL2(ex(v), ex(cents)))
  def top_centroids_l2(v: Column, cents: Column, nProbe: Int): Column =
    col2(TopCentroidsL2(ex(v), ex(cents), nProbe))
  /** Hilbert-curve distance of two bucketized dims in [0, 2^bits). */
  def hilbert_d2(x: Column, y: Column, bits: Int): Column =
    col2(HilbertD2(ex(x), ex(y), bits))
  /** 3-D Hilbert distance (Skilling transform), 3·bits <= 62. */
  def hilbert_d3(x: Column, y: Column, z: Column, bits: Int): Column =
    col2(HilbertD3(ex(x), ex(y), ex(z), bits))
  /** PQ code array of `v` against an m-block codebook table (each block
    * a flat ksub×dsub array) — map-side, no shuffle. */
  def pq_encode(v: Column, books: Column): Column = col2(PqEncode(ex(v), ex(books)))
  /** Per-query ADC lookup table (flat m×ksub sub-dot-products). */
  def pq_dtable(q: Column, books: Column): Column = col2(PqDtable(ex(q), ex(books)))
  /** ADC approximate inner product: m table lookups per candidate. */
  def pq_adc(codes: Column, dtable: Column): Column = col2(PqAdc(ex(codes), ex(dtable)))
  /** Elementwise vector-sum aggregate (map-side partial agg). */
  def vector_sum(v: Column): Column = col2(VectorSum(ex(v)).toAggregateExpression())

  /** Mergeable Space-Saving top-k heavy hitters over a string column:
    * fixed `capacity`-bounded memory, partial aggregation ships one
    * summary per partition. Exact when capacity >= |distinct|. */
  def approx_top_k(c: Column, k: Int, capacity: Int): Column =
    col2(ApproxTopK(ex(c), k, capacity).toAggregateExpression())

  /** Mergeable count-min sketch aggregate: depth*width long cells as a
    * flat array. Merge finished sketches with [[vector_sum]] (store
    * per-day, roll up to any grain). Probe with
    * [[count_min_estimate]]. */
  def count_min_agg(c: Column, depth: Int, width: Int): Column =
    col2(CountMinAgg(ex(c), depth, width).toAggregateExpression())

  /** Mergeable KLL quantile sketch over a double column (serialized
    * binary — persist per partition, [[kll_union_agg]] to any grain).
    * n ≤ k ⇒ exact order statistics (the oracle regime). */
  def kll_agg(c: Column, k: Int = 65535): Column =
    col2(KllAgg(ex(c), k).toAggregateExpression())

  /** Fold serialized [[kll_agg]] sketches into one. */
  def kll_union_agg(c: Column, k: Int = 65535): Column =
    col2(KllUnionAgg(ex(c), k).toAggregateExpression())

  /** INCLUSIVE-rank quantiles (integer-ppm ranks) from a serialized
    * KLL sketch; exact order statistic ceil(p·n) when n ≤ k. */
  def kll_quantiles(sketch: Column, probsPpm: Seq[Long]): Column =
    col2(KllQuantiles(ex(sketch), probsPpm))

  /** Absorbed-value count of a serialized KLL sketch. */
  def kll_n(sketch: Column): Column = col2(KllN(ex(sketch)))

  /** Mergeable Theta sketch over a string column — the distinct-count
    * sketch that supports SET OPERATIONS (intersection, difference) on
    * sketches; exact below 2^lgK distinct values. */
  def theta_agg(c: Column, lgK: Int = 14): Column =
    col2(ThetaAgg(ex(c), lgK).toAggregateExpression())

  /** Rounded distinct estimate of a Theta sketch (exact in θ=1). */
  def theta_estimate(sk: Column): Column = col2(ThetaEstimate(ex(sk)))

  /** Sketch of A ∩ B from two Theta sketches. */
  def theta_intersect(a: Column, b: Column): Column =
    col2(ThetaIntersect(ex(a), ex(b)))

  /** Sketch of A \ B from two Theta sketches. */
  def theta_anotb(a: Column, b: Column): Column =
    col2(ThetaANotB(ex(a), ex(b)))

  /** Sketch of A ∪ B from two Theta sketches. */
  def theta_union2(a: Column, b: Column, lgK: Int = 14): Column =
    col2(ThetaUnion2(ex(a), ex(b), lgK))

  /** Join-size estimate (upper bound; exact when a hash row is
    * collision-free) from two [[count_min_agg]] sketches. */
  def cm_inner_product(a: Column, b: Column, depth: Int, width: Int): Column =
    col2(CmInnerProduct(ex(a), ex(b), depth, width))

  /** Fold serialized [[theta_agg]] sketches into one. */
  def theta_union_agg(c: Column, lgK: Int = 14): Column =
    col2(ThetaUnionAgg(ex(c), lgK).toAggregateExpression())

  /** Point-frequency estimate from a [[count_min_agg]] sketch — min
    * over the depth rows of the probed cells. Pure composed built-ins
    * unrolled over depth (the cell hash is Spark's own seeded
    * xxhash64), so probing stays inside WholeStageCodegen. */
  def count_min_estimate(sketch: Column, term: Column, depth: Int, width: Int): Column =
    (0 until depth).map { i =>
      val cell = pmod(xxhash64(term, lit(i)), lit(width.toLong))
      element_at(sketch, (lit(i.toLong * width) + cell + 1L).cast("int"))
    }.reduce(least(_, _))
  def l2_norm(v: Column): Column = col2(L2Norm(ex(v)))
  def as_double_array(v: Column): Column = col2(CastDoubleArray(ex(v)))
  /** q16 embedding quantization (floor(x·65536 + 0.5) per component),
    * fused float/double-in double-out — the ANN family's integer-exact
    * representation as one codegen'd kernel. */
  def quantize_q16(v: Column): Column = col2(QuantizeQ16(ex(v)))

  /** Engine-portable half-up rounding: floor(x*10^s+0.5)/10^s is the
    * same double in every engine, unlike round() (Spark rounds the
    * decimal string, DuckDB the raw double — they differ on ties). */
  def round_portable(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * p + 0.5) / p
  }

  // ---- tokenization (oracle-parity-safe: simple split semantics) ----
  /** Whitespace tokens, empties removed — a codegen'd byte-pass
    * kernel, byte-identical to `filter(split(text, " "), len > 0)`
    * (the interpreted HOF chain it replaced sat in every text query's
    * hot path). */
  def tokenize_ws(text: Column): Column = col2(TokenizeWs(ex(text)))

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single other
    * non-space chars (the GPT-2 pre-tokenizer shape, RE2/Java-safe). */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
  def tokenize_bpe(text: Column): Column = regexp_extract_all(text, lit(BpePattern), lit(0))

  def token_count(text: Column): Column = size(tokenize_ws(text)).cast("long")

  /** Map-side BPE apply under a driver-trained merge table (see
    * [[graft.operators.Bpe]]): token array -> subword token array. */
  def bpe_encode(tokens: Column, merges: Seq[(String, String)]): Column =
    col2(BpeEncode(ex(tokens), merges))

  /** Overlapping token-window chunks: windows of `chunkTokens` tokens
    * every `chunkTokens - overlap` tokens (the embedding/training
    * chunking shape). Returns array<struct<chunk_idx, chunk_text,
    * n_chunk_tokens>>; explode it for one row per chunk. Integer-exact
    * index math — engine-portable. One codegen'd kernel pass
    * (value-identical to the transform-over-sequence HOF composition
    * it replaced, which evaluated interpreted — parity spec-gated). */
  def chunk_windows(text: Column, chunkTokens: Int, overlap: Int): Column =
    col2(ChunkWindows(ex(text), chunkTokens, overlap))

  /** Seeded deterministic word dropout: token p of the doc keyed
    * `key` drops iff rolling_hash("key:p:seed") mod 1000 < dropPm —
    * a pure function of (key, position, seed), so every view is
    * reproducible across re-runs/retries/engines and epoch views come
    * from varying `seed`. Returns struct(aug_text, n_tokens,
    * n_dropped). */
  def dropout_tokens(text: Column, key: Column, dropPm: Int, seed: Long): Column =
    col2(DropoutTokens(ex(text), ex(key.cast("string")), dropPm, seed))

  /** Word w-shingles (space-joined n-grams of whitespace tokens) —
    * one codegen'd pass; < n tokens yield the whole text as a single
    * shingle (the SQL twins' CASE branch). */
  def shingles(text: Column, n: Int): Column =
    col2(ShingleStrings(ex(tokenize_ws(text)), n))

  // ---- scrubbing (PII-style masking; RE2/Java-portable patterns) ----
  def redact_numbers(text: Column): Column =
    regexp_replace(text, "[0-9]+", "<NUM>")
  def mask_emails(text: Column): Column =
    regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+", "<EMAIL>")

  /** Luhn checksum validity of a digit string (ISO/IEC 7812) — the
    * check that separates a real card/IMEI-shaped number from an
    * arbitrary digit run, so PAN redaction flags the rows that
    * actually leak payment data instead of every long number. From
    * the RIGHT, every second digit doubles (minus 9 past 9); valid =
    * sum ≡ 0 (mod 10) and a plausible PAN length (13–19); non-digit
    * input is false, never an error. A native codegen'd kernel (one
    * byte pass): the aggregate-over-sequence HOF formulation it
    * replaced evaluated interpreted and cost ~3 s per 150 k rows. */
  def luhn_valid(cand: Column): Column = col2(LuhnValid(ex(cand)))

  // ---- text quality (reference-free LLM-pipeline scoring) ----
  def punct_count(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  /** Tokens contained in `stopwords` — one fused [[marker_counts]]
    * pass (the HOF filter chain it replaced is CodegenFallback and
    * sat in every quality-score hot path). */
  def stopword_count(text: Column, stopwords: Seq[String]): Column =
    element_at(marker_counts(text, Seq(stopwords)), 1).cast("int")

  /** Per-list token-membership counts in ONE codegen'd pass: counts(k)
    * = tokens of `text` contained in `lists(k)` — bit-identical to the
    * per-list `size(filter(tokenize_ws(text), isin(...)))` chain. */
  def marker_counts(text: Column, lists: Seq[Seq[String]]): Column =
    col2(MarkerCounts(ex(text), lists))

  /** Character-distribution statistics over code points in ONE
    * codegen'd pass: [n_cp, n_distinct_cp, sum_sq, max_count] — the
    * integer collision-mass inputs of the Simpson concentration index
    * (see [[Kernels.charDistStats]]). */
  def char_dist_stats(text: Column): Column = col2(CharDistStats(ex(text)))

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Deterministic [0,1] quality score: balanced length, low punct
    * density, moderate stopword ratio, reasonable mean word length.
    * The stopword term is a BAND, not a monotone reward — text in the
    * prose-like [0.05, 0.5] ratio range scores 1.0, anything outside
    * (no stopwords at all, or stopword-stuffed spam like "the the the")
    * scores 0.5, same penalty convention as the word-length term. */
  def quality_score(text: Column): Column = {
    val toks = token_count(text)
    val lenScore = least(toks.cast("double") / lit(64.0), lit(1.0))
    val punctRatio = punct_count(text).cast("double") / greatest(length(text), lit(1)).cast("double")
    val stopRatio = stopword_count(text, EnglishStopwords).cast("double") /
      greatest(toks, lit(1)).cast("double")
    val meanWordLen = length(regexp_replace(text, " ", "")).cast("double") /
      greatest(toks, lit(1)).cast("double")
    val wordLenScore = when(meanWordLen.between(3.0, 10.0), lit(1.0)).otherwise(lit(0.5))
    val stopScore = when(stopRatio.between(0.05, 0.5), lit(1.0)).otherwise(lit(0.5))
    round_portable(lit(0.4) * lenScore + lit(0.2) * (lit(1.0) - least(punctRatio * 10, lit(1.0))) +
      lit(0.2) * stopScore + lit(0.2) * wordLenScore, 4)
  }

  /** Marker-stopword language scorer: hits of each language's marker
    * set; argmax with deterministic tie-break on language code. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "de" -> Seq("der", "die", "und", "ist", "mit"),
    "es" -> Seq("el", "la", "los", "es", "con"),
    "fr" -> Seq("le", "la", "les", "est", "avec"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  def lang_scores(text: Column): Column = {
    val langs = LangMarkers.toSeq.sortBy(_._1)
    val counts = marker_counts(text, langs.map(_._2))
    struct(langs.zipWithIndex.map { case ((lang, _), i) =>
      element_at(counts, i + 1).cast("int").as(lang)
    }: _*)
  }
}
