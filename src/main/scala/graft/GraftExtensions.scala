package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SQL-side registration of the engine's native expressions, so
  * `spark.sql("SELECT simhash64(...) ...")` works next to the Column
  * API. Install with:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or: spark.sql.extensions=graft.GraftExtensions
  *   // or, on a live session: GraftExtensions.install(spark)
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got $other")
  }

  private def stringSeqArg(e: Expression, fn: String): Seq[String] = e match {
    case e2 if e2.foldable =>
      e2.eval() match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData =>
          a.toObjectArray(org.apache.spark.sql.types.StringType)
            .map(_.toString).toSeq
        case other => throw new IllegalArgumentException(
          s"$fn expects a foldable string array argument, got $other")
      }
    case other => throw new IllegalArgumentException(
      s"$fn expects a foldable string array argument, got $other")
  }

  private def fn(name: String, usage: String)(builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo("graft", name, usage), builder)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("gzip_compress", "gzip_compress(bin) - gzip-compress a binary column") {
      args => GzipCompress(args.head)
    },
    fn("gzip_decompress", "gzip_decompress(bin) - gzip-decompress a binary column") {
      args => GzipDecompress(args.head)
    },
    fn("simhash64", "simhash64(tokens) - 64-bit simhash of a string array") {
      args => SimHash64(args.head)
    },
    fn("minhash_sig", "minhash_sig(tokens, k) - k-perm minhash signature") {
      args => MinHashSig(args.head, intArg(args(1), "minhash_sig"))
    },
    fn("rolling_hash", "rolling_hash(text) - polynomial fingerprint") {
      args => RollingHash(args.head)
    },
    fn("fnv64", "fnv64(text) - FNV-1a 64 hash") {
      args => Fnv64(args.head)
    },
    fn("luhn_valid", "luhn_valid(digits) - ISO 7812 checksum validity") {
      args => LuhnValid(args.head)
    },
    fn("tokenize_ws", "tokenize_ws(text) - whitespace tokens, empties removed") {
      args => TokenizeWs(args.head)
    },
    fn("token_id_set", "token_id_set(tokens) - sorted distinct fnv64 ids") {
      args => TokenIdSet(args.head)
    },
    fn("quantize_q16", "quantize_q16(vec) - floor(x*65536+0.5) per component") {
      args => QuantizeQ16(args.head)
    },
    fn("as_double_array", "as_double_array(vec) - exact float->double widening") {
      args => CastDoubleArray(args.head)
    },
    fn("l2_norm", "l2_norm(vec) - euclidean norm of a double array") {
      args => L2Norm(args.head)
    },
    fn("shingle_strings", "shingle_strings(tokens, n) - space-joined word n-grams") {
      args => ShingleStrings(args.head, intArg(args(1), "shingle_strings"))
    },
    fn("jaccard_sorted", "jaccard_sorted(a, b) - jaccard of sorted long arrays") {
      args => JaccardSorted(args.head, args(1))
    },
    fn("cosine_sim", "cosine_sim(a, b) - cosine of two double arrays") {
      args => CosineSim(args.head, args(1))
    },
    fn("nearest_centroid_l2", "nearest_centroid_l2(v, cents) - argmin-L2 centroid index") {
      args => NearestCentroidL2(args.head, args(1))
    },
    fn("pq_encode", "pq_encode(v, books) - product-quantization code array") {
      args => PqEncode(args.head, args(1))
    },
    fn("pq_dtable", "pq_dtable(q, books) - per-query ADC lookup table") {
      args => PqDtable(args.head, args(1))
    },
    fn("pq_adc", "pq_adc(codes, dtable) - ADC approximate inner product") {
      args => PqAdc(args.head, args(1))
    },
    fn("dot_product", "dot_product(a, b) - dot product of two double arrays") {
      args => DotProduct(args.head, args(1))
    },
    fn("hyperplane_lsh", "hyperplane_lsh(vec, bits) - cosine-LSH bucket id") {
      args => HyperplaneLsh(args.head, intArg(args(1), "hyperplane_lsh"))
    },
    fn("nearest_centroid", "nearest_centroid(vec, centroids) - argmax-cosine cell id") {
      args => NearestCentroid(args.head, args(1))
    },
    fn("top_centroids", "top_centroids(vec, centroids, n) - top-n cell ids by cosine") {
      args => TopCentroids(args.head, args(1), intArg(args(2), "top_centroids"))
    },
    fn("top_centroids_l2", "top_centroids_l2(vec, centroids, n) - top-n cell ids by squared L2") {
      args => TopCentroidsL2(args.head, args(1), intArg(args(2), "top_centroids_l2"))
    },
    fn("hilbert_d2", "hilbert_d2(x, y, bits) - 2-D Hilbert-curve distance") {
      args => HilbertD2(args.head, args(1), intArg(args(2), "hilbert_d2"))
    },
    fn("hilbert_d3", "hilbert_d3(x, y, z, bits) - 3-D Hilbert-curve distance (Skilling)") {
      args => HilbertD3(args.head, args(1), args(2), intArg(args(3), "hilbert_d3"))
    },
    fn("vector_sum", "vector_sum(vec) - elementwise sum aggregate of double arrays") {
      args => VectorSum(args.head).toAggregateExpression()
    },
    fn("shingle_id_set", "shingle_id_set(tokens, n) - sorted distinct n-gram shingle ids") {
      args => ShingleIdSet(args.head, intArg(args(1), "shingle_id_set"))
    },
    fn("max_adjacent_pair_count",
      "max_adjacent_pair_count(tokens) - count of the most frequent bigram") {
      args => MaxAdjacentPairCount(args.head)
    },
    fn("hashed_bow",
      "hashed_bow(tokens, d) - feature-hashed bag-of-words vector") {
      args => HashedBow(args.head, intArg(args(1), "hashed_bow"))
    },
    fn("approx_top_k",
      "approx_top_k(term, k, capacity) - mergeable Space-Saving heavy hitters") {
      args => ApproxTopK(args.head, intArg(args(1), "approx_top_k"),
        intArg(args(2), "approx_top_k")).toAggregateExpression()
    },
    fn("count_min_agg",
      "count_min_agg(term, depth, width) - mergeable count-min sketch cells") {
      args => CountMinAgg(args.head, intArg(args(1), "count_min_agg"),
        intArg(args(2), "count_min_agg")).toAggregateExpression()
    },
    fn("gopher_stats",
      "gopher_stats(text, stops) - fused one-pass Gopher rule statistics") {
      args => GopherStats(args.head, args(1))
    },
    fn("hyperplane_probes",
      "hyperplane_probes(vec, bits, nProbe) - multi-probe LSH bucket list") {
      args => HyperplaneProbes(args.head, intArg(args(1), "hyperplane_probes"),
        intArg(args(2), "hyperplane_probes"))
    },
    fn("blocklist_stats",
      "blocklist_stats(text, array('bad', ...)) - one-pass blocklist hit counts") {
      args => BlocklistStats(args.head, stringSeqArg(args(1), "blocklist_stats"))
    },
    fn("nfc_normalize",
      "nfc_normalize(text) - Unicode NFC canonical composition") {
      args => NfcNormalize(args.head)
    })

  /** Register every graft function into a live session's registry —
    * equivalent to building the session with `withExtensions`. */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
