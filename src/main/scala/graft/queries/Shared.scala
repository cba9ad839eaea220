package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Fragments shared by several query definitions — the single source
  * of truth for every formula that exists on BOTH sides of the oracle
  * gate (a Spark expression here, a DuckDB replica in the oracle SQL).
  * A formula change edits exactly one Scala site and one SQL site;
  * before this object the quality score lived in six SQL replicas and
  * the bigram-LM scaffold in three Scala + three SQL copies, each a
  * silent-drift hazard.
  */
private[queries] object Shared {

  // ---- bigram LM scaffold (L14 / L14b / L38b) ----

  /** (doc_id, prev, cur) adjacent-token pairs over docs with >= 2
    * tokens — the corpus side of every bigram-LM query. */
  def bigramPairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), tokenize_ws(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
    toks.select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => struct(element_at(col("t"), i).as("prev"),
            element_at(col("t"), i + 1).as("cur")))).as("bg"))
      .select(col("doc_id"), col("bg.prev"), col("bg.cur"))
  }

  /** Bigram and unigram-context count tables (the model inputs). */
  def bigramCounts(pairs: DataFrame): (DataFrame, DataFrame) = (
    pairs.groupBy("prev", "cur").agg(count(lit(1)).as("cpc")),
    pairs.groupBy("prev").agg(count(lit(1)).as("cp")))

  /** Integer-quantized conditional probability q = floor(p(cur|prev)
    * * 1e8 + 0.5) over columns cpc/cp — probabilities (not libm
    * log-probs) so the arithmetic is IEEE-exact across engines. */
  val condProbQ: Column =
    floor(col("cpc").cast("double") / col("cp") * 1e8 + 0.5).cast("long")

  /** Per-(doc, bigram) quantized score rows: the shared prefix of
    * q_lm_score and q_ccnet_buckets. */
  def bigramScored(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pairs = bigramPairs(docs, idCol, textCol)
    val (bc, pc) = bigramCounts(pairs)
    pairs.join(bc, Seq("prev", "cur")).join(pc, Seq("prev"))
      .withColumn("q", condProbQ)
  }

  /** DuckDB twin of [[bigramPairs]]+[[bigramCounts]]: toks / pairs /
    * bc / pc CTE prefix (no leading WITH; margins pre-stripped). */
  val bigramCteSql: String =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
      |  FROM documents),
      |pairs AS (
      |  SELECT doc_id, t[i] AS prev, t[i+1] AS cur
      |  FROM toks, UNNEST(range(1, len(t))) AS u(i)
      |  WHERE len(t) >= 2),
      |bc AS (SELECT prev, cur, COUNT(*) AS cpc FROM pairs GROUP BY prev, cur),
      |pc AS (SELECT prev, COUNT(*) AS cp FROM pairs GROUP BY prev)""".stripMargin

  /** DuckDB twin of [[graft.functions.Kernels.winnowFps]] at k=8,
    * w=16 over `documents`: codepoint list → per-position 8-gram
    * rolling hashes (base 31 mod 1e9+7, the L11 scheme) → width-16
    * window minima → sorted distinct fingerprint set. CTE prefix
    * ending in `f(doc_id, fps)` (no leading WITH). */
  val winnowCteSql: String =
    """wcp AS (
      |  SELECT doc_id, list_transform(regexp_extract_all(text, '.'),
      |    c -> CAST(unicode(c) AS BIGINT)) AS cps
      |  FROM documents),
      |wg AS (
      |  SELECT doc_id,
      |    CASE WHEN len(cps) = 0 THEN []
      |         WHEN len(cps) < 8 THEN [list_reduce(
      |            list_prepend(CAST(0 AS BIGINT), cps),
      |            (a, b) -> (a * 31 + b) % 1000000007)]
      |         ELSE list_transform(range(1, len(cps) - 8 + 2),
      |            i -> list_reduce(
      |              list_prepend(CAST(0 AS BIGINT), list_slice(cps, i, i + 7)),
      |              (a, b) -> (a * 31 + b) % 1000000007)) END AS grams
      |  FROM wcp),
      |wm AS (
      |  SELECT doc_id,
      |    CASE WHEN len(grams) = 0 THEN []
      |         WHEN len(grams) <= 16 THEN [list_aggregate(grams, 'min')]
      |         ELSE list_transform(range(1, len(grams) - 16 + 2),
      |            j -> list_aggregate(list_slice(grams, j, j + 15), 'min'))
      |         END AS wins
      |  FROM wg),
      |f AS (
      |  SELECT doc_id, list_sort(list_distinct(wins)) AS fps FROM wm)""".stripMargin

  /** DuckDB twin of [[graft.functions.Kernels.winnowSpans]] — append
    * AFTER [[winnowCteSql]] (uses its `wg`): per-window rightmost-min
    * anchors (fp, pos), de-duplicated at row level (a position selects
    * exactly one fp, and DuckDB's list_distinct can't take structs).
    * Ends in `sp(doc_id, fp, pos)`. */
  val winnowSpansCteSql: String =
    """sels AS (
      |  SELECT doc_id,
      |    CASE WHEN len(grams) <= 16 THEN
      |      [struct_pack(m := list_aggregate(grams, 'min'),
      |        p := len(grams) - list_position(list_reverse(grams),
      |          list_aggregate(grams, 'min')))]
      |    ELSE list_transform(range(1, len(grams) - 16 + 2),
      |      j -> struct_pack(
      |        m := list_aggregate(list_slice(grams, j, j + 15), 'min'),
      |        p := (j - 1) + (16 - list_position(
      |          list_reverse(list_slice(grams, j, j + 15)),
      |          list_aggregate(list_slice(grams, j, j + 15), 'min')))))
      |    END AS sel
      |  FROM wg WHERE len(grams) > 0),
      |sp AS (
      |  SELECT DISTINCT doc_id, u.s.m AS fp, u.s.p AS pos
      |  FROM sels, UNNEST(sel) AS u(s))""".stripMargin

  /** DuckDB twin of [[bigramScored]]: adds the per-row quantized-q CTE. */
  val bigramScoredCteSql: String = bigramCteSql + """,
      |scored AS (
      |  SELECT p.doc_id,
      |    CAST(FLOOR(CAST(bc.cpc AS DOUBLE) / pc.cp * 100000000 + 0.5) AS BIGINT) AS q
      |  FROM pairs p JOIN bc USING (prev, cur) JOIN pc USING (prev))""".stripMargin

  // ---- quality score (L9 and its consumers) ----
  // Spark side is graft.functions.quality_score; these are its DuckDB
  // twins. Keep the arithmetic in LOCKSTEP with quality_score.

  /** Per-document text-stats CTE body feeding the quality formula;
    * `cols` carries the site's pass-through columns. Emits tok, punct,
    * stop, nospace, n_chars. */
  def qualityStatsSql(cols: String): String =
    s"""stats AS (
       |  SELECT $cols,
       |    len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS tok,
       |    LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct,
       |    len(list_filter(string_split(text, ' '), x -> list_contains(
       |      ['the','a','an','and','or','of','to','in','is','it'], x))) AS stop,
       |    LENGTH(REPLACE(text, ' ', '')) AS nospace,
       |    LENGTH(text) AS n_chars
       |  FROM documents)""".stripMargin

  /** The raw [0,1] quality sum over stats columns (before quantizing). */
  val qualityCoreSql: String =
    """(0.4 * LEAST(CAST(tok AS DOUBLE) / 64.0, 1.0)
      |  + 0.2 * (1.0 - LEAST(CAST(punct AS DOUBLE) / GREATEST(n_chars, 1) * 10, 1.0))
      |  + 0.2 * (CASE WHEN CAST(stop AS DOUBLE) / GREATEST(tok, 1)
      |                     BETWEEN 0.05 AND 0.5 THEN 1.0 ELSE 0.5 END)
      |  + 0.2 * (CASE WHEN CAST(nospace AS DOUBLE) / GREATEST(tok, 1)
      |                     BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END))""".stripMargin

  /** Quality quantized to a BIGINT in [0, 10000]. */
  val q1e4Sql: String =
    s"CAST(FLOOR($qualityCoreSql\n  * 10000 + 0.5) AS BIGINT)"

  /** Quality as the round_portable(x, 4) double. */
  val qualityDoubleSql: String =
    s"(FLOOR($qualityCoreSql\n  * 10000 + 0.5) / 10000)"

  // ---- exact Jaccard transitive-closure clusters (L19 twins) ----

  /** WITH RECURSIVE prefix shared by the three cluster oracles:
    * toksets / p (pairs >= 0.9 Jaccard, lang-blocked) / edges / reach.
    * Append site CTEs after a comma; no trailing newline. */
  val clusterReachCteSql: String =
    """WITH RECURSIVE toksets AS (
      |  SELECT doc_id, lang,
      |    list_filter(list_distinct(string_split(text, ' ')), x -> len(x) > 0) AS toks
      |  FROM documents),
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
      |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id)""".stripMargin

  // ---- batched BM25 scoring (L24e and the hybrid fusion L41) ----

  /** The fixed multi-query batch scored by q_bm25_batch and fused by
    * q_hybrid_retrieval. Spark sites build it via `.toDF("query_id",
    * "qtext")`; [[bm25BatchAggCteSql]] embeds it as a VALUES table —
    * the two MUST stay in lockstep. */
  val Bm25Batch: Seq[(Long, String)] =
    Seq((1L, "spark join"), (2L, "merge vector stream"), (3L, "spark stream"))

  /** CTE chain scoring [[Bm25Batch]] against the corpus from scratch
    * (docs → dl → stats → queries → qterms → tf → dft → scored → agg;
    * `agg` has (query_id, doc_id, score_q)). Append site CTEs after a
    * comma. Kept in LOCKSTEP with Lexical.searchBm25* quantization:
    * rational idf, per-term contributions floor-quantized to 1e6
    * BEFORE the per-doc sum (order-insensitive integer aggregate). */
  val bm25BatchAggCteSql: String =
    s"""docs AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
      |  FROM documents),
      |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM docs),
      |stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
      |queries(query_id, qtext) AS (VALUES
      |  ${Bm25Batch.map { case (i, q) => s"($i, '$q')" }.mkString(", ")}),
      |qterms AS (
      |  SELECT query_id, UNNEST(list_distinct(
      |    list_filter(string_split(qtext, ' '), x -> len(x) > 0))) AS tok
      |  FROM queries),
      |tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf
      |  FROM (SELECT doc_id, UNNEST(toks) AS tok FROM docs)
      |  WHERE tok IN (SELECT DISTINCT tok FROM qterms)
      |  GROUP BY doc_id, tok),
      |dft AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY tok),
      |scored AS (
      |  SELECT q.query_id, tf.doc_id,
      |    CAST(FLOOR(
      |      ((n_docs - df + 0.5) / (df + 0.5)) *
      |      (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (dl / (CAST(sum_dl AS DOUBLE) / n_docs)))))
      |      * 1e6 + 0.5) AS BIGINT) AS contrib
      |  FROM tf JOIN qterms q ON tf.tok = q.tok
      |    JOIN dft ON tf.tok = dft.tok
      |    JOIN dl ON tf.doc_id = dl.doc_id
      |    CROSS JOIN stats),
      |agg AS (
      |  SELECT query_id, doc_id, CAST(SUM(contrib) AS BIGINT) AS score_q
      |  FROM scored GROUP BY query_id, doc_id)""".stripMargin

  /** DuckDB twin of `round_portable(cosine_sim(a, b), 4)` — the
    * engine-portable cosine quantization every exact-cosine oracle
    * replays (floor(x·1e4+0.5)/1e4; never engine ROUND, whose tie
    * behavior differs). Argument order matters only for staying
    * textually in lockstep with the kernel call. */
  def cosineSimSql(a: String, b: String): String = cosineSimSql(a, b, 4)

  def cosineSimSql(a: String, b: String, scale: Int): String = {
    val p = math.pow(10, scale).toLong
    s"""FLOOR((list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2])) /
       |          SQRT(list_sum(list_transform($a, x -> x * x)) *
       |               list_sum(list_transform($b, x -> x * x)))) * $p + 0.5)
       |      / $p""".stripMargin
  }

  /** Squared-L2 distance between two quantized (integer-valued)
    * double lists — exact in both engines; the assignment/probe
    * ordering key of the quantized IVF/k-means oracle replays. */
  def l2qDistSql(v: String, c: String): String =
    s"""list_sum(list_transform(range(1, len($v) + 1),
       |        j -> ($v[j] - $c[j]) * ($v[j] - $c[j])))""".stripMargin

  /** Training-CTE prefix of the integer-quantized k-means replay
    * (Ann.trainCentroidsIntL2): CTEs `v` (nn_id, vec, vq over
    * `embeddings` filtered by `srcWhere`), `dims`, `train` (md5-prefix
    * sample at `trainThrHex`), `seed`, and one `a#/u#/c#` triple per
    * unrolled Lloyd iteration — final centroids in `c<iters>`.
    * Every quantity is an integer in double, so the trained centroids
    * are bit-identical to the Spark side. Append query-specific CTEs
    * after a comma. */
  def ivfTrainCtesSql(nClusters: Int, iters: Int, trainThrHex: String,
                      srcWhere: String = ""): String = {
    s"""v AS (
       |  SELECT vec_id AS nn_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec,
       |    list_transform(embedding,
       |      x -> floor(CAST(x AS DOUBLE) * 65536 + 0.5)) AS vq
       |  FROM embeddings $srcWhere),
       |${ivfTrainCoreCtesSql(nClusters, iters, trainThrHex)}""".stripMargin
  }

  /** The `dims/train/seed/a#/u#/c#` portion of [[ivfTrainCtesSql]],
    * for callers that define their own `v` CTE (columns nn_id, vec,
    * vq — vq integer-valued doubles). */
  def ivfTrainCoreCtesSql(nClusters: Int, iters: Int,
                          trainThrHex: String): String = {
    def lloydIter(n: Int, prev: String) =
      s"""a$n AS (
         |  SELECT nn_id, vq, c FROM (
         |    SELECT t.nn_id, t.vq, s.c,
         |      ROW_NUMBER() OVER (PARTITION BY t.nn_id
         |        ORDER BY ${l2qDistSql("t.vq", "s.cent")} ASC, s.c ASC) AS rn
         |    FROM train t CROSS JOIN $prev s) z WHERE rn = 1),
         |u$n AS (
         |  SELECT a.c, d.i, floor(SUM(a.vq[d.i]) / COUNT(*)) AS ci
         |  FROM a$n a CROSS JOIN dims d GROUP BY a.c, d.i),
         |c$n AS (
         |  SELECT s.c, COALESCE(u.cent, s.cent) AS cent
         |  FROM $prev s LEFT JOIN (
         |    SELECT c, list(ci ORDER BY i) AS cent FROM u$n GROUP BY c) u
         |  USING (c))""".stripMargin
    val iterCtes = (1 to iters)
      .map(n => lloydIter(n, if (n == 1) "seed" else s"c${n - 1}"))
      .mkString(",\n")
    s"""dims AS (SELECT UNNEST(range(1, (SELECT MAX(len(vq)) FROM v) + 1)) AS i),
       |train AS (
       |  SELECT * FROM v
       |  WHERE substring(md5(CAST(nn_id AS VARCHAR)), 1, 2) < '$trainThrHex'),
       |seed AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY nn_id) - 1 AS c, vq AS cent
       |  FROM (SELECT nn_id, vq FROM train ORDER BY nn_id LIMIT $nClusters) z),
       |$iterCtes""".stripMargin
  }

  // ---- hashed signed bag-of-words (L34 and the dense side of L41) ----

  /** DuckDB twin of `hashed_bow(tokenize_ws(textCol), 64)` exploded to
    * (id, bucket, w) integer rows, as CTEs `<p>toks/<p>hashed/<p>bow`
    * over relation `rel` — the same rolling-hash bucket/sign
    * recurrence as the q_fingerprint oracle. Append after a comma. */
  def hashedBowCteSql(rel: String, idCol: String, textCol: String,
                      p: String): String =
    s"""${p}toks AS (
      |  SELECT $idCol,
      |    UNNEST(list_filter(string_split($textCol, ' '), x -> len(x) > 0)) AS tok
      |  FROM $rel),
      |${p}hashed AS (
      |  SELECT $idCol,
      |    list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_transform(regexp_extract_all(tok, '.'),
      |          c -> CAST(unicode(c) AS BIGINT))),
      |      (a, b) -> (a * 31 + b) % 1000000007) AS h
      |  FROM ${p}toks),
      |${p}bow AS (
      |  SELECT $idCol, h % 64 AS bucket,
      |    CAST(SUM(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS w
      |  FROM ${p}hashed GROUP BY $idCol, h % 64)""".stripMargin
}
