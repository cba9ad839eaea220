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
}
