package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Benchmark decontamination (SURVEY.md §2 L21): remove training
  * documents that share n-gram shingles with an evaluation set — the
  * step that keeps test data out of a training corpus. Distinct from
  * near-dup removal: contamination is ASYMMETRIC overlap (a training
  * doc quoting 5 eval shingles is contaminated even at jaccard ≈ 0),
  * so the signal is the matched-shingle count, not a similarity ratio.
  *
  * Scale shape: the eval inventory (distinct shingle ids of the
  * benchmark suite) is small by contract and broadcast; the training
  * side streams through an explode + broadcast-hash join + count-up —
  * one shuffle on doc id for the per-doc match count, nothing ever
  * pairs documents against documents.
  */
object Decontaminate {

  /** Distinct shingle-id inventory of the eval set (narrow long rows). */
  private def inventory(eval: DataFrame, textCol: String, shingleN: Int): DataFrame =
    eval.select(explode(
      shingle_id_set(tokenize_ws(col(textCol)), shingleN)).as("sid")).distinct()

  /** Flag contaminated training docs: (id, n_shingles, n_matched) for
    * every training doc with at least `minMatched` distinct shingles
    * present in the eval set. */
  def contaminated(train: DataFrame, eval: DataFrame, idCol: String,
                   textCol: String, shingleN: Int = 3,
                   minMatched: Long = 5): DataFrame = {
    val tr = train.select(col(idCol).as("id"),
      shingle_id_set(tokenize_ws(col(textCol)), shingleN).as("sids"))
    // sids is a distinct set, so count(1) after the join is the
    // distinct matched-shingle count
    tr.select(col("id"), size(col("sids")).cast("long").as("n_shingles"),
        explode(col("sids")).as("sid"))
      .join(broadcast(inventory(eval, textCol, shingleN)), "sid")
      .groupBy("id", "n_shingles")
      .agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") >= minMatched)
  }

  /** Remove contaminated docs from the training set (anti join on the
    * flagged ids). */
  def removeContaminated(train: DataFrame, eval: DataFrame, idCol: String,
                         textCol: String, shingleN: Int = 3,
                         minMatched: Long = 5): DataFrame = {
    val bad = contaminated(train, eval, idCol, textCol, shingleN, minMatched)
      .select(col("id").as("__bad_id"))
    train.join(bad, col(idCol) === col("__bad_id"), "left_anti")
  }

  /** L21c: multi-suite decontamination with per-suite attribution —
    * production decontaminates against MANY benchmarks at once and
    * must report WHICH suite each hit came from (a doc clean for one
    * benchmark may quote another; removal policy and disclosure both
    * need the attribution). The eval frame carries a suite column;
    * the inventory becomes broadcast (sid, suite) pairs and the
    * per-doc count groups by (doc, suite).
    *
    * ONE pass over the training side for ANY number of suites: the
    * explode + broadcast-hash join is shared, never a per-suite
    * corpus re-read (the scorecard economics applied to
    * decontamination); a shingle hitting s suites multiplies its one
    * row by s — bounded by the suite count, not the corpus. Returns
    * (id, suite, n_shingles, n_matched) for every pair reaching
    * `minMatched`. */
  def contaminatedBySuite(train: DataFrame, evals: DataFrame,
                          idCol: String, textCol: String,
                          suiteCol: String, shingleN: Int = 3,
                          minMatched: Long = 5): DataFrame = {
    val inv = evals.select(col(suiteCol).as("suite"), explode(
        shingle_id_set(tokenize_ws(col(textCol)), shingleN)).as("sid"))
      .distinct()
    val tr = train.select(col(idCol).as("id"),
      shingle_id_set(tokenize_ws(col(textCol)), shingleN).as("sids"))
    tr.select(col("id"), size(col("sids")).cast("long").as("n_shingles"),
        explode(col("sids")).as("sid"))
      .join(broadcast(inv), "sid")
      .groupBy("id", "suite", "n_shingles")
      .agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") >= minMatched)
  }

  /** L21b: semantic (embedding-space) decontamination — flag training
    * rows whose cosine similarity to ANY eval vector reaches
    * `minCosine`. The n-gram pass above catches verbatim/quoted
    * contamination; this one catches paraphrased eval content that
    * shares no shingle. Returns one row per contaminated training doc:
    * (id, eval_id, sim) of its best eval match (sim desc, eval id asc;
    * sim round-quantized to 4 decimals for engine-portable ordering).
    *
    * Scale shape: the eval embedding set is small by contract and
    * BROADCAST; the training corpus streams through |eval| codegen'd
    * cosines per row with no shuffle — only flagged ids (bounded by
    * the contamination rate) reach the ranking window. For an eval
    * suite too large to broadcast, cluster it and probe per-cell the
    * way [[Ann.searchIvfIndex]] does. */
  def semanticContaminated(train: DataFrame, eval: DataFrame,
                           idCol: String, vecCol: String,
                           minCosine: Double): DataFrame = {
    val tr = train.select(col(idCol).as("id"),
      as_double_array(col(vecCol)).as("v"))
    val ev = eval.select(col(idCol).as("eval_id"),
      as_double_array(col(vecCol)).as("ev"))
    val w = Window.partitionBy("id").orderBy(col("sim").desc, col("eval_id").asc)
    tr.crossJoin(broadcast(ev))
      .withColumn("sim", round_portable(cosine_sim(col("v"), col("ev")), 4))
      .filter(col("sim") >= minCosine)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("id", "eval_id", "sim")
  }

  /** Remove semantically contaminated docs (anti join on the flagged
    * ids). */
  def removeSemanticContaminated(train: DataFrame, eval: DataFrame,
                                 idCol: String, vecCol: String,
                                 minCosine: Double): DataFrame = {
    val bad = semanticContaminated(train, eval, idCol, vecCol, minCosine)
      .select(col("id").as("__bad_id"))
    train.join(bad, col(idCol) === col("__bad_id"), "left_anti")
  }

  /** L48: Min-K% membership signal (Shi et al., "Detecting Pretraining
    * Data from Large Language Models", ICLR 2024): a document's score
    * is the MEAN probability of its k/kDen least-likely tokens under a
    * reference LM. Memorized or duplicated text keeps even its rarest
    * spans high-probability; genuinely novel text has a low tail — so
    * a HIGH min-k score marks likely training-set membership (the
    * contamination-audit direction of L21's shingle overlap: no eval
    * set needed, just the reference model).
    *
    * Input is any per-token quantized-probability frame (`idCol`,
    * `qCol` int rows) — e.g. the L14 corpus bigram LM. Integer-exact:
    * k = ceil(n·kNum/kDen) as (n·kNum + kDen−1) div kDen, the
    * bottom-k sum is tie-insensitive (boundary ties all carry the
    * same q, so any engine's tie order yields the same sum), and the
    * mean is an integer div — hash-oracle-able like every scoring op
    * here. One window shuffle on the doc key (rank and count share
    * the partitioning); output is one row per doc. */
  def minkScores(scored: DataFrame, idCol: String, qCol: String,
                 kNum: Int = 1, kDen: Int = 5): DataFrame = {
    require(kNum >= 1 && kDen >= kNum,
      s"need 0 < kNum/kDen <= 1, got $kNum/$kDen")
    val w = Window.partitionBy("doc_id").orderBy(col("q").asc)
    val wc = Window.partitionBy("doc_id")
    scored.select(col(idCol).as("doc_id"), col(qCol).as("q"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wc))
      .withColumn("k", expr(s"(n * $kNum + ${kDen - 1}) div $kDen"))
      .filter(col("rn") <= col("k"))
      .groupBy("doc_id")
      .agg(max(col("n")).as("n_tokens"), max(col("k")).as("k"),
        expr("CAST(CAST(SUM(q) AS DECIMAL(38,0)) div COUNT(1) AS BIGINT)")
          .as("mink_q"))
  }
}
