package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Deduplication operators for training-data pipelines (SURVEY.md §2
  * L1-L5). Scale contract: nothing here is O(n²) — every near-dup
  * variant blocks candidates first (LSH bands / simhash bands /
  * explicit block columns) so the self-join shuffles on a
  * high-cardinality key and each bucket stays small at 100 TB.
  */
object Dedup {

  /** L1: exact dedup by content hash — one shuffle on md5(text),
    * map-side partial agg. Returns (keep_id, n_copies) per distinct
    * content. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  private def tokenSet(textCol: String): Column =
    array_distinct(tokenize_ws(col(textCol)))

  /** L2: exact word-set Jaccard over candidate pairs within explicit
    * blocks (e.g. language): join key = block columns, so the shuffle
    * partitions by block and never materializes cross-block pairs. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   blockCols: Seq[String], minJaccard: Double): DataFrame = {
    val toks = df.select(col(idCol).as("id") +: tokenSet(textCol).as("toks") +:
      blockCols.map(col): _*)
    val a = toks.as("a")
    val b = toks.as("b")
    val blockEq = blockCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
    a.join(b, blockEq && col("a.id") < col("b.id"))
      .withColumn("jac",
        round_portable(size(array_intersect(col("a.toks"), col("b.toks"))).cast("double") /
          size(array_union(col("a.toks"), col("b.toks"))).cast("double"), 4))
      .filter(col("jac") >= minJaccard)
      .select(col("a.id").as("doc_id1"), col("b.id").as("doc_id2"), col("jac"))
  }

  /** L3: MinHash-LSH near-dup. k-perm signature → `bands` band keys →
    * candidates share a band bucket (the only shuffle key) → verified
    * with exact Jaccard. Classic Broder/LSH construction; candidate
    * count scales with true-duplicate density, not n². */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 32, bands: Int = 8, minJaccard: Double = 0.5): DataFrame = {
    val rows = k / bands
    val sigs = df.select(col(idCol).as("id"), tokenSet(textCol).as("toks"))
      .withColumn("sig", minhash_sig(col("toks"), k))
    val banded = sigs.select(col("id"), col("toks"),
      posexplode(array((0 until bands).map(bi =>
        xxhash64(slice(col("sig"), bi * rows + 1, rows))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_id1"), col("b.id").as("doc_id2"),
        col("a.toks").as("toks1"), col("b.toks").as("toks2"))
      .distinct() // a pair may collide in several bands
      .withColumn("jac",
        round_portable(size(array_intersect(col("toks1"), col("toks2"))).cast("double") /
          size(array_union(col("toks1"), col("toks2"))).cast("double"), 4))
      .filter(col("jac") >= minJaccard)
      .select("doc_id1", "doc_id2", "jac")
  }

  /** L4: SimHash near-dup. 64-bit fingerprint split into 4 16-bit
    * bands; hamming ≤ 3 pigeonholes into at least one equal band, so
    * the band join is a complete candidate generator for that radius. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol).as("id"),
      simhash64(tokenize_ws(col(textCol))).as("fp"))
    val banded = fp.select(col("id"), col("fp"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("fp"), i * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_id1"), col("b.id").as("doc_id2"),
        col("a.fp").as("fp1"), col("b.fp").as("fp2"))
      .distinct()
      .withColumn("hamming", hamming64(col("fp1"), col("fp2")))
      .filter(col("hamming") <= maxHamming)
      .select("doc_id1", "doc_id2", "hamming")
  }

  /** L5: embedding near-dup — random-hyperplane cosine LSH in an
    * OR-of-ANDs construction (`bands` bands of `bitsPerBand` sign
    * bits): candidates collide in ≥1 band, then exact cosine ≥
    * threshold verifies. Recall at angle θ ≈ 1-(1-(1-θ/π)^r)^b; tune
    * (bands, bitsPerBand) per similarity target. One shuffle on the
    * (band, bucket) key — never n². */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
                     bands: Int = 8, bitsPerBand: Int = 4,
                     minCosine: Double = 0.95): DataFrame = {
    val mask = (1L << bitsPerBand) - 1
    val v = df.select(col(idCol).as("id"),
      as_double_array(col(vecCol)).as("vec"))
      .withColumn("sig", hyperplane_lsh(col("vec"), bands * bitsPerBand))
    val banded = v.select(col("id"), col("vec"),
      posexplode(array((0 until bands).map(i =>
        shiftright(col("sig"), i * bitsPerBand).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.vec").as("vec1"), col("b.vec").as("vec2"))
      .distinct()
      .withColumn("cos", round(cosine_sim(col("vec1"), col("vec2")), 4))
      .filter(col("cos") >= minCosine)
      .select("id1", "id2", "cos")
  }
}
