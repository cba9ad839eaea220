package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** R33: runtime bloom-filter join pruning — the "runtime filter" /
  * sideways-information-passing optimization (Trino dynamic filtering,
  * Spark's own row-level runtime bloom filters): when a selective dim
  * table joins a huge fact table, build a bloom filter of the dim's
  * join keys first and drop non-matching fact rows MAP-SIDE, before
  * they pay the join shuffle. At 100 TB this is the difference between
  * shuffling the whole fact table and shuffling only the (say) 2% of
  * rows that can possibly join.
  *
  * All pieces are codegen'd built-ins:
  *  - build: k seeded `xxhash64` probes per dim key, exploded to bit
  *    positions, folded into `numBits/64` words with a `bit_or`
  *    aggregate (map-side partial OR; B rows through the shuffle
  *    regardless of dim size), collected as the driver-bounded model
  *    artifact (32 KB at the default 2^18 bits) — same
  *    models-broadcast-corpora-don't contract as centroids/BPE merges;
  *  - probe: the word array rides the plan as a literal; each fact row
  *    tests its k bit positions with unrolled shift/mask arithmetic
  *    inside WholeStageCodegen — no UDF, no driver round-trip per row.
  *
  * Bloom semantics: false positives possible (stray fact rows survive
  * the prefilter and die in the real join — correctness unaffected,
  * which is what lets the oracle hash-gate the whole plan), false
  * negatives impossible (a present key always sees all its k bits set).
  */
object Prune {
  import org.apache.spark.sql.graft.Bridge.{column => col2, expression => ex}
  import org.apache.spark.sql.catalyst.expressions.{ShiftRight => CatShiftRight}

  /** Dynamic-shift helper (`functions.shiftright` only takes a literal
    * shift): word >> n with n a column. */
  private def shr(word: Column, n: Column): Column =
    col2(CatShiftRight(ex(word), ex(n)))

  /** Build the bloom bitmap over `dim`'s `keyCol` (any type `xxhash64`
    * accepts; both sides of a join must use the same key type). Returns
    * the packed words — a driver-bounded artifact like a centroid
    * table, NOT data (numBits/64 longs, independent of dim row count).
    */
  def bloomWords(dim: DataFrame, keyCol: String, numBits: Int, k: Int): Array[Long] = {
    require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64, got $numBits")
    require(k >= 1 && k <= 16, s"need 1 <= k <= 16 hash probes, got $k")
    val nWords = numBits / 64
    val words = new Array[Long](nWords)
    dim.filter(col(keyCol).isNotNull)
      .select(explode(array((0 until k).map(i =>
        pmod(xxhash64(col(keyCol), lit(i)), lit(numBits.toLong))): _*)).as("p"))
      .select(shiftright(col("p"), 6).cast("int").as("w"),
        col("p").bitwiseAND(63L).cast("int").as("b"))
      .groupBy("w")
      // 1L << b via the SQL form: the Scala shiftleft also wants a
      // literal shift
      .agg(bit_or(expr("shiftleft(1L, b)")).as("bits"))
      .collect()
      .foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** Membership test column: all k probe bits set. Unrolled over k
    * (compile-time constant), pure shift/mask arithmetic — stays in
    * WholeStageCodegen. */
  def mightContain(words: Array[Long], numBits: Int, k: Int)(key: Column): Column = {
    val wordsLit = lit(words)
    (0 until k).map { i =>
      val p = pmod(xxhash64(key, lit(i)), lit(numBits.toLong))
      val word = element_at(wordsLit, (shiftright(p, 6) + 1).cast("int"))
      shr(word, p.bitwiseAND(63L).cast("int")).bitwiseAND(1L) === 1L
    }.reduce(_ && _)
  }

  /** Prefilter `fact` to rows whose `factKey` might appear in `dim`'s
    * `dimKey` set. Map-side, no shuffle; keeps every true match plus a
    * numBits/k-governed fraction of false positives. */
  def bloomSemiFilter(fact: DataFrame, factKey: String,
                      dim: DataFrame, dimKey: String,
                      numBits: Int = 1 << 18, k: Int = 5): DataFrame = {
    // xxhash64 is type-sensitive (INT 7 and BIGINT 7 hash differently),
    // so a type mismatch would silently produce false NEGATIVES and
    // break the result-equals-plain-join guarantee. Fail loudly instead.
    val ft = fact.schema(factKey).dataType
    val dt = dim.schema(dimKey).dataType
    require(ft == dt,
      s"bloom key types must match exactly (xxhash64 is type-sensitive): " +
        s"fact.$factKey is $ft, dim.$dimKey is $dt — cast one side first")
    val words = bloomWords(dim, dimKey, numBits, k)
    fact.filter(col(factKey).isNotNull &&
      mightContain(words, numBits, k)(col(factKey)))
  }

  /** Inner equi-join with the fact side bloom-pruned before its
    * shuffle. Result is exactly `fact JOIN dim` (false positives die in
    * the real join) — the oracle gate runs the plain join. */
  def bloomJoin(fact: DataFrame, factKey: String,
                dim: DataFrame, dimKey: String,
                numBits: Int = 1 << 18, k: Int = 5): DataFrame =
    bloomSemiFilter(fact, factKey, dim, dimKey, numBits, k)
      .join(dim, col(factKey) === col(dimKey))
}
