package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R34: generic salted equi-join — the skew-bucketing technique behind
  * `Sessionize.salted`, generalized to any fact⋈dim join. A hot join
  * key (one user owning half the events) serializes a textbook
  * shuffle join: every row of the hot key lands in ONE reducer. Salting
  * splits each fact key across `buckets` sub-partitions (salt = hash of
  * a fact-row column, so the assignment is deterministic and
  * re-run-stable) and replicates the DIM side once per bucket; the join
  * key becomes (key, salt), so the hot key's rows spread over `buckets`
  * reducers. Cost: dim payload ×buckets through the shuffle — use for
  * small-dim joins where AQE's skew splitting can't apply (e.g. the
  * dim side must co-group, or deterministic partitioning is required).
  * Result is EXACTLY the plain join (each fact row meets its dim row in
  * precisely one bucket) — the oracle gate runs the plain join.
  *
  * Skew only spreads if `saltBy` has more distinct values than
  * `buckets` WITHIN the hot key (salt is a hash of that column): a
  * constant saltBy degrades to the unsalted join. Pick a high-
  * cardinality fact column (event id, timestamp) that is NOT the join
  * key. */
object Skew {
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBy: String, buckets: Int): DataFrame = {
    require(buckets >= 2, s"need buckets >= 2, got $buckets")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin reserves the column name '__salt'; rename or drop the existing one")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col(saltBy)), lit(buckets.toLong)).cast("int"))
    val dimR = dim.withColumn("__salt",
      explode(array((0 until buckets).map(lit(_)): _*)))
    salted.join(dimR, Seq(key, "__salt")).drop("__salt")
  }
}
