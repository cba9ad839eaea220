package graft

import org.apache.spark.sql.functions._

import graft.operators.Prune

/** R33 bloom-filter join pruning: the bloom contract (no false
  * negatives, bounded false positives), join-result equivalence, and
  * the scale property that the prefilter itself is shuffle-free. */
class PruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact =
    (1L to 20000L).map(i => (i, i % 977)).toDF("row_id", "key")
  private lazy val dim =
    (0L until 977L by 13).toDF("dkey") // 76 of 977 key values

  test("bloom prefilter keeps every true match (no false negatives)") {
    val kept = Prune.bloomSemiFilter(fact, "key", dim, "dkey",
      numBits = 1 << 12, k = 5)
    val exact = fact.join(dim, $"key" === $"dkey", "left_semi")
    assert(exact.except(kept).count() === 0,
      "a row with a key present in dim was dropped by the bloom prefilter")
  }

  test("bloom prefilter prunes nearly all non-matching rows") {
    val kept = Prune.bloomSemiFilter(fact, "key", dim, "dkey",
      numBits = 1 << 16, k = 5).count()
    val matches = fact.join(dim, $"key" === $"dkey", "left_semi").count()
    val total = fact.count()
    // 76 keys * 5 probes in 65536 bits: fp rate ~ (380/65536)^5 ~ 1e-11
    assert(kept >= matches)
    assert(kept <= matches + math.max(1L, total / 100),
      s"prefilter kept $kept rows for $matches true matches out of $total")
  }

  test("bloomJoin result equals the plain join") {
    val pruned = Prune.bloomJoin(fact, "key", dim, "dkey",
      numBits = 1 << 12, k = 3)
      .select("row_id", "key", "dkey")
    val plain = fact.join(dim, $"key" === $"dkey").select("row_id", "key", "dkey")
    assert(pruned.except(plain).count() === 0)
    assert(plain.except(pruned).count() === 0)
  }

  test("the prefilter is map-side: no shuffle in the prefiltered plan") {
    // parquet-backed input: a LocalRelation would be constant-folded
    // through the filter and hide the probe from the plan
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val parts = spark.read.parquet(s"$sfDir/part.parquet")
      .filter($"p_size" === 1).select("p_partkey")
    val kept = Prune.bloomSemiFilter(li, "l_partkey", parts, "p_partkey",
      numBits = 1 << 12, k = 5)
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("xxhash64"), s"bloom probe missing from the plan:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bloom prefilter should add no shuffle, plan:\n$plan")
  }

  test("null fact keys are dropped (inner-join semantics)") {
    val withNulls = fact.union(Seq((99991L, Option.empty[Long]))
      .toDF("row_id", "key"))
    val kept = Prune.bloomSemiFilter(withNulls, "key", dim, "dkey",
      numBits = 1 << 12, k = 5)
    assert(kept.filter($"key".isNull).count() === 0)
  }
}
