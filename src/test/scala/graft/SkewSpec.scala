package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sessionize, Skew}

/** R34 generic salted join: exact equivalence to the plain join on
  * skewed data, and the bucketing contract (hot key spread over
  * `buckets` salt values, dim replicated once per bucket). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on a 50%-hot key") {
    val fact = Sessionize.hotKeyed(
      table("events"), "user_id")
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
      .select($"c_custkey".as("user_id"), $"c_mktsegment")
    val salted = Skew.saltedJoin(fact, dim, "user_id", "event_id", 8)
      .select("event_id", "user_id", "c_mktsegment")
    val plain = fact.join(dim, "user_id").select("event_id", "user_id", "c_mktsegment")
    assert(salted.except(plain).count() === 0)
    assert(plain.except(salted).count() === 0)
    assert(salted.count() === plain.count()) // multiplicity, not just sets
  }

  test("the hot key is spread across all salt buckets") {
    val fact = Sessionize.hotKeyed(
      table("events"), "user_id")
    val buckets = 8
    val spread = fact.filter($"user_id" === 0)
      .select(pmod(xxhash64($"event_id"), lit(buckets.toLong)).as("salt"))
      .distinct().count()
    assert(spread === buckets,
      s"hot key only reached $spread of $buckets salt buckets")
  }
}
