package graft

import org.apache.spark.sql.functions._

import graft.operators.CoLocated

class BucketingSpec extends SparkSpec {

  test("bucketed co-located join plans with zero exchanges and zero sorts") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderpriority")
    CoLocated.writeBucketed(li, "li_bucketed", buckets = 8, key = "l_orderkey")
    CoLocated.writeBucketed(o, "o_bucketed", buckets = 8, key = "o_orderkey")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = CoLocated.bucketedJoin(spark, "li_bucketed", "o_bucketed",
        "l_orderkey", "o_orderkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(!plan.contains("Sort ("),
        s"sorted buckets must not re-sort:\n$plan")
      // correctness: same row count as the shuffled join
      assert(j.count() ==
        li.join(o, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
