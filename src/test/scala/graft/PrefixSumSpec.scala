package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{PrefixSum, Walk}

/** The distributed prefix-sum kernel behind the walk/negative-sampling
  * cumulative-weight tables: (1) bucketed/keyed results are
  * bit-identical to the naive ORDER BY window formulation the DuckDB
  * oracles run; (2) no plan in the chain contains an unpartitioned
  * WindowExec (the global sort the kernel exists to remove). */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def globalWindows(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }

  test("bucketed == naive global ORDER BY cumsum, any bucket granularity") {
    val rows = (1 to 500).map(i => (f"n${(i * 37) % 251}%03d-$i", (i * 13 % 97).toLong))
    val df = rows.toDF("node", "w")
    val naive = df.withColumn("cum", sum(col("w")).over(
        Window.orderBy("node").rowsBetween(Window.unboundedPreceding, 0)))
      .select("node", "w", "cum").collect().map(r => (r.getString(0), r.getLong(2))).toMap
    for (pfx <- Seq(1, 2, 4)) {
      val got = PrefixSum.bucketed(df.repartition(7), Seq("node"), col("w"),
          substring(col("node"), 1, pfx))
        .select("node", "cum").collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == naive, s"prefix=$pfx diverged from the one-window cumsum")
    }
    // degenerate single bucket still exact
    val one = PrefixSum.bucketed(df, Seq("node"), col("w"), lit(0L))
      .select("node", "cum").collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(one == naive)
  }

  test("keyed == per-group ORDER BY cumsum + group total") {
    val rows = for (g <- 1 to 9; i <- 1 to (g * 11)) yield
      (s"g$g", i.toLong, ((g * i * 7) % 13 + 1).toLong)
    val df = rows.toDF("grp", "rk", "w")
    val wCum = Window.partitionBy("grp").orderBy("rk")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wTot = Window.partitionBy("grp")
    val naive = df.withColumn("cum", sum(col("w")).over(wCum))
      .withColumn("tot", sum(col("w")).over(wTot))
      .select("grp", "rk", "cum", "tot")
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    val got = PrefixSum.keyed(df.repartition(5), Seq("grp"), Seq("rk"),
        col("w"), bucket = pmod(col("rk"), lit(1L)) + (col("rk") * lit(4L)) / lit(200L))
      .select("grp", "rk", "cum", "tot")
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(got == naive)
  }

  test("null bucket fails loudly instead of dropping rows") {
    val df = Seq(("a", 1L), (null, 2L)).toDF("node", "w")
    val e = intercept[Exception] {
      PrefixSum.bucketed(df, Seq("node"), col("w"),
        substring(col("node"), 1, 2)).collect()
    }
    assert(e.getMessage != null)
  }

  test("walk-chain plans carry no unpartitioned WindowExec") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("b", "c"),
      ("c", "a"), ("c", "b")).toDF("src", "dst")
    // node2vec step windows: assert on the operator's own output plan
    // (adjacency is checkpointed, the step joins are not)
    val walks = Walk.node2vecWalks(edges, "src", "dst", nWalks = 2, len = 3)
    assert(globalWindows(walks).isEmpty,
      s"node2vec cum-weight table planned a global window:\n${walks.queryExecution.sparkPlan}")
    // negative sampling checkpoints its cum table, so assert the
    // BUILDING stage (the memory rule: checkpoints hide plan contracts)
    val wts = Seq(("n1", 3L), ("n2", 5L), ("m1", 2L)).toDF("node", "w")
    val built = PrefixSum.bucketed(wts, Seq("node"), col("w"),
      substring(col("node"), 1, 1))
    assert(globalWindows(built).isEmpty,
      s"bucketed prefix sum planned a global window:\n${built.queryExecution.sparkPlan}")
    // and the end-to-end operator still returns the right rows on a
    // growing node table (the bucket path, not the lit(0) fallback)
    val pairs = (1 to 200).map(i => (s"c${i % 17}", f"ctx${i % 41}%03d", 1L))
      .toDF("center", "context", "n_pairs")
    val neg = Walk.negativeSamples(pairs, "center", "context", "n_pairs", k = 3)
    assert(neg.count() == 17L * 3)
  }

  test("negativeSamples on an empty feed returns an empty frame, not an NPE") {
    val pairs = Seq.empty[(String, String, Long)]
      .toDF("center", "context", "n_pairs")
    val neg = Walk.negativeSamples(pairs, "center", "context", "n_pairs", k = 2)
    assert(neg.count() == 0)
    assert(neg.columns.toSeq == Seq("center", "k", "neg_node"))
  }

  test("integral node keys range-bucket (order preserved, cum exact)") {
    val pairs = (1 to 300).map(i => (i % 11L, (i * 7) % 53L, 1L))
      .toDF("center", "context", "n_pairs")
    val neg = Walk.negativeSamples(pairs, "center", "context", "n_pairs", k = 2)
    // per-center picks exist and are drawn from the context vocabulary
    assert(neg.count() == 11L * 2)
    val vocab = pairs.select("context").distinct().as[Long].collect().toSet
    assert(neg.select("neg_node").as[Long].collect().forall(vocab.contains))
  }
}
