package graft

import org.apache.spark.sql.functions._

import graft.functions.{approx_top_k, count_min_agg, count_min_estimate, tokenize_ws, vector_sum}

class SketchSpec extends SparkSpec {

  test("HLL count-distinct is within its error bound of exact") {
    val ev = table("events")
    val joined = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .collect()
    joined.foreach { r =>
      val (a, e) = (r.getAs[Long]("approx").toDouble, r.getAs[Long]("exact").toDouble)
      assert(math.abs(a - e) / e <= 0.10, s"HLL off by ${math.abs(a - e) / e}")
    }
  }

  test("per-day HLL sketches union to the exact-grain answer") {
    val ev = table("events")
    val daily = ev
      .groupBy(timestamp_micros(expr("ts div 1000")).cast("date").as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = daily
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx"))
      .collect().head.getAs[Long]("approx").toDouble
    val exact = ev.agg(countDistinct(col("user_id"))).collect().head
      .getLong(0).toDouble
    assert(math.abs(merged - exact) / exact <= 0.05,
      s"merged-sketch estimate $merged vs exact $exact")
  }

  test("theta sketch set-difference: user-days with clicks but no purchase") {
    val ev = table("events")
      .withColumn("k", concat_ws("#", col("user_id"),
        timestamp_micros(expr("ts div 1000")).cast("date")))
    val sk = ev.agg(
      theta_sketch_agg(when(col("event_type") === "click", col("k"))).as("clicks"),
      theta_sketch_agg(when(col("event_type") === "purchase", col("k"))).as("purch"))
      .select(theta_sketch_estimate(
        theta_difference(col("clicks"), col("purch"))).as("est"))
      .collect().head.getAs[Long]("est").toDouble
    val clicks = ev.filter(col("event_type") === "click").select("k")
    val purch = ev.filter(col("event_type") === "purchase").select("k")
    val exact = clicks.except(purch).count().toDouble
    assert(exact > 0)
    assert(math.abs(sk - exact) / exact <= 0.10,
      s"theta difference estimate $sk vs exact $exact")
  }

  test("approx percentile is within 5% of exact at accuracy 1000") {
    val ev = table("events")
    val r = ev.agg(
      percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx"),
      expr("percentile(value, 0.5)").as("exact")).collect().head
    val (a, e) = (r.getAs[Double]("approx"), r.getAs[Double]("exact"))
    assert(math.abs(a - e) / math.max(e, 1e-9) <= 0.05)
  }

  // ---- Space-Saving heavy hitters (graft.functions.approx_top_k) ----

  private def tokens = table("documents")
    .select(explode(tokenize_ws(col("text"))).as("tok"))

  test("space-saving at large capacity equals the exact top-k") {
    val exact = tokens.groupBy("tok").count()
      .orderBy(col("count").desc, col("tok").asc).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val sketch = tokens.agg(approx_top_k(col("tok"), 10, 65536).as("hh"))
      .select(posexplode(col("hh")))
      .select(col("col.term"), col("col.est"), col("col.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(sketch.map(t => (t._1, t._2)) == exact)
    assert(sketch.forall(_._3 == 0L), "no evictions => zero error")
  }

  test("space-saving invariants hold under tight capacity") {
    val truth = tokens.groupBy("tok").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val n = truth.values.sum
    val cap = 16
    val sketch = tokens.agg(approx_top_k(col("tok"), cap, cap).as("hh"))
      .select(posexplode(col("hh")))
      .select(col("col.term"), col("col.est"), col("col.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sketch.nonEmpty)
    sketch.foreach { case (t, est, err) =>
      val tru = truth(t)
      assert(est >= tru, s"$t undercounted: est $est < true $tru")
      assert(est - err <= tru, s"$t bound broken: est-err ${est - err} > true $tru")
    }
    // every item above the n/capacity mass threshold must be reported
    val reported = sketch.map(_._1).toSet
    truth.filter(_._2 > n / cap).keys.foreach { hh =>
      assert(reported.contains(hh), s"heavy hitter $hh missing")
    }
  }

  test("space-saving merge is partitioning-invariant in the exact regime") {
    def run(parts: Int) =
      tokens.repartition(parts)
        .agg(approx_top_k(col("tok"), 10, 65536).as("hh"))
        .select(posexplode(col("hh")))
        .select(col("col.term"), col("col.est"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(run(2) == run(17))
  }

  test("count-min never undercounts and stays within the eps*N bound") {
    val toks = table("documents")
      .select(explode(graft.functions.tokenize_ws(col("text"))).as("tok"))
    val truth = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    val (depth, width) = (4, 1024)
    val sketch = toks.agg(count_min_agg(col("tok"), depth, width).as("cm"))
    val probes = truth.keys.toSeq.sorted.take(50)
    val ests = sketch
      .select(explode(array(probes.map(lit(_)): _*)).as("term"), col("cm"))
      .select(col("term"), count_min_estimate(col("cm"), col("term"), depth, width).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bound = math.ceil(math.E * n / width).toLong
    probes.foreach { t =>
      assert(ests(t) >= truth(t), s"count-min undercounted '$t'")
      assert(ests(t) <= truth(t) + bound,
        s"'$t': est ${ests(t)} vs true ${truth(t)} exceeds +$bound")
    }
  }

  test("count-min merge: partitioning-invariant, and vector_sum rollup = one-pass sketch") {
    val docs = table("documents")
    val (depth, width) = (4, 256)
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(col("lang"), explode(graft.functions.tokenize_ws(col("text"))).as("tok"))
    def onePass(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      toks(df).agg(count_min_agg(col("tok"), depth, width).as("cm"))
        .collect()(0).getSeq[Long](0)
    assert(onePass(docs) == onePass(docs.repartition(13)),
      "count-min result changed under repartitioning")
    // per-lang sketches merged via vector_sum equal the global sketch
    val rolled = toks(docs).groupBy("lang")
      .agg(count_min_agg(col("tok"), depth, width).as("cm"))
      .agg(vector_sum(transform(col("cm"), _.cast("double"))).as("cmd"))
      .select(transform(col("cmd"), _.cast("long")).as("cm"))
      .collect()(0).getSeq[Long](0)
    assert(rolled == onePass(docs), "vector_sum rollup diverged from one-pass sketch")
    // implicit coercion: vector_sum over the raw array<long> sketches
    // (the documented rollup recipe, no manual cast) gives the same
    // result — guards against reinterpreting long bits as doubles
    val direct = toks(docs).groupBy("lang")
      .agg(count_min_agg(col("tok"), depth, width).as("cm"))
      .agg(vector_sum(col("cm")).as("cmd"))
      .select(transform(col("cmd"), _.cast("long")).as("cm"))
      .collect()(0).getSeq[Long](0)
    assert(direct == onePass(docs), "uncast vector_sum rollup diverged")
  }

  test("approx_top_k coerces non-string input instead of failing at runtime") {
    GraftExtensions.install(spark) // graft's approx_top_k, not Spark 4's builtin
    val ev = table("events")
    ev.createOrReplaceTempView("ev_topk")
    // user_id is BIGINT; the registered SQL function must coerce it
    val viaSql = spark.sql(
      "SELECT explode(approx_top_k(user_id, 3, 100000)) AS hit FROM ev_topk")
      .select("hit.term", "hit.est")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = ev.groupBy(col("user_id").cast("string").as("term"))
      .agg(count(lit(1)).as("est"))
      .orderBy(col("est").desc, col("term").asc)
      .limit(3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSql == exact, "coerced approx_top_k diverged from exact top-3")
  }

  test("log-histogram quantiles: bounds contain the exact quantile") {
    import spark.implicits._
    import graft.operators.Sketch
    val rnd = new scala.util.Random(42)
    val vals = (1 to 5000).map(_ => math.abs(rnd.nextLong()) % 1000000L)
    val df = vals.toDF("v")
    val hist = Sketch.logHistogram(df, "v")
    val qs = Seq(100, 500, 900, 999)
    val out = Sketch.quantiles(hist, qs)
      .collect().map(r => r.getAs[Long]("q") ->
        (r.getAs[Long]("lo"), r.getAs[Long]("hi"))).toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val rank = (q.toLong * vals.size + 999) / 1000 // ceil(q·N/1000)
      val truth = sorted((rank - 1).toInt)
      val (lo, hi) = out(q.toLong)
      assert(truth >= lo && truth <= hi,
        s"p$q truth $truth outside sketch bucket [$lo, $hi]")
    }
  }

  test("log-histogram: shard merge equals one pass, any partitioning") {
    import spark.implicits._
    import graft.operators.Sketch
    val vals = (0L until 4000L).map(i => i * i % 777777L)
    val df = vals.toDF("v")
    val one = Sketch.logHistogram(df, "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val merged = Sketch.merge(
        Sketch.logHistogram(df.filter(col("v") % 3 === 0), "v"),
        Sketch.logHistogram(df.filter(col("v") % 3 === 1), "v"),
        Sketch.logHistogram(df.filter(col("v") % 3 === 2), "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(merged == one, "merge-by-addition diverged from one-pass build")
    val repart = Sketch.logHistogram(df.repartition(13), "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(repart == one, "histogram depends on partitioning")
  }

  test("grouped log-histogram equals per-key solo sketches and merges") {
    import spark.implicits._
    import graft.operators.Sketch
    val df = (1 to 3000).map(i => (s"k${i % 3}", (i.toLong * i) % 50000L))
      .toDF("key", "v")
    val grouped = Sketch.quantilesBy(
        Sketch.logHistogramBy(df, "key", "v"), Seq(500, 900))
      .collect().map(r => (r.getString(0), r.getAs[Long]("q")) ->
        (r.getAs[Long]("bucket"), r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .toMap
    (0 until 3).foreach { k =>
      val solo = Sketch.quantiles(
          Sketch.logHistogram(
            df.filter(col("key") === s"k$k").select("v"), "v"),
          Seq(500, 900))
        .collect().map(r => r.getAs[Long]("q") ->
          (r.getAs[Long]("bucket"), r.getAs[Long]("lo"), r.getAs[Long]("hi")))
        .toMap
      solo.foreach { case (q, t) =>
        assert(grouped((s"k$k", q)) == t,
          s"key k$k q$q: grouped ${grouped((s"k$k", q))} vs solo $t")
      }
    }
    // grouped shard sketches merge by addition too
    val merged = Sketch.mergeBy(
        Sketch.logHistogramBy(df.filter(col("v") % 2 === 0), "key", "v"),
        Sketch.logHistogramBy(df.filter(col("v") % 2 =!= 0), "key", "v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val one = Sketch.logHistogramBy(df, "key", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(merged == one, "grouped merge-by-addition diverged from one pass")
  }

  test("log-histogram rejects negative values loudly") {
    import spark.implicits._
    import graft.operators.Sketch
    val ex = intercept[Exception] {
      Sketch.logHistogram(Seq(1L, -2L, 3L).toDF("v"), "v").collect()
    }
    assert(ex.getMessage.contains("negative value") ||
      ex.getCause != null && ex.getCause.getMessage.contains("negative value"))
  }

  test("rolling distinct: sketch-merged trailing window equals exact (R29b/R29c)") {
    import graft.queries.RelationalQueries
    val exact = RelationalQueries.queries("q_rolling_distinct")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val sk = RelationalQueries.queries("q_rolling_distinct_sketch")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(exact.nonEmpty && exact == sk)
    // trailing windows are supersets of their newest day: monotone vs
    // the per-day distinct count
    val perDay = table("events")
      .select(org.apache.spark.sql.functions.expr("ts div 86400000000000").as("d"),
        org.apache.spark.sql.functions.col("user_id"))
      .distinct().groupBy("d").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    exact.foreach { case (d, n3) => assert(n3 >= perDay(d)) }
  }

  test("rolling distinct: hand-computed 3-day windows on a planted log") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val day = 86400000000000L
    // day 0: users {1,2}; day 1: {2}; day 3: {3} (day 2 has no events)
    val ev = Seq((1L, 0L), (2L, 0L), (2L, day + 5L), (3L, 3 * day + 1L))
      .toDF("user_id", "ts")
    val dayIdx = expr("ts div 86400000000000").as("day_idx")
    val du = ev.select(dayIdx, col("user_id")).distinct()
    val days = du.select(col("day_idx").as("w_day")).distinct()
    val got = du.select(explode(sequence(col("day_idx"), col("day_idx") + 2))
        .as("w_day"), col("user_id"))
      .join(days, "w_day")
      .groupBy("w_day").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // window(0)={1,2}; window(1)=days 0..1={1,2}; window(3)=days 1..3={2,3};
    // day 2 has no row (not in the day domain)
    assert(got == Map(0L -> 2L, 1L -> 2L, 3L -> 2L))
  }

  test("joinSizeEstimate: exact on clean rows, never undercounts, delta-mergeable") {
    import spark.implicits._
    import graft.operators.Sketch
    // planted multisets with a known join size:
    // A = {x:3, y:2, z:1}, B = {x:2, z:5, w:4} -> 3*2 + 1*5 = 11
    val a = (Seq.fill(3)("x") ++ Seq.fill(2)("y") ++ Seq("z")).toDF("k")
    val b = (Seq.fill(2)("x") ++ Seq.fill(5)("z") ++ Seq.fill(4)("w")).toDF("k")
    val r = Sketch.joinSizeEstimate(a, "k", b, "k", depth = 5, width = 64)
      .collect().head
    assert(r.getAs[Long]("n_a") == 6L && r.getAs[Long]("n_b") == 11L)
    assert(r.getAs[Long]("est_join_rows") == 11L)
    // the CM inner product NEVER undercounts under forced collisions
    // (width 2 over 4 distinct keys: rows collide; the bound holds)
    val crushed = Sketch.joinSizeEstimate(a, "k", b, "k", depth = 2, width = 2)
      .collect().head
    assert(crushed.getAs[Long]("est_join_rows") >= 11L &&
      crushed.getAs[Long]("est_join_rows") <= 66L)
    // disjoint keys estimate 0 in the clean regime
    val c = Seq("p", "q").toDF("k")
    assert(Sketch.joinSizeEstimate(a, "k", c, "k", 5, 64)
      .collect().head.getAs[Long]("est_join_rows") == 0L)
    // partition invariance (deterministic hashes)
    val rep = Sketch.joinSizeEstimate(a.repartition(5), "k",
      b.repartition(3), "k", 5, 64).collect().head
    assert(rep.toSeq == r.toSeq)
  }

  test("theta overlap: exact-regime set algebra, partition invariance, approx error") {
    import spark.implicits._
    import graft.operators.Sketch
    // planted groups with known overlaps: A = 0..99, B = 50..149,
    // C = 200..299 (disjoint from both)
    val rows = (0 to 99).map(i => ("A", s"k$i")) ++
      (50 to 149).map(i => ("B", s"k$i")) ++
      (200 to 299).map(i => ("C", s"k$i"))
    val df = rows.toDF("g", "k")
    val m = Sketch.overlapMatrix(df, "g", "k", lgK = 12)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = m(("A", "B"))
    assert(ab.getAs[Long]("n_a") == 100L && ab.getAs[Long]("n_b") == 100L)
    assert(ab.getAs[Long]("n_inter") == 50L &&
      ab.getAs[Long]("n_union") == 150L &&
      ab.getAs[Long]("n_a_not_b") == 50L)
    assert(ab.getAs[Long]("jaccard_ppm") == 50L * 1000000L / 150L)
    // disjoint pair: zero intersection, A\B = A
    val ac = m(("A", "C"))
    assert(ac.getAs[Long]("n_inter") == 0L &&
      ac.getAs[Long]("n_a_not_b") == 100L &&
      ac.getAs[Long]("jaccard_ppm") == 0L)
    // set algebra holds exactly in the theta=1 regime:
    // |A∩B| + |A\B| = |A| and |A|+|B|-|A∩B| = |A∪B| on every pair
    m.values.foreach { r =>
      assert(r.getAs[Long]("n_inter") + r.getAs[Long]("n_a_not_b") ==
        r.getAs[Long]("n_a"))
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") -
        r.getAs[Long]("n_inter") == r.getAs[Long]("n_union"))
    }
    // duplicates and partitioning change nothing (sketches are sets)
    val dup = Sketch.overlapMatrix(
        df.unionByName(df).repartition(7), "g", "k", lgK = 12)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    m.foreach { case (k, r) => assert(dup(k) == r.toSeq) }
    // approximate regime stays honest: lgK=4 (16 nominal entries)
    // over 20k distinct values lands within a loose multiple of the
    // published ~1/sqrt(2^lgK) relative standard error
    val big = (0 until 20000).map(i => ("X", s"v$i")) ++
      (10000 until 30000).map(i => ("Y", s"v$i"))
    val bm = Sketch.overlapMatrix(big.toDF("g", "k"), "g", "k", lgK = 4)
      .collect().head
    val estA = bm.getAs[Long]("n_a").toDouble
    assert(math.abs(estA - 20000.0) / 20000.0 < 1.0,
      s"lgK=4 estimate $estA wildly off 20000")
  }
}
