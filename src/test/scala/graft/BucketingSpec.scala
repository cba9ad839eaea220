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

  test("co-located as-of join: zero exchanges, row parity with AsOf.join") {
    import spark.implicits._
    import graft.operators.AsOf
    val left = Seq(
      (1L, 100L, 9L), (1L, 200L, 9L), (1L, 50L, 9L), // 50 precedes all
      (2L, 150L, 9L), (3L, 100L, 9L) // key 3 has no right rows
    ).toDF("k", "ts", "tie")
    val right = Seq(
      (1L, 90L, 1L, 10.5), (1L, 100L, 2L, 11.5), (1L, 100L, 3L, 12.5), // tie at 100
      (1L, 199L, 4L, 13.5), (2L, 10L, 5L, 14.5)
    ).toDF("k", "ts", "tie", "price")
    CoLocated.writeBucketed(left, "asof_l_bucketed", buckets = 4, key = "k")
    CoLocated.writeBucketed(right, "asof_r_bucketed", buckets = 4, key = "k")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (tol <- Seq(-1L, 60L)) {
        val j = CoLocated.asOfJoinBucketed(spark, "asof_l_bucketed",
          "asof_r_bucketed", Seq("k"), "ts", "ts", "tie",
          Seq("tie", "price"), tolerance = tol)
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
        assert(!plan.contains("Exchange"),
          s"co-located as-of must not shuffle (tol=$tol):\n$plan")
        val got = j.collect()
          .map(r => (r.getLong(0), r.getLong(1),
            Option(r.get(3)).map(_.asInstanceOf[Long]),
            Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
        val twin = AsOf.join(left, right, Seq("k"), "ts", "ts", "tie",
            Seq("tie", "price"), tolerance = tol).collect()
          .map(r => (r.getLong(0), r.getLong(1),
            Option(r.get(3)).map(_.asInstanceOf[Long]),
            Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
        assert(got == twin, s"tol=$tol\ngot : $got\ntwin: $twin")
      }
      // semantics spot-checks ride the unbounded variant
      val un = CoLocated.asOfJoinBucketed(spark, "asof_l_bucketed",
          "asof_r_bucketed", Seq("k"), "ts", "ts", "tie",
          Seq("tie", "price")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      assert(un((1L, 100L)) == Some(3L), "tie at 100 must pick largest tie")
      assert(un((1L, 50L)).isEmpty, "pre-history left row keeps nulls")
      assert(un((3L, 100L)).isEmpty, "keyless left row keeps nulls")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS asof_l_bucketed")
      spark.sql("DROP TABLE IF EXISTS asof_r_bucketed")
    }
  }

  test("tenant-scoped co-located as-of: composite keys, zero exchanges, parity") {
    import spark.implicits._
    import graft.operators.AsOf
    val left = Seq(
      ("a", 1L, 100L, 9L), ("a", 1L, 200L, 9L), ("b", 1L, 100L, 9L),
      ("b", 2L, 150L, 9L)
    ).toDF("tenant", "k", "ts", "tie")
    val right = Seq(
      ("a", 1L, 90L, 1L, 10.5), ("a", 1L, 199L, 2L, 11.5),
      // same entity id under ANOTHER tenant must never leak across
      ("b", 1L, 95L, 3L, 12.5), ("b", 2L, 10L, 4L, 14.5)
    ).toDF("tenant", "k", "ts", "tie", "price")
    CoLocated.writeBucketedKeys(left, "tasof_l", buckets = 4,
      keys = Seq("tenant", "k"))
    CoLocated.writeBucketedKeys(right, "tasof_r", buckets = 4,
      keys = Seq("tenant", "k"))
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = CoLocated.asOfJoinBucketed(spark, "tasof_l", "tasof_r",
        Seq("tenant", "k"), "ts", "ts", "tie", Seq("tie", "price"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange"),
        s"tenant-scoped as-of must not shuffle:\n$plan")
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getLong(1), r.getLong(2)) ->
          Option(r.get(4)).map(_.asInstanceOf[Long])
      val got = j.collect().map(key).toMap
      val twin = AsOf.join(left, right, Seq("tenant", "k"), "ts", "ts",
        "tie", Seq("tie", "price")).collect().map(key).toMap
      assert(got == twin, s"got $got\ntwin $twin")
      // isolation: tenant a's 100-probe sees a's 90-row, tenant b's
      // sees b's own 95-row — not the other tenant's closer match
      assert(got(("a", 1L, 100L)) == Some(1L))
      assert(got(("b", 1L, 100L)) == Some(3L))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS tasof_l")
      spark.sql("DROP TABLE IF EXISTS tasof_r")
    }
  }

  test("lexical index: probe scans only the query terms' buckets; " +
      "search equals from-scratch BM25") {
    import graft.operators.Lexical
    import graft.queries.AnalyticsQueries
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    try {
      Lexical.buildIndex(d, "doc_id", "text", "lexidx_spec", buckets = 16)
      val terms = Seq("spark", "join", "merge", "vector", "stream")
      val hits = Lexical.searchBm25(spark, "lexidx_spec", terms, k = 20)
      // bucket pruning: the postings scan must select a strict subset
      // of the 16 buckets for a 5-term probe
      val scan = hits.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of 16".r
        .findFirstMatchIn(scan)
      assert(sel.isDefined, s"no bucket pruning in plan:\n$scan")
      assert(sel.get.group(1).toInt <= 5,
        s"expected <= 5 of 16 buckets, got ${sel.get.group(1)}")
      // value parity with the from-scratch q_bm25 computation
      val direct = AnalyticsQueries.queries("q_bm25")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val indexed = hits
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(indexed == direct)
    } finally {
      Seq("postings", "doclen", "termdf", "stats").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS lexidx_spec_$s"))
    }
  }

  test("batched BM25: per-query results equal single-query probes, scan stays pruned") {
    import graft.operators.Lexical
    import spark.implicits._
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    try {
      Lexical.buildIndex(d, "doc_id", "text", "lexidx_batch", buckets = 16)
      val queries = Seq((101L, "spark join"), (102L, "merge vector stream"),
        (103L, "spark stream")).toDF("qid", "qtext")
      val batch = Lexical.searchBm25Batch(queries, "qid", "qtext",
        "lexidx_batch", k = 10)
      // shared-term reads stay bucket-pruned for the whole batch
      val scan = batch.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of 16".r.findFirstMatchIn(scan)
      assert(sel.isDefined && sel.get.group(1).toInt <= 5,
        s"expected <= 5 of 16 buckets for the batch vocabulary:\n$scan")
      val got = batch.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
      for ((qid, qtext) <- Seq((101L, "spark join"), (102L, "merge vector stream"),
          (103L, "spark stream"))) {
        val single = Lexical.searchBm25(spark, "lexidx_batch",
            qtext.split(" ").toSeq, k = 10)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(got(qid) == single, s"batch result for query $qid diverges")
      }
    } finally {
      Seq("postings", "doclen", "termdf", "stats").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS lexidx_batch_$s"))
    }
  }

  test("incremental append: build(half) + append(half) equals build(all)") {
    import graft.operators.Lexical
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val terms = Seq("spark", "join", "merge", "vector", "stream")
    try {
      Lexical.buildIndex(d, "doc_id", "text", "lexidx_full", buckets = 8)
      Lexical.buildIndex(d.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", "lexidx_inc", buckets = 8)
      Lexical.appendDocs(d.filter(col("doc_id") % 2 =!= 0),
        "doc_id", "text", "lexidx_inc", buckets = 8)
      def top(table: String) =
        Lexical.searchBm25(spark, table, terms, k = 20)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(top("lexidx_inc") == top("lexidx_full"))
      def phrase(table: String) =
        Lexical.searchPhrase(spark, table, Seq("table", "hash"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(phrase("lexidx_inc") == phrase("lexidx_full"))
    } finally {
      for (t <- Seq("lexidx_full", "lexidx_inc"); s <- Seq("postings", "doclen", "termdf", "stats"))
        spark.sql(s"DROP TABLE IF EXISTS ${t}_$s")
    }
  }

  test("deletion: build(all) - delete(half) equals build(half), unknown ids no-op") {
    import spark.implicits._
    import graft.operators.Lexical
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val terms = Seq("spark", "join", "merge", "vector", "stream")
    try {
      Lexical.buildIndex(d, "doc_id", "text", "lexidx_delfrom", buckets = 8)
      Lexical.deleteDocs(spark, "lexidx_delfrom",
        d.filter(col("doc_id") % 2 =!= 0).select("doc_id"), "doc_id")
      Lexical.buildIndex(d.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", "lexidx_delref", buckets = 8)
      def top(table: String) =
        Lexical.searchBm25(spark, table, terms, k = 20)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      // scores equal a from-scratch index over the survivors: df and
      // avgdl both shifted with the deletion, not just the hit list
      assert(top("lexidx_delfrom") == top("lexidx_delref"))
      def phrase(table: String) =
        Lexical.searchPhrase(spark, table, Seq("table", "hash"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(phrase("lexidx_delfrom") == phrase("lexidx_delref"))
      // unknown ids: a no-op, searches unchanged
      val before = top("lexidx_delfrom")
      Lexical.deleteDocs(spark, "lexidx_delfrom",
        Seq(-1L, -2L).toDF("doc_id"), "doc_id")
      assert(top("lexidx_delfrom") == before)
    } finally {
      for (t <- Seq("lexidx_delfrom", "lexidx_delref");
           s <- Seq("postings", "doclen", "termdf", "stats"))
        spark.sql(s"DROP TABLE IF EXISTS ${t}_$s")
    }
  }

  test("phrase search equals a direct token-window scan") {
    import graft.operators.Lexical
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    try {
      Lexical.buildIndex(d, "doc_id", "text", "lexidx_ph_spec", buckets = 16)
      // driver-side truth: count consecutive occurrences in the text
      def truth(phrase: Seq[String]): Map[Long, Long] =
        d.select("doc_id", "text").collect().flatMap { r =>
          val t = r.getString(1).split(" ").filter(_.nonEmpty)
          val n = t.sliding(phrase.size).count(_.sameElements(phrase))
          if (n > 0) Some(r.getLong(0) -> n.toLong) else None
        }.toMap
      for (phrase <- Seq(Seq("table", "hash"), Seq("the", "data", "table"),
          Seq("nosuchword", "ever"))) {
        val got = Lexical.searchPhrase(spark, "lexidx_ph_spec", phrase)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == truth(phrase), s"phrase $phrase mismatch")
      }
    } finally {
      Seq("postings", "doclen", "termdf", "stats").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS lexidx_ph_spec_$s"))
    }
  }

  test("concordance: positions, rank cap, and edge-clamped context windows") {
    import graft.operators.Lexical
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    try {
      Lexical.buildIndex(d, "doc_id", "text", "lexidx_kwic_spec", buckets = 16)
      val terms = Seq("table", "nosuchword")
      val got = Lexical.concordance(d, "doc_id", "text", "lexidx_kwic_spec",
        terms, width = 2, perTerm = 4).collect()
      // driver-side truth: first 4 occurrences of 'table' in
      // (doc_id, pos) order with the clamped +/-2-token window
      val occ = d.select("doc_id", "text").collect().flatMap { r =>
        val t = r.getString(1).split(" ").filter(_.nonEmpty)
        t.zipWithIndex.collect { case ("table", i) =>
          val p = i + 1 // postings are 1-based
          val lo = math.max(1, p - 2); val hi = math.min(t.length, p + 2)
          (r.getLong(0), p.toLong, t.slice(lo - 1, hi).mkString(" "))
        }
      }.sortBy(x => (x._1, x._2)).take(4)
      val gotTable = got.filter(_.getString(0) == "table")
        .sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getLong(3), r.getString(4)))
      assert(gotTable.toSeq === occ.toSeq)
      assert(got.filter(_.getString(0) == "table").map(_.getLong(1)).sorted
        === Array(1L, 2L, 3L, 4L), "ranks are 1..perTerm")
      assert(!got.exists(_.getString(0) == "nosuchword"),
        "absent terms yield no rows, not errors")
    } finally {
      Seq("postings", "doclen", "termdf", "stats").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS lexidx_kwic_spec_$s"))
    }
  }
}
