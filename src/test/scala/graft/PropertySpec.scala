package graft

import scala.util.Random

import graft.operators.{Dedup, Sessionize}

/** Randomized invariants (seeded → reproducible): the salted/banded
  * rewrites must equal their straightforward twins on arbitrary
  * inputs, not just the fixtures. Sizes stay small — each sample runs
  * Spark jobs. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("Q17 cross-multiplied predicate equals exact rational avg on random lines") {
    // 5·qty·cnt < sum_qty must select exactly the rows with
    // qty < sum/(5·cnt) under EXACT arithmetic — the integer form is
    // the decorrelated q_small_orders filter; the reference here
    // recomputes per-part sums driver-side with BigInt rationals
    val rnd = new Random(16)
    val rows = Seq.tabulate(400)(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(50).toLong + 1L, i.toLong))
    val df = rows.toDF("part", "qty", "id")
    val per = df.groupBy("part")
      .agg(org.apache.spark.sql.functions.sum("qty").as("sum_qty"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"))
    val got = df.join(per, "part")
      .filter(org.apache.spark.sql.functions.lit(5L) *
        org.apache.spark.sql.functions.col("qty") *
        org.apache.spark.sql.functions.col("cnt") <
        org.apache.spark.sql.functions.col("sum_qty"))
      .select("id").collect().map(_.getLong(0)).toSet
    val sums = rows.groupBy(_._1).map { case (p, rs) =>
      p -> (rs.map(_._2).sum, rs.length.toLong) }
    val want = rows.filter { case (p, q, _) =>
      val (s, c) = sums(p)
      BigInt(5) * q * c < BigInt(s)
    }.map(_._3).toSet
    assert(got == want, s"predicate drift: ${got.diff(want)} ${want.diff(got)}")
  }

  test("salted sessionize equals plain on random event sets") {
    val rnd = new Random(42)
    (1 to 5).foreach { round =>
      val n = 1 + rnd.nextInt(40)
      val rows = (0 until n).map { i =>
        // few users → collisions + hot keys; dense ts → boundary ties
        (rnd.nextInt(4).toLong, i.toLong, rnd.nextInt(5000).toLong,
          rnd.nextInt(100) / 10.0)
      }
      val ev = rows.toDF("user_id", "event_id", "ts", "value")
      // gap 100, bucket 700: sessions cross buckets and span empties
      val p = Sessionize.plain(ev, "user_id", 100L).collect().map(_.toSeq).toSeq
      val s = Sessionize.salted(ev, "user_id", 100L, 700L).collect().map(_.toSeq).toSeq
      assert(p == s, s"round $round diverged for rows=$rows")
    }
  }

  test("asof join equals driver-side brute force on random events") {
    import graft.operators.AsOf
    val rnd = new Random(11)
    (1 to 5).foreach { round =>
      val mkRows = (n: Int, idBase: Int) => (0 until n).map { i =>
        (rnd.nextInt(3).toLong, (idBase + i).toLong, rnd.nextInt(300).toLong,
          rnd.nextInt(50).toDouble)
      }
      val lRows = mkRows(1 + rnd.nextInt(20), 1000)
      val rRows = mkRows(1 + rnd.nextInt(20), 2000)
      val tol = if (rnd.nextBoolean()) rnd.nextInt(100).toLong else -1L
      val out = AsOf.join(
          lRows.toDF("k", "event_id", "ts", "v"),
          rRows.toDF("k", "event_id", "ts", "v"),
          Seq("k"), "ts", "ts", "event_id", Seq("event_id"), "m_", tol)
        .collect().map(r => r.getLong(1) -> Option(r.get(4)).map(_.asInstanceOf[Long]))
        .toMap
      val truth = lRows.map { case (k, id, ts, _) =>
        val cands = rRows.filter(r => r._1 == k && r._3 <= ts &&
          (tol < 0 || ts - r._3 <= tol))
        // latest rightTs, largest tie id
        id -> cands.sortBy(r => (r._3, r._2)).lastOption.map(_._2)
      }.toMap
      assert(out == truth, s"round $round (tol=$tol)")
    }
  }

  test("bucketed range join equals brute force on random intervals") {
    import graft.operators.RangeJoin
    val rnd = new Random(13)
    (1 to 5).foreach { round =>
      val pts = (0 until 1 + rnd.nextInt(15)).map { i =>
        (rnd.nextInt(3).toLong, (100 + i).toLong, rnd.nextInt(500).toLong)
      }
      val ivs = (0 until 1 + rnd.nextInt(10)).map { i =>
        val s = rnd.nextInt(500).toLong
        (rnd.nextInt(3).toLong, (900 + i).toLong, s, s + rnd.nextInt(200).toLong)
      }
      val bucket = 1L + rnd.nextInt(100)
      val got = RangeJoin.byBucket(
          pts.toDF("k", "pt_id", "ts"),
          ivs.toDF("k", "iv_id", "start_ts", "end_ts"),
          Seq("k"), "ts", "start_ts", "end_ts", bucket)
        .select("pt_id", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val truth = (for {
        (pk, pid, ts) <- pts; (ik, iid, s, e) <- ivs
        if pk == ik && ts >= s && ts <= e
      } yield (pid, iid)).sorted
      assert(got == truth, s"round $round (bucket=$bucket)")
    }
  }

  test("clusters equals union-find on random graphs") {
    val rnd = new Random(17)
    (1 to 5).foreach { round =>
      val nNodes = 2 + rnd.nextInt(30)
      val nEdges = 1 + rnd.nextInt(40)
      val edges = (0 until nEdges).map { _ =>
        val a = rnd.nextInt(nNodes).toLong
        val b = rnd.nextInt(nNodes).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val got = Dedup.clusters(edges.toDF("doc_id1", "doc_id2"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val truth = parent.keys.map(k => k -> find(k)).toMap
        assert(got == truth, s"round $round diverged for edges=$edges")
      }
    }
  }

  test("distributed shard packing equals sequential scan on random docs") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Pack
    val rnd = new Random(29)
    (1 to 5).foreach { round =>
      val n = 1 + rnd.nextInt(60)
      // sparse, shuffled ids; token counts include 0 and > budget
      val rows = rnd.shuffle((0 until n).map { i =>
        (i.toLong * (1 + rnd.nextInt(50)), rnd.nextInt(40).toLong)
      }.toList).distinctBy(_._1)
      val budget = 1L + rnd.nextInt(100)
      val buckets = 1 + rnd.nextInt(10)
      val got = Pack.assignShards(rows.toDF("id", "tok"), "id", col("tok"),
          budget, buckets)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      var acc = 0L
      val truth = rows.sortBy(_._1).map { case (id, t) =>
        val shard = acc / budget; acc += t; (id, shard)
      }.toMap
      assert(got == truth, s"round $round (budget=$budget, buckets=$buckets)")
    }
  }

  test("banded jaccard equals unbanded brute force on random docs") {
    val words = Array("alpha", "beta", "gamma", "delta", "eps")
    val rnd = new Random(7)
    (1 to 5).foreach { round =>
      val n = 2 + rnd.nextInt(14)
      val rows = (0 until n).map { i =>
        val len = 1 + rnd.nextInt(12)
        (i.toLong, Seq.fill(len)(words(rnd.nextInt(words.length))).mkString(" "))
      }
      val df = rows.toDF("doc_id", "text").withColumn("lang",
        org.apache.spark.sql.functions.lit("xx"))
      val got = Dedup.jaccardPairs(df, "doc_id", "text", Seq("lang"),
          minJaccard = 0.6, parallelBuckets = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // brute force: exact jaccard over distinct word sets, driver-side
      val sets = rows.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSet }.toMap
      val truth = (for {
        (i1, s1) <- sets.toSeq; (i2, s2) <- sets.toSeq if i1 < i2
        inter = (s1 & s2).size
        uni = (s1 | s2).size
        j = math.floor(inter.toDouble / uni * 10000 + 0.5) / 10000
        if j >= 0.6
      } yield (i1, i2, j)).toSet
      assert(got == truth,
        s"round $round: missed=${(truth -- got).take(3)} extra=${(got -- truth).take(3)}")
    }
  }

  test("containment invariants on random docs: brute equality, monotone, idempotent") {
    val words = Array("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val rnd = new Random(11)
    (1 to 5).foreach { round =>
      val n = 2 + rnd.nextInt(14)
      val rows = (0 until n).map { i =>
        val len = 1 + rnd.nextInt(12)
        (i.toLong, Seq.fill(len)(words(rnd.nextInt(words.length))).mkString(" "))
      }
      val df = rows.toDF("doc_id", "text")
      def pairsAt(num: Long, den: Long) =
        Dedup.containmentPairs(df, "doc_id", "text", num, den)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
          .toMap
      val at12 = pairsAt(1L, 2L)
      val at45 = pairsAt(4L, 5L)
      // brute force at 1/2
      val sets = rows.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSet }.toMap
      val truth = (for {
        (ia, sa) <- sets.toSeq; (ib, sb) <- sets.toSeq
        if ia != ib && sa.nonEmpty
        inter = (sa & sb).size.toLong
        if inter * 2 >= sa.size
      } yield (ia, ib) -> inter * 1000000L / sa.size).toMap
      assert(at12 == truth, s"round $round brute: " +
        s"missed=${(truth.keySet -- at12.keySet).take(3)} " +
        s"extra=${(at12.keySet -- truth.keySet).take(3)}")
      // monotone: a stricter threshold can only REMOVE pairs, and the
      // surviving pairs keep their cont_micro (the measure is
      // threshold-independent)
      assert(at45.keySet.subsetOf(at12.keySet), s"round $round monotone")
      at45.foreach { case (k, v) => assert(at12(k) == v) }
      // removal is idempotent: survivors contain no further pairs
      val kept = Dedup.removeContained(df, "doc_id", "text", 1L, 2L)
        .localCheckpoint(true)
      val again = Dedup.removeContained(kept, "doc_id", "text", 1L, 2L)
      assert(again.count() == kept.count(),
        s"round $round: removal must be a fixpoint")
    }
  }

  test("space-saving invariants on random skewed streams, random merges") {
    import graft.functions.SpaceSaving
    val rnd = new Random(7)
    (1 to 20).foreach { round =>
      val cap = 2 + rnd.nextInt(12)
      val n = 50 + rnd.nextInt(400)
      // Zipf-ish skew: item id = floor(40 / (1 + geometric-ish))
      val stream = (0 until n).map { _ =>
        s"item${(40 * math.pow(rnd.nextDouble(), 2)).toInt}"
      }
      val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      // split into 1..4 sub-streams, summarize each, merge in random order
      val parts = stream.grouped(1 + rnd.nextInt(n)).toSeq
      val summaries = parts.map { p =>
        val s = new SpaceSaving.Summary(cap)
        p.foreach(s.add(_, 1L, 0L))
        s
      }
      val merged = rnd.shuffle(summaries).reduce((a, b) => a.merge(b))
      merged.counters.foreach { case (t, (est, err)) =>
        val tru = truth(t)
        assert(est >= tru, s"round $round: $t est $est < true $tru")
        assert(est - err <= tru, s"round $round: $t est-err ${est - err} > true $tru")
      }
      // heavy-hitter containment: true count > n/cap must be present
      truth.filter(_._2 > n.toLong / cap).keys.foreach { hh =>
        assert(merged.counters.contains(hh), s"round $round: $hh missing (cap $cap)")
      }
      assert(merged.counters.size <= cap)
    }
  }

  test("salted join equals plain join on random skewed facts") {
    import graft.operators.Skew
    val rnd = new Random(7)
    (1 to 4).foreach { round =>
      val nf = 1 + rnd.nextInt(60)
      // key 0 hot (~half the rows); dim covers only some keys
      val fact = (0 until nf).map { i =>
        (if (rnd.nextBoolean()) 0L else rnd.nextInt(6).toLong, i.toLong)
      }.toDF("k", "row_id")
      val dim = (0 until 6).filter(_ => rnd.nextBoolean())
        .map(k => (k.toLong, s"v$k")).toDF("k", "attr")
      val buckets = 2 + rnd.nextInt(6)
      val s = Skew.saltedJoin(fact, dim, "k", "row_id", buckets)
        .select("k", "row_id", "attr").collect().map(_.toSeq).sortBy(_.toString)
      val p = fact.join(dim, "k")
        .select("k", "row_id", "attr").collect().map(_.toSeq).sortBy(_.toString)
      assert(s.toSeq == p.toSeq, s"round $round diverged (buckets=$buckets)")
    }
  }

  test("block dedup on duplicate-free corpora keeps everything verbatim") {
    val rnd = new Random(19)
    (1 to 3).foreach { round =>
      val n = 1 + rnd.nextInt(20)
      // globally unique tokens => no block can repeat
      val docs = (0 until n).map { i =>
        val len = 1 + rnd.nextInt(40)
        (i.toLong, (0 until len).map(j => s"u${i}_$j").mkString(" "))
      }.toDF("doc_id", "text")
      val out = Dedup.dedupBlocks(docs, "doc_id", "text", blockTokens = 16)
        .collect()
      assert(out.forall(r => r.getLong(1) == r.getLong(2)),
        s"round $round: a unique block was dropped")
      assert(out.forall(_.getDouble(3) == 1.0))
    }
  }

  test("banded hamming pairs equal brute force on random fingerprints") {
    val rnd = new Random(31)
    (1 to 4).foreach { round =>
      val n = 10 + rnd.nextInt(40)
      // clustered prints: start from a few seeds and flip a few bits,
      // so pairs actually exist at small radii
      val seeds = Array.fill(3)(rnd.nextLong())
      val fps = (0 until n).map { i =>
        var fp = seeds(rnd.nextInt(3))
        (0 until rnd.nextInt(6)).foreach(_ => fp ^= 1L << rnd.nextInt(64))
        (i.toLong, fp)
      }
      val radius = 1 + rnd.nextInt(7)
      val got = Dedup.hammingPairs(fps.toDF("id", "fp"), "id", "fp", radius)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val truth = (for {
        (i1, f1) <- fps; (i2, f2) <- fps if i1 < i2
        h = java.lang.Long.bitCount(f1 ^ f2) if h <= radius
      } yield (i1, i2, h)).toSet
      assert(got == truth, s"round $round diverged at radius=$radius")
    }
  }

  test("rrf fusion equals a driver-side reference on random ranked lists") {
    import graft.operators.Retrieval
    val rnd = new Random(67)
    (1 to 4).foreach { round =>
      val nSides = 2 + rnd.nextInt(2)
      val sides = (0 until nSides).map { _ =>
        (1 to 3).flatMap { q =>
          val docs = rnd.shuffle((1 to 30).toList).take(1 + rnd.nextInt(8))
          docs.zipWithIndex.map { case (d, r) => (q.toLong, d.toLong, r + 1) }
        }
      }
      val k = 1 + rnd.nextInt(5)
      val got = Retrieval.rrfFuse(sides.map(_.toDF("query_id", "doc_id", "rank")), k)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
      val scores = sides.flatten
        .groupBy(t => (t._1, t._2))
        .map { case ((q, d), rs) => (q, d, rs.map(t => 1000000L / (60 + t._3)).sum) }
      val truth = scores.groupBy(_._1).flatMap { case (q, rows) =>
        rows.toSeq.sortBy(t => (-t._3, t._2)).take(k).zipWithIndex
          .map { case ((_, d, s), i) => (q, i + 1, d, s) }
      }.toSet
      assert(got == truth, s"round $round diverged")
    }
  }

  test("bloom prefilter never drops a joining key on random data") {
    import graft.operators.Prune
    val rnd = new Random(23)
    (1 to 4).foreach { round =>
      val fact = (0 until 1 + rnd.nextInt(300)).map { i =>
        (rnd.nextInt(50).toLong, i.toLong) }.toDF("k", "row_id")
      val dim = (0 until 50).filter(_ => rnd.nextInt(4) == 0)
        .map(_.toLong).toDF("dk")
      val bits = 64 << rnd.nextInt(4)
      val k = 1 + rnd.nextInt(6)
      val kept = Prune.bloomSemiFilter(fact, "k", dim, "dk", bits, k)
      val exact = fact.join(dim, $"k" === $"dk", "left_semi")
      assert(exact.except(kept).count() == 0,
        s"round $round: false negative at bits=$bits k=$k")
    }
  }

  test("log-histogram quantile bounds hold on random distributions") {
    import graft.operators.Sketch
    val rnd = new Random(7)
    (1 to 3).foreach { round =>
      val n = 200 + rnd.nextInt(2000)
      // mixed regimes per sample: uniform, zipf-ish tail, constant
      val vals = (0 until n).map { _ =>
        rnd.nextInt(3) match {
          case 0 => rnd.nextInt(1000000).toLong
          case 1 => (1000000.0 / (1 + rnd.nextInt(1000))).toLong
          case _ => 42L
        }
      }
      val qs = Seq(1, 250, 500, 750, 999, 1000)
      val out = Sketch.quantiles(
          Sketch.logHistogram(vals.toDF("v"), "v"), qs)
        .collect().map(r => r.getAs[Long]("q") ->
          (r.getAs[Long]("lo"), r.getAs[Long]("hi"))).toMap
      val sorted = vals.sorted
      qs.foreach { q =>
        val rank = (q.toLong * n + 999) / 1000
        val truth = sorted((rank - 1).toInt)
        val (lo, hi) = out(q.toLong)
        assert(truth >= lo && truth <= hi,
          s"round $round q=$q: exact $truth outside [$lo, $hi] (n=$n)")
      }
    }
  }

  test("blocklist kernel equals a plain-Scala reference on random docs") {
    import graft.operators.Curate
    val rnd = new Random(19)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    (1 to 3).foreach { round =>
      val docs = (1L to 30L).map { id =>
        // random tokens, random runs of separator spaces (empty-token
        // stress), occasionally empty docs
        val n = rnd.nextInt(12)
        val text = (0 until n)
          .map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" " * (1 + rnd.nextInt(3)))
        (id, text)
      }
      val terms = (0 until 1 + rnd.nextInt(3))
        .map(_ => vocab(rnd.nextInt(vocab.size))).distinct
      val got = Curate.blocklistFlags(docs.toDF("doc_id", "text"),
          "doc_id", "text", terms)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_hits"),
            r.getAs[Long]("n_distinct_hits"))).toMap
      docs.foreach { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        val hits = toks.filter(terms.contains)
        val expect = (toks.length.toLong, hits.length.toLong,
          hits.distinct.length.toLong)
        assert(got(id) == expect,
          s"round $round doc $id '$text' terms=$terms: " +
            s"${got(id)} != $expect")
      }
    }
  }

  test("unimax water-fill invariants hold on random size tables") {
    import graft.operators.Curate
    val rnd = new Random(7)
    (1 to 5).foreach { round =>
      val l = 2 + rnd.nextInt(6)
      val sizes = (0 until l).map(i => (s"g$i", 1L + rnd.nextInt(1000)))
      val e = 1L + rnd.nextInt(3)
      val (bn, bd) = (1L + rnd.nextInt(4), 1L + rnd.nextInt(2))
      val tot = sizes.map(_._2).sum
      val bud = tot * bn / bd
      val got = Curate.unimaxAlloc(sizes.toDF("g", "t_tok"), "g", e, bn, bd)
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("t_tok"), r.getAs[Long]("cap"), r.getAs[Long]("alloc")))
        .toMap
      val caps = got.values.map(_._2).sum
      got.foreach { case (g, (t, cap, alloc)) =>
        assert(cap == t * e, s"round $round $g cap")
        assert(alloc >= 0 && alloc <= cap,
          s"round $round $g: alloc $alloc outside [0, $cap] ($sizes e=$e bud=$bud)")
      }
      val allocSum = got.values.map(_._3).sum
      assert(allocSum <= bud,
        s"round $round overspent: $allocSum > $bud ($sizes)")
      if (bud >= caps)
        assert(allocSum == caps, s"round $round: ample budget must cap everyone")
      else
        // water-filling leaves at most (uncapped-count - 1) tokens of
        // floor-division slack unspent
        assert(bud - allocSum < l.toLong,
          s"round $round underspent beyond rounding: $allocSum vs $bud ($sizes)")
    }
  }

  test("sweep running sum equals a single global window on random deltas") {
    import graft.operators.Sweep
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new Random(23)
    (1 to 4).foreach { round =>
      val n = 5 + rnd.nextInt(60)
      val rows = (0 until n).map(_ =>
        (rnd.nextInt(500).toLong, if (rnd.nextBoolean()) 1L else -1L))
      val df = rows.toDF("ts", "delta")
      val dist = Sweep.runningSum(df, "ts", "delta", 1L + rnd.nextInt(100))
      val w = Window.orderBy(col("ts"), col("delta").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ref = df.withColumn("running", sum("delta").over(w))
      def key(d: org.apache.spark.sql.DataFrame) = d
        .groupBy("ts", "delta")
        .agg(sort_array(collect_list("running")).as("rs"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Long](2))
        .toMap
      assert(key(dist) == key(ref), s"round $round diverged for $rows")
    }
  }

  test("fused kernels equal their unfused forms on random inputs (pure JVM)") {
    // kernel-level (no Spark jobs): the r13 fused kernels vs the
    // expression chains they replaced, over adversarial random inputs
    // incl. empty arrays, single tokens, duplicates, unicode
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.Kernels
    val rnd = new Random(77)
    val vocab = Array("a", "bb", "ccc", "道", "x1", "", "zz", "🙂")
    (1 to 50).foreach { round =>
      val n = rnd.nextInt(30)
      val toks = new GenericArrayData(
        Array.fill[AnyRef](n)(UTF8String.fromString(
          vocab(rnd.nextInt(vocab.length)))))
      val (k, bands) = (64, 8)
      // band hashes == xxhash64 chain over sig slices
      val sig = Kernels.minhashSig(toks, k).toLongArray()
      val fused = Kernels.minhashBandHashes(toks, k, bands).toLongArray()
      val expect = (0 until bands).map { b =>
        var h = 42L
        (0 until k / bands).foreach(i => h = XXH64.hashLong(sig(b * 8 + i), h))
        h
      }
      assert(fused.toSeq == expect, s"round $round band hashes diverged")
      // minhash over a multiset equals minhash over the set (the
      // array_distinct elision's correctness argument)
      val distinct = new GenericArrayData(
        toks.toObjectArray(org.apache.spark.sql.types.StringType).distinct)
      assert(Kernels.minhashSig(distinct, k).toLongArray().toSeq == sig.toSeq,
        s"round $round dup-insensitivity broke")
      // JL projection == quantize + per-row dots
      val dim = 16
      val vec = new GenericArrayData(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
      val jl = Kernels.jlProjectQ16(vec, isFloat = false, dim, 4).toDoubleArray()
      val vq = Kernels.quantizeQ16(vec, isFloat = false)
      val mat = Kernels.jlSigns(dim, 4)
      val jlExpect = mat.map(row => Kernels.dot(vq, new GenericArrayData(row)))
      assert(jl.toSeq == jlExpect.toSeq, s"round $round JL diverged")
      // fused assign+dist == (nearestCentroidL2, its distance)
      val cents = new GenericArrayData(Array.tabulate[AnyRef](4)(_ =>
        new GenericArrayData(Array.fill(dim)(
          math.floor(rnd.nextDouble() * 100)))))
      val ad = Kernels.nearestCentroidDistL2(vq, cents).toDoubleArray()
      val cl = Kernels.nearestCentroidL2(vq, cents)
      assert(ad(0) == cl.toDouble, s"round $round cluster diverged")
      val c = cents.getArray(cl).toDoubleArray()
      val vqd = vq.toDoubleArray()
      val d2 = vqd.indices.map(j => (vqd(j) - c(j)) * (vqd(j) - c(j))).sum
      assert(ad(1) == d2, s"round $round distance diverged")
    }
  }
}
