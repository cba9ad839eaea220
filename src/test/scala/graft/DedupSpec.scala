package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en"),
    (2L, "the quick brown fox jumps over the lazy cat", "en"), // near-dup of 1
    (3L, "the quick brown fox jumps over the lazy dog", "en"), // exact dup of 1
    (4L, "completely different content about spark engines", "en"),
    (5L, "der schnelle braune fuchs springt", "de"))
    .toDF("doc_id", "text", "lang")

  test("exact dedup groups identical content, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
    assert(out.length == 4) // 1&3 merged
    val dup = out.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("jaccard pairs finds near-dups within blocks only") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", Seq("lang"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 5L || b == 5L }) // de block alone
  }

  test("minhash-LSH recovers the exact-jaccard pair set on real data") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val exact = Dedup.jaccardPairs(d, "doc_id", "text", Seq("lang"), 0.9)
      .select("doc_id1", "doc_id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashPairs(d, "doc_id", "text", k = 64, bands = 8,
        minJaccard = 0.9)
      .select("doc_id1", "doc_id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // minhash is unblocked so it may find extra (cross-lang) true pairs;
    // within-block recall must be high and all pairs are exact-verified.
    val recall = (exact & mh).size.toDouble / exact.size
    assert(recall >= 0.95, s"minhash recall $recall too low")
  }

  test("prefix-filter pairs equal unblocked exact all-pairs (no false negatives)") {
    import org.apache.spark.sql.functions.{array_distinct, col, size => fsize}
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    // ground truth: brute-force exact jaccard >= 4/5 over ALL pairs
    // (no blocking, no prefix) — integer cross-multiplied like the op
    val sets = d.select(col("doc_id"),
        array_distinct(graft.functions.tokenize_ws(col("text"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val truth = (for {
      (i, si) <- sets; (j, sj) <- sets if i < j
      inter = (si & sj).size
      uni = si.size + sj.size - inter
      if uni > 0 && inter * 5 >= uni * 4
    } yield (i, j)).toSet
    val got = Dedup.prefixJaccardPairs(d, "doc_id", "text", 4L, 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the theorem: EXACT equality — prefix filtering loses nothing and
    // the verify step admits nothing below threshold
    assert(got == truth,
      s"prefix join must equal brute force: missing ${(truth -- got).take(5)}, " +
        s"extra ${(got -- truth).take(5)}")
    assert(truth.nonEmpty, "vacuous corpus: no pairs at 4/5")
  }

  test("simhash finds exact dup at hamming 0") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)))
  }

  test("simhash banding is complete at a wide radius (hamming <= 7)") {
    import org.apache.spark.sql.functions._
    import graft.functions._
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    // brute-force truth over all pairs, driver-side (spec-scale corpus)
    val fps = d.select(col("doc_id"), simhash64(tokenize_ws(col("text"))))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val truth = (for {
      (i1, f1) <- fps; (i2, f2) <- fps if i1 < i2
      if java.lang.Long.bitCount(f1 ^ f2) <= 7
    } yield (i1, i2)).toSet
    val banded = Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    assert(banded == truth,
      s"missed=${(truth -- banded).take(5)} extra=${(banded -- truth).take(5)}")
  }

  test("minhashAgainst recovers cross-set near-dups with high recall") {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val inc = d.filter(col("doc_id") % 5 === 0)
    val ex = d.filter(col("doc_id") % 5 =!= 0)
    // exact asymmetric truth, driver-side (spec-scale corpus)
    def sets(df: org.apache.spark.sql.DataFrame) = df.select("doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty).toSet)
    val truth = (for {
      (i1, s1) <- sets(inc); (i2, s2) <- sets(ex)
      j = (s1 & s2).size.toDouble / (s1 | s2).size
      if j >= 0.9
    } yield (i1, i2)).toSet
    val got = Dedup.minhashAgainst(inc, ex, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    val recall = (truth & got).size.toDouble / truth.size
    assert(recall >= 0.95, s"cross-set recall $recall too low")
    // and everything returned is a verified near-dup (no false accepts
    // beyond the 4-decimal rounding at the 0.9 boundary)
    assert(got.forall { case (i1, i2) => truth.contains((i1, i2)) ||
      { val s1 = sets(inc).toMap.apply(i1); val s2 = sets(ex).toMap.apply(i2)
        (s1 & s2).size.toDouble / (s1 | s2).size >= 0.8999 } })
  }

  test("persisted signature table probe equals direct minhashAgainst") {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val inc = d.filter(col("doc_id") % 5 === 0)
    val ex = d.filter(col("doc_id") % 5 =!= 0)
    try {
      Dedup.buildSignatureTable(ex, "doc_id", "text", "sigtab")
      val direct = Dedup.minhashAgainst(inc, ex, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val viaTable = Dedup.minhashAgainstTable(inc, "doc_id", "text", "sigtab")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(direct.nonEmpty && viaTable == direct)
    } finally spark.sql("DROP TABLE IF EXISTS sigtab")
  }

  test("clusters computes connected components (multi-hop chains)") {
    // 1-2-3-4-5 is a path: min-label needs several propagation rounds;
    // {10,11} and {20,21,22} (a triangle via 20-21, 21-22, 22-20)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
        (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("doc_id1", "doc_id2")
    val got = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("incremental clusters: chained appends equal from-scratch rebuild") {
    // the path 1-2-...-8 arrives in three slices; each advance must
    // reproduce the rebuild fixpoint exactly, including the cross-
    // slice merges (slice 3 fuses the {1..4} and {5..8} components
    // and re-labels the whole right half to 1)
    val s1 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_id1", "doc_id2")
    val s2 = Seq((5L, 6L), (6L, 7L), (7L, 8L)).toDF("doc_id1", "doc_id2")
    val s3 = Seq((4L, 5L), (11L, 12L)).toDF("doc_id1", "doc_id2")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val l1 = Dedup.clusters(s1)
    val l2 = Dedup.clustersIncremental(s2, l1)
    assert(m(l2) == m(Dedup.clusters(s1.union(s2))),
      "append of a disjoint component must equal rebuild")
    val l3 = Dedup.clustersIncremental(s3, l2)
    assert(m(l3) == m(Dedup.clusters(s1.union(s2).union(s3))),
      "append that MERGES prior components must equal rebuild")
    // empty delta: the prior fixpoint is already stable
    val l4 = Dedup.clustersIncremental(s3.limit(0), l3)
    assert(m(l4) == m(l3), "empty delta must be a fixpoint no-op")
  }

  test("clusters equals driver-side union-find on real pair data") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = Dedup.jaccardPairs(d, "doc_id", "text", Seq("lang"), 0.9)
    val edges = pairs.select("doc_id1", "doc_id2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // independent truth: union-find over the same edges
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
    val got = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(truth.nonEmpty && got == truth)
  }

  test("clusters refuses to return mid-propagation labels at the iter cap") {
    // a 6-node path needs more than 1 propagation round; maxIter=1
    // must throw, not return a silently split component
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("doc_id1", "doc_id2")
    val e = intercept[IllegalStateException] {
      Dedup.clusters(chain, maxIter = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("clustered removal keeps exactly one survivor per component") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_id1", "doc_id2")
    val kept = Dedup.removeNearDupsClustered(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // component {1,2,3} -> survivor 1; 4 and 5 untouched
    assert(kept == Set(1L, 4L, 5L))
  }

  test("decontamination flags asymmetric overlap and removal drops it") {
    import graft.operators.Decontaminate
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally unrelated words here nothing shared at all"))
      .toDF("doc_id", "text")
    val ev = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa plus extra eval material"))
      .toDF("doc_id", "text")
    val flagged = Decontaminate.contaminated(train, ev, "doc_id", "text",
        shingleN = 3, minMatched = 5).collect()
    // doc 1 quotes the eval text: all 6 of its 3-gram shingles match
    assert(flagged.map(_.getLong(0)).toSet == Set(1L))
    assert(flagged.head.getAs[Long]("n_matched") == 6L)
    val kept = Decontaminate.removeContaminated(train, ev, "doc_id", "text",
        shingleN = 3, minMatched = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
  }

  test("multi-suite decontamination attributes each hit to its suite") {
    import graft.operators.Decontaminate
    val quoteA = "alpha beta gamma delta epsilon zeta eta theta"
    val quoteB = "one two three four five six seven eight"
    val train = Seq(
      (1L, quoteA),                      // quotes suite A only
      (2L, quoteB),                      // quotes suite B only
      (3L, quoteA + " " + quoteB),       // quotes BOTH -> two rows
      (4L, "totally unrelated words here nothing shared at all"))
      .toDF("doc_id", "text")
    val evals = Seq(
      ("sa", quoteA + " iota kappa plus extra eval material"),
      ("sb", quoteB + " nine ten and some more eval material"))
      .toDF("suite", "text")
    val hits = Decontaminate.contaminatedBySuite(train, evals,
        "doc_id", "text", "suite", shingleN = 3, minMatched = 5)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("suite")))
      .toSet
    assert(hits == Set((1L, "sa"), (2L, "sb"), (3L, "sa"), (3L, "sb")),
      s"got $hits")
  }

  test("semantic decontamination flags paraphrase-level vector matches") {
    import graft.operators.Decontaminate
    val train = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),   // same direction as eval 100
      (2L, Array(0.9f, 0.1f, 0.0f)),   // cos ~ 0.994 to eval 100
      (3L, Array(0.0f, 0.0f, 1.0f)))   // orthogonal to both evals
      .toDF("vec_id", "embedding")
    val ev = Seq(
      (100L, Array(2.0f, 0.0f, 0.0f)),
      (200L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val flagged = Decontaminate.semanticContaminated(train, ev,
        "vec_id", "embedding", minCosine = 0.9).collect()
    assert(flagged.map(_.getAs[Long]("id")).toSet == Set(1L, 2L))
    // best match reported: both hit eval 100, doc 1 at sim exactly 1
    val m = flagged.map(r => r.getAs[Long]("id") ->
      (r.getAs[Long]("eval_id"), r.getAs[Double]("sim"))).toMap
    assert(m(1L) == (100L, 1.0))
    assert(m(2L)._1 == 100L && m(2L)._2 > 0.99 && m(2L)._2 < 1.0)
    val kept = Decontaminate.removeSemanticContaminated(train, ev,
        "vec_id", "embedding", minCosine = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L))
  }

  test("embedding LSH pairs are verified by exact cosine") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val out = Dedup.embeddingPairs(e, "vec_id", "embedding",
      bands = 8, bitsPerBand = 4, minCosine = 0.4).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Double]("cos") >= 0.4))
  }

  test("semantic dedup: pairs exact-verified, recall vs all-pairs gated") {
    import graft.functions._
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val sem = Dedup.semanticPairs(e, "vec_id", "embedding",
      nClusters = 8, minCosine = 0.4, iters = 2, trainFraction = 1.0)
      .collect()
    assert(sem.nonEmpty)
    // precision is exact by construction: every emitted pair carries a
    // verified cosine >= threshold
    assert(sem.forall(_.getAs[Double]("cos") >= 0.4))
    // recall vs brute-force all-pairs truth (spec-scale corpus):
    // clustering may split true pairs across cells; the quantizer must
    // still catch most of them
    val v = e.select(col("vec_id").as("id"),
      as_double_array(col("embedding")).as("vec"))
    val truth = v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .withColumn("cos", round_portable(cosine_sim(col("a.vec"), col("b.vec")), 4))
      .filter(col("cos") >= 0.4)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = sem.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.subsetOf(truth), "semantic pairs must be true pairs")
    val recall = (truth & found).size.toDouble / truth.size
    assert(recall >= 0.5, s"semantic-dedup recall $recall too low")
    // oracle-exact (quantized) variant: same precision/recall contract
    val semQ = Dedup.semanticPairsQuantized(e, "vec_id", "embedding",
      nClusters = 8, minCosine = 0.4, iters = 2, trainFraction = 1.0)
      .collect()
    assert(semQ.forall(_.getAs[Double]("cos") >= 0.4))
    val foundQ = semQ.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(foundQ.subsetOf(truth), "quantized semantic pairs must be true pairs")
    val recallQ = (truth & foundQ).size.toDouble / truth.size
    assert(recallQ >= 0.5, s"quantized semantic-dedup recall $recallQ too low")
  }

  test("semantic removal drops exactly the larger ids of semantic pairs") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val pairs = Dedup.semanticPairs(e, "vec_id", "embedding",
      nClusters = 8, minCosine = 0.4, iters = 2, trainFraction = 1.0)
      .collect().map(_.getLong(1)).toSet
    val kept = Dedup.semanticRemove(e, "vec_id", "embedding",
      nClusters = 8, minCosine = 0.4, iters = 2, trainFraction = 1.0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val all = e.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == all -- pairs)
  }

  test("block dedup drops repeated blocks, keeps first occurrence, reassembles") {
    import spark.implicits._
    val block1 = (1 to 16).map(i => s"a$i").mkString(" ")
    val block2 = (1 to 16).map(i => s"b$i").mkString(" ")
    val tail = (1 to 5).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"$block1 $block2"),   // both blocks first-seen: all kept
      (2L, s"$block1 $tail"),     // block1 repeated, short tail unique
      (3L, s"$block1 $block2")    // exact copy of doc 1: fully deduped
    ).toDF("doc_id", "text")
    val out = Dedup.dedupBlocks(docs, "doc_id", "text", blockTokens = 16)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 2L, 2L), (2L, 2L, 1L), (3L, 2L, 0L)))
    // doc 2 reassembles to just its unique tail block
    val md5Tail = java.security.MessageDigest.getInstance("MD5")
      .digest(tail.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1).getString(4) === md5Tail)
    // fully-deduped doc fingerprints the empty string
    val md5Empty = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.emptyByteArray).map("%02x".format(_)).mkString
    assert(out(2).getString(4) === md5Empty)
  }

  test("block dedup is invariant to input partitioning") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = Dedup.dedupBlocks(d, "doc_id", "text").orderBy("doc_id").collect()
    val b = Dedup.dedupBlocks(d.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  private def md5Hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("span dedup removes duplicated spans at any alignment, first occurrence survives") {
    import spark.implicits._
    val common = (1 to 10).map(i => s"x$i").mkString(" ") // 10-token shared span
    val docs = Seq(
      (1L, s"u1 u2 $common u3"),   // span at offset 2 — first occurrence, kept whole
      (2L, s"v1 v2 v3 $common"),   // same span at offset 3: alignment differs, still caught
      (3L, s"u1 u2 $common u3")    // exact copy of doc 1: fully removed
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSpans(docs, "doc_id", "text", spanTokens = 8)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 13L, 0L), (2L, 13L, 10L), (3L, 13L, 13L)))
    // doc 2's three overlapping dup grams merge into ONE maximal [3,13) interval
    assert(out(1).getString(4) === md5Hex("v1 v2 v3"))
    assert(out(2).getString(4) === md5Hex(""))
  }

  test("span dedup handles within-doc repeats and short-doc passthrough") {
    import spark.implicits._
    val g = (1 to 8).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (1L, s"$g y $g"),      // same 8-gram twice in one doc: second removed
      (2L, "a b c")          // shorter than spanTokens: passes through whole
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSpans(docs, "doc_id", "text", spanTokens = 8)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 17L, 8L), (2L, 3L, 0L)))
    assert(out(0).getString(4) === md5Hex(s"$g y"))
    assert(out(1).getString(4) === md5Hex("a b c"))
  }

  test("lsh auto-tuner: recall floor holds, anchors match, bands shrink as threshold rises") {
    // every returned split divides k and clears the recall floor at t
    for (k <- Seq(16, 32, 64, 128); t <- Seq(0.3, 0.5, 0.7, 0.8, 0.9)) {
      val (b, r) = Dedup.lshParams(k, t)
      assert(b * r == k)
      val pAtT = 1.0 - math.pow(1.0 - math.pow(t, r.toDouble), b.toDouble)
      assert(pAtT >= 0.95, s"k=$k t=$t chose ($b,$r) with P(t)=$pAtT")
    }
    // anchor: the hand-tuned production banding for jac>=0.9 at k=64
    assert(Dedup.lshParams(64, 0.9) === ((8, 8)))
    // sharper thresholds get fewer, longer bands (tighter buckets)
    val bands = Seq(0.3, 0.5, 0.7, 0.9).map(t => Dedup.lshParams(64, t)._1)
    assert(bands === bands.sorted.reverse)
  }

  test("auto-tuned minhash recovers the exact-jaccard pair set") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val exact = Dedup.jaccardPairs(d, "doc_id", "text", Seq("lang"), 0.9)
      .select("doc_id1", "doc_id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = Dedup.minhashPairsAuto(d, "doc_id", "text", k = 64, minJaccard = 0.9)
      .select("doc_id1", "doc_id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // auto is unblocked so it may find extra (cross-lang) true pairs;
    // within-block recall must match the hand-tuned banding's bar
    val recall = (exact & auto).size.toDouble / exact.size
    assert(recall >= 0.95, s"auto-tuned minhash recall $recall too low")
  }

  test("span dedup is invariant to input partitioning") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = Dedup.dedupSpans(d, "doc_id", "text").orderBy("doc_id").collect()
    val b = Dedup.dedupSpans(d.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("min-k%: duplicated doc outscores a novel-tail doc; invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Decontaminate
    val base = "the quick brown fox jumps over the lazy dog near the river"
    // A duplicates B verbatim (every bigram seen >= 2x under the corpus
    // LM — no low-probability tail); C's tail tokens are unique but sit
    // in the SHARED "the _" context, so its p(cur|prev) genuinely tanks
    // (a unique prev would score p=1 under a conditional LM — novelty
    // only reads as low-probability inside a known context)
    val docs = Seq(
      (1L, base), (2L, base),
      (3L, "the quick brown fox jumps over the qq7 and the zz9 then the xx3"),
      (4L, "the lazy dog near the river jumps over the quick brown fox"))
      .toDF("doc_id", "text")
    // per-bigram quantized probs under the tiny corpus's own LM — the
    // same scaffold the query uses (package-private, so rebuild inline)
    val toks = docs.select(col("doc_id"),
      graft.functions.tokenize_ws(col("text")).as("t"))
    val pairs = toks.select(col("doc_id"),
        explode(expr("transform(sequence(1, size(t) - 1), " +
          "i -> struct(element_at(t, i) AS prev, element_at(t, i+1) AS cur))"))
          .as("bg"))
      .select(col("doc_id"), col("bg.prev"), col("bg.cur"))
    val bc = pairs.groupBy("prev", "cur").agg(count(lit(1)).as("cpc"))
    val pc = pairs.groupBy("prev").agg(count(lit(1)).as("cp"))
    val scored = pairs.join(bc, Seq("prev", "cur")).join(pc, Seq("prev"))
      .withColumn("q",
        floor(col("cpc").cast("double") / col("cp") * 1e8 + 0.5).cast("long"))
      .select("doc_id", "q")
    def mink(df: org.apache.spark.sql.DataFrame) =
      Decontaminate.minkScores(df, "doc_id", "q", kNum = 1, kDen = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val m = mink(scored)
    assert(m(1L) > m(3L),
      s"duplicate tail ${m(1L)} must outscore novel tail ${m(3L)}")
    assert(m(1L) == m(2L), "verbatim twins must score identically")
    assert(mink(scored.repartition(7)) == m,
      "min-k scores changed under repartitioning")
    // k honors the ceiling: a 5-bigram doc keeps exactly 1
    val k1 = Decontaminate.minkScores(
        Seq((9L, 10L), (9L, 20L), (9L, 30L), (9L, 40L), (9L, 50L))
          .toDF("doc_id", "q"), "doc_id", "q")
      .collect().head
    assert(k1.getAs[Long]("k") == 1L && k1.getAs[Long]("mink_q") == 10L)
  }

  test("incremental pair graph equals from-scratch rebuild, pairs and clusters") {
    val docs = table("documents").localCheckpoint(true)
    val corpus = docs.filter($"doc_id" < 400)
    val batch = docs.filter($"doc_id" >= 400)
    Dedup.buildPairTable(corpus, "doc_id", "text", Seq("lang"),
      "inc_pairs", minJaccard = 0.9, parallelBuckets = 4)
    Dedup.appendToPairTable(batch, "doc_id", "text", Seq("lang"),
      "inc_pairs", minJaccard = 0.9, parallelBuckets = 4)
    Dedup.buildPairTable(docs, "doc_id", "text", Seq("lang"),
      "inc_pairs_ref", minJaccard = 0.9, parallelBuckets = 4)
    def pairSet(t: String) = spark.table(t)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toSet
    val inc = pairSet("inc_pairs")
    val ref = pairSet("inc_pairs_ref")
    assert(inc == ref,
      s"incremental graph must be EXACT: missing ${ref -- inc take 3}, " +
        s"extra ${inc -- ref take 3}")
    assert(inc.exists { case (a, b, _) => a < 400 && b >= 400 },
      "the planted corpus really has cross-boundary near-dups")
    // and the graph consumers agree
    val ci = Dedup.clusters(spark.table("inc_pairs"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cr = Dedup.clusters(spark.table("inc_pairs_ref"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ci == cr)
  }

  test("pair-table erasure equals rebuild-from-survivors; append stays clean") {
    import spark.implicits._
    val docs = table("documents").localCheckpoint(true)
    val erased = docs.filter($"doc_id" % 5 === 0).select("doc_id")
    val survivors = docs.filter($"doc_id" % 5 =!= 0)
    try {
      Dedup.buildPairTable(docs.filter($"doc_id" < 450), "doc_id", "text",
        Seq("lang"), "erz_pairs", minJaccard = 0.9, parallelBuckets = 4)
      Dedup.removeFromPairTable(spark, "erz_pairs", erased, "doc_id")
      Dedup.buildPairTable(
        docs.filter($"doc_id" < 450 && $"doc_id" % 5 =!= 0), "doc_id",
        "text", Seq("lang"), "erz_pairs_ref", minJaccard = 0.9,
        parallelBuckets = 4)
      def pairSet(t: String) = spark.table(t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pairSet("erz_pairs") == pairSet("erz_pairs_ref"),
        "post-erasure pairs must equal a survivors-only rebuild")
      // the sidecar forgot the content too (no erased token sets left)
      assert(spark.table("erz_pairs_toks")
        .join(erased.select($"doc_id".as("id")), Seq("id"), "left_semi")
        .limit(1).count() == 0L)
      // a later append cannot resurrect relations to erased docs
      Dedup.appendToPairTable(docs.filter($"doc_id" >= 450 && $"doc_id" % 5 =!= 0),
        "doc_id", "text", Seq("lang"), "erz_pairs", minJaccard = 0.9,
        parallelBuckets = 4)
      val erasedIds = erased.collect().map(_.getLong(0)).toSet
      assert(pairSet("erz_pairs").forall { case (a, b, _) =>
        !erasedIds.contains(a) && !erasedIds.contains(b) },
        "append resurrected an erased id")
    } finally {
      Seq("erz_pairs", "erz_pairs_ref").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        spark.sql(s"DROP TABLE IF EXISTS ${t}_toks")
      }
    }
  }

  test("grouped pair graph: per-tenant build+append equals rebuild, partition-drop erasure") {
    val docs = table("documents").localCheckpoint(true)
    val corpus = docs.filter($"doc_id" < 400)
    val batch = docs.filter($"doc_id" >= 400)
    try {
      Dedup.buildGroupedPairTable(corpus, "doc_id", "text", "lang",
        "ginc_pairs", minJaccard = 0.9, parallelBuckets = 4)
      Dedup.appendToGroupedPairTable(batch, "doc_id", "text", "lang",
        "ginc_pairs", minJaccard = 0.9, parallelBuckets = 4)
      Dedup.buildGroupedPairTable(docs, "doc_id", "text", "lang",
        "ginc_pairs_ref", minJaccard = 0.9, parallelBuckets = 4)
      def pairSet(t: String) = spark.table(t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getAs[String]("lang"))).toSet
      val inc = pairSet("ginc_pairs")
      val ref = pairSet("ginc_pairs_ref")
      assert(inc == ref, s"grouped incremental graph must be EXACT: " +
        s"missing ${ref -- inc take 3}, extra ${inc -- ref take 3}")
      // the persisted tenant column is the docs' true lang of BOTH ids
      val langOf = docs.select("doc_id", "lang").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      inc.foreach { case (a, b, _, g) =>
        assert(langOf(a) == g && langOf(b) == g,
          s"pair ($a,$b) carries tenant $g but docs are " +
            s"${langOf(a)}/${langOf(b)}")
      }
      // per-tenant read prunes to one partition and matches a filter
      val en = Dedup.tenantPairs(spark, "ginc_pairs", "lang", "en")
      val enPlan = en.queryExecution.executedPlan.toString
      assert(!enPlan.contains("Filter ("),
        s"tenant read should partition-prune, not filter:\n$enPlan")
      val enSet = en.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(enSet == inc.filter(_._4 == "en").map(t => (t._1, t._2)))
      // erasure: dropping one tenant leaves every other tenant's graph
      // bit-identical and removes the tenant from BOTH tables
      Dedup.removeTenantPairs(spark, "ginc_pairs", "lang", "en")
      val after = pairSet("ginc_pairs")
      assert(after == inc.filterNot(_._4 == "en"), "non-erased tenants changed")
      assert(spark.table("ginc_pairs_toks")
        .filter($"lang" === "en").limit(1).count() == 0L,
        "sidecar still holds the erased tenant")
      // a post-erasure append still works for surviving tenants
      assert(spark.table("ginc_pairs_toks").limit(1).count() > 0L)
    } finally {
      Seq("ginc_pairs", "ginc_pairs_ref").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        spark.sql(s"DROP TABLE IF EXISTS ${t}_toks")
      }
    }
  }

  test("triangle stats: cliques score 1000, chains 0, hubs in between") {
    // 4-clique {1,2,3,4}: every node deg 3, 3 triangles, coeff 1000.
    // path 10-11-12: middle node deg 2, no triangle, coeff 0.
    // hub 20 with spokes 21,22,23 and ONE closed spoke pair (21,22):
    // hub deg 3, 1 triangle -> 2000/6 = 333.
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (11L, 12L),
      (20L, 21L), (20L, 22L), (20L, 23L), (21L, 22L))
      .toDF("doc_id1", "doc_id2")
    val got = Dedup.triangleStats(pairs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for (n <- Seq(1L, 2L, 3L, 4L))
      assert(got(n) == (3L, 3L, 1000L), s"clique node $n: ${got(n)}")
    assert(got(11L) == (2L, 0L, 0L), "chain middle has no triangle")
    assert(got(10L) == (1L, 0L, 0L), "leaf: deg 1, coefficient 0")
    assert(got(20L) == (3L, 1L, 333L), "hub with one closed pair")
    assert(got(21L) == (2L, 1L, 1000L))
    assert(got(23L) == (1L, 0L, 0L))
    // triangle mass: 4-clique has 4 triangle-corners*3 = C(4,3)*3 = 12,
    // hub adds 3 -> total corner count 15
    assert(got.values.map(_._2).sum == 15L)
  }

  test("k-core: cascading peel keeps the clique, drops tails, converges in budget") {
    // 5-clique {1..5} with a pendant chain 5-10-11-12 and a star
    // 20-(21,22,23): at k=3 the chain peels CASCADING (12 then 11 then
    // 10 — three rounds, exercising the fixpoint loop), the star dies
    // in one round, and exactly the clique survives with core degree 4.
    val pairs = (
      (for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)) ++
        Seq((5L, 10L), (10L, 11L), (11L, 12L),
          (20L, 21L), (20L, 22L), (20L, 23L))
    ).toDF("doc_id1", "doc_id2")
    val core3 = Dedup.kCore(pairs, 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core3 == (1L to 5L).map(_ -> 4L).toMap,
      s"3-core must be exactly the 5-clique at degree 4: $core3")
    // k=2: the chain is still pendant (not a cycle) so it peels too;
    // the star's spokes are degree 1 so only the clique remains
    val core2 = Dedup.kCore(pairs, 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core2 == (1L to 5L).map(_ -> 4L).toMap)
    // k above the max degree: empty core, no exception
    assert(Dedup.kCore(pairs, 9L).isEmpty)
    // the gate corpus converges well inside the oracle's 8 unrolled
    // rounds — run the real graph with maxIter = 8 (throws if not)
    val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
    val realPairs = Dedup.jaccardPairs(docsDf, "doc_id", "text",
      Seq("lang"), 0.9, parallelBuckets = 8)
    val real = Dedup.kCore(realPairs, 3L, maxIter = 8)
    assert(real.count() > 0, "sf0.001+ dup graph should have a 3-core")
  }

  test("containment pairs catch quote-inclusion that Jaccard misses") {
    // A's 10 tokens all appear inside B's 50 -> C(A->B) = 1.0 but
    // Jaccard = 10/50 = 0.2: the symmetric detector is blind, the
    // asymmetric one flags exactly the one direction
    val small = (1 to 10).map(i => s"w$i").mkString(" ")
    val big = ((1 to 10).map(i => s"w$i") ++
      (1 to 40).map(i => s"z$i")).mkString(" ")
    // boundary doc: exactly 9 of A's 10 tokens -> C = 0.9 (flagged at
    // 9/10); and an 8-of-10 doc that must NOT flag
    val nine = ((1 to 9).map(i => s"w$i") :+ "q1").mkString(" ")
    val eight = ((1 to 8).map(i => s"w$i") ++ Seq("q2", "q3")).mkString(" ")
    val docs = Seq((1L, small), (2L, big), (3L, nine), (4L, eight))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", 9L, 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.contains((1L, 2L)) && got((1L, 2L)) == 1000000L,
      s"full inclusion must flag at 1.0: $got")
    assert(!got.contains((2L, 1L)), "containment is directional")
    assert(got.get((3L, 1L)).contains(900000L) &&
      got.get((1L, 3L)).contains(900000L),
      s"9-of-10 overlap flags both directions at the boundary: $got")
    assert(!got.exists(p => p._1._1 == 4L || p._1._2 == 4L),
      s"8-of-10 is under threshold: $got")
    // the symmetric detector really is blind to (1,2)
    val jac = Dedup.prefixJaccardPairs(docs, "doc_id", "text", 9L, 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)), "jaccard 0.2 must not pair 1-2")
    // exact dups contain each other: both directions emitted
    val dup = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val both = Dedup.containmentPairs(dup, "doc_id", "text", 9L, 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(both == Map((1L, 2L) -> 1000000L, (2L, 1L) -> 1000000L))
  }

  test("sampled dup rate measures the planted rate; zero after clustered removal") {
    // full sample ("zz" > any hex prefix): 2 of 8 docs have a partner
    val docs = Seq(
      (1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"),
      (3L, "k1 k2 k3"), (4L, "k4 k5 k6"), (5L, "k7 k8 k9"),
      (6L, "m1 m2 m3"), (7L, "m4 m5 m6"), (8L, "m7 m8 m9"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val r = Dedup.sampledDupRate(docs, "doc_id", "text", Seq("lang"),
      9L, 10L, sampleHexLt = "zz").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((8L, 2L, 250000L)),
      s"planted rate: $r")
    // after clustered removal under the same blocking, the residual
    // rate is zero BY THEOREM (survivors carry no within-block pair)
    val deduped = Dedup.removeNearDupsClustered(docs, "doc_id",
      Dedup.jaccardPairs(docs, "doc_id", "text", Seq("lang"), 0.9))
    val r2 = Dedup.sampledDupRate(deduped, "doc_id", "text", Seq("lang"),
      9L, 10L, sampleHexLt = "zz").head()
    assert(r2.getLong(1) == 0L && r2.getLong(2) == 0L,
      s"post-dedup residual must be zero: $r2")
    // real corpus, full sample: the raw near-dup rate is materially
    // nonzero (the corpus plants dup clusters) and bounded
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val real = Dedup.sampledDupRate(d, "doc_id", "text", Seq("lang"),
      9L, 10L, sampleHexLt = "zz").head()
    assert(real.getLong(1) > 0 && real.getLong(2) <= 1000000L,
      s"raw corpus rate: $real")
  }

  test("grouped containment isolates tenants, equals per-group solo runs") {
    // tenant A holds a quote-inclusion pair; tenant B holds a doc
    // contained in tenant A's container — cross-tenant, must NOT pair
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5", "A"),
      (2L, "w1 w2 w3 w4 w5 z1 z2 z3 z4 z5", "A"),
      (3L, "w1 w2 w3 w4 w5", "B"),
      (4L, "unrelated content here", "B"))
      .toDF("doc_id", "text", "src")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", 9L, 10L,
        blockCols = Seq("src"), keepBlocks = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)),
      s"only the within-tenant inclusion pairs: $got")
    // grouped == union of per-group solo runs on real data
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .limit(120).localCheckpoint(true)
    val grouped = Dedup.containmentPairs(d, "doc_id", "text", 4L, 5L,
        shingleN = 3, blockCols = Seq("lang"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val solo = d.select("lang").distinct().collect().map(_.getString(0))
      .flatMap { lg =>
        Dedup.containmentPairs(d.filter(col("lang") === lg),
            "doc_id", "text", 4L, 5L, shingleN = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      }.toSet
    assert(grouped == solo, s"grouped must equal the per-tenant solo " +
      s"union: extra=${(grouped -- solo).take(3)} " +
      s"missing=${(solo -- grouped).take(3)}")
  }

  test("containment pairs equal brute force on real data at 4/5") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").limit(80).localCheckpoint(true)
    val got = Dedup.containmentPairs(d, "doc_id", "text", 4L, 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sets = d.collect().map(r => r.getLong(0) ->
      r.getString(1).split(" ").filter(_.nonEmpty).toSet).toMap
    val want = (for {
      (ia, sa) <- sets.toSeq; if sa.nonEmpty
      (ib, sb) <- sets.toSeq; if ia != ib
      inter = (sa & sb).size.toLong
      if inter * 5 >= 4 * sa.size
    } yield (ia, ib) -> inter * 1000000L / sa.size).toMap
    assert(got == want,
      s"prefix-probed containment diverged from brute force: " +
        s"missing=${(want.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- want.keySet).take(5)}")
    assert(want.nonEmpty, "slice must contain at least one true pair")
    // shingle mode (the query's setting): same equality against a
    // brute force over distinct 3-shingle sets
    val got3 = Dedup.containmentPairs(d, "doc_id", "text", 4L, 5L,
        shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def sh3(text: String): Set[String] = {
      val t = text.split(" ").filter(_.nonEmpty).toSeq
      if (t.length < 3) Set(t.mkString(" "))
      else t.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets3 = d.collect().map(r => r.getLong(0) -> sh3(r.getString(1)))
      .filter(_._2 != Set("")).toMap
    val want3 = (for {
      (ia, sa) <- sets3.toSeq
      (ib, sb) <- sets3.toSeq; if ia != ib
      inter = (sa & sb).size.toLong
      if inter * 5 >= 4 * sa.size
    } yield (ia, ib) -> inter * 1000000L / sa.size).toMap
    assert(got3 == want3,
      s"shingle containment diverged from brute force: " +
        s"missing=${(want3.keySet -- got3.keySet).take(5)} " +
        s"extra=${(got3.keySet -- want3.keySet).take(5)}")
  }

  test("containment removal drops quoted docs, keeps containers and min-id dups") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5"),                       // contained in 2
      (2L, "w1 w2 w3 w4 w5 z1 z2 z3 z4 z5 z6 z7"),  // container, survives
      (3L, "q1 q2 q3"),                             // exact dup pair with 4
      (4L, "q1 q2 q3"),                             //   -> min id 3 survives
      (5L, "solo only tokens here"))                // untouched
      .toDF("doc_id", "text")
    val out = Dedup.removeContained(docs, "doc_id", "text", 9L, 10L)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(2L, 3L, 5L), s"survivors: $out")
    // chain A c B c C: everything contained anywhere drops, the
    // maximal container survives
    val chain = Seq((1L, "a1 a2 a3"),
      (2L, "a1 a2 a3 b1 b2"), (3L, "a1 a2 a3 b1 b2 c1 c2"))
      .toDF("doc_id", "text")
    assert(Dedup.removeContained(chain, "doc_id", "text", 9L, 10L)
      .collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("LPA communities: dense regions outvote bridges, CC merges them") {
    // barbell: two 3-cliques {1,2,3} and {4,5,6} joined by the single
    // bridge edge (3,4). Connected components fuse all six; LPA's
    // self-vote majority keeps the cliques apart (the round-2 state
    // where the bridge endpoints briefly swap labels is outvoted by
    // each side's clique majority by round 3).
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L))
      .toDF("doc_id1", "doc_id2")
    val lpa = Dedup.labelPropagation(pairs, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L),
      s"barbell must split into the two cliques: $lpa")
    val cc = Dedup.clusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet.size == 1, "contrast: CC merges the barbell")
    // a clique converges to its min id in one round and stays there
    val clique = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("doc_id1", "doc_id2")
    assert(Dedup.labelPropagation(clique, rounds = 1)
      .collect().forall(_.getLong(1) == 1L))
    // a single edge: both endpoints land on the min id
    val edge = Seq((7L, 8L)).toDF("doc_id1", "doc_id2")
    assert(Dedup.labelPropagation(edge, rounds = 4)
      .collect().forall(_.getLong(1) == 7L))
    // partition invariance: the vote is a pure function of the graph
    val shuffled = Dedup.labelPropagation(pairs.repartition(7), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shuffled == lpa)
  }

  test("LPA communities refine connected components on the real graph") {
    // labels only travel along edges, so every community must live
    // INSIDE one CC component — the containment invariant that makes
    // LPA a refinement, never a re-wiring
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = Dedup.jaccardPairs(d, "doc_id", "text", Seq("lang"), 0.9,
      parallelBuckets = 8)
    val lpa = Dedup.labelPropagation(pairs, rounds = 4)
    val cc = Dedup.clusters(pairs)
    val nodeClus = cc.withColumnRenamed("id", "node_id")
      .withColumnRenamed("cluster", "node_cluster")
    val labClus = cc.withColumnRenamed("id", "lab_id")
      .withColumnRenamed("cluster", "lab_cluster")
    val crossed = lpa
      .join(nodeClus, lpa("id") === nodeClus("node_id"))
      .join(labClus, lpa("community") === labClus("lab_id"))
      .filter(col("node_cluster") =!= col("lab_cluster"))
    assert(crossed.isEmpty, "a community label crossed a CC boundary")
    val nComm = lpa.select("community").distinct().count()
    val nComp = cc.select("cluster").distinct().count()
    assert(nComm >= nComp, s"LPA must refine CC: $nComm < $nComp")
  }

  test("containmentPairs/shingleNovelty auto-pin a long derived lineage") {
    // Derived (join/agg/window-bearing) inputs used to be a documented
    // footgun — the multi-reference probe re-executed the whole
    // upstream per reference. Lineage.pinDerived makes the contract
    // structural: the composed pipeline below (filter → self-join-ish
    // enrich → window) must produce the same rows as the table-backed
    // run, through the auto-checkpoint.
    import org.apache.spark.sql.expressions.Window
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val enriched = d
      .join(d.groupBy("lang").agg(count(lit(1)).as("n_lang")), "lang")
      .withColumn("rk",
        row_number().over(Window.partitionBy("lang").orderBy("doc_id")))
      .filter(col("rk") <= 400)
      .select("doc_id", "text")
    val viaPin = Dedup.containmentPairs(enriched, "doc_id", "text", 4L, 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val table = enriched.localCheckpoint(true)
    val viaTable = Dedup.containmentPairs(table, "doc_id", "text", 4L, 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaPin == viaTable, "auto-pinned run diverged from table-backed run")
    val nov = graft.operators.Curate
      .shingleNovelty(enriched, "doc_id", "text")
    assert(nov.count() > 0)
  }

  test("containedAgainstTable is replay-idempotent (duplicated sidecar rows)") {
    import spark.implicits._
    def words(p: String, a: Int, b: Int) = (a to b).map(i => s"$p$i").mkString(" ")
    val corpus = Seq((1L, words("p", 1, 20)), (2L, words("q", 1, 8)))
      .toDF("doc_id", "text")
    try {
      Dedup.buildContainTable(corpus, "doc_id", "text", "replay_contain")
      // replayed append: state now holds every corpus row TWICE
      Dedup.appendContainState(corpus, "doc_id", "text", "replay_contain")
      val out = Dedup.containedAgainstTable(
        Seq((10L, words("p", 3, 12))).toDF("doc_id", "text"),
        "doc_id", "text", "replay_contain", 9L, 10L).collect()
      assert(out.length == 1,
        s"one (incoming, corpus) pair expected after replay, got " +
          s"${out.length}: ${out.mkString(", ")}")
      assert(out.head.getLong(0) == 10L && out.head.getLong(1) == 1L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS replay_contain")
      spark.sql("DROP TABLE IF EXISTS replay_contain_sets")
    }
  }

  test("corpus sketch: exhaustive k is exact; sketches merge; estimator sane") {
    import spark.implicits._
    def mk(src: String, texts: Seq[String]) =
      texts.zipWithIndex.map { case (t, i) => (s"$src-$i", t, src) }
    val d = (mk("a", Seq("w1 w2 w3 w4 w5", "w3 w4 w5 w6 w7")) ++
      mk("b", Seq("w3 w4 w5 w6 w7", "x1 x2 x3 x4")) ++
      mk("c", Seq("y1 y2 y3 y4 y5")))
      .toDF("doc_id", "text", "source")
    // k far above every inventory: sketches are exhaustive, so the
    // bottom-k estimator must equal the exact inventory Jaccard
    val k = 1000
    val est = Dedup.sketchResemblance(
      Dedup.corpusSketch(d, "text", "source", k), k)
    val exact = Dedup.corpusResemblanceExact(d, "text", "source")
    val joined = est.join(exact, Seq("g1", "g2"), "left")
      .select(col("g1"), col("g2"), col("j_est_ppm"),
        coalesce(col("j_exact_ppm"), lit(0L)).as("j_exact_ppm"),
        col("c_ab_est_ppm"),
        coalesce(col("c_ab_exact_ppm"), lit(0L)).as("c_ab_exact_ppm"),
        col("c_ba_est_ppm"),
        coalesce(col("c_ba_exact_ppm"), lit(0L)).as("c_ba_exact_ppm"))
      .collect()
    assert(joined.length == 3) // (a,b) (a,c) (b,c)
    joined.foreach { r =>
      assert(r.getLong(2) == r.getLong(3),
        s"exhaustive-k Jaccard estimate must be exact: $r")
      assert(r.getLong(4) == r.getLong(5) && r.getLong(6) == r.getLong(7),
        s"exhaustive-k containment estimates must be exact: $r")
    }
    // disjoint-vocab pair reads 0; overlapping pair reads > 0
    val m = joined.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("a", "c")) == 0L && m(("b", "c")) == 0L && m(("a", "b")) > 0L)

    // mergeability: the sketch of a merged group equals the bottom-k
    // of the two groups' sketch ROWS (what lets per-source sketches
    // persist and fold daily deltas without a corpus rescan)
    val k2 = 4
    val skAB = Dedup.corpusSketch(
      d.filter(col("source") =!= "c").withColumn("source", lit("ab")),
      "text", "source", k2)
      .select("sid").collect().map(_.getLong(0)).toSet
    val mergedRows = Dedup.corpusSketch(d.filter(col("source") =!= "c"),
        "text", "source", k2)
      .select("sid").distinct()
      .orderBy("sid").limit(k2)
      .collect().map(_.getLong(0)).toSet
    assert(skAB == mergedRows,
      s"sketch-of-union must equal bottom-k of merged sketches: " +
        s"$skAB vs $mergedRows")
  }

  test("minhash_band_hashes is bit-identical to xxhash64(slice(minhash_sig))") {
    // The fused kernel replaced the 8-sibling xxhash64(slice(sig,…))
    // projection (r12's CollapseProject re-evaluation regression); the
    // bucket values must not move, or every banded candidate set —
    // and the persisted signature tables — silently change.
    import graft.functions.{minhash_band_hashes, minhash_sig, tokenize_ws}
    val (k, bands) = (64, 8)
    val rows = k / bands
    val d = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
    val both = d.select(
      minhash_band_hashes(tokenize_ws(col("text")), k, bands).as("fused"),
      array((0 until bands).map(bi =>
        xxhash64(slice(minhash_sig(array_distinct(tokenize_ws(col("text"))), k),
          bi * rows + 1, rows))): _*).as("unfused"))
    assert(both.filter(col("fused") =!= col("unfused")).isEmpty,
      "fused band hashes diverged from the unfused form")
  }

  // --- L99 winnowing ------------------------------------------------

  /** Straightforward O(n·k + n·w) reference of Kernels.winnowFps. */
  private def naiveWinnow(s: String, k: Int, w: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    val M = 1000000007L
    if (cps.isEmpty) return Seq.empty
    val grams: Array[Long] =
      if (cps.length < k) Array(cps.foldLeft(0L)((a, c) => (a * 31 + c) % M))
      else (0 to cps.length - k).map(i =>
        (i until i + k).foldLeft(0L)((a, j) => (a * 31 + cps(j)) % M)).toArray
    val nw = math.max(1, grams.length - w + 1)
    (0 until nw).map(j => grams.slice(j, math.min(grams.length, j + w)).min)
      .distinct.sorted
  }

  test("winnow: kernel parity, guarantee at w+k-1, short-text fallback") {
    import graft.functions.winnow_fps
    val passage = "0123456789abcdefghijklm" // 23 chars = w + k - 1 at (8,16)
    val a = "AAAA BBBB CCCC DDDD EEEE FFFF GGGG " + passage + " HHHH IIII"
    val b = "zzzz yyyy xxxx wwww " + passage + " vvvv uuuu tttt ssss rrrr"
    val c = "%%%% ^^^^ &&&& **** (((( )))) ==== ++++ [[[[ ]]]] {{{{ }}}}"
    val rows = Seq((1L, a), (2L, b), (3L, c), (4L, "abc"), (5L, ""))
      .toDF("doc_id", "text")
    val got = rows
      .select(col("doc_id"), winnow_fps(col("text"), 8, 16).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // kernel == naive reference on every row
    Seq(1L -> a, 2L -> b, 3L -> c, 4L -> "abc", 5L -> "").foreach {
      case (id, s) => assert(got(id) == naiveWinnow(s, 8, 16), s"doc $id")
    }
    assert(got(4L).length == 1, "sub-k text must hash whole as one gram")
    assert(got(5L).isEmpty)
    // the winnowing guarantee: a shared substring of length w+k-1
    // forces a shared fingerprint VALUE
    assert(got(1L).toSet.intersect(got(2L).toSet).nonEmpty,
      "planted 23-char passage must share a fingerprint")
    assert(got(1L).toSet.intersect(got(3L).toSet).isEmpty,
      "disjoint alphabets must not collide")
    // sorted distinct contract (the verify kernel requires it)
    assert(got(1L) == got(1L).distinct.sorted)
  }

  test("winnowed pairs: maxDf hides boilerplate-only pairs, verify counts all") {
    val boiler = "shared boilerplate header passage common to all docs"
    val rare = "the rare quoted passage only two documents carry along"
    def pad(seed: Char) = (0 until 6).map(i => s"$seed$i$seed$i").mkString(" ")
    val d = Seq(
      (1L, s"${pad('a')} $boiler ${pad('b')} $rare"),
      (2L, s"${pad('c')} $boiler ${pad('d')} $rare"),
      (3L, s"${pad('e')} $boiler ${pad('f')}"),
      (4L, s"${pad('g')} $boiler ${pad('h')}"),
      (5L, s"${pad('i')} $boiler ${pad('j')}"))
      .toDF("doc_id", "text")
    // boilerplate fps have df=5 > maxDf=3: pairs sharing ONLY those
    // stay hidden; (1,2) also share the rare passage (df=2) → surfaced
    val out = Dedup.winnowedPairs(d, "doc_id", "text", k = 8, w = 16,
        minShared = 1L, maxDf = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.keySet == Set((1L, 2L)),
      s"expected only the rare-passage pair, got ${out.keySet}")
    // verify counts the FULL shared set (boilerplate fps included),
    // equal to the naive intersection — maxDf gates surfacing only
    val naive = Seq(1L, 2L).map(id =>
      naiveWinnow(d.filter(col("doc_id") === id).head().getString(1), 8, 16)
        .toSet)
    assert(out((1L, 2L)) == naive(0).intersect(naive(1)).size.toLong)
  }

  test("winnow spans localize the shared passage inside both docs") {
    val pad1 = "AAAA BBBB CCCC DDDD EEEE FFFF GGGG HHHH " // 40 cp
    val pad2 = "zzzz yyyy xxxx "                           // 15 cp
    val passage = "0123456789abcdefghijklmnopqrstuvwxyz0123456789" // 46 cp
    val d = Seq((1L, pad1 + passage), (2L, pad2 + passage + " wwww vvvv"))
      .toDF("doc_id", "text")
    val out = Dedup.winnowedSpanPairs(d, "doc_id", "text", k = 8, w = 16,
      minShared = 1L, maxDf = 10L).collect()
    assert(out.length == 1, s"exactly the planted pair, got ${out.length}")
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    // disjoint pad alphabets: every shared gram lies INSIDE the
    // passage occurrence, so the reported anchors must too
    val (from1, ext1) = (r.getLong(5), r.getLong(6))
    val (from2, ext2) = (r.getLong(7), r.getLong(8))
    assert(from1 >= 40 && from1 + ext1 <= 40 + 46,
      s"doc1 anchors outside the passage: from $from1 extent $ext1")
    assert(from2 >= 15 && from2 + ext2 <= 15 + 46,
      s"doc2 anchors outside the passage: from $from2 extent $ext2")
    // every shared fingerprint has an anchor on both sides
    assert(r.getLong(4) >= r.getLong(2),
      "anchor pairs must cover the shared fingerprint set")
  }

  test("winnowAgainstTable: exact probe, replay-idempotent state") {
    def words(p: String, a: Int, b: Int) = (a to b).map(i => s"$p$i").mkString(" ")
    val corpus = Seq(
      (1L, words("a", 1, 12) + " " + words("s", 1, 30)),
      (2L, words("b", 1, 12) + " " + words("t", 1, 30)))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (10L, words("c", 1, 12) + " " + words("s", 3, 28)), // quotes 1
      (11L, words("d", 1, 12) + " " + words("u", 1, 30))) // fresh
      .toDF("doc_id", "text")
    try {
      Dedup.buildWinnowTable(corpus, "doc_id", "text", "winnow_probe_t")
      def probe() = Dedup.winnowAgainstTable(incoming, "doc_id", "text",
          "winnow_probe_t", minShared = 4L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val base = probe()
      assert(base.map(t => (t._1, t._2)) == Set((10L, 1L)),
        s"only the quoting doc may hit, got $base")
      // a replayed append duplicates postings AND sidecar rows; the
      // distinct-corpus-id df and the sidecar min-pick must absorb it
      Dedup.appendWinnowState(corpus, "doc_id", "text", "winnow_probe_t")
      assert(probe() == base, "replayed append changed probe results")
    } finally {
      spark.sql("DROP TABLE IF EXISTS winnow_probe_t")
      spark.sql("DROP TABLE IF EXISTS winnow_probe_t_sets")
    }
  }

  test("winnowed pairs are invariant to input partitioning (real corpus)") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.winnowedPairs(df, "doc_id", "text", k = 8, w = 16,
          minShared = 8L, maxDf = 8L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    val base = run(d)
    assert(base.nonEmpty, "real corpus should surface winnow pairs")
    assert(run(d.repartition(7)) == base)
  }

  test("winnowedAgainst: the verbatim-overlap guarantee vs a reference suite") {
    val evalPassage = "0123456789abcdefghijklm" // exactly w + k - 1 chars
    val ref = Seq((100L, "EVAL SET " + evalPassage + " QUESTION ANSWER"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "pppp qqqq rrrr " + evalPassage + " ssss tttt"), // quotes: flag
      (2L, "uuuu vvvv wwww xxxx yyyy zzzz aaaa bbbb cccc")) // clean
      .toDF("doc_id", "text")
    val out = Dedup.winnowedAgainst(train, "doc_id", "text",
        ref, "doc_id", "text", k = 8, w = 16, minShared = 1L, maxDf = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the guarantee: a verbatim overlap of exactly w+k-1 chars MUST
    // share a fingerprint; the clean doc must not
    assert(out == Set((1L, 100L)), s"got $out")
  }

  test("content diff is chunking-robust: re-splitting is near-zero change") {
    val words = (1 to 60).map(i => s"tok$i").mkString(" ") // ~400 cp
    val rel1 = Seq((1L, words, "s")).toDF("doc_id", "text", "src")
    // same CONTENT split into two docs at a word boundary — row-level
    // CDC calls this 100% changed; the fingerprint inventory must not
    val (h1, h2) = words.splitAt(words.length / 2 -
      words.substring(0, words.length / 2).reverse.indexOf(' '))
    val rel2 = Seq((10L, h1.trim, "s"), (11L, h2.trim, "s"))
      .toDF("doc_id", "text", "src")
    val d = Dedup.contentDiff(rel1, rel2, "doc_id", "text", "src").head()
    assert(d.getAs[Long]("jaccard_pm") >= 800000L,
      s"re-chunking must read as near-identical content: $d")
    // a REAL addition shows up as added content
    val rel3 = Seq((20L, words + " entirely new appended paragraph of text", "s"))
      .toDF("doc_id", "text", "src")
    val d2 = Dedup.contentDiff(rel1, rel3, "doc_id", "text", "src").head()
    assert(d2.getAs[Long]("added_pm") > 0L &&
      d2.getAs[Long]("removed_pm") <= 100000L,
      s"appended content must read as added, not churn: $d2")
  }

  test("blocked winnow pairs equal per-language solo runs") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val blocked = Dedup.winnowedPairs(d, "doc_id", "text", k = 8, w = 16,
        minShared = 8L, maxDf = 8L, blockCols = Seq("lang"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // one call == the union of per-language solo runs... with GLOBAL
    // df (the L82d rule), so solo runs must share the corpus-wide cap:
    // equivalently, blocked == unblocked restricted to same-lang pairs
    val langOf = d.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val restricted = Dedup.winnowedPairs(d, "doc_id", "text", k = 8,
        w = 16, minShared = 8L, maxDf = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (a, b, _) => langOf(a) == langOf(b) }.toSet
    assert(blocked == restricted,
      "blocking must equal the same-lang restriction of the global run")
    assert(blocked.nonEmpty && blocked.size <
      Dedup.winnowedPairs(d, "doc_id", "text", 8, 16, 8L, 8L)
        .count(),
      "blocking must cut candidate volume on the mixed-language corpus")
  }
}
