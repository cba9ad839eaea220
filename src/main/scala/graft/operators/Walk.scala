package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

import graft.functions._

/** L63: deterministic DeepWalk-style random walks — the graph-corpus
  * generation step of node-embedding pipelines (Perozzi et al.,
  * KDD'14: walks become "sentences" for a skip-gram trainer; node2vec
  * with p=q=1 degenerates to exactly this). From every start node,
  * `nWalks` walks of `len` steps.
  *
  * The step choice is pseudo-random but FULLY deterministic: next =
  * the neighbor at rank `rolling_hash(node|walk|step) mod degree`
  * over the node's dst-sorted neighbor list. No RNG state means the
  * walks are (a) reproducible across runs, partitionings, and
  * cluster sizes — a corpus you can regenerate bit-for-bit — and
  * (b) replayable by a second engine, so the whole walk table
  * carries a hash oracle (the rolling-hash kernel already replays as
  * a list_reduce codepoint fold).
  *
  * Scale: adjacency ((src, rank, dst) + degree) builds once with one
  * src-window; each step is ONE equi-join of the constant-size
  * frontier (starts × nWalks rows — walks never branch) against the
  * adjacency, `len` joins total. No cross product, no driver-side
  * iteration over data, frontier never grows. A walk ending on a
  * dangling node (no out-edges) simply stops — shorter walks, never
  * an error.
  */
object Walk {

  /** L63c: node2vec-style BIASED walks (Grover & Leskovec, KDD'16) —
    * the 2nd-order variant: from `cur` with predecessor `prev`, a
    * neighbor x is weighted wBack (x == prev: return), wCommon (x
    * adjacent to prev: BFS-ish stay-local) or wFar (DFS-ish explore)
    * — integer weights standing in for node2vec's 1/p, 1, 1/q. The
    * pick is `rolling_hash(cur|prev|walk|step) mod Σweights` resolved
    * against the dst-ordered cumulative weight windows, so the biased
    * walk is as deterministic and oracle-replayable as the uniform
    * one (the bias windows are integer SUM() OVER partitions).
    *
    * Step 1 has no predecessor and falls back to the uniform rule.
    * Cost adds one membership join per step (neighbor-of-prev check
    * against the edge set) on the frontier×degree rows — still no
    * cross product and a constant-size frontier. */
  def node2vecWalks(edges: DataFrame, srcCol: String, dstCol: String,
                    nWalks: Int, len: Int,
                    wBack: Long = 1L, wCommon: Long = 6L,
                    wFar: Long = 3L): DataFrame = {
    require(nWalks >= 1 && len >= 1, s"need nWalks >= 1 and len >= 1")
    require(wBack >= 0 && wCommon >= 0 && wFar >= 0 &&
      wBack + wCommon + wFar > 0, "weights must be non-negative, not all 0")
    val adj = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    val deg = adj.groupBy("src").agg(count(lit(1)).as("deg"))
    val adjd = adj
      .withColumn("nrank",
        (row_number().over(Window.partitionBy("src").orderBy("dst")) - 1)
          .cast("long"))
      .join(deg, "src").transform(graft.operators.Lineage.pin)
    val member = adjd.select(col("src").as("m_src"), col("dst").as("m_dst"),
      lit(1L).as("m"))
    var frontier = adjd.select(col("src").as("start")).distinct()
      .withColumn("walk", explode(sequence(lit(0L), lit(nWalks - 1L))))
      .withColumn("node", col("start"))
      .withColumn("prev", lit(null).cast("string"))
    var out = frontier.select(col("start"), col("walk"),
      lit(0L).as("step"), col("node"))
    for (stp <- 1 to len) {
      val stepped =
        if (stp == 1)
          // no predecessor yet: uniform over neighbors (DeepWalk rule)
          frontier.join(adjd, frontier("node") === adjd("src"))
            .filter(col("nrank") ===
              pmod(rolling_hash(concat_ws("|", col("node"), col("walk"),
                lit(stp.toString))), col("deg")))
            .select(col("start"), col("walk"), col("dst").as("node"),
              col("src").as("prev"))
        else {
          val weighted = frontier.join(adjd, frontier("node") === adjd("src"))
            .join(member,
              col("dst") === col("m_src") && col("prev") === col("m_dst"),
              "left")
            .withColumn("wgt",
              when(col("dst") === col("prev"), lit(wBack))
                .when(col("m").isNotNull, lit(wCommon))
                .otherwise(lit(wFar)))
          // cumulative weights via the keyed two-level prefix sum, not
          // a per-(start,walk) ORDER BY window: the window partition
          // there is degree-sized, and a hub node (every walk sitting
          // on it, neighbor list in the millions) would serialize one
          // task per walk on the full list. Bucket = nrank scaled into
          // <=256 cells — order-aligned with dst BY CONSTRUCTION
          // (nrank IS the dst rank within src), so the cum values are
          // bit-identical to the one-window formulation the DuckDB
          // oracle runs; only the plan changes (widest window
          // partition ~deg/256).
          PrefixSum.keyed(weighted,
              partCols = Seq("start", "walk"), orderCols = Seq("nrank"),
              valueCol = col("wgt"),
              bucket = expr("(nrank * 256) div deg"))
            // tot = 0 (every neighbor weighted 0 — possible on
            // directed graphs when the return edge is missing and
            // wCommon = wFar = 0): no pickable neighbor, the walk
            // stops — mirror of the dangling-node rule, never an
            // error. greatest(tot, 1) keeps ANSI mod happy; the rows
            // then fail `pick < cum` anyway (every cum window is
            // empty when all weights are 0), so no filter is needed
            // and Catalyst cannot reorder one past the division.
            .withColumn("pick",
              pmod(rolling_hash(concat_ws("|", col("node"), col("prev"),
                col("walk"), lit(stp.toString))), greatest(col("tot"), lit(1L))))
            .filter(col("pick") >= col("cum") - col("wgt") &&
              col("pick") < col("cum"))
            .select(col("start"), col("walk"), col("dst").as("node"),
              col("src").as("prev"))
        }
      frontier = stepped
      out = out.unionByName(frontier.select(col("start"), col("walk"),
        lit(stp.toLong).as("step"), col("node")))
    }
    out
  }

  /** L63d: deterministic negative sampling for skip-gram training —
    * word2vec's unigram^(3/4) noise distribution (Mikolov et al.
    * '13), integer-exact: node weight w = 4·freq^{3/4} computed as
    * floor(sqrt(floor(sqrt(freq³·256)))). Cross-engine determinism
    * is guaranteed because BIGINT→DOUBLE casts round-to-nearest and
    * IEEE sqrt is correctly rounded — every engine computes the SAME
    * double chain (freq ≤ ~3.3e5 before the BIGINT product would
    * overflow; ANSI mode fails loudly past that). K negatives per
    * center are picked by rolling_hash(center|k) mod Σw against the
    * node-ordered cumulative weight windows.
    *
    * The containment lookup (pick ∈ [cum−w, cum−1]) reuses
    * [[RangeJoin.byBucket]], so the corpus-sized distribution table
    * joins the picks as a bucketized equi-join — no cross product,
    * no per-row scan of the distribution. The only driver-side value
    * is Σw (one scalar aggregate, the bucket-width input). */
  def negativeSamples(pairs0: DataFrame, centerCol: String,
                      contextCol: String, nPairsCol: String,
                      k: Int): DataFrame = {
    require(k >= 1, "need k >= 1")
    // three references below (distribution groupBy, empty-feed probe,
    // distinct centers): a derived input — the usual skip-gram
    // self-join — would re-execute per reference without the pin
    val pairs = Lineage.pinDerived(pairs0)
    // pinned: node-set-sized, and read by FOUR downstream consumers
    // (emptiness probe, numeric min/max bucketing, the prefix sum, and
    // the interval table) — unpinned it re-ran the groupBy per
    // consumer (r16: 3 rebuilds measured inside q_embed_train).
    // r17: the emptiness probe AND the numeric min/max ride the pin's
    // own action (Lineage.pinAgg) — two whole jobs gone per call.
    val wts0 = pairs.groupBy(col(contextCol).as("node"))
      .agg(sum(col(nPairsCol)).as("freq"))
      .withColumn("w", expr(
        "CAST(FLOOR(SQRT(FLOOR(SQRT(CAST(freq * freq * freq * 256 " +
          "AS DOUBLE))))) AS BIGINT)"))
    val numericNode = wts0.schema("node").dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val aggs: Seq[(String, Column)] =
      ("__n", count(lit(1))) +: (if (numericNode)
        Seq(("__lo", min(col("node").cast("long"))),
          ("__hi", max(col("node").cast("long"))))
      else Nil)
    val (wts, wv) = Lineage.pinAgg(wts0, aggs: _*)
    // empty feed: no distribution to sample from — an empty typed
    // result, never an NPE off the null max(cum) downstream
    if (wv("__n").asInstanceOf[Long] == 0L)
      return pairs.select(col(centerCol).as("center"), lit(1L).as("k"),
        col(contextCol).as("neg_node")).limit(0)
    // the cumulative-weight table is a GLOBAL prefix sum over the
    // distribution — node-set-sized today, but for graph embeddings
    // over user/doc graphs the node set GROWS with the corpus, so an
    // unpartitioned ORDER BY window (one global sort through one
    // task) is the wrong plan shape. Bucketed two-level prefix sum
    // instead (widest task = one bucket); cum values are identical,
    // so the oracle's one-window formulation still hash-matches.
    val bkt: Column = wts.schema("node").dataType match {
      case StringType =>
        // code-point prefix: order-aligned with Spark's binary
        // UTF8 string comparison (UTF-8 preserves code-point order)
        substring(col("node"), 1, 2)
      case ByteType | ShortType | IntegerType | LongType =>
        val lo = BigInt(wv("__lo").asInstanceOf[Long])
        val width = (BigInt(wv("__hi").asInstanceOf[Long]) - lo) / 256 + 1
        floor((col("node").cast("decimal(38,0)") - lit(BigDecimal(lo))) /
          lit(BigDecimal(width))).cast("long")
      case _ =>
        // no order-aligned bucket without type knowledge: one bucket
        // (= the old bounded-vocabulary behavior)
        lit(0L)
    }
    // the L1 total rides the prefix-sum pin the same way
    val (win, winV) = Lineage.pinAgg(
      PrefixSum.bucketed(wts, orderCols = Seq("node"),
        valueCol = col("w"), bucket = bkt, outCol = "cum"),
      ("__tot", max(col("cum"))))
    val tot = winV("__tot").asInstanceOf[Long]
    val picks = pairs.select(col(centerCol).as("center")).distinct()
      .withColumn("k", explode(sequence(lit(1L), lit(k.toLong))))
      .withColumn("pick",
        pmod(rolling_hash(concat_ws("|", col("center"), col("k"))),
          lit(tot)))
    RangeJoin.byBucket(picks,
        win.select(col("node").as("neg_node"),
          (col("cum") - col("w")).as("lo"), (col("cum") - 1).as("hi")),
        keys = Seq(), ptCol = "pick", startCol = "lo", endCol = "hi",
        bucketSize = math.max(1L, tot / 4096))
      .select(col("center"), col("k"), col("neg_node"))
  }

  /** L63e: grouped (per-tenant) walk corpora — [[deterministicWalks]]
    * confined to each group's subgraph: adjacency ranks, degrees, and
    * frontier joins all carry `grpCol`, so a group's walks are
    * BIT-IDENTICAL to a solo run over that group's edges (the step
    * hash never sees the group — determinism comes from the per-group
    * adjacency being equal to the solo adjacency). One corpus pass
    * serves every tenant; the per-group equivalence is the spec gate
    * and the DuckDB twin replays the same grouped chain. */
  def deterministicWalksGrouped(edges: DataFrame, grpCol: String,
                                srcCol: String, dstCol: String,
                                nWalks: Int, len: Int): DataFrame = {
    require(nWalks >= 1 && len >= 1, s"need nWalks >= 1 and len >= 1")
    val adj = edges.select(col(grpCol).as("grp"), col(srcCol).as("src"),
        col(dstCol).as("dst"))
      .distinct()
      .withColumn("nrank",
        (row_number().over(Window.partitionBy("grp", "src").orderBy("dst")) - 1)
          .cast("long"))
    val deg = adj.groupBy("grp", "src").agg(count(lit(1)).as("deg"))
    val adjd = adj.join(deg, Seq("grp", "src")).transform(graft.operators.Lineage.pin)
    var frontier = adjd.select(col("grp"), col("src").as("start")).distinct()
      .withColumn("walk", explode(sequence(lit(0L), lit(nWalks - 1L))))
      .withColumn("node", col("start"))
    var out = frontier.select(col("grp"), col("start"), col("walk"),
      lit(0L).as("step"), col("node"))
    for (stp <- 1 to len) {
      frontier = frontier.alias("f")
        .join(adjd.alias("a"),
          col("f.grp") === col("a.grp") && col("f.node") === col("a.src"))
        .filter(col("nrank") ===
          pmod(rolling_hash(concat_ws("|", col("node"), col("walk"),
            lit(stp.toString))), col("deg")))
        .select(col("f.grp").as("grp"), col("start"), col("walk"),
          col("dst").as("node"))
      out = out.unionByName(frontier.select(col("grp"), col("start"),
        col("walk"), lit(stp.toLong).as("step"), col("node")))
    }
    out
  }

  /** C13u: incremental walk maintenance — the walk-corpus twin of the
    * incremental-sessionize seam discipline (R20f). The walks are a
    * pure deterministic function of the adjacency, so when an
    * append-only edge delta arrives the ONLY walks a full rebuild
    * would change are those that visit a node whose out-neighbor list
    * changed (a delta src): every step taken before the first such
    * visit reads unchanged adjacency rows and replays identically.
    * So: keep untouched walks whole, truncate touched walks at their
    * FIRST changed-node visit (the pick OUT of that node is what the
    * new edges invalidate), re-extend from the truncation point over
    * the updated adjacency, and start fresh walks for brand-new
    * source nodes. Result ≡ `deterministicWalks(allEdges)` — the spec
    * gate — at delta-proportional cost (touched walks + new starts,
    * never the whole corpus).
    *
    * Contract: `allEdges` is the FULL updated edge set and `delta`
    * the newly-arrived slice (appends only — deletions would need
    * tombstone seams like the pair-table erasure path). A delta row
    * that duplicates an existing edge only costs a wasted re-extend
    * (the replay reproduces the same steps). */
  def extendWalks(allEdges: DataFrame, delta: DataFrame, prior: DataFrame,
                  srcCol: String, dstCol: String,
                  nWalks: Int, len: Int): DataFrame = {
    require(nWalks >= 1 && len >= 1, s"need nWalks >= 1 and len >= 1")
    val adj = allEdges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .withColumn("nrank",
        (row_number().over(Window.partitionBy("src").orderBy("dst")) - 1)
          .cast("long"))
    val deg = adj.groupBy("src").agg(count(lit(1)).as("deg"))
    val adjd = adj.join(deg, "src").transform(graft.operators.Lineage.pin)
    val changed = delta.select(col(srcCol).as("cnode")).distinct()
    // first changed-node visit per (start, walk); null = untouched
    val cuts = prior
      .join(changed, prior("node") === changed("cnode"), "left")
      .groupBy("start", "walk")
      .agg(min(when(col("cnode").isNotNull, col("step"))).as("cut"))
    val withCut = prior.join(cuts, Seq("start", "walk"))
    val keep = withCut
      .filter(col("cut").isNull || col("step") <= col("cut"))
      .select("start", "walk", "step", "node")
    // brand-new sources (first out-edge arrived in this delta)
    val newStarts = adjd.select(col("src").as("start")).distinct()
      .join(prior.select("start").distinct(), Seq("start"), "left_anti")
      .withColumn("walk", explode(sequence(lit(0L), lit(nWalks - 1L))))
      .select(col("start"), col("walk"), lit(0L).as("step"),
        col("start").as("node"))
    var out = keep.unionByName(newStarts)
    // frontier: touched walks at their cut + fresh walks at step 0;
    // steps vary per row, so each round advances `step -> step + 1`
    // for rows still short of len (the step string in the hash is the
    // TARGET step, exactly as the batch builder forms it)
    var frontier = withCut
      .filter(col("cut").isNotNull && col("step") === col("cut"))
      .select("start", "walk", "step", "node")
      .unionByName(newStarts)
      .transform(graft.operators.Lineage.pin)
    for (_ <- 1 to len) {
      frontier = frontier.filter(col("step") < len)
        .join(adjd, frontier("node") === adjd("src"))
        .filter(col("nrank") ===
          pmod(rolling_hash(concat_ws("|", col("node"), col("walk"),
            (col("step") + 1).cast("string"))), col("deg")))
        .select(col("start"), col("walk"), (col("step") + 1L).as("step"),
          col("dst").as("node"))
      out = out.unionByName(frontier)
    }
    out
  }

  def deterministicWalks(edges: DataFrame, srcCol: String, dstCol: String,
                         nWalks: Int, len: Int): DataFrame = {
    require(nWalks >= 1 && len >= 1, s"need nWalks >= 1 and len >= 1")
    val adj = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .withColumn("nrank",
        (row_number().over(Window.partitionBy("src").orderBy("dst")) - 1)
          .cast("long"))
    val deg = adj.groupBy("src").agg(count(lit(1)).as("deg"))
    val adjd = adj.join(deg, "src").transform(graft.operators.Lineage.pin)
    var frontier = adjd.select(col("src").as("start")).distinct()
      .withColumn("walk", explode(sequence(lit(0L), lit(nWalks - 1L))))
      .withColumn("node", col("start"))
    var out = frontier.select(col("start"), col("walk"),
      lit(0L).as("step"), col("node"))
    for (stp <- 1 to len) {
      frontier = frontier.join(adjd, frontier("node") === adjd("src"))
        .filter(col("nrank") ===
          pmod(rolling_hash(concat_ws("|", col("node"), col("walk"),
            lit(stp.toString))), col("deg")))
        .select(col("start"), col("walk"), col("dst").as("node"))
      out = out.unionByName(frontier.select(col("start"), col("walk"),
        lit(stp.toLong).as("step"), col("node")))
    }
    out
  }
}
