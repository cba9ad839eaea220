package graft

/** Plan contracts (SURVEY §4): the scale properties the operators
  * argue — pushdown, broadcast strategy, shuffle discipline — pinned
  * as executable assertions on the pre-execution physical plan, so a
  * Spark upgrade or refactor that silently degrades a plan (filter no
  * longer reaching the scan, a broadcast falling back to
  * sort-merge+shuffle, a cartesian sneaking in) fails here instead of
  * only showing up as a bench regression at 100× the data.
  *
  * Assertions are deliberately coarse (strategy present / node class
  * absent / bounded exchange count) rather than full plan snapshots —
  * snapshots break on every Spark version bump without telling you
  * anything; contracts only break when a property the design relies
  * on is gone.
  */
class PlanContractSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  private def exchanges(p: String): Int =
    "(?<!Broadcast)Exchange ".r.findAllIn(p).length

  test("q_filter_project pushes both filters and prunes the scan") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters: ["), s"no pushdown section:\n$p")
    assert(p.contains("l_shipdate") && p.contains("l_discount"),
      s"filters must reach the parquet scan:\n$p")
    // column pruning: the untouched wide columns never leave the scan
    assert(!p.contains("l_returnflag"),
      s"scan must not read columns the query never uses:\n$p")
  }

  test("q_join_broadcast broadcasts the dim side, never sort-merges") {
    val p = plan("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), s"expected BHJ:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join must not SMJ:\n$p")
  }

  test("q_join_multi forces broadcast only on fixed-size dims (nation, region)") {
    // Boundary note (mirrors q_join_broadcast): nation (25 rows) and
    // region (5 rows) are constant at EVERY scale factor, so their
    // broadcast hints are safe to force. customer grows with SF
    // (150k × SF — multi-GB at the 100× contract), so its strategy must
    // stay un-hinted: the optimizer broadcasts it while it fits under
    // autoBroadcastJoinThreshold and backs off to a shuffled join beyond,
    // which a forced hint would prevent (driver OOM at scale).
    val lp = SparkEntry.queries("q_join_multi")(spark, sfDir)
      .queryExecution.analyzed.toString
    val hints = "ResolvedHint".r.findAllIn(lp).length
    assert(hints <= 2,
      s"only nation and region may carry a forced broadcast hint ($hints found):\n$lp")
  }

  test("q_dedup_prefix: no cartesian, no forced broadcast of the growing set table") {
    val p = plan("q_dedup_prefix")
    assert(!p.contains("CartesianProduct"),
      s"prefix join must stay an equi-join on (tok, bu, bv):\n$p")
    // the token-ID-set verify table grows with the corpus: its join
    // must be left to stats/AQE (the q_join_multi rule), never hinted
    val lp = SparkEntry.queries("q_dedup_prefix")(spark, sfDir)
      .queryExecution.analyzed.toString
    assert(!lp.contains("ResolvedHint"),
      s"no forced broadcasts anywhere in the prefix-join chain:\n$lp")
  }

  test("session-3 operator plans: no cartesian, no global window") {
    def globalWindows(p: org.apache.spark.sql.DataFrame) =
      p.queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
    // containment: candidates stay an equi-join on (tok, cell); the
    // growing set table's verify joins are never hinted
    val pc = plan("q_dedup_containment")
    assert(!pc.contains("CartesianProduct"),
      s"containment probe must stay an equi-join:\n$pc")
    assert(!SparkEntry.queries("q_dedup_containment")(spark, sfDir)
      .queryExecution.analyzed.toString.contains("ResolvedHint"),
      "no forced broadcast of the growing shingle-set table")
    // quantile normalization + coverage curve: rank tables grow with
    // the corpus — both must plan via bucketed scans, never one
    // unpartitioned WindowExec
    val qn = SparkEntry.queries("q_quantile_norm")(spark, sfDir)
    assert(globalWindows(qn).isEmpty,
      s"quantile norm planned a global window:\n${qn.queryExecution.sparkPlan}")
    val vc = SparkEntry.queries("q_vocab_curve")(spark, sfDir)
    assert(globalWindows(vc).isEmpty,
      s"coverage curve planned a global window:\n${vc.queryExecution.sparkPlan}")
    // LPA vote rounds: id-keyed equi-joins only
    val lp = plan("q_dup_communities")
    assert(!lp.contains("CartesianProduct"), s"LPA must equi-join:\n$lp")
    // novelty: shingle-keyed join, map-side partial aggregation
    val nv = plan("q_novelty")
    assert(!nv.contains("CartesianProduct") && nv.contains("partial_"),
      s"novelty needs partial aggs and no cartesian:\n$nv")
  }

  test("mmr candidate generation broadcasts the query set, no cartesian") {
    // q_retrieval_mmr's own executedPlan is a scan of the checkpointed
    // selection (the greedy rounds ran at construction), so the
    // contract is pinned on the candidate STAGE it is built from
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val p = graft.operators.Ann.bruteForceTopK(emb,
        emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 16)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"the only cross-shape join is the broadcast query set:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"queries must broadcast into candidate scoring:\n$p")
  }

  test("q_graph_walks: every step is an equi-join, frontier never cross-products") {
    val p = plan("q_graph_walks")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"walk steps must be equi-joins on the node key:\n$p")
  }

  test("q_gopher_rules is map-side: one exchange (the output sort) only") {
    val p = plan("q_gopher_rules")
    assert(!p.contains("Join"), s"rule battery must not join:\n$p")
    assert(exchanges(p) <= 1,
      s"map-side battery must shuffle at most for the final sort:\n$p")
  }

  test("q_dsir_select scores via broadcast model, no sort-merge, no cartesian") {
    val p = plan("q_dsir_select")
    assert(p.contains("BroadcastHashJoin"),
      s"the B-row ratio model must broadcast into the scoring join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"nothing in dsir may sort-merge (corpus never shuffles vs model):\n$p")
    assert(!p.contains("CartesianProduct"),
      s"only broadcast-1-row cross joins allowed:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k selection must be TakeOrdered, not global sort+limit:\n$p")
  }

  test("q_mink_contamination ranks and counts over one doc-key shuffle") {
    val p = plan("q_mink_contamination")
    // the rank window and the count window must share the doc_id
    // partitioning: two Window operators, no exchange between them
    val i = p.indexOf("Window")
    val j = p.indexOf("Window", i + 1)
    assert(i >= 0 && j > i, s"expected two window operators:\n$p")
    assert(!p.substring(i, j).contains("Exchange"),
      s"rank/count windows must share one shuffle:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"suspect top-50 must be TakeOrdered:\n$p")
  }

  test("q_hard_negatives broadcasts anchors; ranking is group-limited") {
    val p = plan("q_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"anchor set must broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-anchor top-k must push a group limit below the shuffle:\n$p")
  }

  test("q_dsir_grouped: model broadcasts, ranking stays per-group") {
    val p = plan("q_dsir_grouped")
    assert(p.contains("BroadcastHashJoin"),
      s"the G·B-row grouped model must broadcast into scoring:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian anywhere:\n$p")
    // the top-5 ranking window carries the group key — a partitionless
    // (global) window would single-thread the corpus
    assert(!p.contains("Window [") || !p.contains("partitionBy=[]"),
      s"per-group ranking must keep its partition key:\n$p")
  }

  test("map-side kernels carry no CodegenFallback expressions") {
    // the rule battery and the quality scorer are pure per-row maps;
    // every expression in their plans must be codegen-capable (the
    // higher-order builtins — filter/transform/aggregate lambdas —
    // are CodegenFallback: interpreted per-row eval, which is what
    // the fused gopher_stats kernel exists to avoid)
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    Seq("q_gopher_rules", "q_text_quality").foreach { q =>
      val exec = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan
      val fallbacks = exec.flatMap(_.expressions)
        .flatMap(e => e +: e.children.flatMap(_.collect { case x => x }))
        .collect { case e: CodegenFallback => e.prettyName }.distinct
      assert(fallbacks.isEmpty,
        s"$q contains interpreted (CodegenFallback) expressions: " +
          fallbacks.mkString(", "))
    }
  }

  test("q_agg_pricing aggregates with map-side partials") {
    val p = plan("q_agg_pricing")
    assert(p.contains("partial_"), // partial_sum / partial_count markers
      s"aggregation must have a map-side partial phase:\n$p")
    assert(exchanges(p) <= 2,
      s"one agg shuffle + the output sort at most:\n$p")
  }

  test("q_blocklist is a pure map (one exchange: the output sort)") {
    val p = plan("q_blocklist")
    assert(!p.contains("Join"), s"blocklist must not join:\n$p")
    assert(exchanges(p) <= 1, s"map-side filter, sort only:\n$p")
  }

  test("q_curation_scorecard: one pass, no joins, partial agg") {
    val p = plan("q_curation_scorecard")
    assert(!p.contains("Join"),
      s"scorecard must compute all flags on the row, never join frames:\n$p")
    assert(p.contains("partial_"), s"needs map-side partials:\n$p")
    assert(exchanges(p) <= 2, s"one 20-key agg shuffle + output sort:\n$p")
  }

  test("q_tokenizer_fertility: one pass, no joins, partial agg") {
    val p = plan("q_tokenizer_fertility")
    assert(!p.contains("Join"), s"fertility must not join:\n$p")
    assert(p.contains("partial_"), s"needs map-side partials:\n$p")
    assert(exchanges(p) <= 2, s"one 5-key agg shuffle + output sort:\n$p")
  }

  test("q_session_pack: window and chunk agg share the user shuffle") {
    val p = plan("q_session_pack")
    // the groupBy(user, chunk) clusters under the window's
    // HashPartitioning(user) — a second exchange between Window and
    // HashAggregate would mean the reuse broke
    val i = p.indexOf("Window")
    assert(i >= 0, s"expected the ordering window:\n$p")
    val agg = p.lastIndexOf("HashAggregate", i)
    assert(agg >= 0, s"expected chunk aggregation above the window:\n$p")
    assert(!p.substring(agg, i).contains("Exchange"),
      s"chunk agg must reuse the window's user partitioning:\n$p")
    assert(exchanges(p) <= 2, s"user shuffle + output sort at most:\n$p")
  }

  test("q_bitext_margin: scoring joins never sort-merge the k-bounded frames") {
    val p = plan("q_bitext_margin")
    assert(p.contains("WindowGroupLimit"),
      s"directional top-k must push group limits below the shuffle:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"candidate generation must be broadcast, never cartesian:\n$p")
  }

  test("q_quantile_sketch: corpus work is one partial-agg'd groupBy") {
    val p = plan("q_quantile_sketch")
    assert(p.contains("partial_"),
      s"bucket histogram needs map-side partials (hot buckets):\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"probe joins run on sketch-sized frames, never sort-merge:\n$p")
  }

  test("q_event_funnel: every stage clusters on the one user key") {
    val p = plan("q_event_funnel")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // each stage shuffles ITS OWN filtered event slice once (S = 3),
    // the accumulated user frame reuses its partitioning through the
    // joins, and the S-row report tail adds its agg/window/sort — so
    // exchanges stay ~S + 4, not one per operator (9+ here if reuse
    // broke)
    assert(exchanges(p) <= 7,
      s"stage chain must reuse the user partitioning:\n$p")
  }

  test("q_cohort_retention: user-keyed aggs, low-cardinality rollup") {
    val p = plan("q_cohort_retention")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_"), s"needs map-side partials:\n$p")
  }

  test("q_multimodal_align: modality join, no cartesian, no fallback scan") {
    val p = plan("q_multimodal_align")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("Join"), s"the two modalities must meet in a join:\n$p")
  }

  test("q_fuzzy_match: equi-join blocking, broadcast count lookups, no cartesian") {
    val p = plan("q_fuzzy_match")
    assert(!p.contains("CartesianProduct"),
      s"token blocking must stay an equi-join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the inventory-sized count lookups must broadcast:\n$p")
  }

  test("q_concurrency: the sweep windows are bucket-partitioned, never one global sort") {
    val p = plan("q_concurrency")
    assert(p.contains("hashpartitioning(__bkt"),
      s"the full-size window must partition on the time bucket:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("q_phrase_mine: support-filtered inventory joins, partial aggs, no cartesian") {
    val p = plan("q_phrase_mine")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_"), s"counts need map-side partials:\n$p")
  }

  test("q_rolling_distinct_sketch: sketch partials combine map-side") {
    val p = plan("q_rolling_distinct_sketch")
    assert(p.contains("partial_"), s"per-day sketches must partial-agg:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("q_embed_outliers: quantized (label,dim) aggregates partial-combine") {
    val p = plan("q_embed_outliers")
    assert(p.contains("partial_"), s"integer sums must partial-agg:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("q_lm_trigram: count tables join on token keys, never cartesian") {
    val p = plan("q_lm_trigram")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_"), s"counts need map-side partials:\n$p")
  }

  test("q_unimax_apply: the allocation broadcasts, the corpus never shuffles for it") {
    val p = plan("q_unimax_apply")
    assert(p.contains("BroadcastHashJoin"),
      s"the L-row allocation frame must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("hot kernels evaluate once per plan node (CollapseProject guard)") {
    // CollapseProject inlines a projected column into every sibling
    // that references it: a plan node whose string carries N copies of
    // an expensive kernel runs that kernel N times PER ROW (the r12
    // q_dedup_minhash 1.85× / q_ann_jl 0.47→0.85 regressions). The
    // fused kernels make single evaluation structural; this pins it.
    def maxPerNode(p: String, needle: String): Int =
      p.linesIterator.map { l =>
        var (c, i) = (0, l.indexOf(needle))
        while (i >= 0) { c += 1; i = l.indexOf(needle, i + 1) }
        c
      }.foldLeft(0)(math.max)
    val pm = plan("q_dedup_minhash")
    assert(!pm.contains("minhash_sig("),
      s"banding must use the fused band-hash kernel:\n$pm")
    assert(maxPerNode(pm, "minhash_band_hashes(") <= 1,
      s"band hashes re-evaluated within one node:\n$pm")
    assert(maxPerNode(pm, "tokenize_ws(") <= 2, // band-hash + id-set branches
      s"tokenize chain re-evaluated beyond its two consumers:\n$pm")
    val pj = plan("q_ann_jl")
    assert(maxPerNode(pj, "quantize_q16(") <= 1,
      s"quantize re-evaluated within one node:\n$pj")
    assert(maxPerNode(pj, "jl_project_q16(") <= 1,
      s"JL projection re-evaluated within one node:\n$pj")
  }

  test("r13 session-4 plans: TakeOrdered sampling, partitioned KS windows, no cartesians") {
    // priority sampling: the global top-(k+1) must plan as TakeOrdered
    // (per-partition top-k then merge), never a global Sort of the
    // corpus feeding a Limit
    val ps = plan("q_priority_sample")
    assert(ps.contains("TakeOrderedAndProject"),
      s"priority sample must TakeOrdered, not global-sort:\n$ps")
    // KS drift: the PrefixSum claim — every corpus-sized window is
    // partitioned (the k+1-row rank windows of OTHER ops are exempt;
    // this plan has none). An unpartitioned 'Window [' with an empty
    // partition spec prints as 'windowspecdefinition(' without a
    // leading partition column list — assert via the WindowExec form.
    val ks = SparkEntry.queries("q_ks_drift")(spark, sfDir)
      .queryExecution.executedPlan
    val badWindows = ks.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(badWindows.isEmpty,
      s"KS sup must ride bucketed prefix sums, not a global window:\n$ks")
    // theta overlap / join-size / PRF: no cartesian products anywhere
    // (their crossJoins are 1-row broadcast stats frames, which plan
    // as BroadcastNestedLoopJoin)
    Seq("q_theta_overlap", "q_join_size_est", "q_prf_search",
        "q_canary_audit").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q must not plan a cartesian:\n$p")
    }
  }

  test("winnow plans: kernel once per plan (pushdown guard), no cartesian") {
    // a filter on the kernel's output gets substituted through the
    // producing Project by predicate pushdown and re-evaluates the
    // kernel inside the Filter condition — the winnow queries avoid
    // filters on kernel outputs entirely, so the WHOLE PLAN carries
    // exactly one winnow_fps call
    def maxPerNode(p: String): Int =
      p.linesIterator.map { l =>
        var (c, i) = (0, l.indexOf("winnow_fps("))
        while (i >= 0) { c += 1; i = l.indexOf("winnow_fps(", i + 1) }
        c
      }.foldLeft(0)(math.max)
    val pw = plan("q_winnow")
    assert("winnow_fps\\(".r.findAllIn(pw).length == 1,
      s"q_winnow must run the kernel once per row:\n$pw")
    // the pair plan's DAG branches (postings self-join sides, set
    // sides) each legitimately carry one kernel call off the pinned
    // input; the regression class is N calls WITHIN one node
    val pp = plan("q_winnow_pairs")
    assert(maxPerNode(pp) <= 1,
      s"winnow kernel re-evaluated within one node:\n$pp")
    assert(!pp.contains("CartesianProduct"),
      s"winnow pair join must stay an equi-join on fp:\n$pp")
  }

  test("r13 session-5 plans: every winnow/eval join is an equi-join") {
    // all of these fan out over fingerprint or score keys; a planner
    // fallback to CartesianProduct would be the corpus² failure the
    // designs exist to avoid
    Seq("q_winnow_spans", "q_winnow_apply", "q_decontaminate_winnow",
        "q_content_diff", "q_classifier_auc", "q_classifier_pr",
        "q_classifier_auc_grouped", "q_mix_reweight").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q must not plan a cartesian:\n$p")
    }
  }

  test("q_pii_scan is a pure map: no joins, at most the output-sort exchange") {
    val p = plan("q_pii_scan")
    assert(!p.contains("Join"), s"pii scan must not join:\n$p")
    assert(exchanges(p) <= 1,
      s"three regex stages must stay map-side:\n$p")
  }

  test("r14 rank-scan plans: no unpartitioned windows, no cartesians") {
    // median/MAD and the stratified split rank via the keyed two-level
    // scan; a planner regression to one global WindowExec would
    // serialize the biggest group/stratum onto one task
    Seq("q_median_mad", "q_split_stratified", "q_reliability",
        "q_calibration_ece", "q_label_agreement").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q must not plan a cartesian (1-row stat riders broadcast):\n$p")
      // the keyed scans partition every window by (group, bucket); an
      // unpartitioned WindowExec (the serialize-the-stratum failure)
      // renders as an empty windowspecdefinition partition list
      assert(!p.contains("windowspecdefinition()"),
        s"$q must not run an unpartitioned window:\n$p")
    }
  }

  test("r15 plans: composed pipeline, whitening, ranking eval, winsorize — no cartesians") {
    // q_pipeline_e2e composes five stage frames; a cartesian anywhere
    // in the chain (a lost join key in the survivor handoffs, the mix
    // threshold join degrading) is the corpus² failure at 100 TB.
    // q_embed_whiten's corpus side is map+aggregate only; the model
    // rides as plan literals, so no join at all should survive
    // optimization on the processed-output plan's corpus path.
    // q_winsorize's G-row bounds must come back as a broadcast join,
    // q_ranking_eval's weight/truth joins are eval-bounded equi-joins.
    Seq("q_pipeline_e2e", "q_embed_whiten", "q_ranking_eval",
        "q_winsorize").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q must not plan a cartesian:\n$p")
      assert(!p.contains("windowspecdefinition()"),
        s"$q must not run an unpartitioned window:\n$p")
    }
    val pw = plan("q_winsorize")
    assert(pw.contains("BroadcastHashJoin"),
      s"winsorize bounds must broadcast back onto the rows:\n$pw")
  }

  test("every registered query emits flat scalar-sortable columns only") {
    // The driver's oracle harness sorts result columns with pandas:
    // array/struct/map cells arrive as numpy arrays / dicts and throw
    // `unhashable type` (the r15 q_embed_whiten red), and raw binary
    // arrives as unhashable bytearray. This is the output-shape
    // contract r15's verdict asked to enforce mechanically: vector-
    // valued results must be posexploded to long form (the
    // q_embed_train `(node, d, v)` shape) and payload bytes projected
    // through sha2 before registration. check_oracle.py enforces the
    // same rule at the gate; this case makes `sbt test` red without a
    // verify run.
    import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType, StructType}
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, f) =>
      f(spark, sfDir).schema.fields.collect {
        case fld if fld.dataType.isInstanceOf[ArrayType] ||
          fld.dataType.isInstanceOf[MapType] ||
          fld.dataType.isInstanceOf[StructType] ||
          fld.dataType == BinaryType =>
          s"$name.${fld.name}: ${fld.dataType.simpleString}"
      }
    }
    assert(bad.isEmpty,
      s"registered queries with driver-unsortable output columns:\n${bad.mkString("\n")}")
  }
}
