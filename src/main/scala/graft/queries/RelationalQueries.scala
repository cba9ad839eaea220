package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{AsOf, CoLocated, RangeJoin, Sessionize}

/** Relational engine surface (SURVEY.md §2 R1-R19). Every query has a
  * DuckDB oracle; see §5 for the determinism rules used throughout:
  * per-row double arithmetic is left raw (IEEE ops are bit-exact across
  * engines for identical expression shape), aggregate sums go through
  * decimal(38,4) and come back as double, every result has a total
  * ORDER BY.
  */
object RelationalQueries {

  /** Table loader. Normalizes the event-time column to the engine's
    * canonical representation: `ts` is Long nanoseconds since epoch.
    * The testdata has carried `ts` as parquet TIMESTAMP(NANOS) (read as
    * Long under older Sparks' `nanosAsLong`) and as TIMESTAMP(MICROS)
    * NTZ (Spark 4.1.2+); both resolve here to the same Long-nanos
    * column, matching the DuckDB oracle's `epoch_ns(ts)`. A `ts` that
    * already loads as Long passes through untouched.
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.TimestampType) |
           Some(org.apache.spark.sql.types.TimestampNTZType) =>
        // session tz is UTC, so NTZ->timestamp is the identity wall clock
        df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      case _ => df
    }
  }

  /** Collision-proof table-name key for a corpus dir (md5 prefix —
    * String.hashCode collides across dirs, which would silently serve
    * one corpus's memoized table to another). */
  def dirKey(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString

  /** Exact decimal-accumulated sum surfaced as double. */
  def dsum(c: Column): Column = sum(c.cast("decimal(38,4)")).cast("double")

  /** 60 s session gap / 1 h salt bucket (both in event-time nanos). */
  val GapNs = 60000000000L
  val BucketNs = 3600000000000L

  /** Bucketed purchase/click twin tables for the co-located as-of —
    * written once per (JVM, corpus dir): the write IS the shuffle
    * budget, every probe after it is exchange-free (the same
    * amortization contract as the pair table and the lexical index). */
  private val asofBucketedMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
  private def asofBucketed(s: SparkSession, dir: String): (String, String) =
    asofBucketedMemo.computeIfAbsent(dir, d => {
      val ev = t(s, d, "events")
      val lt = "graft_asofl_" + dirKey(d)
      val rt = "graft_asofr_" + dirKey(d)
      CoLocated.writeBucketed(ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts", "value"), lt, 8, "user_id")
      CoLocated.writeBucketed(ev.filter(col("event_type") === "click")
        .select("user_id", "event_id", "ts", "value"), rt, 8, "user_id")
      (lt, rt)
    })

  /** Untimed memo warm-up (see [[CurationQueries.prime]]): the
    * bucketed as-of twin tables. */
  def prime(s: SparkSession, dir: String, names: Set[String]): Unit =
    if (names("q_asof_colocated")) { asofBucketed(s, dir); () }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R1: scan + filter + project; filter and pruning reach the parquet
    // scan (PushedFilters in explain).
    "q_filter_project" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1995-06-01").cast("timestamp") &&
          col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // R2: TPC-H Q1-style pricing summary (map-side partial agg).
    "q_agg_pricing" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1995-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // R3: exact distinct counting.
    "q_count_distinct" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },

    // R4: fact-fact join on the order key. Orders grows with the data, so
    // it must NOT be broadcast (driver/executor OOM at scale); AQE picks a
    // shuffled hash/sort-merge join on l_orderkey. Explicit broadcast is
    // reserved for true fixed-size dims (see q_join_multi).
    "q_join_broadcast" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy("o_orderpriority")
    },

    // R5: star multi-join (region-nation-customer-orders-lineitem).
    // Only the FIXED-cardinality dims (nation=25, region=5 rows at every
    // scale factor) carry an explicit broadcast hint. customer grows with
    // SF (150k rows x SF — multi-GB at the 100x contract), so its join
    // strategy is left to size stats/AQE: broadcast while it fits under
    // autoBroadcastJoinThreshold, shuffled hash/sort-merge beyond. A
    // forced broadcast(c) here would be an un-backoutable driver OOM at
    // scale (same rule as q_join_broadcast's orders side, fixed in r3).
    "q_join_multi" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("r_name", "n_name")
    },

    // R6b (r11): LEFT OUTER join with zero-groups (TPC-H Q13 shape) —
    // the null-semantics gate the inner/semi/anti family doesn't
    // cover: customers with NO orders must survive the join and count
    // as 0 (count(col) skips nulls), then the per-customer counts
    // histogram. Both sides grow with SF → shuffled join on custkey,
    // NO broadcast hint; the second agg is distribution-sized.
    "q_join_outer" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy("n_orders")
        .agg(count(lit(1)).as("n_custs"))
        .orderBy("n_orders")
    },

    // R5b: shipping-priority composite (TPC-H Q3 shape): selective
    // filters on both join sides reach the scans, agg on the join key,
    // global top-10 via TakeOrderedAndProject.
    "q_top_orders" -> { (s, dir) =>
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_orderdate", "revenue")
    },

    // R5c: returned-item report (TPC-H Q10 shape): filtered fact,
    // two joins, agg per customer, top-20.
    "q_returned_customers" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_items")
    },

    // R6a: semi join (EXISTS).
    "q_semi_join" -> { (s, dir) =>
      val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 150000.0)
      t(s, dir, "customer")
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // R6b: anti join (NOT EXISTS) — parts never shipped in bulk.
    "q_anti_join" -> { (s, dir) =>
      val bulk = t(s, dir, "lineitem").filter(col("l_quantity") >= 48.0)
      t(s, dir, "part")
        .join(bulk, col("p_partkey") === col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    },

    // R7: global top-k — TakeOrderedAndProject, no full sort.
    "q_topk" -> { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(20)
    },

    // R8: distinct.
    "q_distinct" -> { (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    },

    // R45: one-pass column profiler (Observe.profileTable) — per
    // column null count, exact NDV, portable min/max rendering, all
    // columns of `orders` in ONE job (multi-count-distinct via one
    // Expand). The 100 TB daily path is the HLL twin
    // profileTableApprox (no Expand), gated against this exact run in
    // ObserveSpec. Mixed types exercised: bigint, string, double
    // (micro-quantized repr), timestamp (epoch-micros repr).
    "q_profile" -> { (s, dir) =>
      graft.operators.Observe.profileTable(t(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"))
        .orderBy("column_name")
    },

    // R45b: mergeable profile store — per-month profile rows (counts
    // + HLL NDV sketch + typed min/max slots) folded back to one
    // profile WITHOUT rescanning the table (the R17c mergeable-rollup
    // discipline applied to profiling). Oracled on columns whose NDV
    // sits in the sketch-exact regime (the q_sketch_rollup rule);
    // numeric slots + estimate tolerance are gated in ObserveSpec.
    "q_profile_merged" -> { (s, dir) =>
      val l = t(s, dir, "lineitem")
      val parts = graft.operators.Observe.profileByPartition(l,
        date_format(col("l_shipdate").cast("timestamp"), "yyyy-MM"),
        Seq("l_returnflag", "l_linenumber", "l_quantity"))
      graft.operators.Observe.mergeProfiles(parts)
        .orderBy("column_name")
    },

    // R52: partition-incremental aggregate table — the delta-priced
    // rollup-maintenance pattern: build the standing rollup from every
    // month but the last, then the last month "arrives" and refreshes
    // ONLY its partition (twice — a replayed retry must be a no-op:
    // partials REPLACE, never accumulate), and the merged read equals
    // a from-scratch aggregation of the whole fact table (the oracle).
    // State is rollup-sized (months x flag x status); the fact table
    // leaves the cost model after its one build/refresh pass.
    "q_agg_incremental" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val part = date_format(col("l_shipdate").cast("timestamp"), "yyyy-MM")
      val keys = Seq("l_returnflag", "l_linestatus")
      val p = "spark-warehouse/graft_aggincr_" + dirKey(dir)
      val lastMonth = li.agg(max(part)).head().getString(0)
      graft.operators.Observe.buildAggTable(
        li.filter(part < lastMonth), p, part, keys, "l_quantity")
      val slice = li.filter(part === lastMonth)
      graft.operators.Observe.refreshAggPartitions(
        slice, p, part, keys, "l_quantity")
      graft.operators.Observe.refreshAggPartitions(
        slice, p, part, keys, "l_quantity")
      graft.operators.Observe.readAggTable(s, p, keys)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("n_rows"),
          col("sum_val").cast("long").as("sum_qty"),
          col("min_val").cast("long").as("min_qty"),
          col("max_val").cast("long").as("max_qty"),
          expr("cast(sum_val * 1000000 as bigint) div n_rows")
            .as("avg_qty_micro"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // R52b: coarser-grain read off the SAME month partials — year
    // rollups without touching the fact table (the decomposable-
    // partials payoff: any grain at or above the partition grain is
    // a rollup-sized fold). Oracle = from-scratch year aggregation.
    "q_agg_rollup_read" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val part = date_format(col("l_shipdate").cast("timestamp"), "yyyy-MM")
      val p = "spark-warehouse/graft_aggroll_" + dirKey(dir)
      graft.operators.Observe.buildAggTable(
        li, p, part, Seq("l_returnflag"), "l_quantity")
      graft.operators.Observe.readAggTableAt(s, p,
          substring(col("part"), 1, 4), Seq("l_returnflag"))
        .select(col("grain").as("ship_year"), col("l_returnflag"),
          col("n_rows"),
          col("sum_val").cast("long").as("sum_qty"),
          col("min_val").cast("long").as("min_qty"),
          col("max_val").cast("long").as("max_qty"))
        .orderBy("ship_year", "l_returnflag")
    },

    // R45c: mergeable QUANTILE profile store — per-month KLL sketch
    // rows folded to whole-table order statistics WITHOUT rescanning
    // (the R45b discipline extended to quantiles). Gate-SF row counts
    // (60k) sit under the sketch's k=65535 exact regime, so the whole
    // chain — per-partition sketch build, binary serialization, union
    // merge, INCLUSIVE-rank read — reproduces exact order statistics
    // and hash-oracles; at 100 TB the same code is ~0.01% rank error.
    "q_quantile_profile" -> { (s, dir) =>
      val l = t(s, dir, "lineitem")
      val parts = graft.operators.Observe.quantilesByPartition(l,
        date_format(col("l_shipdate").cast("timestamp"), "yyyy-MM"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
      graft.operators.Observe.mergeQuantileProfiles(parts,
          Seq(250000L, 500000L, 750000L, 950000L))
        .orderBy("column_name", "p_ppm")
    },

    // R46: coordinated (join-consistent) sampling — orders and
    // lineitem sampled on the SAME md5(orderkey) decision, so the
    // join of the samples IS the sample of the join (independent
    // sampling keeps f² of joined rows). Aggregate over the sampled
    // join proves referential integrity survived: every sampled order
    // keeps ALL its lineitems.
    "q_sample_coordinated" -> { (s, dir) =>
      val Seq(so, sl) = graft.operators.Mix.coordinatedSample(0.25,
        Seq(t(s, dir, "orders") -> "o_orderkey",
          t(s, dir, "lineitem") -> "l_orderkey"))
      so.join(sl, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count_distinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast("decimal(38,4)")).cast("double")
            .as("sum_qty"))
        .orderBy("o_orderstatus")
    },

    // R9: ranked window, top-3 per partition.
    "q_window_rank" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    },

    // R10: running aggregate over an event journal (decimal-exact).
    "q_window_running" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("running_value",
          sum(col("value").cast("decimal(38,4)")).over(w).cast("double"))
        .select("user_id", "event_id", "value", "running_value")
        .orderBy("user_id", "event_id")
    },

    // R10b: lag/lead navigation over the event journal.
    "q_window_lag" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          lag("value", 1).over(w).as("prev_value"),
          lead("value", 1).over(w).as("next_value"),
          (col("value") - lag("value", 1).over(w)).as("delta"))
        .orderBy("user_id", "event_id")
    },

    // R20: batch sessionization (gaps-and-islands) - the oracled twin
    // of QueueStreaming.sessionize: a 60s event-time silence starts a
    // new session. ts is Long nanos (see GraftSession).
    "q_sessionize" -> { (s, dir) =>
      Sessionize.plain(t(s, dir, "events"), "user_id", GapNs)
    },

    // R20b: the skew-resistant sessionize — identical output (same
    // oracle SQL as q_sessionize; hash-match proves the plans agree),
    // but windows are bounded to (user, 1h bucket) so a hot user can't
    // serialize a whole partition.
    "q_sessionize_salted" -> { (s, dir) =>
      Sessionize.salted(t(s, dir, "events"), "user_id", GapNs, BucketNs)
    },

    // R20e: Spark's BUILT-IN session_window as a third twin — same
    // oracle as q_sessionize, so the hash gate proves the native
    // operator, the textbook windows, and the salted rewrite all
    // agree. (Boundary note: the builtin opens a new session at an
    // EXACTLY-gap-sized silence while the lag formulation keeps it;
    // the data has no exact-gap adjacent pairs, verified.)
    "q_session_window" -> { (s, dir) =>
      val sessW = Window.partitionBy("user_id").orderBy(col("w.start"))
      t(s, dir, "events")
        .withColumn("tss", timestamp_micros(expr("ts div 1000")))
        .groupBy(col("user_id"), session_window(col("tss"), "60 seconds").as("w"))
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"),
          floor((max("ts") - min("ts")) / 1000000.0).as("duration_ms"))
        .withColumn("sess_id", row_number().over(sessW).cast("long"))
        .select("user_id", "sess_id", "n_events", "sum_value", "duration_ms")
        .orderBy("user_id", "sess_id")
    },

    // R20f: incremental sessionization — the daily-append path. The
    // log splits at an 80% event-time cutoff: history is sessionized
    // into mergeable frames ONCE, the tail batch is sessionized alone,
    // and the two meet in a one-row-per-user boundary join (no history
    // re-shuffle — the 100 TB daily-ingest economics). Shares
    // q_sessionize's oracle: the hash gate proves incremental ≡ full
    // re-sessionization of the complete log.
    "q_sessionize_inc" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val bounds = ev.agg(min("ts"), max("ts")).head
      val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
      val cutoff = mn + (mx - mn) / 5L * 4L
      // r17 (§2.4): both halves' frames from ONE event scan + ONE
      // window pass (was two filtered scans, each with its own window
      // ladder); the global ts cutoff is a per-user time boundary, so
      // the split frames equal the per-half sessionFrames exactly.
      // Pinned once — prior and batch slices both read the frames.
      val framed = graft.operators.Lineage.pin(
        Sessionize.sessionFramesSplit(ev, "user_id", GapNs,
          col("ts") >= cutoff))
      Sessionize.finishFrames(
        Sessionize.incrementalFrames(
          framed.filter(!col("__side")).drop("__side"),
          framed.filter(col("__side")).drop("__side"),
          "user_id", GapNs), "user_id")
    },

    // R20c/R20d: the skew before/after pair. The hot-key remap puts
    // ~50% of events on user 0; _hot runs the textbook plan (one task
    // sorts half the table), _hot_salted the bucketed plan. Same
    // oracle SQL shape, so both are hash-gated; the bench delta is the
    // skew evidence.
    "q_sessionize_hot" -> { (s, dir) =>
      Sessionize.plain(Sessionize.hotKeyed(t(s, dir, "events"), "user_id"),
        "user_id", GapNs)
    },
    "q_sessionize_hot_salted" -> { (s, dir) =>
      Sessionize.salted(Sessionize.hotKeyed(t(s, dir, "events"), "user_id"),
        "user_id", GapNs, BucketNs)
    },

    // R22: as-of join — each purchase matched to the user's most
    // recent click at or before it (union+window plan: one shuffle on
    // user_id, no range cross-join).
    "q_asof_join" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "event_id", "ts", "value")
      AsOf.join(purchases, clicks, Seq("user_id"), "ts", "ts", "event_id",
          Seq("event_id", "value"), outPrefix = "match_")
        .select(col("user_id"), col("event_id"), col("value"),
          col("match_event_id"), col("match_value"))
        .orderBy("user_id", "event_id")
    },

    // R58 (r16): first/last-touch attribution — every purchase gets
    // the first and last click of the same user inside a trailing
    // 24h window, plus the touch count; candidates via the R23
    // bucketed range join (lookback-sized buckets → ≤2 rows per
    // conversion interval), never a per-user cross join.
    "q_attribution" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
      val clicks = ev.filter(col("event_type") === "click")
      AsOf.attribution(purchases, clicks, Seq("user_id"),
          "ts", "event_id", "ts", "event_id",
          lookback = 86400L * 1000000000L)
        .orderBy("user_id", "conv_id")
    },

    // R21b: co-located as-of join — the SAME semantics as q_asof_join
    // over both sides pre-bucketed on user_id (write-once shuffle,
    // zero-Exchange probes thereafter; the repeated-probe shape at
    // 100 TB). The oracle is IDENTICAL to q_asof_join's, so the hash
    // gate proves the physical rewrite is value-transparent.
    "q_asof_colocated" -> { (s, dir) =>
      val (lt, rt) = asofBucketed(s, dir)
      CoLocated.asOfJoinBucketed(s, lt, rt, Seq("user_id"), "ts", "ts",
          "event_id", Seq("event_id", "value"), outPrefix = "match_")
        .select(col("user_id"), col("event_id"), col("value"),
          col("match_event_id"), col("match_value"))
        .orderBy("user_id", "event_id")
    },

    // R23: bucketed range join — each error event matched into its
    // containing session interval. Intervals explode per 1h bucket;
    // the join is a pure equi-join on (user, bucket) + residual
    // between (no key-only skew join, no cross join).
    "q_range_join" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val bounds = Sessionize.withSessionIds(ev, "user_id", GapNs)
        .groupBy(col("user_id"), col("sess_id"))
        .agg(min("ts").as("start_ts"), max("ts").as("end_ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select("user_id", "event_id", "ts")
      RangeJoin.byBucket(errors, bounds, Seq("user_id"),
          "ts", "start_ts", "end_ts", BucketNs)
        .select(col("user_id"), col("event_id"), col("sess_id"))
        .orderBy("user_id", "event_id")
    },

    // R22b: as-of join with a 1h tolerance — stale matches expire
    // (pandas merge_asof tolerance semantics).
    "q_asof_tolerance" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "event_id", "ts", "value")
      AsOf.join(purchases, clicks, Seq("user_id"), "ts", "ts", "event_id",
          Seq("event_id", "value"), outPrefix = "match_",
          tolerance = 3600000000000L)
        .select(col("user_id"), col("event_id"), col("value"),
          col("match_event_id"), col("match_value"))
        .orderBy("user_id", "event_id")
    },

    // R11: rollup hierarchy totals.
    "q_rollup" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("cnt"), col("sum_qty"))
        .orderBy("rf", "ls")
    },

    // R11b: cube - all grouping-set combinations.
    "q_cube" -> { (s, dir) =>
      t(s, dir, "events")
        .cube(col("event_type"), (col("user_id") % 10).as("user_mod0"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        .select(coalesce(col("event_type"), lit("ALL")).as("etype"),
          coalesce(col("user_mod0"), lit(-1L)).as("user_mod"),
          col("cnt"), col("sum_value"))
        .orderBy("etype", "user_mod")
    },

    // R12: conditional aggregation.
    "q_case_agg" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(
          dsum(when(col("event_type") === "purchase", col("value")).otherwise(0.0))
            .as("purchase_value"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },

    // R13: HAVING.
    "q_having" -> { (s, dir) =>
      t(s, dir, "customer")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
        .filter(col("n_cust") >= 3)
        .orderBy("c_nationkey")
    },

    // R14: union all of heterogeneous sources.
    "q_union" -> { (s, dir) =>
      val c = t(s, dir, "customer")
        .select(lit("customer").as("kind"), col("c_custkey").as("key"),
          col("c_acctbal").as("balance"))
      val su = t(s, dir, "supplier")
        .select(lit("supplier").as("kind"), col("s_suppkey").as("key"),
          col("s_acctbal").as("balance"))
      c.unionAll(su).orderBy("kind", "key")
    },

    // R15: JSON extraction from the event payload.
    "q_json_extract" -> { (s, dir) =>
      t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("k")
    },

    // R15b: semi-structured access via Spark 4's VariantType —
    // parse_json once, typed variant_get extraction (the modern
    // engine-native path for schemaless props; shredded at the parquet
    // layer at scale).
    "q_variant_extract" -> { (s, dir) =>
      t(s, dir, "events")
        .select(parse_json(col("props")).as("v"))
        .select(variant_get(col("v"), "$.k", "long").as("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("k")
    },

    // R16: time bucketing of the event stream (ts is Long nanos — see
    // GraftSession nanosAsLong; integer div keeps full precision).
    "q_date_trunc" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(timestamp_micros(expr("ts div 1000")).cast("date").as("day"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy("day")
    },

    // R17: exact percentiles.
    "q_percentile" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"))
        .orderBy("event_type")
    },

    // R18: string functions.
    "q_string_funcs" -> { (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_uc"),
          substring(col("p_name"), 1, 8).as("name_pfx"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          length(col("p_name")).cast("long").as("name_len"))
        .orderBy("p_partkey")
    },

    // R3b/R17b: sketch-based approximations (HLL count-distinct,
    // quantile sketch) - the constant-memory path for 100 TB aggs
    // (rows-only: sketch internals are engine-specific; error bounds
    // asserted in SketchSpec).
    "q_approx_sketch" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50_approx"),
          count(lit(1)).as("n_rows"))
        .orderBy("event_type")
    },

    // R3c (r11): the EXACT-REGIME hash gate for Spark's native
    // sketches — the R17c trick applied to approx_count_distinct
    // (HLL++) and percentile_approx (Greenwald-Khanna), closing the
    // q_approx_sketch rows-only gap as far as it can be closed:
    // - distinct-count input folded to 32 residue classes: at p=12
    //   (rsd 0.02, 4096 registers) the 32 fixed hash values land in 32
    //   DISTINCT registers (measured across sf0.001/0.01/0.1; the
    //   first collision appears at 64 classes), so linear counting
    //   returns the true distinct count exactly;
    // - percentile_approx with accuracy=10000: below the summary's
    //   compression threshold every sample is retained, so query(0.5)
    //   is the exact lower-median ELEMENT — DuckDB's quantile_disc.
    //   Holds while per-group n <= 10k (gate SF: n≈2k; measured).
    // The approximate regime (full-cardinality HLL++ error bounds)
    // stays gated in SketchSpec via q_approx_sketch rows-only.
    "q_approx_sketch_exact" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(pmod(col("user_id"), lit(32L)), 0.02)
            .as("mod_users"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50_disc"),
          count(lit(1)).as("n_rows"))
        .orderBy("event_type")
    },

    // R17c: mergeable-sketch rollup — the 100 TB pattern: per-day
    // DataSketches HLL tables are tiny and union to ANY coarser grain
    // without rescanning raw data (a re-aggregable distinct-count,
    // which plain approx_count_distinct output is not). Oracled in the
    // exact regime (r8): at the gate SF the user cardinality sits in
    // DataSketches' list/set mode where estimates ARE exact counts —
    // the DuckDB exact-distinct oracle hash-proves the per-day
    // sketch + union plumbing. Approx-regime error bound stays in
    // SketchSpec.
    "q_sketch_rollup" -> { (s, dir) =>
      val daily = t(s, dir, "events")
        .groupBy(timestamp_micros(expr("ts div 1000")).cast("date").as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"),
          count(lit(1)).as("n_events"))
      daily.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"),
        sum("n_events").as("n_events"),
        count(lit(1)).as("n_days"))
    },

    // R44: per-user debounce — collapse each burst of events closer
    // than 10s into its FIRST event (the telemetry noise-gate:
    // double-clicks, retry storms). True debounce is a sequential
    // recurrence (kept depends on the previous KEPT event, so a plain
    // lag filter over-drops chains) — but a burst IS a session with
    // gap = the debounce window, so the exact semantics fall out of
    // the sessionize machinery: keep each (user, sess_id)'s first row.
    "q_debounce" -> { (s, dir) =>
      // kept events = burst firsts = session count = max(sess_id):
      // one window pass, one aggregate, no second scan
      Sessionize.withSessionIds(t(s, dir, "events"), "user_id", 10000000000L)
        .groupBy("user_id")
        .agg(max("sess_id").as("n_kept"), count(lit(1)).as("n_raw"))
        .withColumn("kept_per_mille", expr("n_kept * 1000 div n_raw"))
        .orderBy("user_id")
    },

    // R29b: trailing 3-day distinct users, EXACT — the sliding
    // distinct-count question (rolling actives). Shape: (day, user)
    // distinct pairs SCATTER to the ≤3 windows they cover (explode of
    // a 3-element sequence — linear row growth, no range join), then
    // one distinct-agg per window day; phantom windows beyond the day
    // domain are dropped by the day-domain join.
    "q_rolling_distinct" -> { (s, dir) =>
      val dayNs = 86400000000000L
      val du = t(s, dir, "events")
        .select(expr(s"ts div ${dayNs}L").as("day_idx"), col("user_id"))
        .distinct()
      val days = du.select(col("day_idx").as("w_day")).distinct()
      du.select(explode(sequence(col("day_idx"), col("day_idx") + 2))
          .as("w_day"), col("user_id"))
        .join(days, "w_day")
        .groupBy("w_day")
        .agg(countDistinct(col("user_id")).as("n_users_3d"))
        .orderBy("w_day")
    },

    // R29c: the same trailing window from MERGEABLE per-day HLL
    // partials — at 100 TB you persist one tiny sketch per (day) and
    // answer ANY trailing window by merging ≤3 of them, never
    // re-touching raw events. Shares q_rolling_distinct's oracle: the
    // user cardinality sits in the sketch's exact regime (same
    // contract as q_sketch_rollup), so the hash gate proves the
    // sketch path ≡ the exact path here.
    "q_rolling_distinct_sketch" -> { (s, dir) =>
      val dayNs = 86400000000000L
      val daily = t(s, dir, "events")
        .withColumn("day_idx", expr(s"ts div ${dayNs}L"))
        .groupBy("day_idx")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val days = daily.select(col("day_idx").as("w_day")).distinct()
      daily.select(explode(sequence(col("day_idx"), col("day_idx") + 2))
          .as("w_day"), col("sk"))
        .join(days, "w_day")
        .groupBy("w_day")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n_users_3d"))
        .orderBy("w_day")
    },

    // R19: correlated-EXISTS aggregate (semi join + agg).
    "q_exists_agg" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_active_cust"))
        .orderBy("c_nationkey")
    },

    // R19b (r16): correlated-AGGREGATE filter (TPC-H Q17 shape) —
    // small-order revenue: lines whose quantity sits under 20% of
    // their part's average. The correlated avg decorrelates to ONE
    // per-part aggregate + an equi-join on partkey (never a per-row
    // subquery), and the 20%-of-avg predicate cross-multiplies to
    // integers (5·qty·cnt < sum_qty) so the filter is exact — no
    // float avg to disagree on. Revenue in cents, decimal-widened.
    "q_small_orders" -> { (s, dir) =>
      val l = t(s, dir, "lineitem").select(col("l_partkey"),
        expr("cast(l_quantity as bigint)").as("qty"),
        expr("cast(floor(l_extendedprice * 100) as bigint)").as("cents"))
      val perPart = l.groupBy("l_partkey")
        .agg(sum("qty").as("sum_qty"), count(lit(1)).as("cnt"))
      l.join(perPart, "l_partkey")
        .filter(lit(5L) * col("qty") * col("cnt") < col("sum_qty"))
        .agg(count(lit(1)).as("n_small"),
          sum(col("cents").cast("decimal(38,0)")).cast("long")
            .as("lost_cents"))
    })

  /** flagged/sessions/sframes CTE body (no leading WITH) producing the
    * per-session frames `(user_id, sess_id, start_ts, end_ts)` over
    * `events` — the oracle twin of `Sessionize.sessionFrames`, kept in
    * LOCKSTEP with [[sessionizeSql]]'s gap rule. Used by the R39
    * concurrency oracle in AnalyticsQueries. */
  private[queries] val sessionFramesCteSql: String =
    """flagged AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS tns,
      |    CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts), 1) OVER w > 60000000000
      |           THEN 1
      |         WHEN LAG(epoch_ns(ts), 1) OVER w IS NULL THEN 1
      |         ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
      |sessions AS (
      |  SELECT user_id, tns,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tns, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM flagged),
      |sframes AS (
      |  SELECT user_id, sess_id, MIN(tns) AS start_ts, MAX(tns) AS end_ts
      |  FROM sessions GROUP BY user_id, sess_id)""".stripMargin

  /** Trailing 3-day distinct-user oracle (R29b/R29c): the same
    * scatter-to-covering-windows replay, windows restricted to real
    * days. */
  private val rollingDistinctSql: String =
    """WITH du AS (
      |  SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day_idx, user_id
      |  FROM events),
      |days AS (SELECT DISTINCT day_idx FROM du),
      |sc AS (
      |  SELECT du.user_id, du.day_idx + i AS w_day
      |  FROM du, UNNEST(range(0, 3)) AS u(i))
      |SELECT d.day_idx AS w_day,
      |  CAST(COUNT(DISTINCT s.user_id) AS BIGINT) AS n_users_3d
      |FROM days d JOIN sc s ON s.w_day = d.day_idx
      |GROUP BY d.day_idx ORDER BY w_day""".stripMargin

  /** Hot-key remap source (matches Sessionize.hotKeyed). */
  private val HotRemapSql =
    """(SELECT CASE WHEN user_id % 2 = 0 THEN 0 ELSE user_id END AS user_id,
      |        event_id, value, ts FROM events)""".stripMargin

  /** Shared sessionize oracle over any `events`-shaped source. */
  private def sessionizeSql(src: String): String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, value, epoch_ns(ts) AS tns,
       |    CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts), 1) OVER w > 60000000000
       |           THEN 1
       |         WHEN LAG(epoch_ns(ts), 1) OVER w IS NULL THEN 1
       |         ELSE 0 END AS new_sess
       |  FROM $src
       |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
       |sessions AS (
       |  SELECT user_id, event_id, value, tns,
       |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tns, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
       |  FROM flagged)
       |SELECT user_id, sess_id, COUNT(*) AS n_events,
       |  CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value,
       |  CAST(FLOOR((MAX(tns) - MIN(tns)) / 1000000.0) AS BIGINT) AS duration_ms
       |FROM sessions GROUP BY user_id, sess_id
       |ORDER BY user_id, sess_id""".stripMargin

  /** The union+window as-of replay — shared by q_asof_join (logical
    * AsOf.join) and q_asof_colocated (the bucketed zero-Exchange
    * physical plan): SAME semantics, SAME oracle, different plan —
    * the hash gate proves the physical rewrite changes nothing. */
  private val asofWindowOracleSql: String =
    """WITH u AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS tns, value, 1 AS side,
      |         CAST(NULL AS BIGINT) AS r_event_id, CAST(NULL AS DOUBLE) AS r_value
      |  FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, event_id, epoch_ns(ts) AS tns, value, 0 AS side,
      |         event_id AS r_event_id, value AS r_value
      |  FROM events WHERE event_type = 'click'),
      |m AS (
      |  SELECT user_id, event_id, value, side,
      |    LAST_VALUE(r_event_id IGNORE NULLS) OVER w AS match_event_id,
      |    LAST_VALUE(r_value IGNORE NULLS) OVER w AS match_value
      |  FROM u
      |  WINDOW w AS (PARTITION BY user_id ORDER BY tns, side, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT user_id, event_id, value, match_event_id, match_value
      |FROM m WHERE side = 1 ORDER BY user_id, event_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // R58: the attribution replay — candidate pairs via the window
    // predicate directly (DuckDB's optimizer handles the small gate
    // corpus; the Spark side's bucketed equi-join must land on the
    // same pairs), first/last via the same (ts, id) rank tiebreaks.
    "q_attribution" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS conv_id, epoch_ns(ts) AS conv_ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, event_id AS touch_id, epoch_ns(ts) AS tts
        |  FROM events WHERE event_type = 'click'),
        |cand AS (
        |  SELECT p.user_id, p.conv_id, p.conv_ts, c.touch_id, c.tts
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND c.tts >= p.conv_ts - 86400000000000 + 1
        |    AND c.tts <= p.conv_ts),
        |rk AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY conv_id
        |      ORDER BY tts ASC, touch_id ASC) AS rf,
        |    ROW_NUMBER() OVER (PARTITION BY conv_id
        |      ORDER BY tts DESC, touch_id DESC) AS rl
        |  FROM cand),
        |att AS (
        |  SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_touches,
        |    MAX(CASE WHEN rf = 1 THEN touch_id END) AS first_touch_id,
        |    MAX(CASE WHEN rf = 1 THEN tts END) AS first_ts,
        |    MAX(CASE WHEN rl = 1 THEN touch_id END) AS last_touch_id,
        |    MAX(CASE WHEN rl = 1 THEN tts END) AS last_ts
        |  FROM rk GROUP BY conv_id)
        |SELECT p.user_id, p.conv_id, p.conv_ts,
        |  COALESCE(a.n_touches, 0) AS n_touches,
        |  COALESCE(a.first_touch_id, -1) AS first_touch_id,
        |  COALESCE(a.first_ts, -1) AS first_ts,
        |  COALESCE(a.last_touch_id, -1) AS last_touch_id,
        |  COALESCE(a.last_ts, -1) AS last_ts
        |FROM p LEFT JOIN att a USING (conv_id)
        |ORDER BY user_id, conv_id""".stripMargin,

    // R19b: the Q17-shape replay — same decorrelated per-part
    // aggregate and the cross-multiplied integer predicate.
    "q_small_orders" ->
      """WITH l AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem),
        |p AS (
        |  SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS sum_qty,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM l GROUP BY l_partkey)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
        |  CAST(SUM(CAST(l.cents AS HUGEINT)) AS BIGINT) AS lost_cents
        |FROM l JOIN p USING (l_partkey)
        |WHERE 5 * l.qty * p.cnt < p.sum_qty""".stripMargin,

    // R21b: identical oracle as q_asof_join — see asofWindowOracleSql.
    "q_asof_colocated" -> asofWindowOracleSql,
    // R3b/R17b: PINNED-VALUE oracle (closes the last relational
    // no_oracle row). HLL++ and Greenwald-Khanna internals are
    // engine-specific but deterministic per input, so the sketch
    // outputs are frozen from a verified run (PinnedOracles, generated
    // by tools/gen_pinned_oracles.py) while n_rows is recomputed from
    // the parquet — a testdata change fails rows/hash loudly instead
    // of silently re-pinning. Error bounds vs exact stay gated in
    // SketchSpec; the exact regime is hash-proven by
    // q_approx_sketch_exact.
    "q_approx_sketch" ->
      s"""WITH pinned(event_type, approx_users, p50_approx) AS (VALUES
         |${PinnedOracles.approxSketchValues})
         |SELECT e.event_type,
         |  CAST(p.approx_users AS BIGINT) AS approx_users,
         |  CAST(p.p50_approx AS DOUBLE) AS p50_approx,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows
         |FROM events e JOIN pinned p ON p.event_type = e.event_type
         |GROUP BY 1, 2, 3
         |ORDER BY e.event_type""".stripMargin,
    // Exact-regime rollup oracle: user cardinality is far below the
    // sketch's list/set→HLL promotion point, so the merged estimate
    // equals the exact distinct count. Day boundaries replay the
    // micros-truncation rule (ts div 1000 on the Spark side).
    "q_sketch_rollup" ->
      """SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS approx_users,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(DISTINCT CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE))
        |    AS BIGINT) AS n_days
        |FROM events""".stripMargin,

    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        |  l_extendedprice * (1 - l_discount) AS net_price
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1995-06-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1995-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // R45 twin: same one-pass aggregates, unpivoted with UNION ALL.
    // Portable min/max reprs in lockstep with Observe.repr: integers/
    // strings as-is, doubles micro-quantized, timestamps epoch-micros.
    "q_profile" ->
      """WITH p AS (
        |  SELECT COUNT(*) AS n_rows,
        |    COUNT(o_orderkey) AS nn1, COUNT(DISTINCT o_orderkey) AS nd1,
        |      CAST(MIN(o_orderkey) AS VARCHAR) AS mn1,
        |      CAST(MAX(o_orderkey) AS VARCHAR) AS mx1,
        |    COUNT(o_custkey) AS nn2, COUNT(DISTINCT o_custkey) AS nd2,
        |      CAST(MIN(o_custkey) AS VARCHAR) AS mn2,
        |      CAST(MAX(o_custkey) AS VARCHAR) AS mx2,
        |    COUNT(o_orderstatus) AS nn3, COUNT(DISTINCT o_orderstatus) AS nd3,
        |      MIN(o_orderstatus) AS mn3, MAX(o_orderstatus) AS mx3,
        |    COUNT(o_totalprice) AS nn4, COUNT(DISTINCT o_totalprice) AS nd4,
        |      CAST(CAST(FLOOR(MIN(o_totalprice) * 1000000 + 0.5) AS BIGINT)
        |        AS VARCHAR) AS mn4,
        |      CAST(CAST(FLOOR(MAX(o_totalprice) * 1000000 + 0.5) AS BIGINT)
        |        AS VARCHAR) AS mx4,
        |    COUNT(o_orderdate) AS nn5, COUNT(DISTINCT o_orderdate) AS nd5,
        |      CAST(epoch_us(MIN(o_orderdate)) AS VARCHAR) AS mn5,
        |      CAST(epoch_us(MAX(o_orderdate)) AS VARCHAR) AS mx5,
        |    COUNT(o_orderpriority) AS nn6,
        |      COUNT(DISTINCT o_orderpriority) AS nd6,
        |      MIN(o_orderpriority) AS mn6, MAX(o_orderpriority) AS mx6
        |  FROM orders)
        |SELECT * FROM (
        |  SELECT 'o_orderkey' AS column_name, n_rows, n_rows - nn1 AS n_null,
        |    nd1 AS n_distinct, mn1 AS min_repr, mx1 AS max_repr FROM p
        |  UNION ALL SELECT 'o_custkey', n_rows, n_rows - nn2, nd2, mn2, mx2 FROM p
        |  UNION ALL SELECT 'o_orderstatus', n_rows, n_rows - nn3, nd3, mn3, mx3 FROM p
        |  UNION ALL SELECT 'o_totalprice', n_rows, n_rows - nn4, nd4, mn4, mx4 FROM p
        |  UNION ALL SELECT 'o_orderdate', n_rows, n_rows - nn5, nd5, mn5, mx5 FROM p
        |  UNION ALL SELECT 'o_orderpriority', n_rows, n_rows - nn6, nd6, mn6, mx6 FROM p)
        |ORDER BY column_name""".stripMargin,

    // R45b twin: merged per-month profiles must equal a direct
    // whole-table computation — counts/min/max are exact merges, and
    // the chosen columns' NDVs (3/7/50) sit in the HLL sketch-exact
    // coupon regime (the q_sketch_rollup rule), so plain COUNT
    // DISTINCT replays the estimate.
    // R52: the incremental rollup's merged read must equal aggregating
    // the whole fact table from scratch — the oracle IS that
    // from-scratch aggregation (build-below-cutoff + double partition
    // refresh + partial fold on the Spark side).
    "q_agg_incremental" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(COUNT(l_quantity) AS BIGINT) AS n_rows,
        |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(MIN(l_quantity) AS BIGINT) AS min_qty,
        |  CAST(MAX(l_quantity) AS BIGINT) AS max_qty,
        |  CAST(SUM(l_quantity) * 1000000 AS BIGINT)
        |    // CAST(COUNT(l_quantity) AS BIGINT) AS avg_qty_micro
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // R52b: the year-grain replay — direct aggregation at year grain.
    "q_agg_rollup_read" ->
      """SELECT strftime(l_shipdate, '%Y') AS ship_year, l_returnflag,
        |  CAST(COUNT(l_quantity) AS BIGINT) AS n_rows,
        |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(MIN(l_quantity) AS BIGINT) AS min_qty,
        |  CAST(MAX(l_quantity) AS BIGINT) AS max_qty
        |FROM lineitem
        |GROUP BY ship_year, l_returnflag
        |ORDER BY ship_year, l_returnflag""".stripMargin,

    "q_profile_merged" ->
      """WITH p AS (
        |  SELECT COUNT(*) AS n_rows,
        |    COUNT(l_returnflag) AS nn1, COUNT(DISTINCT l_returnflag) AS nd1,
        |      MIN(l_returnflag) AS mn1, MAX(l_returnflag) AS mx1,
        |    COUNT(l_linenumber) AS nn2, COUNT(DISTINCT l_linenumber) AS nd2,
        |      CAST(CAST(MIN(l_linenumber) AS BIGINT) AS VARCHAR) AS mn2,
        |      CAST(CAST(MAX(l_linenumber) AS BIGINT) AS VARCHAR) AS mx2,
        |    COUNT(l_quantity) AS nn3, COUNT(DISTINCT l_quantity) AS nd3,
        |      CAST(CAST(FLOOR(MIN(l_quantity) * 1000000 + 0.5) AS BIGINT)
        |        AS VARCHAR) AS mn3,
        |      CAST(CAST(FLOOR(MAX(l_quantity) * 1000000 + 0.5) AS BIGINT)
        |        AS VARCHAR) AS mx3
        |  FROM lineitem)
        |SELECT * FROM (
        |  SELECT 'l_returnflag' AS column_name, n_rows, n_rows - nn1 AS n_null,
        |    nd1 AS n_distinct, mn1 AS min_repr, mx1 AS max_repr FROM p
        |  UNION ALL SELECT 'l_linenumber', n_rows, n_rows - nn2, nd2, mn2, mx2 FROM p
        |  UNION ALL SELECT 'l_quantity', n_rows, n_rows - nn3, nd3, mn3, mx3 FROM p)
        |ORDER BY column_name""".stripMargin,

    // R45c twin: in the exact regime the INCLUSIVE-rank quantile is
    // the order statistic at 1-based position ceil(p·n) — replayed
    // with integer ceiling arithmetic over a ROW_NUMBER ranking.
    "q_quantile_profile" ->
      """WITH src AS (
        |  SELECT 'l_quantity' AS column_name, CAST(l_quantity AS DOUBLE) AS v
        |    FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE)
        |    FROM lineitem
        |  UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE)
        |    FROM lineitem),
        |r AS (
        |  SELECT column_name, v,
        |    ROW_NUMBER() OVER (PARTITION BY column_name ORDER BY v) AS rn,
        |    COUNT(*) OVER (PARTITION BY column_name) AS n
        |  FROM src WHERE v IS NOT NULL),
        |p AS (SELECT UNNEST([250000, 500000, 750000, 950000]) AS p_ppm)
        |SELECT r.column_name, CAST(p.p_ppm AS BIGINT) AS p_ppm, r.v AS q,
        |  CAST(r.n AS BIGINT) AS n
        |FROM r JOIN p ON r.rn = (p.p_ppm * r.n + 999999) // 1000000
        |ORDER BY column_name, p_ppm""".stripMargin,

    // R46 twin: the same md5(key) membership decision on both tables
    // (thr(0.25) = 64/256 = hex '40'), then the joined aggregate.
    "q_sample_coordinated" ->
      """WITH so AS (SELECT * FROM orders
        |  WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '40'),
        |sl AS (SELECT * FROM lineitem
        |  WHERE substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 2) < '40')
        |SELECT o_orderstatus,
        |  COUNT(DISTINCT o_orderkey) AS n_orders,
        |  COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
        |FROM so JOIN sl ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
        |  COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_join_broadcast" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join_multi" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q_top_orders" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q_returned_customers" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND l_quantity >= 48.0)
        |ORDER BY p_partkey""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q_window_running" ->
      """SELECT user_id, event_id, value,
        |  CAST(SUM(CAST(value AS DECIMAL(38,4))) OVER (
        |    PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q_window_lag" ->
      """SELECT user_id, event_id, value,
        |  LAG(value, 1) OVER w AS prev_value,
        |  LEAD(value, 1) OVER w AS next_value,
        |  value - LAG(value, 1) OVER w AS delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_sessionize" -> sessionizeSql("events"),
    // identical oracle: the salted plan must reproduce the plain result
    "q_sessionize_salted" -> sessionizeSql("events"),
    // and so must Spark's built-in session_window operator
    "q_session_window" -> sessionizeSql("events"),
    // Incremental ≡ full recompute: same oracle as q_sessionize.
    "q_sessionize_inc" -> sessionizeSql("events"),

    // R44: burst = session at gap 10s; kept = one per session.
    "q_debounce" ->
      """WITH flagged AS (
        |  SELECT user_id,
        |    CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts), 1) OVER w > 10000000000
        |           THEN 1
        |         WHEN LAG(epoch_ns(ts), 1) OVER w IS NULL THEN 1
        |         ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
        |k AS (SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_kept,
        |        COUNT(*) AS n_raw
        |      FROM flagged GROUP BY user_id)
        |SELECT user_id, n_kept, n_raw,
        |  CAST(n_kept * 1000 // n_raw AS BIGINT) AS kept_per_mille
        |FROM k ORDER BY user_id""".stripMargin,

    // Shared by q_rolling_distinct (exact) and
    // q_rolling_distinct_sketch (merged per-day HLL partials, exact
    // regime — same contract as q_sketch_rollup): one oracle, two
    // plans, hash-equal.
    "q_rolling_distinct" -> rollingDistinctSql,
    "q_rolling_distinct_sketch" -> rollingDistinctSql,
    "q_sessionize_hot" -> sessionizeSql(HotRemapSql),
    "q_sessionize_hot_salted" -> sessionizeSql(HotRemapSql),

    "q_range_join" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS tns,
        |    CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts), 1) OVER w > 60000000000
        |           THEN 1
        |         WHEN LAG(epoch_ns(ts), 1) OVER w IS NULL THEN 1
        |         ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
        |sessions AS (
        |  SELECT user_id, event_id, tns,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tns, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |  FROM flagged),
        |bounds AS (
        |  SELECT user_id, sess_id, MIN(tns) AS start_tns, MAX(tns) AS end_tns
        |  FROM sessions GROUP BY user_id, sess_id),
        |errors AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS tns FROM events
        |  WHERE event_type = 'error')
        |SELECT e.user_id, e.event_id, b.sess_id
        |FROM errors e JOIN bounds b
        |  ON e.user_id = b.user_id AND e.tns BETWEEN b.start_tns AND b.end_tns
        |ORDER BY e.user_id, e.event_id""".stripMargin,

    "q_asof_join" -> asofWindowOracleSql,

    "q_asof_tolerance" ->
      """WITH u AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS tns, value, 1 AS side,
        |         CAST(NULL AS BIGINT) AS r_event_id, CAST(NULL AS DOUBLE) AS r_value,
        |         CAST(NULL AS BIGINT) AS r_tns
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, event_id, epoch_ns(ts) AS tns, value, 0 AS side,
        |         event_id AS r_event_id, value AS r_value, epoch_ns(ts) AS r_tns
        |  FROM events WHERE event_type = 'click'),
        |m AS (
        |  SELECT user_id, event_id, tns, value, side,
        |    LAST_VALUE(r_event_id IGNORE NULLS) OVER w AS m_event_id,
        |    LAST_VALUE(r_value IGNORE NULLS) OVER w AS m_value,
        |    LAST_VALUE(r_tns IGNORE NULLS) OVER w AS m_tns
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tns, side, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, value,
        |  CASE WHEN tns - m_tns <= 3600000000000 THEN m_event_id END AS match_event_id,
        |  CASE WHEN tns - m_tns <= 3600000000000 THEN m_value END AS match_value
        |FROM m WHERE side = 1 ORDER BY user_id, event_id""".stripMargin,

    "q_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "q_cube" ->
      """SELECT COALESCE(event_type, 'ALL') AS etype,
        |  COALESCE(user_id % 10, -1) AS user_mod,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY CUBE(event_type, user_id % 10)
        |ORDER BY etype, user_mod""".stripMargin,

    "q_case_agg" ->
      """SELECT user_id,
        |  CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END
        |      AS DECIMAL(38,4))) AS DOUBLE) AS purchase_value,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_having" ->
      """SELECT c_nationkey, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,4))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_nationkey HAVING COUNT(*) >= 3
        |ORDER BY c_nationkey""".stripMargin,

    "q_union" ->
      """SELECT * FROM (
        |  SELECT 'customer' AS kind, c_custkey AS key, c_acctbal AS balance FROM customer
        |  UNION ALL
        |  SELECT 'supplier' AS kind, s_suppkey AS key, s_acctbal AS balance FROM supplier)
        |ORDER BY kind, key""".stripMargin,

    "q_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS cnt
        |FROM events GROUP BY k ORDER BY k""".stripMargin,

    "q_variant_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS cnt
        |FROM events GROUP BY k ORDER BY k""".stripMargin,

    "q_date_trunc" ->
      """SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY day ORDER BY day""".stripMargin,

    // R3c: exact-regime replay of the native sketches (see the query's
    // regime argument). pmod mirrored as ((x % 32) + 32) % 32 in case
    // of negative ids; quantile_disc = the stored-sample GK median.
    "q_approx_sketch_exact" ->
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT ((user_id % 32) + 32) % 32) AS BIGINT)
        |    AS mod_users,
        |  quantile_disc(value, 0.5) AS p50_disc,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_join_outer" ->
      """SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_custs FROM (
        |  SELECT c.c_custkey,
        |    CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY c.c_custkey) g
        |GROUP BY n_orders ORDER BY n_orders""".stripMargin,

    "q_percentile" ->
      """SELECT event_type,
        |  ROUND(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4) AS p50,
        |  ROUND(CAST(quantile_cont(value, 0.9) AS DOUBLE), 4) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_string_funcs" ->
      """SELECT p_partkey, UPPER(p_brand) AS brand_uc,
        |  SUBSTRING(p_name, 1, 8) AS name_pfx,
        |  CONCAT_WS('-', p_brand, p_type) AS brand_type,
        |  CAST(LENGTH(p_name) AS BIGINT) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_exists_agg" ->
      """SELECT c_nationkey, COUNT(*) AS n_active_cust FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
}
